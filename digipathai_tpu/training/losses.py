"""Training losses for patch segmentation.

The reference imports (but never exercises) Keras categorical cross-entropy
training utilities (``reference DigiPathAI/Segmentation.py:25-27``); the
companion paper trains with CE+Dice. Provided here as a first-class, tested
subsystem so the framework supports fine-tuning on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def categorical_crossentropy(probs: jnp.ndarray, labels_onehot: jnp.ndarray,
                             eps: float = 1e-7) -> jnp.ndarray:
    """Mean CE given *softmax probabilities* (Keras-style) and one-hot labels."""
    p = jnp.clip(probs, eps, 1.0)
    return -jnp.mean(jnp.sum(labels_onehot * jnp.log(p), axis=-1))


def soft_dice_loss(probs: jnp.ndarray, labels_onehot: jnp.ndarray,
                   smooth: float = 1.0) -> jnp.ndarray:
    """1 - soft Dice of the foreground channel."""
    p = probs[..., 1]
    g = labels_onehot[..., 1]
    num = 2.0 * jnp.sum(p * g) + smooth
    den = jnp.sum(p) + jnp.sum(g) + smooth
    return 1.0 - num / den


def segmentation_loss(probs, labels_onehot, dice_weight: float = 0.5):
    ce = categorical_crossentropy(probs, labels_onehot)
    di = soft_dice_loss(probs, labels_onehot)
    return ce + dice_weight * di


def make_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(learning_rate)
