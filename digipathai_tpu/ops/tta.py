"""Vectorized test-time augmentation (dihedral transforms) on device.

The reference applies TTA per batch on host numpy, one transform at a time,
with an in-place quirk that compounds transforms cumulatively
(``reference DigiPathAI/Segmentation.py:150-160``,
``reference DigiPathAI/helpers/utils.py:487-522``).  Here transforms are
layout ops on the (B, X, Y, C) batch inside jit — free on TPU (XLA folds
them into the surrounding copies).

Patch arrays follow the reference's transposed orientation: per-image axes
are (x, y, channels), so in a batch the spatial axes are 1 and 2.
``FLIP_LEFT_RIGHT`` = ``np.fliplr`` on (x, y, c) = flip axis 1 of the image
= flip batch axis 2 ... careful: np.fliplr flips *axis 1* of the per-image
array, which is batch axis 2.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

DEFAULT = "DEFAULT"
FLIP_LEFT_RIGHT = "FLIP_LEFT_RIGHT"
ROTATE_90 = "ROTATE_90"
ROTATE_180 = "ROTATE_180"
ROTATE_270 = "ROTATE_270"

ALLOWED = (FLIP_LEFT_RIGHT, ROTATE_90, ROTATE_180, ROTATE_270)

#: common config-file spellings, normalized case-insensitively by
#: resolve_tta_list.  The reference's dihedral set has no vertical flip, so
#: "vflip" stays an error (with the allowed list in the message).
ALIASES = {
    "hflip": FLIP_LEFT_RIGHT, "fliplr": FLIP_LEFT_RIGHT,
    "rot90": ROTATE_90, "rotate90": ROTATE_90,
    "rot180": ROTATE_180, "rotate180": ROTATE_180,
    "rot270": ROTATE_270, "rotate270": ROTATE_270,
    "none": DEFAULT, "identity": DEFAULT,
}


def apply(batch: jnp.ndarray, tta: str) -> jnp.ndarray:
    """Forward transform of a (B, X, Y, C) batch (np semantics on (X, Y, C))."""
    if tta == FLIP_LEFT_RIGHT:
        return jnp.flip(batch, axis=2)
    if tta == ROTATE_90:
        return jnp.rot90(batch, 1, axes=(1, 2))
    if tta == ROTATE_180:
        return jnp.rot90(batch, 2, axes=(1, 2))
    if tta == ROTATE_270:
        return jnp.rot90(batch, 3, axes=(1, 2))
    return batch


def invert(batch: jnp.ndarray, tta: str) -> jnp.ndarray:
    """Inverse transform for predictions (parity with ``transform_prob``)."""
    if tta == FLIP_LEFT_RIGHT:
        return jnp.flip(batch, axis=2)
    if tta == ROTATE_90:
        return jnp.rot90(batch, 3, axes=(1, 2))
    if tta == ROTATE_180:
        return jnp.rot90(batch, 2, axes=(1, 2))
    if tta == ROTATE_270:
        return jnp.rot90(batch, 1, axes=(1, 2))
    return batch


def resolve_tta_list(tta_list) -> List[str]:
    """'DEFAULT' is always prepended (``reference Segmentation.py:95-99``).

    An explicit 'DEFAULT' in the caller's list is accepted and deduped
    (the reference treats it as a no-op transform rather than an error)."""
    if tta_list is None:
        return [DEFAULT]
    norm = []
    for t in tta_list:
        u = str(t).upper()
        u = ALIASES.get(str(t).lower(), u)
        if u not in ALLOWED and u != DEFAULT:
            raise ValueError(
                f"unknown TTA {t!r}; allowed: {list(ALLOWED)} "
                f"(or aliases {sorted(ALIASES)})")
        norm.append(u)
    return [DEFAULT] + [t for t in norm if t != DEFAULT]


def effective_transforms(tta_list: Sequence[str], faithful: bool = False) -> List[List[str]]:
    """Per-TTA-step transform *compositions* to apply to the original batch.

    With ``faithful=False`` (default, correct behavior): step i applies just
    ``tta_list[i]``.

    With ``faithful=True``: reproduces the reference's in-place compounding —
    at step i the batch has already been hit by transforms 1..i-1, so the
    effective forward transform is the composition [t1, ..., ti] while the
    inverse applied is still only ti (``reference Segmentation.py:151``).
    Returned value: list of forward-compose chains, one per step.
    """
    chains: List[List[str]] = []
    acc: List[str] = []
    for t in tta_list:
        if faithful:
            if t != DEFAULT:
                acc = acc + [t]
            chains.append(list(acc))
        else:
            chains.append([] if t == DEFAULT else [t])
    return chains


def apply_chain(batch: jnp.ndarray, chain: Sequence[str]) -> jnp.ndarray:
    for t in chain:
        batch = apply(batch, t)
    return batch
