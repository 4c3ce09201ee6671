"""Model registry: build/init/apply bundles for the segmentation engine.

Replaces the reference's name-substring dispatch ``load_trained_models``
(``reference DigiPathAI/helpers/utils.py:427-448``) with an explicit
registry. All models map (B, P, P, 3) normalized patches -> (B, P, P, 2)
softmax probabilities.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


@dataclass
class ModelBundle:
    name: str
    module: Any

    def init(self, patch_size: int, seed: int = 0):
        # jit the init: eager op-by-op init of a 121-conv network is ~10x
        # slower than tracing + compiling it once
        lvl = int(getattr(self.module, "s2d_stem", 0) or 0)
        if lvl:
            # packed-input model (ops/s2d_input.py): same parameter tree,
            # 1/2**lvl-res 3*4**lvl-channel input shape
            p = patch_size >> lvl
            x = jnp.zeros((1, p, p, 3 * 4 ** lvl), jnp.float32)
        else:
            x = jnp.zeros((1, patch_size, patch_size, 3), jnp.float32)
        init_fn = jax.jit(lambda k: self.module.init(k, x, train=False))
        return jax.tree_util.tree_map(
            lambda a: a, init_fn(jax.random.PRNGKey(seed)))

    def apply(self, variables, x):
        return self.module.apply(variables, x, train=False)

    def apply_p1(self, variables, x):
        """p(class 1) as a rank-3 (B, H, W) map — what the engine consumes.

        Implemented as the canonical softmax + slice: inside a jitted step
        XLA DCEs the unused class and fuses the slice, and this MEASURES
        FASTER in-model than the native rank-3 sigmoid head
        (``module.apply(..., binary=True)``, models/heads.py): dense
        539 -> 509, inception 479 -> 454 eq-pps at tile 4096 — the einsum
        head denies XLA its conv+softmax fusion.  The native binary head
        remains available and exactness-tested for experimentation."""
        return self.module.apply(variables, x, train=False)[..., 1]


def _build_dense(**kw) -> ModelBundle:
    from .densenet_unet import DenseNet121UNet

    return ModelBundle("dense", DenseNet121UNet(**kw))


def _build_inception(**kw) -> ModelBundle:
    from .inception_unet import InceptionResNetV2UNet

    return ModelBundle("inception", InceptionResNetV2UNet(**kw))


def _build_deeplabv3(**kw) -> ModelBundle:
    from .deeplabv3 import DeepLabV3Plus

    return ModelBundle("deeplabv3", DeepLabV3Plus(**kw))


def _build_tiny(**kw) -> ModelBundle:
    from .tiny_unet import TinyUNet

    return ModelBundle("tiny", TinyUNet(**kw))


def _build_oracle(**kw) -> ModelBundle:
    from .oracle import OracleDarkness

    return ModelBundle("oracle", OracleDarkness(**kw))


_REGISTRY: Dict[str, Callable[..., ModelBundle]] = {
    "dense": _build_dense,
    "inception": _build_inception,
    "deeplabv3": _build_deeplabv3,
    "tiny": _build_tiny,
    "oracle": _build_oracle,
}


def available_models():
    return sorted(_REGISTRY)


def resolve_model_name(name: str) -> str:
    """Canonical registry key for ``name`` (substring dispatch, mirroring
    the reference's ``load_trained_models`` matching).  The returned key is
    what ``build_model(name).name`` will be — callers keying per-model state
    must use it, not the raw user string."""
    for key in _REGISTRY:
        if key in name:
            return key
    raise ValueError(
        f"Unknown model {name!r}, allowed models {available_models()}")


def build_model(name: str, **kw) -> ModelBundle:
    return _REGISTRY[resolve_model_name(name)](**kw)
