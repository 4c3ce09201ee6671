"""A small 2-stage U-Net used by tests and smoke benchmarks.

Not part of the reference surface: exists so the engine/test suite can run
end-to-end in seconds on CPU. Same I/O contract as the big models.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .densenet_unet import upsample2x


class TinyUNet(nn.Module):
    num_classes: int = 2
    width: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 binary: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        w = self.width
        x = x.astype(self.dtype)
        e1 = nn.relu(conv(w, (3, 3), padding="SAME")(x))
        d1 = nn.max_pool(e1, (2, 2), strides=(2, 2))
        e2 = nn.relu(conv(2 * w, (3, 3), padding="SAME")(d1))
        d2 = nn.max_pool(e2, (2, 2), strides=(2, 2))
        b = nn.relu(conv(4 * w, (3, 3), padding="SAME")(d2))
        u2 = jnp.concatenate([upsample2x(b), e2], axis=-1)
        u2 = nn.relu(conv(2 * w, (3, 3), padding="SAME")(u2))
        u1 = jnp.concatenate([upsample2x(u2), e1], axis=-1)
        u1 = nn.relu(conv(w, (3, 3), padding="SAME")(u1))
        logits = conv(self.num_classes, (1, 1))(u1)
        p = nn.softmax(logits.astype(jnp.float32), axis=-1)
        # CPU test model: no layout padding to dodge — just match the
        # binary-head output contract (see models/heads.py)
        return p[..., 1] if binary and self.num_classes == 2 else p
