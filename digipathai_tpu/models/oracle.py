"""Parameter-free 'oracle' model for end-to-end engine tests.

Maps normalized patches to a lesion probability from brightness alone
(dark pixels -> class 1). Lets the test suite verify grid planning, TTA,
stitching, thresholding and artifact writing with a model whose correct
output is known analytically — no trained weights needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class OracleDarkness(nn.Module):
    pivot: float = -0.1   # brightness in (x-128)/128 units
    sharpness: float = 20.0
    dtype: object = jnp.float32  # accepted for engine uniformity; output is f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 binary: bool = False) -> jnp.ndarray:
        brightness = jnp.mean(x.astype(jnp.float32), axis=-1)
        p1 = jax.nn.sigmoid((self.pivot - brightness) * self.sharpness)
        return p1 if binary else jnp.stack([1.0 - p1, p1], axis=-1)
