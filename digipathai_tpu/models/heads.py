"""Binary (2-class) segmentation head computed without a channel axis.

All three production models end in ``Conv(num_classes=2, 1x1)`` + f32
softmax at full resolution (reference ``DigiPathAI/models/densenet.py:157``,
``inception_unetV2.py`` tail, ``deeplabv3.py:436-441``), and every engine
consumer reads only class 1 (``engine/infer.py``, ``engine/tile_infer.py``).
On TPU the tiled layout pads the minor (channel) axis to 128 lanes, so a
(1, 4096, 4096, 2) f32 softmax materializes ~8.6 GB of padded HBM traffic —
measured ~39 ms per forward, pure layout waste (tools/encoder_probe2.py).

For two classes ``softmax(l)[..., 1] == sigmoid(l1 - l0)`` exactly, and the
difference distributes over the linear head conv: contract the feature map
with the KERNEL difference and the result is a rank-3 (N, H, W) map with no
channel axis to pad.  Same parameters (the container is byte-compatible with
the canonical ``nn.Conv``), same math, ~64x less head traffic.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def binary_p1(y: jnp.ndarray, name: str, kernel_init=None) -> jnp.ndarray:
    """p(class 1) of the 2-class 1x1-conv softmax head, as (N, H, W) f32.

    Must be called inside a flax module scope; creates/reads the SAME
    'kernel'/'bias' params as ``nn.Conv(2, (1, 1), name=name)``.
    """
    from .s2d_decoder import ConvParams

    k, b = ConvParams((1, 1, y.shape[-1], 2),
                      kernel_init=kernel_init or nn.initializers.lecun_normal(),
                      name=name)()
    wd = (k[0, 0, :, 1] - k[0, 0, :, 0]).astype(y.dtype)
    bd = (b[1] - b[0]).astype(jnp.float32)
    z = jnp.einsum("nhwc,c->nhw", y, wd,
                   preferred_element_type=jnp.float32)
    return nn.sigmoid(z + bd)
