"""Color-space ops in JAX (device-resident, jit-friendly)."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv_saturation(rgb: jnp.ndarray) -> jnp.ndarray:
    """Saturation channel of HSV for a (..., 3) RGB image.

    Matches ``skimage.color.rgb2hsv(img)[..., 1]`` as used by the
    reference's tissue masking (``reference DigiPathAI/helpers/utils.py:339,344``):
    uint8 input is scaled to [0, 1]; S = (max - min) / max with S = 0 where
    max == 0.
    """
    x = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        x = x / 255.0
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    return jnp.where(mx > 0, (mx - mn) / jnp.maximum(mx, 1e-12), 0.0)


def normalize_patches(patches_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(x - 128) / 128 normalization done on device in low precision.

    The reference normalizes per patch on host CPU workers
    (``reference DigiPathAI/loaders/dataloader.py:387-388``); we ship uint8
    to the device (4x less host->HBM traffic) and normalize there.
    """
    return (patches_u8.astype(dtype) - jnp.asarray(128.0, dtype)) / jnp.asarray(128.0, dtype)


def normalize_minmax(data):
    """Min-max contrast normalization to [0, 1]; all-zeros when constant.

    Parity target: ``normalize_minmax`` (``reference DigiPathAI/helpers/
    utils.py:166-176``, used by the alternate engine's input visualisation,
    ``loaders/inference_data_loader.py:227``).  The reference calls the
    long-removed ``np.float`` alias and crashes on numpy >= 1.24; the
    evident intent is implemented (PARITY.md deviations).
    """
    import numpy as np

    data = np.asarray(data)
    lo = float(data.min())
    hi = float(data.max())
    if hi - lo == 0:
        return np.zeros_like(data, dtype=np.float64 if data.dtype.kind != "f"
                             else data.dtype)
    return (data - lo) / (hi - lo)
