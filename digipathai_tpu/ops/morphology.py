"""Binary morphology as XLA ``reduce_window`` ops.

TPU-native replacement for the reference's OpenCV morphology
(``reference DigiPathAI/helpers/utils.py:200-219``): close(20) -> open(5) ->
level-dependent dilate on the coarse tissue mask.  ``reduce_window`` max/min
maps directly onto the VPU and fuses with the surrounding mask math.

OpenCV anchor semantics are reproduced exactly: for a k x k rectangular
kernel the anchor is (k//2, k//2), so the window spans offsets
[-(k//2), k - 1 - k//2] — asymmetric for even k.  Borders behave like
cv2's default BORDER_CONSTANT with the identity value (dilate pads 0,
erode pads 1), which is what reduce_window's init value provides.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _window_padding(k: int):
    lo = k // 2
    hi = k - 1 - lo
    return (lo, hi)


def dilate(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Binary dilation with a k x k rectangular kernel (cv2.dilate parity)."""
    m = mask.astype(jnp.float32)
    pad = _window_padding(k)
    out = lax.reduce_window(m, -jnp.inf, lax.max, (k, k), (1, 1), [pad, pad])
    return out > 0.5


def erode(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Binary erosion with a k x k rectangular kernel (cv2.erode parity)."""
    m = mask.astype(jnp.float32)
    pad = _window_padding(k)
    out = lax.reduce_window(m, jnp.inf, lax.min, (k, k), (1, 1), [pad, pad])
    return out > 0.5


def close(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    return erode(dilate(mask, k), k)


def open_(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    return dilate(erode(mask, k), k)


def _dilate_kernel_for_level(level: int) -> int:
    if level <= 2:
        return 60
    if level == 3:
        return 35
    if level == 4:
        return 10
    raise ValueError(f"no dilation kernel fixed for level {level}")


def morpho_process_mask(mask: jnp.ndarray, level: int) -> jnp.ndarray:
    """close(20) -> open(5) -> dilate(60|35|10) by mask level.

    Parity target: ``BinMorphoProcessMaskOS``
    (``reference DigiPathAI/helpers/utils.py:200-219``).
    """
    k = _dilate_kernel_for_level(level)
    m = close(mask, 20)
    m = open_(m, 5)
    return dilate(m, k)


def bin_morpho_process_mask(mask: jnp.ndarray, close_k: int = 50,
                            open_k: int = 35) -> jnp.ndarray:
    """Level-independent close -> open tissue-mask cleanup.

    Parity target: ``BinMorphoProcessMask`` (``reference DigiPathAI/
    helpers/utils.py:474-483``).  The reference defines it twice — close 20
    / open 5 at ``:189-197``, shadowed at import time by the close 50 /
    open 35 redefinition — so the later kernels are the defaults here and
    both are reachable via the kwargs.
    """
    return open_(close(mask, close_k), open_k)


@partial(jax.jit, static_argnames=("level",))
def plan_mask(img_xyc_u8: jnp.ndarray, level: int) -> jnp.ndarray:
    """Tissue mask + morphology as ONE XLA program.

    Fusing matters beyond fusion itself: on remote-dispatch TPU backends
    every jitted call pays a relay round-trip, so the planner issues exactly
    one device call instead of ~12.
    """
    m = _tissue_mask_core(img_xyc_u8)
    return morpho_process_mask(m, level)


@jax.jit
def _tissue_mask_core(img_xyc_u8: jnp.ndarray) -> jnp.ndarray:
    from .color import rgb_to_hsv_saturation
    from .otsu import otsu_threshold

    img = img_xyc_u8
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    sat = rgb_to_hsv_saturation(img)
    bg = ((r > otsu_threshold(r)) & (g > otsu_threshold(g)) & (b > otsu_threshold(b)))
    tissue_rgb = ~bg
    tissue_s = sat > otsu_threshold(sat)
    rgb_min = jnp.asarray(50, img.dtype)
    return tissue_s & tissue_rgb & (r > rgb_min) & (g > rgb_min) & (b > rgb_min)


def tissue_mask(img_xyc_u8) -> jnp.ndarray:
    """HSV-saturation & per-channel RGB Otsu tissue mask.

    Parity target: ``TissueMaskGenerationOS``
    (``reference DigiPathAI/helpers/utils.py:336-354``).  Input is the whole
    coarse level in the reference's (X, Y, 3) orientation.
    """
    return _tissue_mask_core(jnp.asarray(img_xyc_u8))


def tissue_mask_saturation_binary(img_xyc_u8) -> jnp.ndarray:
    """Nonzero-saturation mask (HSV S > 0).

    Parity target: ``TissueMaskGeneration_BIN(OS)``
    (``reference DigiPathAI/helpers/utils.py:357-365,388-396``) — a plain
    binary threshold of the saturation channel.
    """
    from .color import rgb_to_hsv_saturation

    img = jnp.asarray(img_xyc_u8)
    return rgb_to_hsv_saturation(img) > 0.0


def tissue_mask_saturation_otsu(img_xyc_u8) -> jnp.ndarray:
    """Otsu-thresholded saturation mask.

    Parity target: ``TissueMaskGeneration_BIN_OTSU(OS)``
    (``reference DigiPathAI/helpers/utils.py:367-375,398-406``).
    """
    from .color import rgb_to_hsv_saturation
    from .otsu import otsu_threshold

    img = jnp.asarray(img_xyc_u8)
    sat = rgb_to_hsv_saturation(img)
    return sat > otsu_threshold(sat)


def tissue_mask_patch(patch_rgb: jnp.ndarray) -> jnp.ndarray:
    """Patch-level threshold mask (r<235 | g<210 | b<235).

    Parity target: ``TissueMaskGenerationPatch``
    (``reference DigiPathAI/helpers/utils.py:377-385``).
    """
    r = patch_rgb[..., 0] < 235
    g = patch_rgb[..., 1] < 210
    b = patch_rgb[..., 2] < 235
    return r | g | b
