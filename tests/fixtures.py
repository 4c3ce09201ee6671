"""Synthetic whole-slide fixtures (no real data, no network)."""

from __future__ import annotations

import numpy as np


def render_he_like(width: int, height: int, seed: int = 0) -> tuple:
    """Render an H&E-like RGB image: white glass + pink tissue + dark lesion.

    Returns (rgb uint8 (H, W, 3), tissue_mask bool (H, W), lesion_mask bool).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    def ellipse(cx, cy, rx, ry):
        return ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0

    tissue = ellipse(width * 0.32, height * 0.45, width * 0.22, height * 0.33)
    tissue |= ellipse(width * 0.70, height * 0.60, width * 0.18, height * 0.26)
    lesion = ellipse(width * 0.32, height * 0.45, width * 0.09, height * 0.13)

    img = np.full((height, width, 3), 244, np.uint8)  # glass
    noise = rng.normal(0, 6, size=(height, width, 3))
    pink = np.array([222, 154, 190], np.float32)  # eosin-ish
    dark = np.array([120, 60, 130], np.float32)   # hematoxylin-ish lesion
    base = np.where(tissue[..., None], pink, 244.0)
    base = np.where(lesion[..., None], dark, base)
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    return img, tissue, lesion


def make_synthetic_slide(path: str, width=2048, height=1536, seed=0,
                         compression="jpeg", mpp=0.5) -> dict:
    from digipathai_tpu.io.backend import write_pyramid

    img, tissue, lesion = render_he_like(width, height, seed)
    write_pyramid(path, img, compression=compression, quality=92, mpp=mpp,
                  description="DigiPathAI-TPU synthetic fixture")
    return {
        "width": width,
        "height": height,
        "tissue_frac": float(tissue.mean()),
        "lesion_frac": float(lesion.mean()),
        "tissue_mask": tissue,
        "lesion_mask": lesion,
        "image": img,
        "mpp": mpp,
    }
