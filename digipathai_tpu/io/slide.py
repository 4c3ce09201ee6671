"""Whole-slide-image abstraction with OpenSlide-compatible semantics.

First-party replacement for ``openslide.OpenSlide`` as used by the reference
(``reference DigiPathAI/loaders/dataloader.py:239-247,357`` and
``reference DigiPathAI/main_server.py:54-55``):

- ``level_dimensions`` / ``level_downsamples`` / ``level_count``
- ``read_region((x, y), level, (w, h))`` with *level-0* coordinates and a
  ``(w, h)`` size, returning an (h, w, c) uint8 RGB array
- ``detect_format(path)`` for directory scans
- ``properties`` with an ``mpp`` entry parsed from the image description
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .backend import open_tiff


class Slide:
    def __init__(self, path: str):
        self.path = str(path)
        self._r = open_tiff(self.path)
        if not self._r.pages:
            raise ValueError(f"{path}: no images in file")
        # Pyramid levels must be ordered largest-first; ignore stray pages
        # that are larger than their predecessor (e.g. thumbnails at the end).
        pages = []
        for i, p in enumerate(self._r.pages):
            if pages and (p.width > pages[-1][1].width or p.height > pages[-1][1].height):
                break
            pages.append((i, p))
        self._page_index = [i for i, _ in pages]
        self._pages = [p for _, p in pages]
        self.properties = self._parse_properties()

    # -- metadata ---------------------------------------------------------

    @property
    def level_count(self) -> int:
        return len(self._pages)

    @property
    def level_dimensions(self) -> Tuple[Tuple[int, int], ...]:
        """((w0, h0), (w1, h1), ...) like OpenSlide (width first)."""
        return tuple((p.width, p.height) for p in self._pages)

    @property
    def dimensions(self) -> Tuple[int, int]:
        return self.level_dimensions[0]

    @property
    def level_downsamples(self) -> Tuple[float, ...]:
        w0, h0 = self.dimensions
        return tuple(((w0 / p.width) + (h0 / p.height)) / 2 for p in self._pages)

    @property
    def mpp(self) -> Optional[float]:
        v = self.properties.get("mpp")
        return float(v) if v is not None else None

    def _parse_properties(self) -> dict:
        props = {}
        desc = self._pages[0].description or ""
        for part in desc.replace("\n", "|").split("|"):
            if "=" in part:
                k, _, v = part.partition("=")
                props[k.strip()] = v.strip()
        if "mpp" not in props:
            # Aperio-style "MPP = 0.25" inside the description
            low = desc.lower()
            if "mpp" in low:
                for tok in low.replace(";", "|").split("|"):
                    if "mpp" in tok and "=" in tok:
                        try:
                            props["mpp"] = float(tok.split("=")[-1].strip())
                        except ValueError:
                            pass
        if "mpp" not in props:
            # resolution-tag fallback (OpenSlide derives mpp the same way)
            page = self._pages[0]
            xres = getattr(page, "x_resolution", 0.0)
            if xres:
                per_cm = xres if getattr(page, "resolution_unit", 2) == 3 \
                    else xres / 2.54
                if per_cm > 0:
                    props["mpp"] = 10000.0 / per_cm
        return props

    # -- pixels -----------------------------------------------------------

    def read_region(self, location: Tuple[int, int], level: int,
                    size: Tuple[int, int]) -> np.ndarray:
        """Read (w, h) pixels at ``level``; ``location`` is in level-0 coords.

        Returns an (h, w, 3) uint8 RGB array (grayscale is broadcast to RGB
        to mirror the reference's ``.convert('RGB')`` calls).
        """
        x0, y0 = location
        w, h = size
        ds = self.level_downsamples[level]
        x = int(round(x0 / ds))
        y = int(round(y0 / ds))
        arr = self._r.read_region(self._page_index[level], x, y, int(w), int(h))
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8) if arr.dtype.kind == "f" else arr.astype(np.uint8)
        if arr.shape[2] == 1:
            arr = np.repeat(arr, 3, axis=2)
        elif arr.shape[2] > 3:
            arr = arr[:, :, :3]
        return arr

    def read_level(self, level: int) -> np.ndarray:
        w, h = self.level_dimensions[level]
        return self.read_region((0, 0), level, (w, h))

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, ds in enumerate(self.level_downsamples):
            if ds <= downsample + 0.01:
                best = i
        return best

    def close(self):
        self._r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- format sniffing --------------------------------------------------

    @staticmethod
    def detect_format(path: str) -> Optional[str]:
        """Return a format name if ``path`` looks like a readable slide."""
        try:
            if os.path.getsize(path) < 8:
                return None
            with open(path, "rb") as f:
                head = f.read(4)
            if head[:2] in (b"II", b"MM") and head[2:4] in (
                b"\x2a\x00", b"\x00\x2a", b"\x2b\x00", b"\x00\x2b"
            ):
                return "generic-tiff"
        except OSError:
            return None
        return None
