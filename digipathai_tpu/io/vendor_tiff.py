"""Vendor-flavored TIFF slide formats: Leica SCN, Philips TIFF, Ventana BIF.

The reference opens these through OpenSlide's format drivers (any slide
``OpenSlide.detect_format`` accepts — ``reference
DigiPathAI/main_server.py:54-55``).  All three are (Big)TIFF containers that
differ from generic pyramidal TIFF only in *metadata interpretation*:

- **Leica SCN** (``.scn``): BigTIFF whose IFD-0 ImageDescription is an XML
  document (namespace ``…leica-microsystems.com/scn/…``) describing a
  ``collection`` of ``image`` elements.  Each image's ``pixels`` element
  lists its pyramid as ``dimension`` children carrying explicit ``ifd``
  indices; a macro image covers the whole collection while the main image
  covers a sub-rectangle (its ``view`` offset/size, in nm).  The IFD order
  in the file is NOT area-sorted and the macro is tiled too, so the generic
  "tiled pages by area" rule would interleave the two images — level
  selection must follow the XML.
- **Philips TIFF** (``.tiff``): IFD-0 ImageDescription is a Philips
  ``DataObject`` XML (``ObjectType="DPUfsImport"``).  Pyramid levels are
  tiled IFDs; ``Macro`` / ``Label`` images are non-tiled IFDs whose
  description is exactly that word.  Quirk: background tiles are OMITTED
  (tile offset/bytecount 0) and defined to be white — handled by
  ``TiffPage.sparse_fill`` (tiff_py.py).  Pixel pitch comes from the
  ``DICOM_PIXEL_SPACING`` attribute (mm).
- **Ventana BIF** (``.bif``): BigTIFF whose IFD-0 carries an XMP packet
  (tag 700) with an ``iScan`` element (``ScanRes`` = µm/px,
  ``Magnification``).  Tiled IFDs form the pyramid; ``Label Image`` /
  ``Thumbnail`` IFDs are associated images.  (Ventana's level-0 AOI
  overlap correction is out of scope — levels are read as stored, which is
  what several open readers do; documented in PARITY.md.)

Caveat (as for MRXS, io/mirax.py): no real scanner output exists in this
offline environment, so the layouts are validated against self-authored
fixtures (``tests/fixtures.py``) that follow the documented structures.
"""

from __future__ import annotations

import re
import struct
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree


def sniff_vendor(page0) -> Optional[str]:
    """Classify a parsed TIFF's vendor flavor from IFD-0 metadata alone.

    Returns ``"leica"``, ``"philips"``, ``"ventana"`` or None (mirrors the
    names ``OpenSlide.detect_format`` uses for these drivers).
    """
    desc = page0.description or ""
    if "<scn" in desc and "leica-microsystems.com/scn" in desc:
        return "leica"
    if "DPUfsImport" in desc and "<DataObject" in desc:
        return "philips"
    xmp = page0.xmp or b""
    if b"iScan" in xmp or "iScan" in desc:
        return "ventana"
    return None


# -- Leica SCN --------------------------------------------------------------


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def leica_layout(pages) -> Tuple[List[int], Dict[str, int], dict]:
    """Parse the SCN collection XML into (level_ifds, associated, props).

    The main image is the one whose ``view`` does NOT cover the whole
    collection (macro images span it); with a single image, that image is
    the main one.  Levels are its ``dimension`` elements ordered by ``r``
    (zoom index), restricted to the base z-plane when a ``z`` attribute is
    present (fluorescence stacks are out of scope, as in the reference's
    brightfield pipeline).
    """
    root = ElementTree.fromstring(pages[0].description)
    coll = next(e for e in root if _local(e.tag) == "collection")
    csx = int(coll.get("sizeX", 0) or 0)
    csy = int(coll.get("sizeY", 0) or 0)
    images = []
    for img in (e for e in coll if _local(e.tag) == "image"):
        view = next((e for e in img if _local(e.tag) == "view"), None)
        pixels = next(e for e in img if _local(e.tag) == "pixels")
        dims = []
        for d in (e for e in pixels if _local(e.tag) == "dimension"):
            if int(d.get("z", 0) or 0) or int(d.get("c", 0) or 0):
                continue
            dims.append((int(d.get("r", 0) or 0), int(d.get("ifd")),
                         int(d.get("sizeX")), int(d.get("sizeY"))))
        dims.sort()
        vsx = int(view.get("sizeX", csx) or csx) if view is not None else csx
        vsy = int(view.get("sizeY", csy) or csy) if view is not None else csy
        off = (int(view.get("offsetX", 0) or 0),
               int(view.get("offsetY", 0) or 0)) if view is not None else (0, 0)
        covers_all = off == (0, 0) and vsx >= csx and vsy >= csy
        images.append(dict(dims=dims, view=(vsx, vsy), offset=off,
                           macro=covers_all,
                           px=dims[0][2] * dims[0][3] if dims else 0))
    if not images:
        raise ValueError("SCN XML contains no image elements")
    mains = [im for im in images if not im["macro"]] or images
    main = max(mains, key=lambda im: im["px"])

    level_ifds = [ifd for _, ifd, _, _ in main["dims"]]
    associated: Dict[str, int] = {}
    for im in images:
        if im is main or not im["dims"]:
            continue
        name = "macro" if im["macro"] else "related"
        if name in associated:
            name = f"{name}-{im['dims'][0][1]}"
        associated[name] = im["dims"][0][1]

    props: dict = {}
    _, _, psx, psy = main["dims"][0]
    if psx and main["view"][0]:
        props["mpp"] = main["view"][0] / psx / 1000.0  # nm/px -> µm/px
    obj = root.iter()
    for e in obj:
        if _local(e.tag) == "objective" and (e.text or "").strip():
            try:
                props["openslide.objective-power"] = float(e.text.strip())
            except ValueError:
                pass
            break
    return level_ifds, associated, props


# -- Philips TIFF -------------------------------------------------------------


def philips_props(pages) -> dict:
    """Pull mpp out of the Philips DataObject XML (DICOM_PIXEL_SPACING is
    row/column spacing in mm)."""
    desc = pages[0].description or ""
    props: dict = {}
    m = re.search(
        r'Name="DICOM_PIXEL_SPACING"[^>]*>\s*"?([0-9.eE+-]+)"?', desc)
    if m:
        try:
            props["mpp"] = float(m.group(1)) * 1000.0  # mm -> µm
        except ValueError:
            pass
    return props


# -- Ventana BIF --------------------------------------------------------------


def ventana_props(pages) -> dict:
    blob = (pages[0].xmp or b"").decode("utf-8", "replace") or \
        (pages[0].description or "")
    props: dict = {}
    m = re.search(r'ScanRes="([0-9.eE+-]+)"', blob)
    if m:
        try:
            props["mpp"] = float(m.group(1))
        except ValueError:
            pass
    m = re.search(r'Magnification="([0-9.eE+-]+)"', blob)
    if m:
        try:
            props["openslide.objective-power"] = float(m.group(1))
        except ValueError:
            pass
    return props


def sniff_vendor_file(path: str) -> Optional[str]:
    """Header-only vendor sniff with the Python parser (the native backend
    surfaces neither tag 700 nor full descriptions for every page)."""
    from . import tiff_py

    try:
        with tiff_py.TiffReader(path) as r:
            if not r.pages:
                return None
            return sniff_vendor(r.pages[0])
    except (OSError, ValueError, struct.error):
        return None
