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


def make_svs_like_slide(path: str, width=1536, height=1024, seed=0,
                        compression="j2k", mpp=0.25, ndpi=False) -> dict:
    """Write an Aperio-SVS-convention TIFF: tiled pyramid levels interleaved
    with stripped associated images, Aperio description with MPP.

    IFD order mirrors real SVS files: [L0 tiled, thumbnail stripped,
    L1 tiled, label stripped, macro stripped].  ``compression`` selects the
    tile codec: "j2k" (33005 RGB codestreams), "j2k-ycbcr" (33003), or
    "jpeg".  ``ndpi=True`` instead stamps the Hamamatsu NDPI private tag
    (65420) on a plain file, for detect_format exclusion tests.
    """
    import struct

    from digipathai_tpu.io import tiff_py as T

    img, tissue, lesion = render_he_like(width, height, seed)
    levels = [img, img[::2, ::2].copy()]
    thumb = img[::8, ::8].copy()
    label = np.full((64, 96, 3), 30, np.uint8)
    macro = np.full((48, 128, 3), 200, np.uint8)

    f = open(path, "wb")
    f.write(struct.pack("<2sHI", b"II", 42, 0))
    builders = []

    def emit_tiled(arr, desc=None, tile=256):
        h, w = arr.shape[:2]
        offsets, counts = [], []
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                block = np.zeros((tile, tile, 3), np.uint8)
                sub = arr[ty:ty + tile, tx:tx + tile]
                block[:sub.shape[0], :sub.shape[1]] = sub
                data = T._encode_tile(block, compression, 90)
                offsets.append(f.tell())
                counts.append(len(data))
                f.write(data)
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T._COMP_TAG[compression])
        # PIL JPEG streams are YCbCr-coded; J2K codestreams carry RGB
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_YCBCR
              if compression == "jpeg" else T.PHOTOMETRIC_RGB)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_TILE_WIDTH, 3, tile)
        b.add(T.TAG_TILE_LENGTH, 3, tile)
        b.add(T.TAG_TILE_OFFSETS, 4, offsets)
        b.add(T.TAG_TILE_BYTE_COUNTS, 4, counts)
        if desc:
            b.add(T.TAG_IMAGE_DESCRIPTION, 2, desc.encode() + b"\0")
        if ndpi:
            b.add(65420, 4, 1)  # NDPI private tag
        builders.append(b)

    def emit_stripped(arr, desc):
        h, w = arr.shape[:2]
        data = np.ascontiguousarray(arr).tobytes()
        off = f.tell()
        f.write(data)
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T.COMPRESSION_NONE)
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_RGB)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_ROWS_PER_STRIP, 4, h)
        b.add(T.TAG_STRIP_OFFSETS, 4, [off])
        b.add(T.TAG_STRIP_BYTE_COUNTS, 4, [len(data)])
        b.add(T.TAG_IMAGE_DESCRIPTION, 2, desc.encode() + b"\0")
        builders.append(b)

    aperio_desc = (
        f"Aperio Image Library v12.0.15\r\n{width}x{height} "
        f"[0,0 {width}x{height}] (256x256) -> fixture"
        f"|AppMag = 20|StripeWidth = 992|MPP = {mpp}"
    )
    emit_tiled(levels[0], desc=aperio_desc)
    emit_stripped(thumb, f"Aperio Image Library v12.0.15\r\n{width}x{height} -> "
                         f"{thumb.shape[1]}x{thumb.shape[0]} - thumbnail")
    emit_tiled(levels[1])
    emit_stripped(label, "Aperio Image Library v12.0.15\r\nlabel "
                         f"{label.shape[1]}x{label.shape[0]}")
    emit_stripped(macro, "Aperio Image Library v12.0.15\r\nmacro "
                         f"{macro.shape[1]}x{macro.shape[0]}")

    prev_ptr_pos = 4
    for b in builders:
        if f.tell() % 2:
            f.write(b"\0")
        ifd_offset = f.tell()
        next_ptr_pos = b.write(f)
        end = f.tell()
        f.seek(prev_ptr_pos)
        f.write(struct.pack("<I", ifd_offset))
        f.seek(end)
        prev_ptr_pos = next_ptr_pos
    f.close()
    return {
        "width": width, "height": height, "image": img, "mpp": mpp,
        "tissue_mask": tissue, "lesion_mask": lesion,
        "levels": levels, "thumb": thumb, "label": label, "macro": macro,
    }


def _write_multi_ifd_tiff(path, emitters):
    """Write a classic little-endian TIFF whose IFDs come from ``emitters``:
    each is called as ``emitter(f, builders)`` and appends one
    ``tiff_py._IfdBuilder`` (shared chain-writing used by the vendor-format
    fixtures below; same layout logic as make_svs_like_slide)."""
    import struct

    f = open(path, "wb")
    f.write(struct.pack("<2sHI", b"II", 42, 0))
    builders = []
    for emit in emitters:
        emit(f, builders)
    prev_ptr_pos = 4
    for b in builders:
        if f.tell() % 2:
            f.write(b"\0")
        ifd_offset = f.tell()
        next_ptr_pos = b.write(f)
        end = f.tell()
        f.seek(prev_ptr_pos)
        f.write(struct.pack("<I", ifd_offset))
        f.seek(end)
        prev_ptr_pos = next_ptr_pos
    f.close()


def _tiled_emitter(arr, desc=None, tile=256, compression="jpeg", quality=92,
                   sparse_white=False, extra_tags=()):
    """Emitter for one tiled RGB page.  ``sparse_white=True`` omits tiles
    that are entirely white (Philips convention: offset/bytecount 0)."""

    def emit(f, builders):
        from digipathai_tpu.io import tiff_py as T

        h, w = arr.shape[:2]
        offsets, counts = [], []
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                block = np.full((tile, tile, 3), 255, np.uint8)
                sub = arr[ty:ty + tile, tx:tx + tile]
                block[:sub.shape[0], :sub.shape[1]] = sub
                if sparse_white and (block == 255).all():
                    offsets.append(0)
                    counts.append(0)
                    continue
                data = T._encode_tile(block, compression, quality)
                offsets.append(f.tell())
                counts.append(len(data))
                f.write(data)
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T._COMP_TAG[compression])
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_YCBCR
              if compression == "jpeg" else T.PHOTOMETRIC_RGB)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_TILE_WIDTH, 3, tile)
        b.add(T.TAG_TILE_LENGTH, 3, tile)
        b.add(T.TAG_TILE_OFFSETS, 4, offsets)
        b.add(T.TAG_TILE_BYTE_COUNTS, 4, counts)
        if desc:
            b.add(T.TAG_IMAGE_DESCRIPTION, 2, desc.encode() + b"\0")
        for tag, ftype, val in extra_tags:
            b.add(tag, ftype, val)
        builders.append(b)

    return emit


def _stripped_emitter(arr, desc=None, extra_tags=()):
    def emit(f, builders):
        from digipathai_tpu.io import tiff_py as T

        h, w = arr.shape[:2]
        data = np.ascontiguousarray(arr).tobytes()
        off = f.tell()
        f.write(data)
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T.COMPRESSION_NONE)
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_RGB)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_ROWS_PER_STRIP, 4, h)
        b.add(T.TAG_STRIP_OFFSETS, 4, [off])
        b.add(T.TAG_STRIP_BYTE_COUNTS, 4, [len(data)])
        if desc:
            b.add(T.TAG_IMAGE_DESCRIPTION, 2, desc.encode() + b"\0")
        for tag, ftype, val in extra_tags:
            b.add(tag, ftype, val)
        builders.append(b)

    return emit


def make_scn_slide(path: str, width=1024, height=768, seed=0,
                   mpp=0.5) -> dict:
    """Write a Leica-SCN-convention TIFF (``io/vendor_tiff.py``): IFD 0 is
    the collection macro carrying the ``<scn>`` XML whose ``image`` elements
    map pyramid levels to explicit IFD indices; the main image's IFDs follow
    (classic TIFF for fixture simplicity — the parser accepts both magics).

    The macro is TILED (as on real scanners), so the generic area-sorted
    page rule would interleave it with the main levels — the test asserts
    the XML-driven selection instead.
    """
    img, tissue, lesion = render_he_like(width, height, seed)
    levels = [img, img[::4, ::4].copy()]
    macro = img[::2, ::2].copy()  # big tiled macro (area rule decoy)

    # view/collection geometry in nm: main image covers a sub-rectangle
    nm_per_px = mpp * 1000.0
    coll_w, coll_h = int(3 * width * nm_per_px), int(3 * height * nm_per_px)
    off_x, off_y = int(0.5 * width * nm_per_px), int(0.25 * height * nm_per_px)
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<scn xmlns="http://www.leica-microsystems.com/scn/2010/10/01">
 <collection sizeX="{coll_w}" sizeY="{coll_h}">
  <image name="macro">
   <view sizeX="{coll_w}" sizeY="{coll_h}" offsetX="0" offsetY="0"/>
   <pixels sizeX="{macro.shape[1]}" sizeY="{macro.shape[0]}">
    <dimension sizeX="{macro.shape[1]}" sizeY="{macro.shape[0]}" r="0" ifd="0"/>
   </pixels>
  </image>
  <image name="main">
   <view sizeX="{int(width * nm_per_px)}" sizeY="{int(height * nm_per_px)}"
         offsetX="{off_x}" offsetY="{off_y}"/>
   <pixels sizeX="{width}" sizeY="{height}">
    <dimension sizeX="{width}" sizeY="{height}" r="0" ifd="1"/>
    <dimension sizeX="{levels[1].shape[1]}" sizeY="{levels[1].shape[0]}" r="1" ifd="2"/>
   </pixels>
   <scanSettings>
    <objectiveSettings><objective>20</objective></objectiveSettings>
   </scanSettings>
  </image>
 </collection>
</scn>"""
    _write_multi_ifd_tiff(path, [
        _tiled_emitter(macro, desc=xml),
        _tiled_emitter(levels[0]),
        _tiled_emitter(levels[1]),
    ])
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "levels": levels, "macro": macro,
            "tissue_mask": tissue, "lesion_mask": lesion}


def make_philips_slide(path: str, width=1024, height=768, seed=0,
                       mpp=0.25) -> dict:
    """Write a Philips-TIFF-convention file: DPUfsImport XML on IFD 0,
    tiled pyramid with all-white background tiles OMITTED (offset/count 0,
    defined white), stripped ``Macro``/``Label`` associated images."""
    img, tissue, lesion = render_he_like(width, height, seed)
    # force an all-white tile so the sparse path is actually exercised
    img[:256, :256] = 255
    levels = [img, img[::4, ::4].copy()]
    macro = np.full((48, 128, 3), 200, np.uint8)
    label = np.full((64, 96, 3), 30, np.uint8)
    spacing_mm = mpp / 1000.0
    xml = (
        '<?xml version="1.0" encoding="UTF-8" ?>'
        '<DataObject ObjectType="DPUfsImport"><Attribute '
        'Name="DICOM_PIXEL_SPACING" Group="0x0028" Element="0x0030" '
        f'PMSVR="IDoubleArray">"{spacing_mm}" "{spacing_mm}"</Attribute>'
        "</DataObject>"
    )
    _write_multi_ifd_tiff(path, [
        _tiled_emitter(levels[0], desc=xml, sparse_white=True),
        _tiled_emitter(levels[1], sparse_white=True),
        _stripped_emitter(macro, desc="Macro"),
        _stripped_emitter(label, desc="Label"),
    ])
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "levels": levels, "macro": macro, "label": label,
            "tissue_mask": tissue, "lesion_mask": lesion}


def make_ventana_slide(path: str, width=1024, height=768, seed=0,
                       mpp=0.465, magnification=20) -> dict:
    """Write a Ventana-BIF-convention file: stripped thumbnail IFD 0
    carrying the ``iScan`` XMP packet (tag 700), tiled pyramid levels, and
    a stripped ``Label Image``."""
    img, tissue, lesion = render_he_like(width, height, seed)
    levels = [img, img[::4, ::4].copy()]
    thumb = img[::8, ::8].copy()
    label = np.full((64, 96, 3), 40, np.uint8)
    xmp = (
        '<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        f'<iScan ScanRes="{mpp}" Magnification="{magnification}" '
        'UnitNumber="1" ScannerModel="VENTANA DP 200"/>'
        "</rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
    ).encode()
    _write_multi_ifd_tiff(path, [
        _stripped_emitter(thumb, desc="Thumbnail",
                          extra_tags=[(700, 1, xmp)]),
        _tiled_emitter(levels[0]),
        _tiled_emitter(levels[1]),
        _stripped_emitter(label, desc="Label Image"),
    ])
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "levels": levels, "thumb": thumb, "label": label,
            "tissue_mask": tissue, "lesion_mask": lesion}


def make_trestle_slide(path: str, ncols=8, nrows=6, tile=128, overlap=16,
                       seed=0, mpp=0.5) -> dict:
    """Write a Trestle-convention TIFF (``io/vendor_tiff.py``): tiled
    pyramid whose stored tiles OVERLAP by ``overlap`` px (adjacent tiles
    re-store each other's edge bands), declared via ``OverlapsXY=`` in the
    ``;``-separated IFD-0 description.  Logical size = stored size minus
    the overlaps; the fixture duplicates bands exactly so any-tile-wins
    reconstruction equals the logical image bit-for-bit."""
    adv = tile - overlap
    width = ncols * tile - overlap * (ncols - 1)
    height = nrows * tile - overlap * (nrows - 1)
    img, tissue, lesion = render_he_like(width, height, seed)
    sx = np.arange(ncols * tile)
    lx = (sx // tile) * adv + sx % tile
    sy = np.arange(nrows * tile)
    ly = (sy // tile) * adv + sy % tile
    stored = img[ly][:, lx]
    level1 = img[::4, ::4].copy()  # downsamples carry no overlaps
    desc = (f"Trestle Corp.;OverlapsXY={overlap} {overlap} 0 0;"
            "Objective Power=20;Background Color=FFFFFF")
    _write_multi_ifd_tiff(path, [
        # deflate (lossless) so overlap-band reconstruction is bit-exact
        _tiled_emitter(stored, desc=desc, tile=tile, compression="deflate"),
        _tiled_emitter(level1, tile=tile, compression="deflate"),
    ])
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "stored_size": (ncols * tile, nrows * tile), "level1": level1,
            "tissue_mask": tissue, "lesion_mask": lesion}


def make_vms_slide(path: str, width=1024, height=512, seed=0, mpp=0.46,
                   columns=2, restart_rows=1) -> dict:
    """Write a Hamamatsu-VMS-convention slide (``io/hamamatsu.py``): the
    ``.vms`` INI index plus sibling JPEG column files (DRI restart markers,
    like real scanners), a MapFile and a MacroImage."""
    import os

    from PIL import Image

    assert width % columns == 0
    img, tissue, lesion = render_he_like(width, height, seed)
    base = os.path.dirname(os.path.abspath(str(path)))
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    colw = width // columns
    lines = ["[Virtual Microscope Specimen]", "NoLayers=1",
             f"NoJpegColumns={columns}", "NoJpegRows=1"]
    for c in range(columns):
        name = f"{stem}_c{c}.jpg"
        Image.fromarray(img[:, c * colw:(c + 1) * colw]).save(
            os.path.join(base, name), "jpeg", quality=92,
            restart_marker_rows=restart_rows)
        lines.append(("ImageFile=" if c == 0 else f"ImageFile({c})=") + name)
    map_img = img[::8, ::8].copy()
    Image.fromarray(map_img).save(os.path.join(base, f"{stem}_map.jpg"),
                                  "jpeg", quality=85)
    macro = np.full((48, 128, 3), 210, np.uint8)
    Image.fromarray(macro).save(os.path.join(base, f"{stem}_macro.jpg"),
                                "jpeg", quality=85)
    lines += [f"MapFile={stem}_map.jpg", f"MacroImage={stem}_macro.jpg",
              f"PhysicalWidth={int(width * mpp * 1000)}",
              f"PhysicalHeight={int(height * mpp * 1000)}",
              "LayerSpacing=0.0"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "map": map_img, "macro": macro,
            "tissue_mask": tissue, "lesion_mask": lesion}


def make_vmu_slide(path: str, width=512, height=256, seed=0, mpp=0.46,
                   col_width=128) -> dict:
    """Write a Hamamatsu-VMU-convention slide: INI index + one NGR raw file
    (GN magic, 16-bit RGB, column-block-major — io/hamamatsu.py)."""
    import os
    import struct

    assert width % col_width == 0
    img, tissue, lesion = render_he_like(width, height, seed)
    img16 = (img.astype(np.uint16) << 8) | img  # high byte carries the pixel
    base = os.path.dirname(os.path.abspath(str(path)))
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    ngr = os.path.join(base, f"{stem}_img.ngr")
    data_off = 64
    with open(ngr, "wb") as f:
        f.write(b"GN\0\0")
        f.write(struct.pack("<iii", width, height, col_width))
        f.write(b"\0" * 8)  # offsets 16..23 unused
        f.write(struct.pack("<i", data_off))
        f.write(b"\0" * (data_off - f.tell()))
        for cb in range(width // col_width):
            block = img16[:, cb * col_width:(cb + 1) * col_width]
            f.write(np.ascontiguousarray(block.astype("<u2")).tobytes())
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join([
            "[Uncompressed Virtual Microscope Specimen]", "NoLayers=1",
            f"ImageFile={stem}_img.ngr",
            f"PhysicalWidth={int(width * mpp * 1000)}",
            f"PhysicalHeight={int(height * mpp * 1000)}",
        ]) + "\n")
    return {"width": width, "height": height, "image": img, "mpp": mpp,
            "tissue_mask": tissue, "lesion_mask": lesion}


def _entropy_start(data: bytes) -> int:
    """Byte offset where a JPEG stream's entropy data begins (after SOS)."""
    pos = 2
    while pos + 4 <= len(data):
        seglen = (data[pos + 2] << 8) | data[pos + 3]
        if data[pos + 1] == 0xDA:
            return pos + 2 + seglen
        pos += 2 + seglen
    raise ValueError("no SOS in JPEG stream")


def make_ndpi_slide(path: str, width=1024, height=768, seed=0, mpp=0.46,
                    restart_rows=1, subsampling=2, sof_lies=False,
                    mcu_starts=False) -> dict:
    """Write a Hamamatsu-NDPI-convention file (see ``io/ndpi.py``).

    Classic little-endian TIFF; each level is ONE strip holding a complete
    JPEG stream with a restart marker every ``restart_rows`` MCU rows
    (DRI), exactly how real scanners emit it.  IFDs carry the NDPI private
    tags: 65420 (magic), 65421 SourceLens (40 / 10 / -1 macro), 65422/23
    offsets.  ``sof_lies=True`` reproduces the >65535px quirk in miniature:
    the JPEG SOF dimensions are overwritten with junk so only the TIFF tags
    are right — the reader must patch SOF before decoding.
    """
    import io as _io
    import struct

    from PIL import Image

    from digipathai_tpu.io import tiff_py as T

    img, tissue, lesion = render_he_like(width, height, seed)
    levels = [(img, 40.0), (img[::4, ::4].copy(), 10.0)]
    macro = np.full((48, 128, 3), 210, np.uint8)

    f = open(path, "wb")
    f.write(struct.pack("<2sHI", b"II", 42, 0))
    builders = []

    def emit_jpeg_level(arr, lens):
        h, w = arr.shape[:2]
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, "jpeg", quality=92,
                                  subsampling=subsampling,
                                  restart_marker_rows=restart_rows)
        data = bytearray(buf.getvalue())
        if sof_lies:
            # clobber SOF dims (real NDPI stores dim % 65536 there)
            pos = 2
            while pos + 4 <= len(data):
                if data[pos] != 0xFF:
                    break
                m = data[pos + 1]
                seglen = (data[pos + 2] << 8) | data[pos + 3]
                if m in (0xC0, 0xC1, 0xC2):
                    data[pos + 5:pos + 7] = struct.pack(">H", (h + 7) % 11)
                    data[pos + 7:pos + 9] = struct.pack(">H", (w + 3) % 13)
                    break
                if m == 0xDA:
                    break
                pos += 2 + seglen
        off = f.tell()
        f.write(bytes(data))
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T.COMPRESSION_OLD_JPEG)
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_YCBCR)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_ROWS_PER_STRIP, 4, h)
        b.add(T.TAG_STRIP_OFFSETS, 4, [off])
        b.add(T.TAG_STRIP_BYTE_COUNTS, 4, [len(data)])
        # resolution in cm (NDPI convention) -> mpp fallback
        per_cm = 10000.0 / mpp
        b.add(T.TAG_X_RESOLUTION, 5, [(int(per_cm * 100), 100)])
        b.add(283, 5, [(int(per_cm * 100), 100)])  # YResolution
        b.add(296, 3, 3)  # ResolutionUnit = cm
        b.add(65420, 4, 1)
        b.add(65421, 11, lens)  # SourceLens (FLOAT)
        b.add(65422, 4, 0)
        b.add(65423, 4, 0)
        if mcu_starts:
            # McuStarts (65426): offsets of each restart segment's first
            # byte within the stream (segment k>0 starts 2 bytes after its
            # RST marker) — the NDPI fast path io/ndpi.py validates+uses
            rsts = [i for i in range(len(data) - 1)
                    if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7]
            segs = [_entropy_start(bytes(data))] + [r + 2 for r in rsts]
            b.add(65426, 4, segs)
        builders.append(b)

    def emit_macro(arr):
        h, w = arr.shape[:2]
        data = np.ascontiguousarray(arr).tobytes()
        off = f.tell()
        f.write(data)
        b = T._IfdBuilder()
        b.add(T.TAG_IMAGE_WIDTH, 4, w)
        b.add(T.TAG_IMAGE_LENGTH, 4, h)
        b.add(T.TAG_BITS_PER_SAMPLE, 3, [8, 8, 8])
        b.add(T.TAG_COMPRESSION, 3, T.COMPRESSION_NONE)
        b.add(T.TAG_PHOTOMETRIC, 3, T.PHOTOMETRIC_RGB)
        b.add(T.TAG_SAMPLES_PER_PIXEL, 3, 3)
        b.add(T.TAG_ROWS_PER_STRIP, 4, h)
        b.add(T.TAG_STRIP_OFFSETS, 4, [off])
        b.add(T.TAG_STRIP_BYTE_COUNTS, 4, [len(data)])
        b.add(65420, 4, 1)
        b.add(65421, 11, -1.0)
        builders.append(b)

    for arr, lens in levels:
        emit_jpeg_level(arr, lens)
    emit_macro(macro)

    prev_ptr_pos = 4
    for b in builders:
        if f.tell() % 2:
            f.write(b"\0")
        ifd_offset = f.tell()
        next_ptr_pos = b.write(f)
        end = f.tell()
        f.seek(prev_ptr_pos)
        f.write(struct.pack("<I", ifd_offset))
        f.seek(end)
        prev_ptr_pos = next_ptr_pos
    f.close()
    return {
        "width": width, "height": height, "image": img, "mpp": mpp,
        "tissue_mask": tissue, "lesion_mask": lesion,
        "levels": [a for a, _ in levels], "macro": macro,
    }


def make_mirax_slide(path: str, seed=0, nx=6, ny=5, tile=128, overlap=16,
                     zoom_levels=3, empty_border=1, mpp=0.23,
                     image_format="PNG") -> dict:
    """Write a 3DHISTECH Mirax (MRXS) directory slide per the layout
    ``digipathai_tpu/io/mirax.py`` documents: ``<path>`` preview file +
    sibling ``<stem>/`` directory with Slidedat.ini, a binary Index.dat and
    one Data0000.dat of concatenated tile payloads.

    An ``empty_border``-camera ring is left unoccupied so the non-trivial
    ``bounds`` path (MRXS images start inside a larger virtual canvas) is
    exercised.  ``image_format="PNG"`` keeps tiles lossless so tests can
    compare assembled regions bit-exactly against the returned canvas.
    """
    import os
    import struct
    from io import BytesIO

    from PIL import Image

    adv = tile - overlap
    w0 = (nx - 1) * adv + tile
    h0 = (ny - 1) * adv + tile
    img, tissue, lesion = render_he_like(w0, h0, seed)
    fill_rgb = (250, 248, 246)
    fill_bgr = fill_rgb[2] | (fill_rgb[1] << 8) | (fill_rgb[0] << 16)

    occupied = np.zeros((ny, nx), bool)
    occupied[empty_border:ny - empty_border,
             empty_border:nx - empty_border] = True
    canvas = np.empty_like(img)
    canvas[:] = np.array(fill_rgb, np.uint8)
    occ_mask = np.zeros((h0, w0), bool)
    for ty in range(ny):
        for tx in range(nx):
            if occupied[ty, tx]:
                x0, y0 = tx * adv, ty * adv
                occ_mask[y0:y0 + tile, x0:x0 + tile] = True
    canvas[occ_mask] = img[occ_mask]

    stem, _ = os.path.splitext(str(path))
    slide_dir = stem
    os.makedirs(slide_dir, exist_ok=True)
    slide_id = "DPAI-MIRAX-FIXTURE"

    # preview file (the .mrxs itself is a small image)
    prev = Image.fromarray(canvas[::4, ::4])
    prev.save(str(path), "JPEG", quality=80)

    # data file + per-level index records
    data_path = os.path.join(slide_dir, "Data0000.dat")
    levels_records = []
    with open(data_path, "wb") as df:
        level_img = canvas
        for z in range(zoom_levels):
            if z:
                level_img = level_img[::2, ::2]
            lh, lw = level_img.shape[:2]
            across = max(1, -(-nx // (1 << z)))
            down = max(1, -(-ny // (1 << z)))
            recs = []
            for ty in range(down):
                for tx in range(across):
                    # occupied iff any covered camera position is occupied
                    cams = occupied[ty << z:(ty + 1) << z,
                                    tx << z:(tx + 1) << z]
                    if not cams.any():
                        continue
                    x0, y0 = tx * adv, ty * adv
                    blk = np.empty((tile, tile, 3), np.uint8)
                    blk[:] = np.array(fill_rgb, np.uint8)
                    sub = level_img[y0:y0 + tile, x0:x0 + tile]
                    blk[:sub.shape[0], :sub.shape[1]] = sub
                    buf = BytesIO()
                    Image.fromarray(blk).save(buf, image_format)
                    payload = buf.getvalue()
                    recs.append((ty * across + tx, df.tell(), len(payload), 0))
                    df.write(payload)
            levels_records.append(recs)

    # Index.dat: version + slide id + (hier_root, nonhier_root) + pointer
    # table + one page per zoom level
    idb = BytesIO()
    idb.write(b"01.02")
    idb.write(slide_id.encode())
    root_pos = idb.tell()
    idb.write(struct.pack("<ii", 0, 0))  # patched below
    hier_root = idb.tell()
    idb.write(b"\0" * 4 * zoom_levels)   # pointer table, patched below
    ptrs = []
    for recs in levels_records:
        ptrs.append(idb.tell())
        idb.write(struct.pack("<ii", len(recs), 0))
        for r in recs:
            idb.write(struct.pack("<iiii", *r))
    raw = bytearray(idb.getvalue())
    struct.pack_into("<ii", raw, root_pos, hier_root, 0)
    for j, p in enumerate(ptrs):
        struct.pack_into("<i", raw, hier_root + 4 * j, p)
    with open(os.path.join(slide_dir, "Index.dat"), "wb") as f:
        f.write(raw)

    sections = [
        "[GENERAL]",
        f"SLIDE_ID={slide_id}",
        "SLIDE_VERSION=1.9",
        f"IMAGENUMBER_X={nx}",
        f"IMAGENUMBER_Y={ny}",
        "",
        "[HIERARCHICAL]",
        "HIER_COUNT=1",
        "NONHIER_COUNT=0",
        "INDEXFILE=Index.dat",
        "HIER_0_NAME=Slide zoom level",
        f"HIER_0_COUNT={zoom_levels}",
    ]
    for z in range(zoom_levels):
        sections += [f"HIER_0_VAL_{z}=ZoomLevel_{z}",
                     f"HIER_0_VAL_{z}_SECTION=LAYER_0_LEVEL_{z}_SECTION"]
    sections += ["", "[DATAFILE]", "FILE_COUNT=1", "FILE_0=Data0000.dat"]
    for z in range(zoom_levels):
        sections += [
            "",
            f"[LAYER_0_LEVEL_{z}_SECTION]",
            f"DIGITIZER_WIDTH={tile}",
            f"DIGITIZER_HEIGHT={tile}",
            f"OVERLAP_X={overlap}",
            f"OVERLAP_Y={overlap}",
            f"IMAGE_FORMAT={image_format}",
            f"IMAGE_FILL_COLOR_BGR={fill_bgr}",
            f"MICROMETER_PER_PIXEL_X={mpp * (1 << z)}",
            f"MICROMETER_PER_PIXEL_Y={mpp * (1 << z)}",
        ]
    with open(os.path.join(slide_dir, "Slidedat.ini"), "w",
              encoding="utf-8-sig") as f:
        f.write("\n".join(sections) + "\n")

    bx0, by0 = empty_border * adv, empty_border * adv
    bx1 = (nx - 1 - empty_border) * adv + tile
    by1 = (ny - 1 - empty_border) * adv + tile
    return {
        "width": w0, "height": h0, "canvas": canvas, "fill": fill_rgb,
        "occupied": occupied, "occ_mask": occ_mask, "mpp": mpp,
        "bounds": (bx0, by0, bx1 - bx0, by1 - by0),
        "tissue_mask": tissue, "lesion_mask": lesion,
        "zoom_levels": zoom_levels,
    }


def make_sakura_slide(path: str, seed=0, tile=128, nx=5, ny=4,
                      zoom_levels=3, mpp=0.23, drop_tile=(0, 0),
                      per_channel=True) -> dict:
    """Write a Sakura SVSLIDE fixture per the schema
    ``digipathai_tpu/io/sakura.py`` documents: an SQLite database with
    ``DataManagerSQLiteConfigXPO`` naming the tile table, tiles keyed
    ``"x|y|focal|color|zoom"`` (level-0 pixel origins, power-of-two zooms),
    ``SVHRScanDataXPO`` scan metadata and label/overview blobs reachable from
    ``SVSlideDataXPO``.

    ``per_channel=True`` stores each tile as three single-channel images
    (the Sakura convention); blobs are PNG so tests can compare assembled
    regions bit-exactly (the reader decodes via PIL, codec-agnostic).
    ``drop_tile`` omits one level-0 tile to exercise the white sparse fill.
    """
    import os
    import sqlite3
    from io import BytesIO

    from PIL import Image

    w0, h0 = nx * tile, ny * tile
    img, tissue, lesion = render_he_like(w0, h0, seed)
    canvas = img.copy()
    if drop_tile is not None:
        tx, ty = drop_tile
        canvas[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile] = 255

    if os.path.exists(str(path)):
        os.remove(str(path))
    db = sqlite3.connect(str(path))
    table = "T_DPAI_FIXTURE"
    db.execute("CREATE TABLE DataManagerSQLiteConfigXPO (TableName TEXT)")
    db.execute("INSERT INTO DataManagerSQLiteConfigXPO VALUES (?)", (table,))
    db.execute(f'CREATE TABLE "{table}" (id TEXT PRIMARY KEY, data BLOB)')
    db.execute("CREATE TABLE SVHRScanDataXPO (m_nImageWidth INTEGER,"
               " m_nImageHeight INTEGER, m_nTileWidth INTEGER,"
               " m_nTileHeight INTEGER, m_ResolutionMmPerPix REAL)")
    db.execute("INSERT INTO SVHRScanDataXPO VALUES (?, ?, ?, ?, ?)",
               (w0, h0, tile, tile, mpp / 1000.0))

    def png(arr):
        buf = BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    level_img = img
    for z_idx in range(zoom_levels):
        zoom = 1 << z_idx
        if z_idx:
            level_img = level_img[::2, ::2]
        lh, lw = level_img.shape[:2]
        for ty in range(-(-lh // tile)):
            for tx in range(-(-lw // tile)):
                if zoom == 1 and drop_tile is not None and \
                        (tx, ty) == tuple(drop_tile):
                    continue
                blk = np.full((tile, tile, 3), 255, np.uint8)
                sub = level_img[ty * tile:(ty + 1) * tile,
                                tx * tile:(tx + 1) * tile]
                blk[:sub.shape[0], :sub.shape[1]] = sub
                x0, y0 = tx * tile * zoom, ty * tile * zoom
                if per_channel:
                    for c in range(3):
                        db.execute(
                            f'INSERT INTO "{table}" VALUES (?, ?)',
                            (f"{x0}|{y0}|0|{c}|{zoom}", png(blk[:, :, c])))
                else:
                    db.execute(f'INSERT INTO "{table}" VALUES (?, ?)',
                               (f"{x0}|{y0}|0|0|{zoom}", png(blk)))

    # label + overview referenced from SVSlideDataXPO by OID
    db.execute("CREATE TABLE SVScannedImageDataXPO (OID INTEGER PRIMARY KEY,"
               " m_image BLOB)")
    label = np.full((64, 48, 3), 200, np.uint8)
    label[8:24, 8:40] = (30, 30, 120)
    overview = img[::8, ::8].copy()
    db.execute("INSERT INTO SVScannedImageDataXPO VALUES (1, ?)", (png(label),))
    db.execute("INSERT INTO SVScannedImageDataXPO VALUES (2, ?)",
               (png(overview),))
    db.execute("CREATE TABLE SVSlideDataXPO (m_labelScan INTEGER,"
               " m_overviewScan INTEGER)")
    db.execute("INSERT INTO SVSlideDataXPO VALUES (1, 2)")
    db.commit()
    db.close()

    return {
        "width": w0, "height": h0, "canvas": canvas, "mpp": mpp,
        "tissue_mask": tissue, "lesion_mask": lesion,
        "zoom_levels": zoom_levels, "tile": tile, "drop_tile": drop_tile,
        "label": label, "overview": overview,
    }
