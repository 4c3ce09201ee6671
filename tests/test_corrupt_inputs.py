"""Corrupt / hostile slide-file robustness.

The reference hands every untrusted slide file to battle-hardened C
libraries (OpenSlide at ``reference DigiPathAI/main_server.py:54-55``,
libjpeg/libtiff underneath); our first-party readers must uphold the same
operational contract the server relies on:

* a malformed file may fail to open or read, but only with the documented
  exception set — ``ValueError`` / ``OSError`` / ``struct.error`` (exactly
  what ``io/slide.py::Slide.detect_format`` catches) — never an
  interpreter-level surprise (``TypeError``, ``IndexError``,
  ``ZeroDivisionError``, ``zlib.error``) that would crash a worker thread
  with an unhandled exception class;
* ``Slide.detect_format`` itself NEVER raises on arbitrary bytes (the file
  browser calls it on every file in the served directory);
* a KB-sized corrupt file cannot make the reader allocate GBs: tag counts
  are bounded by the file size before any read buffer is allocated, and
  deflate/LZW payloads are decompression-capped at the size the block
  geometry implies (deflate expands ~1000x, LZW ~2700x).

All mutations are deterministic (fixed seeds / fixed offsets) so failures
reproduce.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from digipathai_tpu.io import tiff_py
from digipathai_tpu.io.slide import Slide
from digipathai_tpu.io.tiff_py import TiffReader, lzw_decode

from tests.fixtures import make_synthetic_slide

#: the full documented reader-failure contract (io/slide.py:380)
ALLOWED = (ValueError, OSError, struct.error)


@pytest.fixture(scope="module")
def small_slide(tmp_path_factory):
    path = tmp_path_factory.mktemp("corrupt") / "clean.tiff"
    make_synthetic_slide(str(path), width=512, height=384)
    return path


def _probe(path):
    """Open + exercise a (possibly corrupt) TIFF.

    Either completes or raises something in ALLOWED; anything else is the
    bug this suite exists to catch.  Returns True if the file was readable.
    """
    try:
        with TiffReader(str(path)) as r:
            for lvl in range(len(r.pages)):
                region = r.read_region(lvl, 0, 0, 64, 64)
                assert region.shape[:2] == (64, 64)
        return True
    except ALLOWED:
        return False


# --- whole-file mutations on a real pyramid --------------------------------


def test_truncated_at_every_scale(tmp_path, small_slide):
    data = Path(small_slide).read_bytes()
    sizes = {0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 25, 26, len(data) - 1}
    n = 64
    while n < len(data):
        sizes.add(n)
        n *= 2
    ok = 0
    for size in sorted(sizes):
        p = tmp_path / f"trunc_{size}.tiff"
        p.write_bytes(data[:size])
        ok += _probe(p)
        assert Slide.detect_format(str(p)) is None or isinstance(
            Slide.detect_format(str(p)), str)
    # the clean-file probe itself must pass (guards against a vacuous test)
    assert _probe(small_slide)
    # severely truncated copies must NOT read as healthy
    assert ok < len(sizes)


def test_bitflip_sweep_header_and_ifd(tmp_path, small_slide):
    data = bytearray(Path(small_slide).read_bytes())
    # The header + first IFD + tag payloads live in the first ~1 KB; flip a
    # byte at a stride that hits every field class at least once.
    for off in range(0, min(1024, len(data)), 7):
        mutated = bytearray(data)
        mutated[off] ^= 0xFF
        p = tmp_path / "flip.tiff"
        p.write_bytes(mutated)
        _probe(p)
        Slide.detect_format(str(p))  # must never raise


def test_random_garbage_with_tiff_magic(tmp_path):
    rng = np.random.default_rng(1234)
    for i in range(16):
        blob = b"II*\x00" + rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
        p = tmp_path / f"garbage_{i}.tiff"
        p.write_bytes(blob)
        assert not _probe(p)
        assert Slide.detect_format(str(p)) is None


# --- hand-built minimal TIFFs targeting specific parser guards --------------


def _minimal_tiff(path, entries, payload=b""):
    """Classic little-endian TIFF: header + one IFD + optional payload.

    ``entries``: (tag, ftype, count, value_field_bytes<=4).  Payload bytes
    land right after the IFD; their absolute offset is returned alongside.
    """
    buf = bytearray(b"II" + struct.pack("<HI", 42, 8))
    buf += struct.pack("<H", len(entries))
    for tag, ftype, count, value in sorted(entries):
        buf += struct.pack("<HHI", tag, ftype, count)
        buf += value[:4].ljust(4, b"\0")
    buf += struct.pack("<I", 0)  # no next IFD
    payload_off = len(buf)
    buf += payload
    Path(path).write_bytes(bytes(buf))
    return payload_off


def _long(v):
    return struct.pack("<I", v)


_DIMS = [(256, 4, 1, _long(64)), (257, 4, 1, _long(64))]


def test_missing_dimensions_is_valueerror(tmp_path):
    p = tmp_path / "nodims.tiff"
    _minimal_tiff(p, [(259, 3, 1, struct.pack("<H", 1))])
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


def test_huge_tag_count_rejected_before_allocation(tmp_path):
    # A single IFD entry claiming 2^31 ASCII bytes: the reader must refuse
    # (count exceeds the file size) rather than asking the OS for a 2 GB
    # read buffer.  Completing instantly IS the assertion — an unguarded
    # os.pread would allocate the full claimed size up front.
    p = tmp_path / "hugecount.tiff"
    _minimal_tiff(p, _DIMS + [(270, 2, 1 << 31, _long(26))])
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


def test_tile_width_without_length_rejected(tmp_path):
    p = tmp_path / "tilemismatch.tiff"
    _minimal_tiff(p, _DIMS + [(322, 4, 1, _long(128))])
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


def test_tile_table_length_mismatch_rejected(tmp_path):
    p = tmp_path / "tabledisagree.tiff"
    _minimal_tiff(p, _DIMS + [
        (322, 4, 1, _long(64)), (323, 4, 1, _long(64)),
        (324, 3, 2, struct.pack("<HH", 8, 8)),  # two tile offsets...
        (325, 3, 1, struct.pack("<H", 4)),      # ...but one byte count
    ])
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


def test_implausible_samples_rejected(tmp_path):
    p = tmp_path / "samples0.tiff"
    _minimal_tiff(p, _DIMS + [(277, 3, 1, struct.pack("<H", 0))])
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


def test_stripless_page_read_is_valueerror(tmp_path):
    # Parses fine (dims only), but reading must hit the strip-table guard,
    # not IndexError.
    p = tmp_path / "stripless.tiff"
    _minimal_tiff(p, _DIMS)
    with TiffReader(str(p)) as r:
        with pytest.raises(ALLOWED):
            r.read_region(0, 0, 0, 16, 16)


def test_empty_tiff_no_pages_is_valueerror(tmp_path):
    p = tmp_path / "noifd.tiff"
    p.write_bytes(b"II" + struct.pack("<HI", 42, 0))
    with pytest.raises(ALLOWED):
        TiffReader(str(p))


# --- decompression bombs ----------------------------------------------------


def test_deflate_bomb_is_capped(tmp_path, small_slide):
    # A 64x64 RGB tile whose deflate payload inflates to 32 MB: the decoder
    # must stop at the 12 KB the geometry implies.
    bomb = zlib.compress(b"\x00" * (32 << 20), 9)
    assert len(bomb) < 64 << 10  # the attack is only interesting if small
    page = tiff_py.TiffPage(width=64, height=64, samples=3,
                            compression=tiff_py.COMPRESSION_DEFLATE_ADOBE)
    with TiffReader(str(small_slide)) as r:
        out = r._decode_block(page, bomb, 64, 64)
    assert out.shape == (64, 64, 3)


class _BitWriter:
    def __init__(self):
        self.acc, self.n, self.out = 0, 0, bytearray()

    def put(self, code, bits):
        self.acc = (self.acc << bits) | code
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def bytes(self):
        if self.n:
            return bytes(self.out) + bytes([(self.acc << (8 - self.n)) & 0xFF])
        return bytes(self.out)


def _lzw_bomb(n_codes: int) -> bytes:
    """An LZW stream of ~n_codes codes expanding to ~n_codes^2/2 bytes.

    Uses the classic code==len(table) growth case: each code appends a
    table entry one byte longer than the last, so output grows
    quadratically while input grows linearly.  Mirrors the decoder's
    early-change bit-width schedule exactly.
    """
    w = _BitWriter()
    bits, table_len = 9, 258
    w.put(256, bits)  # CLEAR
    w.put(0, bits)    # prime prev with b"\x00" (no table growth)
    for _ in range(n_codes):
        w.put(table_len, bits)  # the code the decoder is *about* to define
        table_len += 1
        if table_len + 1 >= (1 << bits) and bits < 12:
            bits += 1
    return w.bytes()


def test_lzw_bomb_is_capped():
    data = _lzw_bomb(1500)  # would expand to ~1.1 MB from ~2 KB
    assert len(lzw_decode(data)) > 1_000_000  # the bomb is real...
    assert len(lzw_decode(data, max_out=4096)) == 4096  # ...and the cap holds


def test_lzw_garbage_first_code_is_valueerror():
    with pytest.raises(ALLOWED):
        lzw_decode(b"\xff\xff\xff\xff")  # first code 511: empty-table ref


# --- vendor container formats (corrupt METADATA, not just corrupt TIFF) -----


def test_mirax_corrupt_slidedat_is_valueerror(tmp_path):
    # Content before the first [SECTION] raises MissingSectionHeaderError
    # (a configparser.Error, NOT in the reader contract) from an unguarded
    # read_file — the open boundary must translate it.
    slide_dir = tmp_path / "slide"
    slide_dir.mkdir()
    (slide_dir / "Slidedat.ini").write_text("not an ini at all\n= broken\n")
    mrxs = tmp_path / "slide.mrxs"
    mrxs.write_bytes(b"\x00" * 64)
    assert Slide.detect_format(str(mrxs)) == "mirax"  # detection is by layout
    with pytest.raises(ALLOWED):
        Slide(str(mrxs))


def test_vms_corrupt_index_is_valueerror(tmp_path):
    vms = tmp_path / "slide.vms"
    vms.write_text("garbage before any section\n"
                   "[Virtual Microscope Specimen]\nNoImages=1\n")
    assert Slide.detect_format(str(vms)) == "hamamatsu"
    with pytest.raises(ALLOWED):
        Slide(str(vms))


def test_sakura_dangling_tile_table_is_valueerror(tmp_path):
    # A structurally valid SQLite db whose config row names a table that
    # does not exist: detection passes (schema tables are present), the
    # tile scan's sqlite3.OperationalError must surface as ValueError.
    import sqlite3

    p = tmp_path / "slide.svslide"
    db = sqlite3.connect(str(p))
    db.execute("CREATE TABLE SVSlideDataXPO (m_labelScan, m_overviewScan)")
    db.execute("CREATE TABLE DataManagerSQLiteConfigXPO (TableName)")
    db.execute("INSERT INTO DataManagerSQLiteConfigXPO VALUES ('Gone')")
    db.commit()
    db.close()
    assert Slide.detect_format(str(p)) == "sakura"
    with pytest.raises(ALLOWED):
        Slide(str(p))


def test_sakura_garbage_db_detects_none(tmp_path):
    p = tmp_path / "slide.svslide"
    p.write_bytes(b"SQLite format 3\x00" + bytes(range(256)))
    assert Slide.detect_format(str(p)) is None


def test_ndpi_jpeg_header_guards():
    from digipathai_tpu.io.ndpi import parse_jpeg_header

    # SOS before any SOF: pre-guard this parsed "fine" and later blew up
    # with AttributeError on the unset __slots__ field
    sos_only = b"\xff\xd8" + b"\xff\xda\x00\x04\x01\x00" + b"\x00" * 8
    with pytest.raises(ALLOWED):
        parse_jpeg_header(sos_only, 0)
    # SOF whose component table runs past the buffer: pre-guard IndexError
    trunc_sof = (b"\xff\xd8" + b"\xff\xc0\x00\x11"
                 + b"\x08\x00\x40\x00\x40\x03")
    with pytest.raises(ALLOWED):
        parse_jpeg_header(trunc_sof, 0)


def test_ndpi_mutations_keep_contract(tmp_path):
    """NDPI adds first-party JPEG header parsing + restart-marker surgery on
    top of the TIFF layer; mutations must stay inside the reader contract
    (no AttributeError from a SOF-less stream, no IndexError from a short
    restart index or truncated SOF)."""
    from tests.fixtures import make_ndpi_slide

    clean = tmp_path / "clean.ndpi"
    make_ndpi_slide(str(clean))
    data = Path(clean).read_bytes()

    def drive(p):
        try:
            s = Slide(str(p))
            try:
                region = s.read_region((0, 0), 0, (64, 64))
                assert region.shape[:2] == (64, 64)
            finally:
                s.close()
            return True
        except ALLOWED:
            return False

    assert drive(clean)  # non-vacuous
    for size in (64, len(data) // 4, len(data) // 2, len(data) - 16):
        q = tmp_path / "trunc.ndpi"
        q.write_bytes(data[:size])
        drive(q)
        Slide.detect_format(str(q))  # must never raise
    for off in range(0, 4096, 29):  # JPEG/TIFF header region
        q = tmp_path / "flip.ndpi"
        mutated = bytearray(data)
        mutated[off] ^= 0xFF
        q.write_bytes(mutated)
        drive(q)


def test_leica_malformed_scn_xml_is_valueerror(tmp_path):
    """sniff_vendor classifies 'leica' by substring, so the SCN XML reaching
    leica_layout can be arbitrarily broken; ParseError/StopIteration/
    TypeError must all surface as ValueError."""
    from tests.fixtures import make_scn_slide

    scn = tmp_path / "slide.scn"
    make_scn_slide(str(scn))
    good = Path(scn).read_bytes()
    marker = b"<scn"
    pos = good.find(marker)
    assert pos > 0
    for mutation in (
        good.replace(b"<collection", b"<collection <<", 1),  # ParseError
        good.replace(b"collection", b"kollection"),          # missing element
        good.replace(b'ifd="', b'xfd="'),                    # missing attr
    ):
        bad = tmp_path / "bad.scn"
        bad.write_bytes(mutation)
        fmt = Slide.detect_format(str(bad))  # must never raise
        if fmt is None:
            continue
        try:
            s = Slide(str(bad))
            s.close()
        except ALLOWED:
            pass


def test_mirax_index_mutations_keep_contract(tmp_path):
    """Index.dat is a first-party binary parser: truncations and bit flips
    must stay inside the reader contract (struct.error is allowed; a cyclic
    next-pointer must raise, not hang)."""
    from tests.fixtures import make_mirax_slide

    mrxs = tmp_path / "slide.mrxs"
    make_mirax_slide(str(mrxs))
    idx = tmp_path / "slide" / "Index.dat"
    data = Path(idx).read_bytes()

    def drive():
        try:
            s = Slide(str(mrxs))
            try:
                region = s.read_region((0, 0), 0, (64, 64))
                assert region.shape[:2] == (64, 64)
            finally:
                s.close()
            return True
        except ALLOWED:
            return False

    assert drive()  # non-vacuous
    for size in (0, 8, len(data) // 2):
        idx.write_bytes(data[:size])
        drive()
    for off in range(0, min(512, len(data)), 11):
        mutated = bytearray(data)
        mutated[off] ^= 0xFF
        idx.write_bytes(mutated)
        drive()
    idx.write_bytes(data)
    assert drive()  # restored file still reads


def test_vms_payload_mutations_keep_contract(tmp_path):
    from tests.fixtures import make_vms_slide

    vms = tmp_path / "slide.vms"
    make_vms_slide(str(vms))
    # corrupt every payload file the index references, one at a time
    payloads = [p for p in tmp_path.iterdir() if p.suffix != ".vms"]
    assert payloads
    for target in payloads:
        blob = target.read_bytes()
        try:
            target.write_bytes(blob[: max(4, len(blob) // 3)])
            try:
                s = Slide(str(vms))
                try:
                    s.read_region((0, 0), 0, (64, 64))
                finally:
                    s.close()
            except ALLOWED:
                pass
        finally:
            target.write_bytes(blob)


# --- server surface -----------------------------------------------------------


def test_server_corrupt_slide_404s_and_listing_survives(tmp_path):
    """A corrupt slide dropped into the served directory must neither break
    the file listing (reference: OpenSlide.detect_format filter at
    ``main_server.py:70-89``) nor 500 the viewer/tile routes."""
    import threading
    import urllib.error
    import urllib.request

    from digipathai_tpu.server.app import ServerConfig, create_app
    from digipathai_tpu.server.wsgi_kit import serve

    good = tmp_path / "liver-good-1.tiff"
    make_synthetic_slide(str(good), 256, 192, seed=7)
    corrupt = tmp_path / "liver-bad-1.tiff"
    corrupt.write_bytes(Path(good).read_bytes()[:900])  # parses, reads fail
    # MRXS with a clobbered binary index: opening raises struct.error
    # (allowed by the reader contract) — the server must 404 it, not 500
    # (regression: _get_dz originally caught only ValueError/OSError)
    from tests.fixtures import make_mirax_slide

    make_mirax_slide(str(tmp_path / "liver-mrx-1.mrxs"))
    with open(tmp_path / "liver-mrx-1" / "Index.dat", "r+b") as f:
        f.write(b"\xff" * 32)

    app = create_app(ServerConfig(slide_dir=str(tmp_path), viewer_only=True))
    httpd = serve(app, host="127.0.0.1", port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def get(path):
            url = f"http://127.0.0.1:{httpd.server_port}{path}"
            try:
                with urllib.request.urlopen(url, timeout=30) as r:
                    return r.status, r.read()
            except urllib.error.HTTPError as e:
                return e.code, e.read()

        status, body = get("/")
        assert status == 200 and b"liver-good-1.tiff" in body
        status, _ = get("/liver-good-1.tiff.dzi")
        assert status == 200
        # the corrupt slides: any route must answer 404, never 500
        for route in ("/liver-bad-1.tiff.dzi",
                      "/liver-bad-1.tiff_files/0/0_0.jpeg",
                      "/liver-bad-1.tiff",
                      "/liver-mrx-1.mrxs.dzi",
                      "/liver-mrx-1.mrxs_files/0/0_0.jpeg"):
            status, _ = get(route)
            assert status == 404, f"{route} -> {status}"
    finally:
        httpd.shutdown()


# --- native backend ----------------------------------------------------------


def test_native_backend_rejects_corrupt_files_cleanly(tmp_path, small_slide):
    native = pytest.importorskip("digipathai_tpu.io.native")
    if not native.available():
        pytest.skip("native backend not built")
    data = Path(small_slide).read_bytes()
    cases = {
        "trunc.tiff": data[: len(data) // 3],
        "garbage.tiff": b"II*\x00" + bytes(range(256)) * 2,
        "empty.tiff": b"",
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        try:
            r = native.NativeTiffReader(str(p))
            # open may legitimately succeed on a truncated pyramid (libtiff
            # parses lazily); reads must then fail cleanly, not crash
            try:
                r.read_region(0, 0, 0, 64, 64)
            finally:
                r.close()
        except ALLOWED:
            pass


# --- fd-leak regression on open rejects -------------------------------------
# The server retries Slide(path) on every tile request for a bad slide, so a
# reader that raises at open while holding a handle (sqlite connection,
# per-column JPEG fds) exhausts the fd limit over time.  These pin the
# cleanup-on-reject behavior of the readers' __init__ guards.


def _open_fd_count() -> int:
    import os

    return len(os.listdir("/proc/self/fd"))


def test_sakura_open_reject_does_not_leak_fds(tmp_path):
    import sqlite3

    p = tmp_path / "slide.svslide"
    db = sqlite3.connect(str(p))
    db.execute("CREATE TABLE SVSlideDataXPO (m_labelScan, m_overviewScan)")
    db.execute("CREATE TABLE DataManagerSQLiteConfigXPO (TableName)")
    db.execute("INSERT INTO DataManagerSQLiteConfigXPO VALUES ('Gone')")
    db.commit()
    db.close()
    before = _open_fd_count()
    for _ in range(16):
        with pytest.raises(ALLOWED):
            Slide(str(p))
    # unrelated runtime threads may open a handful of fds concurrently;
    # a leak here would add exactly one per iteration
    assert _open_fd_count() - before < 8


def test_vms_open_reject_does_not_leak_fds(tmp_path):
    from tests.fixtures import make_vms_slide

    vms = tmp_path / "slide.vms"
    make_vms_slide(str(vms), width=256, height=128, columns=2)
    # drop the second column's index entry but keep NoJpegColumns=2: column 0
    # opens its JPEG before resolve(ImageFile(1)) rejects the index
    lines = [ln for ln in vms.read_text().splitlines()
             if not ln.startswith("ImageFile(1)=")]
    vms.write_text("\n".join(lines) + "\n")
    before = _open_fd_count()
    for _ in range(16):
        with pytest.raises(ALLOWED):
            Slide(str(vms))
    assert _open_fd_count() - before < 8


def test_vms_corrupt_column_payload_does_not_leak_fds(tmp_path):
    # The column file itself is garbage: _JpegColumn raises AFTER os.open
    # (parse_jpeg_header), so the fd must be closed by the column's own
    # guard — VmsReader's cleanup only sees columns already appended.
    from tests.fixtures import make_vms_slide

    vms = tmp_path / "slide.vms"
    make_vms_slide(str(vms), width=256, height=128, columns=2)
    (tmp_path / "slide_c0.jpg").write_bytes(b"\xff\xd8" + bytes(range(64)))
    before = _open_fd_count()
    for _ in range(16):
        with pytest.raises(ALLOWED):
            Slide(str(vms))
    assert _open_fd_count() - before < 8


def test_vmu_bad_ngr_magic_does_not_leak_fds(tmp_path):
    from tests.fixtures import make_vmu_slide

    vmu = tmp_path / "slide.vmu"
    make_vmu_slide(str(vmu), width=128, height=64)
    # find the NGR image file the index names and corrupt its magic
    import configparser

    cp = configparser.ConfigParser(strict=False)
    cp.read(str(vmu), encoding="utf-8")
    sec = cp[cp.sections()[0]]
    ngr = tmp_path / sec["ImageFile"]
    ngr.write_bytes(b"XX" + ngr.read_bytes()[2:])
    before = _open_fd_count()
    for _ in range(16):
        with pytest.raises(ALLOWED):
            Slide(str(vmu))
    assert _open_fd_count() - before < 8
