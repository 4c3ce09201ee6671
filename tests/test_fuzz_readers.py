"""Seeded randomized fuzzing of the first-party slide readers.

``tests/test_corrupt_inputs.py`` pins *hand-aimed* corruptions — each case
is a regression test for one specific guard.  This suite complements it
with *unaimed* seeded random mutation sweeps: byte flips, truncations, and
aggressive 4-byte word splats across the structure-dense regions of every
first-party container format.  The contract under fuzz is the same one the
server relies on (reference hands untrusted files to battle-tested C
libraries at ``DigiPathAI/main_server.py:54-55``; our readers must be as
calm):

* opening/reading a mutant either succeeds (garbage pixels are fine) or
  raises only the documented ``ValueError`` / ``OSError`` / ``struct.error``
  set — never ``TypeError`` / ``IndexError`` / ``KeyError`` /
  ``MemoryError`` / ``zlib.error`` / sqlite3 surprises;
* ``Slide.detect_format`` NEVER raises on any bytes (the file browser runs
  it over the whole served directory);
* a KB-scale mutant cannot balloon allocations: word-splat mutations plant
  0xFFFFFFFF / 0x7FFFFFFF into tag counts, dims, and offsets on purpose.

Every mutation is derived from ``np.random.default_rng(seed)`` with fixed
seeds, so any failure reproduces exactly.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide
from digipathai_tpu.io.tiff_py import TiffReader

from tests.fixtures import (
    make_philips_slide,
    make_sakura_slide,
    make_synthetic_slide,
    make_trestle_slide,
    make_ventana_slide,
)

#: the documented reader-failure contract (io/slide.py::Slide.detect_format)
ALLOWED = (ValueError, OSError, struct.error)

# Aggressive word values: allocation bombs (huge counts/dims/offsets),
# zeros (div-by-zero / empty-geometry bait), and off-by-one sentinels.
SPLATS = (0x00000000, 0x00000001, 0x7FFFFFFF, 0xFFFFFFFF, 0x80000000)


def probe_tiff(path) -> bool:
    """Open + exercise a (possibly mutant) TIFF through the generic reader.

    Either completes or raises inside ALLOWED; any other exception class is
    the bug this suite exists to catch.  Returns True when readable.
    """
    assert Slide.detect_format(str(path)) or True  # must never raise
    try:
        with TiffReader(str(path)) as r:
            for lvl in range(len(r.pages)):
                r.read_region(lvl, 0, 0, 64, 64)
            # far-corner read exercises clamping against mutant dims
            w, h = r.pages[0].width, r.pages[0].height
            r.read_region(0, max(0, w - 32), max(0, h - 32), 64, 64)
        return True
    except ALLOWED:
        return False


def probe_slide(path) -> bool:
    """Same contract through the vendor-dispatching Slide facade."""
    assert Slide.detect_format(str(path)) or True  # must never raise
    try:
        s = Slide(str(path))
        try:
            s.read_region((0, 0), 0, (64, 64))
            lvl = s.level_count - 1
            s.read_region((0, 0), lvl, (32, 32))
        finally:
            s.close()
        return True
    except ALLOWED:
        return False


def byteflip_mutants(data: bytes, n: int, seed: int, lo=0, hi=None,
                     max_flips=8):
    """Yield n deterministic mutants with 1..max_flips random byte flips."""
    hi = len(data) if hi is None else min(hi, len(data))
    rng = np.random.default_rng(seed)
    for _ in range(n):
        m = bytearray(data)
        for _ in range(int(rng.integers(1, max_flips + 1))):
            off = int(rng.integers(lo, hi))
            m[off] ^= int(rng.integers(1, 256))
        yield bytes(m)


def wordsplat_mutants(data: bytes, n: int, seed: int, lo=0, hi=None):
    """Yield n mutants with one aligned 4-byte span replaced by a SPLAT."""
    hi = len(data) if hi is None else min(hi, len(data))
    rng = np.random.default_rng(seed)
    for _ in range(n):
        m = bytearray(data)
        off = int(rng.integers(lo, max(lo + 1, hi - 4))) & ~3
        word = SPLATS[int(rng.integers(0, len(SPLATS)))]
        m[off:off + 4] = struct.pack("<I", word)
        yield bytes(m)


@pytest.fixture(scope="module")
def clean_tiff_bytes(tmp_path_factory):
    path = tmp_path_factory.mktemp("fuzz") / "clean.tiff"
    make_synthetic_slide(str(path), width=512, height=384)
    return Path(path).read_bytes()


# --- generic TIFF layer -------------------------------------------------------


def test_tiff_byteflip_fuzz(tmp_path, clean_tiff_bytes):
    q = tmp_path / "m.tiff"
    q.write_bytes(clean_tiff_bytes)
    assert probe_tiff(q)  # non-vacuous: the clean fixture reads
    readable = 0
    for m in byteflip_mutants(clean_tiff_bytes, n=120, seed=101):
        q.write_bytes(m)
        readable += probe_tiff(q)
    # flips mostly land in JPEG payload; most mutants should still read
    assert readable > 0


def test_tiff_header_region_fuzz(tmp_path, clean_tiff_bytes):
    """Dense flips inside the first 4 KB — magic, IFD chain, tag dirs."""
    q = tmp_path / "m.tiff"
    for m in byteflip_mutants(clean_tiff_bytes, n=150, seed=202, hi=4096,
                              max_flips=4):
        q.write_bytes(m)
        probe_tiff(q)


def test_tiff_ifd_tail_fuzz(tmp_path, clean_tiff_bytes):
    """The IFD directory of the written pyramid sits near EOF (offsets are
    appended after payload); fuzz the last 8 KB where tag words live."""
    lo = max(0, len(clean_tiff_bytes) - 8192)
    q = tmp_path / "m.tiff"
    for m in byteflip_mutants(clean_tiff_bytes, n=150, seed=303, lo=lo):
        q.write_bytes(m)
        probe_tiff(q)


def test_tiff_wordsplat_fuzz(tmp_path, clean_tiff_bytes):
    """Plant allocation-bomb words into header and IFD-tail regions: a
    mutant tag count / dim / offset of 0x7FFFFFFF must be rejected by the
    size-vs-file bound checks, not allocated."""
    q = tmp_path / "m.tiff"
    for m in wordsplat_mutants(clean_tiff_bytes, n=100, seed=404, hi=4096):
        q.write_bytes(m)
        probe_tiff(q)
    lo = max(0, len(clean_tiff_bytes) - 8192)
    for m in wordsplat_mutants(clean_tiff_bytes, n=100, seed=505, lo=lo):
        q.write_bytes(m)
        probe_tiff(q)


def test_tiff_truncation_sweep(tmp_path, clean_tiff_bytes):
    n = len(clean_tiff_bytes)
    q = tmp_path / "m.tiff"
    sizes = sorted({0, 1, 2, 3, 4, 7, 8, 9, 16, 64, 200, n // 4, n // 2,
                    3 * n // 4, n - 64, n - 9, n - 1})
    for size in sizes:
        q.write_bytes(clean_tiff_bytes[:max(0, size)])
        probe_tiff(q)


def test_detect_format_arbitrary_bytes_never_raises(tmp_path):
    rng = np.random.default_rng(606)
    q = tmp_path / "blob"
    magics = (b"", b"II*\x00", b"MM\x00*", b"II+\x00", b"SQLite format 3\x00",
              b"GIF89a", b"\xff\xd8\xff", b"<?xml")
    for i in range(60):
        blob = magics[i % len(magics)] + rng.bytes(int(rng.integers(0, 512)))
        q.write_bytes(blob)
        Slide.detect_format(str(q))  # contract: never raises
    # empty + directory paths
    q.write_bytes(b"")
    Slide.detect_format(str(q))
    Slide.detect_format(str(tmp_path))
    Slide.detect_format(str(tmp_path / "does-not-exist.tiff"))


# --- vendor containers --------------------------------------------------------


def test_sakura_byteflip_fuzz(tmp_path):
    """SVSLIDE is an SQLite db: flips corrupt the db header, page tree, and
    blob payloads; sqlite3.DatabaseError must surface as ALLOWED."""
    p = tmp_path / "slide.svslide"
    make_sakura_slide(str(p))
    data = Path(p).read_bytes()
    q = tmp_path / "m.svslide"
    q.write_bytes(data)
    assert probe_slide(q)  # non-vacuous
    for m in byteflip_mutants(data, n=60, seed=707, hi=4096):
        q.write_bytes(m)
        probe_slide(q)
    for m in byteflip_mutants(data, n=60, seed=808):
        q.write_bytes(m)
        probe_slide(q)


@pytest.mark.parametrize("maker,name", [
    (make_philips_slide, "p.tiff"),
    (make_ventana_slide, "v.bif"),
    (make_trestle_slide, "t.tif"),
])
def test_vendor_tiff_header_fuzz(tmp_path, maker, name):
    """Philips/Ventana/Trestle ride the TIFF layer plus vendor metadata
    (XML description / OverlapsXY); fuzz the header+description region."""
    p = tmp_path / name
    maker(str(p))
    data = Path(p).read_bytes()
    q = tmp_path / ("m" + Path(name).suffix)
    q.write_bytes(data)
    assert probe_slide(q)  # non-vacuous
    for m in byteflip_mutants(data, n=50, seed=909, hi=8192, max_flips=4):
        q.write_bytes(m)
        probe_slide(q)
    for m in wordsplat_mutants(data, n=40, seed=1010, hi=8192):
        q.write_bytes(m)
        probe_slide(q)
