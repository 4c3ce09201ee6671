"""Hamamatsu VMS/VMU readers (io/hamamatsu.py).

Reference capability: OpenSlide's hamamatsu driver (``reference
DigiPathAI/main_server.py:54-55``).  The JPEG column access reuses the
NDPI restart-marker surgery, so banded reads must be bit-identical to a
whole-stream decode; the NGR raw path is exact by construction.
"""

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide

from tests.fixtures import make_vms_slide, make_vmu_slide


@pytest.fixture(scope="module")
def vms(tmp_path_factory):
    d = tmp_path_factory.mktemp("vms")
    p = d / "fix.vms"
    meta = make_vms_slide(str(p))
    return str(p), meta


@pytest.fixture(scope="module")
def vmu(tmp_path_factory):
    d = tmp_path_factory.mktemp("vmu")
    p = d / "fix.vmu"
    meta = make_vmu_slide(str(p))
    return str(p), meta


class TestVms:
    def test_detect(self, vms):
        assert Slide.detect_format(vms[0]) == "hamamatsu"

    def test_geometry_and_mpp(self, vms):
        path, meta = vms
        with Slide(path) as s:
            assert s.level_count == 1
            assert s.dimensions == (meta["width"], meta["height"])
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.01)

    def test_banded_reads_match_whole_decode(self, vms):
        """Restart-surgery reads across the column seam and band
        boundaries equal decoding the full JPEGs (bit-exact)."""
        path, meta = vms
        with Slide(path) as s:
            whole = s.read_region((0, 0), 0, s.dimensions)
            # spans both columns + interior band boundary
            r = s.read_region((meta["width"] // 2 - 64, 200), 0, (128, 128))
            np.testing.assert_array_equal(
                r, whole[200:328,
                         meta["width"] // 2 - 64:meta["width"] // 2 + 64])
            # decodes resemble the rendered source (JPEG lossy)
            err = np.abs(whole.astype(int) - meta["image"].astype(int))
            assert err.mean() < 8

    def test_associated_images(self, vms):
        path, meta = vms
        with Slide(path) as s:
            assoc = s.associated_images
            assert set(assoc) == {"map", "macro"}
            assert assoc["macro"].shape[:2] == meta["macro"].shape[:2]
            assert assoc["map"].shape[:2] == meta["map"].shape[:2]


class TestVmu:
    def test_detect(self, vmu):
        assert Slide.detect_format(vmu[0]) == "hamamatsu"

    def test_exact_pixels(self, vmu):
        """NGR is raw: reads must be exactly the rendered image (the 16->8
        bit mapping takes the high byte, which the fixture round-trips)."""
        path, meta = vmu
        with Slide(path) as s:
            assert s.dimensions == (meta["width"], meta["height"])
            whole = s.read_region((0, 0), 0, s.dimensions)
            np.testing.assert_array_equal(whole, meta["image"])
            # region crossing a column-block boundary
            r = s.read_region((100, 50), 0, (80, 60))
            np.testing.assert_array_equal(r, meta["image"][50:110, 100:180])

    def test_mpp(self, vmu):
        path, meta = vmu
        with Slide(path) as s:
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.01)


def test_vms_segments_end_to_end(tmp_path):
    """Full engine pass over a VMS slide (quick mode, oracle-free random
    weights are fine — exercises planner/loader/stitcher against the
    banded JPEG reader)."""
    import os

    os.environ.setdefault("DPAI_OFFLINE", "1")
    from digipathai_tpu import getSegmentation

    meta = make_vms_slide(str(tmp_path / "case.vms"), width=768, height=512)
    getSegmentation(img_path=str(tmp_path / "case.vms"),
                    mask_path=str(tmp_path / "m.tiff"),
                    probs_path=str(tmp_path / "p.tiff"),
                    uncertainty_path=str(tmp_path / "u.tiff"),
                    quick=True, mode="colon", status={})
    with Slide(str(tmp_path / "m.tiff")) as s:
        assert s.dimensions == (meta["width"], meta["height"])
