"""Hamamatsu NDPI reader (io/ndpi.py) against synthetic NDPI fixtures.

Fixtures are written by ``tests.fixtures.make_ndpi_slide`` with the real
format's conventions: one JPEG stream per level strip, DRI restart markers
every MCU row, NDPI private tags, resolution in cm.  The surgery path
(restart-marker splicing) is forced by shrinking the full-decode limit and
must reproduce the whole-stream decode exactly (4:4:4; restart markers
reset DC predictors) or near-exactly (4:2:0, where libjpeg's fancy chroma
upsampling uses rows across band boundaries).

Reference capability: NDPI opens via OpenSlide in the reference
(``main_server.py:54-55``).
"""

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide

from fixtures import make_ndpi_slide


@pytest.fixture(scope="module")
def ndpi_444(tmp_path_factory):
    d = tmp_path_factory.mktemp("ndpi")
    path = str(d / "slide_444.ndpi")
    meta = make_ndpi_slide(path, 1024, 768, seed=4, subsampling=0)
    return path, meta


@pytest.fixture(scope="module")
def ndpi_420(tmp_path_factory):
    d = tmp_path_factory.mktemp("ndpi")
    path = str(d / "slide_420.ndpi")
    meta = make_ndpi_slide(path, 1024, 768, seed=5, subsampling=2)
    return path, meta


class TestDetectAndOpen:
    def test_detect_format(self, ndpi_444):
        path, _ = ndpi_444
        assert Slide.detect_format(path) == "hamamatsu"

    def test_levels_and_metadata(self, ndpi_444):
        path, meta = ndpi_444
        with Slide(path) as s:
            assert s.level_count == 2
            assert s.level_dimensions[0] == (1024, 768)
            assert s.level_dimensions[1] == (256, 192)
            assert s.level_downsamples[1] == pytest.approx(4.0)
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.01)
            assert s.properties.get("openslide.objective-power") == 40.0

    def test_associated_macro(self, ndpi_444):
        path, meta = ndpi_444
        with Slide(path) as s:
            imgs = s.associated_images
            assert "macro" in imgs
            np.testing.assert_array_equal(imgs["macro"], meta["macro"])

    def test_content_matches_source(self, ndpi_444):
        path, meta = ndpi_444
        with Slide(path) as s:
            lvl0 = s.read_level(0)
        diff = np.abs(lvl0.astype(np.int16) - meta["image"].astype(np.int16))
        assert diff.mean() < 6.0  # JPEG q92 + noisy fixture tolerance


class TestSurgery:
    def _force_surgery(self, monkeypatch):
        from digipathai_tpu.io import ndpi as M

        monkeypatch.setattr(M, "_FULL_DECODE_PX", 0)

    def test_banded_reads_match_whole_decode_exactly(self, ndpi_444,
                                                     monkeypatch):
        path, _ = ndpi_444
        with Slide(path) as s:
            truth = s.read_level(0)
        self._force_surgery(monkeypatch)
        with Slide(path) as s:
            rng = np.random.default_rng(0)
            for _ in range(6):
                x = int(rng.integers(0, 900))
                y = int(rng.integers(0, 640))
                w, h = 120, 97
                got = s.read_region((x, y), 0, (w, h))
                np.testing.assert_array_equal(got, truth[y:y + h, x:x + w])

    def test_banded_reads_420_near_exact(self, ndpi_420, monkeypatch):
        path, _ = ndpi_420
        with Slide(path) as s:
            truth = s.read_level(0).astype(np.int16)
        self._force_surgery(monkeypatch)
        with Slide(path) as s:
            got = s.read_level(0).astype(np.int16)
        diff = np.abs(got - truth)
        # fancy chroma upsampling context differs only at band boundaries
        assert diff.max() <= 16
        assert diff.mean() < 0.2

    def test_oob_zero_fill(self, ndpi_444, monkeypatch):
        path, _ = ndpi_444
        self._force_surgery(monkeypatch)
        with Slide(path) as s:
            r = s.read_region((-64, -64), 0, (128, 128))
            assert r[:64, :64].max() == 0
            assert r[64:, 64:].mean() > 0

    def test_level1_small_uses_whole_decode(self, ndpi_444):
        path, meta = ndpi_444
        with Slide(path) as s:
            lvl1 = s.read_level(1)
        src = meta["levels"][1]
        diff = np.abs(lvl1.astype(np.int16) - src.astype(np.int16))
        assert diff.mean() < 7.0


class TestMcuStartsFastPath:
    def test_mcu_starts_tag_used_and_exact(self, tmp_path, monkeypatch):
        """With tag 65426 present the reader must skip the entropy scan and
        still produce surgery reads identical to the whole decode."""
        from digipathai_tpu.io import ndpi as M

        path = str(tmp_path / "mcu.ndpi")
        make_ndpi_slide(path, 768, 512, seed=8, subsampling=0,
                        mcu_starts=True)
        with Slide(path) as s:
            truth = s.read_level(0)
        monkeypatch.setattr(M, "_FULL_DECODE_PX", 0)
        scan_called = []
        orig = M.NdpiReader._scan_rsts
        monkeypatch.setattr(M.NdpiReader, "_scan_rsts",
                            lambda self, info: scan_called.append(1)
                            or orig(self, info))
        with Slide(path) as s:
            got = s.read_region((96, 64), 0, (256, 200))
        np.testing.assert_array_equal(got, truth[64:264, 96:352])
        assert not scan_called, "McuStarts fast path was not taken"


class TestSofPatch:
    def test_sof_lies_decodes_by_tiff_dims(self, tmp_path):
        path = str(tmp_path / "lies.ndpi")
        meta = make_ndpi_slide(path, 512, 384, seed=6, subsampling=0,
                               sof_lies=True)
        with Slide(path) as s:
            assert s.level_dimensions[0] == (512, 384)
            lvl0 = s.read_level(0)
        diff = np.abs(lvl0.astype(np.int16) - meta["image"].astype(np.int16))
        assert diff.mean() < 6.0


class TestPipelineSmoke:
    def test_deepzoom_serves_ndpi_tiles(self, ndpi_444):
        from digipathai_tpu.io.deepzoom import DeepZoomGenerator

        path, _ = ndpi_444
        with Slide(path) as s:
            dz = DeepZoomGenerator(s, tile_size=254, overlap=1)
            lvl = dz.level_count - 1
            tile = dz.get_tile(lvl, (0, 0))
            assert np.asarray(tile).shape[0] > 0

    def test_planner_runs_on_ndpi(self, ndpi_444):
        from digipathai_tpu.engine.planner import plan_patches

        path, _ = ndpi_444
        with Slide(path) as s:
            plan = plan_patches(s, 256, 128, 8)
            assert plan.total_patches > 0

    def test_engine_end_to_end_on_ndpi(self, ndpi_444, tmp_path,
                                       monkeypatch):
        """getSegmentation drives loader+stitcher+writer through the NDPI
        surgery reader; the analytic oracle model recovers the lesion."""
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        path, meta = ndpi_444
        mask = tmp_path / "n-dgai-mask.tiff"
        out = getSegmentation(
            img_path=path, patch_size=128, stride_size=128, batch_size=8,
            quick=True, model="oracle", mode="breast",
            probs_path=str(tmp_path / "n-p.tiff"), mask_path=str(mask),
            uncertainty_path=str(tmp_path / "n-u.tiff"),
            supertile=512, num_workers=4)
        assert out.shape == (1024, 768)
        pred = (out.T >= 128)
        gt = meta["lesion_mask"]
        inter = (pred & gt).sum()
        union = (pred | gt).sum()
        assert inter / max(union, 1) > 0.8
        with Slide(str(mask)) as sm:
            assert sm.dimensions == (1024, 768)
