"""MRXS (Mirax) directory-format reader (io/mirax.py).

Reference capability being reproduced: OpenSlide's mirax driver, reachable
from the reference server's directory scan (``reference
DigiPathAI/main_server.py:54-55``).  Fixtures are self-authored per the
documented layout (no real MRXS slide exists in this offline environment —
see the io/mirax.py caveat and PARITY.md).
"""

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide


@pytest.fixture(scope="module")
def mirax(tmp_path_factory):
    from tests.fixtures import make_mirax_slide

    d = tmp_path_factory.mktemp("mirax")
    path = str(d / "m-slide.mrxs")
    meta = make_mirax_slide(path, seed=5)
    return path, meta


class TestMiraxReader:
    def test_detect_format(self, mirax, tmp_path):
        path, _ = mirax
        assert Slide.detect_format(path) == "mirax"
        # a bare .mrxs without the sibling dir is not a slide
        lone = tmp_path / "lone.mrxs"
        lone.write_bytes(b"\xff\xd8\xff\xe0 not a slide")
        assert Slide.detect_format(str(lone)) is None

    def test_geometry_and_mpp(self, mirax):
        path, meta = mirax
        with Slide(path) as s:
            assert s.level_count == meta["zoom_levels"]
            assert s.dimensions == (meta["width"], meta["height"])
            w0, h0 = s.dimensions
            assert s.level_dimensions[1] == (-(-w0 // 2), -(-h0 // 2))
            assert s.level_downsamples[0] == 1.0
            assert abs(s.level_downsamples[1] - 2.0) < 0.01
            assert abs(s.mpp - meta["mpp"]) < 1e-9

    def test_level0_exact(self, mirax):
        """PNG tiles are lossless: assembled level 0 == source canvas."""
        path, meta = mirax
        with Slide(path) as s:
            got = s.read_region((0, 0), 0, s.dimensions)
        np.testing.assert_array_equal(got, meta["canvas"])

    def test_read_region_offsets_and_fill(self, mirax):
        path, meta = mirax
        bx, by, bw, bh = meta["bounds"]
        with Slide(path) as s:
            # interior region crossing tile and overlap boundaries
            r = s.read_region((bx + 33, by + 21), 0, (200, 150))
            np.testing.assert_array_equal(
                r, meta["canvas"][by + 21:by + 171, bx + 33:bx + 233])
            # fully outside the occupied grid -> fill color
            corner = s.read_region((0, 0), 0, (32, 32))
        assert (corner == np.array(meta["fill"], np.uint8)).all()

    def test_level1_matches_downsample(self, mirax):
        path, meta = mirax
        with Slide(path) as s:
            got = s.read_region((0, 0), 1, s.level_dimensions[1])
        np.testing.assert_array_equal(got, meta["canvas"][::2, ::2])

    def test_bounds(self, mirax):
        path, meta = mirax
        with Slide(path) as s:
            assert s.bounds == meta["bounds"]

    def test_deepzoom_honors_bounds(self, mirax):
        from digipathai_tpu.io.deepzoom import DeepZoomGenerator

        path, meta = mirax
        bx, by, bw, bh = meta["bounds"]
        with Slide(path) as s:
            dz = DeepZoomGenerator(s, limit_bounds=True)
            assert dz.level_dimensions[-1] == (bw, bh)
            tile = np.asarray(dz.get_tile(dz.level_count - 1, (0, 0)))
        # the top-left deep-zoom tile starts at the bounds origin (no
        # left/top overlap on the first tile)
        np.testing.assert_array_equal(
            tile[:64, :64], meta["canvas"][by:by + 64, bx:bx + 64])


class TestMiraxServing:
    def test_server_lists_and_serves_mirax(self, tmp_path):
        from tests.fixtures import make_mirax_slide
        from tests.test_server import _Server
        from digipathai_tpu.server.app import ServerConfig

        make_mirax_slide(str(tmp_path / "wsi.mrxs"), seed=6)
        srv = _Server(ServerConfig(slide_dir=str(tmp_path),
                                   viewer_only=True))
        try:
            code, body, _ = srv.get("/")
            assert code == 200 and b"wsi.mrxs" in body
            code, body, _ = srv.get("/wsi.mrxs.dzi")
            assert code == 200 and b"deepzoom" in body
            code, body, hdr = srv.get("/wsi.mrxs_files/8/0_0.jpeg")
            assert code == 200 and body[:2] == b"\xff\xd8"
        finally:
            srv.stop()

    def test_engine_segments_mirax(self, tmp_path, monkeypatch):
        """getSegmentation end-to-end over a MRXS slide (oracle model)."""
        from tests.fixtures import make_mirax_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "seg.mrxs")
        meta = make_mirax_slide(p, seed=7, nx=5, ny=5, tile=128, overlap=0,
                                zoom_levels=3)
        out = getSegmentation(
            img_path=p, patch_size=128, stride_size=128, batch_size=4,
            quick=True, model="oracle", mode="breast",
            probs_path=str(tmp_path / "p.tiff"),
            mask_path=str(tmp_path / "m.tiff"),
            uncertainty_path=str(tmp_path / "u.tiff"),
            supertile=256, num_workers=2, data_parallel=False,
            inference_mode="tile")
        out = np.asarray(out)
        assert out.shape == (meta["width"], meta["height"])
        # oracle marks dark pixels: the lesion must be detected where tissue
        # is inside the occupied area
        lesion = (meta["lesion_mask"] & meta["occ_mask"]).T
        inter = (out > 0) & lesion
        assert inter.sum() > 0.5 * lesion.sum()
