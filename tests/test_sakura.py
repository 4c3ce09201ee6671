"""Sakura SVSLIDE reader (io/sakura.py).

Reference capability: .svslide opens through OpenSlide's ``sakura`` driver
(``reference DigiPathAI/main_server.py:54-55``).  The fixture is
self-authored per the documented SQLite schema (no real scanner output in
this environment — same caveat as the MRXS/SCN tests); it exercises the
per-channel tile convention, sparse white fill, pyramid discovery from tile
ids, mpp conversion, and label/overview associated images.
"""

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide

from tests.fixtures import make_sakura_slide


@pytest.fixture(scope="module")
def sakura(tmp_path_factory):
    d = tmp_path_factory.mktemp("sakura")
    p = d / "fix.svslide"
    meta = make_sakura_slide(str(p))
    return str(p), meta


@pytest.fixture(scope="module")
def sakura_rgb(tmp_path_factory):
    d = tmp_path_factory.mktemp("sakura_rgb")
    p = d / "combined.svslide"
    meta = make_sakura_slide(str(p), per_channel=False, drop_tile=None)
    return str(p), meta


class TestSakura:
    def test_detect(self, sakura):
        assert Slide.detect_format(sakura[0]) == "sakura"

    def test_not_sakura_for_other_sqlite(self, tmp_path):
        import sqlite3

        p = tmp_path / "other.db"
        db = sqlite3.connect(str(p))
        db.execute("CREATE TABLE t (a)")
        db.commit()
        db.close()
        assert Slide.detect_format(str(p)) is None

    def test_pyramid_geometry(self, sakura):
        path, meta = sakura
        with Slide(path) as s:
            assert s.level_count == meta["zoom_levels"]
            assert s.dimensions == (meta["width"], meta["height"])
            assert s.level_downsamples == pytest.approx(
                tuple(float(1 << z) for z in range(meta["zoom_levels"])),
                abs=0.05)
            assert s.mpp == pytest.approx(meta["mpp"], rel=1e-6)

    def test_level0_pixels_exact(self, sakura):
        path, meta = sakura
        with Slide(path) as s:
            got = s.read_region((0, 0), 0, (meta["width"], meta["height"]))
        np.testing.assert_array_equal(got, meta["canvas"])

    def test_dropped_tile_is_white(self, sakura):
        path, meta = sakura
        tx, ty = meta["drop_tile"]
        t = meta["tile"]
        with Slide(path) as s:
            got = s.read_region((tx * t, ty * t), 0, (t, t))
        assert (got == 255).all()

    def test_offset_region_crosses_tiles(self, sakura):
        path, meta = sakura
        t = meta["tile"]
        with Slide(path) as s:
            got = s.read_region((t // 2 + 3, t // 2 + 5), 0, (t, t))
        np.testing.assert_array_equal(
            got, meta["canvas"][t // 2 + 5:t // 2 + 5 + t,
                                t // 2 + 3:t // 2 + 3 + t])

    def test_level1_downsample_pixels(self, sakura):
        path, meta = sakura
        with Slide(path) as s:
            w1, h1 = s.level_dimensions[1]
            got = s.read_region((0, 0), 1, (w1, h1))
        # fixture levels are strided copies of the full-res image (the
        # dropped tile only exists at level 0)
        import tests.fixtures as fx

        img, _, _ = fx.render_he_like(meta["width"], meta["height"], 0)
        np.testing.assert_array_equal(got, img[::2, ::2][:h1, :w1])

    def test_associated_images(self, sakura):
        path, meta = sakura
        with Slide(path) as s:
            assoc = s.associated_images
        assert set(assoc) == {"label", "macro"}
        np.testing.assert_array_equal(assoc["label"], meta["label"])
        np.testing.assert_array_equal(assoc["macro"], meta["overview"])

    def test_combined_rgb_tiles(self, sakura_rgb):
        path, meta = sakura_rgb
        with Slide(path) as s:
            got = s.read_region((0, 0), 0, (meta["width"], meta["height"]))
        np.testing.assert_array_equal(got, meta["canvas"])


class TestSakuraViewer:
    def test_dzi_and_tile_serve(self, sakura, tmp_path):
        """The server's Deep Zoom path works over a Sakura slide."""
        from digipathai_tpu.io.deepzoom import DeepZoomGenerator

        path, meta = sakura
        with Slide(path) as s:
            dz = DeepZoomGenerator(s, tile_size=254, overlap=1)
            xml = dz.get_dzi("jpeg")
            assert f'Width="{meta["width"]}"' in xml
            tile = np.asarray(dz.get_tile(dz.level_count - 1, (0, 0)))
            assert tile.ndim == 3 and tile.shape[2] == 3
