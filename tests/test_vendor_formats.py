"""Leica SCN / Philips TIFF / Ventana BIF readers (io/vendor_tiff.py).

Reference capability: these formats open through OpenSlide's drivers
(``reference DigiPathAI/main_server.py:54-55``); detect_format names match
OpenSlide's ("leica", "philips", "ventana").  Fixtures are self-authored
per the documented layouts (no real scanner output in this environment —
same caveat as the MRXS tests).
"""

import numpy as np
import pytest

from digipathai_tpu.io.slide import Slide

from tests.fixtures import (make_philips_slide, make_scn_slide,
                            make_trestle_slide, make_ventana_slide)


@pytest.fixture(scope="module")
def scn(tmp_path_factory):
    d = tmp_path_factory.mktemp("scn")
    p = d / "fix.scn"
    meta = make_scn_slide(str(p))
    return str(p), meta


@pytest.fixture(scope="module")
def philips(tmp_path_factory):
    d = tmp_path_factory.mktemp("philips")
    p = d / "fix.tiff"
    meta = make_philips_slide(str(p))
    return str(p), meta


@pytest.fixture(scope="module")
def ventana(tmp_path_factory):
    d = tmp_path_factory.mktemp("ventana")
    p = d / "fix.bif"
    meta = make_ventana_slide(str(p))
    return str(p), meta


class TestLeicaScn:
    def test_detect(self, scn):
        assert Slide.detect_format(scn[0]) == "leica"

    def test_levels_follow_xml_not_area_order(self, scn):
        path, meta = scn
        with Slide(path) as s:
            # the tiled macro is LARGER than main L1 — the area rule would
            # have made it a pyramid level; the XML must exclude it
            assert s.level_count == 2
            assert s.level_dimensions[0] == (meta["width"], meta["height"])
            assert s.level_dimensions[1] == (
                meta["levels"][1].shape[1], meta["levels"][1].shape[0])
            assert s.level_downsamples[1] == pytest.approx(4.0, abs=0.01)

    def test_region_and_macro(self, scn):
        path, meta = scn
        with Slide(path) as s:
            r = s.read_region((256, 256), 0, (128, 96))
            ref = meta["image"][256:352, 256:384]
            assert np.abs(r.astype(int) - ref.astype(int)).mean() < 8  # JPEG
            assert "macro" in s.associated_images
            m = s.associated_images["macro"]
            assert m.shape[:2] == meta["macro"].shape[:2]

    def test_mpp(self, scn):
        path, meta = scn
        with Slide(path) as s:
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.01)
            assert s.properties["openslide.objective-power"] == 20


class TestPhilips:
    def test_detect(self, philips):
        assert Slide.detect_format(philips[0]) == "philips"

    def test_levels_and_associated(self, philips):
        path, meta = philips
        with Slide(path) as s:
            assert s.level_count == 2
            assert s.level_dimensions[0] == (meta["width"], meta["height"])
            assert set(s.associated_images) == {"macro", "label"}

    def test_sparse_tiles_render_white(self, philips):
        path, meta = philips
        with Slide(path) as s:
            r = s.read_region((0, 0), 0, (256, 256))
            assert (r == 255).all()  # omitted tile -> white, not black
            # non-sparse area still decodes normally
            r2 = s.read_region((512, 512), 0, (64, 64))
            ref = meta["image"][512:576, 512:576]
            assert np.abs(r2.astype(int) - ref.astype(int)).mean() < 8

    def test_mpp_from_dicom_pixel_spacing(self, philips):
        path, meta = philips
        with Slide(path) as s:
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.01)


class TestVentana:
    def test_detect(self, ventana):
        assert Slide.detect_format(ventana[0]) == "ventana"

    def test_levels_and_associated(self, ventana):
        path, meta = ventana
        with Slide(path) as s:
            assert s.level_count == 2
            assert s.level_dimensions[0] == (meta["width"], meta["height"])
            names = set(s.associated_images)
            assert "thumbnail" in names and "label" in names

    def test_mpp_and_magnification_from_iscan_xmp(self, ventana):
        path, meta = ventana
        with Slide(path) as s:
            assert s.mpp == pytest.approx(meta["mpp"], rel=0.001)
            assert s.properties["openslide.objective-power"] == 20

    def test_region(self, ventana):
        path, meta = ventana
        with Slide(path) as s:
            r = s.read_region((128, 64), 0, (256, 200))
            ref = meta["image"][64:264, 128:384]
            assert np.abs(r.astype(int) - ref.astype(int)).mean() < 8


@pytest.fixture(scope="module")
def trestle(tmp_path_factory):
    d = tmp_path_factory.mktemp("trestle")
    p = d / "fix.tif"
    meta = make_trestle_slide(str(p))
    return str(p), meta


class TestTrestle:
    def test_detect(self, trestle):
        assert Slide.detect_format(trestle[0]) == "trestle"

    def test_overlap_subtracted_dimensions(self, trestle):
        path, meta = trestle
        with Slide(path) as s:
            # logical size, NOT the stored (overlapping-tiles) size
            assert s.dimensions == (meta["width"], meta["height"])
            assert s.dimensions != meta["stored_size"]
            assert s.level_count == 2

    def test_overlap_aware_reads_are_exact(self, trestle):
        """The fixture duplicates overlap bands losslessly, so overlap-aware
        reassembly must reproduce the logical image bit-for-bit — including
        regions spanning tile seams and the image edges."""
        path, meta = trestle
        with Slide(path) as s:
            whole = s.read_region((0, 0), 0, s.dimensions)
            np.testing.assert_array_equal(whole, meta["image"])
            # a window centered on a seam (tile 128, advance 112)
            r = s.read_region((100, 100), 0, (64, 64))
            np.testing.assert_array_equal(
                r, meta["image"][100:164, 100:164])
            # level 1 has no overlaps: plain read
            lvl1 = s.read_region((0, 0), 1, s.level_dimensions[1])
            np.testing.assert_array_equal(lvl1, meta["level1"])

    def test_properties(self, trestle):
        with Slide(trestle[0]) as s:
            assert s.properties.get("trestle.Objective Power") == "20"


def test_server_lists_and_serves_vendor_formats(tmp_path):
    """The file browser + deepzoom path work for the new formats end to end
    (server discovers anything detect_format accepts; app.py list_slides)."""
    import threading
    import urllib.request

    from digipathai_tpu.server.app import ServerConfig, create_app, list_slides
    from digipathai_tpu.server.wsgi_kit import serve

    make_scn_slide(str(tmp_path / "a.scn"), width=512, height=512)
    make_philips_slide(str(tmp_path / "b.tiff"), width=512, height=512)
    make_ventana_slide(str(tmp_path / "c.bif"), width=512, height=512)
    names = {e["name"] for e in list_slides(str(tmp_path))}
    assert {"a.scn", "b.tiff", "c.bif"} <= names

    app = create_app(ServerConfig(slide_dir=str(tmp_path), viewer_only=True))
    httpd = serve(app, host="127.0.0.1", port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        for slide in ("a.scn", "b.tiff", "c.bif"):
            url = f"http://127.0.0.1:{httpd.server_port}/{slide}"
            with urllib.request.urlopen(url + ".dzi", timeout=30) as r:
                assert r.status == 200
                assert b"Format" in r.read()
            # one real deep-zoom tile decodes
            with urllib.request.urlopen(
                    url + "_files/8/0_0.jpeg", timeout=30) as r:
                assert r.status == 200
                assert r.read()[:3] == b"\xff\xd8\xff"
    finally:
        httpd.shutdown()
