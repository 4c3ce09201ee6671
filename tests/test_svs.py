"""Aperio SVS support: interleaved IFDs, J2K tiles, MPP parsing, viewer.

Reference capability being matched: OpenSlide opens SVS (incl. JPEG2000
compression) at ``main_server.py:54-55`` / ``loaders/dataloader.py:239``.
"""

import numpy as np
import pytest

from tests.fixtures import make_svs_like_slide


@pytest.fixture(scope="module", params=["j2k", "j2k-ycbcr", "jpeg"])
def svs(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("svs")
    p = str(d / f"fixture-{request.param}.svs")
    meta = make_svs_like_slide(p, 1536, 1024, seed=7,
                               compression=request.param)
    return p, meta, request.param


class TestSvsRead:
    def test_detect_format_aperio(self, svs):
        from digipathai_tpu.io.slide import Slide

        path, _, _ = svs
        assert Slide.detect_format(path) == "aperio"

    def test_pyramid_selection_skips_associated_images(self, svs):
        from digipathai_tpu.io.slide import Slide

        path, meta, _ = svs
        with Slide(path) as s:
            # 5 IFDs in the file; only the 2 tiled ones are pyramid levels
            assert s.level_count == 2
            assert s.dimensions == (meta["width"], meta["height"])
            assert s.level_dimensions[1] == (meta["width"] // 2,
                                             meta["height"] // 2)
            assert s.level_downsamples[1] == pytest.approx(2.0)

    def test_mpp_from_aperio_description(self, svs):
        from digipathai_tpu.io.slide import Slide

        path, meta, _ = svs
        with Slide(path) as s:
            assert s.mpp == pytest.approx(meta["mpp"])
            assert s.properties.get("AppMag") == "20"

    def test_read_region_pixels(self, svs):
        from digipathai_tpu.io.slide import Slide

        path, meta, comp = svs
        with Slide(path) as s:
            region = s.read_region((300, 200), 0, (128, 96))
            truth = meta["image"][200:296, 300:428]
            diff = np.abs(region.astype(int) - truth.astype(int))
            if comp == "j2k":
                assert diff.max() == 0  # lossless RGB codestream
            elif comp == "j2k-ycbcr":
                assert diff.max() <= 3  # color-transform rounding
            else:
                assert diff.mean() < 6  # jpeg quantization of the noise

    def test_associated_images(self, svs):
        from digipathai_tpu.io.slide import Slide

        path, meta, _ = svs
        with Slide(path) as s:
            assoc = s.associated_images
            assert set(assoc) == {"thumbnail", "label", "macro"}
            assert assoc["thumbnail"].shape == meta["thumb"].shape
            np.testing.assert_array_equal(assoc["label"], meta["label"])
            np.testing.assert_array_equal(assoc["macro"], meta["macro"])

    def test_deepzoom_serves_svs_tiles(self, svs):
        from digipathai_tpu.io.deepzoom import DeepZoomGenerator
        from digipathai_tpu.io.slide import Slide

        path, meta, _ = svs
        with Slide(path) as s:
            dz = DeepZoomGenerator(s)
            assert "Image" in dz.get_dzi()
            tile = np.asarray(dz.get_tile(dz.level_count - 1, (0, 0)))
            truth = meta["image"][:tile.shape[0], :tile.shape[1]]
            assert np.abs(tile.astype(int) - truth.astype(int)).mean() < 6


def test_ndpi_tag_is_recognized_as_hamamatsu(tmp_path):
    # real NDPI decode coverage lives in tests/test_ndpi.py; this only
    # checks the format sniffer routes the private tag correctly
    from digipathai_tpu.io.slide import Slide

    p = str(tmp_path / "fake.ndpi")
    make_svs_like_slide(p, 512, 512, ndpi=True, compression="jpeg")
    assert Slide.detect_format(p) == "hamamatsu"


def test_generic_tiff_still_detected(tmp_path):
    from tests.fixtures import make_synthetic_slide
    from digipathai_tpu.io.slide import Slide

    p = str(tmp_path / "plain.tiff")
    make_synthetic_slide(p, 512, 384)
    assert Slide.detect_format(p) == "generic-tiff"


def test_server_lists_and_serves_svs(tmp_path):
    """The file browser lists the .svs and its Deep Zoom tiles serve."""
    import json
    import threading
    import urllib.request

    from digipathai_tpu.server.app import ServerConfig, create_app
    from digipathai_tpu.server.wsgi_kit import serve

    make_svs_like_slide(str(tmp_path / "case.svs"), 768, 512, seed=3)
    app = create_app(ServerConfig(slide_dir=str(tmp_path), viewer_only=True))
    httpd = serve(app, host="127.0.0.1", port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{httpd.server_port}{path}",
                    timeout=30) as r:
                return r.status, r.read()

        st, body = get("/")
        assert st == 200 and b"case.svs" in body
        st, body = get("/case.svs.dzi")
        assert st == 200 and b"Image" in body
        st, body = get("/case.svs_files/8/0_0.jpeg")
        assert st == 200 and body[:2] == b"\xff\xd8"
    finally:
        httpd.shutdown()


def test_engine_segments_svs(tmp_path, monkeypatch):
    """End-to-end getSegmentation on an SVS-convention slide."""
    from digipathai_tpu.engine.segmentation import getSegmentation
    from digipathai_tpu.io.slide import Slide

    monkeypatch.setenv("DPAI_OFFLINE", "1")
    monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
    p = str(tmp_path / "seg.svs")
    meta = make_svs_like_slide(p, 768, 512, seed=9)
    out = getSegmentation(
        img_path=p, patch_size=128, stride_size=128, batch_size=4,
        quick=True, model="oracle", mode="breast",
        probs_path=str(tmp_path / "p.tiff"),
        mask_path=str(tmp_path / "m.tiff"),
        uncertainty_path=str(tmp_path / "u.tiff"),
        supertile=256, num_workers=2, data_parallel=False)
    assert out.shape == (meta["width"], meta["height"])
    with Slide(str(tmp_path / "m.tiff")) as s:
        assert s.dimensions == (meta["width"], meta["height"])
