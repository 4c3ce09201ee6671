"""HTTP surface tests: route parity with the reference server."""

import os
import shutil
import threading
import time
import urllib.request
import urllib.error
import json

import numpy as np
import pytest

from digipathai_tpu.server.app import ServerConfig, create_app, get_mask_path, get_uncertainty_path
from digipathai_tpu.server.wsgi_kit import serve


@pytest.fixture(scope="module")
def slide_dir(tmp_path_factory):
    from tests.fixtures import make_synthetic_slide

    d = tmp_path_factory.mktemp("serve")
    make_synthetic_slide(str(d / "liver-slide-1.tiff"), 512, 384, seed=2)
    (d / "sub").mkdir()
    make_synthetic_slide(str(d / "sub" / "colon-slide-2.tiff"), 256, 256, seed=3)
    return str(d)


class _Server:
    def __init__(self, cfg, segmentation_fn=None):
        self.app = create_app(cfg, segmentation_fn=segmentation_fn)
        self.httpd = serve(self.app, host="127.0.0.1", port=0, quiet=True)
        self.port = self.httpd.server_port
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def get(self, path, expect=200):
        url = f"http://127.0.0.1:{self.port}{path}"
        try:
            with urllib.request.urlopen(url, timeout=30) as r:
                return r.status, r.read(), r.headers
        except urllib.error.HTTPError as e:
            assert e.code == expect, f"{path}: {e.code} != {expect}"
            return e.code, e.read(), e.headers

    def post(self, path, data: dict, expect=200):
        body = "&".join(f"{k}={v}" for k, v in data.items()).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{self.port}{path}", data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            assert e.code == expect, f"{path}: {e.code} != {expect}"
            return e.code, e.read()

    def stop(self):
        self.httpd.shutdown()


@pytest.fixture(scope="module")
def server(slide_dir):
    s = _Server(ServerConfig(slide_dir=slide_dir, viewer_only=True))
    yield s
    s.stop()


class TestRoutes:
    def test_index_lists_slides(self, server):
        code, body, _ = server.get("/")
        assert code == 200
        text = body.decode()
        assert "liver-slide-1.tiff" in text
        assert "colon-slide-2.tiff" in text
        assert "Not Available" in text

    def test_dzi(self, server):
        code, body, headers = server.get("/liver-slide-1.tiff.dzi")
        assert code == 200
        assert headers["Content-Type"].startswith("application/xml")
        assert 'TileSize="254"' in body.decode()
        assert 'Width="512"' in body.decode()

    def test_tile(self, server):
        from PIL import Image
        import io

        code, body, headers = server.get("/liver-slide-1.tiff_files/9/0_0.jpeg")
        assert code == 200
        assert headers["Content-Type"] == "image/jpeg"
        img = Image.open(io.BytesIO(body))
        assert img.size[0] <= 256 and img.size[1] <= 256

    def test_tile_full_level_matches_slide(self, server, slide_dir):
        from PIL import Image
        import io
        from digipathai_tpu.io.slide import Slide

        # max dz level = ceil(log2(512)) = 9; tile 0_0 at level 9 is a
        # 254(+1 overlap) crop of level-0
        code, body, _ = server.get("/liver-slide-1.tiff_files/9/0_0.jpeg")
        tile = np.asarray(Image.open(io.BytesIO(body)))
        with Slide(os.path.join(slide_dir, "liver-slide-1.tiff")) as s:
            want = s.read_region((0, 0), 0, (255, 255))
        assert tile.shape == want.shape
        assert np.abs(tile.astype(int) - want.astype(int)).mean() < 8

    def test_tile_errors(self, server):
        server.get("/liver-slide-1.tiff_files/99/0_0.jpeg", expect=404)
        server.get("/liver-slide-1.tiff_files/5/0_0.gif", expect=404)
        server.get("/nonexistent.tiff.dzi", expect=404)

    def test_viewer_page(self, server):
        code, body, _ = server.get("/liver-slide-1.tiff")
        text = body.decode()
        assert code == 200
        assert "DPAIViewer" in text
        assert "/liver-slide-1.tiff" in text
        assert 'id="tissuetype"' not in text  # viewer_only hides segment UI

    def test_nested_slide(self, server):
        code, body, _ = server.get("/sub/colon-slide-2.tiff.dzi")
        assert code == 200

    def test_traversal_blocked(self, server):
        server.get("/../etc/passwd", expect=404)

    def test_static_js(self, server):
        code, body, headers = server.get("/static/dpai/viewer.js")
        assert code == 200
        assert b"DPAIViewer" in body

    def test_check_segment_status(self, server):
        code, body, _ = server.get("/check_segment_status")
        st = json.loads(body)
        assert "status" in st


class TestMaskNaming:
    def test_mask_discovery(self, tmp_path):
        p = tmp_path / "case-1.tiff"
        p.write_bytes(b"II*\x00")
        assert get_mask_path(str(p)) is False
        m = tmp_path / "case-1-dgai-mask.tiff"
        m.write_bytes(b"II*\x00")
        assert get_mask_path(str(p)) == str(m)
        assert get_uncertainty_path(str(m)) == str(tmp_path / "case-1-dgai-uncertainty.tiff")

    def test_viewer_shows_mask_overlay(self, slide_dir):
        from tests.fixtures import make_synthetic_slide

        src = os.path.join(slide_dir, "liver-slide-1.tiff")
        mask = os.path.join(slide_dir, "liver-slide-1-dgai-mask.tiff")
        unc = os.path.join(slide_dir, "liver-slide-1-dgai-uncertainty.tiff")
        shutil.copy(src, mask)
        shutil.copy(src, unc)
        try:
            s = _Server(ServerConfig(slide_dir=slide_dir, viewer_only=True))
            try:
                _, body, _ = s.get("/")
                assert "Available" in body.decode()
                _, body, _ = s.get("/liver-slide-1.tiff")
                text = body.decode()
                assert "liver-slide-1-dgai-mask.tiff" in text
                assert "liver-slide-1-dgai-uncertainty.tiff" in text
                # masks excluded from the listing itself
                assert "dgai-mask.tiff</a>" not in text
            finally:
                s.stop()
        finally:
            os.remove(mask)
            os.remove(unc)


class TestSegmentEndpoint:
    def test_viewer_only_flag(self, server):
        code, body = server.post("/segment", {"tissuetype": "Colon"})
        st = json.loads(body)
        assert st["tissuetype"] == "Colon"
        assert st["status"] is True  # reference sets status <- VIEWER_ONLY

    def test_segmentation_thread_runs(self, slide_dir):
        calls = {}

        def fake_seg(img_path, mask_path, probs_path, uncertainty_path,
                     status, mode):
            calls.update(img_path=img_path, mask_path=mask_path, mode=mode)
            status["progress"] = 100

        s = _Server(ServerConfig(slide_dir=slide_dir, viewer_only=False),
                    segmentation_fn=fake_seg)
        try:
            s.get("/liver-slide-1.tiff")  # sets slide_path
            s.post("/segment", {"tissuetype": "Liver"})
            deadline = time.time() + 10
            while time.time() < deadline:
                _, body, _ = s.get("/check_segment_status")
                st = json.loads(body)
                if st.get("status") == "Done":
                    break
                time.sleep(0.1)
            assert st["status"] == "Done"
            assert calls["mode"] == "liver"
            assert calls["img_path"].endswith("liver-slide-1.tiff")
            assert calls["mask_path"].endswith("liver-slide-1-dgai-mask.tiff")
        finally:
            s.stop()

    def test_engine_knobs_reach_segmentation_fn(self, slide_dir):
        """ServerConfig engine knobs (VERDICT r3 item 3) are forwarded to
        the injected segmentation_fn — tile mode / ensemble / TTA / CRF
        are reachable from POST /segment."""
        calls = {}

        def fake_seg(img_path, mask_path, probs_path, uncertainty_path,
                     status, mode, **kw):
            calls.update(kw)
            status["progress"] = 100

        cfg = ServerConfig(
            slide_dir=slide_dir, viewer_only=False,
            inference_mode="tile", quick=False, tta="all", crf=True,
            resume=True, data_parallel=2,
            engine_extra={"supertile": 1024})
        s = _Server(cfg, segmentation_fn=fake_seg)
        try:
            s.get("/liver-slide-1.tiff")
            s.post("/segment", {"tissuetype": "Colon"})
            deadline = time.time() + 10
            st = {}
            while time.time() < deadline:
                _, body, _ = s.get("/check_segment_status")
                st = json.loads(body)
                if st.get("status") in ("Done", "Error"):
                    break
                time.sleep(0.1)
            assert st["status"] == "Done"
            assert calls == {
                "inference_mode": "tile", "quick": False,
                "tta_list": ["FLIP_LEFT_RIGHT", "ROTATE_90",
                             "ROTATE_180", "ROTATE_270"],
                "crf": True, "resume": True, "data_parallel": 2,
                "supertile": 1024,
            }
        finally:
            s.stop()

    def test_per_request_knobs_override_config(self, slide_dir):
        """Optional form fields on POST /segment (VERDICT r4 item 6):
        per-request quick/tta/crf/inference_mode/model override the
        deployment config, so one server serves both quick-look and
        full-quality requests.  Bad values 400 BEFORE any worker thread
        starts — a typo must not silently burn an ensemble run."""
        calls = {}

        def fake_seg(img_path, mask_path, probs_path, uncertainty_path,
                     status, mode, **kw):
            calls.update(kw)
            status["progress"] = 100

        cfg = ServerConfig(slide_dir=slide_dir, viewer_only=False,
                           inference_mode="tile", quick=False, crf=True)
        s = _Server(cfg, segmentation_fn=fake_seg)
        try:
            s.get("/liver-slide-1.tiff")
            s.post("/segment", {"tissuetype": "Colon", "quick": "true",
                                "crf": "0", "inference_mode": "patch",
                                "model": "deeplabv3",
                                "tta": "hflip,ROTATE_90"})
            deadline = time.time() + 10
            st = {}
            while time.time() < deadline:
                _, body, _ = s.get("/check_segment_status")
                st = json.loads(body)
                if st.get("status") in ("Done", "Error"):
                    break
                time.sleep(0.1)
            assert st["status"] == "Done"
            # request fields overrode every configured knob (aliases like
            # hflip are validated here, normalized by the engine)
            assert calls == {"inference_mode": "patch", "quick": True,
                             "crf": False, "model": "deeplabv3",
                             "tta_list": ["hflip", "ROTATE_90"]}

            # strict validation: each bad field 400s and starts nothing
            calls.clear()
            for bad in ({"quick": "maybe"}, {"crf": "2"},
                        {"inference_mode": "fast"}, {"model": "resnet99"},
                        {"tta": "FLIP_DIAGONAL"}):
                code, body = s.post("/segment",
                                    {"tissuetype": "Colon", **bad},
                                    expect=400)
                assert code == 400, bad
            time.sleep(0.3)
            assert calls == {}  # no thread ever ran
        finally:
            s.stop()

    def test_engine_knob_cli_flags(self):
        """CLI flags populate the ServerConfig engine knobs."""
        from digipathai_tpu.server.cli import build_config

        cfg, _ = build_config([
            "--inference-mode", "tile", "--ensemble", "--tta",
            "FLIP_LEFT_RIGHT,ROTATE_90", "--crf", "--resume",
            "--data-parallel", "4", "--engine-opt", "supertile=2048",
            "--engine-opt", "s2d_input=auto", "/tmp"])
        assert cfg.inference_mode == "tile"
        assert cfg.quick is False
        assert cfg.tta == ["FLIP_LEFT_RIGHT", "ROTATE_90"]
        assert cfg.crf is True and cfg.resume is True
        assert cfg.data_parallel == 4
        assert cfg.engine_extra == {"supertile": 2048, "s2d_input": "auto"}
        assert cfg.engine_kwargs()["tta_list"] == ["FLIP_LEFT_RIGHT",
                                                   "ROTATE_90"]
        # unset knobs stay engine defaults: empty kwargs when nothing given
        cfg2, _ = build_config(["/tmp"])
        assert cfg2.engine_kwargs() == {}

    def test_engine_knob_string_and_bool_parsing(self):
        """Config-file style values: a bare TTA string must not be split
        char-by-char, and --data-parallel accepts yes/no words (or errors
        cleanly on garbage instead of an int() traceback)."""
        import pytest

        from digipathai_tpu.server.app import ServerConfig
        from digipathai_tpu.server.cli import build_config

        cfg = ServerConfig(tta="FLIP_LEFT_RIGHT,ROTATE_90")
        assert cfg.engine_kwargs()["tta_list"] == ["FLIP_LEFT_RIGHT",
                                                   "ROTATE_90"]
        assert (ServerConfig(tta="FLIP_TOP_BOTTOM").engine_kwargs()
                ["tta_list"] == ["FLIP_TOP_BOTTOM"])

        cfg, _ = build_config(["--data-parallel", "yes", "/tmp"])
        assert cfg.data_parallel is True
        cfg, _ = build_config(["--data-parallel", "off", "/tmp"])
        assert cfg.data_parallel is False
        cfg, _ = build_config(["--data-parallel", "2", "/tmp"])
        assert cfg.data_parallel == 2
        with pytest.raises(SystemExit):
            build_config(["--data-parallel", "maybe", "/tmp"])

    def test_segmentation_error_surfaces(self, slide_dir):
        def boom(**kw):
            raise RuntimeError("synthetic failure")

        s = _Server(ServerConfig(slide_dir=slide_dir, viewer_only=False),
                    segmentation_fn=boom)
        try:
            s.get("/liver-slide-1.tiff")
            s.post("/segment", {"tissuetype": "Colon"})
            deadline = time.time() + 10
            st = {}
            while time.time() < deadline:
                _, body, _ = s.get("/check_segment_status")
                st = json.loads(body)
                if st.get("status") in ("Done", "Error"):
                    break
                time.sleep(0.1)
            assert st["status"] == "Error"
            assert "synthetic failure" in st["error"]
        finally:
            s.stop()
