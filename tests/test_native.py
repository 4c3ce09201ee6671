"""Native (C++/libtiff) backend parity tests; skipped when unbuildable."""

import numpy as np
import pytest

from digipathai_tpu.io import tiff_py

native = pytest.importorskip("digipathai_tpu.io.native")
if not native.available():
    pytest.skip("native backend not buildable here", allow_module_level=True)


@pytest.fixture(scope="module")
def rgb(tmp_path_factory):
    rng = np.random.default_rng(3)
    return rng.integers(0, 255, (600, 800, 3), dtype=np.uint8)


class TestNativeParity:
    def test_native_roundtrip_deflate(self, tmp_path, rgb):
        p = tmp_path / "n.tiff"
        native.write_pyramidal_tiff(p, rgb, compression="deflate")
        with native.NativeTiffReader(str(p)) as r:
            assert len(r.pages) == 3
            got = r.read_region(0, 100, 50, 200, 150)
            np.testing.assert_array_equal(got, rgb[50:200, 100:300])

    def test_cross_backend_reads(self, tmp_path, rgb):
        a = tmp_path / "a.tiff"
        b = tmp_path / "b.tiff"
        native.write_pyramidal_tiff(a, rgb, compression="deflate")
        tiff_py.write_pyramidal_tiff(b, rgb, compression="deflate")
        with tiff_py.TiffReader(str(a)) as r:
            np.testing.assert_array_equal(r.read_region(0, 0, 0, 800, 600), rgb)
        with native.NativeTiffReader(str(b)) as r:
            np.testing.assert_array_equal(r.read_region(0, 0, 0, 800, 600), rgb)

    def test_jpeg_and_gray(self, tmp_path):
        grad = np.tile(np.linspace(0, 255, 512, dtype=np.uint8)[None, :], (256, 1))
        p = tmp_path / "g.tiff"
        native.write_pyramidal_tiff(p, grad, compression="jpeg", quality=92)
        with native.NativeTiffReader(str(p)) as r:
            got = r.read_region(0, 0, 0, 512, 256)
            # grayscale comes back broadcast to RGB
            assert got.shape == (256, 512, 3)
            assert np.abs(got[:, :, 0].astype(int) - grad.astype(int)).mean() < 3

    def test_mpp_description_preserved(self, tmp_path, rgb):
        from digipathai_tpu.io.slide import Slide

        p = tmp_path / "m.tiff"
        native.write_pyramidal_tiff(p, rgb, compression="deflate", mpp=0.25,
                                    description="synthetic")
        with native.NativeTiffReader(str(p)) as r:
            assert "mpp=0.25" in r.pages[0].description

    def test_oob_zero_filled(self, tmp_path, rgb):
        p = tmp_path / "o.tiff"
        native.write_pyramidal_tiff(p, rgb, compression="deflate")
        with native.NativeTiffReader(str(p)) as r:
            got = r.read_region(0, 700, 500, 200, 200)
            np.testing.assert_array_equal(got[:100, :100], rgb[500:, 700:])
            assert (got[100:] == 0).all() and (got[:, 100:] == 0).all()

    def test_threaded_reads(self, tmp_path, rgb):
        from concurrent.futures import ThreadPoolExecutor

        p = tmp_path / "t.tiff"
        native.write_pyramidal_tiff(p, rgb, compression="jpeg")
        with native.NativeTiffReader(str(p)) as r:
            def read(i):
                return r.read_region(0, (i * 37) % 500, (i * 61) % 400, 128, 128)

            with ThreadPoolExecutor(8) as pool:
                outs = list(pool.map(read, range(64)))
            for i, o in enumerate(outs):
                np.testing.assert_array_equal(o, read(i))
