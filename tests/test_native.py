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


class TestStreamingWriter:
    def test_stream_matches_source_and_pyramid(self, tmp_path):
        """Row-block streamed pyramid decodes back to the source at every
        level and matches what the python writer produces structurally."""
        import numpy as np

        from digipathai_tpu.io import native as io_native
        from digipathai_tpu.io.tiff_py import TiffReader

        rng = np.random.default_rng(5)
        src = rng.integers(0, 255, (700, 900), np.uint8)  # odd-ish dims
        p = str(tmp_path / "stream.tiff")
        with io_native.NativePyramidWriter(p, 900, 700, channels=1,
                                           compression="deflate") as wr:
            for y0 in range(0, 700, 123):  # uneven blocks cross strip edges
                wr.write_rows(src[y0:y0 + 123])
        with TiffReader(p) as r:
            assert len(r.pages) >= 2
            np.testing.assert_array_equal(r.read_whole(0)[:, :, 0], src)
            lvl1 = r.read_whole(1)[:, :, 0]
            assert lvl1.shape == (350, 450)
            # 2x2 mean with +2 rounding, matching the in-RAM native writer
            blk = src[:700, :900].reshape(350, 2, 450, 2).astype(np.uint32)
            expect = ((blk.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)
            np.testing.assert_array_equal(lvl1, expect)
        # temp cascade files cleaned up
        assert not list(tmp_path.glob("*.tmp*"))

    def test_gigapixel_map_streams_through_native(self, tmp_path):
        """>=1 GP map (the production case the old RAM writer gated away,
        engine/segmentation.py 1<<30 gate now deleted) writes via the native
        path and reads back consistently at the coarsest level."""
        import numpy as np

        from digipathai_tpu.io import native as io_native
        from digipathai_tpu.io.slide import Slide

        H = W = 32768  # 1.07 GP
        mm = np.memmap(tmp_path / "big.dat", np.uint8, "w+", shape=(H, W))
        # cheap structured content: horizontal bands, written blockwise
        for y0 in range(0, H, 4096):
            mm[y0:y0 + 4096] = (y0 // 4096 * 20) % 255
        p = str(tmp_path / "big.tiff")
        io_native.write_pyramidal_tiff(p, mm, compression="jpeg", quality=90)
        with Slide(p) as s:
            assert s.dimensions == (W, H)
            assert s.level_count >= 8
            coarse = s.read_level(s.level_count - 1)
            # band structure survives: top band darker than the 6th band
            hh = coarse.shape[0]
            assert coarse[0, 0, 0] < coarse[int(hh * 5.5 / 8), 0, 0]
