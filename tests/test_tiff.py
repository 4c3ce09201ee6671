"""Round-trip and parity tests for the first-party TIFF layer."""

import numpy as np
import pytest

from digipathai_tpu.io import tiff_py
from digipathai_tpu.io.slide import Slide


def _rand_rgb(rng, h, w):
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("compression", ["deflate", "raw", "jpeg"])
def test_roundtrip_rgb(tmp_path, rng, compression):
    img = _rand_rgb(rng, 300, 500) if compression != "jpeg" else np.tile(
        np.linspace(0, 255, 500, dtype=np.uint8)[None, :, None], (300, 1, 3))
    p = tmp_path / f"rt_{compression}.tiff"
    tiff_py.write_pyramidal_tiff(p, img, compression=compression, tile=128)
    with tiff_py.TiffReader(str(p)) as r:
        assert r.pages[0].width == 500 and r.pages[0].height == 300
        # pyramid: 500 -> 250 -> 125 (<=128 stop)
        assert len(r.pages) == 3
        got = r.read_region(0, 0, 0, 500, 300)
        if compression == "jpeg":
            assert np.abs(got.astype(int) - img.astype(int)).mean() < 3.0
        else:
            np.testing.assert_array_equal(got, img)


def test_roundtrip_gray_and_float(tmp_path, rng):
    gray = rng.integers(0, 255, size=(200, 320), dtype=np.uint8)
    p = tmp_path / "gray.tiff"
    tiff_py.write_pyramidal_tiff(p, gray, compression="deflate", tile=128)
    with tiff_py.TiffReader(str(p)) as r:
        got = r.read_region(0, 0, 0, 320, 200)[:, :, 0]
        np.testing.assert_array_equal(got, gray)

    fl = rng.random((150, 200)).astype(np.float32)
    p2 = tmp_path / "float.tiff"
    tiff_py.write_pyramidal_tiff(p2, fl, compression="deflate", tile=128)
    with tiff_py.TiffReader(str(p2)) as r:
        assert r.pages[0].sample_format == tiff_py.SAMPLEFORMAT_FLOAT
        got = r.read_region(0, 0, 0, 200, 150)[:, :, 0]
        np.testing.assert_allclose(got, fl)


def test_subregion_and_oob(tmp_path, rng):
    img = _rand_rgb(rng, 256, 256)
    p = tmp_path / "sub.tiff"
    tiff_py.write_pyramidal_tiff(p, img, compression="deflate", tile=64)
    with tiff_py.TiffReader(str(p)) as r:
        got = r.read_region(0, 100, 50, 80, 90)
        np.testing.assert_array_equal(got, img[50:140, 100:180])
        # out-of-bounds zero fill
        got = r.read_region(0, 200, 200, 100, 100)
        np.testing.assert_array_equal(got[:56, :56], img[200:, 200:])
        assert (got[56:] == 0).all() and (got[:, 56:] == 0).all()


def test_downsampled_levels_consistent(tmp_path):
    # constant-color image downsamples to the same constant
    img = np.full((512, 512, 3), 77, np.uint8)
    p = tmp_path / "const.tiff"
    tiff_py.write_pyramidal_tiff(p, img, compression="deflate", tile=128)
    with tiff_py.TiffReader(str(p)) as r:
        for lvl in range(len(r.pages)):
            pg = r.pages[lvl]
            got = r.read_region(lvl, 0, 0, pg.width, pg.height)
            assert (got == 77).all()


def test_bigtiff_roundtrip(tmp_path, rng):
    img = _rand_rgb(rng, 300, 300)
    p = tmp_path / "big.tiff"
    with tiff_py.PyramidalTiffWriter(str(p), 300, 300, channels=3,
                                     compression="deflate", tile=128,
                                     bigtiff=True) as w:
        w.write_base(img)
    with tiff_py.TiffReader(str(p)) as r:
        assert r._big
        np.testing.assert_array_equal(r.read_region(0, 0, 0, 300, 300), img)


def test_lzw_decode_known_vector():
    # Encode a tiny buffer with PIL's TIFF LZW writer and decode with ours.
    from PIL import Image
    import io as _io

    arr = (np.arange(64 * 64, dtype=np.uint32) % 251).astype(np.uint8)
    img = Image.fromarray(arr.reshape(64, 64))
    buf = _io.BytesIO()
    img.save(buf, "tiff", compression="tiff_lzw")
    buf.seek(0)
    data = buf.getvalue()
    with open("/tmp/_lzw_probe.tiff", "wb") as f:
        f.write(data)
    with tiff_py.TiffReader("/tmp/_lzw_probe.tiff") as r:
        got = r.read_region(0, 0, 0, 64, 64)[:, :, 0]
    np.testing.assert_array_equal(got, arr.reshape(64, 64))


def test_slide_api(synthetic_slide):
    path, meta = synthetic_slide
    with Slide(path) as s:
        assert Slide.detect_format(path) == "generic-tiff"
        assert s.dimensions == (meta["width"], meta["height"])
        assert s.level_count >= 3
        assert s.level_downsamples[0] == 1.0
        assert abs(s.level_downsamples[1] - 2.0) < 0.01
        assert s.mpp == pytest.approx(meta["mpp"])
        # level-0 coordinates at level 1
        region = s.read_region((512, 256), 1, (64, 64))
        assert region.shape == (64, 64, 3)
        # reading at level 0 matches source pixels (jpeg tolerance)
        r0 = s.read_region((100, 200), 0, (32, 32))
        src = meta["image"][200:232, 100:132]
        assert np.abs(r0.astype(int) - src.astype(int)).mean() < 6.0


def test_pil_can_read_our_tiff(tmp_path, rng):
    """Cross-check with an independent TIFF implementation (PIL)."""
    from PIL import Image

    img = _rand_rgb(rng, 200, 260)
    p = tmp_path / "pilcheck.tiff"
    tiff_py.write_pyramidal_tiff(p, img, compression="deflate", tile=128)
    with Image.open(p) as im:
        got = np.asarray(im)
    np.testing.assert_array_equal(got, img)


def test_read_whole_slide_image(tmp_path, rng, monkeypatch):
    """PIL path for ordinary images; Slide fallback when PIL can't parse
    (reference ReadWholeSlideImage, helpers/utils.py:308-310)."""
    from PIL import Image

    from digipathai_tpu.io.slide import read_whole_slide_image

    img = _rand_rgb(rng, 40, 60)
    p = tmp_path / "plain.png"
    Image.fromarray(img).save(p)
    got = read_whole_slide_image(str(p))
    np.testing.assert_array_equal(np.asarray(got.convert("RGB")), img)

    # force the fallback: a real pyramidal slide + a PIL that refuses it
    p2 = tmp_path / "pyramid.tiff"
    tiff_py.write_pyramidal_tiff(p2, _rand_rgb(rng, 300, 500),
                                 compression="deflate", tile=128)
    monkeypatch.setattr(Image, "open",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("no")))
    got = read_whole_slide_image(str(p2))
    s = Slide(str(p2))
    lvl = s.level_count - 1
    assert got.size == s.level_dimensions[lvl]  # PIL size is (w, h)
