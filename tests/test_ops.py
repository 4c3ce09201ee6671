"""Parity tests for JAX ops vs independent (cv2/numpy) implementations."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from digipathai_tpu.ops import morphology, otsu, tta  # noqa: E402
from digipathai_tpu.ops.color import rgb_to_hsv_saturation  # noqa: E402


class TestOtsu:
    def test_matches_bimodal(self, rng):
        x = np.concatenate([
            rng.normal(60, 10, 4000), rng.normal(190, 12, 6000)
        ]).clip(0, 255).astype(np.uint8)
        got = float(otsu.otsu_threshold(x))
        # independent: exhaustive integer-threshold Otsu
        best_t, best_v = 0, -1.0
        xf = x.astype(np.float64)
        for t in range(1, 255):
            w1 = (xf <= t).mean()
            w2 = 1 - w1
            if w1 == 0 or w2 == 0:
                continue
            v = w1 * w2 * (xf[xf <= t].mean() - xf[xf > t].mean()) ** 2
            if v > best_v:
                best_v, best_t = v, t
        assert abs(got - best_t) <= 2.0

    def test_float_input(self, rng):
        x = np.concatenate([rng.normal(0.2, 0.05, 3000), rng.normal(0.7, 0.05, 3000)])
        got = float(otsu.otsu_threshold(x.astype(np.float32)))
        assert 0.3 < got < 0.6


class TestHSV:
    def test_matches_colorsys(self, rng):
        import colorsys

        img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        got = np.asarray(rgb_to_hsv_saturation(img))
        want = np.zeros((16, 16), np.float32)
        for i in range(16):
            for j in range(16):
                r, g, b = (img[i, j] / 255.0).tolist()
                want[i, j] = colorsys.rgb_to_hsv(r, g, b)[1]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestMorphology:
    @pytest.mark.parametrize("k", [3, 5, 20])
    def test_dilate_erode_close_open_match_cv2(self, rng, k):
        mask = (rng.random((96, 128)) > 0.85).astype(np.uint8)
        kern = np.ones((k, k), np.uint8)
        np.testing.assert_array_equal(
            np.asarray(morphology.dilate(mask, k)).astype(np.uint8),
            (cv2.dilate(mask, kern) > 0).astype(np.uint8))
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(mask, k)).astype(np.uint8),
            (cv2.erode(mask, kern) > 0).astype(np.uint8))
        np.testing.assert_array_equal(
            np.asarray(morphology.close(mask, k)).astype(np.uint8),
            (cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kern) > 0).astype(np.uint8))
        np.testing.assert_array_equal(
            np.asarray(morphology.open_(mask, k)).astype(np.uint8),
            (cv2.morphologyEx(mask, cv2.MORPH_OPEN, kern) > 0).astype(np.uint8))

    def test_morpho_process_mask_pipeline(self, rng):
        mask = (rng.random((128, 160)) > 0.7).astype(np.uint8)
        got = np.asarray(morphology.morpho_process_mask(mask, level=4)).astype(np.uint8)
        ck, ok, dk = np.ones((20, 20), np.uint8), np.ones((5, 5), np.uint8), np.ones((10, 10), np.uint8)
        want = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, ck)
        want = cv2.morphologyEx(want, cv2.MORPH_OPEN, ok)
        want = (cv2.dilate(want, dk) > 0).astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_bad_level_raises(self):
        with pytest.raises(ValueError):
            morphology.morpho_process_mask(np.zeros((8, 8), np.uint8), level=7)

    def test_bin_morpho_process_mask_matches_cv2(self, rng):
        """Level-independent close->open (reference BinMorphoProcessMask;
        the import-time-shadowed 50/35 kernels are the defaults, the
        shadowed 20/5 definition is reachable via kwargs)."""
        mask = (rng.random((128, 160)) > 0.7).astype(np.uint8)
        for ck, ok in ((50, 35), (20, 5)):
            got = np.asarray(morphology.bin_morpho_process_mask(
                mask, close_k=ck, open_k=ok)).astype(np.uint8)
            want = cv2.morphologyEx(mask, cv2.MORPH_CLOSE,
                                    np.ones((ck, ck), np.uint8))
            want = (cv2.morphologyEx(want, cv2.MORPH_OPEN,
                                     np.ones((ok, ok), np.uint8))
                    > 0).astype(np.uint8)
            np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            np.asarray(morphology.bin_morpho_process_mask(mask)),
            np.asarray(morphology.bin_morpho_process_mask(mask, 50, 35)))


class TestTissueMask:
    def test_synthetic_tissue_found(self, synthetic_slide):
        from digipathai_tpu.io.slide import Slide

        path, meta = synthetic_slide
        with Slide(path) as s:
            lvl = s.level_count - 1
            img = s.read_level(lvl)  # (h, w, 3)
        img_xyc = np.transpose(img, (1, 0, 2))  # reference orientation
        m = np.asarray(morphology.tissue_mask(img_xyc))
        # downsampled ground-truth tissue mask
        ds = meta["width"] // img.shape[1]
        gt = meta["tissue_mask"][::ds, ::ds].T[:m.shape[0], :m.shape[1]]
        inter = (m & gt).sum()
        union = (m | gt).sum()
        assert inter / union > 0.75, f"tissue IoU too low: {inter/union}"


class TestTTA:
    def test_forward_inverse_roundtrip(self, rng):
        batch = rng.random((2, 8, 8, 3)).astype(np.float32)
        for t in tta.ALLOWED + (tta.DEFAULT,):
            out = np.asarray(tta.invert(tta.apply(batch, t), t))
            np.testing.assert_allclose(out, batch)

    def test_matches_numpy_semantics(self, rng):
        # reference applies np.fliplr / np.rot90 per (x, y, c) image
        batch = rng.random((3, 6, 6, 2)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tta.apply(batch, tta.FLIP_LEFT_RIGHT)),
            np.stack([np.fliplr(im) for im in batch]))
        for k, name in [(1, tta.ROTATE_90), (2, tta.ROTATE_180), (3, tta.ROTATE_270)]:
            np.testing.assert_allclose(
                np.asarray(tta.apply(batch, name)),
                np.stack([np.rot90(im, k) for im in batch]))

    def test_resolve_list(self):
        assert tta.resolve_tta_list(None) == ["DEFAULT"]
        assert tta.resolve_tta_list(["ROTATE_90"]) == ["DEFAULT", "ROTATE_90"]
        with pytest.raises(ValueError):
            tta.resolve_tta_list(["ROTATE_45"])

    def test_resolve_list_aliases(self):
        # config-file spellings (server ServerConfig.tta) normalize to the
        # canonical names; unsupported ones still fail with the allowed list
        assert tta.resolve_tta_list(["hflip", "rot90"]) == [
            "DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90"]
        assert tta.resolve_tta_list(["rotate_180"]) == ["DEFAULT", "ROTATE_180"]
        assert tta.resolve_tta_list(["none"]) == ["DEFAULT"]
        with pytest.raises(ValueError, match="vflip"):
            tta.resolve_tta_list(["vflip"])  # no vertical flip in the set

    def test_faithful_compounding_chains(self):
        lst = ["DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90"]
        chains = tta.effective_transforms(lst, faithful=True)
        assert chains == [[], ["FLIP_LEFT_RIGHT"], ["FLIP_LEFT_RIGHT", "ROTATE_90"]]
        chains = tta.effective_transforms(lst, faithful=False)
        assert chains == [[], ["FLIP_LEFT_RIGHT"], ["ROTATE_90"]]


class TestStitch:
    def test_scatter_add_matches_numpy(self, rng):
        from digipathai_tpu.ops import stitch

        P, S, B = 16, 64, 8
        acc = stitch.make_accumulator(S, P)
        mean_p = rng.random((B, P, P)).astype(np.float32)
        var_p = rng.random((B, P, P)).astype(np.float32)
        offs = rng.integers(0, S, size=(B, 2)).astype(np.int32)
        valid = np.array([True] * 6 + [False] * 2)
        out = np.asarray(stitch.stitch_batch(acc, mean_p, var_p, offs, valid, patch=P))

        want = np.zeros((3, S + P, S + P), np.float32)
        for i in range(B):
            if not valid[i]:
                continue
            dx, dy = offs[i]
            want[0, dx:dx + P, dy:dy + P] += mean_p[i]
            want[1, dx:dx + P, dy:dy + P] += var_p[i]
            want[2, dx:dx + P, dy:dy + P] += 1.0
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_finalize(self):
        from digipathai_tpu.ops import stitch

        m = np.array([[4.0, 0.0]])
        v = np.array([[8.0, 0.0]])
        c = np.array([[2.0, 0.0]])
        fm, fv = stitch.finalize_maps(m, v, c)
        np.testing.assert_allclose(np.asarray(fm), [[2.0, 0.0]])
        np.testing.assert_allclose(np.asarray(fv), [[2.0, 0.0]])
