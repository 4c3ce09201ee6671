"""CRF refinement tests (behavioral: denoising + edge snapping)."""

import numpy as np
import pytest

import jax.numpy as jnp

from digipathai_tpu.ops.crf import mean_field_crf


@pytest.fixture()
def square_scene(rng):
    """A dark square on a light background with a noisy prob map."""
    h = w = 96
    img = np.full((h, w, 3), 230, np.uint8)
    img[24:72, 24:72] = 70  # dark object
    probs = np.zeros((h, w), np.float32)
    probs[24:72, 24:72] = 0.9
    noisy = probs.copy()
    # salt noise outside + pepper noise inside
    ys, xs = rng.integers(0, 24, 40), rng.integers(0, w, 40)
    noisy[ys, xs] = 0.85
    ys, xs = rng.integers(30, 60, 40), rng.integers(30, 60, 40)
    noisy[ys, xs] = 0.1
    return img, probs, noisy


class TestMeanFieldCRF:
    def test_denoises_isolated_pixels(self, square_scene):
        img, clean, noisy = square_scene
        out = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(noisy),
                                        n_iters=5, bil_radius=5))
        got = out > 0.5
        want = clean > 0.5
        # refined mask should be much closer to the clean square
        err_before = np.mean((noisy > 0.5) != want)
        err_after = np.mean(got != want)
        assert err_after < err_before * 0.5
        # isolated salt pixels outside the object vanish
        assert got[:20, :].sum() == 0

    def test_preserves_confident_interior(self, square_scene):
        img, clean, _ = square_scene
        out = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(clean),
                                        n_iters=3, bil_radius=5))
        assert (out[34:62, 34:62] > 0.5).all()
        assert (out[:16, :16] < 0.5).all()

    def test_shapes_and_range(self, rng):
        img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        p = rng.random((64, 80)).astype(np.float32)
        out = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(p),
                                        n_iters=2, bil_radius=3))
        assert out.shape == (64, 80)
        assert (out >= 0).all() and (out <= 1).all()

    def test_iterations_lower_to_bounded_loop(self):
        # The mean-field iterations must trace as ONE loop primitive, not
        # n_iters unrolled copies: unrolling keeps every iteration's
        # full-resolution temporaries live simultaneously, which OOMs TPU
        # HBM at the 4096 CRF bucket (17.65G of 15.75G, round 4).  Pin the
        # structure so a refactor back to a python loop fails here instead
        # of on hardware.
        import jax
        from digipathai_tpu.ops.crf import _mean_field_from_unary

        rng = np.random.default_rng(3)  # local: keep the session stream intact

        from jax.extend import core as jex_core

        def subjaxprs(params):
            for v in params.values():
                vals = v if isinstance(v, (tuple, list)) else (v,)
                for x in vals:
                    if isinstance(x, jex_core.ClosedJaxpr):
                        yield x.jaxpr
                    elif isinstance(x, jex_core.Jaxpr):
                        yield x

        def count_loops(jaxpr):
            n = 0
            for eqn in jaxpr.eqns:
                if eqn.primitive.name in ("while", "scan"):
                    n += 1  # do not recurse: inner loops belong to the body
                    continue
                for sub in subjaxprs(eqn.params):
                    n += count_loops(sub)
            return n

        img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        p = rng.random((32, 40)).astype(np.float32)
        jaxpr = jax.make_jaxpr(
            lambda i, q: mean_field_crf(i, q, n_iters=10, bil_radius=3)
        )(jnp.asarray(img), jnp.asarray(p))
        assert count_loops(jaxpr.jaxpr) == 1, jaxpr

        unary = rng.random((32, 40, 3)).astype(np.float32)
        jaxpr2 = jax.make_jaxpr(
            lambda i, u: _mean_field_from_unary(
                i, u, n_labels=3, n_iters=5, enable_color=True,
                pos_sigma=3.0, compat_gaussian=3.0, bil_sigma_xy=80.0,
                bil_sigma_rgb=13.0, bil_downsample=8, bil_radius=10,
                compat_bilateral=10.0)
        )(jnp.asarray(img), jnp.asarray(unary))
        assert count_loops(jaxpr2.jaxpr) == 1, jaxpr2


class TestDoCRF:
    """Label-input variant (reference helpers/utils.py:548-566)."""

    def _scene(self, rng):
        """Two colored regions plus background, with label noise."""
        h = w = 96
        img = np.full((h, w, 3), 235, np.uint8)
        img[10:50, 10:50] = (60, 60, 200)
        img[55:90, 55:90] = (200, 60, 60)
        labels = np.zeros((h, w), np.uint8)
        labels[10:50, 10:50] = 1
        labels[55:90, 55:90] = 2
        noisy = labels.copy()
        ys, xs = rng.integers(15, 45, 30), rng.integers(15, 45, 30)
        noisy[ys, xs] = 2  # wrong-label speckle inside region 1
        return img, labels, noisy

    def test_denoises_label_speckle(self, rng):
        from digipathai_tpu.ops.crf import do_crf

        img, clean, noisy = self._scene(rng)
        out = do_crf(img, noisy, n_labels=3, enable_color=True,
                     zero_unsure=False)
        assert set(np.unique(out)) <= {0, 1, 2}
        # interior speckle (away from region boundaries) resolves to the
        # surrounding label; region interiors survive the smoothing
        inner = out[18:42, 18:42]
        err_before = np.mean(noisy[18:42, 18:42] != 1)
        assert err_before > 0.01  # the speckle is really there
        assert np.mean(inner != 1) < err_before * 0.5
        assert (out[60:85, 60:85] == 2).mean() > 0.9
        assert (out[:8, :8] == 0).all()

    def test_zero_unsure_fills_from_neighbors(self, rng):
        from digipathai_tpu.ops.crf import do_crf

        img, clean, _ = self._scene(rng)
        labels = clean.copy() + 1  # 1=bg, 2=r1, 3=r2; 0 reserved for unsure
        labels[20:30, 20:30] = 0   # unknown hole inside region 1
        out = do_crf(img, labels, n_labels=3, enable_color=True,
                     zero_unsure=True)
        # the hole resolves to the surrounding label (correct mapping: 2)
        assert (out[22:28, 22:28] == 2).mean() > 0.9

    def test_faithful_shift_reproduces_reference_offby_one(self, rng):
        from digipathai_tpu.ops.crf import do_crf

        img, clean, _ = self._scene(rng)
        labels = clean.copy() + 1
        out = do_crf(img, labels, n_labels=3, enable_color=False,
                     zero_unsure=True, faithful_shift=True)
        # the reference maps argmax class c straight to colors[c]: every
        # confident label comes back one value down
        assert (out[30:45, 30:45] == 1).mean() > 0.9  # label 2 -> colors[1]

    def test_original_label_values_preserved(self, rng):
        from digipathai_tpu.ops.crf import do_crf

        img, clean, _ = self._scene(rng)
        labels = np.choose(clean, [5, 9, 12]).astype(np.uint8)
        out = do_crf(img, labels, n_labels=3, enable_color=True,
                     zero_unsure=False)
        assert set(np.unique(out)) <= {5, 9, 12}


class TestPaddedTileCRF:
    """Bucket-padded masked CRF (VERDICT r3 weak #3): one compiled program
    per bucket shape serves every edge-tile extent."""

    def test_refine_tile_matches_unpadded(self, rng):
        import jax.numpy as jnp

        from digipathai_tpu.ops.crf import mean_field_crf, refine_tile

        h, w = 97, 130  # awkward extents: pads to the (128, 256) buckets
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        probs = rng.random((h, w)).astype(np.float32)
        ref = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(probs),
                                        n_iters=3))
        out = refine_tile(img, probs, supertile=256, n_iters=3)
        assert out.shape == (h, w)
        # the masked math is exact (eager-mode comparison is bit-equal); the
        # tolerance covers XLA per-program fusion jitter only, which measures
        # the same ~8e-4 between jit and eager runs of the IDENTICAL graph
        np.testing.assert_allclose(out, ref, atol=2e-3)
        assert np.abs(out - ref).mean() < 2e-4

    def test_refine_tile_full_bucket_shape(self, rng):
        import jax.numpy as jnp

        from digipathai_tpu.ops.crf import mean_field_crf, refine_tile

        img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        probs = rng.random((128, 128)).astype(np.float32)
        ref = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(probs),
                                        n_iters=3))
        out = refine_tile(img, probs, supertile=256, n_iters=3)
        np.testing.assert_allclose(out, ref, atol=2e-3)

    @pytest.mark.parametrize("hw", [(2, 130), (130, 3), (8, 64), (3, 3)])
    def test_refine_tile_sliver_and_small_tiles(self, rng, hw):
        """Sliver tiles (an extent < bil_downsample) fall back to the
        unpadded per-shape program, and small tiles (grid smaller than the
        bilateral window radius) must not mark wrapped-roll rows as valid
        — both were wrong before round 4's review: the padded path zeroed
        the whole bilateral term for slivers (deviation up to 0.99) and the
        wrap mask's negative slice stop double-counted neighbors on small
        grids (denominator 9.80 vs ground-truth 6.91)."""
        import jax.numpy as jnp

        from digipathai_tpu.ops.crf import mean_field_crf, refine_tile

        h, w = hw
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        probs = rng.random((h, w)).astype(np.float32)
        ref = np.asarray(mean_field_crf(jnp.asarray(img), jnp.asarray(probs),
                                        n_iters=3))
        out = refine_tile(img, probs, supertile=256, n_iters=3)
        assert out.shape == (h, w)
        np.testing.assert_allclose(out, ref, atol=2e-3)

    def test_bilateral_wrap_mask_ground_truth(self, rng):
        """_bilateral_message on a grid smaller than the window radius,
        checked against a brute-force O(N^2) pairwise sum."""
        from digipathai_tpu.ops.crf import _bilateral_message

        h, w, radius = 3, 5, 10
        sigma_xy, sigma_rgb = 50.0 / 4, 20.0
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        q = rng.random((h, w, 2)).astype(np.float32)
        num = np.zeros_like(q)
        den = np.zeros((h, w, 1), np.float32)
        for y in range(h):
            for x in range(w):
                for yy in range(h):
                    for xx in range(w):
                        if (yy, xx) == (y, x):
                            continue
                        dy, dx = yy - y, xx - x
                        if max(abs(dy), abs(dx)) > radius:
                            continue
                        wgt = np.exp(
                            -(dy * dy + dx * dx) / (2 * sigma_xy ** 2)
                            - ((img[y, x] - img[yy, xx]) ** 2).sum()
                            / (2 * sigma_rgb ** 2))
                        num[y, x] += wgt * q[yy, xx]
                        den[y, x] += wgt
        ref = num / np.maximum(den, 1e-12)
        out = np.asarray(_bilateral_message(
            jnp.asarray(q), jnp.asarray(img), sigma_xy, sigma_rgb, radius))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_one_program_per_bucket(self, rng):
        """Different edge shapes sharing a bucket must NOT retrace: the
        valid extents are dynamic inputs, not compiled constants."""
        from digipathai_tpu.ops.crf import mean_field_crf, refine_tile

        img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        refine_tile(img[:100, :100], rng.random((100, 100)).astype(np.float32),
                    supertile=256, n_iters=2)
        before = mean_field_crf._cache_size()
        for h, w in ((97, 115), (128, 101), (66, 128)):
            refine_tile(img[:h, :w], rng.random((h, w)).astype(np.float32),
                        supertile=256, n_iters=2)
        assert mean_field_crf._cache_size() == before  # all hit (128, 128)

    def test_buckets(self):
        from digipathai_tpu.ops.crf import crf_buckets

        assert crf_buckets(4096) == [1024, 2048, 4096]
        assert crf_buckets(384) == [96, 192, 384]


class TestTileModeCRFOverlap:
    """Tile mode refines each supertile at flush (VERDICT r3 item 2); the
    result must equal the serial post-pass refinement bit-for-bit (both run
    ops.crf.refine_tile, the same compiled program)."""

    def test_interleaved_equals_post_pass(self, tmp_path, monkeypatch):
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation
        from digipathai_tpu.io.slide import Slide
        from digipathai_tpu.io.tiff_py import TiffReader
        from digipathai_tpu.ops.crf import refine_slide_crf

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "ov-slide.tiff")
        make_synthetic_slide(p, 640, 512, seed=47)  # 2x2 grid w/ edge tiles

        crf_opts = {"n_iters": 2, "bil_radius": 4}  # small graphs on CPU
        common = dict(
            img_path=p, patch_size=128, stride_size=128, batch_size=4,
            quick=True, model="oracle", mode="colon", supertile=384,
            num_workers=2, data_parallel=False, inference_mode="tile",
            save_float_probs=True, crf_opts=crf_opts)
        getSegmentation(crf=True,
                        probs_path=str(tmp_path / "a-p.tiff"),
                        mask_path=str(tmp_path / "a-m.tiff"),
                        uncertainty_path=str(tmp_path / "a-u.tiff"),
                        **common)
        getSegmentation(crf=False,
                        probs_path=str(tmp_path / "b-p.tiff"),
                        mask_path=str(tmp_path / "b-m.tiff"),
                        uncertainty_path=str(tmp_path / "b-u.tiff"),
                        **common)

        def read_f32(path):
            with TiffReader(path) as r:
                return np.asarray(r.read_whole(0), np.float32).squeeze()

        refined = read_f32(str(tmp_path / "a-p.tiff.f32.tiff"))
        raw = read_f32(str(tmp_path / "b-p.tiff.f32.tiff"))
        assert not np.array_equal(refined, raw)  # CRF actually did something
        with Slide(p) as slide:
            refine_slide_crf(slide, raw, supertile=384, **crf_opts)
        np.testing.assert_array_equal(refined, raw)

    def test_timings_record_crf_stage(self, tmp_path, monkeypatch):
        """The interleaved CRF is attributed to its own 'crf' timing stage
        so e2e decompositions can see the tail collapse."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "tm-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=48)
        status = {}
        getSegmentation(
            img_path=p, patch_size=128, stride_size=128, batch_size=4,
            quick=True, model="oracle", mode="colon", crf=True,
            probs_path=str(tmp_path / "p.tiff"),
            mask_path=str(tmp_path / "m.tiff"),
            uncertainty_path=str(tmp_path / "u.tiff"),
            supertile=384, num_workers=2, data_parallel=False,
            inference_mode="tile", status=status,
            crf_opts={"n_iters": 2, "bil_radius": 4})
        assert "crf" in status["timings"]


class TestEngineCRFFlag:
    def test_crf_flag_runs_end_to_end(self, tmp_path, monkeypatch):
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation
        from digipathai_tpu.io.slide import Slide
        from digipathai_tpu.utils.metrics import jaccard

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = tmp_path / "crf-slide.tiff"
        meta = make_synthetic_slide(str(p), 512, 512, seed=11)
        out = getSegmentation(
            img_path=str(p), patch_size=128, stride_size=128, batch_size=8,
            quick=True, model="oracle", mode="colon", crf=True,
            probs_path=str(tmp_path / "p.tiff"),
            mask_path=str(tmp_path / "m.tiff"),
            uncertainty_path=str(tmp_path / "u.tiff"),
            supertile=512, num_workers=2)
        with Slide(str(tmp_path / "m.tiff")) as sm:
            lvl = sm.level_count - 1
            m = sm.read_level(lvl)[:, :, 0] > 127
            ds = 512 // sm.level_dimensions[lvl][0]
        gt = meta["lesion_mask"][::ds, ::ds][:m.shape[0], :m.shape[1]]
        assert jaccard(m, gt) > 0.6
