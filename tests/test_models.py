"""Model architecture and weight-converter tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model


def _param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))


class TestRegistry:
    def test_substring_dispatch_resolves_to_canonical_key(self):
        """The reference dispatches models by name substring
        (``reference helpers/utils.py:427-448``); the engine keys per-model
        state by the CANONICAL registry key, so alias names must resolve
        to it (a raw-string key made tile mode's deeplab rebuild KeyError
        on aliases like 'my_deeplabv3')."""
        from digipathai_tpu.models.registry import resolve_model_name

        assert resolve_model_name("my_deeplabv3") == "deeplabv3"
        assert resolve_model_name("dense_v2") == "dense"
        assert build_model("my_deeplabv3").name == "deeplabv3"
        with pytest.raises(ValueError):
            resolve_model_name("resnet50")


class TestTinyUNet:
    def test_forward_shape_and_softmax(self):
        b = build_model("tiny")
        v = b.init(64)
        x = jnp.zeros((2, 64, 64, 3))
        y = b.apply(v, x)
        assert y.shape == (2, 64, 64, 2)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)


class TestDenseNetUNet:
    @pytest.fixture(scope="class")
    def bundle(self):
        # float32 on CPU: bf16 convs hit slow fallback paths in XLA-CPU
        return build_model("dense", dtype=jnp.float32)

    @pytest.fixture(scope="class")
    def variables(self, bundle):
        return bundle.init(64)

    def test_param_count_densenet121(self, variables):
        # DenseNet-121 encoder is ~7.0M params; the U-Net decoder adds
        # ~10.4M more (320/256/128/96/64 stages on wide concats) = ~17.4M.
        n = _param_count(variables)
        assert 16e6 < n < 19e6, n

    def test_forward(self, bundle, variables):
        x = jnp.zeros((1, 64, 64, 3))
        y = bundle.apply(variables, x)
        assert y.shape == (1, 64, 64, 2)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-3)

    def test_layer_names_match_keras_scheme(self, variables):
        p = variables["params"]
        for expected in ["conv1__conv", "conv1__bn", "conv2_block1_1_conv",
                         "conv4_block24_2_conv", "pool2_conv", "bn",
                         "conv2d", "conv2d_9", "conv2d_10",
                         "batch_normalization_9"]:
            assert expected in p, f"missing layer {expected}"
        # final head is 2-class 1x1
        assert p["conv2d_10"]["kernel"].shape == (1, 1, 64, 2)
        # first conv is 7x7x3x64 stride-2 no-bias
        assert p["conv1__conv"]["kernel"].shape == (7, 7, 3, 64)
        assert "bias" not in p["conv1__conv"]
        # encoder skips have the DenseNet-121 channel counts
        assert p["pool2_conv"]["kernel"].shape[2] == 256  # 64 + 6*32
        assert p["pool3_conv"]["kernel"].shape[2] == 512
        assert p["pool4_conv"]["kernel"].shape[2] == 1024

    def test_batch_stats_present(self, variables):
        bs = variables["batch_stats"]
        assert "conv1__bn" in bs and "mean" in bs["conv1__bn"]

    def test_chunked_encoder_matches_canonical(self, bundle, variables):
        """chunked_encoder=True (the inference default) computes the exact
        same function as the per-layer-concat canonical path, with an
        IDENTICAL parameter tree — the variables init'd from one module
        apply unchanged through the other (tools/encoder_probe.py round-3
        measurement: 1.4-1.9x per dense block on v5e)."""
        canon = build_model("dense", dtype=jnp.float32,
                            chunked_encoder=False)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        y_chunked = bundle.apply(variables, x)
        y_canon = canon.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y_chunked),
                                   np.asarray(y_canon), atol=2e-5)
        # and the param trees are structurally identical
        v2 = canon.init(64)
        t1 = jax.tree_util.tree_structure(variables)
        t2 = jax.tree_util.tree_structure(v2)
        assert t1 == t2

    def test_chunked_encoder_bf16_rounding_regime(self):
        """In the PRODUCTION bf16 path the chunked encoder must stay on the
        canonical path's rounding regime: 1x1 partial sums accumulate in
        f32 and round once (densenet_unet.dense_block_chunked), so bf16
        outputs track the canonical single-conv results to within ordinary
        bf16 noise rather than drifting by per-slice rounding x 58 layers."""
        chunk = build_model("dense", dtype=jnp.bfloat16,
                            chunked_encoder=True)
        canon = build_model("dense", dtype=jnp.bfloat16,
                            chunked_encoder=False)
        variables = chunk.init(64)
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        y_chunked = np.asarray(chunk.apply(variables, x), np.float32)
        y_canon = np.asarray(canon.apply(variables, x), np.float32)
        # remaining delta is pure bf16 summation-order noise (measured max
        # |dP| ~5e-3 on random init); per-slice bf16 rounding would not hold
        # this bound
        np.testing.assert_allclose(y_chunked, y_canon, atol=1e-2)


class TestPackedHeads:
    def test_packed_heads_matches_canonical(self):
        """packed_heads=True computes the same function as the canonical
        per-branch path with an IDENTICAL parameter tree: parallel 1x1
        branch heads become one conv (kernels concatenated along C_out —
        each output channel keeps its own dot) + folded BN affine + split
        (inception_unet.py cb_packed).  Variables init'd from one module
        apply unchanged through the other."""
        packed = build_model("inception", dtype=jnp.float32,
                             packed_heads=True)
        canon = build_model("inception", dtype=jnp.float32,
                            packed_heads=False)
        v = canon.init(64)
        rng = np.random.default_rng(23)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        y_packed = packed.apply(v, x)
        y_canon = canon.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_packed),
                                   np.asarray(y_canon), atol=2e-5)
        v2 = packed.init(64)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        shapes = jax.tree_util.tree_map(lambda a: a.shape, v)
        shapes2 = jax.tree_util.tree_map(lambda a: a.shape, v2)
        assert shapes == shapes2


class TestHaloCrop:
    @pytest.mark.parametrize("name", ["dense", "inception"])
    def test_equals_canonical_center_crop(self, name):
        """halo_crop=h: the (H-2h)^2 output equals the canonical forward's
        center crop exactly — decoder feature maps are cropped only down to
        margins that cover the remaining ops' receptive field, so no kept
        output pixel ever sees the (zero-padded) cut edges."""
        h = 64
        crop = build_model(name, dtype=jnp.float32, halo_crop=h)
        canon = build_model(name, dtype=jnp.float32)
        v = canon.init(192)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 192, 192, 3)).astype(np.float32))
        y_crop = crop.apply(v, x)
        y_full = canon.apply(v, x)
        assert y_crop.shape[1:3] == (64, 64)
        np.testing.assert_allclose(np.asarray(y_crop),
                                   np.asarray(y_full[:, h:-h, h:-h]),
                                   atol=2e-5)
        # identical parameter tree (halo_crop is compute-only)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(crop.init(192)))


class TestBinaryHead:
    """apply_p1 (rank-3 p(class 1)) equals apply(...)[..., 1] exactly for
    every registered model — the engine consumes only class 1, and the
    binary head avoids the TPU 128-lane channel padding at full resolution
    (models/heads.py; ~39 ms/forward at tile 4096, tools/encoder_probe2.py).
    """

    @pytest.mark.parametrize("name", ["tiny", "oracle", "dense",
                                      "inception", "deeplabv3"])
    def test_matches_softmax_class1(self, name):
        b = build_model(name, dtype=jnp.float32)
        v = b.init(64)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        full = b.apply(v, x)
        p1 = b.apply_p1(v, x)
        assert p1.shape == full.shape[:-1]
        np.testing.assert_allclose(np.asarray(p1),
                                   np.asarray(full[..., 1]), atol=2e-5)


class TestH5Converter:
    def _fake_keras_h5(self, path, variables):
        """Emit variables as a Keras-save_weights-layout h5 (inverse map)."""
        import h5py

        inv = {("params", "kernel"): "kernel:0", ("params", "bias"): "bias:0",
               ("params", "scale"): "gamma:0",
               ("batch_stats", "mean"): "moving_mean:0",
               ("batch_stats", "var"): "moving_variance:0"}
        layers = {}
        for coll in variables:
            for lname, leaves in variables[coll].items():
                kname = lname.replace("__", "/")
                for leaf, arr in leaves.items():
                    if coll == "params" and leaf == "bias" and (
                            "bn" in lname or "normalization" in lname):
                        suffix = "beta:0"
                    else:
                        suffix = inv[(coll, leaf)]
                    layers.setdefault(kname, []).append((suffix, np.asarray(arr)))
        with h5py.File(path, "w") as f:
            f.attrs["layer_names"] = np.array(
                sorted({ln.split("/")[0] for ln in layers}), dtype="S")
            for kname, ws in layers.items():
                top = kname.split("/")[0]
                grp = f.require_group(top)
                names = []
                for suffix, arr in ws:
                    wn = f"{kname}/{suffix}"
                    grp.create_dataset(wn, data=arr)  # Keras: full path in group
                    names.append(wn)
                prev = [n.decode() if isinstance(n, bytes) else n
                        for n in grp.attrs.get("weight_names", [])]
                grp.attrs["weight_names"] = np.array(prev + names, dtype="S")

    def test_roundtrip_tiny(self, tmp_path):
        from digipathai_tpu.models.convert_h5 import keras_h5_to_flax

        b = build_model("dense")
        v = b.init(32, seed=3)
        # perturb so the roundtrip is distinguishable from re-init
        v = jax.tree_util.tree_map(lambda a: np.asarray(a) + 0.25, v)
        p = tmp_path / "fake.h5"
        self._fake_keras_h5(p, v)
        template = b.init(32, seed=7)
        out = keras_h5_to_flax(str(p), template, strict=True)
        for coll in v:
            a_leaves = jax.tree_util.tree_leaves(v[coll])
            b_leaves = jax.tree_util.tree_leaves(out[coll])
            assert len(a_leaves) == len(b_leaves)
            for x, y in zip(a_leaves, b_leaves):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_shape_mismatch_raises(self, tmp_path):
        import h5py

        from digipathai_tpu.models.convert_h5 import keras_h5_to_flax

        b = build_model("tiny")
        template = b.init(32)
        lname = next(iter(template["params"]))
        with h5py.File(tmp_path / "bad.h5", "w") as f:
            grp = f.require_group(lname)
            grp.attrs["weight_names"] = [f"{lname}/kernel:0".encode()]
            grp.create_dataset("kernel:0", data=np.zeros((9, 9, 9, 9), np.float32))
            f.attrs["layer_names"] = [lname.encode()]
        with pytest.raises(ValueError, match="shape mismatch"):
            keras_h5_to_flax(str(tmp_path / "bad.h5"), template)


class TestWeightsFallback:
    def test_random_fallback_offline(self, tmp_path, monkeypatch):
        from digipathai_tpu.models import weights

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path))
        b = build_model("tiny")
        with pytest.warns(UserWarning, match="RANDOM"):
            v = weights.load_variables(b, "breast", "dense", patch_size=32)
        assert "params" in v

    def test_not_allow_random_raises(self, tmp_path, monkeypatch):
        from digipathai_tpu.models import weights

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path))
        b = build_model("tiny")
        with pytest.raises(IOError):
            weights.load_variables(b, "breast", "dense", 32, allow_random=False)

    def test_mode_paths(self):
        from digipathai_tpu.models import weights

        assert weights.h5_url("colon", "dense").endswith("digestpath_densenet.h5")
        assert weights.h5_url("breast", "deeplabv3").endswith("camelyon_deeplabv3.h5")
        assert weights.h5_url("liver", "inception").endswith("paip_inception.h5")
