"""Opt-in int8 quantized inference (models/quant.py).

Checks the three contracts that make ``quantized=True`` safe to offer:
the parameter tree is byte-identical to the exact model (checkpoints load
unchanged), narrow/grouped convs fall back to the exact path, and the
quantization error of an eligible conv is small and bounded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestQuantConv:
    def test_wide_conv_error_bounded(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 256)), jnp.float32)
        q = QuantConv(128, (3, 3), padding="SAME", dtype=jnp.float32)
        e = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        yq = q.apply(v, x)
        ye = e.apply(v, x)  # same param tree by construction
        scale = float(jnp.max(jnp.abs(ye)))
        err = float(jnp.max(jnp.abs(yq - ye))) / scale
        # int8 symmetric quant: worst-case relative error ~1-2%
        assert err < 0.03, err

    def test_param_tree_identical_to_nn_conv(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        x = jnp.zeros((1, 8, 8, 256), jnp.float32)
        vq = QuantConv(256, (3, 3)).init(jax.random.PRNGKey(0), x)
        ve = nn.Conv(256, (3, 3)).init(jax.random.PRNGKey(0), x)
        tq = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vq)
        te = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ve)
        assert tq == te

    def test_narrow_conv_is_exact(self):
        """Below min_channels the layer must use the exact nn.Conv path."""
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.float32)
        q = QuantConv(64, (3, 3), padding="SAME", dtype=jnp.float32)
        e = nn.Conv(64, (3, 3), padding="SAME", dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(q.apply(v, x)),
                                      np.asarray(e.apply(v, x)))

    def test_depthwise_is_exact(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 256)), jnp.float32)
        q = QuantConv(256, (3, 3), feature_group_count=256,
                      dtype=jnp.float32)
        e = nn.Conv(256, (3, 3), feature_group_count=256, dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(q.apply(v, x)),
                                      np.asarray(e.apply(v, x)))

    def test_strided_quant_conv_matches_shape_and_value(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 192)), jnp.float32)
        q = QuantConv(192, (3, 3), strides=(2, 2), padding="SAME",
                      dtype=jnp.float32)
        e = nn.Conv(192, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        yq, ye = q.apply(v, x), e.apply(v, x)
        assert yq.shape == ye.shape
        rel = float(jnp.max(jnp.abs(yq - ye)) / jnp.max(jnp.abs(ye)))
        assert rel < 0.03, rel


class TestQuantizedModel:
    def test_static_calibrated_matches_dynamic_on_calib_input(self):
        """quantized='static' (VERDICT r3 item 1a): on the calibration input
        the constant scales equal the dynamic ones, so outputs are
        bit-identical; off-calibration inputs clip gracefully."""
        import flax.linen as nn

        from digipathai_tpu.models.quant import (
            QuantConv, QuantConvCalib, QuantConvStatic, calibrate)

        class Net(nn.Module):
            ctor: type

            @nn.compact
            def __call__(self, x, train=False):
                x = self.ctor(256, (3, 3), name="c1", dtype=jnp.float32)(x)
                x = nn.relu(x)
                return self.ctor(256, (3, 3), name="c2",
                                 dtype=jnp.float32)(x)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 256)), jnp.float32)
        dyn = Net(QuantConv)
        v = dyn.init(jax.random.PRNGKey(0), x)
        calib = calibrate(Net(QuantConvCalib), v, [x], jit=True)
        assert set(calib) == {"c1", "c2"}
        st = Net(QuantConvStatic)
        np.testing.assert_array_equal(
            np.asarray(st.apply({**v, "calib": calib}, x)),
            np.asarray(dyn.apply(v, x)))
        # out-of-range input: clipping keeps the error bounded
        y2d = np.asarray(dyn.apply(v, x * 1.5))
        y2s = np.asarray(st.apply({**v, "calib": calib}, x * 1.5))
        assert np.max(np.abs(y2s - y2d)) / np.max(np.abs(y2d)) < 0.1

    def test_static_requires_calibration(self):
        from digipathai_tpu.models.quant import QuantConvStatic

        x = jnp.zeros((1, 8, 8, 256), jnp.float32)
        q = QuantConvStatic(256, (3, 3), dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        v.pop("calib", None)
        with pytest.raises(ValueError, match="calibrated"):
            q.apply(v, x)

    def test_dense_static_quantized_model(self):
        """Model-level: calibrate the dense net, run static, match dynamic
        on the calibration input."""
        from digipathai_tpu.models.quant import calibrate
        from digipathai_tpu.models.registry import build_model

        bd = build_model("dense", dtype=jnp.float32, quantized=True)
        bc = build_model("dense", dtype=jnp.float32, quantized="calib")
        bs = build_model("dense", dtype=jnp.float32, quantized="static")
        v = bd.init(64)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        calib = calibrate(bc.module, v, [x], jit=True, train=False)
        pd = np.asarray(bd.apply(v, x))
        ps = np.asarray(bs.apply(dict(v, calib=calib), x))
        np.testing.assert_array_equal(ps, pd)

    def test_dense_quantized_close_and_same_tree(self):
        """quantized=True keeps the param tree and stays close in probs."""
        from digipathai_tpu.models.registry import build_model

        be = build_model("dense", dtype=jnp.float32)
        bq = build_model("dense", dtype=jnp.float32, quantized=True)
        v = be.init(64)
        tq = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                    bq.init(64))
        te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
        assert tq == te

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        pe = np.asarray(be.apply(v, x))[..., 1]
        pq = np.asarray(bq.apply(v, x))[..., 1]
        # probabilities: deviations accumulate across ~60 quantized convs
        assert np.mean(np.abs(pe - pq)) < 0.05
        assert np.isfinite(pq).all()


def test_engine_static_quant_autocalibrates(tmp_path, monkeypatch):
    """getSegmentation(quantized="static") must reach the static int8 path
    (auto-calibrating on real tissue patches), not silently downgrade to
    dynamic quantization — the pre-round-4 bug coerced the mode to True."""
    import os

    from digipathai_tpu import Slide, getSegmentation
    from digipathai_tpu.models import quant as quant_mod
    from tests.fixtures import make_synthetic_slide

    monkeypatch.setenv("DPAI_OFFLINE", "1")
    monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
    calls = []
    real_calibrate = quant_mod.calibrate

    def spy(*a, **kw):
        out = real_calibrate(*a, **kw)
        calls.append(jax.tree_util.tree_leaves(out))
        return out

    monkeypatch.setattr(quant_mod, "calibrate", spy)
    p = str(tmp_path / "sq-slide.tiff")
    make_synthetic_slide(p, 512, 512, seed=5)
    getSegmentation(
        img_path=p, patch_size=128, stride_size=128, batch_size=4,
        quick=True, model="dense", mode="colon",
        probs_path=str(tmp_path / "p.tiff"),
        mask_path=str(tmp_path / "m.tiff"),
        uncertainty_path=str(tmp_path / "u.tiff"),
        supertile=256, quantized="static",
        data_parallel=False, compute_dtype=jnp.float32, status={})
    assert os.path.exists(str(tmp_path / "m.tiff"))
    with Slide(str(tmp_path / "m.tiff")) as s:
        assert s.dimensions == (512, 512)
    # the static path calibrated per-layer scales, and they are real
    # (non-zero) activation maxima, not initializer zeros
    assert len(calls) == 1
    assert all(float(a) > 0 for a in calls[0])


def test_per_model_quant_spec_resolution():
    """`quantized` accepts per-model dicts and spec strings (VERDICT r4
    item 3): static int8 wins on deeplab but loses on dense, so the engine
    must be able to quantize only part of the ensemble."""
    import pytest

    from digipathai_tpu.engine.segmentation import (_parse_quant_spec,
                                                    _quant_tag, _resolve_quant)

    assert _parse_quant_spec("deeplabv3:static") == {"deeplabv3": "static"}
    assert _parse_quant_spec("deeplabv3:static,dense:dynamic") == {
        "deeplabv3": "static", "dense": True}
    assert _parse_quant_spec("inception:off") == {"inception": False}
    assert _parse_quant_spec("static") == "static"  # uniform passthrough
    # name-substring dispatch matches build_model's registry resolution
    assert _parse_quant_spec("my_deeplabv3_v2:calib") == {"deeplabv3": "calib"}
    with pytest.raises(ValueError):
        _parse_quant_spec("dense:int4")

    assert _resolve_quant("deeplabv3:static", "deeplabv3") == "static"
    assert _resolve_quant("deeplabv3:static", "dense") is False
    assert _resolve_quant({"dense": True}, "dense") is True
    assert _resolve_quant("static", "inception") == "static"
    assert _resolve_quant(False, "dense") is False

    # resume cfg_key tag: dict order / string spelling must not matter
    assert _quant_tag({"dense": True, "deeplabv3": "static"}) == \
        _quant_tag("deeplabv3:static,dense:dynamic")
    assert _quant_tag("inception:off") == _quant_tag({})

    # scoped to the run's models: a spec naming a model absent from the run
    # must not change the cfg_key (the maps' contents are identical), and a
    # uniform mode must hash like the equivalent per-model dict
    run = ("dense", "inception")
    assert _quant_tag("deeplabv3:static", keys=run) == \
        _quant_tag(False, keys=run) == ()
    assert _quant_tag("static", keys=run) == \
        _quant_tag({"dense": "static", "inception": "static"}, keys=run)
    assert _quant_tag("deeplabv3:static", keys=("deeplabv3",)) == \
        (("deeplabv3", "static"),)


def test_engine_per_model_quant_gates_calibration(tmp_path, monkeypatch):
    """With a per-model spec, only the named models are calibrated: a spec
    naming a model NOT in the run must leave the whole run unquantized."""
    from digipathai_tpu import getSegmentation
    from digipathai_tpu.models import quant as quant_mod
    from tests.fixtures import make_synthetic_slide

    monkeypatch.setenv("DPAI_OFFLINE", "1")
    monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
    calls = []
    real_calibrate = quant_mod.calibrate

    def spy(*a, **kw):
        calls.append(1)
        return real_calibrate(*a, **kw)

    monkeypatch.setattr(quant_mod, "calibrate", spy)
    p = str(tmp_path / "pmq-slide.tiff")
    make_synthetic_slide(p, 512, 512, seed=6)

    def run(label, quantized):
        getSegmentation(
            img_path=p, patch_size=128, stride_size=128, batch_size=4,
            quick=True, model="dense", mode="colon",
            probs_path=str(tmp_path / f"{label}-p.tiff"),
            mask_path=str(tmp_path / f"{label}-m.tiff"),
            uncertainty_path=str(tmp_path / f"{label}-u.tiff"),
            supertile=256, quantized=quantized,
            data_parallel=False, compute_dtype=jnp.float32, status={})

    run("other", "deeplabv3:static")  # dense-only run: nothing to quantize
    assert calls == []
    run("this", "dense:static")       # named model present: calibrated once
    assert calls == [1]
