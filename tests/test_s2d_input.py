"""Host-packed s2d model input (ops/s2d_input.py + models' s2d_stem).

The stem lever (BASELINE.md round 3): the loader packs tiles 2x2
space-to-depth so the pathological C=3 stride-2 stem convs run as
half-res 12-channel convs.  Exactness contract: for every model,
``apply(v, pack(x), s2d_stem=True) == apply(v, x)``, and every packed
dihedral TTA transform equals pack(full-res transform).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model
from digipathai_tpu.ops import s2d_input, tta


def test_pack_layout_and_host_path():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (1, 8, 6, 3), np.uint8)
    p = s2d_input.pack(x)
    assert p.shape == (1, 4, 3, 12)
    # layout (py, px, c), c minor: channel (py*2+px)*3+c == x[2j+py, 2k+px, c]
    for py in (0, 1):
        for px in (0, 1):
            np.testing.assert_array_equal(
                p[0, :, :, (py * 2 + px) * 3:(py * 2 + px) * 3 + 3],
                x[0, py::2, px::2])
    np.testing.assert_array_equal(s2d_input.pack_host(x[0]), p[0])


@pytest.mark.parametrize("level", [1, 2])
def test_pack_n_roundtrip_and_layout(level):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 8, 3)).astype(np.float32)
    p = s2d_input.pack_n(x, level)
    P = 2 ** level
    assert p.shape == (2, 16 // P, 8 // P, 3 * P * P)
    np.testing.assert_array_equal(s2d_input.unpack_n(p, level), x)
    # _layout_codes inverts the nested layout: phase (ry, rx) of the packed
    # channel block holds full-res pixel (P*i + ry, P*j + rx)
    codes = s2d_input._layout_codes(level, 3)
    for ch, code in enumerate(codes):
        ry, rx, cc = code // (P * 3), (code // 3) % P, code % 3
        np.testing.assert_array_equal(p[..., ch], x[:, ry::P, rx::P, cc])


@pytest.mark.parametrize("stride,kk,pad_left", [
    (2, 7, 3),   # DenseNet 7x7/2 stem (explicit pad 3)
    (2, 3, 0),   # 3x3/2 SAME on even input (XLA pads (0, 1))
    (1, 3, 1),   # 3x3/1 SAME
])
@pytest.mark.parametrize("level", [1, 2])
def test_conv_kernel_packed_exact(stride, kk, pad_left, level):
    """conv(pack_n(x)) with the re-indexed kernel == pack of the full-res
    conv, for every (stride, pad, level) combination the stems use."""
    import jax.lax as lax

    if stride > 2 ** level:
        pytest.skip("stride must divide P")
    rng = np.random.default_rng(7)
    cin, cout = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(kk, kk, cin, cout)).astype(np.float32))
    pad_right = kk - stride - pad_left  # covers the last full-res output
    want = lax.conv_general_dilated(
        x, k, (stride, stride),
        ((pad_left, pad_right), (pad_left, pad_right)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k2, pads, lvl_out = s2d_input.conv_kernel_packed(k, stride, pad_left,
                                                     level)
    got = lax.conv_general_dilated(
        s2d_input.pack_n(x, level), k2, (1, 1), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_input.unpack_n(got, lvl_out)
    # fp32 accumulation order differs between the packed and full-res
    # contractions (147-tap sums at |y|~20 -> ~1e-5 jitter)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # bn_packed tiles a per-feature vector across the phases
    if lvl_out:
        v = jnp.arange(cout, dtype=jnp.float32)
        tiled = s2d_input.bn_packed(v, lvl_out)
        ref = s2d_input.pack_n(
            jnp.broadcast_to(v, (1, 4, 4, cout)), lvl_out)[0, 0, 0]
        np.testing.assert_array_equal(np.asarray(tiled), np.asarray(ref))


@pytest.mark.parametrize("pad_before,pad_value", [(0, float("-inf")),
                                                  (1, 0.0)])
def test_maxpool3s2_consume(pad_before, pad_value):
    """Packed 3x3/2 maxpool == full-res maxpool for both stem paddings
    (inception: SAME/-inf; densenet: explicit zero-pad after relu)."""
    import flax.linen as nn

    rng = np.random.default_rng(9)
    # non-negative, as after a relu (makes 0-pad == -inf-pad)
    x = jnp.asarray(np.abs(rng.normal(size=(2, 16, 16, 4))
                           ).astype(np.float32))
    if pad_before:
        full = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        want = nn.max_pool(full, (3, 3), strides=(2, 2), padding="VALID")
    else:
        want = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
    got = s2d_input.maxpool3s2_consume(s2d_input.pack(x), pad_before,
                                       pad_value)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("level", [1, 2])
@pytest.mark.parametrize("t", list(tta.ALLOWED) + [tta.DEFAULT])
def test_packed_tta_equals_full_res(t, level):
    """apply_packed(pack_n(x, L), t, L) == pack_n(apply(x, t), L) for
    sides divisible by 2**L."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))
    got = s2d_input.apply_packed(s2d_input.pack_n(x, level), t, level)
    want = s2d_input.pack_n(tta.apply(x, t), level)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("level", [1, 2])
def test_tile_step_packed_matches_canonical(level):
    """The full tile step — normalize, (packed) TTA, forward, halo crop,
    TTA inversion, sum/sumsq — gives the same result fed a host-packed
    tile as the canonical step fed the raw tile."""
    from digipathai_tpu.engine.tile_infer import build_model_tile_steps

    tile, halo = 128, 32
    tta_list = ["FLIP_LEFT_RIGHT", "ROTATE_90"]
    rng = np.random.default_rng(5)
    tile_u8 = rng.integers(0, 255, (tile + 2 * halo, tile + 2 * halo, 3),
                           np.uint8)

    canon = build_model("dense", dtype=jnp.float32)
    packed = build_model("dense", dtype=jnp.float32, s2d_stem=level)
    v = canon.init(tile + 2 * halo)
    (step_c,), _, _ = build_model_tile_steps(
        [canon], tta_list, tile, halo, compute_dtype=jnp.float32)
    (step_p,), _, _ = build_model_tile_steps(
        [packed], tta_list, tile, halo, compute_dtype=jnp.float32)
    s_c, q_c = step_c(v, jnp.asarray(tile_u8))
    s_p, q_p = step_p(v, jnp.asarray(s2d_input.pack_host(tile_u8, level)))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_c), atol=3e-5)


def test_engine_s2d_input_runs(tmp_path, monkeypatch):
    """getSegmentation(s2d_input=True) in tile mode packs on host and
    produces artifacts (quick single-model pass)."""
    import os

    from tests.fixtures import make_synthetic_slide
    from digipathai_tpu import Slide, getSegmentation

    monkeypatch.setenv("DPAI_OFFLINE", "1")
    monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
    p = str(tmp_path / "s2d-slide.tiff")
    make_synthetic_slide(p, 512, 512, seed=9)
    getSegmentation(
        img_path=p, quick=True, model="dense", mode="colon",
        probs_path=str(tmp_path / "p.tiff"),
        mask_path=str(tmp_path / "m.tiff"),
        uncertainty_path=str(tmp_path / "u.tiff"),
        supertile=256, inference_mode="tile", s2d_input=True,
        data_parallel=False, compute_dtype=jnp.float32, status={})
    assert os.path.exists(str(tmp_path / "m.tiff"))
    with Slide(str(tmp_path / "m.tiff")) as s:
        assert s.dimensions == (512, 512)


@pytest.mark.parametrize("level", [1, 2])
@pytest.mark.parametrize("name", ["dense", "inception", "deeplabv3"])
def test_s2d_stem_matches_canonical(name, level):
    """s2d_stem=L on the packed input computes the same function as the
    canonical stem on the full-res input, with an IDENTICAL parameter
    tree (the stem kernels are re-indexed inside the forward pass)."""
    packed = build_model(name, dtype=jnp.float32, s2d_stem=level)
    canon = build_model(name, dtype=jnp.float32)
    v = canon.init(64)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    y_canon = canon.apply(v, x)
    y_packed = packed.apply(v, s2d_input.pack_n(x, level))
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_canon),
                               atol=2e-5)
    import jax
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(packed.init(64)))

def test_resolve_s2d_level_default_gate():
    """The engine defaults to s2d level 1 in tile mode ("auto") and never
    packs in patch mode, at explicit 0/False, or at non-dividing sides."""
    from digipathai_tpu.engine.segmentation import resolve_s2d_level

    assert resolve_s2d_level("auto", "tile", 4096, 256) == 1
    assert resolve_s2d_level("auto", "patch", 4096, 256) == 0
    assert resolve_s2d_level(False, "tile", 4096, 256) == 0
    assert resolve_s2d_level(0, "tile", 4096, 256) == 0
    assert resolve_s2d_level(True, "tile", 4096, 256) == 1
    assert resolve_s2d_level(2, "tile", 4096, 256) == 2
    # side = 255 + 2*16 = 287 (odd) — cannot pack
    assert resolve_s2d_level("auto", "tile", 255, 32) == 0
    # side = 258 + 2*16 = 290: divisible by 2, not by 4
    assert resolve_s2d_level(2, "tile", 258, 32) == 0
    assert resolve_s2d_level(1, "tile", 258, 32) == 1
