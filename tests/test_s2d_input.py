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


@pytest.mark.parametrize("t", list(tta.ALLOWED) + [tta.DEFAULT])
def test_packed_tta_equals_full_res(t):
    """apply_packed(pack(x), t) == pack(apply(x, t)) for even sides."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))
    got = s2d_input.apply_packed(s2d_input.pack(x), t)
    want = s2d_input.pack(tta.apply(x, t))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tile_step_packed_matches_canonical():
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
    packed = build_model("dense", dtype=jnp.float32, s2d_stem=True)
    v = canon.init(tile + 2 * halo)
    (step_c,), _, _ = build_model_tile_steps(
        [canon], tta_list, tile, halo, compute_dtype=jnp.float32)
    (step_p,), _, _ = build_model_tile_steps(
        [packed], tta_list, tile, halo, compute_dtype=jnp.float32)
    s_c, q_c = step_c(v, jnp.asarray(tile_u8))
    s_p, q_p = step_p(v, jnp.asarray(s2d_input.pack_host(tile_u8)))
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


@pytest.mark.parametrize("name", ["dense", "inception", "deeplabv3"])
def test_s2d_stem_matches_canonical(name):
    """s2d_stem=True on the packed input computes the same function as the
    canonical stem on the full-res input, with an IDENTICAL parameter
    tree (the stem kernel is re-indexed inside the forward pass)."""
    packed = build_model(name, dtype=jnp.float32, s2d_stem=True)
    canon = build_model(name, dtype=jnp.float32)
    v = canon.init(64)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    y_canon = canon.apply(v, x)
    y_packed = packed.apply(v, s2d_input.pack(x))
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_canon),
                               atol=2e-5)
    import jax
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(packed.init(64)))
