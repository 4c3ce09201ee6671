"""Spatially-sharded tile step: 8 chips cooperating on one supertile."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device fake CPU topology")


def test_sp_tile_matches_single_device(rng):
    from jax.sharding import Mesh

    from digipathai_tpu.engine.tile_infer import (build_tile_step,
                                                  build_tile_step_sp)
    from digipathai_tpu.models.registry import build_model

    tile, halo = 96, 16  # (tile + 2*halo) = 128, divisible by 8 shards * 4
    bundle = build_model("tiny", dtype=jnp.float32)
    v = bundle.init(tile + 2 * halo)
    img = rng.integers(0, 255, (tile + 2 * halo, tile + 2 * halo, 3)
                       ).astype(np.uint8)

    base = build_tile_step([bundle], ["DEFAULT", "ROTATE_90"], tile, halo,
                           compute_dtype=jnp.float32)
    m1, v1 = base((v,), jnp.asarray(img))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    sp = build_tile_step_sp([bundle], ["DEFAULT", "ROTATE_90"], tile, halo,
                            mesh, compute_dtype=jnp.float32)
    m8, v8 = sp((v,), jnp.asarray(img))

    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1), atol=1e-5)
