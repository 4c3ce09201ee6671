"""Multi-device tests on the 8-device fake CPU mesh (conftest forces it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device fake CPU topology")


class TestShardedStep:
    def test_matches_single_device(self, rng):
        """Grid-DP stitching must be bit-identical to single-device."""
        from digipathai_tpu.engine.infer import build_step
        from digipathai_tpu.models.registry import build_model
        from digipathai_tpu.ops.stitch import make_accumulator
        from digipathai_tpu.parallel import inference as par

        P_, S, B, D = 32, 128, 4, 8
        bundle = build_model("oracle", dtype=jnp.float32)
        variables = (bundle.init(P_),)
        patches = rng.integers(0, 255, (B * D, P_, P_, 3)).astype(np.uint8)
        offsets = rng.integers(0, S, (B * D, 2)).astype(np.int32)
        valid = rng.random(B * D) > 0.2
        tta = ["DEFAULT", "ROTATE_90"]

        # single device
        step1 = build_step([bundle], tta, P_, compute_dtype=jnp.float32)
        acc1 = make_accumulator(S, P_)
        out1 = np.asarray(step1(variables, acc1, patches, offsets, valid))

        # 8-device dp
        mesh = par.make_dp_mesh(D)
        stepd = par.build_sharded_step([bundle], tta, P_, mesh,
                                       compute_dtype=jnp.float32)
        accd = par.make_sharded_accumulator(mesh, S, P_)
        pd, od, vd = par.shard_batch(mesh, patches, offsets, valid)
        accd = stepd(variables, accd, pd, od, vd)
        outd = np.asarray(par.reduce_accumulator(mesh, accd))

        np.testing.assert_allclose(outd, out1, atol=1e-5)

    def test_engine_dp_equals_serial(self, tmp_path, monkeypatch):
        """getSegmentation with data_parallel on/off gives identical maps."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = tmp_path / "dp-slide.tiff"
        make_synthetic_slide(str(p), 512, 512, seed=21)
        outs = []
        for dp in (False, True):
            out = getSegmentation(
                img_path=str(p), patch_size=128, stride_size=64, batch_size=4,
                quick=True, model="oracle", mode="breast",
                probs_path=str(tmp_path / f"p{dp}.tiff"),
                mask_path=str(tmp_path / f"m{dp}.tiff"),
                uncertainty_path=str(tmp_path / f"u{dp}.tiff"),
                supertile=256, num_workers=2, data_parallel=dp)
            outs.append(np.asarray(out).copy())
        np.testing.assert_array_equal(outs[0], outs[1])


class TestMeshFactorization:
    def test_factor(self):
        from digipathai_tpu.parallel.mesh import factor_devices

        assert factor_devices(8) == (2, 2, 2)
        assert factor_devices(4) == (1, 2, 2)
        assert factor_devices(1) == (1, 1, 1)
        dp, sp, mp = factor_devices(16)
        assert dp * sp * mp == 16

    def test_make_mesh_validates(self):
        from digipathai_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="visible"):
            make_mesh(1024)
        mesh = make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["sp"] * mesh.shape["mp"] == 8
