"""Training subsystem tests: losses, optimization, sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model
from digipathai_tpu.training import losses
from digipathai_tpu.training.train import init_state, make_train_step, shard_train_step


class TestLosses:
    def test_ce_matches_manual(self, rng):
        p = rng.random((4, 8, 8, 2)).astype(np.float32)
        p = p / p.sum(-1, keepdims=True)
        y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (4, 8, 8))]
        got = float(losses.categorical_crossentropy(jnp.asarray(p), jnp.asarray(y)))
        want = float(-(y * np.log(np.clip(p, 1e-7, 1))).sum(-1).mean())
        assert abs(got - want) < 1e-5

    def test_dice_perfect_prediction(self):
        y = np.zeros((1, 8, 8, 2), np.float32)
        y[..., 1] = 1.0
        assert float(losses.soft_dice_loss(jnp.asarray(y), jnp.asarray(y))) < 1e-3

    def test_dice_worst_case(self):
        y = np.zeros((1, 8, 8, 2), np.float32)
        y[..., 1] = 1.0
        p = 1.0 - y
        assert float(losses.soft_dice_loss(jnp.asarray(p), jnp.asarray(y))) > 0.9


class TestTrainStep:
    def test_loss_decreases_on_tiny_unet(self, rng):
        bundle = build_model("tiny")
        state = init_state(bundle, 32, learning_rate=1e-2)
        step = jax.jit(make_train_step(bundle, learning_rate=1e-2))
        x = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
        # learn "dark half is class 1"
        lab = np.zeros((4, 32, 32), np.int64)
        lab[:, 16:] = 1
        y = jnp.asarray(np.eye(2, dtype=np.float32)[lab])
        variables, opt_state = state.variables, state.opt_state
        first = last = None
        # Adaptive horizon: the trajectory plateaus ~0.93 for a host-FP-
        # dependent 15-40 steps before collapsing (two different CI CPUs
        # crossed the halving bar at step ~25 and step ~45 respectively),
        # so any fixed step count is flaky.  Run until the loss halves,
        # bounded at 200 steps (~5x the slowest observed crossing).
        for i in range(200):
            variables, opt_state, loss = step(variables, opt_state, x, y)
            last = float(loss)
            if first is None:
                first = last
            if last < first * 0.5:
                break
        assert last < first * 0.5, (first, last)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
    def test_sharded_step_runs_and_matches_serial_loss(self, rng):
        from digipathai_tpu.parallel import mesh as mesh_lib

        bundle = build_model("tiny")
        state = init_state(bundle, 32)
        step = make_train_step(bundle)
        x = jnp.asarray(rng.random((8, 64, 64, 3)).astype(np.float32))
        y = jnp.asarray(np.eye(2, dtype=np.float32)[
            rng.integers(0, 2, (8, 64, 64))])

        # serial
        v1, o1, loss1 = jax.jit(step)(state.variables, state.opt_state, x, y)

        # sharded over (dp, sp, mp)
        mesh = mesh_lib.make_mesh(8)
        variables = mesh_lib.shard_variables(state.variables, mesh)
        import jax.sharding as shd

        opt_state = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, shd.NamedSharding(
                mesh, mesh_lib.param_spec(getattr(l, "shape", ()),
                                          mesh.shape["mp"])))
            if hasattr(l, "shape") else l,
            state.opt_state)
        sharded = shard_train_step(step, mesh, variables, opt_state)
        v2, o2, loss2 = sharded(variables, opt_state, x, y)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
