"""Sharded training step (dp x sp x mp) for the segmentation models.

The reference has no working training path (vestigial imports,
``reference DigiPathAI/Segmentation.py:25-27``); this provides a first-class
TPU trainer: one jitted step — forward (bf16), CE+Dice loss (f32), adam —
with the batch sharded over (dp, sp) and conv channels over mp.  XLA GSPMD
inserts the conv halo exchanges for the spatially sharded activations and
the gradient all-reduces across dp; no hand-written collectives needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel import mesh as mesh_lib
from .losses import make_optimizer, segmentation_loss


@dataclass
class TrainState:
    variables: Any          # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: int = 0


def init_state(bundle, patch_size: int, learning_rate: float = 1e-4,
               seed: int = 0) -> TrainState:
    variables = bundle.init(patch_size, seed=seed)
    tx = make_optimizer(learning_rate)
    opt_state = tx.init(variables["params"])
    return TrainState(variables=variables, opt_state=opt_state)


def make_train_step(bundle, learning_rate: float = 1e-4,
                    dice_weight: float = 0.5) -> Callable:
    """Returns ``step(variables, opt_state, patches_f32, labels_onehot)``.

    Pure function of its inputs — shard/jit it with `shard_train_step`.
    """
    tx = make_optimizer(learning_rate)

    def loss_fn(params, extra, x, y):
        variables = dict(extra)
        variables["params"] = params
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = bundle.module.apply(variables, x, train=True, mutable=mutable)
        probs, new_vars = out if mutable else (out, {})
        loss = segmentation_loss(probs, y, dice_weight)
        return loss, new_vars

    def step(variables, opt_state, x, y):
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        out_vars = dict(new_vars)
        out_vars["params"] = params
        for k, v in extra.items():
            out_vars.setdefault(k, v)
        return out_vars, opt_state, loss

    return step


def shard_train_step(step_fn, mesh: Mesh, variables, opt_state):
    """jit ``step_fn`` over ``mesh`` with real dp/sp/mp shardings."""
    var_sh = mesh_lib.variables_shardings(variables, mesh)
    opt_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, mesh_lib.param_spec(getattr(leaf, "shape", ()), mesh.shape["mp"]))
        if hasattr(leaf, "shape") else NamedSharding(mesh, P()),
        opt_state)
    batch_sh = NamedSharding(mesh, mesh_lib.batch_spec())
    label_sh = NamedSharding(mesh, mesh_lib.batch_spec())
    loss_sh = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(var_sh, opt_sh, batch_sh, label_sh),
        out_shardings=(var_sh, opt_sh, loss_sh),
        donate_argnums=(0, 1),
    )
