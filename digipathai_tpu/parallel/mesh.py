"""Device-mesh construction and sharding rules.

The reference is single-GPU (``reference DigiPathAI/Segmentation.py:62``);
scaling here is jax.sharding-native (SURVEY.md §2.4): a (dp, sp, mp) mesh
where

- ``dp``  shards the patch batch (grid data parallelism),
- ``sp``  shards the spatial H axis of activations (XLA GSPMD inserts the
  conv halo exchanges — the TPU analog of the reference's host-side tiling),
- ``mp``  shards convolution output channels (tensor parallelism; XLA
  inserts the all-reduces).

No pipeline or expert axes: the largest model (~66M params) fits per-chip
many times over, and there are no MoE layers (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "mp")


def factor_devices(n: int) -> Tuple[int, int, int]:
    """Split n devices into (dp, sp, mp) with dp * sp * mp == n exactly.

    sp and mp take at most a factor of 2 each from n's power-of-2 part;
    everything else (including any odd factor) goes to dp.
    """
    pow2 = n & -n  # largest power of 2 dividing n
    sp = 2 if pow2 >= 2 else 1
    mp = 2 if pow2 >= 4 else 1
    dp = n // (sp * mp)
    assert dp * sp * mp == n
    return dp, sp, mp


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"with JAX_PLATFORMS=cpu to fake a topology)")
        devices = devices[:n_devices]
    dp, sp, mp = factor_devices(len(devices))
    arr = np.asarray(devices).reshape(dp, sp, mp)
    return Mesh(arr, AXES)


def batch_spec() -> P:
    """(B, X, Y, C) patches: batch over dp, spatial X over sp."""
    return P("dp", "sp", None, None)


def param_spec(path_leaf_shape, mp_size: int) -> P:
    """Shard a parameter's last (output-channel) axis over mp if divisible."""
    shape = path_leaf_shape
    if len(shape) >= 1 and mp_size > 1 and shape[-1] % mp_size == 0 and shape[-1] >= mp_size * 8:
        return P(*([None] * (len(shape) - 1) + ["mp"]))
    return P()


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree on the mesh with channel-wise mp sharding."""
    mp_size = mesh.shape["mp"]

    def place(leaf):
        spec = param_spec(leaf.shape, mp_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, variables)


def variables_shardings(variables, mesh: Mesh):
    mp_size = mesh.shape["mp"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, param_spec(leaf.shape, mp_size)),
        variables)
