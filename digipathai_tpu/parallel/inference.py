"""Multi-chip inference: the patch grid sharded across a 'dp' device axis.

SURVEY.md §2.4/§5 design: each chip runs the ensemble x TTA forward on its
shard of the batch and scatter-adds into its *own* supertile accumulator
(shard_map — no cross-chip traffic in the hot loop); at supertile flush the
per-chip accumulators are summed with one XLA all-reduce over ICI and the
result streamed to the host memmap.  This is the TPU replacement for the
reference's single-GPU batching (``reference Segmentation.py:62,154``).

Correctness invariant (tested): the stitched maps are bit-identical to the
single-device engine for the same plan, because overlap-add is associative
and padding patches are masked out.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import tta as tta_ops
from ..ops.color import normalize_patches
from ..ops.stitch import stitch_batch


def make_dp_mesh(n_devices=None) -> Mesh:
    """Grid-DP mesh over this host's LOCAL devices.

    A slide run is driven by one process; in a multi-host sweep each host
    segments its own slides (parallel/distributed.py), so the inference mesh
    must never span hosts — a global mesh would make independent per-host
    runs deadlock in cross-host collectives.
    """
    import numpy as np

    devices = jax.local_devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # mirror make_mesh (parallel/mesh.py): a silent truncation
            # would run "parallel" work on fewer chips with no signal
            raise ValueError(
                f"requested a {n_devices}-device dp mesh but only "
                f"{len(devices)} local devices are visible "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"with JAX_PLATFORMS=cpu to fake a topology)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("dp",))


def build_sharded_step(bundles: Sequence, tta_list: Sequence[str], patch: int,
                       mesh: Mesh, faithful_tta: bool = False,
                       compute_dtype=jnp.bfloat16,
                       mask_predictions: bool = False):
    """Returns ``step(variables_list, acc, patches_u8, offsets, valid)``.

    Shapes are *global*: acc (D, 3, S+P, S+P) sharded on the device axis,
    patches (D*B, P, P, 3), offsets (D*B, 2), valid (D*B,).
    """
    chains = tta_ops.effective_transforms(tta_list, faithful=faithful_tta)

    def local_step(variables_list, acc, patches_u8, offsets, valid):
        # per-device block: acc (1, 3, S+P, S+P), patches (B, P, P, 3)
        x = normalize_patches(patches_u8, dtype=compute_dtype)
        preds: List[jnp.ndarray] = []
        for bundle, variables in zip(bundles, variables_list):
            for chain in chains:
                xt = tta_ops.apply_chain(x, chain)
                p = bundle.apply_p1(variables, xt)   # (B, P, P), rank-3
                inv = chain[-1] if chain else tta_ops.DEFAULT
                preds.append(tta_ops.invert(p, inv))
        stack = jnp.stack(preds)
        mean = jnp.mean(stack, axis=0)
        var = jnp.var(stack, axis=0)
        if mask_predictions:
            from ..ops.morphology import tissue_mask_patch

            tm = tissue_mask_patch(patches_u8).astype(mean.dtype)
            mean = mean * tm
            var = var * tm
        return stitch_batch(acc[0], mean, var, offsets, valid,
                            patch=patch)[None]

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"))
    return jax.jit(sharded, donate_argnums=(1,))


def make_sharded_accumulator(mesh: Mesh, supertile: int, patch: int,
                             planes: int = 3):
    d = mesh.shape["dp"]
    acc = jnp.zeros((d, planes, supertile + patch, supertile + patch),
                    jnp.float32)
    return jax.device_put(acc, NamedSharding(mesh, P("dp")))


@functools.lru_cache(maxsize=8)
def _reducer(mesh: Mesh):
    # cached per mesh: jax.jit keys on callable identity, so building the
    # lambda inside reduce_accumulator would retrace + recompile on EVERY
    # supertile flush (remote compiles are minutes each on the axon relay)
    return jax.jit(lambda a: jnp.sum(a, axis=0),
                   out_shardings=NamedSharding(mesh, P()))


def reduce_accumulator(mesh: Mesh, acc):
    """Sum per-device accumulators -> one (3, S+P, S+P) array (ICI all-reduce)."""
    return _reducer(mesh)(acc)


def shard_batch(mesh: Mesh, patches, offsets, valid):
    sh = NamedSharding(mesh, P("dp"))
    return (jax.device_put(patches, sh), jax.device_put(offsets, sh),
            jax.device_put(valid, sh))
