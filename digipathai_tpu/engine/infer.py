"""The jitted device step: ensemble x TTA forward + on-device stitching.

Reference hot loop (``reference DigiPathAI/Segmentation.py:136-173``): per
batch, per TTA, per model — host numpy transforms, ``model.predict``, inverse
transform, then a per-patch Python scatter-add into disk memmaps.  Here the
whole thing is one XLA program per batch: uint8 patches are normalized on
device in bfloat16, all TTA variants and models run back to back (XLA
overlaps them), predictions are inverse-transformed as free layout ops, and
the masked scatter-add lands in a donated HBM supertile accumulator.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ops import tta as tta_ops
from ..ops.color import normalize_patches
from ..ops.stitch import stitch_batch


def build_step(bundles: Sequence, tta_list: Sequence[str], patch: int,
               faithful_tta: bool = False, compute_dtype=jnp.bfloat16,
               with_checksum: bool = False, mask_predictions: bool = False):
    """Returns ``step(variables_list, acc, patches_u8, offsets, valid)``.

    ``variables_list`` is a tuple of flax variable pytrees (one per model);
    ``acc`` is donated.  The same compiled step serves every batch of every
    supertile (static shapes).  With ``with_checksum`` the step also returns
    a scalar mean of the batch predictions — fetching it forces completion
    (used by the benchmark; some backends' block_until_ready is a no-op).
    """
    chains = tta_ops.effective_transforms(tta_list, faithful=faithful_tta)

    @partial(jax.jit, donate_argnums=(1,))
    def step(variables_list, acc, patches_u8, offsets, valid):
        x = normalize_patches(patches_u8, dtype=compute_dtype)
        preds: List[jnp.ndarray] = []
        for bundle, variables in zip(bundles, variables_list):
            for chain in chains:
                xt = tta_ops.apply_chain(x, chain)
                p = bundle.apply_p1(variables, xt)       # (B, P, P) f32
                inv = chain[-1] if chain else tta_ops.DEFAULT
                preds.append(tta_ops.invert(p, inv))
        stack = jnp.stack(preds)                          # (K, B, P, P)
        mean = jnp.mean(stack, axis=0)
        var = jnp.var(stack, axis=0)
        if mask_predictions:
            # zero predictions outside patch-level tissue (spec from the
            # reference's alternate engine, new_Segmentation.py:620-625)
            from ..ops.morphology import tissue_mask_patch

            tm = tissue_mask_patch(patches_u8).astype(mean.dtype)
            mean = mean * tm
            var = var * tm
        acc = stitch_batch(acc, mean, var, offsets, valid, patch=patch)
        if with_checksum:
            return acc, jnp.mean(mean)
        return acc

    return step


def predict_batch(bundles, variables_list, patches_u8, tta_list=("DEFAULT",),
                  faithful_tta: bool = False, compute_dtype=jnp.bfloat16):
    """Ensemble x TTA mean/var for one batch, no stitching (debug/eval API)."""
    chains = tta_ops.effective_transforms(list(tta_list), faithful=faithful_tta)
    x = normalize_patches(jnp.asarray(patches_u8), dtype=compute_dtype)
    preds = []
    for bundle, variables in zip(bundles, variables_list):
        for chain in chains:
            xt = tta_ops.apply_chain(x, chain)
            p = bundle.apply(variables, xt)
            inv = chain[-1] if chain else tta_ops.DEFAULT
            preds.append(tta_ops.invert(p, inv))
    stack = jnp.stack(preds)
    return jnp.mean(stack, axis=0), jnp.var(stack, axis=0)
