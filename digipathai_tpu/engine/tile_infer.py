"""Fully-convolutional supertile inference (the TPU-first fast path).

The reference's stride-128 patch grid computes every tissue pixel ~4x (256px
patches at 128px stride) and pays per-patch border padding
(``reference Segmentation.py:193-194``).  All three models are fully
convolutional, so a supertile can be segmented in ONE forward per model x TTA
over the tile plus a halo, eliminating the overlap redundancy — typically a
~4x FLOP reduction with larger, better-utilized convolutions.

Semantics vs patch mode: interior pixels match the patch-mode overlap-add up
to the models' patch-border padding effects (pointwise models match exactly;
CNNs differ only within a receptive-field fringe of the old patch borders).
Exception: DeepLabv3+'s ASPP image-pooling branch is global, so its context
vector is computed over the tile instead of each 256px patch — a semantic
difference beyond the receptive-field fringe for that model.  Patch mode
stays the default for bit-parity with the reference; enable with
``getSegmentation(..., inference_mode="tile")``.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ops import tta as tta_ops
from ..ops.color import normalize_patches


def _make_raw_tile_step(bundles: Sequence, tta_list: Sequence[str],
                        tile: int, halo: int, compute_dtype=jnp.bfloat16,
                        faithful_tta: bool = False):
    chains = tta_ops.effective_transforms(tta_list, faithful=faithful_tta)

    def step(variables_list, tile_u8):
        x = normalize_patches(tile_u8[None], dtype=compute_dtype)
        preds: List[jnp.ndarray] = []
        for bundle, variables in zip(bundles, variables_list):
            for chain in chains:
                xt = tta_ops.apply_chain(x, chain)
                p = bundle.apply_p1(variables, xt)   # (1, H, W), rank-3
                # center-crop the halo (a no-op margin when the model
                # already cropped it via halo_crop); a center crop of a
                # square commutes with every dihedral TTA inversion
                ch = (p.shape[-1] - tile) // 2
                if ch:
                    p = p[:, ch:-ch, ch:-ch]
                inv = chain[-1] if chain else tta_ops.DEFAULT
                preds.append(tta_ops.invert(p, inv)[0])
        stack = jnp.stack(preds)
        mean = jnp.mean(stack, axis=0)
        var = jnp.var(stack, axis=0)
        return mean.astype(jnp.float32), var.astype(jnp.float32)

    return step


def build_tile_step(bundles: Sequence, tta_list: Sequence[str],
                    tile: int, halo: int, compute_dtype=jnp.bfloat16,
                    faithful_tta: bool = False):
    """Returns jitted ``step(variables_list, tile_u8) -> (mean, var)`` over
    the tile's interior; ``tile_u8`` is (tile + 2*halo, tile + 2*halo, 3)."""
    return jax.jit(_make_raw_tile_step(
        bundles, tta_list, tile, halo, compute_dtype=compute_dtype,
        faithful_tta=faithful_tta))


def build_model_tile_steps(bundles: Sequence, tta_list: Sequence[str],
                           tile: int, halo: int,
                           compute_dtype=jnp.bfloat16,
                           faithful_tta: bool = False,
                           tta_batch: int = 1):
    """Per-model jitted tile steps + a combine step (the big-tile path).

    One XLA program per MODEL instead of one for the whole ensemble: peak
    HBM holds a single network's activations, which is what lets tile 4096
    fit (the fused 3-model program OOMs at ~24 GB there, while per-model
    peaks are a few GB each).  Each step returns the f32 (sum, sum-of-
    squares) of its TTA predictions over the tile interior; ``combine``
    turns the accumulated sums into (mean, var) exactly as the fused step's
    ``jnp.mean``/``jnp.var`` would (same f32 accumulation of [0,1] values).

    Returns ``(steps, combine, n_preds)`` where each ``steps[i](variables,
    tile_u8) -> (sum, sumsq)`` and ``combine(sums, sqs) -> (mean, var)``
    with ``sums``/``sqs`` lists of per-model results.

    ``tta_batch=B`` runs the TTA forwards B at a time instead of strictly
    serialized: peak HBM scales ~B-fold, but batched convolutions run at
    measurably higher MXU efficiency than batch-1 giant-spatial ones (the
    round-3 patch-vs-tile efficiency gap, BASELINE.md).  All dihedral TTA
    variants of a square tile share one shape, so they stack cleanly.
    """
    chains = tta_ops.effective_transforms(tta_list, faithful=faithful_tta)

    def make_step(bundle):
        # s2d_stem models take the packed tile the host loader ships
        # (level 1: (H/2, W/2, 12); level 2: (H/4, W/4, 48)); TTA then
        # runs in the packed domain (spatial transform + phase-channel
        # permutation — ops/s2d_input.py)
        lvl = int(getattr(bundle.module, "s2d_stem", 0) or 0)

        def step(variables, tile_u8):
            x = normalize_patches(tile_u8[None], dtype=compute_dtype)
            # TTA forwards, SERIALIZED (B=1) or B-batched via lax.scan so
            # peak HBM holds B forwards' activations (unrolled chains let
            # XLA interleave them, which is what OOMed tile 4096).  The halo
            # crop is a center crop of a square tile, so it commutes with
            # every dihedral TTA transform and can happen inside the body,
            # before the (outside-of-scan, per-chain static) inversion.
            if lvl:
                import functools

                from ..ops.s2d_input import apply_chain_packed
                _chain = functools.partial(apply_chain_packed, level=lvl)
            else:
                _chain = tta_ops.apply_chain
            xts = jnp.concatenate(
                [_chain(x, c) for c in chains], axis=0)

            B = max(1, min(tta_batch, len(chains)))
            nb, rem = divmod(len(chains), B)

            def body(_, xt):
                p = bundle.apply_p1(variables, xt)   # (B, H, W), rank-3
                # crop whatever halo margin the model didn't already crop
                # itself (halo_crop models return the tile interior)
                ch = (p.shape[-1] - tile) // 2
                if ch:
                    p = p[:, ch:-ch, ch:-ch]
                return 0, p.astype(jnp.float32)

            hw = tile
            _, preds = jax.lax.scan(
                body, 0, xts[:nb * B].reshape(nb, B, *xts.shape[1:]))
            preds = preds.reshape(nb * B, hw, hw)
            if rem:
                _, tail = body(0, xts[nb * B:])
                preds = jnp.concatenate([preds, tail], axis=0)
            s = sq = None
            for i, chain in enumerate(chains):
                inv = chain[-1] if chain else tta_ops.DEFAULT
                p = tta_ops.invert(preds[i][None, ..., None], inv)[0, ..., 0]
                s = p if s is None else s + p
                sq = p * p if sq is None else sq + p * p
            return s, sq
        return jax.jit(step)

    n_preds = len(bundles) * len(chains)

    @jax.jit
    def combine(sums, sqs):
        s = sums[0]
        q = sqs[0]
        for a, b in zip(sums[1:], sqs[1:]):
            s = s + a
            q = q + b
        mean = s / n_preds
        var = q / n_preds - mean * mean
        return mean, jnp.maximum(var, 0.0)

    return [make_step(b) for b in bundles], combine, n_preds


def build_tile_step_sp(bundles: Sequence, tta_list: Sequence[str],
                       tile: int, halo: int, mesh,
                       compute_dtype=jnp.bfloat16,
                       faithful_tta: bool = False):
    """Spatially-sharded tile step: ONE supertile computed by ALL chips.

    The (tile+2*halo) x (tile+2*halo) input is sharded along its first
    spatial axis over the 'sp' mesh axis; XLA GSPMD inserts the convolution
    halo exchanges and the all-reduce for DeepLab's global pooling.  Lower
    latency per slide than the round-robin dp scheme when a slide has fewer
    tissue supertiles than chips.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    raw = _make_raw_tile_step(bundles, tta_list, tile, halo,
                              compute_dtype=compute_dtype,
                              faithful_tta=faithful_tta)
    in_sh = NamedSharding(mesh, P("sp", None, None))
    out_sh = NamedSharding(mesh, P("sp", None))
    return jax.jit(raw, in_shardings=(None, in_sh),
                   out_shardings=(out_sh, out_sh))


def fetch_window(coords_valid, ox, oy, S, halo, buckets, wx0, wy0,
                 mean_shape):
    """Device->host fetch window for a flushed supertile result.

    Returns ``(rx0, ry0, bx, by)`` in supertile coordinates.  The number of
    distinct ``(bx, by)`` shapes must stay bounded (each is a separate jit
    compile of the crop program — expensive through a remote-compile relay):
    under bbox compute cropping the result is the compute window itself
    (<=3 bucket shapes); otherwise a bucketed tissue bbox (<=9 shapes).
    """
    if mean_shape[0] < S:
        # bbox-computed window (one of <=3 compute buckets): fetch it
        # whole.  It is already the bucketed tissue bbox, so an inner
        # fetch crop saves almost nothing — and clamping a fetch bucket
        # into the window would produce per-tile crop shapes, i.e.
        # unbounded distinct jit compiles through the slow remote relay.
        return wx0, wy0, int(mean_shape[0]), int(mean_shape[1])
    c = coords_valid
    patch = 2 * halo
    rx0 = max(0, int(c[:, 0].min() - ox) - halo)
    ry0 = max(0, int(c[:, 1].min() - oy) - halo)
    sx = min(S, int(c[:, 0].max() - ox) + patch + halo) - rx0
    sy = min(S, int(c[:, 1].max() - oy) + patch + halo) - ry0
    bx = next(b for b in buckets if b >= sx)
    by = next(b for b in buckets if b >= sy)
    return min(rx0, S - bx), min(ry0, S - by), bx, by


def run_tile_inference(slide, plan, bundles, variables_tuple, tta_full,
                       mean_map, var_map, count_map, *, halo: int,
                       status=None, timer=None, progress_cb=None,
                       compute_dtype=jnp.bfloat16, completed=None,
                       on_group_done=None, n_devices: int = 1,
                       faithful_tta: bool = False, spatial_shard="auto",
                       crf_cb=None, bbox_compute: bool = False,
                       state_lock=None):
    """Segment every tissue supertile fully convolutionally.

    Reuses the patch plan's supertile groups purely as a tissue index (a
    group exists iff the supertile contains strided tissue).  Maps are
    written directly (count=1) — overlap-add is unnecessary without overlap.

    Multi-chip: supertiles are embarrassingly parallel, so groups are
    round-robined across devices (inputs placed per device; jit compiles a
    per-device executable) and results are flushed by a writer pool.  When a
    slide has FEWER tissue supertiles than devices that scheme leaves chips
    idle, so ``spatial_shard="auto"`` switches to computing each supertile
    on ALL devices at once (``build_tile_step_sp``: the tile is sharded
    along one spatial axis; XLA GSPMD inserts the conv halo exchanges over
    ICI).  ``True``/``False`` force the choice.

    ``crf_cb(group, img_tile)``: each supertile's mean is FINAL at flush
    (no cross-supertile overlap-add), so CRF refinement runs immediately
    after the map write-back instead of as a serial post-pass tail
    (VERDICT r3 item 2) — overlapped with the next supertile's host
    load/compute by the flusher pool.  ``img_tile`` is the already-decoded
    (supertile, supertile, 3) uint8 region (halo cropped, row-major), so
    the slide is not re-read.

    ``bbox_compute`` (VERDICT r3 item 1b): the FORWARD runs on the tissue
    bbox padded up to one of 3 square bucket sizes instead of always the
    full supertile — real slides' supertiles are mostly partial, and the
    flush already transferred only the bbox; this stops computing the
    glass too.  The crop window includes the same ``halo`` context margin
    as supertile borders, so written pixels keep identical
    receptive-field-fringe semantics; pointwise models are exact.  Steps
    compile lazily per bucket (persistent jax cache).
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    import functools

    X, Y = plan.slide_dims
    S = plan.supertile
    completed = completed if completed is not None else set()
    devices = jax.local_devices()[:max(1, n_devices)]  # one process per slide
    todo = [(gi, g) for gi, g in enumerate(plan.groups)
            if gi not in completed]
    # sp pays off when chips would otherwise idle (fewer supertiles than
    # devices); the sharded axis must divide the padded tile evenly
    sp_possible = (len(devices) > 1
                   and (S + 2 * halo) % len(devices) == 0)
    if spatial_shard is True and not sp_possible:
        # an explicit True must not silently fall back to round-robin
        raise ValueError(
            f"spatial_shard=True needs >1 device and (supertile + patch_"
            f"size) % n_devices == 0; got {len(devices)} device(s), "
            f"padded tile {S + 2 * halo}. Use spatial_shard='auto' for "
            f"automatic fallback.")
    use_sp = sp_possible and (
        (spatial_shard is True)
        or (spatial_shard == "auto" and len(todo) < len(devices)))
    packed_lvls = {int(getattr(b.module, "s2d_stem", 0) or 0)
                   for b in bundles}
    if len(packed_lvls) > 1:
        raise ValueError("s2d_stem must be uniform across the ensemble")
    packed_lvl = packed_lvls.pop()
    if use_sp and packed_lvl:
        # the sp path shards the raw tile over the mesh; keep it on the
        # canonical stem (same params — s2d_stem is compute-only)
        from ..models.registry import ModelBundle
        bundles = [ModelBundle(b.name, b.module.clone(s2d_stem=0))
                   for b in bundles]
        packed_lvl = 0
    if not use_sp:
        steps_cache = {}

        def get_steps(b):
            if b not in steps_cache:
                steps_cache[b] = build_model_tile_steps(
                    bundles, tta_full, b, halo, compute_dtype=compute_dtype,
                    faithful_tta=faithful_tta)[:2]
            return steps_cache[b]

        vars_on = {d: jax.device_put(variables_tuple, d) for d in devices}
        # square compute buckets (TTA rotations need square tiles), aligned
        # to the models' /32 stride tree like the supertile itself
        cbuckets = [b for b in sorted({min(S, -(-S // 4 // 32) * 32),
                                       min(S, -(-S // 2 // 32) * 32), S})
                    if (b + 2 * halo) % 32 == 0]
        if not bbox_compute or cbuckets[-1] != S or len(cbuckets) == 1:
            cbuckets = [S]
    total = max(len(plan.groups), 1)
    done = len(completed)
    # the caller's state lock when resuming is live (segmentation.py passes
    # an RLock shared with save_state, so `completed.add` here can never
    # race save_state's sorted() iteration in another flusher thread)
    lock = state_lock if state_lock is not None else threading.Lock()

    # bucketed tissue-bbox crop before fetching (see segmentation.flush):
    # sparse supertiles move a fraction of the S^2 result planes
    buckets = sorted({(S + 3) // 4, (S + 1) // 2, S})

    @functools.partial(jax.jit, static_argnames=("bx", "by"))
    def crop2(arr, x0, y0, *, bx, by):
        return jax.lax.dynamic_slice(arr, (x0, y0), (bx, by))

    def flush(mean, var, gi, g, region=None, wx0=0, wy0=0):
        # mean/var cover the supertile window starting at (wx0, wy0) —
        # the full tile by default, the bbox bucket under bbox_compute
        nonlocal done
        ox, oy = g.origin
        w = min(S, X - ox)
        h = min(S, Y - oy)
        rx0, ry0, bx, by = fetch_window(
            g.coords[g.valid], ox, oy, S, halo, buckets, wx0, wy0, mean.shape)
        ctx = timer.stage("flush") if timer else _null()
        with ctx:
            mean_h = np.asarray(jax.device_get(
                crop2(mean, rx0 - wx0, ry0 - wy0, bx=bx, by=by)))
            var_h = np.asarray(jax.device_get(
                crop2(var, rx0 - wx0, ry0 - wy0, bx=bx, by=by)))
            # maps are (Y, X); tile arrays are (x, y)
            wy = min(by, h - ry0)
            wx = min(bx, w - rx0)
            my, mx = oy + ry0, ox + rx0
            mean_map[my:my + wy, mx:mx + wx] = mean_h[:wx, :wy].T
            var_map[my:my + wy, mx:mx + wx] = var_h[:wx, :wy].T
            count_map[my:my + wy, mx:mx + wx] = 1.0
        with lock:
            done += 1
            completed.add(gi)
            if on_group_done is not None:
                on_group_done(gi)
            if status is not None:
                status["progress"] = int(done * 100.0 / total)
            if progress_cb is not None:
                progress_cb(done, total)
        if crf_cb is not None and region is not None:
            # after the completion marker: a crash mid-CRF resumes into the
            # post-pass (engine CRF block) instead of re-inferring the tile
            ctx2 = timer.stage("crf") if timer else _null()
            with ctx2:
                crf_cb(g, region[halo:halo + S, halo:halo + S])

    if use_sp:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(devices), ("sp",))
        step_sp = build_tile_step_sp(
            bundles, tta_full, S, halo, mesh, compute_dtype=compute_dtype,
            faithful_tta=faithful_tta)
        in_sh = NamedSharding(mesh, P("sp", None, None))
        with ThreadPoolExecutor(2) as flusher:
            pending = []
            for gi, g in todo:
                ox, oy = g.origin
                region = slide.read_region((ox - halo, oy - halo), 0,
                                           (S + 2 * halo, S + 2 * halo))
                tile_xyc = np.ascontiguousarray(
                    np.transpose(region, (1, 0, 2)))
                ctx = timer.stage("infer") if timer else _null()
                with ctx:
                    tile_dev = jax.device_put(tile_xyc, in_sh)
                    mean, var = step_sp(variables_tuple, tile_dev)
                pending.append(flusher.submit(flush, mean, var, gi, g,
                                              region))
                while len(pending) > 2:
                    pending.pop(0).result()
            for fut in pending:
                fut.result()
        return

    with ThreadPoolExecutor(max(2, len(devices))) as flusher:
        pending = []
        for i, (gi, g) in enumerate(todo):
            dev = devices[i % len(devices)]
            ox, oy = g.origin
            # tissue-bbox compute window (bucketed square incl. the same
            # halo write-fringe the flush covers); full tile when dense
            wx0 = wy0 = 0
            b = S
            if len(cbuckets) > 1:
                c = g.coords[g.valid]
                patch = 2 * halo
                wx0 = max(0, int(c[:, 0].min() - ox) - halo)
                wy0 = max(0, int(c[:, 1].min() - oy) - halo)
                sx = min(S, int(c[:, 0].max() - ox) + patch + halo) - wx0
                sy = min(S, int(c[:, 1].max() - oy) + patch + halo) - wy0
                b = next(bk for bk in cbuckets if bk >= max(sx, sy))
                wx0 = min(wx0, S - b)
                wy0 = min(wy0, S - b)
            # read tile + halo; Slide zero-fills out-of-bounds
            region = slide.read_region((ox - halo, oy - halo), 0,
                                       (S + 2 * halo, S + 2 * halo))
            # region is (y, x, c); the compute window slice keeps its own
            # halo margin around the written area
            sub = region[wy0:wy0 + b + 2 * halo, wx0:wx0 + b + 2 * halo]
            tile_xyc = np.ascontiguousarray(np.transpose(sub, (1, 0, 2)))
            if packed_lvl:
                # host-side s2d pack (ops/s2d_input.py): the stem lever
                from ..ops.s2d_input import pack_host

                tile_xyc = pack_host(tile_xyc, packed_lvl)
            steps, combine = get_steps(b)
            ctx = timer.stage("infer") if timer else _null()
            with ctx:
                tile_dev = jax.device_put(tile_xyc, dev)
                sums, sqs = [], []
                for step, mv in zip(steps, vars_on[dev]):
                    s, q = step(mv, tile_dev)
                    sums.append(s)
                    sqs.append(q)
                mean, var = combine(sums, sqs)
            pending.append(flusher.submit(flush, mean, var, gi, g, region,
                                          wx0, wy0))
            # backpressure: each pending result pins device+host buffers;
            # bound the in-flight depth to ~2 tiles per device
            while len(pending) > 2 * len(devices):
                pending.pop(0).result()
        for fut in pending:
            fut.result()


from contextlib import nullcontext as _null  # noqa: E402
