"""End-to-end WSI segmentation: the public ``getSegmentation`` API.

Signature and behavior parity target: ``getSegmentation``
(``reference DigiPathAI/Segmentation.py:192-356``) — same kwargs, same
``status`` wire strings, same artifact set (probability map, 0.3-thresholded
mask, variance-based uncertainty map as tiled JPEG pyramids), same return
value (the thresholded map in (X, Y) orientation).

TPU redesign of the execution (SURVEY.md §7): static-shape supertile work
units -> threaded uint8 host loader -> one jitted XLA step per batch
(normalize + ensemble x TTA forward + masked scatter-add into a donated HBM
accumulator) -> per-supertile host memmap writeback -> streamed pyramid
writer.  No torch, no ImageMagick, no per-patch Python loops.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

import numpy as np

from ..models import registry
from ..models.registry import build_model
from ..models import weights as weights_mod
from ..ops import tta as tta_ops
from ..ops.stitch import make_accumulator
from ..utils.profiling import StageTimer, maybe_profile
from .infer import build_step
from .loader import PatchLoader
from .planner import plan_patches

THRESHOLD = 0.3  # reference Segmentation.py:310

_ENSEMBLE = ("dense", "inception", "deeplabv3")


def _memmap_dir() -> Path:
    d = weights_mod.cache_dir() / "memmaps"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-run compiles are expensive
    (especially through remote-compile TPU relays); every later run is warm."""
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        d = weights_mod.cache_dir() / "jax_cache"
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _status_set(status_obj, **kw):
    if status_obj is None:
        return
    for k, v in kw.items():
        status_obj[k] = v


def state_crf_applied(state_path, cfg_key) -> bool:
    """CRF refinement is in-place and non-idempotent; resumed runs must not
    re-refine already-refined maps."""
    import json

    try:
        state = json.loads(state_path.read_text())
        return state.get("config") == cfg_key and state.get("crf_applied", False)
    except (OSError, ValueError):
        return False


def mark_crf_applied(state_path, cfg_key):
    import json

    try:
        state = json.loads(state_path.read_text())
    except (OSError, ValueError):
        state = {"config": cfg_key}
    state["crf_applied"] = True
    tmp = state_path.with_suffix(".tmp")
    tmp.write_text(json.dumps(state))
    os.replace(tmp, state_path)


def resolve_s2d_level(s2d_input, inference_mode: str, supertile: int,
                      patch_size: int) -> int:
    """Resolve the host-packed s2d input level (``ops/s2d_input.py``).

    The loader ships space-to-depth-packed uint8 tiles and the narrow stem
    convs run in the packed domain — exact, same parameters.  ``True``/1:
    2x2 pack (stem conv only); 2: 4x4 pack (the whole stem through the
    first pool).  ``"auto"`` (the default): level 1 — the measured uniform
    in-model winner on v5e (dense +6.8% / inception +2.4% / deeplab +4.7%;
    BASELINE.md round 3).  The level must be uniform across the ensemble
    (one packed tile per supertile), and the supertile side (incl. halo)
    must divide by 2**level; tile mode only — patch mode returns 0.
    """
    if not s2d_input or inference_mode != "tile":
        return 0
    lvl = 1 if s2d_input == "auto" else int(s2d_input)
    side = supertile + 2 * (patch_size // 2)
    return lvl if lvl > 0 and side % (1 << lvl) == 0 else 0


def _parse_quant_spec(spec):
    """Parse a per-model quantization spec string into a dict.

    ``"deeplabv3:static"`` -> ``{"deeplabv3": "static"}``;
    ``"deeplabv3:static,dense:dynamic"`` maps each named model to a mode
    (``static`` / ``calib`` / ``dynamic``/``true`` -> True / ``off`` ->
    False).  Strings without a colon are uniform modes and returned as-is
    (``"static"`` applies to every model, matching the bool/str knob).
    """
    if ":" not in spec:
        return spec
    out = {}
    for part in spec.split(","):
        name, _, mode = part.partition(":")
        name = registry.resolve_model_name(name.strip())
        mode = mode.strip().lower()
        if mode in ("static", "calib"):
            out[name] = mode
        elif mode in ("1", "true", "dynamic"):
            out[name] = True
        elif mode in ("0", "false", "off", ""):
            out[name] = False
        else:
            raise ValueError(f"unknown quantization mode {mode!r} for "
                             f"{name!r} (expected static/calib/dynamic/off)")
    return out


def _resolve_quant(quantized, key: str):
    """Per-model quantization mode for canonical model ``key``.

    ``quantized`` is False/True/"calib"/"static" (uniform — the round-4
    behavior), a spec string (see ``_parse_quant_spec``), or a dict mapping
    canonical model keys to modes.  Per-model matters because static int8
    helps DeepLab but hurts the U-Nets (BASELINE.md round 4): the winning
    ensemble config quantizes only deeplabv3.
    """
    if isinstance(quantized, str):
        quantized = _parse_quant_spec(quantized)
    if isinstance(quantized, dict):
        return quantized.get(key, False)
    return quantized


def _quant_tag(quantized, keys=None):
    """Deterministic resume-key tag for the quantized knob (dict order and
    spec-string spelling must not change the cfg_key).

    With ``keys`` (the canonical model keys actually in this run) the tag
    covers only those models' EFFECTIVE modes: a spec that names a model
    absent from the run leaves the maps' contents unchanged, so it must not
    invalidate the resume state (and a uniform mode hashes the same as the
    equivalent per-model dict)."""
    if keys is not None:
        return tuple(sorted(
            (k, q) for k in keys
            if (q := _resolve_quant(quantized, k))))
    if isinstance(quantized, str):
        quantized = _parse_quant_spec(quantized)
    if isinstance(quantized, dict):
        return tuple(sorted((k, v) for k, v in quantized.items() if v))
    return quantized


def getSegmentation(img_path,
                    patch_size: int = 256,
                    stride_size: int = 128,
                    batch_size: int = 32,
                    tta_list=None,
                    crf: bool = False,
                    probs_path: str = "../Results",
                    mask_path: str = "../Results",
                    uncertainty_path: str = "../Results",
                    status=None,
                    quick: bool = True,
                    mask_level: int = -1,
                    model: str = "dense",
                    mode: str = "colon",
                    *,
                    supertile: int = 4096,
                    num_workers: int = 8,
                    data_parallel: bool | int = True,
                    resume: bool = False,
                    inference_mode: str = "patch",
                    tile_local_aspp: bool = True,
                    tile_bbox_compute: bool = False,
                    spatial_shard="auto",
                    decoder_halo_crop: bool = False,
                    s2d_input: bool | int | str = "auto",
                    s2d_decoder: bool = False,
                    wpack: bool = False,
                    fused_stages: int = 0,
                    quantized=False,  # bool | "calib" | "static" |
                    # per-model spec "deeplabv3:static[,dense:off]" | dict
                    mask_predictions: bool = False,
                    fold_bn: bool = False,
                    faithful_tta: bool = False,
                    allow_random_weights: bool = True,
                    save_float_probs: bool = False,
                    threshold: float = THRESHOLD,
                    compute_dtype=None,
                    crf_opts=None,
                    progress_cb=None) -> np.ndarray:
    """Segment a whole-slide image; writes three pyramidal TIFFs.

    Reference-compatible args (``reference Segmentation.py:192-205``) plus
    keyword-only TPU knobs.  Returns the thresholded (0/255) mean map in the
    reference's (X, Y) orientation.
    """
    import jax.numpy as jnp

    from ..io.slide import Slide
    from ..io.tiff_py import PyramidalTiffWriter

    _enable_compile_cache()
    mode = mode.lower()
    if mode not in weights_mod.MODES:
        raise ValueError(
            "Unknown mode found, allowed fields are: ['colon', 'liver', 'breast']")

    # quick=True -> single model; else 3-model ensemble (Segmentation.py:288-300)
    model_names: List[str] = list(_ENSEMBLE) if not quick else [model]

    tta_full = tta_ops.resolve_tta_list(tta_list)

    # --- weights ---------------------------------------------------------
    have_all = all(
        weights_mod.h5_path(mode, m).exists() for m in model_names if m in _ENSEMBLE)
    _status_set(status, status=(
        "Found Trained Models, Skipping download" if have_all
        else "Downloading Trained Models"))
    _status_set(status, status="Loading Trained weights")

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    bundles, variables_list = [], []
    model_kws = {}
    for name in model_names:
        # gates + per-model state key off the CANONICAL registry key:
        # build_model dispatches by substring ("my_deeplabv3" -> deeplabv3
        # bundle), so the raw user string would miss the capability checks
        # and make the tile path's model_kws[b.name] lookup KeyError
        key = registry.resolve_model_name(name)
        kw = {}
        if s2d_decoder and key in ("dense", "inception"):
            # exact execution rewrite, same params/outputs (s2d_decoder.py)
            kw["s2d_decoder"] = True
        if wpack and not s2d_decoder and key in ("dense", "inception"):
            # exact width-packed decoder convs (ops/wpack.py) — opt-in:
            # measured net-slower on v5e (see BASELINE.md), exact outputs
            kw["wpack"] = True
        if fused_stages and key in ("dense", "inception"):
            # whole-stage Pallas fusion of the last N decoder stages
            # (ops/pallas/stage_fused.py; tile mode, inference only)
            kw["fused_stages"] = fused_stages
        q = _resolve_quant(quantized, key)
        if q:
            # opt-in int8 inference for the wide convs (models/quant.py);
            # pass the mode through verbatim: True (dynamic), "calib",
            # or "static" select different conv ctors (quant.conv_ctor);
            # measured probability-map deviation recorded in PARITY.md.
            # `quantized` may also be a per-model dict ({"deeplabv3":
            # "static"}) — static int8 wins on deeplab (+5.5%) but loses on
            # dense (-2.5%), so quantizing only deeplab inside the ensemble
            # beats the uniform setting (BASELINE.md round 5)
            kw["quantized"] = q
        if (decoder_halo_crop and inference_mode == "tile"
                and key in ("dense", "inception")):
            # progressive decoder halo cropping (exact; models' halo_crop):
            # the engine discards the halo fringe, so the U-Net decoders
            # never compute it above the bottleneck
            kw["halo_crop"] = patch_size // 2
        if key in ("dense", "inception", "deeplabv3"):
            lvl = resolve_s2d_level(s2d_input, inference_mode, supertile,
                                    patch_size)
            if lvl:
                kw["s2d_stem"] = lvl
        b = build_model(name, dtype=compute_dtype, **kw)
        bundles.append(b)
        model_kws[b.name] = kw
        if name in _ENSEMBLE:
            v = weights_mod.load_variables(
                b, mode, name, patch_size, status=status,
                allow_random=allow_random_weights)
        else:
            v = b.init(patch_size)
        if fold_bn and "batch_stats" in v:
            from ..models.fold_bn import fold_batchnorm

            v, _ = fold_batchnorm(v)
        variables_list.append(v)

    # --- device topology -------------------------------------------------
    import jax

    n_dev = 1
    if data_parallel:
        # local devices only: one process drives one slide; multi-host sweeps
        # shard *slides* across processes (parallel/distributed.py)
        avail = len(jax.local_devices())
        n_dev = min(avail, data_parallel) if isinstance(data_parallel, int) \
            and data_parallel is not True else avail
    global_batch = batch_size * n_dev

    # --- plan + maps -----------------------------------------------------
    _status_set(status, status="Running segmentation")
    timer = StageTimer()
    slide = Slide(str(img_path))
    with timer.stage("plan"):
        plan = plan_patches(slide, patch=patch_size, stride=stride_size,
                            batch=global_batch, supertile=supertile,
                            mask_level=mask_level)
    X, Y = plan.slide_dims
    mdir = _memmap_dir()

    static_idx = [i for i, b in enumerate(bundles)
                  if model_kws[b.name].get("quantized") == "static"]
    if static_idx:
        # auto-calibrate the per-layer activation scales QuantConvStatic
        # needs (models/quant.py:123-131) on real tissue patches from the
        # first planned supertile.  The scales are per-layer scalars and
        # the models are fully convolutional, so a patch-sized calibration
        # forward also calibrates the tile-mode module.  halo_crop is
        # dropped for the calib twin: it only slices decoder outputs (same
        # conv paths), and the uncropped abs-max is a superset.
        from ..models.quant import calibrate as _quant_calibrate
        from ..ops.color import normalize_patches

        g0 = plan.groups[0]
        sel = g0.coords[np.asarray(g0.valid, bool)][:8]
        if len(sel) == 0:
            sel = g0.coords[:1]
        # read_region returns (row=y, col=x, c); transpose each patch to the
        # engine's (x, y, c) patch orientation (PatchLoader._read_patch) so
        # the calibrated abs-max sees the same activation layout as inference
        sample = np.stack([
            np.asarray(slide.read_region((int(x), int(y)), 0,
                                         (patch_size, patch_size)))[..., :3]
            .transpose(1, 0, 2)
            for x, y in sel]).astype(np.uint8)
        for i in static_idx:
            name, b = model_names[i], bundles[i]
            ckw = {k: v for k, v in model_kws[b.name].items()
                   if k != "halo_crop"}
            ckw["quantized"] = "calib"
            cb = build_model(name, dtype=compute_dtype, **ckw)
            x = sample
            lvl = model_kws[b.name].get("s2d_stem", 0)
            if lvl:
                from ..ops.s2d_input import pack_host

                x = np.stack([pack_host(p, lvl) for p in sample])
            xn = normalize_patches(jnp.asarray(x), dtype=compute_dtype)
            calib = _quant_calibrate(cb.module, variables_list[i], [xn],
                                     train=False, jit=True)
            variables_list[i] = dict(variables_list[i],
                                     calib=jax.device_get(calib))

    # --- restartable stitching state (SURVEY.md §5: new vs reference) ----
    import hashlib
    import json

    # key scratch/state by basename + a short hash of the absolute path so
    # same-named slides in different directories never share memmaps/state
    abs_path = os.path.abspath(str(img_path))
    path_tag = hashlib.sha256(abs_path.encode()).hexdigest()[:10]
    stem = f"{Path(str(img_path)).stem}-{path_tag}"

    # crf and quantized are in the key because both change what the maps
    # CONTAIN (flush-time CRF refinement / int8 probabilities): resuming a
    # crashed run with either knob flipped must not mix old and new tiles
    cfg_key = hashlib.sha256(repr((
        abs_path, X, Y, patch_size, stride_size, global_batch, supertile,
        tuple(model_names), tuple(tta_full), faithful_tta,
        inference_mode, mask_predictions, bool(crf),
        _quant_tag(quantized, keys=model_kws))).encode()
    ).hexdigest()
    state_path = mdir / f"{stem}-stitch.json"
    completed: set = set()
    crf_tiles_done: set = set()
    mode_mm = "w+"
    finalized = False
    if resume and state_path.exists():
        try:
            state = json.loads(state_path.read_text())
            # a non-empty "inflight" means a previous run crashed while
            # adding a supertile into the maps: the maps may hold partial
            # (unrepeatable) additions, so the resume state is tainted
            if state.get("config") == cfg_key and not state.get("inflight"):
                completed = set(state.get("completed", []))
                crf_tiles_done = set(state.get("crf_tiles", []))
                finalized = bool(state.get("finalized", False))
                mode_mm = "r+"
        except (ValueError, OSError):
            pass

    if mode_mm == "w+":  # fresh run: staged CRF tiles from older runs are stale
        for _sp in mdir.glob(f"{stem}-crftile-*.npz"):
            _sp.unlink()

    mean_map = np.memmap(mdir / f"{stem}-mean.dat", np.float32, mode_mm, shape=(Y, X))
    var_map = np.memmap(mdir / f"{stem}-var.dat", np.float32, mode_mm, shape=(Y, X))
    count_map = np.memmap(mdir / f"{stem}-count.dat", np.float32, mode_mm, shape=(Y, X))

    import threading

    # guards BOTH the state file write and every mutation of the progress
    # sets (completed / crf_tiles_done): flusher threads mutate them while
    # save_state's sorted() iterates — an unguarded add in another thread
    # raises "set changed size during iteration".  RLock because save_state
    # is called while the lock is already held (tile mode's on_group_done).
    _state_lock = threading.RLock()

    def save_state(mark_finalized: bool = False, inflight=None):
        # finalize is non-idempotent (mean /= count); the marker prevents a
        # resumed run from dividing already-finalized maps a second time.
        # "inflight" names a group whose memmap += writes are about to start;
        # it is cleared by the next save once they complete (crash in between
        # -> resume sees the taint and restarts, never double-adds).
        with _state_lock:
            tmp = state_path.with_suffix(".tmp")
            tmp.write_text(json.dumps(
                {"config": cfg_key, "completed": sorted(completed),
                 "crf_tiles": sorted(crf_tiles_done),
                 "finalized": mark_finalized or finalized,
                 "inflight": [inflight] if inflight is not None else []}))
            os.replace(tmp, state_path)

    # --- CRF staging (shared by tile mode's per-supertile overlap path and
    # the post-pass): CRF rewrites mean_map in place per tile
    # (non-idempotent), so each refined tile is staged to disk (atomic
    # rename) before the in-place assignment and unstaged after the
    # progress marker is persisted; a crash anywhere is recovered by
    # replaying the staged assignment.
    crf_active = crf and not state_crf_applied(state_path, cfg_key)
    crf_opts = dict(crf_opts or {})  # mean_field_crf hyperparams, both paths

    def _crf_stage(ti):
        return mdir / f"{stem}-crftile-{ti}.npz"

    def _crf_write(ti, box, refined):
        sp = _crf_stage(ti)
        tmp = sp.with_name("tmp-" + sp.name)
        np.savez(tmp, box=np.asarray(box), block=refined)
        os.replace(tmp, sp)
        y0, y1, x0, x1 = box
        mean_map[y0:y1, x0:x1] = refined
        with _state_lock:
            crf_tiles_done.add(ti)
            save_state()
        sp.unlink(missing_ok=True)

    tile_crf_cb = None
    if crf_active and inference_mode == "tile":
        # each supertile's mean is final at flush in tile mode, so CRF runs
        # right there (ops/crf.refine_tile — same bucket-padded program as
        # the post-pass) instead of as a serial tail (VERDICT r3 item 2)
        from ..ops.crf import refine_tile, slide_tile_index

        def tile_crf_cb(g, img_tile):
            ox, oy = g.origin
            ti = slide_tile_index(oy, ox, X, supertile)
            if ti in crf_tiles_done:
                return
            th = min(supertile, Y - oy)
            tw = min(supertile, X - ox)
            probs = np.asarray(mean_map[oy:oy + th, ox:ox + tw], np.float32)
            if probs.max() <= 0:
                return  # glass-only: the post-pass skips it identically
            refined = refine_tile(np.asarray(img_tile[:th, :tw]), probs,
                                  supertile, **crf_opts)
            _crf_write(ti, (oy, oy + th, ox, ox + tw), refined)

    variables_tuple = tuple(variables_list)
    if inference_mode == "tile":
        from .tile_infer import run_tile_inference

        if (supertile + patch_size) % 32 != 0:
            raise ValueError(
                "tile mode needs (supertile + patch_size) divisible by 32")
        if tile_local_aspp and supertile % patch_size == 0:
            # DeepLab's ASPP image pooling is global over its input; over a
            # big tile that changes the model's context semantics vs the
            # reference's 256px patches. Rebuild it with patch-sized pooling
            # windows (params are identical, only the static pooling extent
            # changes) so tile mode stays patch-like. See PARITY.md.
            bundles = [
                build_model(b.name, dtype=compute_dtype,
                            aspp_pool_window=patch_size,
                            **model_kws[b.name])
                if b.name == "deeplabv3" else b
                for b in bundles
            ]
        with maybe_profile("tile_segmentation"):
            run_tile_inference(
                slide, plan, bundles, variables_tuple, tta_full,
                mean_map, var_map, count_map, halo=patch_size // 2,
                status=status, timer=timer, progress_cb=progress_cb,
                compute_dtype=compute_dtype, completed=completed,
                on_group_done=lambda gi: save_state(), n_devices=n_dev,
                faithful_tta=faithful_tta, spatial_shard=spatial_shard,
                crf_cb=tile_crf_cb, bbox_compute=tile_bbox_compute,
                state_lock=_state_lock)
    else:
        from ..ops.stitch import add_counts_host

        # count is recomputed analytically host-side (add_counts_host), so
        # the device accumulator carries only mean+var; with a single
        # model x TTA combination the variance is identically zero and its
        # plane isn't transferred either
        n_preds = len(bundles) * len(tta_full)
        fetch_planes = 1 if n_preds == 1 else 2
        if n_dev > 1:
            from ..parallel import inference as par

            mesh = par.make_dp_mesh(n_dev)
            step = par.build_sharded_step(
                bundles, tta_full, patch_size, mesh,
                faithful_tta=faithful_tta, compute_dtype=compute_dtype,
                mask_predictions=mask_predictions)
            new_acc = lambda: par.make_sharded_accumulator(  # noqa: E731
                mesh, supertile, patch_size, planes=2)
            fetch_acc = lambda a: par.reduce_accumulator(mesh, a)  # noqa: E731
            place = lambda b: par.shard_batch(  # noqa: E731
                mesh, b.patches, b.offsets, b.valid)
        else:
            step = build_step(bundles, tta_full, patch_size,
                              faithful_tta=faithful_tta,
                              compute_dtype=compute_dtype,
                              mask_predictions=mask_predictions)
            new_acc = lambda: make_accumulator(  # noqa: E731
                supertile, patch_size, planes=2)
            fetch_acc = lambda a: a  # noqa: E731
            place = lambda b: (b.patches, b.offsets, b.valid)  # noqa: E731

        total_batches = max(plan.total_batches, 1)
        done = sum(len(plan.groups[gi].coords) // global_batch
                   for gi in completed if gi < len(plan.groups))
        acc = None
        cur_group = -1

        # bucketed crop sizes: sparse supertiles transfer a fraction of the
        # accumulator (the tissue bbox rounded up to one of 3 sizes, so at
        # most 9 compiled crop variants exist)
        acc_side = supertile + patch_size
        buckets = sorted({(acc_side + 3) // 4, (acc_side + 1) // 2, acc_side})

        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("planes", "bx", "by"))
        def crop_fetch(acc2d, x0, y0, *, planes, bx, by):
            import jax.lax as lax

            sl = lax.dynamic_slice(acc2d, (0, x0, y0), (planes, bx, by))
            return jnp.transpose(sl, (0, 2, 1))

        def flush(acc, gi):
            g = plan.groups[gi]
            ox, oy = g.origin
            hx = min(acc_side, X - ox)
            hy = min(acc_side, Y - oy)
            # tissue bbox within the accumulator
            c = g.coords[g.valid]
            rx0 = int(c[:, 0].min() - ox)
            ry0 = int(c[:, 1].min() - oy)
            sx = int(c[:, 0].max() - ox) + patch_size - rx0
            sy = int(c[:, 1].max() - oy) + patch_size - ry0
            bx = next(b for b in buckets if b >= sx)
            by = next(b for b in buckets if b >= sy)
            rx0 = min(rx0, acc_side - bx)
            ry0 = min(ry0, acc_side - by)
            with timer.stage("flush"):
                host = np.asarray(jax.device_get(crop_fetch(
                    fetch_acc(acc)[0:fetch_planes],
                    rx0, ry0, planes=fetch_planes, bx=bx, by=by)))
                save_state(inflight=gi)  # taint marker: += is not replayable
                # host block is (planes, by, bx) at map offset (oy+ry0, ox+rx0)
                wy = min(by, hy - ry0)
                wx = min(bx, hx - rx0)
                my, mx = oy + ry0, ox + rx0
                mean_map[my:my + wy, mx:mx + wx] += host[0, :wy, :wx]
                if fetch_planes > 1:
                    var_map[my:my + wy, mx:mx + wx] += host[1, :wy, :wx]
                add_counts_host(count_map, g.coords, g.valid, patch_size)
            with _state_lock:
                completed.add(gi)
                save_state()  # clears the inflight taint

        from concurrent.futures import ThreadPoolExecutor

        with maybe_profile("segmentation"), ThreadPoolExecutor(1) as flusher:
            pending = []
            for batch in PatchLoader(slide, plan, num_workers=num_workers,
                                     skip_groups=completed):
                if batch.group_index != cur_group:
                    if acc is not None:
                        # flush in the background; compute continues on the
                        # next supertile (transfer/compute overlap)
                        pending.append(flusher.submit(flush, acc, cur_group))
                        # backpressure: each pending flush pins a full HBM
                        # accumulator — bound the backlog
                        while len(pending) > 2:
                            pending.pop(0).result()
                    acc = new_acc()
                    cur_group = batch.group_index
                with timer.stage("infer"):
                    patches_d, offsets_d, valid_d = place(batch)
                    acc = step(variables_tuple, acc, patches_d, offsets_d,
                               valid_d)
                done += 1
                _status_set(status, progress=int(done * 100.0 / total_batches))
                if progress_cb is not None:
                    progress_cb(done, total_batches)
            if acc is not None:
                pending.append(flusher.submit(flush, acc, cur_group))
            for fut in pending:
                fut.result()  # surface flush errors

    # --- finalize (chunked): mean /= count, var /= count^2 ---------------
    CHUNK = 4096
    if not finalized:
        with timer.stage("finalize"):
            for y0 in range(0, Y, CHUNK):
                y1 = min(y0 + CHUNK, Y)
                c = np.maximum(count_map[y0:y1], 1.0)
                mean_map[y0:y1] /= c
                var_map[y0:y1] /= c * c
            mean_map.flush()
            var_map.flush()
        finalized = True
        save_state(mark_finalized=True)

    if crf_active:
        from ..ops.crf import refine_slide_crf

        _status_set(status, status="Refining with CRF")

        # replay tiles staged by a crashed previous run (assignment is
        # replayable; += is not — hence staging only exists for CRF)
        for sp in mdir.glob(f"{stem}-crftile-*.npz"):
            ti = int(sp.stem.rsplit("-", 1)[1])
            with np.load(sp) as z:
                y0, y1, x0, x1 = (int(v) for v in z["box"])
                mean_map[y0:y1, x0:x1] = z["block"]
            crf_tiles_done.add(ti)
            save_state()
            sp.unlink(missing_ok=True)

        refine_slide_crf(slide, mean_map, supertile=supertile,
                         done=crf_tiles_done, on_tile=_crf_write, **crf_opts)
        mark_crf_applied(state_path, cfg_key)

    # --- write artifacts -------------------------------------------------
    def write_u8_pyramid(path, mm):
        """Native C++ streaming writer when available (15x faster; row-block
        cascade, so gigapixel maps stay out of RAM); python writer otherwise."""
        from ..io import backend as io_backend

        if io_backend.use_native():
            from ..io import native as io_native

            io_native.write_pyramidal_tiff(str(path), mm, compression="jpeg",
                                           quality=90)
            return
        with PyramidalTiffWriter(str(path), X, Y, channels=1, dtype=np.uint8,
                                 compression="jpeg", quality=90,
                                 scratch_dir=str(mdir)) as wr:
            wr.write_base(mm)

    def write_u8(path, transform):
        with timer.stage("write"):
            return _write_u8_inner(path, transform)

    def _write_u8_inner(path, transform):
        tmp = np.memmap(mdir / f"{stem}-u8.dat", np.uint8, "w+", shape=(Y, X))
        for y0 in range(0, Y, CHUNK):
            y1 = min(y0 + CHUNK, Y)
            tmp[y0:y1] = transform(y0, y1)
        tmp.flush()
        write_u8_pyramid(path, tmp)
        del tmp

    write_u8(probs_path, lambda a, b: np.clip(
        np.round(mean_map[a:b] * 255.0), 0, 255).astype(np.uint8))
    if save_float_probs:
        fp = str(probs_path) + ".f32.tiff"
        with PyramidalTiffWriter(fp, X, Y, channels=1, dtype=np.float32,
                                 compression="deflate",
                                 scratch_dir=str(mdir)) as wr:
            wr.write_base(mean_map)

    _status_set(status, progress=100)
    _status_set(status, status="Saving Prediction Mask...")
    mask_mm = np.memmap(mdir / f"{stem}-maskbin.dat", np.uint8, "w+", shape=(Y, X))
    with timer.stage("write"):
        for y0 in range(0, Y, CHUNK):
            y1 = min(y0 + CHUNK, Y)
            mask_mm[y0:y1] = np.where(
                mean_map[y0:y1] >= threshold, 255, 0).astype(np.uint8)
        mask_mm.flush()
        write_u8_pyramid(mask_path, mask_mm)

    _status_set(status, status="Saving Prediction Uncertanity...")
    write_u8(uncertainty_path, lambda a, b: np.clip(
        np.round(var_map[a:b] * 255.0), 0, 255).astype(np.uint8))
    _status_set(status, progress=0)

    timings = timer.summary()
    _status_set(status, timings=timings)
    print(f"[dpai] {plan.total_patches} patches "
          f"({len(plan.groups)} supertiles, {n_dev} device(s)): {timings}")

    slide.close()
    # reference returns the thresholded map in (X, Y) orientation
    return mask_mm.T
