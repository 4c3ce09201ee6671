#!/usr/bin/env python
"""Headline benchmark: ensemble x TTA segmentation throughput per chip.

DEFAULT (DPAI_BENCH_MODE unset or "tile"): the engine's fully-convolutional
tile path (``engine/tile_infer.build_model_tile_steps`` at tile 4096) — the
production fast path whose patch-mode deltas are quantified in PARITY.md /
``tools/tile_parity_probe.py``. Full 3-model ensemble (DenseNet121-UNet +
InceptionResNetV2-UNet + DeepLabv3+, patch-local ASPP) x 5 TTA variants in
bfloat16. The metric is stride-128 patch EQUIVALENTS/s/chip (each stride-128
patch contributes 128^2 fresh pixels), directly comparable to patch mode and
to the north-star target.

DPAI_BENCH_MODE=patch: the reference-parity path — the jitted step from
``engine/infer.build_step`` (device-side uint8 normalize, ensemble x TTA
forwards, inverse TTA, mean/var, on-device supertile scatter-add), i.e. the
workload of ``reference Segmentation.py:136-177`` with its 4x stride-128
overlap recompute. BASELINE.json config 4 minus CRF (CRF is flag-gated off
in the reference too, ``reference Segmentation.py:327-331``).

DPAI_BENCH_MODE=e2e: whole pipeline incl. host I/O and artifact pyramids.
DPAI_BENCH_QUANT=1: opt-in int8 path (models/quant.py); 2 = static-calibrated
scales; "deeplabv3:static" quantizes only the named models (per-model spec).
DPAI_BENCH_DP=N: run the tile step on N local chips at once (each chip gets
its own supertile — the engine's round-robin scheme, tile_infer.py:230-237);
patch mode shards the batch via parallel/inference.build_sharded_step. The
headline value stays per-chip; "dp" and "aggregate" fields are added. This
is how a real multi-chip host produces the v5e-N number (VERDICT r4 item 2c).

vs_baseline: ratio to the v5e-8 north-star requirement of 312
patches/sec/chip, derived from BASELINE.json's <60 s CAMELYON16 target:
a representative slide has ~150k tissue patches at stride 128
(SURVEY.md §6); 150_000 / (60 s x 8 chips) = 312.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpai_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

TARGET_PPS_PER_CHIP = 312.5  # see module docstring


def _wait_for_backend():
    """Block until the JAX backend answers, up to DPAI_BENCH_WAIT seconds.

    The axon TPU relay occasionally drops and recovers (observed round 3:
    backend init either raises Unavailable or hangs >9 min). Probing in a
    subprocess bounds the hang case; retrying bounds the outage case, so a
    bench launched during a blip still produces its JSON line. On healthy
    backends (TPU or CPU) the first probe returns in seconds.
    """
    import subprocess

    max_wait = float(os.environ.get("DPAI_BENCH_WAIT", 900))
    probe = ("import jax, jax.numpy as jnp; jax.devices(); "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "print(float((x @ x).sum()))")
    deadline = time.time() + max_wait
    while True:
        budget = max(30.0, min(300.0, deadline - time.time()))
        try:
            if subprocess.run([sys.executable, "-c", probe], timeout=budget,
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL).returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return  # proceed; let the real init surface the error
        print("bench: JAX backend unavailable, retrying...", file=sys.stderr)
        time.sleep(30)


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.engine.infer import build_step
    from digipathai_tpu.models.registry import build_model
    from digipathai_tpu.ops.stitch import make_accumulator

    patch, batch, supertile = 256, int(os.environ.get("DPAI_BENCH_BATCH", 32)), 4096
    tta = ["DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90", "ROTATE_180", "ROTATE_270"]
    names = ["dense", "inception", "deeplabv3"]
    quick = os.environ.get("DPAI_BENCH_QUICK") == "1"
    mode = os.environ.get("DPAI_BENCH_MODE", "tile")
    if quick:
        names, tta = ["dense"], ["DEFAULT"]
    if os.environ.get("DPAI_BENCH_MODELS"):
        names = os.environ["DPAI_BENCH_MODELS"].split(",")

    if mode == "tile" and not quick:
        return bench_tile(names, tta, patch)
    if mode == "e2e":
        return bench_e2e(names, tta)

    t0 = time.time()
    dp = max(1, int(os.environ.get("DPAI_BENCH_DP", "1")))
    if dp > len(jax.local_devices()):
        print(f"# DPAI_BENCH_DP={dp} > {len(jax.local_devices())} local "
              "devices — clamping", file=sys.stderr)
        dp = len(jax.local_devices())
    bundles = [build_model(n, dtype=jnp.bfloat16) for n in names]
    variables = tuple(b.init(patch) for b in bundles)
    if os.environ.get("DPAI_BENCH_FOLD_BN") == "1":
        from digipathai_tpu.models.fold_bn import fold_batchnorm

        variables = tuple(fold_batchnorm(v)[0] for v in variables)
        print("# BN folded", file=sys.stderr)
    print(f"# init {time.time() - t0:.1f}s on {jax.devices()[0].platform}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.integers(0, 255, (batch, patch, patch, 3), np.uint8))
    offsets = jnp.asarray(
        rng.integers(0, supertile, (batch, 2)).astype(np.int32))
    valid = jnp.ones((batch,), bool)

    if dp > 1:
        # grid-DP over local chips (parallel/inference.py): each chip
        # forwards its batch shard into its own accumulator; the fetch
        # below all-reduces once.  batch stays the PER-CHIP size so the
        # per-chip rate is comparable to dp=1 (VERDICT r4 item 2c).
        from digipathai_tpu.parallel import inference as par

        mesh = par.make_dp_mesh(dp)
        sstep = par.build_sharded_step(bundles, tta, patch, mesh)
        gb = batch * dp
        patches = jnp.asarray(
            rng.integers(0, 255, (gb, patch, patch, 3), np.uint8))
        offsets = jnp.asarray(
            rng.integers(0, supertile, (gb, 2)).astype(np.int32))
        valid = jnp.ones((gb,), bool)
        sharded = par.shard_batch(mesh, patches, offsets, valid)
        acc = par.make_sharded_accumulator(mesh, supertile, patch)

        def step_fetch():
            nonlocal acc
            acc = sstep(variables, acc, *sharded)
            return float(jax.device_get(
                jnp.sum(par.reduce_accumulator(mesh, acc)[0, 0])))
    else:
        step = build_step(bundles, tta, patch, with_checksum=True)
        acc = make_accumulator(supertile, patch)

        def step_fetch():
            nonlocal acc
            acc, checksum = step(variables, acc, patches, offsets, valid)
            # fetch the scalar: forces real completion (block_until_ready
            # is a no-op on some remote backends)
            return float(jax.device_get(checksum))

    t0 = time.time()
    _ = step_fetch()
    print(f"# compile+first step {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 3 if quick else 10
    t0 = time.time()
    for i in range(iters):
        if i < iters - 1:  # fetch only at the end: programs run in order,
            if dp > 1:     # and each relay fetch is a full round-trip
                acc = sstep(variables, acc, *sharded)
            else:
                acc, _ = step(variables, acc, patches, offsets, valid)
        else:
            _ = step_fetch()
    dt = (time.time() - t0) / iters
    pps = batch / dt  # per-chip: batch is the per-chip shard size

    line = {
        "metric": "ensemble5tta_patches_per_sec_per_chip" if not quick
        else "quick_patches_per_sec_per_chip",
        "value": round(pps, 2),
        "unit": "256px patches/s/chip (3 models x 5 TTA, bf16, stitched)"
        if not quick else "256px patches/s/chip (1 model, no TTA)",
        "vs_baseline": round(pps / TARGET_PPS_PER_CHIP, 3),
    }
    if dp > 1:
        line["dp"] = dp
        line["aggregate_pps"] = round(pps * dp, 2)
    print(json.dumps(line))


def bench_tile(names, tta, patch):
    """Fully-convolutional tile mode: report stride-128-patch *equivalents*
    per second (each stride-128 patch contributes 128^2 fresh pixels, so
    equivalents = pixels_per_sec / 128^2 — directly comparable to the
    patch-mode metric and to the 312.5 north-star requirement)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.engine.tile_infer import build_model_tile_steps
    from digipathai_tpu.models.registry import build_model

    tile = int(os.environ.get("DPAI_BENCH_TILE", 4096))
    halo, stride = patch // 2, 128
    local_aspp = (tile + 2 * halo) % patch == 0 and \
        os.environ.get("DPAI_BENCH_GLOBAL_ASPP") != "1"
    # s2d decoder measured as a net loss in-context (434 vs 463 eq-pps for
    # dense@2048) despite standalone conv wins — opt-in for experiments
    s2d = os.environ.get("DPAI_BENCH_S2D") == "1"
    # 1 = dynamic per-call scales (round-2: neutral on v5e — the abs-max
    # pass cancels the MXU gain); 2 = static calibrated scales (the
    # quantize becomes a fusable elementwise epilogue; VERDICT r3 item 1a).
    # Per-model spec "deeplabv3:static" quantizes only the named models —
    # static int8 wins on deeplab (+5.5%) but loses on dense (-2.5%), so
    # the best ensemble config is mixed (VERDICT r4 item 3).
    quant = os.environ.get("DPAI_BENCH_QUANT", "0") or "0"
    if ":" in quant:
        from digipathai_tpu.engine.segmentation import _parse_quant_spec

        qmode = _parse_quant_spec(quant)
    else:
        qmode = {0: False, 1: True, 2: "static"}[int(quant)]

    def qfor(n):
        return qmode.get(n, False) if isinstance(qmode, dict) else qmode
    wpack = os.environ.get("DPAI_BENCH_WPACK") == "1"
    fused = os.environ.get("DPAI_BENCH_FUSED") == "1"
    # whole-stage Pallas fusion of the last N U-Net decoder stages
    # (ops/pallas/stage_fused.py); round-3 lever per BASELINE.md
    fused_stages = int(os.environ.get("DPAI_BENCH_FUSED_STAGE", 0))
    # run the TTA forwards B at a time (batched convs run at ~2x the MXU
    # efficiency of batch-1 giant-spatial ones — round-3 decomposition)
    ttab = int(os.environ.get("DPAI_BENCH_TTAB", 1))
    # route the first N dense blocks' 3x3 convs through the strip-DMA
    # Pallas kernel w/ fused pre-activation (densenet_unet.pallas_blocks)
    pblocks = int(os.environ.get("DPAI_BENCH_PBLOCKS", 0))
    # A/B the packed parallel 1x1 branch heads (inception_unet.packed_heads)
    pheads = int(os.environ.get("DPAI_BENCH_PHEADS", -1))
    # A/B the progressive decoder halo crop (models' halo_crop; exact)
    hcrop = int(os.environ.get("DPAI_BENCH_HCROP", -1))
    # Host-packed s2d stem (models' s2d_stem + packed TTA; exact):
    # 1 = 2x2 pack (stem conv only), 2 = 4x4 pack (whole stem packed),
    # 0 = off.  Default 1 — the measured uniform in-model winner (dense
    # +6.8% / inception +2.4% / deeplab +4.7%; BASELINE.md round 3) and
    # the engine's s2d_input="auto" default.
    s2dstem = int(os.environ.get("DPAI_BENCH_S2DSTEM", 1))

    def model_kw(n):
        kw = {"quantized": qfor(n)} if qfor(n) else {}
        if n == "deeplabv3" and local_aspp:
            kw["aspp_pool_window"] = patch
        if n in ("dense", "inception"):
            if s2d:
                kw["s2d_decoder"] = True
            if wpack:
                kw["wpack"] = True
            if fused:
                kw["fused_decoder"] = True
            if fused_stages:
                kw["fused_stages"] = fused_stages
            if pblocks and n == "dense":
                kw["pallas_blocks"] = pblocks
            if pheads >= 0 and n == "inception":
                kw["packed_heads"] = bool(pheads)
            if hcrop > 0:
                kw["halo_crop"] = halo
            if os.environ.get("DPAI_BENCH_TRUNC"):
                # measurement-only: drop the last N decoder stages' convs to
                # attribute in-model per-stage cost (densenet_unet.py /
                # inception_unet.py)
                kw["trunc_last"] = int(os.environ["DPAI_BENCH_TRUNC"])
        if s2dstem:
            kw["s2d_stem"] = s2dstem
        return kw

    bundles = [build_model(n, dtype=jnp.bfloat16, **model_kw(n))
               for n in names]
    variables = tuple(b.init(tile + 2 * halo) for b in bundles)
    steps, combine, _ = build_model_tile_steps(bundles, tta, tile, halo,
                                               tta_batch=ttab)
    rng = np.random.default_rng(0)
    tile_u8 = rng.integers(0, 255, (tile + 2 * halo, tile + 2 * halo, 3),
                           np.uint8)
    if s2dstem:
        # what the loader ships in s2d mode: host-packed (H/P, W/P, 3P^2)
        from digipathai_tpu.ops.s2d_input import pack_host

        tile_u8 = pack_host(tile_u8, s2dstem)
    tile_u8 = jnp.asarray(tile_u8)

    if any(qfor(n) == "static" for n in names):
        # calibrate per-layer activation abs-max on the bench tile itself
        # (one jitted forward per model), then bake the scales as constants
        from digipathai_tpu.models.quant import calibrate
        from digipathai_tpu.ops.color import normalize_patches

        t0 = time.time()
        xcal = normalize_patches(tile_u8[None], dtype=jnp.bfloat16)
        new_vars = []
        for n, v in zip(names, variables):
            if qfor(n) != "static":
                new_vars.append(v)
                continue
            cb = build_model(n, dtype=jnp.bfloat16,
                             **{**model_kw(n), "quantized": "calib"})
            calib = calibrate(cb.module, v, [xcal], train=False,
                              jit=True)
            new_vars.append(dict(v, calib=jax.device_get(calib)))
        variables = tuple(new_vars)
        print(f"# int8 calibration {time.time() - t0:.1f}s", file=sys.stderr)

    dp = max(1, int(os.environ.get("DPAI_BENCH_DP", "1")))
    devs = jax.local_devices()
    if dp > len(devs):
        print(f"# DPAI_BENCH_DP={dp} > {len(devs)} local devices — clamping",
              file=sys.stderr)
        dp = len(devs)
    if dp > 1:
        # the engine's round-robin supertile scheme (tile_infer.py device
        # round-robin): each chip owns a WHOLE supertile — zero cross-chip
        # traffic in the hot loop, so scaling is the per-chip rate x N
        # minus dispatch skew.  Replicate weights+input per device; async
        # dispatch keeps all chips busy, one fetch at the end drains all.
        tiles_d = [jax.device_put(tile_u8, dv) for dv in devs[:dp]]
        vars_d = [jax.device_put(variables, dv) for dv in devs[:dp]]
    else:
        tiles_d, vars_d = [tile_u8], [variables]

    def run():
        outs = []
        for t_in, vs in zip(tiles_d, vars_d):
            sums, sqs = [], []
            for step, v in zip(steps, vs):
                s, q = step(v, t_in)
                sums.append(s)
                sqs.append(q)
            outs.append(combine(sums, sqs))
        return outs

    t0 = time.time()
    outs = run()
    for mean, _var in outs:
        _ = float(jax.device_get(jnp.mean(mean)))
    print(f"# tile compile+first {time.time() - t0:.1f}s", file=sys.stderr)

    iters = int(os.environ.get("DPAI_BENCH_ITERS", 10))
    t0 = time.time()
    for _ in range(iters):
        outs = run()
    for mean, _var in outs:  # per-device programs run in order: last done
        _ = float(jax.device_get(jnp.mean(mean)))  # per device => all done
    dt = (time.time() - t0) / iters
    # per iter the dp chips each finish one supertile => per-chip rate is
    # the dp=1 formula; aggregate = per-chip x dp
    equiv_pps = (tile * tile) / (stride * stride) / dt

    line = {
        "metric": "tile_mode_patch_equivalents_per_sec_per_chip",
        "value": round(equiv_pps, 2),
        "unit": "stride-128 patch equivalents/s/chip (3 models x 5 TTA, "
                "fully-convolutional supertiles)",
        "vs_baseline": round(equiv_pps / TARGET_PPS_PER_CHIP, 3),
    }
    if dp > 1:
        line["dp"] = dp
        line["aggregate_pps"] = round(equiv_pps * dp, 2)
    if os.environ.get("DPAI_BENCH_BOTH", "1") != "0":
        # tracked regression line for the engine-default patch path (the
        # tile-default flip criterion is pinned in PARITY.md): rot here
        # must be visible even while tile mode is the headline
        try:
            line["patch_mode_pps"] = round(
                _measure_patch_mode(names, tta, patch), 2)
        except Exception as e:  # never break the headline
            print(f"# patch-mode regression line failed: {e!r}",
                  file=sys.stderr)
    print(json.dumps(line))


def _measure_patch_mode(names, tta, patch, batch=32, iters=5):
    """The reference-parity patch-mode step rate (same path as
    DPAI_BENCH_MODE=patch, fewer iters)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.engine.infer import build_step
    from digipathai_tpu.models.registry import build_model
    from digipathai_tpu.ops.stitch import make_accumulator

    supertile = 4096
    bundles = [build_model(n, dtype=jnp.bfloat16) for n in names]
    variables = tuple(b.init(patch) for b in bundles)
    step = build_step(bundles, tta, patch, with_checksum=True)
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.integers(0, 255, (batch, patch, patch, 3), np.uint8))
    offsets = jnp.asarray(
        rng.integers(0, supertile, (batch, 2)).astype(np.int32))
    valid = jnp.ones((batch,), bool)
    acc = make_accumulator(supertile, patch)
    acc, checksum = step(variables, acc, patches, offsets, valid)
    _ = float(jax.device_get(checksum))
    t0 = time.time()
    for _ in range(iters):
        acc, checksum = step(variables, acc, patches, offsets, valid)
    _ = float(jax.device_get(checksum))
    return batch / ((time.time() - t0) / iters)


def bench_e2e(names, tta):
    """Whole-pipeline run on a synthetic slide (BASELINE config 3/4 shape):
    slide open -> tissue mask -> patch grid -> loader -> ensemble x TTA ->
    stitch -> finalize -> three pyramid artifacts. Reports patches/sec/chip
    end-to-end (including host I/O and artifact writing, excluding jit
    compilation via a tiny warmup slide).

    DPAI_BENCH_E2E_TILE=1 runs the engine's tile fast path instead of the
    reference-parity patch default; DPAI_BENCH_E2E_CRF=1 enables CRF (in
    tile mode it runs per-supertile, overlapped — VERDICT r3 item 2);
    DPAI_BENCH_E2E_BBOX=1 enables tissue-bbox compute cropping (engine
    default OFF since r5 — measured e2e loss, BASELINE.md round 5);
    DPAI_BENCH_E2E_SPARSE=1 uses a CAMELYON-like sparse slide (tissue in
    ~1/6 of the area) instead of the dense fixture — the workload where
    bbox cropping pays.  Per-stage wall shares from status['timings'] go
    to stderr."""
    import tempfile

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import make_synthetic_slide
    from digipathai_tpu.engine.segmentation import getSegmentation

    os.environ.setdefault("DPAI_OFFLINE", "1")
    d = tempfile.mkdtemp(prefix="dpai_bench_")
    quick = names == ["dense"]
    tile_mode = os.environ.get("DPAI_BENCH_E2E_TILE") == "1"
    use_crf = os.environ.get("DPAI_BENCH_E2E_CRF") == "1"
    bbox = os.environ.get("DPAI_BENCH_E2E_BBOX", "0") == "1"
    sparse = os.environ.get("DPAI_BENCH_E2E_SPARSE") == "1"

    def run(path, label):
        t0 = time.time()
        status = {}
        out = getSegmentation(
            img_path=path, patch_size=256, stride_size=128, batch_size=32,
            quick=quick, model=names[0], mode="breast",
            tta_list=[t for t in tta if t != "DEFAULT"] or None,
            crf=use_crf, tile_bbox_compute=bbox,
            inference_mode="tile" if tile_mode else "patch",
            probs_path=os.path.join(d, label + "-p.tiff"),
            mask_path=os.path.join(d, label + "-m.tiff"),
            uncertainty_path=os.path.join(d, label + "-u.tiff"),
            num_workers=16, status=status)
        dt = time.time() - t0
        print(f"# e2e {label}: {dt:.1f}s timings={status.get('timings')}",
              file=sys.stderr)
        return dt

    warm = os.path.join(d, "warm.tiff")
    make_synthetic_slide(warm, 1024, 1024, seed=1)
    run(warm, "warm")  # compile everything
    big = os.path.join(d, "big.tiff")
    if sparse:
        # glass slide with one tissue block (~1/6 of the area): the
        # supertile grid is mostly partial, like real CAMELYON16 slides
        from tests.fixtures import render_he_like
        from digipathai_tpu.io.backend import write_pyramid

        img = np.full((6144, 8192, 3), 243, np.uint8)
        sub, _, _ = render_he_like(3072, 2560, seed=2)
        img[512:512 + sub.shape[0], 512:512 + sub.shape[1]] = sub
        write_pyramid(big, img, compression="jpeg", quality=92, mpp=0.5)
    else:
        make_synthetic_slide(big, 8192, 6144, seed=2)
    # count patches from the plan for the normalized metric
    from digipathai_tpu.io.slide import Slide
    from digipathai_tpu.engine.planner import plan_patches

    with Slide(big) as s:
        n_patches = plan_patches(s, 256, 128, 32).total_patches
    secs = run(big, "big")
    pps = n_patches / secs
    variant = ("_tile" if tile_mode else "") + ("_crf" if use_crf else "") \
        + ("_sparse" if sparse else "") + ("_bbox" if bbox else "")
    print(json.dumps({
        "metric": "e2e_patches_per_sec_per_chip" + variant,
        "value": round(pps, 2),
        "unit": f"end-to-end patches/s/chip ({len(names)} models x {len(tta)} TTA,"
                f" {n_patches} patches incl. I/O + artifacts in {secs:.1f}s)",
        "vs_baseline": round(pps / TARGET_PPS_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
