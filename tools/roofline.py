#!/usr/bin/env python
"""Attainable-ceiling (roofline) analysis for the ensemble forward (round 4).

Traces each model's tile forward with `jax.make_jaxpr` (no device needed),
walks every `conv_general_dilated`, and lower-bounds its runtime on a
TPU v5e by the tighter of

  * MXU ceiling with 128-lane / 128-K tiling granularity: an implicit-GEMM
    conv with C_out output channels cannot use more than
    C_out / (ceil(C_out/128)*128) of the systolic array's output lanes, and
    likewise along the contraction dim K = kh*kw*C_in.  FLOPs at
    197 bf16-TFLOP/s scaled by both utilizations.
  * HBM bandwidth: (input + kernel + output bytes) / 819 GB/s — nothing can
    run faster than its operands stream.

Everything else (BN, activations, concats, resizes) is assumed PERFECTLY
fused/free, so per-model totals are hard lower bounds for *this
architecture at these shapes* under any conv lowering that respects MXU
tiling; the "pure-FLOP" column drops even the tiling granularity (a
physical-peak bound no implementation can beat).

Reports per model: bound times per 5-TTA tile step, implied eq-pps
ceilings, and measured eq-pps for comparison; plus the top shape-class
cost contributors under the tiled bound.  Feeds BASELINE.md round-4
ceiling analysis (VERDICT round-3 item 1 exit criterion).

Usage: python tools/roofline.py [--tile 4096] [--halo 128] [--tta 5]
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12     # v5e bf16 MXU peak
PEAK_INT8 = 394e12      # v5e int8
VPU_FLOPS = 4e12        # v5e vector unit (depthwise convs lower here)
HBM_BW = 819e9          # bytes/s
LANE = 128

# measured in-model eq-pps at tile 4096 + s2d level 1 (BASELINE.md r3/r4)
MEASURED = {"dense": 549.8, "inception": 498.8, "deeplabv3": 976.5}


def _pad(n, g=LANE):
    return ((n + g - 1) // g) * g


def conv_cost(eqn):
    """(flops, min_bytes, tiled_attainable_flops) for one conv eqn."""
    lhs, rhs = (v.aval for v in eqn.invars)
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    # kernel layout: rhs_spec maps (out_c, in_c, *spatial) -> positions
    kshape = rhs.shape
    c_out = kshape[dn.rhs_spec[0]]
    c_in = kshape[dn.rhs_spec[1]]          # per-group input channels
    ksp = [kshape[i] for i in dn.rhs_spec[2:]]
    osp = [out.shape[i] for i in dn.out_spec[2:]]
    n = out.shape[dn.out_spec[0]]
    m = n
    for s in osp:
        m *= s
    k = c_in
    for s in ksp:
        k *= s
    flops = 2.0 * m * c_out * k            # groups already folded: c_in is per-group
    bytesz = 2.0 * (lhs.size + rhs.size + out.size)   # bf16
    if groups == c_out and c_in == 1:
        # depthwise: XLA lowers to VPU elementwise multiply-adds (channels
        # on lanes), not a grouped MXU GEMM — bandwidth/VPU-bound
        return flops, bytesz, VPU_FLOPS * (c_out / _pad(c_out))
    # per-group GEMM: N-dim = c_out/groups lanes at a time
    n_g = c_out // groups if groups > 1 else c_out
    util = (n_g / _pad(n_g)) * (k / _pad(k)) * min(1.0, m / _pad(m, 8))
    return flops, bytesz, PEAK_FLOPS * util


def analyse(name, side, s2d, tta, aspp_pool=256):
    import jax
    import jax.numpy as jnp

    from digipathai_tpu.models.registry import build_model

    kw = {"s2d_stem": s2d} if s2d else {}
    if name == "deeplabv3":
        kw["aspp_pool_window"] = aspp_pool
    b = build_model(name, dtype=jnp.bfloat16, **kw)
    v = b.init(side)
    p = side >> s2d if s2d else side
    c = 3 * 4 ** s2d if s2d else 3
    x = jnp.zeros((1, p, p, c), jnp.bfloat16)
    jxp = jax.make_jaxpr(lambda v, x: b.apply_p1(v, x))(v, x)

    tot_f = tot_tiled = tot_bw = tot_pure = 0.0
    classes = defaultdict(lambda: [0.0, 0])
    for eqn in jxp.jaxpr.eqns:
        if eqn.primitive.name != "conv_general_dilated":
            continue
        f, by, att = conv_cost(eqn)
        t_tiled = max(f / att, by / HBM_BW)
        t_pure = max(f / PEAK_FLOPS, by / HBM_BW)
        tot_f += f
        tot_tiled += t_tiled
        tot_pure += t_pure
        tot_bw += by
        rhs = eqn.invars[1].aval.shape
        osp = eqn.outvars[0].aval
        key = (rhs, osp.shape[1])
        classes[key][0] += t_tiled
        classes[key][1] += 1
    return {
        "flops": tot_f, "bytes": tot_bw,
        "t_tiled": tot_tiled * tta, "t_pure": tot_pure * tta,
        "classes": sorted(classes.items(), key=lambda kv: -kv[1][0])[:6],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--halo", type=int, default=128)
    ap.add_argument("--tta", type=int, default=5)
    ap.add_argument("--s2d", type=int, default=1)
    args = ap.parse_args()

    side = args.tile + 2 * args.halo
    eq_patches = (args.tile // 128) ** 2   # stride-128 eq patches per tile

    rates_meas, rates_tiled, rates_pure = [], [], []
    for name in ("dense", "inception", "deeplabv3"):
        r = analyse(name, side, args.s2d, args.tta)
        pps_tiled = eq_patches / r["t_tiled"]
        pps_pure = eq_patches / r["t_pure"]
        meas = MEASURED[name]
        rates_meas.append(meas)
        rates_tiled.append(pps_tiled)
        rates_pure.append(pps_pure)
        print(f"\n== {name}  ({side}^2 input, s2d{args.s2d}, "
              f"x{args.tta} TTA) ==")
        print(f"  conv FLOPs/fwd: {r['flops']/1e12:6.2f} TF   "
              f"min HBM traffic: {r['bytes']/1e9:5.1f} GB")
        print(f"  bound time/step: tiled {r['t_tiled']*1e3:7.1f} ms  "
              f"pure-FLOP {r['t_pure']*1e3:7.1f} ms")
        print(f"  eq-pps ceiling:  tiled {pps_tiled:7.1f}   "
              f"pure {pps_pure:7.1f}   measured {meas:6.1f} "
              f"({meas/pps_tiled*100:4.1f}% of tiled bound)")
        print("  top shape classes by tiled-bound time "
              "(kernel shape, out side, n, ms/fwd):")
        for (rhs, oside), (t, cnt) in r["classes"]:
            print(f"    {str(rhs):>22s} @{oside:5d}  x{cnt:3d}  "
                  f"{t*1e3:7.1f} ms")

    def ens(rs):
        return 1.0 / sum(1.0 / r for r in rs)

    print("\n== ensemble (3 models serialized/supertile) ==")
    print(f"  measured {ens(rates_meas):6.1f} eq-pps   "
          f"tiled-bound ceiling {ens(rates_tiled):6.1f}   "
          f"pure-FLOP ceiling {ens(rates_pure):6.1f}")
    print(f"  north star 312.5: "
          f"{'INSIDE' if ens(rates_tiled) >= 312.5 else 'OUTSIDE'} "
          f"the tiled bound, "
          f"{'inside' if ens(rates_pure) >= 312.5 else 'outside'} "
          f"the pure-FLOP bound")


if __name__ == "__main__":
    sys.exit(main())
