#!/usr/bin/env python
"""Attribute the DenseNet encoder's in-model cost and race alternative
dense-block executions on the real chip.

Round-3 context: the in-model decomposition (BASELINE.md) put the encoder +
head + TTA machinery at ~258 ms of the ~412 ms dense forward at tile 4096 —
~5% MXU efficiency — while the decoder stages run at 23-49%.  The reference
encoder (``reference DigiPathAI/models/densenet.py:110-125`` via
keras.applications DenseNet121) is a per-layer ``concatenate``; on TPU that
materializes the full concat tensor to HBM once per layer, and the narrow
conv channel widths (K = 64+32l, N = 32) pad badly onto the 128-lane MXU.

Variants (all numerically identical up to f32/bf16 reassociation):
  v0  per-layer jnp.concatenate (what the model does today)
  v1  preallocated channel buffer + dynamic_update_slice; convs read the
      full buffer with zero-padded weights for not-yet-written channels
  v2  features kept as a LIST of 128-ch packed buffers; each 1x1 conv is a
      sum of K=128-sliced convs (no concat ever materializes)

Usage: python tools/encoder_probe.py [side] [iters]
Writes one JSON line per measurement to stdout (flush, unbuffered-safe).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

GROWTH = 32


def _bn_relu(x, scale, bias):
    # inference BN folds to one affine; relu after
    return jax.nn.relu(x * scale + bias)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def make_params(key, c0, n_layers, dtype=jnp.bfloat16):
    ps = []
    c = c0
    for i in range(n_layers):
        k = jax.random.fold_in(key, i)
        ks = jax.random.split(k, 6)
        ps.append(dict(
            s0=jax.random.normal(ks[0], (c,), dtype) * 0.1 + 1,
            b0=jax.random.normal(ks[1], (c,), dtype) * 0.1,
            k1=jax.random.normal(ks[2], (1, 1, c, 4 * GROWTH), dtype) * 0.05,
            s1=jax.random.normal(ks[3], (4 * GROWTH,), dtype) * 0.1 + 1,
            b1=jax.random.normal(ks[4], (4 * GROWTH,), dtype) * 0.1,
            k2=jax.random.normal(ks[5], (3, 3, 4 * GROWTH, GROWTH),
                                 dtype) * 0.05,
        ))
        c += GROWTH
    return ps


def block_v0(x, params):
    for p in params:
        y = _bn_relu(x, p["s0"], p["b0"])
        y = conv(y, p["k1"])
        y = _bn_relu(y, p["s1"], p["b1"])
        y = conv(y, p["k2"])
        x = jnp.concatenate([x, y], axis=-1)
    return x


def block_v1(x, params):
    # one preallocated buffer; each layer's 1x1 reads the FULL buffer with
    # its kernel zero-padded over the unwritten channels (identical math:
    # those channels are zero in the buffer too, but zero WEIGHTS make the
    # result exact even if the buffer were garbage)
    c0 = x.shape[-1]
    cfin = c0 + GROWTH * len(params)
    buf = jnp.zeros(x.shape[:-1] + (cfin,), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
    for li, p in enumerate(params):
        c = c0 + GROWTH * li
        s0 = jnp.pad(p["s0"], (0, cfin - c))
        b0 = jnp.pad(p["b0"], (0, cfin - c))
        k1 = jnp.pad(p["k1"], ((0, 0), (0, 0), (0, cfin - c), (0, 0)))
        y = _bn_relu(buf, s0, b0)
        y = conv(y, k1)
        y = _bn_relu(y, p["s1"], p["b1"])
        y = conv(y, p["k2"])
        buf = jax.lax.dynamic_update_slice(buf, y, (0, 0, 0, c))
    return buf


def block_v2(x, params):
    # features as a list of <=128-ch packed buffers; the 1x1 is a sum of
    # per-buffer convs (K aligned to 128 except possibly the first buffer)
    chunks = [x]
    pend = []  # 32-ch outputs not yet packed

    def packed():
        return chunks + ([jnp.concatenate(pend, -1)] if pend else [])

    for p in params:
        off = 0
        acc = None
        for ch in packed():
            c = ch.shape[-1]
            h = _bn_relu(ch, jax.lax.dynamic_slice_in_dim(p["s0"], off, c),
                         jax.lax.dynamic_slice_in_dim(p["b0"], off, c))
            part = conv(h, jax.lax.dynamic_slice_in_dim(p["k1"], off, c, 2))
            acc = part if acc is None else acc + part
            off += c
        y = _bn_relu(acc, p["s1"], p["b1"])
        y = conv(y, p["k2"])
        pend.append(y)
        if sum(t.shape[-1] for t in pend) >= 128:
            chunks.append(jnp.concatenate(pend, -1))
            pend = []
    return jnp.concatenate(chunks + pend, -1)


def time_fn(fn, x, iters, tag):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(x)
    s = float(jax.device_get(jnp.float32(jnp.mean(out))))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(x)
    s2 = float(jax.device_get(jnp.float32(jnp.mean(out))))
    dt = (time.time() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1),
                      "checksum": s}), flush=True)
    return dt, s


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 544
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    key = jax.random.PRNGKey(0)

    # block3 of DenseNet-121 at tile 4096(+halo): 544^2 x 256 -> 1024
    configs = [("block2", side * 2, 128, 12), ("block3", side, 256, 24),
               ("block4", side // 2, 512, 16)]
    for name, s, c0, n in configs:
        x = jax.random.normal(jax.random.fold_in(key, s),
                              (1, s, s, c0), jnp.bfloat16)
        params = make_params(jax.random.fold_in(key, 7 * s), c0, n)
        res = {}
        for tag, fn in (("v0_concat", block_v0),
                        ("v1_buffer", block_v1),
                        ("v2_chunked", block_v2)):
            dt, cs = time_fn(functools.partial(fn, params=params), x, iters,
                             f"{name}/{tag}")
            res[tag] = (dt, cs)
        # numerical agreement (bf16 reassociation tolerance)
        c = [v[1] for v in res.values()]
        print(json.dumps({"tag": f"{name}/agree",
                          "max_rel": max(abs(a - c[0]) /
                                         (abs(c[0]) + 1e-9) for a in c)}),
              flush=True)


if __name__ == "__main__":
    main()
