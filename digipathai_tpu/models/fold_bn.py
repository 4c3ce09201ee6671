"""Batch-norm folding for inference.

Measured on TPU v5e: throughput-neutral (114.5 vs 114.7 patches/s/chip for
the full ensemble) — XLA already fuses the BN affine into the conv epilogue.
Kept as an opt-in (`getSegmentation(fold_bn=True)`): it simplifies exported
graphs and helps backends without that fusion.

Folds each conv -> BN pair into a scaled conv + pure shift: with
``s = gamma / sqrt(var + eps)`` the kernel's output channels are scaled by
``s`` and the BN parameters are rewritten to the identity transform plus a
bias (scale=1, mean=0, var=1-eps, bias = beta - mu*s [+ old_bias*s]).  The
module graph is untouched — the rewritten BN lowers to a single fused add —
and the transform is mathematically exact up to float reassociation.

Pairing rules cover all three model families:
- explicitly named pairs: ``X`` -> ``X_bn`` / ``X_BN`` (inception conv_7b,
  all DeepLab convs) and ``conv1__conv`` -> ``conv1__bn`` (DenseNet stem);
- Keras auto-named pairs: ``conv2d[_k]`` -> ``batch_normalization[_k]``
  (every unnamed conv with a BN is created back-to-back with its unnamed BN,
  so the k-th auto conv pairs with the k-th auto BN).

DenseNet's pre-activation BNs (BN -> relu -> conv) are not post-conv and are
left untouched.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

_EPS_BY_SUFFIX = None  # eps values live in the module defn; see _bn_eps


def _bn_eps(bn_name: str) -> float:
    # DeepLab ASPP/decoder BNs use 1e-5; DenseNet dense-block BNs (not
    # folded) use 1.001e-5; everything else is Keras default 1e-3.
    if bn_name.endswith("_BN") and any(k in bn_name for k in (
            "image_pooling", "aspp", "concat_projection",
            "feature_projection", "decoder_conv")):
        return 1e-5
    if bn_name == "conv1__bn":
        return 1.001e-5
    return 1e-3


def _candidates(conv_name: str):
    out = [conv_name + "_bn", conv_name + "_BN"]
    if conv_name.endswith("__conv"):
        out.append(conv_name[:-len("__conv")] + "__bn")
    if conv_name == "conv2d" or conv_name.startswith("conv2d_"):
        suffix = conv_name[len("conv2d"):]
        out.append("batch_normalization" + suffix)
    return out


def fold_batchnorm(variables: Dict[str, Any],
                   eps_overrides: Optional[Dict[str, float]] = None
                   ) -> Tuple[Dict[str, Any], int]:
    """Returns (folded_variables, n_folded_pairs)."""
    params = {k: dict(v) for k, v in variables["params"].items()}
    stats = {k: dict(v) for k, v in variables.get("batch_stats", {}).items()}
    n = 0
    for conv_name, conv_p in params.items():
        if "kernel" not in conv_p:
            continue
        bn_name = next((c for c in _candidates(conv_name)
                        if c in stats and c in params), None)
        if bn_name is None:
            continue
        bn_p = params[bn_name]
        bn_s = stats[bn_name]
        eps = (eps_overrides or {}).get(bn_name, _bn_eps(bn_name))
        gamma = np.asarray(bn_p.get("scale", 1.0), np.float32)
        beta = np.asarray(bn_p.get("bias", 0.0), np.float32)
        mu = np.asarray(bn_s["mean"], np.float32)
        var = np.asarray(bn_s["var"], np.float32)
        s = gamma / np.sqrt(var + eps)

        kernel = np.asarray(conv_p["kernel"], np.float32)
        conv_p["kernel"] = (kernel * s).astype(np.asarray(conv_p["kernel"]).dtype)
        shift = beta - mu * s
        if "bias" in conv_p:
            shift = shift + np.asarray(conv_p["bias"], np.float32) * s
            conv_p["bias"] = np.zeros_like(np.asarray(conv_p["bias"]))
        # rewrite BN to identity + shift
        if "scale" in bn_p:
            bn_p["scale"] = np.ones_like(gamma)
        bn_p["bias"] = shift.astype(np.asarray(beta).dtype)
        bn_s["mean"] = np.zeros_like(mu)
        bn_s["var"] = np.full_like(var, 1.0 - eps)
        n += 1

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    # keep leaves on device: returning host numpy would silently re-upload
    # every weight on every jitted call
    import jax

    out = jax.device_put(out)
    return out, n
