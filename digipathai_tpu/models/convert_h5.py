"""Keras .h5 checkpoint -> flax variables converter.

The reference ships trained weights as Keras ``save_weights`` .h5 files per
tissue family (``reference DigiPathAI/helpers/utils.py:58-98``). Our flax
modules name layers after the Keras layer names ('/' -> '__'), so conversion
is a name-driven walk of the h5 groups with strict shape checking.

Keras/TF1 weight-name suffix -> flax leaf:

==================  ==========================  ===================
h5 suffix            flax collection             flax leaf
==================  ==========================  ===================
kernel:0             params                      kernel
depthwise_kernel:0   params                      kernel (reshaped)
pointwise_kernel:0   params (…__pointwise)       kernel
bias:0               params                      bias
gamma:0              params                      scale
beta:0               params                      bias
moving_mean:0        batch_stats                 mean
moving_variance:0    batch_stats                 var
==================  ==========================  ===================
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

_SUFFIX_MAP = {
    "kernel:0": ("params", "kernel"),
    "depthwise_kernel:0": ("params", "kernel"),
    "bias:0": ("params", "bias"),
    "gamma:0": ("params", "scale"),
    "beta:0": ("params", "bias"),
    "moving_mean:0": ("batch_stats", "mean"),
    "moving_variance:0": ("batch_stats", "var"),
}


def _h5_weight_items(h5) -> List[Tuple[str, str, np.ndarray]]:
    """Yield (layer_name, weight_suffix, array) from a Keras weights h5."""
    root = h5["model_weights"] if "model_weights" in h5 else h5
    items = []
    layer_names = [
        n.decode() if isinstance(n, bytes) else n
        for n in root.attrs.get("layer_names", list(root.keys()))
    ]
    for ln in layer_names:
        if ln not in root:
            continue
        grp = root[ln]
        weight_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in grp.attrs.get("weight_names", [])
        ]
        if not weight_names:  # fall back to walking datasets
            def visit(name, obj):
                if hasattr(obj, "shape"):
                    weight_names.append(name)
            grp.visititems(visit)
        for wn in weight_names:
            # Keras stores the dataset under the full weight path inside the
            # layer group; fall back to the group-relative path.
            if wn in grp:
                arr = np.asarray(grp[wn])
            else:
                rel = wn[len(ln) + 1:] if wn.startswith(ln + "/") else wn
                arr = np.asarray(grp[rel])
            # weight path like 'conv1/conv/kernel:0' -> layer 'conv1/conv'
            parts = wn.split("/")
            suffix = parts[-1]
            layer = "/".join(parts[:-1]) if len(parts) > 1 else ln
            items.append((layer, suffix, arr))
    return items


_AUTO_CLASSES = ("conv2d", "batch_normalization")


def _auto_index(name: str, cls: str):
    if name == cls:
        return 0
    if name.startswith(cls + "_"):
        suffix = name[len(cls) + 1:]
        if suffix.isdigit():
            return int(suffix)
    return None


def _detect_auto_offsets(h5_layers, our_layers) -> Dict[str, int]:
    """Keras auto-names depend on global per-class counters: a checkpoint
    saved after other models were built in the same process has every
    unnamed layer shifted (conv2d_37 where we expect conv2d).  Detect the
    per-class offset from the minimum indices on each side."""
    offsets = {}
    for cls in _AUTO_CLASSES:
        h5_idx = [i for n in h5_layers if (i := _auto_index(n, cls)) is not None]
        our_idx = [i for n in our_layers if (i := _auto_index(n, cls)) is not None]
        if h5_idx and our_idx and len(h5_idx) == len(our_idx):
            offsets[cls] = min(h5_idx) - min(our_idx)
        else:
            offsets[cls] = 0
    return offsets


def _unshift(name: str, offsets: Dict[str, int]) -> str:
    for cls, off in offsets.items():
        if off == 0:
            continue
        i = _auto_index(name, cls)
        if i is not None:
            j = i - off
            return cls if j == 0 else f"{cls}_{j}"
    return name


def keras_h5_to_flax(h5_path: str, variables: Dict[str, Any],
                     strict: bool = True) -> Dict[str, Any]:
    """Load a Keras .h5 into a flax variables pytree (shape-checked).

    ``variables`` is the template from ``module.init`` — a dict with
    'params' and (optionally) 'batch_stats' collections keyed by our
    Keras-mirrored layer names.  Auto-named layers are aligned even when the
    checkpoint's Keras name counters were offset (see _detect_auto_offsets).
    """
    import h5py
    import jax

    flat = {}
    for coll in variables:
        for lname, leaves in variables[coll].items():
            flat[(coll, lname)] = dict(leaves)

    with h5py.File(h5_path, "r") as f:
        h5_layer_names = {layer for layer, _, _ in _h5_weight_items(f)}
    our_layer_names = {ln for (_, ln) in flat}
    offsets = _detect_auto_offsets(h5_layer_names, our_layer_names)

    loaded = set()
    unmatched = []
    with h5py.File(h5_path, "r") as f:
        for layer, suffix, arr in _h5_weight_items(f):
            if suffix not in _SUFFIX_MAP:
                unmatched.append((layer, suffix, "unknown suffix"))
                continue
            coll, leaf = _SUFFIX_MAP[suffix]
            fname = _unshift(layer, offsets).replace("/", "__")
            key = (coll, fname)
            if key not in flat:
                unmatched.append((layer, suffix, "no such flax layer"))
                continue
            want = flat[key].get(leaf)
            if want is None:
                unmatched.append((layer, suffix, f"no leaf {leaf}"))
                continue
            if suffix == "depthwise_kernel:0":
                # Keras depthwise (H, W, C, M) -> flax grouped-conv
                # (H, W, 1, C*M). Both order outputs as c*M + m, so a plain
                # C-order reshape is the correct mapping for any M.
                h, w, c, m = arr.shape
                arr = arr.reshape(h, w, 1, c * m)
            if tuple(want.shape) != tuple(arr.shape):
                raise ValueError(
                    f"shape mismatch for {layer}/{suffix}: "
                    f"h5 {arr.shape} vs flax {tuple(want.shape)}")
            flat[key][leaf] = arr.astype(np.asarray(want).dtype)
            loaded.add((key, leaf))

    if strict and unmatched:
        raise ValueError(f"unmatched h5 weights: {unmatched[:10]}"
                         f"{'...' if len(unmatched) > 10 else ''}")

    out = {coll: dict(variables[coll]) for coll in variables}
    for (coll, lname), leaves in flat.items():
        out[coll][lname] = leaves
    return jax.tree_util.tree_map(np.asarray, out)


def coverage_report(h5_path: str, variables: Dict[str, Any]) -> Dict[str, list]:
    """Which flax layers would (not) be filled by this checkpoint.

    Applies the same auto-name offset correction as ``keras_h5_to_flax``.
    """
    import h5py

    with h5py.File(h5_path, "r") as f:
        raw = {layer for layer, _, _ in _h5_weight_items(f)}
    ours = set()
    for coll in variables:
        ours |= set(variables[coll].keys())
    offsets = _detect_auto_offsets(raw, ours)
    h5_layers = {_unshift(n, offsets).replace("/", "__") for n in raw}
    return {
        "matched": sorted(ours & h5_layers),
        "ours_only": sorted(ours - h5_layers),
        "h5_only": sorted(h5_layers - ours),
    }
