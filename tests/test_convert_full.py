"""h5 conversion round-trips for the full ensemble (structure fidelity).

The real reference checkpoints can't be downloaded in this offline
environment, so these tests emit each flax model's variables in the exact
Keras ``save_weights`` h5 layout (layer groups, full-path datasets,
``weight_names`` attrs, depthwise shapes) and convert them back, proving the
name mirroring and shape mapping are invertible for every layer of every
model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model
from digipathai_tpu.models.convert_h5 import coverage_report, keras_h5_to_flax


def emit_keras_h5(path, variables):
    """Inverse of the converter: flax variables -> Keras save_weights layout."""
    import h5py

    layers = {}
    for coll in variables:
        for lname, leaves in variables[coll].items():
            kname = lname.replace("__", "/")
            for leaf, arr in leaves.items():
                arr = np.asarray(arr)
                if coll == "params" and leaf == "kernel" and arr.ndim == 4 \
                        and arr.shape[2] == 1 and "depthwise" in lname:
                    # flax grouped (H, W, 1, C) -> Keras depthwise (H, W, C, 1)
                    arr = np.transpose(arr, (0, 1, 3, 2))
                    suffix = "depthwise_kernel:0"
                elif coll == "params" and leaf == "kernel":
                    suffix = "kernel:0"
                elif coll == "params" and leaf == "scale":
                    suffix = "gamma:0"
                elif coll == "params" and leaf == "bias" and (
                        "bn" in lname.lower() or "normalization" in lname
                        or lname.endswith("_BN")):
                    suffix = "beta:0"
                elif coll == "params" and leaf == "bias":
                    suffix = "bias:0"
                elif coll == "batch_stats" and leaf == "mean":
                    suffix = "moving_mean:0"
                elif coll == "batch_stats" and leaf == "var":
                    suffix = "moving_variance:0"
                else:
                    raise AssertionError((coll, lname, leaf))
                layers.setdefault(kname, []).append((suffix, arr))
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            sorted({k.split("/")[0] for k in layers}), dtype="S")
        for kname, ws in layers.items():
            top = kname.split("/")[0]
            grp = f.require_group(top)
            names = [n.decode() if isinstance(n, bytes) else n
                     for n in grp.attrs.get("weight_names", [])]
            for suffix, arr in ws:
                wn = f"{kname}/{suffix}"
                grp.create_dataset(wn, data=arr)
                names.append(wn)
            grp.attrs["weight_names"] = np.array(names, dtype="S")


@pytest.mark.parametrize("name", ["inception", "deeplabv3"])
def test_full_model_roundtrip(tmp_path, name):
    b = build_model(name, dtype=jnp.float32)
    v = b.init(64, seed=1)
    v = jax.tree_util.tree_map(lambda a: np.asarray(a) + 0.125, v)
    p = tmp_path / f"{name}.h5"
    emit_keras_h5(p, v)

    template = b.init(64, seed=9)
    rep = coverage_report(str(p), template)
    assert not rep["ours_only"], rep["ours_only"][:5]
    assert not rep["h5_only"], rep["h5_only"][:5]

    out = keras_h5_to_flax(str(p), template, strict=True)
    for coll in v:
        a = jax.tree_util.tree_leaves(v[coll])
        c = jax.tree_util.tree_leaves(out[coll])
        assert len(a) == len(c)
        for x, y in zip(a, c):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
