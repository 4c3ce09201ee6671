"""Weight-parity harness (tools/activation_diff.py) self-tests.

The harness exists so that, the day the reference's trained .h5 checkpoints
are reachable, per-layer numerics can be diffed against golden TF outputs
(VERDICT round-1 item 7). These tests prove the harness itself works today
using synthesized Keras-format checkpoints: a faithful h5 reproduces its own
goldens to ~0, and a perturbed h5 is caught with the divergence localizing
at (not before) the perturbed layer.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def dense_h5(tmp_path_factory):
    import jax.numpy as jnp

    from digipathai_tpu.models.registry import build_model
    from tests.test_convert_full import emit_keras_h5

    d = tmp_path_factory.mktemp("actdiff")
    b = build_model("dense", dtype=jnp.float32)
    # he_normal init as-is: additive shifts make the 121-layer dense
    # cascade blow up to inf (inf - inf = nan diffs)
    v = b.init(64, seed=5)
    p = d / "dense.h5"
    emit_keras_h5(p, v)
    return p, d


class TestActivationDiff:
    def test_self_consistency_and_localization(self, dense_h5):
        from activation_diff import activation_diffs, main

        h5, d = dense_h5
        golden = d / "golden.npz"
        rc = main(["--model", "dense", "--h5", str(h5),
                   "--emit-golden", str(golden), "--patch", "64"])
        assert rc == 0 and golden.exists()

        # faithful h5 reproduces its goldens exactly
        rc = main(["--model", "dense", "--h5", str(h5),
                   "--golden", str(golden), "--tol", "1e-5"])
        assert rc == 0

        # perturb one mid-network layer's kernel -> FAIL localizes there
        import h5py
        import shutil

        bad = d / "bad.h5"
        shutil.copy(h5, bad)
        target = "conv3_block2_1_conv"
        with h5py.File(bad, "r+") as f:
            ds = f[target][f"{target}/kernel:0"]
            ds[...] = np.asarray(ds) + 0.5

        with np.load(golden) as z:
            g = {k: z[k] for k in z.files}
        rows = activation_diffs("dense", str(bad), g)
        diffs = dict((k, v) for k, v, ok in rows)
        # layers strictly before the perturbed one are untouched
        assert diffs["conv1/conv"] == 0.0
        assert diffs["conv3_block1_1_conv"] == 0.0
        # the perturbed layer and the output diverge
        assert diffs[target.replace("__", "/")] > 1e-3
        assert diffs["__output__"] > 1e-6
        rc = main(["--model", "dense", "--h5", str(bad),
                   "--golden", str(golden), "--tol", "1e-5"])
        assert rc == 1
