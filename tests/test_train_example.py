"""examples/train.py: fine-tuning drive on a synthetic slide.

The reference ships no training code (SURVEY.md §2); this pins the
framework's training example end-to-end: planner-sampled patches +
``-gt`` labels -> jitted train step -> engine-cache-format pickle.
"""

import os
import pickle
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gt_slide_pair(tmp_path_factory):
    from digipathai_tpu.io.backend import write_pyramid

    from tests.fixtures import render_he_like

    d = tmp_path_factory.mktemp("train")
    img, tissue, lesion = render_he_like(1024, 768, seed=3)
    slide = str(d / "s.tiff")
    gt = str(d / "s-gt.tiff")
    write_pyramid(slide, img, compression="deflate")
    write_pyramid(gt, (lesion * 255).astype(np.uint8), compression="deflate")
    return slide, gt


def test_train_example_end_to_end(gt_slide_pair, tmp_path, monkeypatch):
    slide, _gt = gt_slide_pair
    out = str(tmp_path / "ft.pkl")
    monkeypatch.setattr(sys, "argv", [
        "train.py", slide, "--model", "tiny", "--patch", "64",
        "--batch", "2", "--steps", "4", "--lr", "1e-2",
        "--from-scratch", "--out", out,
    ])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(os.path.join(REPO, "examples", "train.py"),
                       run_name="__main__")
    assert exc.value.code == 0
    with open(out, "rb") as f:
        variables = pickle.load(f)
    assert "params" in variables


def test_train_example_missing_gt_fails(tmp_path, monkeypatch):
    from digipathai_tpu.io.backend import write_pyramid

    from tests.fixtures import render_he_like

    img, _, _ = render_he_like(512, 512, seed=1)
    slide = str(tmp_path / "nogt.tiff")
    write_pyramid(slide, img, compression="deflate")
    monkeypatch.setattr(sys, "argv", ["train.py", slide, "--model", "tiny"])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(os.path.join(REPO, "examples", "train.py"),
                       run_name="__main__")
    assert "ground truth" in str(exc.value)
