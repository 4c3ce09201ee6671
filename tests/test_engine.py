"""End-to-end engine tests: planner, loader, getSegmentation."""

import numpy as np
import pytest

from digipathai_tpu.engine.planner import plan_patches
from digipathai_tpu.engine.loader import PatchLoader
from digipathai_tpu.io.slide import Slide
from digipathai_tpu.utils.metrics import jaccard


@pytest.fixture(scope="module")
def small_slide(tmp_path_factory):
    from tests.fixtures import make_synthetic_slide

    p = tmp_path_factory.mktemp("eng") / "small-slide.tiff"
    meta = make_synthetic_slide(str(p), width=1024, height=768, seed=1)
    return str(p), meta


class TestPlanner:
    def test_plan_properties(self, small_slide):
        path, meta = small_slide
        with Slide(path) as s:
            plan = plan_patches(s, patch=128, stride=128, batch=8, supertile=512)
        assert plan.total_patches > 0
        assert plan.slide_dims == (1024, 768)
        for g in plan.groups:
            assert len(g.coords) % 8 == 0
            v = g.coords[g.valid]
            assert (v[:, 0] >= 0).all() and (v[:, 0] <= 1024 - 128).all()
            assert (v[:, 1] >= 0).all() and (v[:, 1] <= 768 - 128).all()
            # every valid patch's top-left supertile is this group's origin
            assert ((v[:, 0] // 512) * 512 == g.origin[0]).all()
            assert ((v[:, 1] // 512) * 512 == g.origin[1]).all()

    def test_patch_centers_on_strided_mask(self, small_slide):
        path, meta = small_slide
        with Slide(path) as s:
            plan = plan_patches(s, patch=128, stride=128, batch=8, supertile=512)
        # every valid patch must originate from a strided-mask hit; centers
        # are coord * resolution (pre-clamp), so recompute and cross-check
        xi, yi = np.nonzero(plan.strided_mask)
        want = set()
        X, Y = plan.slide_dims
        for cx, cy in zip(xi, yi):
            x = min(max(int(cx) * plan.resolution - 64, 0), X - 128)
            y = min(max(int(cy) * plan.resolution - 64, 0), Y - 128)
            want.add((x, y))
        got = set()
        for g in plan.groups:
            for x, y in g.coords[g.valid]:
                got.add((int(x), int(y)))
        assert got == want
        # and the lesion area is covered by at least one patch
        lx, ly = 1024 * 0.32, 768 * 0.45  # fixture lesion center
        assert any(x <= lx < x + 128 and y <= ly < y + 128 for x, y in got)

    def test_roi_masking_off_covers_grid(self, small_slide):
        path, _ = small_slide
        with Slide(path) as s:
            plan_all = plan_patches(s, patch=128, stride=128, batch=8,
                                    supertile=512, roi_masking=False)
            plan_roi = plan_patches(s, patch=128, stride=128, batch=8,
                                    supertile=512, roi_masking=True)
        assert plan_all.total_patches > plan_roi.total_patches


class TestLoader:
    def test_batches_match_direct_reads(self, small_slide):
        path, _ = small_slide
        with Slide(path) as s:
            plan = plan_patches(s, patch=128, stride=128, batch=8, supertile=512)
            seen = 0
            for b in PatchLoader(s, plan, num_workers=4):
                assert b.patches.shape == (8, 128, 128, 3)
                assert b.patches.dtype == np.uint8
                g = plan.groups[b.group_index]
                for i in range(8):
                    if not b.valid[i]:
                        continue
                    x = b.offsets[i, 0] + g.origin[0]
                    y = b.offsets[i, 1] + g.origin[1]
                    direct = np.transpose(
                        s.read_region((int(x), int(y)), 0, (128, 128)), (1, 0, 2))
                    np.testing.assert_array_equal(b.patches[i], direct)
                    seen += 1
            assert seen == plan.total_patches


class TestGetSegmentation:
    def test_oracle_end_to_end(self, small_slide, tmp_path, monkeypatch):
        from digipathai_tpu.engine.segmentation import getSegmentation
        from digipathai_tpu.utils.status import SegmentationStatus

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        path, meta = small_slide
        probs = tmp_path / "s-dgai-probs.tiff"
        mask = tmp_path / "s-dgai-mask.tiff"
        unc = tmp_path / "s-dgai-uncertainty.tiff"
        seen_statuses = []

        class RecordingStatus(SegmentationStatus):
            def __setitem__(self, k, v):
                if k == "status":
                    seen_statuses.append(v)
                super().__setitem__(k, v)

        status = RecordingStatus()

        out = getSegmentation(
            img_path=path, patch_size=128, stride_size=128, batch_size=8,
            quick=True, model="oracle", mode="breast",
            probs_path=str(probs), mask_path=str(mask),
            uncertainty_path=str(unc), status=status,
            supertile=512, num_workers=4)

        # return orientation: (X, Y)
        assert out.shape == (1024, 768)
        assert set(np.unique(out)) <= {0, 255}

        # artifacts exist and are valid pyramids
        for p in (probs, mask, unc):
            assert p.exists()
            with Slide(str(p)) as sp:
                assert sp.dimensions == (1024, 768)

        # thresholded mask recovers the dark lesion
        with Slide(str(mask)) as sm:
            lvl = sm.level_count - 1
            m = sm.read_level(lvl)[:, :, 0] > 127
            ds = 1024 // sm.level_dimensions[lvl][0]
        gt = meta["lesion_mask"][::ds, ::ds][:m.shape[0], :m.shape[1]]
        iou = jaccard(m, gt)
        assert iou > 0.7, f"lesion IoU {iou}"

        # uncertainty of a single deterministic model is ~0
        with Slide(str(unc)) as su:
            u = su.read_level(su.level_count - 1)
            assert u.max() <= 2

        # status wire parity
        assert "Running segmentation" in seen_statuses
        assert "Saving Prediction Mask..." in seen_statuses
        assert "Saving Prediction Uncertanity..." in seen_statuses
        assert status["progress"] == 0  # reference resets to 0 at the end

    def test_bad_mode_raises(self, small_slide):
        from digipathai_tpu.engine.segmentation import getSegmentation

        with pytest.raises(ValueError, match="allowed fields"):
            getSegmentation(img_path=small_slide[0], mode="brain")

    def test_bad_model_raises(self, small_slide, tmp_path, monkeypatch):
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        with pytest.raises(ValueError, match="[Uu]nknown model"):
            getSegmentation(img_path=small_slide[0], quick=True,
                            model="resnet", mode="colon")

    def test_tta_improves_nothing_for_symmetric_oracle(self, small_slide, tmp_path,
                                                       monkeypatch):
        """TTA on a pointwise model must not change the mean map (invariance)."""
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        path, _ = small_slide
        outs = []
        for tta in (None, ["FLIP_LEFT_RIGHT", "ROTATE_90"]):
            out = getSegmentation(
                img_path=path, patch_size=128, stride_size=128, batch_size=8,
                quick=True, model="oracle", mode="breast", tta_list=tta,
                probs_path=str(tmp_path / f"p{len(outs)}.tiff"),
                mask_path=str(tmp_path / f"m{len(outs)}.tiff"),
                uncertainty_path=str(tmp_path / f"u{len(outs)}.tiff"),
                supertile=512, num_workers=2)
            outs.append(np.asarray(out))
        np.testing.assert_array_equal(outs[0], outs[1])
