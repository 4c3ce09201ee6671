"""Restartable stitching: interrupted runs resume without redoing work."""

import json

import numpy as np
import pytest


class TestResume:
    def _run(self, path, tmp_path, resume, interrupt_after=None, tag="r"):
        from digipathai_tpu.engine.segmentation import getSegmentation

        calls = {"n": 0}

        def cb(done, total):
            calls["n"] = done
            if interrupt_after is not None and done >= interrupt_after:
                raise KeyboardInterrupt

        try:
            out = getSegmentation(
                img_path=path, patch_size=128, stride_size=64, batch_size=4,
                quick=True, model="oracle", mode="breast",
                probs_path=str(tmp_path / f"{tag}p.tiff"),
                mask_path=str(tmp_path / f"{tag}m.tiff"),
                uncertainty_path=str(tmp_path / f"{tag}u.tiff"),
                supertile=256, num_workers=2, data_parallel=False,
                resume=resume, progress_cb=cb)
            return out, calls["n"]
        except KeyboardInterrupt:
            return None, calls["n"]

    def test_resume_after_interrupt_matches_clean_run(self, tmp_path, monkeypatch):
        from tests.fixtures import make_synthetic_slide

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "res-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=31)

        # clean reference run
        ref, total = self._run(p, tmp_path, resume=False, tag="a")
        assert ref is not None and total > 4

        # interrupted run, then resume
        out, n1 = self._run(p, tmp_path, resume=False,
                            interrupt_after=total // 2, tag="b")
        assert out is None
        out2, n2 = self._run(p, tmp_path, resume=True, tag="b")
        assert out2 is not None
        # resume skipped completed supertiles: fewer new batches than total
        state = json.loads(
            next((tmp_path / "cache").glob("memmaps/*-stitch.json")).read_text())
        assert state["completed"]
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))

    def test_resume_after_complete_run_does_not_refinalize(self, tmp_path,
                                                           monkeypatch):
        """Regression: finalize is non-idempotent (mean /= count); resuming a
        COMPLETED run must not divide the maps again (probs would shrink and
        the thresholded mask would collapse)."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.io.slide import Slide

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "ref-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=33)
        out1, _ = self._run(p, tmp_path, resume=False, tag="c")
        with Slide(str(tmp_path / "cp.tiff")) as s:
            probs1 = s.read_level(s.level_count - 1)[:, :, 0].copy()
        out2, _ = self._run(p, tmp_path, resume=True, tag="c")
        with Slide(str(tmp_path / "cp.tiff")) as s:
            probs2 = s.read_level(s.level_count - 1)[:, :, 0].copy()
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        np.testing.assert_array_equal(probs1, probs2)

    def test_inflight_taint_discards_resume_state(self, tmp_path, monkeypatch):
        """A crash between the inflight marker and completion means the maps
        hold unrepeatable partial += writes: resume must restart from scratch
        (and still produce the right answer) instead of double-adding."""
        from tests.fixtures import make_synthetic_slide

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "taint-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=34)
        ref, total = self._run(p, tmp_path, resume=False, tag="t")
        out, _ = self._run(p, tmp_path, resume=False,
                           interrupt_after=total // 2, tag="t")
        assert out is None
        state_path = next((tmp_path / "cache").glob("memmaps/*-stitch.json"))
        state = json.loads(state_path.read_text())
        assert state["completed"]
        state["inflight"] = [state["completed"][0]]  # simulate mid-flush crash
        state_path.write_text(json.dumps(state))
        out2, n2 = self._run(p, tmp_path, resume=True, tag="t")
        assert out2 is not None
        assert n2 >= total  # tainted state discarded -> full rerun
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))

    def test_same_basename_different_dirs_do_not_clobber(self, tmp_path,
                                                         monkeypatch):
        from tests.fixtures import make_synthetic_slide

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        pa = str(tmp_path / "a" / "slide.tiff")
        pb = str(tmp_path / "b" / "slide.tiff")
        make_synthetic_slide(pa, 512, 512, seed=35)
        make_synthetic_slide(pb, 512, 512, seed=36)
        self._run(pa, tmp_path, resume=False, tag="da")
        self._run(pb, tmp_path, resume=False, tag="db")
        states = list((tmp_path / "cache").glob("memmaps/*-stitch.json"))
        assert len(states) == 2  # distinct state per path despite same stem

    def test_config_change_invalidates_state(self, tmp_path, monkeypatch):
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "cfg-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=32)
        kw = dict(img_path=p, patch_size=128, batch_size=4, quick=True,
                  model="oracle", mode="breast",
                  probs_path=str(tmp_path / "p.tiff"),
                  mask_path=str(tmp_path / "m.tiff"),
                  uncertainty_path=str(tmp_path / "u.tiff"),
                  supertile=256, num_workers=2, data_parallel=False)
        getSegmentation(stride_size=128, **kw)
        # different stride -> state invalid -> full rerun, still correct
        out = getSegmentation(stride_size=64, resume=True, **kw)
        assert set(np.unique(np.asarray(out))) <= {0, 255}

    def test_crf_knob_change_invalidates_state(self, tmp_path, monkeypatch):
        """cfg_key covers the crf knob: resuming a run with crf flipped must
        not reuse the old maps (tile mode refines tiles in place at flush, so
        a stale resume would silently mix refined and raw tiles)."""
        from tests.fixtures import make_synthetic_slide
        from digipathai_tpu.engine.segmentation import getSegmentation

        monkeypatch.setenv("DPAI_OFFLINE", "1")
        monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
        p = str(tmp_path / "crfk-slide.tiff")
        make_synthetic_slide(p, 512, 512, seed=37)
        kw = dict(img_path=p, patch_size=128, stride_size=128, batch_size=4,
                  quick=True, model="oracle", mode="breast",
                  probs_path=str(tmp_path / "p.tiff"),
                  mask_path=str(tmp_path / "m.tiff"),
                  uncertainty_path=str(tmp_path / "u.tiff"),
                  supertile=256, num_workers=2, data_parallel=False)
        calls = {"n": 0}

        def cb(done, total):
            calls["n"] = done

        getSegmentation(crf=False, **kw)
        getSegmentation(crf=True, resume=True, progress_cb=cb, **kw)
        assert calls["n"] > 0  # state invalidated -> inference actually reran
