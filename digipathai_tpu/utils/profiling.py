"""Stage timers and profiler hooks.

The reference's only observability is a tqdm bar and prints (SURVEY.md §5).
Here every engine run produces a stage-timing breakdown (plan / load / infer
/ flush / finalize / write), surfaced via the status channel
(``status['timings']``) and optionally as a ``jax.profiler`` trace
(``DPAI_PROFILE_DIR`` env var -> TensorBoard trace of the device steps).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0 = time.time()

    @contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        out = {k: round(v, 3) for k, v in sorted(self.totals.items())}
        out["total"] = round(time.time() - self._t0, 3)
        return out


@contextmanager
def maybe_profile(name: str = "dpai"):
    """jax.profiler trace when DPAI_PROFILE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("DPAI_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
