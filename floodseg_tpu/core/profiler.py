"""Named-phase wall-clock profiler.

Equivalent of the reference's Lightning simple profiler regions
(predict_interference / predict_encoder / predict_warp / ... —
/root/reference/flow/model.py:119-176, flow/base.py:269-328), which is how
the paper's FPS numbers are measured. Durations are wall-clock around
``jax.block_until_ready``-bounded regions; also exposes jax.profiler trace
capture for deep dives.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class PhaseProfiler:
    def __init__(self, sync=None):
        """sync: optional callable run before reading the clock at region end
        (e.g. lambda: jax.block_until_ready(x) or jax.effects_barrier)."""
        self.recorded_durations: Dict[str, List[float]] = defaultdict(list)
        self._sync = sync

    @contextlib.contextmanager
    def profile(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self._sync is not None:
                self._sync()
            self.recorded_durations[name].append(time.perf_counter() - start)

    def mean(self, name: str) -> float:
        d = self.recorded_durations.get(name, [])
        return float(np.mean(d)) if d else 0.0

    def sum(self, name: str) -> float:
        return float(np.sum(self.recorded_durations.get(name, [])))

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"mean": float(np.mean(v)), "sum": float(np.sum(v)), "count": len(v)}
            for k, v in self.recorded_durations.items()
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace capture (view with xprof/tensorboard)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
