"""Tracing, profiling and metrics logging.

The reference's observability is tqdm + print + a STATS defaultdict
(reference ``no_limits_2_5d.py:63,85-91``; SURVEY.md section 5.1/5.5).  TPU
equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` traces (viewable
  in XProf/TensorBoard);
* :class:`MetricsLogger` — appends step metrics as JSON lines;
* :func:`throughput` — walltime -> grid-points/s accounting.
"""

import contextlib
import json
import time


@contextlib.contextmanager
def trace(logdir="/tmp/gcmiipy_tpu_trace"):
    """Capture a jax.profiler trace around a block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """JSON-lines metrics sink (the STATS defaultdict, durable)."""

    def __init__(self, path=None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.history = []

    def log(self, step, **metrics):
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in metrics.items()}}
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def throughput(points, seconds):
    """Grid-point updates per second."""
    return points / seconds if seconds > 0 else float("inf")


class StepTimer:
    """Walltime per step with warmup discard."""

    def __init__(self, skip=1):
        self.skip = skip
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.skip > 0:
            self.skip -= 1
        else:
            self.times.append(dt)
        return False

    @property
    def mean(self):
        return sum(self.times) / len(self.times) if self.times else float("nan")
