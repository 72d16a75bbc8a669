"""Tracing, step timing, and throughput metering.

Replaces the reference's ``DistributedLogger`` — a dict of named
``time.time()`` stamps printed on rank 0 with forced flushes
(``/root/reference/finetune/dist_finetuner.py:27-39``, bracketing the risky
collectives at :222,252,254,258,274) — with the TPU-native equivalents:

* ``StepTimer``: named wall-clock spans that *also* emit
  ``jax.profiler.TraceAnnotation``s, so the same names appear on the
  Perfetto timeline when a profile is captured.
* ``ThroughputMeter``: pairs/sec/chip (the BASELINE.json metric) with
  rolling statistics.
* ``trace_capture``: context manager around
  ``jax.profiler.start_trace/stop_trace`` for on-demand Perfetto dumps.

Process-0 gating replaces rank-0 gating (``jax.process_index()``).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import deque
from typing import Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


class StepTimer:
    """Named step timestamps + profiler annotations.

    >>> timer = StepTimer()
    >>> with timer.span("all_gather"):
    ...     ...
    >>> timer.log_step("epoch_start")          # point-in-time stamp
    """

    def __init__(self, echo: bool = True):
        self.stamps: Dict[str, float] = {}
        self.durations: Dict[str, float] = {}
        self.echo = echo

    def log_step(self, name: str) -> None:
        """Point stamp (the reference's ``log_step``,
        dist_finetuner.py:31-39)."""
        t = time.time()
        self.stamps[name] = t
        if self.echo and is_main_process():
            print(f"[step] {name}: {t:.3f}", flush=True)

    @contextlib.contextmanager
    def span(self, name: str):
        """Timed span, visible both in stdout and on the device timeline."""
        start = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.durations[name] = time.perf_counter() - start
        if self.echo and is_main_process():
            print(f"[span] {name}: {self.durations[name] * 1e3:.1f} ms",
                  flush=True)


class ThroughputMeter:
    """Rolling pairs/sec/chip metering (the BASELINE metric)."""

    def __init__(self, window: int = 50, num_chips: Optional[int] = None):
        self.window = deque(maxlen=window)
        self.num_chips = num_chips or jax.device_count()
        self._last: Optional[float] = None

    def tick(self, num_pairs: int) -> Optional[float]:
        """Call once per step with the global pair count; returns current
        pairs/sec/chip (None on the first tick)."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self.window.append(num_pairs / dt / self.num_chips)
        return self.window[-1]

    @property
    def mean(self) -> float:
        return sum(self.window) / len(self.window) if self.window else 0.0

    def report(self) -> Dict[str, float]:
        return {"pairs_per_sec_per_chip": self.mean,
                "num_chips": self.num_chips,
                "window": len(self.window)}


@contextlib.contextmanager
def trace_capture(logdir: str):
    """Perfetto/TensorBoard trace of the enclosed block
    (``jax.profiler`` — the torch-profiler-shaped hole in the reference,
    SURVEY.md §5)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL metrics stream (the reference's print-based loss logging,
    structured)."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path and is_main_process() else None

    def log(self, step: int, **metrics) -> None:
        if not is_main_process():
            return
        rec = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                else v) for k, v in metrics.items()}}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo:
            parts = " ".join(f"{k}={v:.4g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in rec.items()
                             if k != "time")
            print(parts, file=sys.stderr, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
