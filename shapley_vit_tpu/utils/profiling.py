"""Tracing / profiling — first-class, replacing the reference's ad-hoc
``time.time()`` spans and tqdm bars (SURVEY.md §5: Wolfram solve timer at
compared_methods.py:174-182, per-round timing in comfedsv, cent_sgd
wall-clock).

Two layers:
  * :func:`trace` — ``jax.profiler`` device traces (TensorBoard-compatible)
    around a Shapley round or any block;
  * :class:`StepTimer` — lightweight wall-clock spans with named counters,
    summarized into a metrics dict (feeds CSVLogger.scalar_summary).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str], enabled: bool = True):
    """Device trace context: ``with trace('exp/profile'):`` captures a
    TensorBoard trace of everything dispatched inside. No-op when disabled
    or log_dir is None."""
    if not enabled or not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def process_rss_mb() -> float:
    """Resident set size of this process in MB (0.0 where /proc is absent).
    The service exports it per round (``health/rss_mb``): the round-4 soak
    caught a ~20 MB/round native leak only because RSS was being sampled —
    production gets the same signal for free."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


class StepTimer:
    """Named wall-clock spans with running stats.

    >>> t = StepTimer()
    >>> with t.span("coalition_eval"):
    ...     ...
    >>> t.summary()["coalition_eval"]["mean_s"]
    """

    def __init__(self):
        self._spans: Dict[str, list] = defaultdict(list)
        self._counters: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def span(self, name: str, block_on=None):
        """Time a block; pass jax arrays via ``block_on`` to include device
        completion (otherwise async dispatch makes spans meaningless)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self._spans[name].append(time.perf_counter() - t0)

    def count(self, name: str, value: float = 1.0):
        self._counters[name] += value

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self._spans.items():
            out[name] = {
                "count": len(times),
                "total_s": sum(times),
                "mean_s": sum(times) / len(times),
                "max_s": max(times),
            }
        for name, value in self._counters.items():
            out[name] = {"count": value}
        return out

    def throughput(self, span_name: str, units: float) -> float:
        """units processed per second over a span's total time."""
        total = sum(self._spans[span_name])
        return units / total if total > 0 else 0.0

    def log_to(self, csv_logger, step: int) -> None:
        """Emit every span mean into a CSVLogger metrics stream."""
        for name, stats in self.summary().items():
            if "mean_s" in stats:
                csv_logger.scalar_summary(f"time/{name}", stats["mean_s"], step)
