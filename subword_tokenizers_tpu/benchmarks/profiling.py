"""Profiling / tracing hooks (SURVEY.md §5: the reference only has
wall-clock timers; here we add structured timing and XLA traces).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the device work inside the block.
- :class:`StepTimer` — lightweight per-phase wall-clock accumulator used
  by benchmark scripts; emits a structured dict (JSON-ready).
- :func:`throughput_report` — canonical bytes/s / tokens/s summary in the
  shape BASELINE.md uses (MB/s per chip is the primary metric).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace of the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates wall time per named phase.

    >>> t = StepTimer()
    >>> with t.phase("select"):
    ...     ...
    >>> t.report()["select"]["total_s"]
    """

    def __init__(self) -> None:
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self._total[name],
                "count": self._count[name],
                "mean_s": self._total[name] / max(self._count[name], 1),
            }
            for name in self._total
        }


def throughput_report(n_bytes: int, n_tokens: int, seconds: float,
                      n_chips: int = 1,
                      label: Optional[str] = None) -> Dict[str, float]:
    """Primary throughput metrics (BASELINE.json: MB/s per chip)."""
    seconds = max(seconds, 1e-12)
    rep = {
        "bytes": n_bytes,
        "tokens": n_tokens,
        "seconds": seconds,
        "MBps": n_bytes / seconds / 1e6,
        "MBps_per_chip": n_bytes / seconds / 1e6 / max(n_chips, 1),
        "tokens_per_s": n_tokens / seconds,
    }
    if label is not None:
        rep["label"] = label
    return rep
