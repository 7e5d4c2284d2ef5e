"""Profiling helpers: timers and throughput report shapes."""
import time

from subword_tokenizers_tpu.benchmarks.profiling import (StepTimer,
                                                         throughput_report)


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0.01
    assert rep["b"]["count"] == 1


def test_throughput_report():
    rep = throughput_report(2_000_000, 500_000, 2.0, n_chips=2,
                            label="x")
    assert rep["MBps"] == 1.0
    assert rep["MBps_per_chip"] == 0.5
    assert rep["tokens_per_s"] == 250_000
    assert rep["label"] == "x"
