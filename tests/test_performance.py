"""Performance counter tests: scope timers, summary replay, and XLA
compile attribution (reference src/performance/performance.cpp:44-170).
"""

import time

import jax
import jax.numpy as jnp

from opencalibration_tpu.utils import performance as perf


def setup_function(_fn):
    perf.enable_performance_counters(True)
    perf.reset_performance_counters()


def teardown_function(_fn):
    perf.enable_performance_counters(False)


def test_scope_timer_totals_and_summary():
    with perf.PerformanceMeasure("outer"):
        time.sleep(0.01)
        with perf.PerformanceMeasure("inner"):
            time.sleep(0.01)
    assert perf.get_timer_total("outer") >= 0.02
    assert perf.get_timer_total("inner") >= 0.01
    summary = perf.total_performance_summary()
    assert "outer" in summary and "inner" in summary


def test_measure_reset_rekeys():
    m = perf.PerformanceMeasure("a")
    time.sleep(0.005)
    m.reset("b")
    time.sleep(0.005)
    m._finish()
    assert perf.get_timer_total("a") > 0
    assert perf.get_timer_total("b") > 0


def test_event_counts():
    perf.add_event_count("lm iters", 3)
    perf.add_event_count("lm iters", 2)
    assert perf.get_event_count("lm iters") == 5


def test_compile_attribution_by_scope():
    """Backend compiles are charged to the active compile scope, so
    counter tables show which pipeline state recompiled."""
    perf.track_compiles()
    perf.set_compile_scope("STATE_A")

    f = jax.jit(lambda x: x * 2 + 1)

    f(jnp.ones(7)).block_until_ready()
    a_count = perf._counts.get("xla compiles @ STATE_A", 0)
    assert a_count >= 1

    perf.set_compile_scope("STATE_B")
    f(jnp.ones(13)).block_until_ready()  # new shape -> recompile
    assert perf._counts.get("xla compiles @ STATE_B", 0) >= 1
    # cached shape -> no new compile charged anywhere
    before = dict(perf._counts)
    f(jnp.ones(7)).block_until_ready()
    assert perf._counts.get("xla compiles @ STATE_B", 0) == before.get(
        "xla compiles @ STATE_B", 0
    )
    summary = perf.total_performance_summary()
    assert "xla compiles @ STATE_A" in summary
