"""utils layer tests: timing, metering, metrics log, debugging."""

import json
import time

import jax.numpy as jnp
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.utils import (MetricsLogger, StepTimer,
                                                  ThroughputMeter,
                                                  assert_all_finite,
                                                  count_nonfinite,
                                                  debug_nans)


def test_step_timer_spans_and_stamps(capsys):
    t = StepTimer(echo=True)
    t.log_step("epoch_start")
    with t.span("work"):
        time.sleep(0.01)
    assert "epoch_start" in t.stamps
    assert t.durations["work"] >= 0.01
    out = capsys.readouterr().out
    assert "[step] epoch_start" in out and "[span] work" in out


def test_throughput_meter():
    m = ThroughputMeter(window=10, num_chips=2)
    assert m.tick(100) is None
    time.sleep(0.01)
    rate = m.tick(100)
    assert rate is not None and rate > 0
    # pairs/sec/chip: divided by 2 chips
    r = m.report()
    assert r["num_chips"] == 2 and r["pairs_per_sec_per_chip"] > 0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path, echo=False)
    log.log(1, loss=1.5, note="x")
    log.log(2, loss=jnp.asarray(0.5))
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["loss"] == 0.5


def test_assert_all_finite():
    assert_all_finite({"a": np.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        assert_all_finite({"a": np.array([1.0, np.nan])})


def test_count_nonfinite():
    tree = {"a": jnp.asarray([1.0, jnp.inf]), "b": jnp.asarray([1, 2]),
            "c": jnp.asarray([jnp.nan])}
    assert int(count_nonfinite(tree)) == 2


def test_debug_nans_context():
    with debug_nans(True):
        with pytest.raises(FloatingPointError):
            _ = jnp.log(jnp.asarray(-1.0)) + 1
    # restored
    _ = jnp.log(jnp.asarray(-1.0)) + 1


def test_trace_report_classify():
    """perf/trace_report.py collapses HLO op names to fusion-class stems."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "trace_report", os.path.join(os.path.dirname(__file__), "..",
                                     "perf", "trace_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.classify("fusion.123") == "fusion"
    assert mod.classify("%convolution_add_fusion.5") == \
        "convolution_add_fusion"
    assert mod.classify("copy-done.77") == "copy-done"
    assert mod.classify("while") == "while"
    assert mod.classify("jit_train_step (args)") == "jit_train_step"


def test_persistent_compilation_cache_toggle(tmp_path, monkeypatch):
    """core.xla_flags.enable_persistent_compilation_cache honors
    CFA_COMPILE_CACHE: '0' leaves the config untouched, a path relocates
    the cache dir (the remote-compile service costs ~6 min/program in
    this deployment; the cache is the cross-process reuse layer)."""
    import jax

    from clip_finegrained_alignment_tpu.core.xla_flags import \
        enable_persistent_compilation_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("CFA_COMPILE_CACHE", "0")
        jax.config.update("jax_compilation_cache_dir", None)
        enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None

        monkeypatch.setenv("CFA_COMPILE_CACHE", str(tmp_path / "cc"))
        enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
