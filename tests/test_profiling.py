"""Tests for the tracing/profiling subsystem (SURVEY §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.utils import profiling


def test_stage_timer_measures():
    timer = profiling.StageTimer(warmup=1, iters=3)
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    dt = timer.measure("matmul", f, x)
    assert dt > 0
    assert "matmul" in timer.results
    rep = timer.report()
    assert "matmul" in rep and "total" in rep


def test_cost_analysis_flops():
    def f(a, b):
        return a @ b

    a = jnp.ones((128, 128))
    b = jnp.ones((128, 128))
    ca = profiling.cost_analysis(f, a, b)
    # CPU backend exposes flops; 2*N^3 for the matmul
    if ca:
        assert ca.get("flops", 0) >= 2 * 128**3 * 0.5


def test_trace_capture(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        with profiling.annotate("span"):
            jax.block_until_ready(jnp.ones((8, 8)) * 2)
    # trace writes a plugins/profile dir with at least one file
    found = []
    for root, _dirs, files in os.walk(d):
        found += files
    assert found, "profiler trace produced no files"
