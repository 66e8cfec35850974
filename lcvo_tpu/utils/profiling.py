"""Tracing / profiling subsystem (SURVEY §5, first bullet).

The reference has no observability beyond ``print`` statements scattered through its
frame loop (reference ``src/main.py:214,231-237``, ``src/vo_pipeline.py:267-272``);
its report identifies the SIFT bottleneck by reasoning, not measurement. Here
profiling is first-class:

- :func:`trace` — context manager capturing a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto) around any region, e.g. N steps of the jitted frame loop.
- :class:`StageTimer` — steady-state wall timing of jitted callables with warmup and
  device synchronization, for per-stage budgets (used by benchmarks/profile_stages.py).
- :func:`cost_analysis` — XLA compiled-cost dump (FLOPs, HBM bytes accessed) per
  jitted function, the per-kernel "speed-of-light" denominator.
- :func:`annotate` — named trace spans (``jax.profiler.TraceAnnotation``) so host-side
  stages (decode, H2D) show up alongside device ops in the timeline.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the trace timeline (host + device correlation)."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StageTimer:
    """Steady-state timing of jitted callables: warmup (compile) excluded, device
    work fenced with ``block_until_ready``. Accumulates named results."""

    warmup: int = 2
    iters: int = 20
    results: dict = field(default_factory=dict)

    def measure(self, name: str, fn, *args, **kw) -> float:
        for _ in range(self.warmup):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / self.iters
        self.results[name] = dt
        return dt

    def report(self) -> str:
        total = sum(self.results.values())
        lines = [f"{k:32s} {v * 1e3:9.3f} ms  {100 * v / total:5.1f}%" for k, v in self.results.items()]
        lines.append(f"{'total':32s} {total * 1e3:9.3f} ms")
        return "\n".join(lines)


def cost_analysis(fn, *args, **kw) -> dict:
    """FLOPs / bytes-accessed estimate of the compiled executable for ``fn(*args)``.

    Returns {} when the backend does not expose cost analysis (some CPU builds).
    """
    lowered = jax.jit(fn).lower(*args, **kw)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
    except Exception:  # pragma: no cover - backend without cost analysis
        return {}
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def flops_summary(fn, *args, **kw) -> str:
    ca = cost_analysis(fn, *args, **kw)
    fl = ca.get("flops", float("nan"))
    by = ca.get("bytes accessed", float("nan"))
    return f"flops={fl:.3e} bytes={by:.3e} arithmetic_intensity={fl / by if by else float('nan'):.2f}"
