"""Persistent TPU job runner (dev tool).

The axon-tunneled TPU pays a ~200 s compiler warmup for the FIRST jit compile of
each process (see .claude/skills/verify/SKILL.md). This worker keeps one live
process: it polls ``benchmarks/.jobs/*.py``, executes each job in-process (sharing
the warmed-up backend and jit caches), and writes stdout+traceback to ``<job>.out``
with a trailing ``[job done]`` / ``[job failed]`` marker.

Usage:  python benchmarks/tpu_worker.py  (run in background)
        write a job:  benchmarks/.jobs/myjob.py  -> read benchmarks/.jobs/myjob.out
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = os.path.join(os.path.dirname(__file__), ".jobs")
os.makedirs(JOBS, exist_ok=True)


def main():
    import jax  # warm up backend once

    jax.devices()
    print("worker ready", flush=True)
    seen = set()
    while True:
        for name in sorted(os.listdir(JOBS)):
            if not name.endswith(".py") or name in seen:
                continue
            seen.add(name)
            path = os.path.join(JOBS, name)
            out_path = path[:-3] + ".out"
            buf = io.StringIO()
            status = "[job done]"
            t0 = time.perf_counter()
            try:
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    src = open(path).read()
                    exec(compile(src, path, "exec"), {"__name__": "__job__"})
            except BaseException:
                buf.write(traceback.format_exc())
                status = "[job failed]"
            buf.write(f"\n{status} in {time.perf_counter() - t0:.1f}s\n")
            with open(out_path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: {status}", flush=True)
        time.sleep(2)


if __name__ == "__main__":
    main()
