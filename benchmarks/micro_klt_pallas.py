"""Decision benchmark (VERDICT r1 #4): the full in-kernel Pallas LK tracker
(`pyramidal_klt_pallas`) vs the production block-extraction einsum tracker
(`pyramidal_klt`) at the pipeline's operating points, on the real chip.

Timing fences with a host read of a value data-dependent on the outputs — the
axon tunnel's block_until_ready does not wait for remote completion (BASELINE.md).
"""

from __future__ import annotations

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.klt_pallas import pyramidal_klt_pallas
from lcvo_tpu.ops.pyramid import build_pyramid

W_IMG, H_IMG = 1240, 376


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _ = float(np.asarray(out[0]).sum())  # host-read fence (compile + warm)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(np.asarray(out[0]).sum())
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
    pyr0 = build_pyramid(img0, 3)
    pyr1 = build_pyramid(img1, 3)

    results = {}
    for N in (512, 2048):
        pts = jnp.asarray(
            rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32
        )
        for win, iters in ((15, 6), (21, 10)):
            fx = jax.jit(lambda a, b, p, w=win, it=iters: pyramidal_klt(a, b, p, window=w, iters=it))
            fp = jax.jit(lambda a, b, p, w=win, it=iters: pyramidal_klt_pallas(a, b, p, window=w, iters=it))
            tx = timeit(f"einsum  N={N} win={win} iters={iters}", fx, pyr0, pyr1, pts)
            tp = timeit(f"pallas  N={N} win={win} iters={iters}", fp, pyr0, pyr1, pts)
            results[(N, win, iters)] = (tx, tp)
    print("\nsummary (einsum_ms, pallas_ms, pallas/einsum):")
    for k, (tx, tp) in results.items():
        print(f"  N={k[0]:5d} win={k[1]:2d} it={k[2]:2d}: {tx:7.2f} {tp:7.2f} {tp/tx:5.2f}x")


if __name__ == "__main__":
    main()
