"""Micro-benchmark of the Pallas block-extraction kernel vs the portable XLA
gather, plus the production KLT at its operating points.

Decision record (VERDICT r1 #4, measured 2026-08-19 on v5e): a full in-kernel
Pallas IC-LK tracker (template + Hessian + iteration fori_loop per track, serial
per program) was benchmarked against the block-extraction einsum tracker and lost
at every operating point — 3.0-4.6x slower:

    N=  512 win=15 it= 6: einsum  2.27 ms   pallas  6.89 ms  (3.03x)
    N=  512 win=21 it=10: einsum  3.01 ms   pallas 10.25 ms  (3.41x)
    N= 2048 win=15 it= 6: einsum  5.13 ms   pallas 23.39 ms  (4.56x)
    N= 2048 win=21 it=10: einsum  8.37 ms   pallas 36.53 ms  (4.36x)

The serial per-track scalar flow control starves the VPU; the einsum formulation
keeps the whole track batch on the MXU. The in-kernel tracker was deleted
(lcvo_tpu/ops/klt_pallas.py keeps only the extraction kernel, which production
uses via klt._extract_blocks).

Timing fences with a host read — the axon tunnel's block_until_ready does not
wait for remote completion (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.klt_pallas import extract_blocks_pallas
from lcvo_tpu.ops.pyramid import build_pyramid

W_IMG, H_IMG = 1240, 376


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
    pyr0 = build_pyramid(img0, 3)
    pyr1 = build_pyramid(img1, 3)

    S = 31
    for N in (512, 2048):
        centers = jnp.asarray(
            rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32
        )
        f_pal = jax.jit(lambda im, c: extract_blocks_pallas(im, c, S))

        def xla_extract(im, c):
            want = jnp.floor(c) - (S - 1) // 2
            ox = jnp.clip(want[:, 0], 0, W_IMG - S).astype(jnp.int32)
            oy = jnp.clip(want[:, 1], 0, H_IMG - S).astype(jnp.int32)
            blocks = jax.vmap(lambda y, x: lax.dynamic_slice(im, (y, x), (S, S)))(oy, ox)
            return blocks, jnp.stack([ox, oy], -1)

        f_xla = jax.jit(xla_extract)
        timeit(f"extract_blocks pallas  N={N} S={S}", f_pal, img0, centers)
        timeit(f"extract_blocks XLA     N={N} S={S}", f_xla, img0, centers)

    for N in (512, 2048):
        pts = jnp.asarray(
            rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32
        )
        for win, iters in ((15, 6), (21, 10)):
            fx = jax.jit(lambda a, b, p, w=win, it=iters: pyramidal_klt(a, b, p, window=w, iters=it))
            timeit(f"pyramidal_klt N={N} win={win} iters={iters}", fx, pyr0, pyr1, pts)


if __name__ == "__main__":
    main()
