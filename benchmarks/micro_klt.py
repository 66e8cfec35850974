"""Bisect pyramidal_klt cost on TPU: which part of the real kernel is slow."""

from __future__ import annotations

import time

import numpy as np
import os, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.ops.klt import pyramidal_klt, _track_level
from lcvo_tpu.ops.pyramid import build_pyramid
from lcvo_tpu.ops.interp import extract_blocks, sample_blocks_bilinear

N = 2560
W_IMG, H_IMG = 1240, 376
WIN = 21
ITERS = 10


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
pts = jnp.asarray(rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32)

pyr0 = build_pyramid(img0, 3)
pyr1 = build_pyramid(img1, 3)

f_full = jax.jit(lambda a, b, p: pyramidal_klt(a, b, p, window=WIN, iters=ITERS))
timeit("pyramidal_klt L=3 it=10", f_full, pyr0, pyr1, pts)

f_l0 = jax.jit(
    lambda a, b, p: _track_level(a, b, p, jnp.zeros_like(p), WIN, ITERS, 0.01)
)
timeit("_track_level level0 only it=10", f_l0, img0, img1, pts)
timeit("_track_level level2 only it=10",
       jax.jit(lambda a, b, p: _track_level(a, b, p, jnp.zeros_like(p), WIN, ITERS, 0.01)),
       pyr0[2], pyr1[2], pts * 0.25)

f_l0_1 = jax.jit(lambda a, b, p: _track_level(a, b, p, jnp.zeros_like(p), WIN, 1, 0.01))
timeit("_track_level level0 it=1", f_l0_1, img0, img1, pts)

f_l0_0 = jax.jit(lambda a, b, p: _track_level(a, b, p, jnp.zeros_like(p), WIN, 0, 0.01))
timeit("_track_level level0 it=0 (template only)", f_l0_0, img0, img1, pts)
