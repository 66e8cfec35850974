"""Microbench: patch-sampling strategies for KLT on TPU (the measurement that
selected the production formulation -- strategy C won; kept as provenance).

Variants:
  A. current: per-iter vmapped dynamic_slice from full image + static-shift bilinear
  B. per-level block extract (vmapped dynamic_slice, once) + per-iter dynamic_slice
     within the (N,S,S) blocks
  C. per-level block extract + per-iter einsum sampling (interp-matrix matmuls)
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 2560
W_IMG, H_IMG = 1240, 376
WIN = 21
ITERS = 10
MARGIN = 9
S = WIN + 2 * MARGIN + 2  # block size: window + wander margin + bilinear apron


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
pts = jnp.asarray(rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32)


# ---- A: current formulation --------------------------------------------------
from lcvo_tpu.ops.interp import extract_blocks, sample_blocks_bilinear


def variant_a(img, pts):
    def body(i, d):
        q = pts + d
        qf = jnp.floor(q)
        origins = (qf - (WIN - 1) // 2 - 1).astype(jnp.int32)
        blocks = extract_blocks(img, origins, WIN + 2)
        patch = sample_blocks_bilinear(blocks, q - qf, WIN)
        return d + 1e-6 * jnp.mean(patch, axis=(1, 2))[:, None]
    d = jnp.zeros((N, 2))
    return lax.fori_loop(0, ITERS, body, d)


# ---- B: block-once + per-iter dynamic_slice in blocks ------------------------
def variant_b(img, pts):
    qf0 = jnp.floor(pts)
    origins = (qf0 - (S - 1) // 2).astype(jnp.int32)
    blocks = jax.vmap(lambda o: lax.dynamic_slice(img, (o[1], o[0]), (S, S)))(origins)
    base = qf0 - origins  # center position within block (float)

    def body(i, d):
        q = base + (pts - qf0) + d  # position in block coords
        qf = jnp.floor(q)
        oo = (qf - (WIN - 1) // 2 - 1).astype(jnp.int32)
        sub = jax.vmap(lambda b, o: lax.dynamic_slice(b, (o[1], o[0]), (WIN + 2, WIN + 2)))(blocks, oo)
        patch = sample_blocks_bilinear(sub, q - qf, WIN)
        return d + 1e-6 * jnp.mean(patch, axis=(1, 2))[:, None]
    d = jnp.zeros((N, 2))
    return lax.fori_loop(0, ITERS, body, d)


# ---- C: block-once + einsum interpolation sampling ---------------------------
def interp_matrix(off, w, s):
    """(N, w, s) interpolation matrix: row i has (1-f) at floor(off)+i, f at +1."""
    i0 = jnp.floor(off)  # (N,)
    f = (off - i0)[:, None, None]
    rows = i0[:, None] + jnp.arange(w)[None, :]  # (N, w)
    cols = jnp.arange(s)[None, None, :]
    eq0 = (cols == rows[:, :, None]).astype(jnp.float32)
    eq1 = (cols == (rows[:, :, None] + 1)).astype(jnp.float32)
    return eq0 * (1 - f) + eq1 * f


def variant_c(img, pts):
    qf0 = jnp.floor(pts)
    origins = (qf0 - (S - 1) // 2).astype(jnp.int32)
    blocks = jax.vmap(lambda o: lax.dynamic_slice(img, (o[1], o[0]), (S, S)))(origins)
    base = qf0 - origins

    def body(i, d):
        q = base + (pts - qf0) + d
        r = (WIN - 1) // 2
        Ry = interp_matrix(q[:, 1] - r, WIN, S)
        Cx = interp_matrix(q[:, 0] - r, WIN, S)
        patch = jnp.einsum("nws,nst,nvt->nwv", Ry, blocks, Cx)
        return d + 1e-6 * jnp.mean(patch, axis=(1, 2))[:, None]
    d = jnp.zeros((N, 2))
    return lax.fori_loop(0, ITERS, body, d)


def variant_c_bf16(img, pts):
    qf0 = jnp.floor(pts)
    origins = (qf0 - (S - 1) // 2).astype(jnp.int32)
    blocks = jax.vmap(lambda o: lax.dynamic_slice(img, (o[1], o[0]), (S, S)))(origins).astype(jnp.bfloat16)
    base = qf0 - origins

    def body(i, d):
        q = base + (pts - qf0) + d
        r = (WIN - 1) // 2
        Ry = interp_matrix(q[:, 1] - r, WIN, S).astype(jnp.bfloat16)
        Cx = interp_matrix(q[:, 0] - r, WIN, S).astype(jnp.bfloat16)
        patch = jnp.einsum("nws,nst,nvt->nwv", Ry, blocks, Cx)
        return d + 1e-6 * jnp.mean(patch, axis=(1, 2))[:, None].astype(jnp.float32)
    d = jnp.zeros((N, 2))
    return lax.fori_loop(0, ITERS, body, d)


if __name__ == "__main__":
    timeit("A: per-iter image dynamic_slice", jax.jit(variant_a), img, pts)
    timeit("B: block-once + in-block dynamic_slice", jax.jit(variant_b), img, pts)
    timeit(f"C: block-once + einsum interp (S={S})", jax.jit(variant_c), img, pts)
    timeit("C(bf16 matmuls)", jax.jit(variant_c_bf16), img, pts)
    # block extraction alone
    def extract_only(img, pts):
        origins = (jnp.floor(pts) - (S - 1) // 2).astype(jnp.int32)
        return jax.vmap(lambda o: lax.dynamic_slice(img, (o[1], o[0]), (S, S)))(origins)
    timeit("block extraction alone (N dyn slices)", jax.jit(extract_only), img, pts)
