"""Morph the cheap microbench into the real _track_level math to find the cost cliff."""

from __future__ import annotations

import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.ops.interp import extract_blocks, sample_blocks_bilinear

N = 2560
W_IMG, H_IMG = 1240, 376
WIN = 21
ITERS = 10
R_ = (WIN - 1) // 2


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 255, (H_IMG, W_IMG)), jnp.float32)
pts = jnp.asarray(rng.uniform([30, 30], [W_IMG - 30, H_IMG - 30], (N, 2)), jnp.float32)


def template(img, pts):
    """Template + gradients + Hessian, as the real kernel does (minus pad)."""
    qf = jnp.floor(pts)
    o_t = (qf - R_ - 2).astype(jnp.int32)
    blocks_t = extract_blocks(img, o_t, WIN + 4)
    T23 = sample_blocks_bilinear(blocks_t, pts - qf, WIN + 2)
    w = WIN
    T = T23[:, 1 : 1 + w, 1 : 1 + w]
    gx = 0.5 * (T23[:, 1 : 1 + w, 2 : 2 + w] - T23[:, 1 : 1 + w, 0:w])
    gy = 0.5 * (T23[:, 2 : 2 + w, 1 : 1 + w] - T23[:, 0:w, 1 : 1 + w])
    hxx = jnp.sum(gx * gx, axis=(1, 2))
    hxy = jnp.sum(gx * gy, axis=(1, 2))
    hyy = jnp.sum(gy * gy, axis=(1, 2))
    return T, gx, gy, hxx, hxy, hyy


def stage1(img0, img1, pts):
    """template only"""
    T, gx, gy, hxx, hxy, hyy = template(img0, pts)
    return hxx + hxy + hyy


def stage2(img0, img1, pts):
    """template + iter loop with sampling only (no LK solve)"""
    T, gx, gy, hxx, hxy, hyy = template(img0, pts)

    def body(_, d):
        q = pts + d
        qf = jnp.floor(q)
        origins = (qf - R_ - 1).astype(jnp.int32)
        blocks = extract_blocks(img1, origins, WIN + 2)
        I = sample_blocks_bilinear(blocks, q - qf, WIN)
        return d + 1e-6 * jnp.mean(I, axis=(1, 2))[:, None]

    return lax.fori_loop(0, ITERS, body, jnp.zeros((N, 2)))


def stage3(img0, img1, pts):
    """full real math: sampling + error + normal equations"""
    T, gx, gy, hxx, hxy, hyy = template(img0, pts)
    det = hxx * hyy - hxy * hxy
    det_ok = det > 1e-6
    safe_det = jnp.where(det_ok, det, 1.0)

    def body(_, d):
        q = pts + d
        qf = jnp.floor(q)
        origins = (qf - R_ - 1).astype(jnp.int32)
        blocks = extract_blocks(img1, origins, WIN + 2)
        I = sample_blocks_bilinear(blocks, q - qf, WIN)
        e = I - T
        bx = jnp.sum(gx * e, axis=(1, 2))
        by = jnp.sum(gy * e, axis=(1, 2))
        ddx = (hyy * bx - hxy * by) / safe_det
        ddy = (-hxy * bx + hxx * by) / safe_det
        step = jnp.stack([ddx, ddy], axis=-1)
        return d - jnp.where(det_ok[:, None], step, 0.0)

    return lax.fori_loop(0, ITERS, body, jnp.zeros((N, 2)))


def stage3_pad(img0, img1, pts):
    """stage3 + edge padding like the real kernel"""
    pad = R_ + 3
    p0 = jnp.pad(img0, pad, mode="edge")
    p1 = jnp.pad(img1, pad, mode="edge")
    return stage3(p0, p1, pts + pad)


if __name__ == "__main__":
    timeit("stage1: template+grad+hessian", jax.jit(stage1), img0, img1, pts)
    timeit("stage2: + iter sampling loop", jax.jit(stage2), img0, img1, pts)
    timeit("stage3: + full LK normal equations", jax.jit(stage3), img0, img1, pts)
    timeit("stage3_pad: + edge padding", jax.jit(stage3_pad), img0, img1, pts)
