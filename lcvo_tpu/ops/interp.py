"""Bilinear sampling / patch gather primitives — measurement scaffolding.

NOT on the production path: these document the XLA-gather formulation that the
KLT strategy comparison (benchmarks/micro_sampling.py) measured and REJECTED in
favor of the block-extraction + interpolation-einsum tracker (ops/klt.py) and
the Pallas VMEM extraction kernel (ops/klt_pallas.py). Kept for the
micro-benchmarks and as the simplest reference semantics the unit tests check
the fast paths against (tests/test_ops.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample ``img`` (H, W) at float coords (ys, xs) of any matching shape.

    Out-of-bounds samples clamp to the border (callers mask tracks near the border
    separately). Returns samples with the shape of ``ys``.
    """
    H, W = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    Ia = img[y0i, x0i]
    Ib = img[y0i, x0i + 1]
    Ic = img[y0i + 1, x0i]
    Id = img[y0i + 1, x0i + 1]
    top = Ia * (1 - wx) + Ib * wx
    bot = Ic * (1 - wx) + Id * wx
    return top * (1 - wy) + bot * wy


def patch_grid(window: int, dtype=jnp.float32):
    """Centered offsets for a window x window patch: two (window, window) arrays."""
    r = (window - 1) / 2.0
    o = jnp.arange(window, dtype=dtype) - r
    dy, dx = jnp.meshgrid(o, o, indexing="ij")
    return dy, dx


def gather_patches(img: jnp.ndarray, pts: jnp.ndarray, window: int):
    """Gather bilinear patches around ``pts`` (N, 2) [x, y] → (N, window, window)."""
    dy, dx = patch_grid(window, img.dtype)
    ys = pts[:, 1][:, None, None] + dy[None]
    xs = pts[:, 0][:, None, None] + dx[None]
    return bilinear_sample(img, ys, xs)


def extract_blocks(img: jnp.ndarray, origins: jnp.ndarray, size: int):
    """Integer-aligned (size, size) blocks via vmapped ``lax.dynamic_slice``.

    ``origins`` (N, 2) int32 [x, y] top-left corners (clamped inside by XLA's
    dynamic-slice semantics). On TPU this lowers to block-wise slices — orders of
    magnitude faster than the per-element gathers of :func:`bilinear_sample`
    (measured 2.4 s vs ~ms per KLT frame at KITTI res on v5e).
    """

    def one(o):
        return jax.lax.dynamic_slice(img, (o[1], o[0]), (size, size))

    return jax.vmap(one)(origins)


def sample_blocks_bilinear(blocks: jnp.ndarray, frac: jnp.ndarray, out: int):
    """Bilinear-resample (N, S, S) blocks at a per-block constant subpixel shift.

    ``frac`` (N, 2) [fx, fy] in [0, 1); returns (N, out, out) sampled at
    (1 + fx + i, 1 + fy + j) block coords — i.e. the caller's block origin should be
    (floor(x) - 1 - r) so sample 0 lands at (x - r). Constant shift per block means
    the four bilinear taps are STATIC slices — no gathers at all.
    """
    fx = frac[:, 0][:, None, None]
    fy = frac[:, 1][:, None, None]
    a = blocks[:, 1 : 1 + out, 1 : 1 + out]
    b = blocks[:, 1 : 1 + out, 2 : 2 + out]
    c = blocks[:, 2 : 2 + out, 1 : 1 + out]
    d = blocks[:, 2 : 2 + out, 2 : 2 + out]
    top = a * (1 - fx) + b * fx
    bot = c * (1 - fx) + d * fx
    return top * (1 - fy) + bot * fy


def gather_patches_with_grad(img: jnp.ndarray, pts: jnp.ndarray, window: int):
    """Patches plus central-difference image gradients at the same sample points.

    Returns (patch, gx, gy), each (N, window, window).
    """
    dy, dx = patch_grid(window, img.dtype)
    ys = pts[:, 1][:, None, None] + dy[None]
    xs = pts[:, 0][:, None, None] + dx[None]
    p = bilinear_sample(img, ys, xs)
    gx = 0.5 * (bilinear_sample(img, ys, xs + 1.0) - bilinear_sample(img, ys, xs - 1.0))
    gy = 0.5 * (bilinear_sample(img, ys + 1.0, xs) - bilinear_sample(img, ys - 1.0, xs))
    return p, gx, gy
