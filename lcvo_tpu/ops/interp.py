"""Bilinear sampling / patch gather primitives.

These are the memory-access core of the KLT tracker and descriptor extraction. The
vectorized-JAX path uses XLA gathers; the Pallas KLT kernel replaces them with
dynamic-slice loads from VMEM for the hot loop.
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
