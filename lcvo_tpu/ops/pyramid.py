"""Gaussian image pyramids (XLA convolutions).

TPU-native equivalent of the pyramid construction hidden inside
``cv2.calcOpticalFlowPyrLK`` (reference ``src/vo_pipeline.py:215,501``, default 3
levels) and ``cv2.SIFT``'s scale space. Separable 5-tap binomial blur + 2x decimation;
everything stays on device as fixed-shape arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# binomial [1,4,6,4,1]/16 — the classic pyramid kernel
_K5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_conv(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution of (H, W) image with 1D kernel k, SAME padding."""
    H, W = img.shape
    x = img[None, None]  # NCHW
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = (k.shape[0] - 1) // 2
    x = lax.conv_general_dilated(x, kh.astype(img.dtype), (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw.astype(img.dtype), (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with a radius-3*sigma truncated kernel (static size)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    return _sep_conv(img, k)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Binomial blur + 2x decimation."""
    return _sep_conv(img, _K5.astype(img.dtype))[::2, ::2]


@partial(jax.jit, static_argnames="levels")
def build_pyramid(img: jnp.ndarray, levels: int):
    """(H, W) image → tuple of ``levels`` arrays, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return tuple(pyr)


def sobel_gradients(img: jnp.ndarray):
    """Sobel x/y gradients, SAME padding. Returns (gx, gy)."""
    d = jnp.array([-1.0, 0.0, 1.0], img.dtype) * 0.5
    s = jnp.array([1.0, 2.0, 1.0], img.dtype) * 0.25
    H, W = img.shape
    x = img[None, None]
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 3, 1), ("NCHW", "OIHW", "NCHW"))

    def conv(v, kh, kw):
        v = lax.conv_general_dilated(v, kh[None, None, :, None], (1, 1), [(1, 1), (0, 0)], dimension_numbers=dn)
        v = lax.conv_general_dilated(v, kw[None, None, None, :], (1, 1), [(0, 0), (1, 1)], dimension_numbers=dn)
        return v

    gx = conv(x, s, d)[0, 0]
    gy = conv(x, d, s)[0, 0]
    return gx, gy


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 box sum via two 1D convolutions."""
    k = jnp.ones((2 * radius + 1,), img.dtype)
    return _sep_conv(img, k)
