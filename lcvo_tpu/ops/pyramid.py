"""Gaussian image pyramids and small separable filters.

TPU-native equivalent of the pyramid construction hidden inside
``cv2.calcOpticalFlowPyrLK`` (reference ``src/vo_pipeline.py:215,501``, default 3
levels) and ``cv2.SIFT``'s scale space.

Implementation note: single-channel 2D convolutions are pathological on the TPU
(``conv_general_dilated`` with C=1 pads channels onto the MXU, ~100x waste — a
Shi-Tomasi structure tensor measured 10.5 ms/frame through the conv path). Small
separable filters are instead **shift-and-add**: k static slices of the zero-padded
image blended with fused multiply-adds on the VPU — bandwidth-bound and fusable.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# binomial [1,4,6,4,1]/16 — the classic pyramid kernel
_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _conv1d(img: jnp.ndarray, k, axis: int) -> jnp.ndarray:
    """1D correlation along ``axis`` with static kernel ``k`` (numpy), SAME
    zero padding — as static shifted slices + fma."""
    k = np.asarray(k)
    r = (len(k) - 1) // 2
    pads = [(0, 0), (0, 0)]
    pads[axis] = (r, r)
    p = jnp.pad(img, pads)
    H, W = img.shape
    out = None
    for j, kj in enumerate(k):
        if kj == 0.0:
            continue
        sl = p[j : j + H, :] if axis == 0 else p[:, j : j + W]
        term = sl if kj == 1.0 else float(kj) * sl
        out = term if out is None else out + term
    return out


def _sep_conv(img: jnp.ndarray, k) -> jnp.ndarray:
    """Separable 2D filter of (H, W) image with 1D kernel k, SAME zero padding."""
    return _conv1d(_conv1d(img, k, 0), k, 1)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with a radius-3*sigma truncated kernel (static size)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / np.sum(k)
    return _sep_conv(img, k)


def _decim_band(n: int, k) -> np.ndarray:
    """(ceil(n/2), n) decimating band matrix: row i holds kernel ``k`` centered at
    column 2i (zero padding). Multiplying by it IS blur+2x-decimation in one
    matmul — compile-time constant, built host-side."""
    k = np.asarray(k, np.float64)
    r = (len(k) - 1) // 2
    m = np.zeros(((n + 1) // 2, n), np.float32)
    for i in range((n + 1) // 2):
        for j, kj in enumerate(k):
            c = 2 * i + j - r
            if 0 <= c < n:
                m[i, c] = kj
    return m


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Binomial blur + 2x decimation, as two decimating band matmuls.

    The shift-and-add + ``[::2, ::2]`` formulation costs ~0.9 ms at KITTI res on
    TPU (the stride-2 slice on the lane dimension forces a relayout); the band
    matmuls are ~0.5 GFLOP of MXU work with unit-stride memory — identical
    output (same 5-tap binomial, zero padding)."""
    H, W = img.shape
    Dy = jnp.asarray(_decim_band(H, _K5))
    Dx = jnp.asarray(_decim_band(W, _K5))
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("hg,gw->hw", Dy, img, precision=hi)
    return jnp.einsum("hw,vw->hv", t, Dx, precision=hi).astype(img.dtype)


@partial(jax.jit, static_argnames="levels")
def build_pyramid(img: jnp.ndarray, levels: int):
    """(H, W) image → tuple of ``levels`` arrays, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return tuple(pyr)


def sobel_gradients(img: jnp.ndarray):
    """Sobel x/y gradients (smooth [1,2,1]/4 x diff [-1,0,1]/2), SAME padding."""
    d = np.array([-1.0, 0.0, 1.0]) * 0.5
    s = np.array([1.0, 2.0, 1.0]) * 0.25
    gx = _conv1d(_conv1d(img, s, 0), d, 1)
    gy = _conv1d(_conv1d(img, d, 0), s, 1)
    return gx, gy


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 box sum via two 1D shift-and-add passes."""
    k = np.ones((2 * radius + 1,))
    return _sep_conv(img, k)
