"""Pyramidal Lucas-Kanade tracking, batched over all tracks (the hot loop).

TPU-native equivalent of ``cv2.calcOpticalFlowPyrLK`` (reference
``src/vo_pipeline.py:215,501`` — 21x21 window, 3 levels, 30 iters). This is HOT LOOP 1
of the reference's per-frame stack (SURVEY §3.2): it runs on every frame for both the
landmark tracks ``P`` and the candidate tracks ``C``.

Design: inverse-compositional LK for pure translation. Per pyramid level the template
patch and its gradients are sampled **once** (from the previous frame), giving a fixed
2x2 normal-equation Hessian; the fixed-count iteration loop then only re-samples the
target patch. Everything is batched over the padded track dimension — (N, W, W)
patch tensors on the VPU — with no data-dependent control flow, so the tracker
compiles once inside the frame step.

A Pallas patch-stencil variant lives in :mod:`lcvo_tpu.ops.klt_pallas`; this module is
the reference/vectorized-XLA implementation and the fallback for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.ops.interp import extract_blocks, sample_blocks_bilinear


def _sample_at(img_padded, pad, q, window):
    """(N, window, window) bilinear patches centered at q — via integer block slices
    + constant-per-track fraction (static-shift bilinear). No element gathers.

    ``img_padded`` is the level image edge-padded by ``pad`` px, so out-of-image
    samples replicate the border — matching clamp-to-border bilinear semantics."""
    r = (window - 1) // 2
    qf = jnp.floor(q)
    origins = (qf + (pad - r - 1)).astype(jnp.int32)  # sample 0 lands at q - r
    blocks = extract_blocks(img_padded, origins, window + 2)
    return sample_blocks_bilinear(blocks, q - qf, window)


def _track_level(prev_img, next_img, pts_l, d, window, iters):
    """One pyramid level of IC-LK. pts_l, d in this level's pixel units.

    Returns (d, det_ok, residual) — residual is the mean |error| of the final patch.

    Memory access is block-structured for the TPU: per track one integer-aligned
    ``lax.dynamic_slice`` block, then the bilinear taps are four STATIC slices
    weighted by the track's constant subpixel fraction. (The naive per-element
    gather formulation measured 2.4 s/frame on v5e; this is the XLA-friendly
    reshape of the same math.)
    """
    r = (window - 1) // 2
    pad = r + 3
    prev_p = jnp.pad(prev_img, pad, mode="edge")
    next_p = jnp.pad(next_img, pad, mode="edge")
    # template + gradients from one (window+4)^2 block: samples span q +- (r+1)
    qf = jnp.floor(pts_l)
    o_t = (qf + (pad - r - 2)).astype(jnp.int32)
    blocks_t = extract_blocks(prev_p, o_t, window + 4)
    T23 = sample_blocks_bilinear(blocks_t, pts_l - qf, window + 2)  # q-r-1 .. q+r+1
    w = window
    T = T23[:, 1 : 1 + w, 1 : 1 + w]
    gx = 0.5 * (T23[:, 1 : 1 + w, 2 : 2 + w] - T23[:, 1 : 1 + w, 0:w])
    gy = 0.5 * (T23[:, 2 : 2 + w, 1 : 1 + w] - T23[:, 0:w, 1 : 1 + w])
    hxx = jnp.sum(gx * gx, axis=(1, 2))
    hxy = jnp.sum(gx * gy, axis=(1, 2))
    hyy = jnp.sum(gy * gy, axis=(1, 2))
    det = hxx * hyy - hxy * hxy
    det_ok = det > 1e-6
    safe_det = jnp.where(det_ok, det, 1.0)

    def body(_, d):
        I = _sample_at(next_p, pad, pts_l + d, window)
        e = I - T
        bx = jnp.sum(gx * e, axis=(1, 2))
        by = jnp.sum(gy * e, axis=(1, 2))
        ddx = (hyy * bx - hxy * by) / safe_det
        ddy = (-hxy * bx + hxx * by) / safe_det
        step = jnp.stack([ddx, ddy], axis=-1)
        return d - jnp.where(det_ok[:, None], step, 0.0)

    d = lax.fori_loop(0, iters, body, d)
    I = _sample_at(next_p, pad, pts_l + d, window)
    residual = jnp.mean(jnp.abs(I - T), axis=(1, 2))
    return d, det_ok, residual


@partial(jax.jit, static_argnames=("window", "iters"))
def pyramidal_klt(
    prev_pyramid: tuple,
    next_pyramid: tuple,
    pts: jnp.ndarray,
    window: int = 21,
    iters: int = 10,
    max_residual: float = 12.0,
    max_displacement: float = 60.0,
    border: int = 12,
):
    """Track ``pts`` (N, 2) [x, y] from the previous frame into the next.

    Returns (new_pts (N, 2), status (N,) bool, residual (N,)). ``status`` combines:
    well-conditioned gradient Hessian at every level, final photometric residual below
    ``max_residual``, displacement below ``max_displacement`` and the new position
    inside the image border — the masked replacement for OpenCV's status vector
    (reference drops lost tracks at ``src/vo_pipeline.py:217-225``).
    """
    levels = len(prev_pyramid)
    N = pts.shape[0]
    d = jnp.zeros((N, 2), pts.dtype)
    ok = jnp.ones((N,), bool)
    residual = jnp.zeros((N,), pts.dtype)
    for l in reversed(range(levels)):
        scale = jnp.asarray(2.0**-l, pts.dtype)
        pts_l = pts * scale
        d, det_ok, residual = _track_level(
            prev_pyramid[l], next_pyramid[l], pts_l, d, window, iters
        )
        ok = ok & det_ok
        if l > 0:
            d = d * 2.0
    new_pts = pts + d
    H, W = prev_pyramid[0].shape
    inb = (
        (new_pts[:, 0] >= border)
        & (new_pts[:, 0] < W - border)
        & (new_pts[:, 1] >= border)
        & (new_pts[:, 1] < H - border)
    )
    disp_ok = jnp.sum(d * d, axis=-1) < max_displacement * max_displacement
    status = ok & inb & disp_ok & (residual < max_residual)
    return new_pts, status, residual
