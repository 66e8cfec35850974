"""Shi-Tomasi / Harris corner detection with static-shape grid NMS.

TPU-native equivalent of ``cv2.goodFeaturesToTrack`` (reference
``src/vo_pipeline.py:86-87,382``: maxCorners 600/500, quality 0.03, minDistance 10).

OpenCV's detector sorts all corners and greedily suppresses by radius — a dynamic-shape
algorithm. Here detection is reshaped for XLA: structure-tensor score (pure convs on
the VPU) → 3x3 local-max suppression → per-grid-cell top-k (fixed k → static shapes)
→ global top-``max_corners`` with a validity mask. Min-distance to *existing* points
(the "-mask" modes, reference ``:357-425``) is a batched distance test, not a rastered
mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.ops.pyramid import box_filter, sobel_gradients


def corner_score(img: jnp.ndarray, window: int = 3, method: str = "shi", harris_k: float = 0.04):
    """Per-pixel corner response.

    'shi': min eigenvalue of the 2x2 structure tensor (Shi-Tomasi, what
    ``goodFeaturesToTrack`` uses by default); 'harris': det - k*trace^2.
    """
    gx, gy = sobel_gradients(img)
    sxx = box_filter(gx * gx, window)
    syy = box_filter(gy * gy, window)
    sxy = box_filter(gx * gy, window)
    if method == "harris":
        det = sxx * syy - sxy * sxy
        tr = sxx + syy
        return det - harris_k * tr * tr
    # min eigenvalue: (a+c)/2 - sqrt(((a-c)/2)^2 + b^2)
    half_tr = 0.5 * (sxx + syy)
    root = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return half_tr - root


def _local_max(score: jnp.ndarray) -> jnp.ndarray:
    """True where pixel is the strict max of its 3x3 neighborhood."""
    m = lax.reduce_window(
        score, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= m


@partial(jax.jit, static_argnames=("max_corners", "cells_y", "cells_x", "cells_topk", "method", "window"))
def detect_corners(
    img: jnp.ndarray,
    max_corners: int = 600,
    quality_level: float = 0.03,
    cells_y: int = 12,
    cells_x: int = 32,
    cells_topk: int = 4,
    method: str = "shi",
    window: int = 3,
    border: int = 8,
    harris_k: float = 0.04,
):
    """Detect up to ``max_corners`` corners. Returns (pts (N,2) [x,y] float32,
    score (N,), valid (N,) bool) with N = max_corners, strongest first.
    """
    H, W = img.shape
    score = corner_score(img, window=window, method=method, harris_k=harris_k)
    is_max = _local_max(score)

    yy = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    masked = jnp.where(is_max & in_border, score, -jnp.inf)

    # partition into cells (pad so H, W divide evenly)
    ch = -(-H // cells_y)
    cw = -(-W // cells_x)
    padded = jnp.full((cells_y * ch, cells_x * cw), -jnp.inf, score.dtype)
    padded = padded.at[:H, :W].set(masked)
    cells = padded.reshape(cells_y, ch, cells_x, cw).transpose(0, 2, 1, 3).reshape(cells_y, cells_x, ch * cw)
    top_vals, top_idx = lax.top_k(cells, cells_topk)  # (cy, cx, k)

    cy = lax.broadcasted_iota(jnp.int32, top_vals.shape, 0)
    cx = lax.broadcasted_iota(jnp.int32, top_vals.shape, 1)
    py = cy * ch + top_idx // cw
    px = cx * cw + top_idx % cw

    flat_vals = top_vals.reshape(-1)
    flat_y = py.reshape(-1).astype(jnp.float32)
    flat_x = px.reshape(-1).astype(jnp.float32)

    k = min(max_corners, flat_vals.shape[0])
    sel_vals, sel = lax.top_k(flat_vals, k)
    pts = jnp.stack([flat_x[sel], flat_y[sel]], axis=-1)
    max_score = jnp.maximum(jnp.max(sel_vals), 1e-12)
    valid = jnp.isfinite(sel_vals) & (sel_vals > quality_level * max_score)
    if k < max_corners:  # pad up to static capacity
        pad = max_corners - k
        pts = jnp.concatenate([pts, jnp.zeros((pad, 2), pts.dtype)], 0)
        sel_vals = jnp.concatenate([sel_vals, jnp.full((pad,), -jnp.inf, sel_vals.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
    return pts, sel_vals, valid


def suppress_near_existing(
    pts: jnp.ndarray,
    pts_valid: jnp.ndarray,
    existing: jnp.ndarray,
    existing_valid: jnp.ndarray,
    min_distance: float,
):
    """Drop new detections within ``min_distance`` px of any existing point.

    Batched all-pairs distance test — the static-shape replacement for the rastered
    occupancy masks of the reference's 'shi-mask'/'sift-mask' modes
    (``src/vo_pipeline.py:357-425``). Cost is a (N_new, N_old) matrix — tiny.
    """
    d2 = jnp.sum((pts[:, None, :] - existing[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(existing_valid[None, :], d2, jnp.inf)
    near = jnp.any(d2 < min_distance * min_distance, axis=1)
    return pts_valid & ~near
