"""Pyramidal Lucas-Kanade tracking, batched over all tracks (the hot loop).

TPU-native equivalent of ``cv2.calcOpticalFlowPyrLK`` (reference
``src/vo_pipeline.py:215,501`` — 21x21 window, 3 levels, 30 iters). This is HOT LOOP 1
of the reference's per-frame stack (SURVEY §3.2): it runs on every frame for both the
landmark tracks ``P`` and the candidate tracks ``C``.

Design: inverse-compositional LK for pure translation, reshaped for the TPU memory
system. Per pyramid level each track's neighborhood is gathered from HBM **once** into
a fixed (S, S) block (one ``dynamic_slice`` per track — the only gather); the
fixed-count iteration loop then never touches the image again: bilinear sampling at
the current displacement is expressed as two small interpolation matmuls per track,

    patch = R_y(dy) @ block @ C_x(dx)^T ,

where R_y/C_x are (w, S) two-tap interpolation matrices built arithmetically from the
subpixel offset. The whole iteration is batched einsums over (N, ·, ·) — MXU/VPU work
with zero gathers — which measured ~5x faster than per-iteration ``dynamic_slice``
gathers on v5e (per-track gathers are the dominant cost of the naive formulation).

Tracks whose residual displacement wanders outside the per-level block margin are
clamped and flagged through the photometric-residual gate — the same failure semantics
as OpenCV's status vector.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Default per-level wander margin (px) around the incoming displacement
# estimate. The coarse-to-fine schedule means per-level corrections are small;
# 6 px per level covers the ~40 px raw full-res displacements KITTI motion
# produces from a ZERO initial estimate (bootstrap hops). Callers with a motion
# prior (``init_d`` — the pipeline's constant-velocity warm start) can shrink it:
# the margin then only covers prediction error, and the extracted block area
# (the tracker's dominant HBM stream, ∝ (w+2+2·margin)²) drops accordingly.
_MARGIN = 6


def _interp_matrix(off: jnp.ndarray, w: int, s: int) -> jnp.ndarray:
    """(N, w, s) two-tap bilinear interpolation matrices.

    Row i of matrix n selects ``(1-f) * block[floor(off_n)+i] + f * block[...+1]``.
    Built with broadcast compares — no gather. Off-range rows produce zero taps
    (the sample reads as 0; such tracks are killed by the residual gate).
    """
    i0 = jnp.floor(off)
    f = (off - i0)[:, None, None]
    rows = i0[:, None] + jnp.arange(w, dtype=off.dtype)[None, :]  # (N, w)
    cols = jnp.arange(s, dtype=off.dtype)[None, None, :]           # (1, 1, s)
    eq0 = (cols == rows[:, :, None]).astype(off.dtype)
    eq1 = (cols == (rows[:, :, None] + 1)).astype(off.dtype)
    return eq0 * (1 - f) + eq1 * f


def _sample_blocks(blocks: jnp.ndarray, qx, qy, w: int) -> jnp.ndarray:
    """(N, w, w) patches sampled from (N, S, S) blocks, window centered at (qx, qy)
    in block coordinates (top-left sample lands at q - (w-1)/2).

    Matmul operands take the blocks' dtype (bf16 when ``iter_dtype`` asks for it —
    halves the per-iteration HBM read of the block set); accumulation is always
    f32 via ``preferred_element_type`` so the output patch is full precision.

    Precision HIGH (3-pass bf16 ≈ 19-bit-mantissa inputs): measured identical
    6-hop bootstrap survival to HIGHEST (685/685 tracks) at 5.82 vs 6.31 ms for
    the full tracker — the framework's f32 default would spend 6 passes here
    for nothing (BASELINE.md round 3)."""
    S = blocks.shape[-1]
    r = (w - 1) // 2
    Ry = _interp_matrix(qy - r, w, S).astype(blocks.dtype)
    Cx = _interp_matrix(qx - r, w, S).astype(blocks.dtype)
    # (N,w,S) @ (N,S,S) @ (N,S,w) — two batched small matmuls
    return jnp.einsum(
        "nws,nst,nvt->nwv", Ry, blocks, Cx,
        precision=lax.Precision.HIGH, preferred_element_type=jnp.float32,
    )


def _extract_blocks(img: jnp.ndarray, centers: jnp.ndarray, S: int):
    """(N, S, S) integer-aligned blocks roughly centered on ``centers`` (x, y).

    Origins are clamped into the image (XLA dynamic-slice semantics), and the true
    block origin is returned so sampling positions stay exact after clamping.

    On TPU backends this dispatches to the Pallas extraction kernel (VMEM-resident
    image; ~10x faster than the vmapped dynamic_slice gather); elsewhere it uses
    the portable XLA formulation. bf16 images take the portable path too —
    Mosaic's dynamic rotate (pltpu.roll) supports only 32-bit element types.
    """
    if (
        jax.default_backend() in ("tpu", "axon")
        and centers.shape[0] % 8 == 0
        and img.dtype == jnp.float32
    ):
        from lcvo_tpu.ops.klt_pallas import extract_blocks_pallas

        return extract_blocks_pallas(img, centers, S)
    H, W = img.shape
    want = jnp.floor(centers) - (S - 1) // 2
    ox = jnp.clip(want[:, 0], 0, W - S).astype(jnp.int32)
    oy = jnp.clip(want[:, 1], 0, H - S).astype(jnp.int32)
    blocks = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (S, S)))(oy, ox)
    return blocks, jnp.stack([ox, oy], axis=-1).astype(centers.dtype)


def _track_level(prev_img, next_img, pts_l, d, window, iters, eps,
                 iter_dtype=jnp.float32, margin: int = _MARGIN):
    """One pyramid level of IC-LK. pts_l, d in this level's pixel units.

    ``iter_dtype``: storage dtype of the loop-constant tensors the iteration body
    re-reads from HBM every pass (target blocks, template, gradients). bf16 halves
    that traffic — the dominant byte stream of the tracker — while extraction,
    Hessian, and all accumulations stay f32 (sub-0.01 px displacement noise;
    see tests/test_ops.py bf16-parity test).

    Returns (d, det_ok, residual) — residual is the mean |error| of the final patch.
    """
    w = window
    r = (w - 1) // 2
    # target block: sampling span w+2 (gradients) + per-level wander margin;
    # template block: the template is sampled ONCE at the track position (zero
    # wander), so it only needs bilinear + gradient slack — 2/3 the block area.
    # (Measured timing-neutral at N=2048 — extraction is latency-bound, not
    # area-bound — kept for the lower VMEM/HBM footprint at larger N.)
    S = w + 2 + 2 * margin
    S_t = w + 2 + 2 * 2
    # edge-pad so a block fits around ANY in-image point (coarse levels are small,
    # and near-border tracks must not have their block shifted off-center)
    p = (S + 1) // 2
    prev_p = jnp.pad(prev_img, p, mode="edge")
    next_p = jnp.pad(next_img, p, mode="edge")
    off = jnp.asarray([p, p], pts_l.dtype)

    # one gather per track per image — template block at pts, target block at
    # pts+d. (Stacking both images into one extraction call was measured WORSE —
    # 7.5 vs 4.0 ms full-tracker — the doubled VMEM-resident image re-stages per
    # grid program; two calls with the smaller image win.)
    tblocks, torig = _extract_blocks(prev_p, pts_l + off, S_t)
    nblocks, norig = _extract_blocks(next_p, pts_l + d + off, S)
    torig = torig - off
    norig = norig - off

    # template + central-difference gradients from one (w+2)-sized sample
    qt = pts_l - torig
    T2 = _sample_blocks(tblocks, qt[:, 0], qt[:, 1], w + 2)
    T = T2[:, 1 : 1 + w, 1 : 1 + w]
    gx = 0.5 * (T2[:, 1 : 1 + w, 2 : 2 + w] - T2[:, 1 : 1 + w, 0:w])
    gy = 0.5 * (T2[:, 2 : 2 + w, 1 : 1 + w] - T2[:, 0:w, 1 : 1 + w])
    hxx = jnp.sum(gx * gx, axis=(1, 2))
    hxy = jnp.sum(gx * gy, axis=(1, 2))
    hyy = jnp.sum(gy * gy, axis=(1, 2))
    det = hxx * hyy - hxy * hxy
    det_ok = det > 1e-6
    safe_det = jnp.where(det_ok, det, 1.0)

    # loop-constant tensors the body re-reads from HBM every iteration; bf16
    # storage (when requested) halves that stream. Math stays f32 (upcast on use,
    # f32 accumulation inside _sample_blocks).
    nblocks = nblocks.astype(iter_dtype)
    T = T.astype(iter_dtype)
    gx_i = gx.astype(iter_dtype)
    gy_i = gy.astype(iter_dtype)

    # displacement range whose sampling window stays inside the extracted block
    dd_min = norig + (r + 1) - pts_l
    dd_max = norig + (S - r - 2) - pts_l

    def in_block(dd):
        return pts_l + dd - norig

    def body(_, dd):
        q = in_block(dd)
        I = _sample_blocks(nblocks, q[:, 0], q[:, 1], w)
        e = I - T
        bx = jnp.sum(gx_i * e, axis=(1, 2))
        by = jnp.sum(gy_i * e, axis=(1, 2))
        ddx = (hyy * bx - hxy * by) / safe_det
        ddy = (-hxy * bx + hxx * by) / safe_det
        step = jnp.stack([ddx, ddy], axis=-1)
        # convergence mask (OpenCV's criteria eps, per track): once the update is
        # below eps the track is converged — freeze it instead of jittering
        live = det_ok & (jnp.sum(step * step, axis=-1) >= eps * eps)
        dd = dd - jnp.where(live[:, None], step, 0.0)
        return jnp.clip(dd, dd_min, dd_max)

    # fori_loop deliberately NOT unrolled: the r4 profiler trace showed the 3
    # per-level iteration loops at 1.09 ms each (~70 GB/s — latency-chained,
    # not bandwidth-bound), but trace-time unrolling measured WORSE end to end
    # (120.4 → 111.1 fps, device latency 8.6 → 9.2 ms): the inflated program
    # loses more to scheduling/VMEM churn than the loop boundary costs.
    d = lax.fori_loop(0, iters, body, d)
    q = in_block(d)
    I = _sample_blocks(nblocks, q[:, 0], q[:, 1], w)
    residual = jnp.mean(jnp.abs(I - T), axis=(1, 2))
    # a displacement pinned at the block boundary means the track wanted to leave
    # the search region — unreliable at the finest level (coarse levels routinely
    # saturate on clamped edge blocks and are corrected by finer ones)
    sat = jnp.any((d <= dd_min + 1e-3) | (d >= dd_max - 1e-3), axis=-1)
    return d, det_ok, sat, residual


@partial(jax.jit, static_argnames=("window", "iters", "iter_dtype", "margin",
                                   "iters_coarse"))
def pyramidal_klt(
    prev_pyramid: tuple,
    next_pyramid: tuple,
    pts: jnp.ndarray,
    window: int = 21,
    iters: int = 10,
    max_residual: float = 12.0,
    max_displacement: float = 60.0,
    border: int = 12,
    eps: float = 0.01,
    iter_dtype: str = "float32",
    margin: int = _MARGIN,
    init_d: jnp.ndarray | None = None,
    iters_coarse: int = 0,
):
    """Track ``pts`` (N, 2) [x, y] from the previous frame into the next.

    ``init_d`` (N, 2), full-resolution px: optional per-track initial displacement
    (motion prior). The coarse-to-fine corrections then only cover the prediction
    ERROR, so sustained camera rotation (50+ px/frame edge flow in 90° turns) stays
    inside a small per-level ``margin`` — the analog of OpenCV's
    ``OPTFLOW_USE_INITIAL_FLOW``, fed by the pipeline's constant-velocity pose model.

    Returns (new_pts (N, 2), status (N,) bool, residual (N,)). ``status`` combines:
    well-conditioned gradient Hessian at every level, final photometric residual below
    ``max_residual``, displacement below ``max_displacement`` and the new position
    inside the image border — the masked replacement for OpenCV's status vector
    (reference drops lost tracks at ``src/vo_pipeline.py:217-225``).

    ``iters_coarse`` (0 = ``iters``): iteration count for levels > 0. A coarse
    level's only job is to land the displacement within the next level's wander
    margin; fewer coarse iterations shorten the latency-chained per-level loops.

    ``margin`` may be a per-level tuple (index = pyramid level, 0 = finest).
    Total correction reach ≈ Σ_l margin[l]·2^l full-res px, so widening ONLY the
    coarsest level buys reach at the smallest block-area cost — needed where a
    motion prior can be transiently wrong by tens of px (the constant-velocity
    model at a turn entry/exit: yaw steps 0↔2°/frame between frames, a 25-43 px
    prediction error that must not kill the track table — BASELINE.md round 5).
    """
    levels = len(prev_pyramid)
    margins = (margin,) * levels if isinstance(margin, int) else tuple(margin)
    assert len(margins) == levels, (margins, levels)
    N = pts.shape[0]
    idt = jnp.dtype(iter_dtype)
    if init_d is None:
        d = jnp.zeros((N, 2), pts.dtype)
    else:
        # seed the coarsest level with the prior, in that level's pixel units
        d = init_d.astype(pts.dtype) * (2.0 ** -(levels - 1))
    ok = jnp.ones((N,), bool)
    residual = jnp.zeros((N,), pts.dtype)
    for l in reversed(range(levels)):
        scale = jnp.asarray(2.0**-l, pts.dtype)
        pts_l = pts * scale
        d, det_ok, sat, residual = _track_level(
            prev_pyramid[l], next_pyramid[l], pts_l, d, window,
            iters if (l == 0 or not iters_coarse) else iters_coarse, eps,
            iter_dtype=idt, margin=margins[l],
        )
        ok = ok & det_ok
        if l == 0:
            ok = ok & ~sat
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
