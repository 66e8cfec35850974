"""Pallas TPU kernel for pyramidal Lucas-Kanade tracking.

The XLA formulation (:mod:`lcvo_tpu.ops.klt`) pays ~6 ms per level extracting
per-track blocks from HBM with ``dynamic_slice`` gathers. Here the whole (padded)
pyramid level lives in VMEM — a KITTI-resolution level 0 is ~2 MB, far under the
~16 MB/core budget — and every patch access is a cheap VMEM dynamic slice inside the
kernel. The full inverse-compositional iteration runs in-kernel per track:

    template + gradients (one (w+3)^2 VMEM read, four static-slice bilinear taps)
    -> 2x2 Hessian -> fori_loop of [sample -> residual -> normal-equation step]

with zero HBM traffic inside the loop. The grid tiles the track dimension; each
program handles ``B`` tracks serially (scalar flow control, VPU patch math).

Reference equivalence: ``cv2.calcOpticalFlowPyrLK`` (reference
``src/vo_pipeline.py:215,501``); status semantics match :func:`klt.pyramidal_klt`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tracks per pallas program (serial inner loop; grid = N // B)
_B = 8


def _use_interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


def _bilerp4(blk, fx, fy, w):
    """w x w bilinear sample from a (>=w+1, >=w+1) integer-aligned block given the
    subpixel fraction (fx, fy): four statically-sliced taps blended on the VPU."""
    a = blk[0:w, 0:w]
    b = blk[0:w, 1 : w + 1]
    c = blk[1 : w + 1, 0:w]
    d = blk[1 : w + 1, 1 : w + 1]
    return (1 - fy) * ((1 - fx) * a + fx * b) + fy * ((1 - fx) * c + fx * d)


def _load_window(ref, iy, ix, rows, cols):
    """(rows, cols) block at dynamic (iy, ix) from a VMEM ref.

    Mosaic vector loads need tile-aligned starts (sublanes: 8, lanes: 128). Load an
    aligned superset and rotate the residual offsets out with ``pltpu.roll``
    (dynamic circular shift), then slice statically. The caller guarantees
    ``iy <= H - rows - 8`` and ``ix <= W - cols - 128`` (images are padded so)."""
    H, W = ref.shape
    r8 = ((rows + 7) // 8) * 8 + 8
    c128 = ((cols + 127) // 128) * 128 + 128
    # clamp the ALIGNED start so the superset stays in bounds; the residual offset
    # then grows past one tile, which roll handles (offset + cols <= superset size
    # as long as iy <= H - rows and ix <= W - cols)
    iy_al = pl.multiple_of(jnp.clip((iy // 8) * 8, 0, H - r8), 8)
    ix_al = pl.multiple_of(jnp.clip((ix // 128) * 128, 0, W - c128), 128)
    sup = ref[pl.ds(iy_al, r8), pl.ds(ix_al, c128)]
    # left-rotate by the residual offsets (roll shifts right; use size - offset)
    oy = iy - iy_al
    ox = ix - ix_al
    sup = pltpu.roll(sup, (c128 - ox) % c128, axis=1)
    sup = pltpu.roll(sup, (r8 - oy) % r8, axis=0)
    return sup[:rows, :cols]


def _extract_kernel(centers_ref, img_ref, blocks_ref, orig_ref, *, S):
    """Per-track (S, S) block extraction: aligned superset load + roll + store.

    Replaces the XLA ``vmap(dynamic_slice)`` gather (~6 ms per level for 2560
    tracks at KITTI res) with VMEM-resident loads (~0.5 ms)."""
    H, W = img_ref.shape
    half = (S - 1) // 2
    for b in range(centers_ref.shape[0]):
        cx = centers_ref[b, 0]
        cy = centers_ref[b, 1]
        ix = jnp.clip(jnp.floor(cx).astype(jnp.int32) - half, 0, W - S)
        iy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - half, 0, H - S)
        blocks_ref[b] = _load_window(img_ref, iy, ix, S, S)
        orig_ref[b, 0] = ix
        orig_ref[b, 1] = iy


def extract_blocks_pallas(img: jnp.ndarray, centers: jnp.ndarray, S: int):
    """(N, S, S) blocks + (N, 2) int32 origins, like ``klt._extract_blocks`` but as
    a Pallas kernel with the image VMEM-resident. ``img`` should be edge-padded by
    the caller; alignment padding (rows to 8, lanes to 128, with superset slack) is
    applied here with edge values."""
    N = centers.shape[0]
    assert N % _B == 0, f"track count {N} must be a multiple of {_B}"
    H, W = img.shape
    r8 = ((S + 7) // 8) * 8 + 8
    c128 = ((S + 127) // 128) * 128 + 128
    dh = max(((H + 7) // 8) * 8, r8) - H
    dw = max(((W + 127) // 128) * 128, c128) - W
    if dh or dw:
        img = jnp.pad(img, ((0, dh), (0, dw)), mode="edge")
    kern = functools.partial(_extract_kernel, S=S)
    blocks, orig = pl.pallas_call(
        kern,
        grid=(N // _B,),
        in_specs=[
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(img.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_B, S, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, S, S), jnp.float32),
            jax.ShapeDtypeStruct((N, 2), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(centers, img)
    return blocks, orig.astype(centers.dtype)


def _level_kernel(pts_ref, d_ref, prev_ref, next_ref, dout_ref, aux_ref, *, w, iters, n_pad):
    r = (w - 1) // 2
    Hp, Wp = prev_ref.shape
    maxx_t = Wp - (w + 3)
    maxy_t = Hp - (w + 3)
    maxx_i = Wp - (w + 1)
    maxy_i = Hp - (w + 1)
    inv_area = 1.0 / (w * w)

    for b in range(pts_ref.shape[0]):
        px = pts_ref[b, 0] + n_pad  # positions in padded-image coordinates
        py = pts_ref[b, 1] + n_pad

        # ---- template + gradients (previous image) ----
        pxf = jnp.floor(px)
        pyf = jnp.floor(py)
        fx = px - pxf
        fy = py - pyf
        ix = jnp.clip(pxf.astype(jnp.int32) - r - 1, 0, maxx_t)
        iy = jnp.clip(pyf.astype(jnp.int32) - r - 1, 0, maxy_t)
        blk = _load_window(prev_ref, iy, ix, w + 3, w + 3)
        T2 = _bilerp4(blk, fx, fy, w + 2)
        T = T2[1 : w + 1, 1 : w + 1]
        gx = 0.5 * (T2[1 : w + 1, 2 : w + 2] - T2[1 : w + 1, 0:w])
        gy = 0.5 * (T2[2 : w + 2, 1 : w + 1] - T2[0:w, 1 : w + 1])
        hxx = jnp.sum(gx * gx)
        hxy = jnp.sum(gx * gy)
        hyy = jnp.sum(gy * gy)
        det = hxx * hyy - hxy * hxy
        det_ok = det > 1e-6
        safe_det = jnp.where(det_ok, det, 1.0)

        # ---- IC-LK iterations (next image) ----
        def body(_, carry):
            dx, dy, _e = carry
            qx = px + dx
            qy = py + dy
            qxf = jnp.floor(qx)
            qyf = jnp.floor(qy)
            jx = jnp.clip(qxf.astype(jnp.int32) - r, 0, maxx_i)
            jy = jnp.clip(qyf.astype(jnp.int32) - r, 0, maxy_i)
            nblk = _load_window(next_ref, jy, jx, w + 1, w + 1)
            I = _bilerp4(nblk, qx - qxf, qy - qyf, w)
            e = I - T
            bx = jnp.sum(gx * e)
            by = jnp.sum(gy * e)
            sx = (hyy * bx - hxy * by) / safe_det
            sy = (-hxy * bx + hxx * by) / safe_det
            step_ok = det_ok.astype(sx.dtype)
            return dx - sx * step_ok, dy - sy * step_ok, jnp.sum(jnp.abs(e))

        dx0 = d_ref[b, 0]
        dy0 = d_ref[b, 1]
        dx, dy, esum = lax.fori_loop(
            0, iters, body, (dx0, dy0, jnp.float32(0.0))
        )
        # one more sample at the final displacement for the residual
        qx = px + dx
        qy = py + dy
        qxf = jnp.floor(qx)
        qyf = jnp.floor(qy)
        jx = jnp.clip(qxf.astype(jnp.int32) - r, 0, maxx_i)
        jy = jnp.clip(qyf.astype(jnp.int32) - r, 0, maxy_i)
        nblk = _load_window(next_ref, jy, jx, w + 1, w + 1)
        I = _bilerp4(nblk, qx - qxf, qy - qyf, w)
        residual = jnp.sum(jnp.abs(I - T)) * inv_area

        dout_ref[b, 0] = dx
        dout_ref[b, 1] = dy
        aux_ref[b, 0] = det_ok.astype(jnp.float32)
        aux_ref[b, 1] = residual


def _track_level_pallas(prev_img, next_img, pts_l, d, window, iters, n_pad):
    """One pyramid level. ``prev_img``/``next_img`` already edge-padded by ``n_pad``.

    Returns (d, det_ok, residual) with the same semantics as the XLA level tracker
    (saturation is impossible here — the search range is the whole padded image, so
    the ``sat`` output of the XLA path maps to always-False).
    """
    N = pts_l.shape[0]
    assert N % _B == 0, f"track count {N} must be a multiple of {_B}"
    kern = functools.partial(_level_kernel, w=window, iters=iters, n_pad=n_pad)
    d_out, aux = pl.pallas_call(
        kern,
        grid=(N // _B,),
        in_specs=[
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(prev_img.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(next_img.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_B, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(pts_l, d, prev_img, next_img)
    det_ok = aux[:, 0] > 0.5
    residual = aux[:, 1]
    return d_out, det_ok, residual


@functools.partial(jax.jit, static_argnames=("window", "iters"))
def pyramidal_klt_pallas(
    prev_pyramid: tuple,
    next_pyramid: tuple,
    pts: jnp.ndarray,
    window: int = 21,
    iters: int = 10,
    max_residual: float = 12.0,
    max_displacement: float = 60.0,
    border: int = 12,
):
    """Drop-in TPU-kernel replacement for :func:`lcvo_tpu.ops.klt.pyramidal_klt`."""
    levels = len(prev_pyramid)
    N = pts.shape[0]
    r = (window - 1) // 2
    n_pad = r + 2
    d = jnp.zeros((N, 2), pts.dtype)
    ok = jnp.ones((N,), bool)
    residual = jnp.zeros((N,), pts.dtype)
    for l in reversed(range(levels)):
        scale = jnp.asarray(2.0**-l, pts.dtype)
        pts_l = pts * scale
        prev_p = jnp.pad(prev_pyramid[l], n_pad, mode="edge")
        next_p = jnp.pad(next_pyramid[l], n_pad, mode="edge")
        # align for Mosaic: rows to 8 (+8 slack for aligned superset loads),
        # lanes to 128
        Hp, Wp = prev_p.shape
        # rows to a multiple of 8 (min 40 for the superset), lanes to a
        # multiple of 128 (min 256)
        dh = max(((Hp + 7) // 8) * 8, 40) - Hp
        dw = max(((Wp + 127) // 128) * 128, 256) - Wp
        prev_p = jnp.pad(prev_p, ((0, dh), (0, dw)), mode="edge")
        next_p = jnp.pad(next_p, ((0, dh), (0, dw)), mode="edge")
        d, det_ok, residual = _track_level_pallas(
            prev_p, next_p, pts_l, d, window, iters, n_pad
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
