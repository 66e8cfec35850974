"""Pallas TPU block-extraction kernel for the Lucas-Kanade tracker.

The XLA formulation (:mod:`lcvo_tpu.ops.klt`) pays ~6 ms per level extracting
per-track blocks from HBM with ``dynamic_slice`` gathers. Here the whole (padded)
pyramid level lives in VMEM — a KITTI-resolution level 0 is ~2 MB, far under the
~16 MB/core budget — and each track's (S, S) block is one cheap VMEM
aligned-superset load (+ ``pltpu.roll`` for the residual offset). The iteration
math itself stays in the einsum formulation of :mod:`lcvo_tpu.ops.klt`.

A full in-kernel IC-LK tracker (template, Hessian and the iteration fori_loop all
inside one Pallas program, serial per track) was built and benchmarked against the
block-extraction + interpolation-einsum path on v5e
(``benchmarks/micro_klt_pallas.py``, 2026-08-19): it measured **3.0-4.6x slower**
at every production operating point (N=512/2048, win 15/21 — e.g. 23.4 ms vs
5.1 ms at N=2048/win15/iters6), because the serial per-track scalar flow control
wastes the VPU while the einsum path keeps the whole track batch on the MXU. It
was therefore deleted (VERDICT r1 #4) — only this extraction kernel survives in
the production path (``klt._extract_blocks``).

Reference equivalence: the gather stage of ``cv2.calcOpticalFlowPyrLK``
(reference ``src/vo_pipeline.py:215,501``).
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
            jax.ShapeDtypeStruct((N, S, S), img.dtype),
            jax.ShapeDtypeStruct((N, 2), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(centers, img)
    return blocks, orig.astype(centers.dtype)
