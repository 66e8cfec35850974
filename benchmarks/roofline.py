"""Speed-of-light accounting for the sift-sift frame step (VERDICT r2 #4/#9).

For each pipeline stage at bench shapes (KITTI res, default capacities):
XLA compiled cost analysis (FLOPs, HBM bytes accessed) + measured steady-state
time on the chip -> achieved GB/s and GFLOP/s, as a fraction of the chip's peaks.
Identifies which stages are bandwidth-bound vs latency/dispatch-bound and how far
each sits from the hardware roofline.

Peaks (TPU v5e, public spec): HBM ~819 GB/s, MXU 197 TFLOP/s bf16 / ~49 TFLOP/s
fp32-equivalent. The pipeline computes in fp32.

Timing fence: every measured callable is wrapped to reduce its outputs to ONE
scalar inside jit, and each timing ends with a host read of that scalar — on the
tunneled chip ``block_until_ready`` does not wait for remote completion and
fetching a full leaf costs ~2-3 ms/MB of tunnel transfer (BASELINE.md round-2
timing note).

Run on the chip:  python benchmarks/roofline.py
Writes benchmarks/ROOFLINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lcvo_tpu.config import load_config
from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import pnp
from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.pyramid import build_pyramid
from lcvo_tpu.utils.profiling import cost_analysis

HBM_PEAK_GBS = 819.0       # v5e HBM bandwidth
FP32_PEAK_GFLOPS = 49e3    # v5e fp32-equivalent matmul peak (197 TF bf16 / 4)


def _scalarize(fn):
    """Wrap fn so it returns one f32 scalar dependent on every output leaf."""

    def wrapped(*args):
        out = fn(*args)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        acc = jnp.float32(0)
        for l in leaves:
            acc = acc + jnp.sum(l).astype(jnp.float32)
        return acc

    return jax.jit(wrapped)


def measure(name, fn, *args, n=30):
    """(ms, flops, bytes) for one stage: plain fn for cost analysis, scalarized
    fn for wall timing."""
    ca = cost_analysis(fn, *args)
    f = _scalarize(fn)
    float(f(*args))  # compile + first run
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.perf_counter() - t0) / n
    return dt, float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    W, H = 1240, 376
    cfg = load_config(overrides={
        "image_width": W, "image_height": H,
        "find_new_candidates_method": "sift-sift",
    })
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    kltc = cfg.klt
    N = cfg.state.max_tracks + cfg.state.max_candidates
    pts = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20], (N, 2)), jnp.float32)
    pyr0 = build_pyramid(img0, kltc.levels)
    pyr1 = build_pyramid(img1, kltc.levels)
    K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
    Kj = jnp.asarray(K)
    key = jax.random.PRNGKey(0)

    stages = {}

    stages["pyramid"] = measure("pyramid", lambda im: build_pyramid(im, kltc.levels), img1)

    stages["klt"] = measure(
        "klt",
        lambda a, b, p: pyramidal_klt(
            a, b, p, window=kltc.window, iters=kltc.iters,
            max_residual=kltc.max_residual, max_displacement=kltc.max_displacement,
            border=kltc.border,
        ),
        pyr0, pyr1, pts,
    )

    nt = cfg.state.max_tracks
    X = jnp.asarray(rng.uniform([-10, -5, 4], [10, 5, 60], (nt, 3)), jnp.float32)
    x_obs = geo.normalize_points(pts[:nt], Kj)
    valid = jnp.ones((nt,), bool)
    stages["pnp_ransac"] = measure(
        "pnp_ransac",
        lambda k, X, x, v: pnp.pnp_ransac(
            k, X, x, v, thresh=cfg.ransac.pnp_thresh_px / 718.0,
            n_hyp=cfg.ransac.pnp_hypotheses, refine_iters=cfg.ransac.refine_iters,
        ),
        key, X, x_obs, valid,
    )

    from lcvo_tpu.frontend import match as mt
    from lcvo_tpu.frontend import sift as sf

    d = cfg.detector
    stages["sift_detect_describe"] = measure(
        "sift",
        lambda im: sf.sift(
            im, max_keypoints=cfg.descriptor.max_keypoints, octaves=d.sift_octaves,
            scales_per_octave=d.sift_scales_per_octave,
            contrast_thresh=d.sift_contrast_thresh, edge_thresh=d.sift_edge_thresh,
            compute_desc=True,
        ),
        img1,
    )

    nk = cfg.descriptor.max_keypoints
    da = jnp.asarray(rng.normal(size=(nk, 128)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(nk, 128)), jnp.float32)
    va = jnp.ones((nk,), bool)
    stages["bf_match"] = measure(
        "match", lambda a, va_, b, vb: mt.knn_match_ratio(a, va_, b, vb, ratio=0.8),
        da, va, db, va,
    )

    nc = cfg.state.max_candidates
    Rf = jnp.broadcast_to(jnp.eye(3), (nc, 3, 3))
    tf = jnp.zeros((nc, 3))
    Cc = pts[nt:]
    Ff = Cc + 2.0

    def tri_block(Rf, tf, Ff, Cc):
        R = jnp.eye(3)
        t = jnp.zeros(3)
        ang = geo.bearing_angle(Rf, tf, R, t, Ff, Cc, Kj)
        x_f = geo.normalize_points(Ff, Kj)
        x_c = geo.normalize_points(Cc, Kj)
        X_tri = geo.triangulate_linear(Rf, tf, R, t, x_f, x_c)
        return ang, X_tri

    stages["triangulate_validate"] = measure("tri", tri_block, Rf, tf, Ff, Cc)

    from lcvo_tpu.core import state as st
    from lcvo_tpu.pipeline import make_process_frame

    fn = make_process_frame(cfg, K)
    state = st.make_vo_state(cfg, (H, W))
    tracks = state.tracks._replace(
        P=state.tracks.P.at[:nt].set(pts[:nt]),
        X=state.tracks.X.at[:nt].set(X),
        valid=state.tracks.valid.at[:nt].set(True),
    )
    state = state._replace(tracks=tracks, prev_image=img0, prev_pyramid=pyr0)
    stages["FULL_step"] = measure("full", fn, state, img1, key)

    rows = []
    for name, (dt, fl, by) in stages.items():
        gbs = by / dt / 1e9 if dt > 0 else 0.0
        gfs = fl / dt / 1e9 if dt > 0 else 0.0
        rows.append({
            "stage": name,
            "ms": round(dt * 1e3, 3),
            "gflops": round(fl / 1e9, 3),
            "mbytes": round(by / 1e6, 2),
            "achieved_GBps": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 1),
            "pct_fp32_peak": round(100 * gfs / FP32_PEAK_GFLOPS, 2),
        })

    md = [
        "# Roofline — sift-sift frame step on one chip (KITTI res)",
        "",
        f"Backend: {jax.default_backend()}; peaks used: HBM {HBM_PEAK_GBS:.0f} GB/s, "
        f"fp32 {FP32_PEAK_GFLOPS / 1e3:.0f} TFLOP/s (v5e public spec).",
        "FLOPs / bytes from XLA `compiled.cost_analysis()`; times are steady-state",
        "with a scalar host-read fence (see module docstring).",
        "",
        "| stage | ms | GFLOP | MB accessed | achieved GB/s | % HBM peak | % fp32 peak |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['stage']} | {r['ms']} | {r['gflops']} | {r['mbytes']} | "
            f"{r['achieved_GBps']} | {r['pct_hbm_peak']} | {r['pct_fp32_peak']} |"
        )
    md += [
        "",
        "Reading: a stage near the HBM-peak column is bandwidth-bound (at the",
        "roofline — faster only by moving fewer bytes); low on both columns means",
        "latency/dispatch-bound (small tensors, serial dependency chains), where",
        "fusing into the surrounding program (already done — these stage numbers",
        "measure isolated dispatches) or batching is the only lever. The FULL_step",
        "row is the whole compiled frame program; its bytes/time ratio is the",
        "pipeline's aggregate bandwidth utilisation.",
        "",
    ]
    out_path = os.path.join(os.path.dirname(__file__), "ROOFLINE.md")
    with open(out_path, "w") as fh:
        fh.write("\n".join(md))
    print(json.dumps({"metric": "roofline", "stages": rows, "md": out_path}))


if __name__ == "__main__":
    main()
