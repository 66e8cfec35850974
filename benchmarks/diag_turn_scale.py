"""Per-frame scale-leak localization for the arena-loop turn sequence.

Runs the per-frame driver over the 311-frame KITTI-res loop and dumps, for every
frame: est/gt step-length ratio (the instantaneous monocular scale), tracked /
inlier / promoted counts, and the median depth of the live landmark cloud in the
CURRENT camera frame. Shows whether the turn scale drift is a continuous
multiplicative leak, promotion-generation jumps, or a single event.

Run (chip): python benchmarks/diag_turn_scale.py
Writes runs/diag_turn_scale.npz + prints a compact JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lcvo_tpu.config import load_config
    from lcvo_tpu.core import geometry as geo
    from lcvo_tpu.data.render_jax import FastArenaRenderer
    from lcvo_tpu.data.synthetic import trajectory_loop
    from lcvo_tpu.pipeline import VisualOdometry

    W, H, n = 1240, 376, 311
    traj = trajectory_loop(n, speed=0.35, straight_frames=100, turn_frames=45)
    seq = FastArenaRenderer(traj, W, H, occluder=True)
    cfg = load_config(overrides={"image_width": W, "image_height": H,
                                 "find_new_candidates_method": "sift-sift"})
    vo = VisualOdometry(cfg, seq.K)
    rows = []

    @jax.jit
    def depth_stats(state):
        Xc = geo.se3_apply(state.R, state.t, state.tracks.X)
        z = jnp.where(state.tracks.valid, Xc[:, 2], jnp.nan)
        return jnp.nanmedian(z)

    def on_frame(i, res):
        rows.append((int(res.n_tracked), int(res.n_inliers), int(res.n_promoted),
                     float(np.asarray(depth_stats(vo.state)))))

    est = np.asarray(vo.run((seq.frame(i).astype(np.float32) for i in range(n)), n,
                            on_frame=on_frame))
    gap = cfg.bootstrap.frame_gap
    gt = seq.gt_positions()[gap : gap + len(est)]
    d_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt[: len(est)], axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-9)
    arr = np.asarray(rows, np.float64)
    np.savez(os.path.join(_DIR, "runs", "diag_turn_scale.npz"),
             est=est, gt=gt, ratio=ratio, rows=arr)
    # compact summary: per-25-frame median step ratio + counts
    out = []
    for a in range(0, len(ratio) - 25, 25):
        out.append({
            "f": a + gap,
            "step_ratio": round(float(np.median(ratio[a : a + 25])), 4),
            "tracked": int(np.median(arr[a : a + 25, 0])) if len(arr) > a else None,
            "inliers": int(np.median(arr[a : a + 25, 1])) if len(arr) > a else None,
            "promoted_sum": int(np.sum(arr[a : a + 25, 2])) if len(arr) > a else None,
            "median_depth": round(float(np.nanmedian(arr[a : a + 25, 3])), 2) if len(arr) > a else None,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
