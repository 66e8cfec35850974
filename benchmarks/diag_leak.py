"""Diagnose the long-horizon inlier decay seen in the 2,760-frame replay
(run A, round 3: median inliers 69 -> 1 over ~1,000 frames, collapse at ~1058).

Runs the corridor sequence on CPU at reduced resolution for N frames, logging
per-frame table occupancy and flow: tracked, inliers, candidates, promoted,
track-table count. Prints a compact trend table per config (BA on/off).

Run: python benchmarks/diag_leak.py [--frames 700] [--width 620 --height 188]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    sys.argv.remove("--tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--height", type=int, default=188)
    ap.add_argument("--mode", default="sift-sift")
    ap.add_argument("--ba", action="store_true")
    ap.add_argument("--speed", type=float, default=0.35)
    args = ap.parse_args()

    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.render_jax import FastCorridorRenderer
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.pipeline import VisualOdometry

    seq = FastCorridorRenderer(args.frames, args.width, args.height, speed=args.speed)
    ov = {"image_width": args.width, "image_height": args.height,
          "find_new_candidates_method": args.mode}
    if args.ba:
        ov["ba"] = {"enabled": True}
    cfg = load_config(overrides=ov)
    vo = VisualOdometry(cfg, seq.K)
    gap = cfg.bootstrap.frame_gap

    log = []

    def on_frame(i, res):
        log.append((
            int(res.n_tracked), int(res.n_inliers), int(res.n_candidates),
            int(res.n_promoted), int(vo.state.tracks.count()),
            bool(res.pose_ok), float(res.reproj_rms),
        ))

    traj = vo.run((seq.frame(i) for i in range(args.frames)), args.frames,
                  on_frame=on_frame)
    est = np.asarray(traj)
    gt = seq.gt_positions()[gap : gap + len(est)]
    n = min(len(gt), len(est))
    print(f"\nmode={args.mode} ba={args.ba} frames={args.frames} "
          f"ATE={ate_rmse(est[:n], gt[:n]):.3f} m")
    print(f"{'frame':>6} {'tracked':>8} {'inliers':>8} {'cands':>6} "
          f"{'promo':>6} {'tblcnt':>7} {'ok':>5} {'rms_px':>7}")
    a = np.asarray([r[:5] for r in log], np.float32)
    oks = np.asarray([r[5] for r in log])
    rms = np.asarray([r[6] for r in log])
    for s in range(0, len(log), 50):
        seg = a[s : s + 50]
        print(f"{s:>6} {np.median(seg[:,0]):>8.0f} {np.median(seg[:,1]):>8.0f} "
              f"{np.median(seg[:,2]):>6.0f} {np.sum(seg[:,3])/len(seg):>6.1f} "
              f"{np.median(seg[:,4]):>7.0f} {np.mean(oks[s:s+50]):>5.2f} "
              f"{np.median(rms[s:s+50]):>7.2f}")


if __name__ == "__main__":
    main()
