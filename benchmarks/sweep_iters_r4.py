"""Round-4 KLT iteration sweep under the warm start: fps + quality gates.

With the constant-velocity warm start, per-level corrections are small — the
fixed iteration count (6) may overspend. Measures sift-sift fps AND the two
decisive quality gates (corridor ATE + turn ATE through the chunked scan on
the chip) at iters 4/5/6.

Run (chip): python benchmarks/sweep_iters_r4.py
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

    import bench
    from lcvo_tpu.config import load_config
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.pipeline import VisualOdometry

    W, H = 1240, 376
    frames, seq = bench._frames(128, W, H)
    n_t = 7 + 19 * 16
    frames_t, seq_t = bench._turn_frames(n_t, W, H)
    gap = 6
    for iters in (6, 5, 4):
        cfg = load_config(overrides={
            "image_width": W, "image_height": H,
            "find_new_candidates_method": "sift-sift",
            "klt": {"iters": iters},
        })
        fps = bench._measure_mode(cfg, frames, seq.K)
        vo = VisualOdometry(cfg, seq.K)
        traj = vo.run_chunked(np.stack(frames[: 7 + 6 * 16]), chunk=16)
        gt = seq.gt_positions()[gap : gap + len(traj)]
        ate_c = ate_rmse(np.asarray(traj), gt[: len(traj)])
        vo_t = VisualOdometry(cfg, seq_t.K)
        traj_t = vo_t.run_chunked(np.stack(frames_t), chunk=16)
        gt_t = seq_t.gt_positions()[gap : gap + len(traj_t)]
        ate_t = ate_rmse(np.asarray(traj_t), gt_t[: len(traj_t)])
        print(json.dumps({"iters": iters, "fps": round(fps, 2),
                          "ate_corridor_m": round(ate_c, 4),
                          "ate_turn_m": round(ate_t, 4)}), flush=True)


if __name__ == "__main__":
    main()
