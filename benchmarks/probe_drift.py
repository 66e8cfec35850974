"""Secular scale-drift probe (round 5): the flagship turn replay's residual
error is a smooth -0.04%/frame scale decay (no collapse events). This drives
the first N frames of datasets/turn through the chunked CLI path for candidate
promotion/refinement knobs and reports the per-100-frame scale trace + its
log-slope — the direct metric for the decay, far cheaper than a full replay.

Run (chip): python benchmarks/probe_drift.py --variants base alpha2 ratio20 imp115
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--variants", nargs="*", default=("base",))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.datasets import load_dataset
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.pipeline import VisualOdometry

    ds = load_dataset("kitti", os.path.join(_DIR, "datasets", "turn"))
    gt = ds.gt_positions()

    VAR = {
        "base": {},
        "alpha2": {"triangulation": {"alpha_deg": 2.0}},
        "alpha3": {"triangulation": {"alpha_deg": 3.0}},
        "ratio20": {"triangulation": {"max_depth_baseline_ratio": 20.0}},
        "ratio15": {"triangulation": {"max_depth_baseline_ratio": 15.0}},
        "imp115": {"triangulation": {"refine_min_improve": 1.15}},
        "imp105": {"triangulation": {"refine_min_improve": 1.05}},
        "imp110": {"triangulation": {"refine_min_improve": 1.10}},
        "imp115_alpha2": {"triangulation": {"refine_min_improve": 1.15, "alpha_deg": 2.0}},
        "imp15": {"triangulation": {"refine_min_improve": 1.5}},
        "kf3": {"ba": {"keyframe_every": 3}},
        "win21": {"klt": {"window": 21, "iters": 8}},
        "win11": {"klt": {"window": 11}},
        "eps3": {"klt": {"eps": 0.003}},
        "eps1": {"klt": {"eps": 0.001}},
        "eps0": {"klt": {"eps": 0.0}},
        "eps3_kf3": {"klt": {"eps": 0.003}, "ba": {"keyframe_every": 3}},
        "maxd40": {"triangulation": {"max_depth": 40.0}},
        "maxd25": {"triangulation": {"max_depth": 25.0}},
        "mind3": {"triangulation": {"min_depth": 3.0}},
        "alpha15": {"triangulation": {"alpha_deg": 1.5}},
    }
    frames = [ds.frame(i) for i in range(args.frames)]
    for name in args.variants:
        ov = {"image_width": 1240, "image_height": 376}
        for k, v in VAR[name].items():
            ov.setdefault(k, {}).update(v)
        cfg = load_config(os.path.join(_DIR, "configs", "turn_robust.yaml"), ov)
        vo = VisualOdometry(cfg, ds.K)
        est = np.asarray(vo.run_chunked(np.stack(frames), chunk=16))
        gap = cfg.bootstrap.frame_gap
        gt_al = gt[gap : gap + len(est)]
        d_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(gt_al[: len(est)], axis=0), axis=1)
        seg = 100
        scales = []
        for s in range(0, len(d_est) - seg, seg):
            scales.append(d_est[s : s + seg].sum() / max(d_gt[s : s + seg].sum(), 1e-9))
        sl = np.asarray(scales)
        # log-linear drift rate per frame over the trace
        t = np.arange(len(sl)) * seg
        slope = np.polyfit(t, np.log(np.maximum(sl, 1e-9)), 1)[0]
        print(json.dumps({
            "variant": name,
            "ate_m": round(ate_rmse(est, gt_al[: len(est)]), 3),
            "reboots": vo.n_rebootstraps,
            "scale100": [round(float(x), 3) for x in sl],
            "drift_pct_per_frame": round(float(slope) * 100, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
