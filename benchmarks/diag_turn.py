"""Diagnose turn-sequence drift: which factor drives the arena-loop ATE.

Variants over the same 311-frame KITTI-res arena loop (two 90° corners):
occluder on/off x BA on/off x candidate mode. Prints one JSON line per variant
with Sim(3) ATE, KITTI-style segment error (exact GT poses are available), and
scale-drift statistics (per-50-frame Umeyama scale of est vs gt — monocular
scale drift through corners shows up here long before ATE explains it).

Run (chip): python benchmarks/diag_turn.py [--variants base noocc ba ba_noocc shi]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def seg_scales(est, gt, seg=50):
    """Per-segment Umeyama scale of est→gt: drift shows as spread."""
    from lcvo_tpu.metrics import umeyama_alignment

    out = []
    for a in range(0, len(est) - seg, seg):
        s, _, _ = umeyama_alignment(est[a : a + seg], gt[a : a + seg])
        out.append(round(float(s), 4))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=311)
    ap.add_argument("--variants", nargs="*", default=("base", "noocc", "ba"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.render_jax import FastArenaRenderer
    from lcvo_tpu.data.synthetic import trajectory_loop
    from lcvo_tpu.metrics import ate_rmse, kitti_odometry_error
    from lcvo_tpu.pipeline import VisualOdometry

    W, H = 1240, 376
    n = args.frames
    traj = trajectory_loop(n, speed=0.35, straight_frames=100, turn_frames=45)

    frames_cache = {}

    def frames_for(occluder):
        if occluder not in frames_cache:
            seq = FastArenaRenderer(traj, W, H, occluder=occluder)
            frames_cache[occluder] = (
                np.stack([seq.frame(i) for i in range(n)]).astype(np.float32), seq)
        return frames_cache[occluder]

    VAR = {
        "base": dict(mode="sift-sift", ba=False, occ=True),
        "seed1": dict(mode="sift-sift", ba=False, occ=True, seed=1),
        "seed2": dict(mode="sift-sift", ba=False, occ=True, seed=2),
        "ratio0": dict(mode="sift-sift", ba=False, occ=True, ratio=0.0),
        "ratio0_seed1": dict(mode="sift-sift", ba=False, occ=True, ratio=0.0, seed=1),
        "alpha2": dict(mode="sift-sift", ba=False, occ=True, alpha=2.0),
        "reproj15": dict(mode="sift-sift", ba=False, occ=True, reproj=1.5),
        "reproj15_seed1": dict(mode="sift-sift", ba=False, occ=True, reproj=1.5, seed=1),
        "reproj15_seed2": dict(mode="sift-sift", ba=False, occ=True, reproj=1.5, seed=2),
        "ba_reproj15": dict(mode="sift-sift", ba=True, occ=True, reproj=1.5),
        "lmba": dict(mode="sift-sift", ba=True, lmonly=True, occ=True),
        "lmba_seed1": dict(mode="sift-sift", ba=True, lmonly=True, occ=True, seed=1),
        "lmba_seed2": dict(mode="sift-sift", ba=True, lmonly=True, occ=True, seed=2),
        "reproj10": dict(mode="sift-sift", ba=False, occ=True, reproj=1.0),
        "ratio20": dict(mode="sift-sift", ba=False, occ=True, ratio=20.0),
        "perframe": dict(mode="sift-sift", ba=False, occ=True, perframe=True),
        "noocc": dict(mode="sift-sift", ba=False, occ=False),
        "ba": dict(mode="sift-sift", ba=True, occ=True),
        "ba_noocc": dict(mode="sift-sift", ba=True, occ=False),
        "shi": dict(mode="shi-mask", ba=False, occ=True),
        # round-5: continuous anchor re-triangulation (triangulation.track_refine)
        "tr": dict(mode="sift-sift", ba=False, occ=True, tr=True),
        "tr_seed1": dict(mode="sift-sift", ba=False, occ=True, tr=True, seed=1),
        "tr_seed2": dict(mode="sift-sift", ba=False, occ=True, tr=True, seed=2),
        "tr_lmba": dict(mode="sift-sift", ba=True, lmonly=True, occ=True, tr=True),
        "tr_lmba_seed1": dict(mode="sift-sift", ba=True, lmonly=True, occ=True, tr=True, seed=1),
        "tr_lmba_seed2": dict(mode="sift-sift", ba=True, lmonly=True, occ=True, tr=True, seed=2),
        "tr_ba": dict(mode="sift-sift", ba=True, occ=True, tr=True),
        "tr_ba_seed1": dict(mode="sift-sift", ba=True, occ=True, tr=True, seed=1),
        "tr_ba_seed2": dict(mode="sift-sift", ba=True, occ=True, tr=True, seed=2),
        # round-5 KLT schedule candidates (fps: sweep_r5.py)
        "ic2": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 2)),
        "ic2_seed1": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 2), seed=1),
        "ic2_seed2": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 2), seed=2),
        "tl2": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 0)),
        "tl2_seed1": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 0), seed=1),
        "tl2_seed2": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 0), seed=2),
        "tl2ic3": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 3)),
        "tl2ic3_seed1": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 3), seed=1),
        "tl2ic3_seed2": dict(mode="sift-sift", ba=False, occ=True, sched=(2, 3), seed=2),
        "ic3": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 3)),
        "ic3_seed1": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 3), seed=1),
        "ic3_seed2": dict(mode="sift-sift", ba=False, occ=True, sched=(0, 3), seed=2),
        "trba_ic3": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 3)),
        "trba_ic3_seed1": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 3), seed=1),
        "trba_ic3_seed2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 3), seed=2),
        # round-5 drift root cause: KLT convergence-eps deadband (probe_drift.py)
        "eps3": dict(mode="sift-sift", ba=False, occ=True, eps=0.003),
        "eps3_seed1": dict(mode="sift-sift", ba=False, occ=True, eps=0.003, seed=1),
        "eps3_seed2": dict(mode="sift-sift", ba=False, occ=True, eps=0.003, seed=2),
        "trba_eps3": dict(mode="sift-sift", ba=True, occ=True, gauge="newest",
                          eps=0.003, imp=1.3, sched=(0, 0)),
        "trba_eps3_seed1": dict(mode="sift-sift", ba=True, occ=True, gauge="newest",
                                eps=0.003, imp=1.3, sched=(0, 0), seed=1),
        "trba_eps3_seed2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest",
                                eps=0.003, imp=1.3, sched=(0, 0), seed=2),
        # round-5 drift fix: refine_min_improve 1.15 (probe_drift.py)
        "imp115": dict(mode="sift-sift", ba=False, occ=True, imp=1.15),
        "imp115_seed1": dict(mode="sift-sift", ba=False, occ=True, imp=1.15, seed=1),
        "imp115_seed2": dict(mode="sift-sift", ba=False, occ=True, imp=1.15, seed=2),
        "trba_imp115": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", imp=1.15, sched=(0, 0)),
        "trba_imp115_seed1": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", imp=1.15, sched=(0, 0), seed=1),
        "trba_imp115_seed2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", imp=1.15, sched=(0, 0), seed=2),
        "trba_ic2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 2)),
        "trba_ic2_seed1": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 2), seed=1),
        "trba_ic2_seed2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", sched=(0, 2), seed=2),
        # round-5: newest-anchored gauge (backward smoothing — live pose frozen)
        "ba_new": dict(mode="sift-sift", ba=True, occ=True, gauge="newest"),
        "ba_new_seed1": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", seed=1),
        "ba_new_seed2": dict(mode="sift-sift", ba=True, occ=True, gauge="newest", seed=2),
        "tr_ba_new": dict(mode="sift-sift", ba=True, occ=True, tr=True, gauge="newest"),
        "tr_ba_new_seed1": dict(mode="sift-sift", ba=True, occ=True, tr=True, gauge="newest", seed=1),
        "tr_ba_new_seed2": dict(mode="sift-sift", ba=True, occ=True, tr=True, gauge="newest", seed=2),
    }
    for name in args.variants:
        v = VAR[name]
        frames, seq = frames_for(v["occ"])
        ov = {"image_width": W, "image_height": H,
              "find_new_candidates_method": v["mode"]}
        if v["ba"]:
            ov["ba"] = {"enabled": True, "landmarks_only": bool(v.get("lmonly")),
                        "gauge": v.get("gauge", "oldest")}
        if "seed" in v:
            ov["seed"] = v["seed"]
        if "ratio" in v:
            ov["triangulation"] = {"max_depth_baseline_ratio": v["ratio"]}
        if "alpha" in v:
            ov.setdefault("triangulation", {})["alpha_deg"] = v["alpha"]
        if "reproj" in v:
            ov.setdefault("triangulation", {})["max_reproj_px"] = v["reproj"]
        if v.get("tr"):
            ov.setdefault("triangulation", {})["track_refine"] = True
        if "sched" in v:
            tl, ic = v["sched"]
            ov["klt"] = {"track_levels": tl, "iters_coarse": ic}
        if "imp" in v:
            ov.setdefault("triangulation", {})["refine_min_improve"] = v["imp"]
        if "eps" in v:
            ov.setdefault("klt", {})["eps"] = v["eps"]
        if "kf" in v:
            ov.setdefault("ba", {})["keyframe_every"] = v["kf"]
        cfg = load_config(overrides=ov)
        vo = VisualOdometry(cfg, seq.K)
        if v.get("perframe"):
            est = np.asarray(vo.run((f for f in frames), len(frames)))
        else:
            est = np.asarray(vo.run_chunked(frames, chunk=16))
        gap = cfg.bootstrap.frame_gap
        gt = seq.gt_positions()[gap : gap + len(est)]
        gt_T = np.tile(np.eye(4), (n, 1, 1))
        gt_T[:, :3, :3] = seq.R_wc
        gt_T[:, :3, 3] = seq.t_wc
        est_T = np.asarray(vo.poses)
        t_pct, r_dpm, nseg = kitti_odometry_error(
            est_T, gt_T[gap : gap + len(est)], lengths=(25, 50), step=10)
        print(json.dumps({
            "variant": name,
            "ate_m": round(ate_rmse(est, gt[: len(est)]), 4),
            "kitti_t_err_pct_25_50m": None if t_pct is None else round(t_pct, 3),
            "kitti_r_err_deg_per_m": None if r_dpm is None else round(r_dpm, 5),
            "pose_ok_rate": round(float(np.mean(vo.pose_ok_flags)), 4),
            "n_rebootstraps": vo.n_rebootstraps,
            "seg50_scales": seg_scales(est, gt[: len(est)]),
        }), flush=True)


if __name__ == "__main__":
    main()
