"""Per-frame microscope on the turn-replay failure window.

The 2,760-frame turn replay deterministically starves (PnP inliers 400 -> 9)
inside turn 1 (frames ~565-610 of datasets/turn) and recovers at ~611-618.
This runs the per-frame driver over frames 0..N_STOP of the SAME dataset and
logs, per frame: inliers, tracked, candidates, promoted, est step length, and
the median CURRENT-frame depth of (a) the landmark cloud, (b) the landmarks
promoted THIS frame — to see whether starvation is detection-side (no new
candidates), promotion-side (gates closed), or map-side (bad depths).

Run (chip): python benchmarks/diag_turn_window.py [--stop 700]
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
    ap.add_argument("--stop", type=int, default=700)
    ap.add_argument("--config", default=None, help="YAML preset (e.g. configs/turn_robust.yaml)")
    ap.add_argument("--focus", type=int, nargs=2, default=(540, 640),
                    help="frame range printed densely (every frame)")
    ap.add_argument("--out-tag", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lcvo_tpu.config import load_config
    from lcvo_tpu.core import geometry as geo
    from lcvo_tpu.data.datasets import load_dataset
    from lcvo_tpu.pipeline import VisualOdometry

    ds = load_dataset("kitti", os.path.join(_DIR, "datasets", "turn"))
    cfg = load_config(args.config,
                      overrides={"image_width": 1240, "image_height": 376,
                                 "find_new_candidates_method": "sift-sift"})
    vo = VisualOdometry(cfg, ds.K)

    @jax.jit
    def stats(state):
        Xc = geo.se3_apply(state.R, state.t, state.tracks.X)
        z = jnp.where(state.tracks.valid, Xc[:, 2], jnp.nan)
        young = state.tracks.valid & (state.tracks.gen == jnp.max(state.tracks.gen))
        return jnp.nanmedian(z), jnp.sum(state.cands.valid)

    rows = []

    def on_frame(i, res):
        md, nc = stats(vo.state)
        rows.append(dict(i=i, inl=int(res.n_inliers), trk=int(res.n_tracked),
                         prom=int(res.n_promoted), cands=int(nc),
                         med_depth=round(float(np.asarray(md)), 2),
                         ok=bool(res.pose_ok)))

    est = np.asarray(vo.run((ds.frame(i) for i in range(args.stop)), args.stop,
                            on_frame=on_frame))
    gt = ds.gt_positions()[6 : 6 + len(est)]
    d_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt[: len(est)], axis=0), axis=1)
    for r, sr in zip(rows[1:], d_est / np.maximum(d_gt, 1e-9)):
        r["step_ratio"] = round(float(sr), 3)
    out = os.path.join(_DIR, "runs", f"diag_turn_window{args.out_tag}.jsonl")
    with open(out, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    lo, hi = args.focus
    for r in rows:
        f = r["i"]
        if f % 10 == 0 or (lo <= f <= hi):
            print(json.dumps(r))


if __name__ == "__main__":
    main()
