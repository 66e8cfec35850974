"""Trajectory accuracy metrics (ATE / RPE) and per-frame counters.

The reference never computes quantitative error — trajectories are compared by eye
against ground-truth plots (``README.md:14-33``; statement §1.3.1). The BASELINE
north-star requires ATE/RPE, so they are first-class here. Monocular VO has a free
global scale, so ATE uses a Sim(3) (Umeyama) alignment before the RMSE.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning est → gt.

    est, gt: (N, 3). Returns (s, R, t) with gt ≈ s * R @ est + t.
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = xg.T @ xe / len(est)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (xe**2).sum() / len(est)
    s = float(np.trace(np.diag(d) @ S) / var_e) if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray, with_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE of aligned positions), meters."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape, (est.shape, gt.shape)
    s, R, t = umeyama_alignment(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def rpe_stats(est_positions: np.ndarray, gt_positions: np.ndarray, delta: int = 1, with_scale: bool = True):
    """Relative pose (translation-drift) error over ``delta``-frame intervals.

    Returns (rmse, median) of per-interval translation error after global Sim(3)
    alignment, meters.
    """
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    s, R, t = umeyama_alignment(est, gt, with_scale)
    est_a = (s * (R @ est.T)).T + t
    d_est = est_a[delta:] - est_a[:-delta]
    d_gt = gt[delta:] - gt[:-delta]
    err = np.linalg.norm(d_est - d_gt, axis=1)
    return float(np.sqrt(np.mean(err**2))), float(np.median(err))


class MetricsLogger:
    """Structured per-frame metrics emission (JSONL), replacing the reference's
    print-based observability (``src/main.py:214,231-237``,
    ``src/vo_pipeline.py:267-272``). One dict per frame; cheap host-side."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.rows: list[dict] = []
        self._fh = open(path, "w") if path else None

    def log_frame(self, frame_idx: int, result) -> dict:
        row = {
            "frame": int(frame_idx),
            "pose_ok": bool(np.asarray(result.pose_ok)),
            "tracked": int(np.asarray(result.n_tracked)),
            "inliers": int(np.asarray(result.n_inliers)),
            "candidates": int(np.asarray(result.n_candidates)),
            "promoted": int(np.asarray(result.n_promoted)),
            "reproj_rms_px": float(np.asarray(result.reproj_rms)),
        }
        self.rows.append(row)
        if self._fh:
            import json

            self._fh.write(json.dumps(row) + "\n")
        return row

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def summary(self) -> dict:
        if not self.rows:
            return {}
        import statistics

        return {
            # per-frame metric rows (continuous-operation steps only — bootstrap
            # and held recovery poses have no metrics row); named distinctly so
            # it can't clobber the driver's trajectory-length "frames"
            "metric_rows": len(self.rows),
            "pose_ok_rate": sum(r["pose_ok"] for r in self.rows) / len(self.rows),
            "mean_tracked": statistics.fmean(r["tracked"] for r in self.rows),
            "mean_inliers": statistics.fmean(r["inliers"] for r in self.rows),
            "mean_reproj_rms_px": statistics.fmean(r["reproj_rms_px"] for r in self.rows),
        }
