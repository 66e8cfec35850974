"""Unit tests for trajectory metrics: Sim(3) ATE, drift stat, and the standard
RPE / KITTI odometry metrics added for VERDICT r2 #5 — asserted against
hand-computed values on constructed trajectories."""

import numpy as np

from lcvo_tpu.metrics import (
    ate_rmse,
    kitti_odometry_error,
    rpe_pose,
    rpe_stats,
    umeyama_alignment,
)


def _pose(R=None, t=(0, 0, 0)):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = t
    return T


def _yaw(deg):
    a = np.radians(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _straight(n, step=1.0, yaw_per_frame=0.0):
    """cam→world poses moving +z at ``step`` m/frame with constant yaw rate."""
    out = []
    pos = np.zeros(3)
    for i in range(n):
        R = _yaw(yaw_per_frame * i)
        out.append(_pose(R, pos))
        pos = pos + R @ np.array([0.0, 0.0, step])
    return np.asarray(out)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    est = rng.normal(size=(40, 3))
    R_true = _yaw(31.0)
    gt = 2.5 * (R_true @ est.T).T + np.array([1.0, -2.0, 3.0])
    s, R, t = umeyama_alignment(est, gt)
    assert np.isclose(s, 2.5, atol=1e-9)
    assert np.allclose(R, R_true, atol=1e-9)
    assert ate_rmse(est, gt) < 1e-9


def test_rpe_pose_zero_on_exact():
    T = _straight(30, yaw_per_frame=0.5)
    r = rpe_pose(T, T)
    assert r["trans_rmse_m"] < 1e-9 and r["rot_rmse_deg"] < 1e-8


def test_rpe_pose_hand_computed_translation_and_rotation():
    """Per-interval error motion E_i = rel_gt^-1 rel_est. gt steps (0,0,1); est
    steps (0.1,0,1) with a constant 2° yaw bias per step → trans err exactly
    ||(0.1,0,0) + rotation-induced term||; with identity est rotations and a 2°
    rotated gt, rot err is exactly 2° per interval."""
    n = 10
    gt = _straight(n, step=1.0, yaw_per_frame=2.0)
    est = []
    pos = np.zeros(3)
    for i in range(n):
        est.append(_pose(_yaw(2.0 * i), pos))
        pos = pos + _yaw(2.0 * i) @ np.array([0.1, 0.0, 1.0])
    est = np.asarray(est)
    r = rpe_pose(est, gt, with_scale=False)
    # rotations identical → rot error 0; rel translations differ by (0.1,0,0)
    # in the frame of pose i → error norm exactly 0.1 every interval
    assert np.isclose(r["rot_rmse_deg"], 0.0, atol=1e-8)
    assert np.isclose(r["trans_rmse_m"], 0.1, atol=1e-9)
    assert np.isclose(r["trans_median_m"], 0.1, atol=1e-9)

    # now give est a constant extra 3° yaw per step, same translations as gt
    est2 = _straight(n, step=1.0, yaw_per_frame=5.0)
    r2 = rpe_pose(est2, gt, with_scale=False)
    assert np.isclose(r2["rot_rmse_deg"], 3.0, atol=1e-6)


def test_rpe_pose_scale_correction():
    """A pure scale offset (monocular free scale) must vanish under with_scale."""
    gt = _straight(25)
    est = gt.copy()
    est[:, :3, 3] *= 0.37
    r = rpe_pose(est, gt, with_scale=True)
    assert r["trans_rmse_m"] < 1e-9
    r_raw = rpe_pose(est, gt, with_scale=False)
    assert np.isclose(r_raw["trans_rmse_m"], 0.63, atol=1e-9)  # 1 m steps, 63% short


def test_kitti_odometry_error_hand_computed():
    """Straight 1 m/frame gt, est uniformly 2% long (scale correction off):
    every segment's translation error is exactly 2%, rotation 0."""
    gt = _straight(450)
    est = gt.copy()
    est[:, :3, 3] *= 1.02
    t_pct, r_dpm, nseg = kitti_odometry_error(
        est, gt, lengths=(100, 200, 300), step=50, with_scale=False
    )
    assert nseg > 0
    assert np.isclose(t_pct, 2.0, atol=1e-6)
    assert np.isclose(r_dpm, 0.0, atol=1e-9)
    # and with scale correction the same offset vanishes
    t_pct_s, _, _ = kitti_odometry_error(est, gt, lengths=(100, 200, 300), step=50)
    assert t_pct_s < 1e-6


def test_kitti_odometry_error_too_short():
    gt = _straight(30)
    t_pct, r_dpm, nseg = kitti_odometry_error(gt, gt, lengths=(100,))
    assert nseg == 0 and t_pct is None


def test_rpe_stats_trend():
    gt = _straight(40)[:, :3, 3]
    est = gt + np.array([0.05, 0.0, 0.0]) * np.arange(40)[:, None]  # linear drift
    rmse, med = rpe_stats(est, gt)
    assert 0 < med < 0.2 and rmse < 0.2


def test_segment_scale_stats_uniform_scale_is_flat():
    from lcvo_tpu.metrics import segment_scale_stats

    gt = _straight(200)[:, :3, 3]
    est = 3.0 * gt  # uniform monocular scale: every segment ratio identical
    s = segment_scale_stats(est, gt, seg=50)
    assert s["n_segments"] == 4
    assert abs(s["seg_scale_min"] - 1.0) < 1e-6
    assert abs(s["seg_scale_max"] - 1.0) < 1e-6
    assert s["seg_scale_worst"] < 1e-6


def test_segment_scale_stats_detects_decay():
    from lcvo_tpu.metrics import segment_scale_stats

    gt = _straight(200)[:, :3, 3]
    # scale halves in the last quarter: the decay-spiral signature
    step = np.ones(199)
    step[150:] = 0.5
    est = np.zeros_like(gt)
    est[1:, 2] = np.cumsum(step)
    s = segment_scale_stats(est, gt, seg=50)
    assert s["n_segments"] == 4
    # normalized by the median (healthy) scale: decayed segment reads ~0.5
    assert s["seg_scale_min"] < 0.55
    assert abs(s["seg_scale_max"] - 1.0) < 0.01
    assert s["seg_scale_worst"] > 0.9  # |log2 0.5| = 1


def test_segment_scale_stats_excludes_held_poses():
    from lcvo_tpu.metrics import segment_scale_stats

    gt = _straight(200)[:, :3, 3]
    est = gt.copy()
    # a recovery burst: frames 60-70 hold the anchor pose (zero displacement)
    est[60:70] = est[60]
    est[70:] -= est[70] - est[69] - np.array([0, 0, 1.0])
    flags = np.ones(200, bool)
    flags[60:70] = False
    s = segment_scale_stats(est, gt, seg=50, pose_ok=flags)
    # with the held steps excluded the remaining steps are exact
    assert s["seg_scale_worst"] < 0.05


def test_kitti_t_err_pct_pos_zero_on_scaled_exact():
    from lcvo_tpu.metrics import kitti_t_err_pct_pos

    gt = _straight(300, step=0.5)[:, :3, 3]
    est = 2.0 * gt  # pure monocular scale: position-only drift must be ~0
    pct, n = kitti_t_err_pct_pos(est, gt, lengths=(50, 100), step=20)
    assert n > 0
    assert pct < 0.01


def test_kitti_t_err_pct_pos_sees_scale_drift():
    from lcvo_tpu.metrics import kitti_t_err_pct_pos

    gt = _straight(300, step=0.5)[:, :3, 3]
    step = 0.5 * np.ones(299)
    step[200:] *= 0.6  # 40% scale loss over the tail
    est = np.zeros_like(gt)
    est[1:, 2] = np.cumsum(step)
    pct, n = kitti_t_err_pct_pos(est, gt, lengths=(50, 100), step=20)
    assert pct > 2.0  # large drift must register
