import numpy as np

from lcvo_tpu.data.synthetic import SyntheticSequence
from lcvo_tpu.metrics import ate_rmse, rpe_stats, umeyama_alignment


def test_frames_render_and_are_textured():
    seq = SyntheticSequence(n_frames=3, width=128, height=64)
    f0 = seq.frame(0)
    f1 = seq.frame(1)
    assert f0.shape == (64, 128)
    assert f0.std() > 10.0          # textured, not flat
    assert not np.allclose(f0, f1)  # motion changes the image


def test_gt_poses_consistent():
    seq = SyntheticSequence(n_frames=10, width=64, height=32)
    R, t = seq.pose_cw(3)
    # camera center recovered from world→camera pose equals gt position
    c = -R.T @ t
    assert np.allclose(c, seq.gt_positions()[3], atol=1e-9)


def test_ate_zero_for_perfect_trajectory():
    seq = SyntheticSequence(n_frames=50, width=64, height=32)
    gt = seq.gt_positions()
    # arbitrary similarity transform of gt must align back to ATE ~ 0
    ang = 0.3
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    est = 2.5 * (Rz @ gt.T).T + np.array([4.0, -2.0, 1.0])
    assert ate_rmse(est, gt) < 1e-9
    rmse, med = rpe_stats(est, gt)
    assert rmse < 1e-9


def test_umeyama_recovers_scale():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(100, 3))
    s, R, t = umeyama_alignment(0.5 * gt, gt)
    assert abs(s - 2.0) < 1e-9
