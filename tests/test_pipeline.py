"""End-to-end pipeline tests on synthetic sequences — the framework's equivalent of
the reference's qualitative dataset runs (SURVEY §4), made quantitative with ATE."""

import dataclasses

import numpy as np
import pytest

from lcvo_tpu.config import VOConfig, load_config
from lcvo_tpu.data.synthetic import SyntheticSequence
from lcvo_tpu.metrics import ate_rmse
from lcvo_tpu.pipeline import VisualOdometry

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"


def small_cfg(**over):
    cfg = load_config(overrides={
        "state": {"max_tracks": 512, "max_candidates": 768, "max_new_per_frame": 128},
        "klt": {"window": 15, "iters": 8, "levels": 3},
        "ransac": {"e_hypotheses": 256, "pnp_hypotheses": 256},
        "bootstrap": {"frame_gap": 4},
        **over,
    })
    return cfg


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=60, width=320, height=128, speed=0.3)


def test_bootstrap_builds_map(seq):
    cfg = small_cfg()
    vo = VisualOdometry(cfg, seq.K)
    frames = [seq.frame(i) for i in range(cfg.bootstrap.frame_gap + 1)]
    n_inl = vo.bootstrap(frames)
    assert n_inl > 50
    assert int(vo.state.tracks.count()) > 50
    # landmarks should be in front of the bootstrap camera and at sane depths
    X = np.asarray(vo.state.tracks.X)[np.asarray(vo.state.tracks.valid)]
    assert np.all(X[:, 2] > 0)


def test_full_run_matches_ground_truth(seq):
    cfg = small_cfg()
    vo = VisualOdometry(cfg, seq.K)
    vo.run(seq.frames(), n_frames=60)
    est = np.asarray(vo.trajectory)
    assert len(est) >= 50
    gt = seq.gt_positions()[len(seq.gt_positions()) - len(est):] if False else None
    # align frame indices: first recorded pose corresponds to frame gap
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    err = ate_rmse(est, gt)
    # ~18m trajectory; locally consistent means sub-meter ATE after Sim(3) alignment
    assert err < 0.5, f"ATE {err:.3f} m too large"


def test_reference_preset_end_to_end(seq):
    """configs/reference.yaml — the reference-matched operating point (5-point
    essential RANSAC, SIFT descriptor-matching init, 21x21/10 KLT, sift-sift
    candidates) — must run end to end within the ATE bound."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "reference.yaml")
    cfg = load_config(path, overrides={
        "image_width": 320, "image_height": 128,
        "descriptor": {"max_keypoints": 384},
    })
    vo = VisualOdometry(cfg, seq.K)
    n = 30
    vo.run(seq.frames(), n_frames=n)
    est = np.asarray(vo.trajectory)
    gap = cfg.bootstrap.frame_gap
    assert len(est) == n - gap
    gt = seq.gt_positions()[gap : gap + len(est)]
    err = ate_rmse(est, gt)
    assert err < 0.5, f"reference-preset ATE {err:.3f} m"


def test_weak_bootstrap_extension_keeps_alignment(seq):
    """An unsatisfiable bootstrap.min_matches forces the quality-gate extension
    path (window grows one frame at a time, bounded); the trajectory must still
    carry exactly one pose per frame from `gap` onward and track ground truth."""
    cfg = small_cfg(bootstrap={"frame_gap": 4, "min_matches": 10**6})
    vo = VisualOdometry(cfg, seq.K)
    n = 40
    with pytest.warns(UserWarning, match="weak bootstrap"):
        vo.run(seq.frames(), n_frames=n)
    est = np.asarray(vo.trajectory)
    assert len(est) == n - cfg.bootstrap.frame_gap
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    assert ate_rmse(est, gt) < 0.5


def test_pipeline_reports_health(seq):
    cfg = small_cfg()
    vo = VisualOdometry(cfg, seq.K)
    frames = [seq.frame(i) for i in range(cfg.bootstrap.frame_gap + 1)]
    vo.bootstrap(frames)
    res = vo.step(seq.frame(cfg.bootstrap.frame_gap + 1))
    assert bool(res.pose_ok)
    assert int(res.n_inliers) > 30
    assert float(res.reproj_rms) < 3.0


def test_full_run_with_ba(seq):
    """Sliding-window BA enabled (BASELINE config 3): trajectory stays accurate and
    BA actually runs (keyframes populated)."""
    cfg = small_cfg(ba={"enabled": True, "window": 6, "keyframe_every": 3, "gn_iters": 4})
    vo = VisualOdometry(cfg, seq.K)
    vo.run(seq.frames(), n_frames=60)
    est = np.asarray(vo.trajectory)
    assert len(est) >= 50
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    err = ate_rmse(est, gt)
    assert err < 0.5, f"ATE with BA {err:.3f} m too large"
    assert bool(np.asarray(vo.window.kf_valid).any())


def test_full_run_sift_mask_mode(seq):
    """'sift-mask' candidate mode (reference src/vo_pipeline.py:392-425)."""
    cfg = small_cfg(find_new_candidates_method="sift-mask",
                    descriptor={"max_keypoints": 256})
    vo = VisualOdometry(cfg, seq.K)
    vo.run(seq.frames(), n_frames=40)
    est = np.asarray(vo.trajectory)
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    assert ate_rmse(est, gt) < 0.6


def test_full_run_sift_sift_mode(seq):
    """'sift-sift' candidate mode — the reference's selected configuration
    (report §3.1): per-frame SIFT + descriptor matching against the previous
    frame filters already-seen keypoints."""
    cfg = small_cfg(find_new_candidates_method="sift-sift",
                    descriptor={"max_keypoints": 256})
    vo = VisualOdometry(cfg, seq.K)
    vo.run(seq.frames(), n_frames=40)
    est = np.asarray(vo.trajectory)
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    assert ate_rmse(est, gt) < 0.6
    assert vo.state.prev_desc is not None


def test_sift_bootstrap(seq):
    """Descriptor-matching two-view init (reference src/vo_pipeline.py:69-121)."""
    cfg = small_cfg(bootstrap={"frame_gap": 4, "init_method": "sift"},
                    descriptor={"max_keypoints": 384})
    vo = VisualOdometry(cfg, seq.K)
    frames = [seq.frame(i) for i in range(cfg.bootstrap.frame_gap + 1)]
    n_inl = vo.bootstrap(frames)
    assert n_inl > 20
    assert int(vo.state.tracks.count()) > 20
    X = np.asarray(vo.state.tracks.X)[np.asarray(vo.state.tracks.valid)]
    assert np.all(X[:, 2] > 0)


def test_chunked_ba_matches_per_frame(seq):
    """BA inside the compiled chunked scan (lax.cond keyframe refine) must produce
    the same trajectory as the per-frame driver path running the same cadence."""
    over = dict(ba={"enabled": True, "window": 6, "keyframe_every": 3, "gn_iters": 4})
    frames = np.stack([seq.frame(i) for i in range(40)])

    cfg = small_cfg(**over)
    vo_a = VisualOdometry(cfg, seq.K)
    vo_a.run(iter(list(frames)), n_frames=40)

    vo_b = VisualOdometry(cfg, seq.K)
    vo_b.run_chunked(frames, chunk=8)

    # both driver modes share the convention: trajectory[0] is frame gap's pose
    est_a = np.asarray(vo_a.trajectory)
    est_b = np.asarray(vo_b.trajectory)
    n = min(len(est_a), len(est_b))
    assert n >= 30
    # same compiled kernels, same cadence; RNG key streams are consumed differently
    # (per-frame vs per-chunk splits), so require trajectory agreement, not bitwise
    delta = np.linalg.norm(est_a[:n] - est_b[:n], axis=1)
    assert np.median(delta) < 0.1, f"chunked-BA trajectory diverged: median {np.median(delta):.3f} m"
    assert bool(np.asarray(vo_b.window.kf_valid).any())


def test_run_short_stream_raises(seq):
    """A stream shorter than bootstrap.frame_gap + 1 must fail with a clear
    ValueError — the public API's first line of user contact (VERDICT r3 #8),
    not an unguarded StopIteration."""
    cfg = small_cfg()
    vo = VisualOdometry(cfg, seq.K)
    with pytest.raises(ValueError, match="frame_gap"):
        vo.run((seq.frame(i) for i in range(2)), n_frames=2)
    vo2 = VisualOdometry(cfg, seq.K)
    with pytest.raises(ValueError, match="frame_gap"):
        vo2.run_chunked((seq.frame(i) for i in range(3)), chunk=4, n_frames=3)


def test_full_run_turn_robust_config(seq):
    """The round-5 turn-robust operating point (configs/turn_robust.yaml:
    anchor re-triangulation + full window BA at the NEWEST gauge) must run the
    full driver loop and stay accurate — the configuration of the flagship
    turn replay (BASELINE.md round 5)."""
    cfg = small_cfg(
        ba={"enabled": True, "window": 6, "keyframe_every": 3, "gn_iters": 4,
            "gauge": "newest"},
        triangulation={"track_refine": True},
    )
    vo = VisualOdometry(cfg, seq.K)
    vo.run(seq.frames(), n_frames=60)
    est = np.asarray(vo.trajectory)
    assert len(est) >= 50
    gt = seq.gt_positions()[cfg.bootstrap.frame_gap : cfg.bootstrap.frame_gap + len(est)]
    err = ate_rmse(est, gt)
    assert err < 0.5, f"turn-robust ATE {err:.3f} m too large"
    assert bool(np.asarray(vo.window.kf_valid).any())
    # anchors were retired for BA-adjusted slots (cooperation contract)
    ang = np.asarray(vo.state.tracks.ang)
    assert np.any(np.isclose(ang, np.pi))
