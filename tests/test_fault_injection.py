"""Fault injection (SURVEY §5, failure detection / elastic recovery).

The reference's only failure story is inlier starvation → re-bootstrap with a
4-frame skip (``src/vo_pipeline.py:274-324``). Here the same mechanisms are
first-class and deterministic-testable: track-loss detection via validity-mask
attrition, re-detection refill, and driver-level re-bootstrap on health collapse.
Faults are injected deterministically — corrupted frames and forced mask drops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lcvo_tpu.config import load_config
from lcvo_tpu.data.synthetic import SyntheticSequence
from lcvo_tpu.pipeline import VisualOdometry

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=60, width=416, height=160)


@pytest.fixture(scope="module")
def cfg():
    return load_config(overrides={"image_width": 416, "image_height": 160})


def test_corrupted_frame_burst_triggers_rebootstrap(seq, cfg):
    """Noise frames destroy KLT tracking; the health counter must trip and the
    driver must re-bootstrap anchored at the last good pose, then keep running."""
    rng = np.random.default_rng(0)
    n = 46

    def frames():
        for i in range(n):
            f = seq.frame(i)
            if 20 <= i < 23:  # 3-frame corruption burst
                f = rng.uniform(0, 255, size=f.shape).astype(f.dtype)
            yield f

    vo = VisualOdometry(cfg, seq.K)
    traj = vo.run(frames(), n)
    # the run must survive the burst and produce poses past it
    assert len(traj) > 10
    # after recovery the pose chain is healthy again
    assert int(vo.state.health) == 0
    ok_tail = [bool(r.pose_ok) for r in vo.results[-8:]]
    assert all(ok_tail), f"pipeline did not recover after fault burst: {ok_tail}"
    # and the state has a live track table
    assert int(vo.state.tracks.count()) >= cfg.ransac.min_pnp_inliers


def test_rebootstrap_trajectory_continuity(seq, cfg):
    """Across a forced re-bootstrap the driver must emit exactly one pose per frame
    (``len(trajectory) == n_frames - gap``) so ground-truth alignment stays
    index-exact, and the Sim(3)-aligned ATE of the full recovered trajectory must
    stay bounded. The reference's fallback also records a pose every iteration
    (``src/vo_pipeline.py:274-324``, ``src/main.py:235-239``)."""
    from lcvo_tpu.metrics import ate_rmse

    rng = np.random.default_rng(1)
    n = 52
    gap = cfg.bootstrap.frame_gap

    def frames():
        for i in range(n):
            f = seq.frame(i)
            if 20 <= i < 23:  # corruption burst forces health collapse
                f = rng.uniform(0, 255, size=f.shape).astype(f.dtype)
            yield f

    vo = VisualOdometry(cfg, seq.K)
    traj = vo.run(frames(), n)
    assert len(traj) == n - gap, (len(traj), n - gap)
    assert len(vo.results) == len(traj)
    # index-exact GT alignment over the whole run, including the recovery segment
    gt = seq.gt_positions()[gap : gap + len(traj)]
    est = np.asarray(traj)
    ate = ate_rmse(est, gt)
    # bound tightened 3.0 → 1.0 once re-bootstrap propagates metric scale
    # (VERDICT r2 #2); the residual is the frozen-pose span during the burst
    assert np.isfinite(ate) and ate < 1.0, f"ATE across re-bootstrap too large: {ate}"


def test_rebootstrap_preserves_metric_scale(seq, cfg):
    """The re-initialized map must keep the pre-failure metric scale: per-frame
    translation after recovery ≈ before (the reference's fallback resets scale
    arbitrarily, ``src/vo_pipeline.py:314-324`` — this is the beat-the-reference
    seam). Asserted as a median step-length ratio within 25%."""
    rng = np.random.default_rng(1)
    n = 52
    gap = cfg.bootstrap.frame_gap

    def frames():
        for i in range(n):
            f = seq.frame(i)
            if 20 <= i < 23:
                f = rng.uniform(0, 255, size=f.shape).astype(f.dtype)
            yield f

    vo = VisualOdometry(cfg, seq.K)
    traj = vo.run(frames(), n)
    est = np.asarray(traj)
    d = np.linalg.norm(np.diff(est, axis=0), axis=1)
    flags = np.asarray(vo.pose_ok_flags, bool)
    good = flags[:-1] & flags[1:] & (d > 1e-9)
    # healthy steps strictly before the fault (frames < 20 → indices < 20-gap-1)
    pre = d[: 20 - gap - 1][good[: 20 - gap - 1]]
    post = d[-12:][good[-12:]]
    assert len(pre) >= 5 and len(post) >= 5, (len(pre), len(post))
    ratio = float(np.median(post) / np.median(pre))
    assert 0.75 < ratio < 1.33, f"metric scale not preserved across re-bootstrap: {ratio:.3f}"


def test_forced_track_drop_refills_via_redetection(seq, cfg):
    """Deterministically clearing most of the track table mid-run must not kill the
    pipeline: candidates are re-detected/promoted and the track count recovers."""
    vo = VisualOdometry(cfg, seq.K)
    n_boot = cfg.bootstrap.frame_gap + 1
    vo.bootstrap([seq.frame(i) for i in range(n_boot)])
    for i in range(n_boot, 20):
        vo.step(seq.frame(i))

    before = int(vo.state.tracks.count())
    assert before > 20
    # fault: drop all but the first 8 valid tracks (mask-based, index-determinate)
    valid = np.asarray(vo.state.tracks.valid)
    keep = np.zeros_like(valid)
    keep[np.flatnonzero(valid)[:8]] = True
    vo.state = vo.state._replace(
        tracks=vo.state.tracks._replace(valid=jnp.asarray(keep))
    )

    counts = []
    for i in range(20, 40):
        res = vo.step(seq.frame(i))
        counts.append(int(res.n_tracked))
    # survived the drop (PnP still had >= min inliers from the 8 survivors)
    assert int(vo.state.health) == 0
    # re-detection + promotion grew the table back substantially
    assert counts[-1] > 3 * 8, f"track table did not refill: {counts}"


def test_chunked_mode_rebootstraps_after_corruption(cfg):
    """Throughput mode (device-resident chunked scan) must also survive a
    corruption burst: the scan's health counter trips, the driver re-bootstraps
    between chunks, and the trajectory stays one-pose-per-frame."""
    from lcvo_tpu.metrics import ate_rmse

    seq2 = SyntheticSequence(n_frames=48, width=416, height=160)
    rng = np.random.default_rng(3)
    frames = np.stack([seq2.frame(i) for i in range(48)])
    frames[18:21] = rng.uniform(0, 255, frames[18:21].shape).astype(frames.dtype)

    vo = VisualOdometry(cfg, seq2.K)
    traj = vo.run_chunked(frames, chunk=8)
    gap = cfg.bootstrap.frame_gap
    assert len(traj) == 48 - gap, (len(traj), 48 - gap)
    # recovered: the last chunk tracked with a healthy pose chain
    assert int(vo.state.health) == 0
    gt = seq2.gt_positions()[gap : gap + len(traj)]
    ate = ate_rmse(np.asarray(traj), gt)
    # tightened 3.0 → 1.0 with scale-propagating re-bootstrap (VERDICT r2 #2)
    assert np.isfinite(ate) and ate < 1.0, f"chunked-recovery ATE {ate:.2f} m"
    # post-recovery steps continue at the pre-failure metric scale
    est = np.asarray(traj)
    d = np.linalg.norm(np.diff(est, axis=0), axis=1)
    pre, post = d[:8], d[-8:]
    ratio = float(np.median(post) / np.median(pre))
    assert 0.75 < ratio < 1.33, f"chunked scale seam: {ratio:.3f}"


def test_chunked_sequence_ends_during_recovery_burst(cfg):
    """If the sequence runs out while the re-bootstrap burst is still filling, the
    driver must hold the anchor pose for the consumed frames and must NOT
    re-process the last chunk through the per-frame tail path — exactly one pose
    per frame from the bootstrap gap onward."""
    seq3 = SyntheticSequence(n_frames=33, width=416, height=160)
    rng = np.random.default_rng(5)
    frames = np.stack([seq3.frame(i) for i in range(33)])
    frames[27:31] = rng.uniform(0, 255, frames[27:31].shape).astype(frames.dtype)

    vo = VisualOdometry(cfg, seq3.K)
    traj = vo.run_chunked(frames, chunk=8)
    gap = cfg.bootstrap.frame_gap
    assert len(traj) == 33 - gap, (len(traj), 33 - gap)
    assert len(vo.poses) == len(traj)


def test_total_track_loss_increments_health(seq, cfg):
    """Clearing the whole table must be detected (pose_ok False, health > 0) —
    the validity-mask analog of the reference's KLT status-vector attrition check
    (``src/vo_pipeline.py:217-221``)."""
    vo = VisualOdometry(cfg, seq.K)
    n_boot = cfg.bootstrap.frame_gap + 1
    vo.bootstrap([seq.frame(i) for i in range(n_boot)])
    vo.step(seq.frame(n_boot))

    empty = np.zeros(vo.state.tracks.capacity, bool)
    vo.state = vo.state._replace(
        tracks=vo.state.tracks._replace(valid=jnp.asarray(empty)),
        cands=vo.state.cands._replace(valid=jnp.asarray(np.zeros(vo.state.cands.capacity, bool))),
    )
    res = vo.step(seq.frame(n_boot + 1))
    assert not bool(res.pose_ok)
    assert int(vo.state.health) >= 1


def test_chunked_cli_summary_reports_recovery(tmp_path):
    """The CLI's printed summary must tell the truth through a recovery: held
    anchor frames get pose_ok=False metrics rows and the re-bootstrap is counted
    (VERDICT r3 #3 — previously a replay with N recoveries printed the same
    pose_ok_rate as one with zero). Full product flow: corrupted kitti-format
    dataset on disk → chunked CLI → summary fields."""
    from PIL import Image

    n = 48
    seq4 = SyntheticSequence(n_frames=n, width=416, height=160)
    rng = np.random.default_rng(7)
    root = tmp_path / "kitti-dataset"
    (root / "05" / "image_0").mkdir(parents=True)
    (root / "poses").mkdir()
    for i in range(n):
        f = np.clip(seq4.frame(i), 0, 255)
        if 20 <= i < 23:  # corruption burst → health collapse mid-chunk
            f = rng.uniform(0, 255, size=f.shape)
        Image.fromarray(f.astype(np.uint8)).save(root / "05" / "image_0" / f"{i:06d}.png")
    rows = [np.hstack([seq4.R_wc[i], seq4.t_wc[i].reshape(3, 1)]).reshape(-1) for i in range(n)]
    np.savetxt(root / "poses" / "05.txt", np.stack(rows))
    p0 = np.hstack([seq4.K, np.zeros((3, 1))]).reshape(-1)
    (root / "05" / "calib.txt").write_text("P0: " + " ".join(f"{v:.12e}" for v in p0) + "\n")

    from lcvo_tpu.cli import run as cli

    out = cli.main([
        "--dataset", "kitti", "--data-root", str(tmp_path),
        "--frames", str(n), "--chunked", "--out", str(tmp_path / "run"),
    ])
    assert out["n_rebootstraps"] >= 1, out
    assert out["pose_ok_rate"] < 1.0, out
    # every trajectory entry has a metrics row — recoveries included
    assert out["metric_rows"] == out["frames"], out
