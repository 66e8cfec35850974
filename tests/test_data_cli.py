"""Dataset adapters + CLI driver tests: generated mini-fixtures on disk exercise the
exact formats the reference consumes (SURVEY §2.1 dataset adapters)."""

import json
import os

import numpy as np
import pytest


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def kitti_root(tmp_path):
    root = tmp_path / "kitti-dataset"
    (root / "05" / "image_0").mkdir(parents=True)
    (root / "poses").mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        _write_png(root / "05" / "image_0" / f"{i:06d}.png", rng.uniform(0, 255, (37, 124)))
    poses = []
    for i in range(8):
        P = np.hstack([np.eye(3), [[0.1 * i], [0.0], [0.5 * i]]])
        poses.append(P.reshape(-1))
    np.savetxt(root / "poses" / "05.txt", np.stack(poses))
    return str(root)


def test_kitti_adapter(kitti_root):
    from lcvo_tpu.data.datasets import kitti

    ds = kitti(kitti_root)
    assert ds.n_frames == 8
    assert ds.K[0, 0] == 718.856
    assert ds.bootstrap_pair == (0, 6)
    f = ds.frame(3)
    assert f.shape == (37, 124) and f.dtype == np.uint8  # H2D-lean ingest
    gt = ds.gt_positions()
    assert gt.shape == (8, 3)
    assert np.isclose(gt[4, 2], 2.0)


def test_parking_adapter(tmp_path):
    from lcvo_tpu.data.datasets import parking

    root = tmp_path / "parking"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        _write_png(root / "images" / f"img_{i:05d}.png", rng.uniform(0, 255, (24, 32)))
    np.savetxt(root / "poses.txt", np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(-1), (5, 1)))
    ds = parking(str(root))
    assert ds.n_frames == 5
    assert ds.bootstrap_pair == (0, 4)
    assert ds.frame(0).shape == (24, 32)


@pytest.mark.slow
def test_cli_kitti_format_end_to_end(tmp_path):
    """Full product flow on a generated KITTI-layout dataset: rendered synthetic
    frames written as PNGs (decoded back through the native C++ loader),
    calib.txt P0 intrinsics, poses file — through the CLI to a bounded ATE.
    This is the closest real-dataset rehearsal possible without KITTI itself."""
    from PIL import Image

    from lcvo_tpu.data.synthetic import SyntheticSequence

    n = 26
    seq = SyntheticSequence(n_frames=n, width=320, height=128, speed=0.3)
    root = tmp_path / "kitti-dataset"
    (root / "05" / "image_0").mkdir(parents=True)
    (root / "poses").mkdir()
    for i in range(n):
        Image.fromarray(np.clip(seq.frame(i), 0, 255).astype(np.uint8)).save(
            root / "05" / "image_0" / f"{i:06d}.png"
        )
    rows = []
    for i in range(n):
        P = np.hstack([seq.R_wc[i], seq.t_wc[i].reshape(3, 1)])
        rows.append(P.reshape(-1))
    np.savetxt(root / "poses" / "05.txt", np.stack(rows))
    K = seq.K
    p0 = np.hstack([K, np.zeros((3, 1))]).reshape(-1)
    (root / "05" / "calib.txt").write_text(
        "P0: " + " ".join(f"{v:.12e}" for v in p0) + "\n"
    )

    from lcvo_tpu.cli import run as cli

    out = cli.main([
        "--dataset", "kitti", "--data-root", str(tmp_path),
        "--frames", str(n), "--out", str(tmp_path / "run"),
    ])
    assert out["frames"] == n - 6  # KITTI bootstrap pair [0, 6]
    assert out["ate_rmse_m"] < 0.5, out
    assert out["pose_ok_rate"] > 0.9


def test_malaga_adapter(tmp_path):
    """Generated Malaga extract-07 fixture: left/right jpg stream at ~7.5 fps +
    '%'-headed GPS log at ~1 Hz with NON-UNIFORM timestamps and local x/y in cols
    8/9 (reference ``src/main.py:31-47``). GT must be associated by TIMESTAMP
    interpolation, not row-per-frame-index (VERDICT r2 weak #4): the real GPS log
    is ~1 Hz while images are ~7.5 fps."""
    from PIL import Image

    from lcvo_tpu.data.datasets import malaga

    root = tmp_path / "malaga-urban-dataset-extract-07"
    img_dir = root / "malaga-urban-dataset-extract-07_rectified_800x600_Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t0 = 1261228749.0
    img_times = t0 + np.arange(6) * 0.1333  # ~7.5 fps
    for t in img_times:
        stamp = f"img_CAMERA1_{t:.6f}"
        for side in ("left", "right"):
            Image.fromarray(rng.uniform(0, 255, (30, 40)).astype(np.uint8)).save(
                img_dir / f"{stamp}_{side}.jpg"
            )
    # GPS at ~1 Hz, deliberately non-uniform, position linear in time so the
    # expected interpolation is exact: x = 2 (t - t0), y = 0.5 (t - t0)
    gps_times = t0 + np.array([-0.5, 0.35, 0.9, 2.1])
    gps = np.zeros((4, 12))
    gps[:, 0] = gps_times
    gps[:, 8] = 2.0 * (gps_times - t0)
    gps[:, 9] = 0.5 * (gps_times - t0)
    lines = ["% Time ... header line like the real sensor log"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in gps]
    (root / "malaga-urban-dataset-extract-07_all-sensors_GPS.txt").write_text("\n".join(lines))

    ds = malaga(str(root))
    assert ds.n_frames == 6                      # right images filtered out
    assert ds.K[0, 0] == 621.18428
    assert ds.bootstrap_pair == (0, 6)
    f = ds.frame(2)
    assert f.shape == (30, 40) and f.dtype == np.uint8  # H2D-lean ingest
    gt = ds.gt_positions()
    assert gt.shape == (6, 3)
    # every frame's GT is the GPS track evaluated at the IMAGE time
    dt = img_times - t0
    assert np.allclose(gt[:, 0], 2.0 * dt, atol=1e-4)
    assert np.allclose(gt[:, 2], 0.5 * dt, atol=1e-4)
    assert ds.gt_poses() is None                 # GPS carries no rotations


@pytest.mark.slow
def test_cli_checkpoint_resume(tmp_path):
    """--checkpoint-every / --resume through the CLI reproduce the uninterrupted
    trajectory (VERDICT r1 #6 driver integration)."""
    from lcvo_tpu.cli import run as cli

    out_a = cli.main([
        "--dataset", "synthetic", "--frames", "24",
        "--out", str(tmp_path / "a"),
    ])
    cli.main([
        "--dataset", "synthetic", "--frames", "16",
        "--checkpoint-every", "8",
        "--out", str(tmp_path / "b"),
    ])
    ck = tmp_path / "b" / "checkpoint.npz"
    assert ck.exists()
    out_c = cli.main([
        "--dataset", "synthetic", "--frames", "24",
        "--resume", str(ck),
        "--out", str(tmp_path / "c"),
    ])
    tr_a = np.load(tmp_path / "a" / "trajectory.npz")["positions"]
    tr_c = np.load(tmp_path / "c" / "trajectory.npz")["positions"]
    assert tr_a.shape == tr_c.shape
    np.testing.assert_allclose(tr_a, tr_c, atol=1e-5)
    assert abs(out_a["ate_rmse_m"] - out_c["ate_rmse_m"]) < 1e-3


def test_prefetcher_order(kitti_root):
    from lcvo_tpu.data.datasets import Prefetcher, kitti

    ds = kitti(kitti_root)
    got = list(Prefetcher(ds, start=2, depth=2))
    assert len(got) == 6
    np.testing.assert_allclose(got[0], ds.frame(2))


@pytest.mark.slow
def test_cli_synthetic(tmp_path, capsys):
    from lcvo_tpu.cli import run as cli

    out = cli.main([
        "--dataset", "synthetic", "--frames", "30",
        "--out", str(tmp_path / "run"),
    ])
    assert out["frames"] >= 20
    assert "ate_rmse_m" in out
    assert out["ate_rmse_m"] < 1.0
    assert os.path.exists(tmp_path / "run" / "trajectory.npz")
    assert os.path.exists(tmp_path / "run" / "trajectory.png")
    with open(tmp_path / "run" / "metrics.jsonl") as fh:
        rows = [json.loads(l) for l in fh]
    assert rows and "inliers" in rows[0]
