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
    assert f.shape == (37, 124) and f.dtype == np.float32
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


def test_prefetcher_order(kitti_root):
    from lcvo_tpu.data.datasets import Prefetcher, kitti

    ds = kitti(kitti_root)
    got = list(Prefetcher(ds, start=2, depth=2))
    assert len(got) == 6
    np.testing.assert_allclose(got[0], ds.frame(2))


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
