"""Long-horizon stability regressions.

The round-3 full-scale replay exposed a failure mode no short test saw: with
TPU-default (bf16-input) matmul precision, landmark quality degraded slowly
until the per-frame PnP inlier prune outran candidate promotion and tracking
collapsed (~1,000 frames in; BASELINE.md round-3 section). These tests pin the
two defenses: the framework-wide f32 matmul precision default, and a
multi-hundred-frame run asserting the track budget does NOT leak.
"""

import jax
import numpy as np
import pytest


def test_matmul_precision_is_f32():
    """lcvo_tpu import must pin XLA matmul precision to full f32 — DEFAULT
    truncates f32 matmul inputs to bf16 on TPU, which corrupts subpixel
    interpolation / descriptor distances / reprojection geometry."""
    import lcvo_tpu  # noqa: F401  (import applies the config)

    assert jax.config.jax_default_matmul_precision == "float32"


@pytest.mark.slow
def test_track_budget_does_not_leak_over_300_frames():
    """Median inliers late in a 300-frame run must not decay materially vs the
    start, and candidate promotion must still be flowing — the leak signature
    was inliers 69 -> 1 with promotions pinned at 0 while candidates piled up."""
    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.render_jax import FastCorridorRenderer
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.pipeline import VisualOdometry

    W, H, N = 416, 160, 300
    seq = FastCorridorRenderer(N, W, H)
    cfg = load_config(overrides={"image_width": W, "image_height": H})
    vo = VisualOdometry(cfg, seq.K)
    inliers, promoted = [], []

    def on_frame(i, res):
        inliers.append(int(res.n_inliers))
        promoted.append(int(res.n_promoted))

    traj = vo.run((seq.frame(i) for i in range(N)), N, on_frame=on_frame)
    est = np.asarray(traj)
    gap = cfg.bootstrap.frame_gap
    gt = seq.gt_positions()[gap : gap + len(est)]

    early = np.median(inliers[:50])
    late = np.median(inliers[-50:])
    assert late > 8, f"late-run inliers collapsed: {late}"
    assert late > 0.3 * early, f"inlier leak: {early} -> {late}"
    assert sum(promoted[-100:]) > 0, "candidate promotion starved"
    ate = ate_rmse(est[: len(gt)], gt[: len(est)])
    assert np.isfinite(ate) and ate < 8.0, f"long-horizon ATE {ate:.2f} m"
