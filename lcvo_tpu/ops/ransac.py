"""Fixed-shape hypothesis-scoring RANSAC machinery.

OpenCV's RANSAC (inside ``cv2.findEssentialMat`` / ``cv2.solvePnPRansac``, reference
``src/vo_pipeline.py:156,258``) adapts its iteration count at runtime — data-dependent
control flow XLA can't compile. The TPU-native shape is: a **fixed budget of M
hypotheses solved in parallel** (minimal solvers batched over the hypothesis dim),
all-hypotheses × all-points scoring as one batched kernel, and an MSAC argmin. With
M=512 the success probability exceeds the adaptive scheme's for every inlier ratio the
pipeline encounters, and wall-clock is one kernel launch instead of a serial loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key, n_points: int, valid: jnp.ndarray, n_hyp: int, k: int):
    """(n_hyp, k) indices drawn from valid points (with replacement across sets).

    Invalid points get zero probability. Degenerate sets (repeated points within a
    set) are allowed — they produce degenerate hypotheses that lose the MSAC argmin,
    which is cheaper than rejection sampling under jit.
    """
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    return jax.random.choice(key, n_points, shape=(n_hyp, k), p=p)


def msac_score(sq_err: jnp.ndarray, valid: jnp.ndarray, thresh_sq: float):
    """MSAC truncated-loss score per hypothesis.

    sq_err: (H, N) squared residuals; valid: (N,). Returns (score (H,), inlier counts
    (H,)); lower score is better. Invalid points contribute the truncation constant so
    they never affect the ranking.
    """
    capped = jnp.minimum(sq_err, thresh_sq)
    capped = jnp.where(valid[None, :], capped, 0.0)
    inl = jnp.where(valid[None, :], sq_err < thresh_sq, False)
    return jnp.sum(capped, axis=-1), jnp.sum(inl, axis=-1)


def best_hypothesis(score: jnp.ndarray):
    """Index of the winning (minimum-score) hypothesis."""
    return jnp.argmin(score)
