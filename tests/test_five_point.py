"""Nistér five-point minimal solver tests (SURVEY N5 — the reference's actual
``cv2.findEssentialMat`` method, ``src/vo_pipeline.py:156``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import epipolar
from lcvo_tpu.ops.five_point import five_point, poly_roots_deg10

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _scene(seed, n=40, noise=0.0, rot_scale=0.15):
    rng = np.random.default_rng(seed)
    rv = rng.normal(size=3) * rot_scale
    th = np.linalg.norm(rv)
    k = rv / max(th, 1e-12)
    Kx = _hat(k)
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    if noise:
        x1 = x1 + rng.normal(size=x1.shape) * noise
        x2 = x2 + rng.normal(size=x2.shape) * noise
    return x1.astype(np.float32), x2.astype(np.float32), R, t


def test_poly_roots_known():
    # all-real, well-separated, small-magnitude roots (f32-representable in the
    # monomial basis — Wilkinson-style 1..10 roots are ill-conditioned in f32)
    gt = np.array([-4.0, -3.0, -2.0, -1.0, -0.4, 0.6, 1.2, 2.2, 3.2, 4.2])
    c = np.poly(gt).astype(np.float32)
    roots = np.asarray(poly_roots_deg10(jnp.asarray(c)))
    real = np.sort(roots.real)
    assert np.abs(roots.imag).max() < 2e-2
    np.testing.assert_allclose(real, np.sort(gt), atol=5e-2)


def test_poly_roots_scaled_no_overflow():
    # tiny leading coefficient → huge roots; must not overflow f32
    c = np.poly([120.0, -55.0, 3.0, 0.5, -0.2, 1 + 2j, 1 - 2j, -3 + 1j, -3 - 1j, 7.0])
    c = (c * 1e-6).astype(np.float32)
    roots = np.asarray(poly_roots_deg10(jnp.asarray(c)))
    real = roots[np.abs(roots.imag) < 1e-2 * (1 + np.abs(roots.real))].real
    assert np.any(np.abs(real - 120.0) < 0.5)
    assert np.any(np.abs(real + 55.0) < 0.5)


def test_five_point_exact_solutions():
    """On exact data, some returned E must satisfy the epipolar constraint for
    held-out correspondences (i.e. the true E is among the ≤10 solutions)."""
    hits = 0
    for seed in range(12):
        x1, x2, R, t = _scene(seed)
        E, valid = five_point(jnp.asarray(x1[:5]), jnp.asarray(x2[:5]))
        E, valid = np.asarray(E), np.asarray(valid)
        h1 = np.concatenate([x1, np.ones((len(x1), 1), np.float32)], 1)
        h2 = np.concatenate([x2, np.ones((len(x2), 1), np.float32)], 1)
        best = np.inf
        for i in range(10):
            if not valid[i]:
                continue
            r = np.abs(np.einsum("ni,ij,nj->n", h2, E[i], h1)).max()
            best = min(best, r)
        hits += best < 1e-3
    assert hits >= 10, f"five-point recovered the true E in only {hits}/12 scenes"


def test_five_point_batched_shapes():
    x1, x2, *_ = _scene(3)
    b1 = jnp.stack([jnp.asarray(x1[:5]), jnp.asarray(x1[5:10])])
    b2 = jnp.stack([jnp.asarray(x2[:5]), jnp.asarray(x2[5:10])])
    E, valid = five_point(b1, b2)
    assert E.shape == (2, 10, 3, 3)
    assert valid.shape == (2, 10)


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
def test_five_point_ransac_pose(outlier_frac):
    """essential_ransac(solver='five_point') recovers (R, t) under outliers."""
    x1, x2, R_gt, t_gt = _scene(7, n=120, noise=5e-4)
    rng = np.random.default_rng(1)
    n_out = int(len(x1) * outlier_frac)
    if n_out:
        x2[:n_out] = rng.uniform(-0.5, 0.5, size=(n_out, 2)).astype(np.float32)
    valid = jnp.ones(len(x1), bool)
    key = jax.random.PRNGKey(0)
    E, inl, n_inl = epipolar.essential_ransac(
        key, jnp.asarray(x1), jnp.asarray(x2), valid, thresh=2e-3, n_hyp=512, solver="five_point"
    )
    R, t, _ = epipolar.recover_pose(E, jnp.asarray(x1), jnp.asarray(x2), inl)
    R, t = np.asarray(R), np.asarray(t)
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
    tdir = np.degrees(np.arccos(np.clip(abs(t @ t_gt), -1, 1)))
    assert int(n_inl) > 0.8 * (len(x1) - n_out)
    assert ang < 0.5, f"rotation error {ang} deg"
    assert tdir < 2.0, f"translation direction error {tdir} deg"
