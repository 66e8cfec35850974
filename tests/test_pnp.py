"""PnP tests — generalizes the reference's only synthetic test
(``pose_estimation_test.py``: 20 inliers + 5 outliers, recover pose despite 20%
outliers) into asserted, seeded pytest cases."""

import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import pnp


def make_pnp_scene(rng, N=100, noise=0.0, outlier_frac=0.0):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    X = rng.normal(size=(N, 3)) * np.array([5, 3, 4]) + np.array([0, 0, 15.0])
    rv = rng.normal(size=3) * 0.1
    R = np.asarray(geo.rodrigues(jnp.asarray(rv)))
    t = rng.normal(size=3) * np.array([1, 0.3, 0.5])
    uv, z = geo.project(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), jnp.asarray(X))
    uv = np.asarray(uv) + rng.normal(size=(N, 2)) * noise
    n_out = int(N * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(15, 60, size=(n_out, 2)) * rng.choice([-1, 1], size=(n_out, 2))
    x_obs = (uv - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    return K, X, R, t, x_obs, n_out


def test_quartic_roots():
    # (v-1)(v-2)(v-3)(v-4) = v^4 -10v^3 +35v^2 -50v +24
    c = jnp.asarray([[1.0, -10.0, 35.0, -50.0, 24.0]])
    r = np.sort(np.real(np.asarray(pnp.quartic_roots(c))[0]))
    assert np.allclose(r, [1, 2, 3, 4], atol=1e-3)


def test_quartic_roots_complex_pairs():
    # (v^2+1)(v-2)(v+5) = v^4 + 3v^3 - 9v^2 + 3v - 10
    c = jnp.asarray([[1.0, 3.0, -9.0, 3.0, -10.0]])
    r = np.asarray(pnp.quartic_roots(c))[0]
    reals = np.sort(np.real(r[np.abs(np.imag(r)) < 1e-3]))
    assert np.allclose(reals, [-5, 2], atol=1e-3)


def test_p3p_exact(rng):
    K, X, R, t, x_obs, _ = make_pnp_scene(rng, N=3)
    f = np.concatenate([x_obs, np.ones((3, 1))], -1)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    R4, t4, ok = pnp.p3p_grunert(jnp.asarray(X), jnp.asarray(f))
    ok = np.asarray(ok)
    assert ok.any()
    # one of the valid solutions matches ground truth
    errs = [np.abs(np.asarray(R4[i]) - R).max() + np.abs(np.asarray(t4[i]) - t).max() for i in range(4) if ok[i]]
    assert min(errs) < 5e-2


def test_pnp_ransac_clean(rng):
    K, X, R, t, x_obs, _ = make_pnp_scene(rng, N=80, noise=0.2)
    key = jax.random.PRNGKey(0)
    R_e, t_e, inl, n = pnp.pnp_ransac(
        key, jnp.asarray(X), jnp.asarray(x_obs), jnp.ones(80, bool), thresh=2.0 / 500.0
    )
    assert int(n) > 70
    dR = np.asarray(R_e) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.3
    assert np.linalg.norm(np.asarray(t_e) - t) < 0.05


def test_pnp_ransac_outliers_reference_pattern(rng):
    """The reference's synthetic scenario: 20% gross outliers must not corrupt the
    pose (pose_estimation_test.py:48-85), but with real asserts."""
    K, X, R, t, x_obs, n_out = make_pnp_scene(rng, N=100, noise=0.3, outlier_frac=0.2)
    key = jax.random.PRNGKey(1)
    R_e, t_e, inl, n = pnp.pnp_ransac(
        key, jnp.asarray(X), jnp.asarray(x_obs), jnp.ones(100, bool), thresh=2.0 / 500.0
    )
    inl = np.asarray(inl)
    assert inl[:n_out].mean() < 0.1          # outliers rejected
    assert inl[n_out:].mean() > 0.9          # inliers kept
    dR = np.asarray(R_e) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    assert np.linalg.norm(np.asarray(t_e) - t) < 0.1


def test_gauss_newton_pose_converges(rng):
    K, X, R, t, x_obs, _ = make_pnp_scene(rng, N=60)
    # perturb the pose, GN should pull it back
    R0 = np.asarray(geo.rodrigues(jnp.asarray(rng.normal(size=3) * 0.03))) @ R
    t0 = t + rng.normal(size=3) * 0.2
    R_r, t_r = pnp.gauss_newton_pose(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(x_obs), jnp.ones(60), iters=10
    )
    assert np.abs(np.asarray(R_r) - R).max() < 1e-3
    assert np.linalg.norm(np.asarray(t_r) - t) < 5e-3
