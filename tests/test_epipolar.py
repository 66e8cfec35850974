import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import epipolar


def make_scene(rng, N=200, noise=0.0, outlier_frac=0.0, t=(1.0, 0.0, 0.2), rv=(0.02, 0.04, 0.01)):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    X = rng.normal(size=(N, 3)) * np.array([5, 3, 4]) + np.array([0, 0, 15.0])
    R = np.asarray(geo.rodrigues(jnp.asarray(rv)))
    t = np.asarray(t)
    uv1, _ = geo.project(jnp.asarray(K), jnp.eye(3), jnp.zeros(3), jnp.asarray(X))
    uv2, _ = geo.project(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), jnp.asarray(X))
    uv1 = np.asarray(uv1) + rng.normal(size=(N, 2)) * noise
    uv2 = np.asarray(uv2) + rng.normal(size=(N, 2)) * noise
    n_out = int(N * outlier_frac)
    if n_out:
        uv2[:n_out] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], size=(n_out, 2))
    is_inlier = np.ones(N, bool)
    is_inlier[:n_out] = False
    return K, X, R, t, uv1, uv2, is_inlier


def test_eight_point_exact(rng):
    K, X, R, t, uv1, uv2, _ = make_scene(rng, N=64)
    x1 = geo.normalize_points(jnp.asarray(uv1), jnp.asarray(K))
    x2 = geo.normalize_points(jnp.asarray(uv2), jnp.asarray(K))
    E = epipolar.project_to_essential(epipolar.eight_point(x1, x2))
    E_true = np.asarray(geo.essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
    E_est = np.asarray(E)
    E_est = E_est / np.linalg.norm(E_est) * np.linalg.norm(E_true)
    if np.sum(E_est * E_true) < 0:
        E_est = -E_est
    assert np.allclose(E_est, E_true, atol=5e-3)


def test_essential_ransac_with_outliers(rng):
    K, X, R, t, uv1, uv2, is_inlier = make_scene(rng, N=300, noise=0.3, outlier_frac=0.35)
    x1 = geo.normalize_points(jnp.asarray(uv1), jnp.asarray(K))
    x2 = geo.normalize_points(jnp.asarray(uv2), jnp.asarray(K))
    key = jax.random.PRNGKey(0)
    E, inl, n = epipolar.essential_ransac(key, x1, x2, jnp.ones(300, bool), thresh=1.5 / 500.0, n_hyp=512)
    inl = np.asarray(inl)
    # should recover most true inliers and reject most outliers
    assert inl[is_inlier].mean() > 0.9
    assert inl[~is_inlier].mean() < 0.05


def test_recover_pose_cheirality(rng):
    K, X, R, t, uv1, uv2, _ = make_scene(rng, N=120)
    x1 = geo.normalize_points(jnp.asarray(uv1), jnp.asarray(K))
    x2 = geo.normalize_points(jnp.asarray(uv2), jnp.asarray(K))
    E = geo.essential_from_pose(jnp.asarray(R), jnp.asarray(t))
    R_est, t_est, n_good = epipolar.recover_pose(E, x1, x2, jnp.ones(120, bool))
    assert int(n_good) > 110
    assert np.allclose(np.asarray(R_est), R, atol=1e-3)
    t_norm = t / np.linalg.norm(t)
    assert np.allclose(np.asarray(t_est), t_norm, atol=1e-3)


def test_full_two_view_pipeline(rng):
    """end-to-end: RANSAC E -> recoverPose -> pose matches ground truth."""
    K, X, R, t, uv1, uv2, is_inlier = make_scene(rng, N=250, noise=0.4, outlier_frac=0.2)
    x1 = geo.normalize_points(jnp.asarray(uv1), jnp.asarray(K))
    x2 = geo.normalize_points(jnp.asarray(uv2), jnp.asarray(K))
    key = jax.random.PRNGKey(1)
    E, inl, n = epipolar.essential_ransac(key, x1, x2, jnp.ones(250, bool), thresh=2.0 / 500.0)
    R_est, t_est, _ = epipolar.recover_pose(E, x1, x2, inl)
    # rotation error below 0.5 deg
    dR = np.asarray(R_est) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    t_norm = t / np.linalg.norm(t)
    assert np.degrees(np.arccos(np.clip(np.dot(np.asarray(t_est), t_norm), -1, 1))) < 2.0
