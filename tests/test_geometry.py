import jax.numpy as jnp
import numpy as np
import pytest

from lcvo_tpu.core import geometry as geo


def random_rotation(rng, n=()):
    v = rng.normal(size=n + (3,))
    return np.asarray(geo.rodrigues(jnp.asarray(v)))


def test_rodrigues_roundtrip(rng):
    v = rng.normal(size=(32, 3)) * 1.5
    R = geo.rodrigues(jnp.asarray(v))
    # orthonormality
    RtR = np.einsum("nij,nik->njk", R, R)
    assert np.allclose(RtR, np.eye(3), atol=2e-3)  # float32
    # det +1
    assert np.allclose(np.linalg.det(R), 1.0, atol=2e-3)
    # log roundtrip (angles < pi)
    v_small = rng.normal(size=(32, 3))
    v_small = v_small / np.linalg.norm(v_small, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(32, 1))
    R2 = geo.rodrigues(jnp.asarray(v_small))
    v_back = np.asarray(geo.log_so3(R2))
    assert np.allclose(v_back, v_small, atol=2e-3)


def test_rodrigues_zero():
    R = geo.rodrigues(jnp.zeros(3))
    assert np.allclose(R, np.eye(3), atol=1e-7)


def test_se3_compose_inverse(rng):
    R1 = jnp.asarray(random_rotation(rng))
    t1 = jnp.asarray(rng.normal(size=3))
    Ri, ti = geo.se3_inverse(R1, t1)
    Rc, tc = geo.se3_compose(R1, t1, Ri, ti)
    assert np.allclose(Rc, np.eye(3), atol=1e-6)
    assert np.allclose(tc, 0, atol=1e-6)


def test_project_backproject(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    R = jnp.asarray(random_rotation(rng))
    t = jnp.asarray(rng.normal(size=3))
    X = rng.normal(size=(64, 3)) * 2 + np.array([0, 0, 8.0])
    # move points so they are in front of the camera
    Rt, tt = geo.se3_inverse(R, t)
    Xw = np.asarray(geo.se3_apply(Rt, tt, jnp.asarray(X)))
    uv, z = geo.project(K, R, t, jnp.asarray(Xw))
    assert np.all(np.asarray(z) > 0)
    rays = geo.backproject(K, uv)
    Xc = np.asarray(rays) * np.asarray(z)[:, None]
    assert np.allclose(Xc, X, atol=1e-3)


def test_triangulate_linear(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    X = rng.normal(size=(128, 3)) * np.array([4, 2, 3]) + np.array([0, 0, 12.0])
    R1, t1 = jnp.eye(3), jnp.zeros(3)
    rv = jnp.asarray(rng.normal(size=3) * 0.05)
    R2 = geo.rodrigues(rv)
    t2 = jnp.asarray([-1.0, 0.02, 0.1])
    uv1, _ = geo.project(K, R1, t1, jnp.asarray(X))
    uv2, _ = geo.project(K, R2, t2, jnp.asarray(X))
    x1 = geo.normalize_points(uv1, K)
    x2 = geo.normalize_points(uv2, K)
    Xt = geo.triangulate_linear(R1, t1, R2, t2, x1, x2)
    assert np.allclose(np.asarray(Xt), X, atol=1e-2)


def test_triangulate_linear_batched_poses(rng):
    """Per-point first-observation poses (the candidate-promotion path)."""
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    N = 64
    X = rng.normal(size=(N, 3)) * np.array([4, 2, 3]) + np.array([0, 0, 12.0])
    rv = rng.normal(size=(N, 3)) * 0.03
    R1 = geo.rodrigues(jnp.asarray(rv))
    t1 = jnp.asarray(rng.normal(size=(N, 3)) * 0.2)
    R2, t2 = jnp.eye(3), jnp.asarray([1.0, 0, 0])
    uv1 = jnp.stack([geo.project(K, R1[i], t1[i], jnp.asarray(X[i : i + 1]))[0][0] for i in range(N)])
    uv2, _ = geo.project(K, R2, t2, jnp.asarray(X))
    x1 = geo.normalize_points(uv1, K)
    x2 = geo.normalize_points(uv2, K)
    Xt = geo.triangulate_linear(R1, t1, R2, t2, x1, x2)
    assert np.allclose(np.asarray(Xt), X, atol=5e-2)


def test_sampson_error_zero_for_inliers(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    X = rng.normal(size=(100, 3)) * 2 + np.array([0, 0, 10.0])
    R = geo.rodrigues(jnp.asarray([0.01, 0.03, 0.002]))
    t = jnp.asarray([1.0, 0.0, 0.1])
    uv1, _ = geo.project(K, jnp.eye(3), jnp.zeros(3), jnp.asarray(X))
    uv2, _ = geo.project(K, R, t, jnp.asarray(X))
    x1 = jnp.concatenate([geo.normalize_points(uv1, K), jnp.ones((100, 1))], -1)
    x2 = jnp.concatenate([geo.normalize_points(uv2, K), jnp.ones((100, 1))], -1)
    E = geo.essential_from_pose(R, t)
    err = geo.sampson_error(E, x1, x2)
    assert np.max(np.asarray(err)) < 1e-8


def test_bearing_angle(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    X = jnp.asarray([[0.0, 0.0, 10.0]])
    R1, t1 = jnp.eye(3), jnp.zeros(3)
    # camera 2 translated sideways by 1m → expected parallax atan(1/10)
    R2, t2 = jnp.eye(3), jnp.asarray([-1.0, 0.0, 0.0])
    uv1, _ = geo.project(K, R1, t1, X)
    uv2, _ = geo.project(K, R2, t2, X)
    ang = geo.bearing_angle(R1, t1, R2, t2, uv1, uv2, K)
    expected = np.arctan2(1.0, 10.0)
    assert np.allclose(np.asarray(ang), expected, atol=1e-4)
