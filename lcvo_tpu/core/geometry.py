"""Batched differentiable geometry primitives (pure JAX, CPU/TPU).

Pose convention follows the reference: poses are **world→camera** extrinsics
``T_cw = [R | t]`` with ``x_cam = R @ x_world + t``; the camera center in world
coordinates is ``-R^T t`` (reference builds projection as ``K @ T[0:3,:]``,
``src/vo_pipeline.py:666``, and plots ``inv(T)[:3,3]``, ``src/visual.py:44``).

Everything here is shaped for `vmap`/batching — no Python loops over points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x for w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (..., 3) → rotation matrix (..., 3, 3).

    TPU-native closed form of ``cv2.Rodrigues`` (reference ``src/vo_pipeline.py:266``).
    Uses the sinc-stable formulation so it is exact and differentiable at theta=0.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(theta2 + 1e-24)
    W = hat(rvec)
    W2 = W @ W
    a = jnp.sinc(theta / jnp.pi)            # sin(theta)/theta
    b = jnp.where(theta2 > 1e-12, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24), 0.5)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → rotation vector (..., 3). Stable near 0."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; scale = theta / (2 sin theta), sinc-stable
    s = jnp.where(theta[..., None] > 1e-6, theta[..., None] / jnp.maximum(2.0 * jnp.sin(theta)[..., None], 1e-12), 0.5)
    return s * w


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [w,x,y,z] → rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def se3_compose(Ra, ta, Rb, tb):
    """T_a ∘ T_b : first apply T_b, then T_a. Returns (R, t)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_matrix(R, t):
    """(R (...,3,3), t (...,3)) → homogeneous (...,4,4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_apply(R, t, X):
    """Apply world→camera transform to points X (..., 3)."""
    return (R @ X[..., None])[..., 0] + t


def camera_center(R, t):
    """Camera center in world coordinates: -R^T t."""
    return -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray):
    """Project world points X (N, 3) with pose (R, t) and intrinsics K (3, 3).

    Returns (uv (N, 2), depth (N,)). Points behind the camera get negative depth;
    the division is guarded so gradients stay finite.
    """
    Xc = se3_apply(R, t, X)
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    x = Xc[..., 0] / zs
    y = Xc[..., 1] / zs
    u = K[0, 0] * x + K[0, 1] * y + K[0, 2]
    v = K[1, 1] * y + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def backproject(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (N, 2) → unit-z camera rays (N, 3): K^-1 [u, v, 1]^T."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    y = (uv[..., 1] - cy) / fy
    x = (uv[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def normalize_points(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels → normalized image coordinates (x, y) with z=1 dropped."""
    r = backproject(K, uv)
    return r[..., :2]


# ---------------------------------------------------------------------------
# Two-view geometry
# ---------------------------------------------------------------------------


def essential_from_pose(R, t):
    """E = [t]_x R for relative pose (cam1→cam2: x2 = R x1 + t)."""
    tn = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return hat(tn) @ R


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error of E for normalized homogeneous points.

    x1, x2: (N, 3) homogeneous; E: (..., 3, 3). Returns (..., N) squared error.
    This is the scoring kernel of the essential-matrix RANSAC (replaces the internal
    scoring of ``cv2.findEssentialMat``, reference ``src/vo_pipeline.py:156``) —
    shaped as matmuls so batches of hypotheses ride the MXU.
    """
    Ex1 = jnp.einsum("...ij,nj->...ni", E, x1)
    Etx2 = jnp.einsum("...ji,nj->...ni", E, x2)
    x2Ex1 = jnp.einsum("ni,...ni->...n", x2, Ex1)
    denom = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return (x2Ex1 * x2Ex1) / jnp.maximum(denom, 1e-12)


def triangulate_linear(R1, t1, R2, t2, x1, x2):
    """Batched midpoint-free linear (DLT) triangulation in *normalized* coordinates.

    x1, x2: (N, 2) normalized image coords observed in cameras (R1,t1), (R2,t2)
    (both world→camera). Returns X (N, 3) world points. TPU-native equivalent of
    ``cv2.triangulatePoints`` (reference ``src/vo_pipeline.py:172,666``), batched over
    all points at once instead of the reference's per-point Python loop (``:658-673``).

    Solves the inhomogeneous normal equations (BᵀB) X = −Bᵀb (A = [B | b]) with a
    closed-form 3x3 adjugate inverse — pure elementwise math that XLA fuses onto the
    VPU. (A batched 4x4 ``eigh`` here cost ~5 ms/frame on v5e — the eigensolver
    dominates the candidate-promotion stage; the closed-form solve is ~free.)
    Zero-parallax/at-infinity points produce a near-singular system and map to huge
    depths, which downstream depth/reprojection gates reject — the same failure
    mode as the homogeneous DLT's vanishing last coordinate.
    """
    P1 = jnp.concatenate([R1, t1[..., None]], axis=-1)  # (3,4)
    P2 = jnp.concatenate([R2, t2[..., None]], axis=-1)

    def rows(P, x):
        # x: (N, 2); P: (..., 3, 4) possibly batched per-point
        r0 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    r0a, r1a = rows(P1, x1)
    r0b, r1b = rows(P2, x2)
    A = jnp.stack([r0a, r1a, r0b, r1b], axis=-2)  # (N, 4, 4)
    B = A[..., :3]
    b = A[..., 3]
    H = jnp.einsum("...ki,...kj->...ij", B, B)            # (N, 3, 3) symmetric
    g = -jnp.einsum("...ki,...k->...i", B, b)             # (N, 3)
    h0, h1, h2 = H[..., 0, :], H[..., 1, :], H[..., 2, :]
    c12 = jnp.cross(h1, h2)
    det = jnp.sum(h0 * c12, axis=-1)
    adj = jnp.stack([c12, jnp.cross(h2, h0), jnp.cross(h0, h1)], axis=-1)  # adj(H)ᵀ cols
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, jnp.where(det < 0, -1e-12, 1e-12))
    return jnp.einsum("...ij,...j->...i", adj, g) / safe_det[..., None]


def bearing_angle(R1, t1, R2, t2, uv1, uv2, K):
    """True parallax angle (radians) between the two viewing rays of a track.

    The reference approximates this with raw pixel homogeneous vectors — never applying
    K^-1 nor the camera rotations (``src/vo_pipeline.py:622-637``). We compute the real
    angle: rotate each K^-1 [u,v,1] ray into the world frame and measure the angle.
    """
    r1 = backproject(K, uv1)                      # (N,3) in cam1 frame
    r2 = backproject(K, uv2)
    # world-frame ray = R^T r (broadcasts for shared (3,3) or per-point (N,3,3) poses)
    w1 = (jnp.swapaxes(R1, -1, -2) @ r1[..., None])[..., 0]
    w2 = (jnp.swapaxes(R2, -1, -2) @ r2[..., None])[..., 0]
    w1 = w1 / jnp.maximum(jnp.linalg.norm(w1, axis=-1, keepdims=True), 1e-12)
    w2 = w2 / jnp.maximum(jnp.linalg.norm(w2, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.clip(jnp.sum(w1 * w2, axis=-1), -1.0, 1.0)
    return jnp.arccos(cosang)
