"""Essential-matrix estimation: batched 8-point RANSAC + cheirality pose recovery.

TPU-native equivalent of ``cv2.findEssentialMat`` (Nistér 5-point + RANSAC, reference
``src/vo_pipeline.py:156``) and ``cv2.recoverPose`` (``:159``). Instead of OpenCV's
serial adaptive RANSAC, all H hypotheses are solved in parallel: minimal 8-point sets
→ batched normal-equation null vectors (9x9 eigh) → rank-2 projection → Sampson
scoring of every hypothesis against every correspondence as one matmul-shaped kernel
(MSAC). BASELINE.json allows the 8-point DLT in place of Nistér's 5-point.

All point inputs here are **normalized** image coordinates (pixels pre-multiplied by
K^-1) so thresholds are focal-length independent; callers convert pixel thresholds via
``thresh_px / fx``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import ransac


def _homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1)


def eight_point(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None):
    """Least-squares essential/fundamental fit from ≥8 correspondences.

    x1, x2: (..., N, 2) normalized coords with x2^T E x1 = 0. Optional weights w
    (..., N). Returns E (..., 3, 3) (not yet rank-2-projected). Batched over leading
    dims — this one routine serves both the minimal solver (N=8, batched over
    hypotheses) and the all-inlier refit.
    """
    h1 = _homogeneous(x1)
    h2 = _homogeneous(x2)
    # row_i = kron(x2_i, x1_i): (..., N, 9)
    A = (h2[..., :, None] * h1[..., None, :]).reshape(*h1.shape[:-1], 9)
    if w is not None:
        A = A * w[..., None]
    # smallest right singular vector of A directly — eigh(A^T A) squares the
    # condition number, which in f32 costs ~degrees of pose accuracy at
    # sub-pixel noise levels
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    e = Vt[..., -1, :]
    return e.reshape(*e.shape[:-1], 3, 3)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values → (1, 1, 0)."""
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return U @ (d[..., :, None] * Vt)


def decompose_essential(E: jnp.ndarray):
    """E → four (R, t) candidates (cam1→cam2), ||t|| = 1.

    Returns R (4, 3, 3), t (4, 3). The physical one is picked by cheirality
    (:func:`recover_pose`), replacing ``cv2.recoverPose``'s internal test.
    """
    U, s, Vt = jnp.linalg.svd(E)
    # make proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    u3 = U[..., :, 2]
    R = jnp.stack([Ra, Ra, Rb, Rb])
    t = jnp.stack([u3, -u3, u3, -u3])
    return R, t


def recover_pose(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, valid: jnp.ndarray):
    """Cheirality-disambiguated pose from E: triangulate under all 4 decompositions,
    pick the one with the most points in front of both cameras (batched equivalent of
    ``cv2.recoverPose``, reference ``src/vo_pipeline.py:159``).

    Returns (R (3,3), t (3,), n_good) with pose cam1→cam2 (x2 = R x1 + t).
    """
    R4, t4 = decompose_essential(E)
    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros((3,), E.dtype)

    def count_good(R, t):
        X = geo.triangulate_linear(eye, zero, R, t, x1, x2)
        z1 = X[..., 2]
        Xc2 = geo.se3_apply(R, t, X)
        z2 = Xc2[..., 2]
        good = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(good)

    counts = jax.vmap(count_good)(R4, t4)
    best = jnp.argmax(counts)
    return R4[best], t4[best], counts[best]


def _sampson_residuals(E, h1, h2):
    """Signed first-order geometric (Sampson) residuals, (N,)."""
    Eh1 = jnp.einsum("ij,nj->ni", E, h1)
    Eth2 = jnp.einsum("ji,nj->ni", E, h2)
    s = jnp.einsum("ni,ni->n", h2, Eh1)
    g = Eh1[:, 0] ** 2 + Eh1[:, 1] ** 2 + Eth2[:, 0] ** 2 + Eth2[:, 1] ** 2
    return s / jnp.sqrt(jnp.maximum(g, 1e-12))


def refine_pose_sampson(R, t, x1, x2, w, iters: int = 8, damping: float = 1e-8):
    """Gauss-Newton polish of a relative pose on the essential manifold.

    Minimizes weighted Sampson error over the 5 dof (rotation tangent + unit-
    translation tangent) — the batched equivalent of the LM refinement OpenCV runs
    after RANSAC; the linear 8-point refit alone leaves ~10x more direction error
    at sub-pixel noise in f32. Jacobians come from forward-mode autodiff of the
    residual vector (5 JVPs — tiny).
    """
    h1 = _homogeneous(x1)
    h2 = _homogeneous(x2)

    def step(_, Rt):
        R, t = Rt
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        # orthonormal basis of the tangent plane at t
        a = jnp.where(jnp.abs(t[0]) < 0.9, jnp.asarray([1.0, 0, 0], t.dtype), jnp.asarray([0.0, 1, 0], t.dtype))
        b1 = jnp.cross(t, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(t, b1)

        def residuals(p):
            Rp = geo.rodrigues(p[:3]) @ R
            tp = t + b1 * p[3] + b2 * p[4]
            tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
            E = geo.hat(tp) @ Rp
            return w * _sampson_residuals(E, h1, h2)

        p0 = jnp.zeros((5,), R.dtype)
        r = residuals(p0)
        J = jax.jacfwd(residuals)(p0)  # (N, 5)
        H = J.T @ J + damping * jnp.eye(5, dtype=R.dtype)
        delta = -jnp.linalg.solve(H, J.T @ r)
        Rn = geo.rodrigues(delta[:3]) @ R
        tn = t + b1 * delta[3] + b2 * delta[4]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        return Rn, tn

    return jax.lax.fori_loop(0, iters, step, (R, t))


@partial(jax.jit, static_argnames=("n_hyp", "solver"))
def essential_ransac(
    key,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    n_hyp: int = 512,
    solver: str = "eight_point",
):
    """Robust essential matrix from normalized correspondences.

    Returns (E (3,3), inliers (N,) bool, n_inliers). ``thresh`` is the Sampson
    distance threshold in normalized units (pixel_thresh / fx). ``solver`` selects
    the minimal solver: "eight_point" (batched DLT, the default easy-mode per
    BASELINE.json) or "five_point" (Nistér — exact parity with the reference's
    ``cv2.findEssentialMat``; each sample yields up to 10 hypotheses).
    """
    N = x1.shape[0]
    h1 = _homogeneous(x1)
    h2 = _homogeneous(x2)
    if solver == "five_point":
        from lcvo_tpu.ops.five_point import five_point

        n_samp = max(n_hyp // 10, 1)
        idx = ransac.sample_minimal_sets(key, N, valid, n_samp, 5)   # (S, 5)
        E_h, hyp_ok = five_point(x1[idx], x2[idx])                   # (S, 10, 3, 3)
        E_h = E_h.reshape(-1, 3, 3)
        hyp_ok = hyp_ok.reshape(-1)
        err = geo.sampson_error(E_h, h1, h2)                          # (S*10, N)
        err = jnp.where(hyp_ok[:, None], err, jnp.inf)
    else:
        idx = ransac.sample_minimal_sets(key, N, valid, n_hyp, 8)  # (H, 8)
        s1 = x1[idx]  # (H, 8, 2)
        s2 = x2[idx]
        E_h = eight_point(s1, s2)                       # (H, 3, 3)
        E_h = project_to_essential(E_h)
        err = geo.sampson_error(E_h, h1, h2)            # (H, N)
    score, counts = ransac.msac_score(err, valid, thresh * thresh)
    best = ransac.best_hypothesis(score)
    E_best = E_h[best]
    inl = (geo.sampson_error(E_best, h1, h2) < thresh * thresh) & valid

    # nonlinear polish on the inliers: decompose the best hypothesis to (R, t)
    # by cheirality, Gauss-Newton the 5-dof pose on the Sampson objective (the
    # equivalent of OpenCV's post-RANSAC LM), and rebuild E
    R0, t0, _ = recover_pose(E_best, x1, x2, inl)
    Rr, tr = refine_pose_sampson(R0, t0, x1, x2, inl.astype(x1.dtype))
    E_ref = geo.hat(tr) @ Rr
    inl_ref = (geo.sampson_error(E_ref, h1, h2) < thresh * thresh) & valid
    # keep the refit only if it didn't lose inliers (degenerate refits can)
    use_ref = jnp.sum(inl_ref) >= jnp.sum(inl)
    E_out = jnp.where(use_ref, E_ref, E_best)
    inl_out = jnp.where(use_ref, inl_ref, inl)
    return E_out, inl_out, jnp.sum(inl_out)
