"""Perspective-n-Point localization: batched P3P (Grunert) RANSAC + Gauss-Newton polish.

TPU-native equivalent of ``cv2.solvePnPRansac`` with ``SOLVEPNP_ITERATIVE`` (reference
``src/vo_pipeline.py:258-264``: P3P minimal sets inside RANSAC, 2 px reprojection
threshold, LM refinement). The redesign:

- Grunert's P3P system is reduced to a quartic whose coefficients are recovered
  *numerically* (evaluate the defining rational identity at 5 nodes, invert a constant
  Vandermonde) — no hand-expanded algebra, fully batched over hypotheses.
- Quartic roots via batched Durand-Kerner (Weierstrass) iteration in complex64 — a
  fixed-iteration, division-only scheme that vectorizes perfectly on the VPU
  (nonsymmetric eigendecompositions, the usual root-finder, don't run on TPU).
- Each of the ≤4 roots of every sample is its own hypothesis; all are scored against
  all points with one batched reprojection kernel (MSAC).
- Fixed-iteration Gauss-Newton on the inlier set replaces OpenCV's LM polish.

All image measurements are **normalized** coordinates (K^-1 pixels); thresholds are
pixel thresholds divided by fx.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import ransac

# ---------------------------------------------------------------------------
# Quartic root solving (Durand-Kerner)
# ---------------------------------------------------------------------------

_DK_ITERS = 40


def quartic_roots(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Roots of A v^4 + B v^3 + C v^2 + D v + E, batched.

    coeffs: (..., 5) [A, B, C, D, E] real. Returns (..., 4) complex64 roots.
    Durand-Kerner with fixed iteration count — no data-dependent control flow.
    """
    c = coeffs.astype(jnp.complex64)
    lead = c[..., 0:1]
    lead = jnp.where(jnp.abs(lead) > 1e-12, lead, 1e-12 + 0j)
    p = c / lead  # monic: v^4 + p1 v^3 + p2 v^2 + p3 v + p4

    def poly(z):
        return (((z + p[..., 1:2]) * z + p[..., 2:3]) * z + p[..., 3:4]) * z + p[..., 4:5]

    # standard DK seeds: powers of (0.4 + 0.9i)
    seed = jnp.asarray([(0.4 + 0.9j) ** k for k in range(1, 5)], jnp.complex64)
    z = jnp.broadcast_to(seed, p.shape[:-1] + (4,))

    def body(_, z):
        pz = poly(z)
        diff = z[..., :, None] - z[..., None, :]  # (..., 4, 4)
        eye = jnp.eye(4, dtype=jnp.complex64)
        diff = diff + eye  # avoid 0 on diagonal
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12 + 0j)
        return z - pz / denom

    return jax.lax.fori_loop(0, _DK_ITERS, body, z)


# ---------------------------------------------------------------------------
# P3P minimal solver (Grunert via numeric quartic extraction)
# ---------------------------------------------------------------------------

# Vandermonde nodes for recovering the 5 quartic coefficients from evaluations
_NODES = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
_VANDERMONDE_INV = jnp.linalg.inv(jnp.stack([_NODES**k for k in range(4, -1, -1)], axis=-1))


def _kabsch(Pc: jnp.ndarray, Pw: jnp.ndarray):
    """Rigid transform world→camera from 3 paired points: Pc ≈ R Pw + t.

    Batched Kabsch via 3x3 SVD. Pc, Pw: (..., 3, 3) rows = points.
    """
    muc = jnp.mean(Pc, axis=-2, keepdims=True)
    muw = jnp.mean(Pw, axis=-2, keepdims=True)
    H = jnp.einsum("...ni,...nj->...ij", Pw - muw, Pc - muc)
    U, s, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt).swapaxes(-1, -2)))
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )
    R = jnp.einsum("...ji,...j,...jk->...ik", Vt, D, U.swapaxes(-1, -2))
    # R maps world → camera: R = V diag(1,1,d) U^T  (from H = U S V^T of w->c covariance)
    t = (muc - jnp.einsum("...ij,...nj->...ni", R, muw))[..., 0, :]
    return R, t


def _triad_align(Pc: jnp.ndarray, Pw: jnp.ndarray):
    """Rigid transform world→camera from 3 EXACTLY corresponding points.

    Builds orthonormal triads from the point triangles in both frames and composes
    them: ``R = M_c M_w^T``. Exact when the correspondence is rigid (true for P3P
    minimal sets); closed-form cross products only — no SVD.
    Pc, Pw: (..., 3, 3) rows = points.
    """

    def triad(P):
        u = P[..., 1, :] - P[..., 0, :]
        v = P[..., 2, :] - P[..., 0, :]
        e1 = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        n = jnp.cross(e1, v)
        e3 = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        e2 = jnp.cross(e3, e1)
        return jnp.stack([e1, e2, e3], axis=-1)  # columns

    Mc = triad(Pc)
    Mw = triad(Pw)
    R = jnp.einsum("...ij,...kj->...ik", Mc, Mw)
    t = Pc[..., 0, :] - jnp.einsum("...ij,...j->...i", R, Pw[..., 0, :])
    return R, t


def p3p_grunert(Pw: jnp.ndarray, f: jnp.ndarray):
    """Grunert P3P: world points Pw (..., 3, 3) + unit bearings f (..., 3, 3)
    → up to 4 poses. Returns (R (..., 4, 3, 3), t (..., 4, 3), ok (..., 4)).

    The quartic in the depth ratio v = s3/s1 is recovered by evaluating Grunert's
    rational identity at 5 nodes and inverting a constant Vandermonde matrix.
    """
    P1, P2, P3 = Pw[..., 0, :], Pw[..., 1, :], Pw[..., 2, :]
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    a2 = jnp.sum((P2 - P3) ** 2, -1)
    b2 = jnp.sum((P1 - P3) ** 2, -1)
    c2 = jnp.sum((P1 - P2) ** 2, -1)
    ca = jnp.sum(f2 * f3, -1)  # cos alpha (angle at rays 2-3)
    cb = jnp.sum(f1 * f3, -1)  # cos beta  (rays 1-3)
    cg = jnp.sum(f1 * f2, -1)  # cos gamma (rays 1-2)

    b2s = jnp.maximum(b2, 1e-12)
    k_ac = (a2 - c2) / b2s
    k_c = c2 / b2s

    def G(v):
        # u(v) = num/den from combining the three law-of-cosines constraints
        B = 1.0 + v * v - 2.0 * v * cb
        num = 1.0 - v * v + k_ac * B
        den = 2.0 * (cg - v * ca)
        Dv = 1.0 - k_c * B
        # quartic identity: num^2 - 2 num cg den + Dv den^2 = 0
        return num * num - 2.0 * num * cg * den + Dv * den * den

    evals = jnp.stack([G(n) for n in _NODES], axis=-1)  # (..., 5)
    coeffs = jnp.einsum("ij,...j->...i", _VANDERMONDE_INV.astype(evals.dtype), evals)
    roots = quartic_roots(coeffs)  # (..., 4) complex

    v = jnp.real(roots)
    root_ok = (jnp.abs(jnp.imag(roots)) < 1e-3 * (1.0 + jnp.abs(v))) & (v > 1e-6)

    Bv = 1.0 + v * v - 2.0 * v * cb[..., None]
    num = 1.0 - v * v + k_ac[..., None] * Bv
    den = 2.0 * (cg[..., None] - v * ca[..., None])
    u = num / jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)
    s1 = jnp.sqrt(jnp.maximum(b2[..., None], 1e-12) / jnp.maximum(Bv, 1e-9))
    s2 = u * s1
    s3 = v * s1
    depth_ok = (s1 > 0) & (s2 > 0) & (s3 > 0) & (Bv > 1e-9)

    # camera-frame points for each root: (..., 4, 3, 3)
    Pc = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )
    Pw4 = jnp.broadcast_to(Pw[..., None, :, :], Pc.shape)
    # minimal sets are exact → closed-form triad alignment instead of the batched
    # 3x3 SVD Kabsch (XLA's iterative batched SVD dominated the PnP profile)
    R, t = _triad_align(Pc, Pw4)
    return R, t, root_ok & depth_ok


# ---------------------------------------------------------------------------
# Reprojection scoring + Gauss-Newton refinement
# ---------------------------------------------------------------------------


def reproj_sq_error(R, t, X, x_obs):
    """Squared reprojection error in normalized coords. R (..., 3, 3), t (..., 3),
    X (N, 3) world, x_obs (N, 2) normalized. Returns (..., N); points behind the
    camera get +inf."""
    Xc = jnp.einsum("...ij,nj->...ni", R, X) + t[..., None, :]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    proj = Xc[..., :2] / zs[..., None]
    err = jnp.sum((proj - x_obs) ** 2, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)


def gauss_newton_pose(R, t, X, x_obs, weights, iters: int = 8, damping: float = 1e-6):
    """Fixed-iteration damped Gauss-Newton pose polish (replaces OpenCV's LM).

    Left-multiplicative se(3) perturbation: Xc' = exp(w^)(R X + t) + dt.
    weights (N,) — inlier mask (or robust weights); zero-weight points contribute
    nothing, keeping shapes static.
    """

    def step(_, Rt):
        R, t = Rt
        Xc = jnp.einsum("ij,nj->ni", R, X) + t
        z = jnp.maximum(Xc[..., 2], 1e-6)
        proj = Xc[..., :2] / z[..., None]
        r = proj - x_obs  # (N, 2)
        inv_z = 1.0 / z
        x_, y_ = Xc[..., 0], Xc[..., 1]
        # d proj / d Xc : (N, 2, 3)
        Jp = jnp.stack(
            [
                jnp.stack([inv_z, jnp.zeros_like(z), -x_ * inv_z * inv_z], -1),
                jnp.stack([jnp.zeros_like(z), inv_z, -y_ * inv_z * inv_z], -1),
            ],
            axis=-2,
        )
        # d Xc / d [w, dt] = [-[Xc]_x | I] : (N, 3, 6)
        Jx = jnp.concatenate(
            [-geo.hat(Xc), jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), Xc.shape[:-1] + (3, 3))],
            axis=-1,
        )
        J = jnp.einsum("nij,njk->nik", Jp, Jx)  # (N, 2, 6)
        w = weights[:, None]
        JtJ = jnp.einsum("nik,nil->kl", J * w[..., None], J)
        Jtr = jnp.einsum("nik,ni->k", J * w[..., None], r)
        H = JtJ + damping * jnp.eye(6, dtype=R.dtype)
        delta = -jnp.linalg.solve(H, Jtr)
        wv, dt = delta[:3], delta[3:]
        dR = geo.rodrigues(wv)
        return dR @ R, (dR @ t[:, None])[:, 0] + dt

    return jax.lax.fori_loop(0, iters, step, (R, t))


# ---------------------------------------------------------------------------
# Full PnP-RANSAC
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def pnp_ransac(
    key,
    X: jnp.ndarray,
    x_obs: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    n_hyp: int = 512,
    refine_iters: int = 8,
):
    """Robust world→camera pose from 2D-3D correspondences.

    X (N, 3) world points; x_obs (N, 2) normalized observations; thresh in
    normalized units (pixel_thresh / fx). Returns (R, t, inliers (N,), n_inliers).
    """
    N = X.shape[0]
    idx = ransac.sample_minimal_sets(key, N, valid, n_hyp, 3)  # (H, 3)
    Pw = X[idx]  # (H, 3, 3)
    xo = x_obs[idx]  # (H, 3, 2)
    f = jnp.concatenate([xo, jnp.ones(xo.shape[:-1] + (1,), xo.dtype)], -1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    R_h, t_h, ok_h = p3p_grunert(Pw, f)  # (H, 4, 3, 3), (H, 4, 3), (H, 4)
    R_h = R_h.reshape(-1, 3, 3)
    t_h = t_h.reshape(-1, 3)
    ok_h = ok_h.reshape(-1)

    err = reproj_sq_error(R_h, t_h, X, x_obs)  # (H*4, N)
    err = jnp.where(ok_h[:, None], err, jnp.inf)
    score, counts = ransac.msac_score(err, valid, thresh * thresh)
    # hypotheses that were invalid roots produce inf errors → max score; fine
    best = ransac.best_hypothesis(score)
    R0, t0 = R_h[best], t_h[best]
    inl0 = (reproj_sq_error(R0, t0, X, x_obs) < thresh * thresh) & valid

    Rr, tr = gauss_newton_pose(R0, t0, X, x_obs, inl0.astype(X.dtype), iters=refine_iters)
    inl = (reproj_sq_error(Rr, tr, X, x_obs) < thresh * thresh) & valid
    # guard: keep the refined pose only if it didn't lose inliers
    use_ref = jnp.sum(inl) >= jnp.sum(inl0)
    R_out = jnp.where(use_ref, Rr, R0)
    t_out = jnp.where(use_ref, tr, t0)
    inl_out = jnp.where(use_ref, inl, inl0)
    return R_out, t_out, inl_out, jnp.sum(inl_out)
