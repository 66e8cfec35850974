"""Sliding-window bundle adjustment: Schur-complement Levenberg-Marquardt.

The reference lists bundle adjustment as future work (report §3.2); BASELINE.json
config 3 asks for it: window = 10 keyframes, Schur-complement Gauss-Newton. This is
the framework's "long-context" component (SURVEY §5): the only place trajectory
history beyond the Markovian state is kept.

TPU-native design: the observation set is a **dense (W, K) grid** — keyframe w
observes landmark slot k, masked — instead of a sparse obs list. Every assembly step
is then a fixed-shape einsum/reduction:

- ``H_pp``  (W, 6, 6)    block-diagonal pose Hessian (poses couple only via points)
- ``H_ll``  (K, 3, 3)    block-diagonal landmark Hessian
- ``U``     (W, K, 6, 3) pose-landmark coupling blocks
- Schur:    ``S = H_pp - U H_ll^-1 U^T`` reduced to the (W*6, W*6) camera system,
  landmarks marginalized **in parallel per 3x3 block** (one batched closed-form
  inverse); back-substitution recovers landmark updates.

The reduced system is tiny (W=10 → 60x60) and solved replicated; the O(K) work
(residuals, Jacobians, H_ll, U, and both Schur contractions) is the part that shards
across devices — see :mod:`lcvo_tpu.solve.ba.sharded`.

Pose parametrization: left-multiplicative se(3) tangent on the world→camera
transform, ``T ← exp(δ) ∘ T`` with δ = (ω, v). Gauge freedom is removed by freezing
the first ``n_fix`` poses (their δ is forced to zero through the reduced system).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lcvo_tpu.core import geometry as geo


class BAProblem(NamedTuple):
    """Dense-grid BA inputs. All arrays fixed-shape; invalid entries masked."""

    R: jnp.ndarray        # (W, 3, 3) world→camera rotations
    t: jnp.ndarray        # (W, 3)
    X: jnp.ndarray        # (K, 3) world landmarks
    obs: jnp.ndarray      # (W, K, 2) normalized image coords (K^-1 applied)
    mask: jnp.ndarray     # (W, K) bool — keyframe w observes landmark k


class BAResult(NamedTuple):
    R: jnp.ndarray        # (W, 3, 3) refined
    t: jnp.ndarray        # (W, 3)
    X: jnp.ndarray        # (K, 3)
    cost0: jnp.ndarray    # () initial robust cost
    cost: jnp.ndarray     # () final robust cost


def _residuals_jacobians(R, t, X, obs, mask, huber: float):
    """Per-(w,k) robust-weighted residuals and Jacobians.

    Returns r (W,K,2), Jp (W,K,2,6) wrt pose tangent (ω,v), Jx (W,K,2,3) wrt X,
    all pre-multiplied by sqrt(huber weight) * mask, plus the robust cost.
    """
    # camera points p = R_w X_k + t_w → (W, K, 3)
    p = jnp.einsum("wij,kj->wki", R, X) + t[:, None, :]
    z = p[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    xy = p[..., :2] / z_safe[..., None]
    r = xy - obs  # (W, K, 2)

    # behind-camera observations carry no information
    mask = mask & (z > 1e-3)

    # Huber weights on the residual norm
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    w_rob = jnp.where(rn > huber, huber / rn, 1.0)
    cost = 0.5 * jnp.sum(
        jnp.where(mask, jnp.where(rn > huber, huber * (2 * rn - huber), rn * rn), 0.0)
    )
    sw = jnp.sqrt(w_rob) * mask.astype(r.dtype)

    # J_pi = d(xy)/dp : (W, K, 2, 3)
    iz = 1.0 / z_safe
    zero = jnp.zeros_like(iz)
    Jpi = jnp.stack(
        [
            jnp.stack([iz, zero, -p[..., 0] * iz * iz], axis=-1),
            jnp.stack([zero, iz, -p[..., 1] * iz * iz], axis=-1),
        ],
        axis=-2,
    )
    # dp/dδ = [-hat(p) | I]  (3, 6); dp/dX = R_w
    hp = jax.vmap(jax.vmap(geo.hat))(p)  # (W, K, 3, 3)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), hp.shape)
    Jdelta = jnp.concatenate([-hp, eye3], axis=-1)  # (W, K, 3, 6)
    Jp = jnp.einsum("wkab,wkbc->wkac", Jpi, Jdelta)  # (W, K, 2, 6)
    Jx = jnp.einsum("wkab,wbc->wkac", Jpi, R)        # (W, K, 2, 3)

    r = r * sw[..., None]
    Jp = Jp * sw[..., None, None]
    Jx = Jx * sw[..., None, None]
    return r, Jp, Jx, cost


def _inv3(A):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def assemble_blocks(R, t, X, obs, mask, huber, lam):
    """Per-shard BA assembly: everything that is O(K).

    Returns the pieces of the Schur-reduced camera system plus what landmark
    back-substitution needs. This is the function that runs per-device in the
    sharded variant (landmark axis partitioned, outputs psum-reduced).
    """
    r, Jp, Jx, cost = _residuals_jacobians(R, t, X, obs, mask, huber)
    W = R.shape[0]

    Hpp = jnp.einsum("wkai,wkaj->wij", Jp, Jp)            # (W, 6, 6)
    bp = jnp.einsum("wkai,wka->wi", Jp, r)                # (W, 6)
    Hll = jnp.einsum("wkai,wkaj->kij", Jx, Jx)            # (K, 3, 3)
    bl = jnp.einsum("wkai,wka->ki", Jx, r)                # (K, 3)
    U = jnp.einsum("wkai,wkaj->wkij", Jp, Jx)             # (W, K, 6, 3)

    # LM damping on the landmark blocks before inversion
    Hll_inv = _inv3(Hll + lam * jnp.eye(3, dtype=Hll.dtype))  # (K, 3, 3)

    # Schur contractions over the landmark axis
    S_corr = jnp.einsum("wkij,kjl,vkml->wivm", U, Hll_inv, U)  # (W, 6, W, 6)
    b_corr = jnp.einsum("wkij,kjl,kl->wi", U, Hll_inv, bl)     # (W, 6)

    Hpp_full = jnp.zeros((W, 6, W, 6), Hpp.dtype)
    Hpp_full = Hpp_full.at[jnp.arange(W), :, jnp.arange(W), :].set(
        Hpp + lam * jnp.eye(6, dtype=Hpp.dtype)
    )
    S = Hpp_full - S_corr
    rhs = bp - b_corr
    return S, rhs, U, Hll_inv, bl, cost


def _solve_reduced(S, rhs, fix_mask):
    """Solve the (W*6, W*6) reduced camera system with frozen poses masked out."""
    W = rhs.shape[0]
    free = (~fix_mask).astype(S.dtype)  # (W,)
    fm = free[:, None]                  # (W, 1) per-dof mask (all 6 dofs together)
    M = S * fm[:, :, None, None] * fm[None, None, :, :]
    Sm = M.reshape(W * 6, W * 6)
    # unit diagonal on frozen dofs keeps the system non-singular with δ = 0 there
    diag_fix = jnp.repeat(fix_mask, 6).astype(S.dtype)
    Sm = Sm + jnp.diag(diag_fix)
    rhs_m = (rhs * fm).reshape(W * 6)
    delta = jnp.linalg.solve(Sm, rhs_m).reshape(W, 6)
    return delta * free[:, None]


def _apply_pose_delta(R, t, delta):
    """T ← exp(-δ) ∘ T (GN step is -H^-1 b with b = J^T r)."""
    omega, v = delta[:, :3], delta[:, 3:]
    dR = jax.vmap(geo.rodrigues)(-omega)
    R_new = jnp.einsum("wij,wjk->wik", dR, R)
    t_new = jnp.einsum("wij,wj->wi", dR, t) - v
    return R_new, t_new


@partial(jax.jit, static_argnames=("iters", "n_fix"))
def ba_solve(
    problem: BAProblem,
    iters: int = 5,
    n_fix: int = 2,
    huber: float = 3e-3,
    lam0: float = 1e-4,
    fix_rows=None,
) -> BAResult:
    """Run ``iters`` LM iterations on the window. All shapes static; the iteration is a
    ``lax.fori_loop`` with accept/reject by value (no data-dependent control flow).

    ``huber`` is in normalized-coordinate units (≈ px / fx). Frozen poses: the first
    ``n_fix`` window slots (gauge anchor — standard sliding-window practice; the
    reference has no BA to compare), or an explicit ``fix_rows`` (W,) bool mask.
    Callers whose problem rows include EMPTY slots (a partially-filled keyframe
    ring) must pass ``fix_rows`` marking real keyframes: freezing empty rows
    leaves the live window's 7-DoF gauge — including monocular scale — anchored
    by nothing but LM damping, and each refine then injects null-space drift
    (measured: turn-sequence ATE 0.31 → 1.30 m before this fix; see
    ``window.refine_window``).
    """
    R0, t0, X0, obs, mask = problem
    W = R0.shape[0]
    fix_mask = (jnp.arange(W) < n_fix) if fix_rows is None else fix_rows

    def cost_of(R, t, X):
        *_, c = _residuals_jacobians(R, t, X, obs, mask, huber)
        return c

    cost_init = cost_of(R0, t0, X0)

    def body(_, carry):
        R, t, X, lam, cost_prev = carry
        S, rhs, U, Hll_inv, bl, _ = assemble_blocks(R, t, X, obs, mask, huber, lam)
        dp = _solve_reduced(S, rhs, fix_mask)                      # (W, 6)
        # landmark back-substitution: δx_k = Hll_k^-1 (bl_k - Σ_w U_wk^T δp_w)
        u_dp = jnp.einsum("wkij,wi->kj", U, dp)                    # (K, 3)
        dx = jnp.einsum("kij,kj->ki", Hll_inv, bl - u_dp)          # (K, 3)
        R_new, t_new = _apply_pose_delta(R, t, dp)
        X_new = X - dx
        cost_new = cost_of(R_new, t_new, X_new)
        accept = cost_new < cost_prev
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        X = jnp.where(accept, X_new, X)
        lam = jnp.where(accept, lam * 0.3, lam * 8.0)
        cost = jnp.where(accept, cost_new, cost_prev)
        return R, t, X, lam, cost

    R, t, X, _, cost = lax.fori_loop(
        0, iters, body, (R0, t0, X0, jnp.asarray(lam0, R0.dtype), cost_init)
    )
    return BAResult(R=R, t=t, X=X, cost0=cost_init, cost=cost)
