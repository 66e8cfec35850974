"""Distributed sliding-window BA: landmark blocks sharded over a device mesh.

The structural analog of context parallelism (SURVEY §2.3, §5): the O(K) work —
residuals, Jacobians, per-landmark 3x3 marginalization, and both Schur contractions
— is partitioned over the mesh's landmark axis inside ``shard_map``; each device
contributes a partial reduced camera system that is summed with one ``psum`` over
ICI. The tiny (W*6)^2 reduced solve runs replicated; landmark back-substitution is
local to each shard. Multi-host runs ride the same code path (mesh axes spanning
DCN x ICI, ``jax.distributed.initialize`` via :func:`lcvo_tpu.parallel.mesh.init_distributed`).

Numerically identical to the single-device solver (:mod:`lcvo_tpu.solve.ba.schur`)
— the reduction is a plain sum over landmarks — which the CPU-mesh tests assert.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lcvo_tpu.solve.ba.schur import (
    BAProblem,
    BAResult,
    _apply_pose_delta,
    _residuals_jacobians,
    _solve_reduced,
    assemble_blocks,
)


def ba_solve_sharded(
    problem: BAProblem,
    mesh: Mesh,
    axis: str = "data",
    iters: int = 5,
    n_fix: int = 2,
    huber: float = 3e-3,
    lam0: float = 1e-4,
    fix_rows=None,
) -> BAResult:
    """LM window BA with the landmark dimension sharded over ``mesh[axis]``.

    ``problem.X`` (K, 3), ``problem.obs`` (W, K, 2) and ``problem.mask`` (W, K) are
    sharded on K (K must divide the axis size); poses are replicated.

    ``fix_rows`` (W,) bool overrides the default leading-``n_fix`` gauge anchor —
    behavioral parity with :func:`lcvo_tpu.solve.ba.schur.ba_solve`: callers with
    partially-filled windows must freeze REAL keyframes, not empty leading slots
    (see the ``ba_solve`` docstring; ADVICE r4).
    """
    R0, t0, X0, obs, mask = problem
    W = R0.shape[0]
    K = X0.shape[0]
    n_dev = mesh.shape[axis]
    assert K % n_dev == 0, f"landmark capacity {K} must divide mesh axis {n_dev}"
    fix_mask = (jnp.arange(W) < n_fix) if fix_rows is None else jnp.asarray(fix_rows)

    pose_spec = P()            # replicated
    lm_spec = P(axis)          # sharded on K (leading dim)
    obs_spec = P(None, axis)   # (W, K, ...) sharded on K

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pose_spec, pose_spec, lm_spec, obs_spec, obs_spec),
        out_specs=(pose_spec, pose_spec, lm_spec, pose_spec, pose_spec),
        check_vma=False,
    )
    def run(R, t, X, obs, mask):
        def cost_of(R, t, X):
            *_, c = _residuals_jacobians(R, t, X, obs, mask, huber)
            return lax.psum(c, axis)

        cost_init = cost_of(R, t, X)

        def body(_, carry):
            R, t, X, lam, cost_prev = carry
            # local shard assembly; the reduced system is a sum over landmarks
            S, rhs, U, Hll_inv, bl, _ = assemble_blocks(R, t, X, obs, mask, huber, lam)
            # remove the per-shard replication of the damped pose diagonal
            # (assemble_blocks adds Hpp + lam*I on every shard; keep exactly one)
            eye6 = jnp.eye(6, dtype=S.dtype)
            dev = lax.axis_index(axis)
            corr = jnp.where(dev == 0, 0.0, 1.0)
            S = S - corr * lam * jnp.einsum(
                "ij,wv->wivj", eye6, jnp.eye(W, dtype=S.dtype)
            )
            S = lax.psum(S, axis)
            rhs = lax.psum(rhs, axis)
            dp = _solve_reduced(S, rhs, fix_mask)          # replicated solve
            u_dp = jnp.einsum("wkij,wi->kj", U, dp)        # local landmarks
            dx = jnp.einsum("kij,kj->ki", Hll_inv, bl - u_dp)
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
            0, iters, body, (R, t, X, jnp.asarray(lam0, R.dtype), cost_init)
        )
        return R, t, X, cost_init, cost

    sh_lm = NamedSharding(mesh, lm_spec)
    sh_obs = NamedSharding(mesh, obs_spec)
    sh_rep = NamedSharding(mesh, pose_spec)
    R0 = jax.device_put(R0, sh_rep)
    t0 = jax.device_put(t0, sh_rep)
    X0 = jax.device_put(X0, sh_lm)
    obs = jax.device_put(obs, sh_obs)
    mask = jax.device_put(mask, sh_obs)
    R, t, X, c0, c = jax.jit(run)(R0, t0, X0, obs, mask)
    return BAResult(R=R, t=t, X=X, cost0=c0, cost=c)
