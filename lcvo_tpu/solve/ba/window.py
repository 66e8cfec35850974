"""Keyframe window manager for sliding-window BA.

Bridges the Markovian per-frame state (which keeps no history — reference
README.md:48-56) and the BA window (the one component that does). A ring buffer of
the last ``W`` keyframes stores, per keyframe: the pose and a snapshot of the track
table's pixel observations + slot generations. Landmark identity across keyframes is
slot index + generation: a slot that was pruned and re-used for a different landmark
gets a bumped ``gen`` (see :class:`lcvo_tpu.core.state.TrackTable`), so stale
observations are masked out instead of corrupting the window.

All window ops are fixed-shape and jittable; ``push`` and ``gather_problem`` run on
device inside the keyframe step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.core.state import TrackTable
from lcvo_tpu.solve.ba.schur import BAProblem, ba_solve


class KeyframeWindow(NamedTuple):
    """Ring buffer of W keyframes over a K-slot track table."""

    R: jnp.ndarray        # (W, 3, 3) world→camera pose at each keyframe
    t: jnp.ndarray        # (W, 3)
    obs: jnp.ndarray      # (W, K, 2) pixel observations of track slot k
    obs_gen: jnp.ndarray  # (W, K) int32 — track generation when observed
    obs_valid: jnp.ndarray  # (W, K) bool
    kf_valid: jnp.ndarray   # (W,) bool — slot holds a real keyframe
    head: jnp.ndarray       # () int32 — ring position of the NEXT write


def make_window(window: int, capacity: int) -> KeyframeWindow:
    return KeyframeWindow(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (window, 3, 3)),
        t=jnp.zeros((window, 3), jnp.float32),
        obs=jnp.zeros((window, capacity, 2), jnp.float32),
        obs_gen=jnp.full((window, capacity), -1, jnp.int32),
        obs_valid=jnp.zeros((window, capacity), bool),
        kf_valid=jnp.zeros((window,), bool),
        head=jnp.zeros((), jnp.int32),
    )


def push(win: KeyframeWindow, tracks: TrackTable, R, t) -> KeyframeWindow:
    """Record the current frame as a keyframe (overwrites the oldest)."""
    i = win.head
    return KeyframeWindow(
        R=win.R.at[i].set(R),
        t=win.t.at[i].set(t),
        obs=win.obs.at[i].set(tracks.P),
        obs_gen=win.obs_gen.at[i].set(tracks.gen),
        obs_valid=win.obs_valid.at[i].set(tracks.valid),
        kf_valid=win.kf_valid.at[i].set(True),
        head=(i + 1) % win.R.shape[0],
    )


def _chronological_order(win: KeyframeWindow):
    """Ring indices oldest→newest (the head points at the oldest slot)."""
    W = win.R.shape[0]
    return (win.head + jnp.arange(W)) % W


def gather_problem(win: KeyframeWindow, tracks: TrackTable, K_mat) -> tuple[BAProblem, jnp.ndarray]:
    """Build a dense-grid BAProblem from the window + current track table.

    Observations are valid iff the keyframe is real, the observation was valid when
    recorded, the track slot is still alive, and the generation matches (same
    landmark). Landmarks observed by < 2 keyframes are masked entirely (nothing to
    adjust). Returns (problem, order) where order maps problem row w → ring slot.
    """
    order = _chronological_order(win)
    R = win.R[order]
    t = win.t[order]
    obs_px = win.obs[order]
    m = (
        win.obs_valid[order]
        & win.kf_valid[order][:, None]
        & tracks.valid[None, :]
        & (win.obs_gen[order] == tracks.gen[None, :])
    )
    n_views = jnp.sum(m, axis=0)
    m = m & (n_views[None, :] >= 2)
    Kj = jnp.asarray(K_mat, jnp.float32)
    obs_n = geo.normalize_points(obs_px.reshape(-1, 2), Kj).reshape(obs_px.shape)
    return BAProblem(R=R, t=t, X=tracks.X, obs=obs_n, mask=m), order


@partial(jax.jit, static_argnames=("iters", "n_fix", "landmarks_only", "gauge"))
def refine_window(
    win: KeyframeWindow,
    tracks: TrackTable,
    K_mat,
    iters: int = 5,
    n_fix: int = 2,
    huber: float = 3e-3,
    lam0: float = 1e-4,
    landmarks_only: bool = False,
    gauge: str = "oldest",
):
    """Run window BA and write the results back.

    Returns (win', tracks', R_latest, t_latest, result). Landmark updates are applied
    only to slots that actually participated (≥ 2 valid views); pose updates are
    written back into the ring. The newest keyframe's refined pose is returned so the
    driver can re-anchor the live pose.
    """
    problem, order = gather_problem(win, tracks, K_mat)
    # gauge anchor: freeze n_fix REAL keyframes. Before the ring fills (and
    # right after a re-bootstrap reset) the chronological order leads with
    # EMPTY slots — freezing those instead of real poses leaves the window's
    # gauge (incl. monocular scale) floating on LM damping alone, which injects
    # scale drift every refine (ba_solve docstring). With ≤ n_fix real
    # keyframes this freezes them ALL: landmark-only refinement.
    #
    # gauge='oldest' (classic) vs 'newest' (backward smoothing: the live pose
    # never jumps and the window adopts the CURRENT scale instead of dragging
    # the newest pose toward the oldest keyframe's scale — see BAConfig.gauge).
    kfv = win.kf_valid[order]
    if landmarks_only:
        # structure-only refinement: ALL real keyframe poses frozen — multi-view
        # depth correction without pose feedback (no gauge motion possible)
        fix_rows = jnp.ones_like(kfv)
    elif gauge == "newest":
        rev_rank = jnp.cumsum(kfv[::-1])[::-1]  # 1 = newest real keyframe
        fix_rows = kfv & (rev_rank <= n_fix)
    else:
        fix_rows = kfv & (jnp.cumsum(kfv) <= n_fix)
    res = ba_solve(problem, iters=iters, n_fix=n_fix, huber=huber, lam0=lam0,
                   fix_rows=fix_rows)

    adjusted = jnp.sum(problem.mask, axis=0) >= 2  # (K,)
    X_new = jnp.where(adjusted[:, None], res.X, tracks.X)
    tracks = tracks._replace(X=X_new)
    if tracks.ang is not None:
        # a multi-view-refined landmark outranks 2-view anchor re-triangulation:
        # retire the anchor (ang=π disables further refinement for the slot) so
        # the pipeline's anchor pass can't overwrite BA's estimate (round 5)
        tracks = tracks._replace(
            ang=jnp.where(adjusted, jnp.float32(jnp.pi), tracks.ang)
        )

    win = win._replace(R=win.R.at[order].set(res.R), t=win.t.at[order].set(res.t))
    newest = order[-1]
    return win, tracks, win.R[newest], win.t[newest], res
