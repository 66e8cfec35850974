"""Fixed-capacity masked VO state — the XLA-native replacement for the reference's
ragged numpy state.

The reference mutates ragged arrays every frame (``np.delete`` / ``np.concatenate``,
value-based row matching via ``np.isin`` — ``src/vo_pipeline.py:217-225,521-545``),
which is hostile to XLA (shape changes every step → recompile). Here the Markovian
state ``S_i = (P, X, C, F, T)`` (reference ``src/vo_pipeline.py:20-38``, README.md:48-56)
lives in **preallocated tables with validity masks**:

- ``TrackTable``  : landmark tracks   P[K,2] pixels, X[K,3] world points, valid[K]
- ``CandidateTable``: candidate tracks C[M,2] current px, F[M,2] first-observation px,
  first-observation pose (R_f[M,3,3], t_f[M,3]) — the reference's ``T`` — and valid[M]

Slot lifecycle is index-based (no value matching): pruning clears masks in place;
insertion assigns new items to free slots via a stable argsort of the validity mask.
Shapes never change → the whole per-frame step compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrackTable(NamedTuple):
    """Active landmark tracks (the reference's ``state['P'], state['X']``).

    The anchor fields (``F``, ``R_f``, ``t_f``, ``ang``) carry each landmark's
    FIRST observation (pixel + frozen pose + the parallax angle at the last
    (re-)triangulation) from its candidate life into the track table. They power
    continuous anchor re-triangulation (``pipeline.process_frame`` step 2.5): a
    landmark promoted at the α-gate's minimum parallax keeps improving as the
    baseline to its anchor grows, instead of freezing its noisiest-possible
    depth estimate forever — the round-5 cure for the turn-replay scale-decay
    spiral (BASELINE.md round 4). ``None`` anchors (tests / BA-only tables)
    disable refinement for those tracks."""

    P: jnp.ndarray      # (K, 2) float32 — pixel positions in the current frame
    X: jnp.ndarray      # (K, 3) float32 — world-frame landmarks
    valid: jnp.ndarray  # (K,)  bool
    gen: jnp.ndarray    # (K,)  int32 — slot generation; bumped on insert so consumers
    #                     holding references across frames (the BA window) can detect
    #                     slot reuse for a different landmark
    F: jnp.ndarray | None = None     # (K, 2) anchor (first-observation) pixels
    R_f: jnp.ndarray | None = None   # (K, 3, 3) anchor world→camera rotation
    t_f: jnp.ndarray | None = None   # (K, 3)
    ang: jnp.ndarray | None = None   # (K,) parallax angle (rad) at last triangulation

    @property
    def capacity(self) -> int:
        return self.P.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


class CandidateTable(NamedTuple):
    """Candidate tracks awaiting triangulation (the reference's extended state
    ``C, F, T`` — ``src/main.py:185-188``). The first-observation pose is stored as
    (R_f, t_f) per slot instead of a 4x4 (cheaper, and what triangulation wants)."""

    C: jnp.ndarray       # (M, 2) float32 — current pixel positions
    F: jnp.ndarray       # (M, 2) float32 — first-observation pixel positions
    R_f: jnp.ndarray     # (M, 3, 3) float32 — first-observation world→camera rotation
    t_f: jnp.ndarray     # (M, 3) float32
    valid: jnp.ndarray   # (M,) bool
    age: jnp.ndarray     # (M,) int32 — frames since first observation

    @property
    def capacity(self) -> int:
        return self.C.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


class VOState(NamedTuple):
    """Full Markovian per-frame state: ``[S_i, T_i] = process_frame(I_i, S_{i-1})``."""

    tracks: TrackTable
    cands: CandidateTable
    R: jnp.ndarray          # (3, 3) current world→camera rotation
    t: jnp.ndarray          # (3,) current world→camera translation
    frame_idx: jnp.ndarray  # () int32
    prev_image: jnp.ndarray  # (H, W) float32 — previous grayscale frame (device-side)
    prev_pyramid: tuple      # tuple of (H/2^l, W/2^l) arrays — previous frame's pyramid
    health: jnp.ndarray     # () int32 — consecutive-frame inlier-starvation counter
    # sift-sift candidate mode only (None otherwise): the previous frame's
    # descriptor table, matched against to filter already-seen keypoints — the
    # reference's intended semantics (it accidentally keeps the stale bootstrap
    # descriptors, ``src/main.py:294``; SURVEY §2.1 quirks)
    prev_desc: jnp.ndarray | None = None        # (D, 128) float32
    prev_desc_valid: jnp.ndarray | None = None  # (D,) bool
    # previous frame's pose (the pose BEFORE R/t): with (R, t) it defines the
    # last relative motion, which the tracker's constant-velocity warm start
    # extrapolates to predict per-track flow for the next frame
    prev_R: jnp.ndarray | None = None   # (3, 3)
    prev_t: jnp.ndarray | None = None   # (3,)


def make_track_table(capacity: int) -> TrackTable:
    return TrackTable(
        P=jnp.zeros((capacity, 2), jnp.float32),
        X=jnp.zeros((capacity, 3), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        gen=jnp.zeros((capacity,), jnp.int32),
        F=jnp.zeros((capacity, 2), jnp.float32),
        R_f=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (capacity, 3, 3)),
        t_f=jnp.zeros((capacity, 3), jnp.float32),
        # π: anchor refinement triggers on parallax GROWTH, so unseeded slots
        # (already at the max possible angle) can never re-triangulate
        ang=jnp.full((capacity,), jnp.pi, jnp.float32),
    )


def make_candidate_table(capacity: int) -> CandidateTable:
    return CandidateTable(
        C=jnp.zeros((capacity, 2), jnp.float32),
        F=jnp.zeros((capacity, 2), jnp.float32),
        R_f=jnp.zeros((capacity, 3, 3), jnp.float32),
        t_f=jnp.zeros((capacity, 3), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        age=jnp.zeros((capacity,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Masked slot operations
# ---------------------------------------------------------------------------


def free_slots(valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Indices of the first ``n`` free slots (stable). If fewer than ``n`` are free the
    tail indices point at *occupied* slots — callers must also gate on
    ``num_free`` (see :func:`insert_mask`)."""
    order = jnp.argsort(valid, stable=True)  # False (free) slots first
    return order[:n]


def insert_into_tracks(table: TrackTable, P_new, X_new, new_valid,
                       F_new=None, R_f_new=None, t_f_new=None, ang_new=None) -> TrackTable:
    """Insert up to N new landmarks into free slots of the track table.

    P_new (N,2), X_new (N,3), new_valid (N,) — only entries with new_valid=True and a
    genuinely-free destination slot are written. Overflow (more new items than free
    slots) silently drops the excess — matching the bounded-capacity design.

    Anchor fields (see :class:`TrackTable`): ``F_new`` (N,2), ``R_f_new``
    ((N,3,3) or a shared (3,3)), ``t_f_new`` ((N,3) or (3,)), ``ang_new`` (N,) or
    scalar. Callers without anchor data (tests) may omit them — inserted tracks
    then anchor at their own position with ``ang=π``, which disables anchor
    re-triangulation for them. Ignored entirely when the table has no anchor
    fields (``table.F is None``).
    """
    # order new items valid-first so ranks are contiguous and invalid entries never
    # consume free slots
    order = jnp.argsort(~new_valid, stable=True)
    P_new, X_new, new_valid = P_new[order], X_new[order], new_valid[order]
    n = min(P_new.shape[0], table.capacity)
    P_new, X_new, new_valid = P_new[:n], X_new[:n], new_valid[:n]
    slots = free_slots(table.valid, n)
    num_free = jnp.sum(~table.valid)
    rank = jnp.arange(n)
    ok = new_valid & (rank < num_free)
    # guard: never overwrite an occupied slot (when ok is False we scatter the slot's
    # existing contents back onto itself)
    P = table.P.at[slots].set(jnp.where(ok[:, None], P_new, table.P[slots]))
    X = table.X.at[slots].set(jnp.where(ok[:, None], X_new, table.X[slots]))
    valid = table.valid.at[slots].set(jnp.where(ok, True, table.valid[slots]))
    gen = table.gen.at[slots].set(
        jnp.where(ok, table.gen[slots] + 1, table.gen[slots])
    )
    out = TrackTable(P=P, X=X, valid=valid, gen=gen,
                     F=table.F, R_f=table.R_f, t_f=table.t_f, ang=table.ang)
    if table.F is None:
        return out
    nn = P_new.shape[0]
    if F_new is None:
        F_new = P_new
        R_f_new = jnp.eye(3, dtype=jnp.float32)
        t_f_new = jnp.zeros((3,), jnp.float32)
        ang_new = jnp.pi
    else:
        F_new = F_new[order][:n]
        if R_f_new.ndim == 3:
            R_f_new, t_f_new = R_f_new[order][:n], t_f_new[order][:n]
        if jnp.ndim(ang_new) >= 1:
            ang_new = ang_new[order][:n]
    F_b = jnp.broadcast_to(F_new, (nn, 2))
    R_b = jnp.broadcast_to(R_f_new, (nn, 3, 3))
    t_b = jnp.broadcast_to(t_f_new, (nn, 3))
    a_b = jnp.broadcast_to(jnp.asarray(ang_new, jnp.float32), (nn,))
    return out._replace(
        F=table.F.at[slots].set(jnp.where(ok[:, None], F_b, table.F[slots])),
        R_f=table.R_f.at[slots].set(jnp.where(ok[:, None, None], R_b, table.R_f[slots])),
        t_f=table.t_f.at[slots].set(jnp.where(ok[:, None], t_b, table.t_f[slots])),
        ang=table.ang.at[slots].set(jnp.where(ok, a_b, table.ang[slots])),
    )


def insert_into_candidates(
    table: CandidateTable, C_new, R_cur, t_cur, new_valid
) -> CandidateTable:
    """Admit new candidate keypoints: first observation F=C_new, first pose = current
    (reference appends with ``F=c, T=T_cur`` at ``src/vo_pipeline.py:578-591``)."""
    order = jnp.argsort(~new_valid, stable=True)
    C_new, new_valid = C_new[order], new_valid[order]
    n = min(C_new.shape[0], table.capacity)
    C_new, new_valid = C_new[:n], new_valid[:n]
    slots = free_slots(table.valid, n)
    num_free = jnp.sum(~table.valid)
    rank = jnp.arange(n)
    ok = new_valid & (rank < num_free)
    C = table.C.at[slots].set(jnp.where(ok[:, None], C_new, table.C[slots]))
    F = table.F.at[slots].set(jnp.where(ok[:, None], C_new, table.F[slots]))
    R_f = table.R_f.at[slots].set(
        jnp.where(ok[:, None, None], jnp.broadcast_to(R_cur, (n, 3, 3)), table.R_f[slots])
    )
    t_f = table.t_f.at[slots].set(
        jnp.where(ok[:, None], jnp.broadcast_to(t_cur, (n, 3)), table.t_f[slots])
    )
    valid = table.valid.at[slots].set(jnp.where(ok, True, table.valid[slots]))
    age = table.age.at[slots].set(jnp.where(ok, 0, table.age[slots]))
    return CandidateTable(C=C, F=F, R_f=R_f, t_f=t_f, valid=valid, age=age)


def prune_tracks(table: TrackTable, keep: jnp.ndarray) -> TrackTable:
    """Drop tracks where keep=False (index-aligned, replaces the reference's
    ``np.delete`` at ``src/vo_pipeline.py:217-225``)."""
    return table._replace(valid=table.valid & keep)


def prune_candidates(table: CandidateTable, keep: jnp.ndarray) -> CandidateTable:
    return table._replace(valid=table.valid & keep)


def make_vo_state(cfg, image_shape) -> VOState:
    """Fresh (pre-bootstrap) state with empty tables."""
    H, W = image_shape
    levels = cfg.klt.levels
    pyr_dtype = jnp.dtype(cfg.runtime.dtype)
    # level sizes are repeated CEIL halvings (ops.pyramid.downsample2 emits
    # ceil(n/2) rows/cols) — floor (H >> l) would mismatch for odd dimensions
    dims = []
    h, w = H, W
    for _ in range(levels):
        dims.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    pyr = tuple(jnp.zeros(d, pyr_dtype) for d in dims)
    sift_sift = cfg.find_new_candidates_method == "sift-sift"
    D = cfg.descriptor.max_keypoints
    return VOState(
        tracks=make_track_table(cfg.state.max_tracks),
        cands=make_candidate_table(cfg.state.max_candidates),
        R=jnp.eye(3, dtype=jnp.float32),
        t=jnp.zeros((3,), jnp.float32),
        frame_idx=jnp.zeros((), jnp.int32),
        prev_image=jnp.zeros((H, W), jnp.float32),
        prev_pyramid=pyr,
        health=jnp.zeros((), jnp.int32),
        prev_desc=jnp.zeros((D, 128), jnp.float32) if sift_sift else None,
        prev_desc_valid=jnp.zeros((D,), bool) if sift_sift else None,
        prev_R=jnp.eye(3, dtype=jnp.float32),
        prev_t=jnp.zeros((3,), jnp.float32),
    )
