"""Brute-force descriptor matching on the MXU.

TPU-native equivalent of ``cv2.BFMatcher.knnMatch(k=2)`` + Lowe's ratio test
(reference ``src/vo_pipeline.py:107-114,443-450`` — SURVEY §2.2 N3). The all-pairs
L2 distance matrix is one matmul (|a|^2 + |b|^2 - 2 a.b) — exactly the shape the
systolic array wants; top-2 and the ratio test are vectorized reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def knn_match_ratio(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    ratio: float = 0.8,
):
    """For each query descriptor, its best match among the targets if it passes the
    ratio test (best < ratio * second-best, on L2 distance).

    Returns (idx (Nq,) int32 — best target index, ok (Nq,) bool).
    """
    # squared L2 distances via one MXU matmul
    qq = jnp.sum(desc_q * desc_q, axis=1, keepdims=True)
    tt = jnp.sum(desc_t * desc_t, axis=1)
    d2 = qq + tt[None, :] - 2.0 * jnp.dot(
        desc_q, desc_t.T, preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(valid_t[None, :], d2, jnp.inf)
    # top-2 smallest via two min-reductions (lax.top_k lowers to a full per-row
    # sort on TPU — 7x slower than these three passes over the distance matrix)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    d_best = jnp.min(d2, axis=1)
    cols = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d_second = jnp.min(jnp.where(cols == idx[:, None], jnp.inf, d2), axis=1)
    ok = (
        valid_q
        & jnp.isfinite(d_best)
        & (d_best < (ratio**2) * d_second)  # ratio on distances -> squared ratio
    )
    return idx, ok


@jax.jit
def mutual_match(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float = 0.8,
):
    """Ratio-test matches that are also mutual nearest neighbors (the descriptor-
    matching analog of OpenCV's crossCheck, which the reference notes as the
    alternative to the ratio test at ``src/vo_pipeline.py:446``)."""
    idx_ab, ok_ab = knn_match_ratio(desc_a, valid_a, desc_b, valid_b, ratio)
    idx_ba, ok_ba = knn_match_ratio(desc_b, valid_b, desc_a, valid_a, ratio)
    back = idx_ba[idx_ab]
    ok = ok_ab & ok_ba[idx_ab] & (back == jnp.arange(desc_a.shape[0]))
    return idx_ab, ok


def knn_match_ratio_sharded(
    mesh,
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    ratio: float = 0.8,
    axis: str = "data",
):
    """Row-sharded brute-force matcher (SURVEY §2.3, TP row): the (Nq, Nt) distance
    matrix is partitioned over the mesh's query axis — each device matmuls its query
    block against the replicated target set and reduces top-2 locally; results
    all-gather back. No cross-device reduction is needed because the target side is
    replicated; this is the tensor-parallel layout for matching a sharded track
    table against a new frame's descriptors.

    Nq must divide the mesh axis size. Returns the same (idx, ok) as
    :func:`knn_match_ratio`.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    assert desc_q.shape[0] % n_dev == 0, (
        f"query count {desc_q.shape[0]} must divide mesh axis {n_dev}"
    )

    def local(dq, vq, dt, vt):
        return knn_match_ratio(dq, vq, dt, vt, ratio)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
    )(desc_q, valid_q, desc_t, valid_t)
