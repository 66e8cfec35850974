"""Stream-parallel (DP) execution: many independent VO streams, one compiled step.

The reference is strictly sequential over one camera stream (``src/main.py:213``);
its Markovian design precludes intra-trajectory DP (SURVEY §2.3). The TPU-native
scale-out axis is therefore **across streams**: sequence replays, multi-camera rigs,
or benchmark sweeps. Every per-frame kernel is already batched over tracks; here the
whole ``process_frame`` is additionally vmapped over a leading stream dim and sharded
over the device mesh with ``jax.sharding`` — XLA inserts the AllReduce for the
cross-stream metric aggregation (rides ICI within a slice, DCN across).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lcvo_tpu.core import state as st
from lcvo_tpu.pipeline import make_chunk_fn, make_process_frame


def make_batched_state(cfg, image_shape, n_streams: int) -> st.VOState:
    """Empty VO state with a leading stream dimension on every leaf."""
    s0 = st.make_vo_state(cfg, image_shape)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), s0
    )


def make_batched_carry(cfg, image_shape, n_streams: int):
    """Stream-batched scan carry for the CHUNKED path: the VO state, plus a
    batched BA keyframe window when BA is enabled (mirrors
    :meth:`lcvo_tpu.pipeline.VisualOdometry.chunk_carry`)."""
    states = make_batched_state(cfg, image_shape, n_streams)
    if not cfg.ba.enabled:
        return states
    from lcvo_tpu.solve.ba import window as win_mod

    w0 = win_mod.make_window(cfg.ba.window, cfg.state.max_tracks)
    wins = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), w0
    )
    return states, wins


def make_multistream_chunk_step(cfg, K, mesh: Mesh | None = None, axis: str = "data"):
    """Stream-DP over the PRODUCTION chunked-scan path (VERDICT r4 #6).

    The exact program every full-scale replay runs — ``lax.scan`` of
    ``process_frame`` including the BA keyframe ``lax.cond`` when enabled
    (:func:`lcvo_tpu.pipeline.make_chunk_fn`) — vmapped over a leading stream
    dim and sharded over ``axis`` of ``mesh``. Per-stream results are
    bit-identical to the unsharded single-stream scan (asserted by
    ``tests/test_streams.py``): streams are independent, so sharding only
    partitions them.

    Returns ``chunk_step(carry, frames (S,chunk,H,W), keys (S,chunk,2)) ->
    (carry', (R, t, pose_ok, n_inliers))`` with per-stream leading dims.
    """
    cf = make_chunk_fn(cfg, K)
    batched = jax.vmap(cf)
    donate = (0,) if cfg.runtime.donate_state else ()
    if mesh is None:
        return jax.jit(batched, donate_argnums=donate)
    sh = NamedSharding(mesh, P(axis))
    return jax.jit(
        batched,
        in_shardings=(sh, sh, sh),
        out_shardings=(sh, sh),
        donate_argnums=donate,
    )


def make_multistream_step(cfg, K, mesh: Mesh | None = None, axis: str = "data"):
    """Build the jitted multi-stream step.

    Returns ``step(states, images, keys) -> (states, results, agg)`` where every
    argument/result has a leading stream dim sharded over ``axis`` of ``mesh`` (or
    unsharded when ``mesh`` is None), and ``agg`` is a dict of fleet-wide scalar
    metrics whose cross-stream sum XLA lowers to an AllReduce over ICI.

    When ``mesh`` is None and ``cfg.runtime.mesh_shape`` is set, the mesh comes
    from the config (:func:`lcvo_tpu.parallel.mesh.mesh_from_config`) with its
    first axis as the stream axis.
    """
    if mesh is None and tuple(cfg.runtime.mesh_shape):
        from lcvo_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg)
        axis = mesh.axis_names[0]
    pf = make_process_frame(cfg, K)
    batched = jax.vmap(pf)

    def step(states, images, keys):
        states, results = batched(states, images, keys)
        agg = {
            "tracked": jnp.sum(results.n_tracked),
            "inliers": jnp.sum(results.n_inliers),
            "promoted": jnp.sum(results.n_promoted),
            "pose_ok": jnp.sum(results.pose_ok.astype(jnp.int32)),
        }
        return states, results, agg

    donate = (0,) if cfg.runtime.donate_state else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(sh, sh, sh),
        out_shardings=(sh, sh, rep),
        donate_argnums=donate,
    )
