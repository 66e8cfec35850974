"""Multi-stream (DP) step: config-driven mesh wiring + sharded execution on the
virtual 8-device CPU mesh (SURVEY §2.3 DP row; runtime.mesh_shape/mesh_axes)."""

import numpy as np
import jax
import jax.numpy as jnp

from lcvo_tpu.config import load_config
from lcvo_tpu.data.synthetic import make_intrinsics
from lcvo_tpu.parallel.streams import make_batched_state, make_multistream_step
import pytest

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"

W, H = 160, 96


def _cfg(**over):
    return load_config(overrides={
        "image_width": W, "image_height": H,
        "state": {"max_tracks": 64, "max_candidates": 96, "max_new_per_frame": 32},
        "ransac": {"pnp_hypotheses": 64, "e_hypotheses": 64},
        "klt": {"levels": 2, "iters": 3},
        **over,
    })


def _seeded_states(cfg, n_streams, rng):
    states = make_batched_state(cfg, (H, W), n_streams)
    P = rng.uniform([16, 16], [W - 16, H - 16], size=(n_streams, 16, 2)).astype(np.float32)
    X = rng.uniform([-2, -1, 4], [2, 1, 12], size=(n_streams, 16, 3)).astype(np.float32)
    return states._replace(tracks=states.tracks._replace(
        P=states.tracks.P.at[:, :16].set(P),
        X=states.tracks.X.at[:, :16].set(X),
        valid=states.tracks.valid.at[:, :16].set(True),
    ))


def test_mesh_from_config_drives_multistream_step():
    """runtime.mesh_shape/mesh_axes must build the mesh when none is passed —
    the config-driven path a production launcher uses."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide the virtual 8-device mesh"
    cfg = _cfg(runtime={"mesh_shape": [8], "mesh_axes": ["data"]})
    step = make_multistream_step(cfg, make_intrinsics(W, H))

    rng = np.random.default_rng(0)
    n_streams = 8
    states = _seeded_states(cfg, n_streams, rng)
    imgs = jnp.asarray(rng.uniform(0, 255, (n_streams, H, W)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), n_streams)
    states, results, agg = step(states, imgs, keys)
    # sharded over all 8 devices; aggregate metrics replicated scalars
    assert len(states.tracks.P.sharding.device_set) == 8
    assert agg["tracked"].shape == ()
    assert int(agg["pose_ok"]) >= 0
    assert results.R.shape == (n_streams, 3, 3)


def test_multistream_unsharded_matches_single_stream():
    """Without a mesh the vmapped step must agree with per-stream process_frame."""
    from lcvo_tpu.pipeline import make_process_frame

    # donation off: the batched input state is re-read for the reference step
    cfg = _cfg(runtime={"donate_state": False})
    K = make_intrinsics(W, H)
    step = make_multistream_step(cfg, K)
    rng = np.random.default_rng(1)
    states = _seeded_states(cfg, 2, rng)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, H, W)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    out_states, results, agg = step(states, imgs, keys)

    pf = jax.jit(make_process_frame(cfg, K))
    s0 = jax.tree_util.tree_map(lambda x: x[0], states)
    _, r0 = pf(s0, imgs[0], keys[0])
    np.testing.assert_allclose(np.asarray(results.t[0]), np.asarray(r0.t), atol=1e-5)
    assert int(agg["tracked"]) == int(np.asarray(results.n_tracked).sum())


def test_multistream_chunked_scan_matches_unsharded():
    """The PRODUCTION chunked path (lax.scan incl. the BA lax.cond) sharded over
    the 8-device mesh must reproduce each stream's unsharded single-stream scan
    bit-for-bit (VERDICT r4 #6): streams are independent, sharding only
    partitions them."""
    from lcvo_tpu.parallel.mesh import make_mesh
    from lcvo_tpu.parallel.streams import make_batched_carry, make_multistream_chunk_step
    from lcvo_tpu.pipeline import make_chunk_fn

    cfg = _cfg(
        runtime={"donate_state": False},
        ba={"enabled": True, "window": 4, "gn_iters": 2, "keyframe_every": 2},
        triangulation={"track_refine": True},
    )
    K = make_intrinsics(W, H)
    mesh = make_mesh(8, axis_names=("data",))
    n_streams, chunk = 8, 3
    rng = np.random.default_rng(2)

    carry = make_batched_carry(cfg, (H, W), n_streams)
    states, wins = carry
    # distinct per-stream seed tracks
    P = rng.uniform([16, 16], [W - 16, H - 16], size=(n_streams, 16, 2)).astype(np.float32)
    X = rng.uniform([-2, -1, 4], [2, 1, 12], size=(n_streams, 16, 3)).astype(np.float32)
    states = states._replace(tracks=states.tracks._replace(
        P=states.tracks.P.at[:, :16].set(P),
        X=states.tracks.X.at[:, :16].set(X),
        valid=states.tracks.valid.at[:, :16].set(True),
    ))
    carry = (states, wins)
    frames = jnp.asarray(rng.uniform(0, 255, (n_streams, chunk, H, W)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), n_streams * chunk).reshape(
        n_streams, chunk, 2)

    step = make_multistream_chunk_step(cfg, K, mesh=mesh, axis="data")
    carry_out, (Rs, ts, oks, ninl) = step(carry, frames, keys)
    assert len(ts.sharding.device_set) == 8

    # unsharded single-stream reference: same chunk_fn per stream
    cf = jax.jit(make_chunk_fn(cfg, K))
    for s in (0, 3, 7):
        c0 = jax.tree_util.tree_map(lambda x: x[s], carry)
        _, (R1, t1, ok1, ni1) = cf(c0, frames[s], keys[s])
        np.testing.assert_array_equal(np.asarray(ts[s]), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(Rs[s]), np.asarray(R1))
        np.testing.assert_array_equal(np.asarray(ninl[s]), np.asarray(ni1))
