"""Sharded brute-force matcher (SURVEY §2.3 TP row): row-partitioned distance
matrix over the virtual 8-device CPU mesh must agree exactly with the
single-device matcher."""

import numpy as np
import jax.numpy as jnp

from lcvo_tpu.frontend.match import knn_match_ratio, knn_match_ratio_sharded
from lcvo_tpu.parallel.mesh import make_mesh


def test_sharded_matcher_matches_single_device():
    rng = np.random.default_rng(0)
    Nq, Nt, D = 256, 192, 128
    dq = rng.normal(size=(Nq, D)).astype(np.float32)
    dt = rng.normal(size=(Nt, D)).astype(np.float32)
    # plant some true matches so the ratio test passes for a subset
    dt[:64] = dq[:64] + rng.normal(size=(64, D)).astype(np.float32) * 1e-3
    vq = rng.random(Nq) < 0.9
    vt = rng.random(Nt) < 0.9

    idx_ref, ok_ref = knn_match_ratio(jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dt), jnp.asarray(vt))

    mesh = make_mesh(8)
    idx_sh, ok_sh = knn_match_ratio_sharded(
        mesh, jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dt), jnp.asarray(vt)
    )
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_sh))
    # compare matched indices only where the match is accepted
    ok = np.asarray(ok_ref)
    np.testing.assert_array_equal(np.asarray(idx_ref)[ok], np.asarray(idx_sh)[ok])
