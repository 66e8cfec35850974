import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.core import state as st


def test_insert_and_prune_tracks():
    t = st.make_track_table(8)
    P = jnp.arange(6.0).reshape(3, 2)
    X = jnp.arange(9.0).reshape(3, 3)
    t = st.insert_into_tracks(t, P, X, jnp.array([True, True, False]))
    assert int(t.count()) == 2
    # prune the first inserted
    keep = ~(jnp.arange(8) == int(np.argmax(np.asarray(t.valid))))
    t = st.prune_tracks(t, keep)
    assert int(t.count()) == 1


def test_insert_overflow_drops_excess():
    t = st.make_track_table(4)
    P = jnp.ones((6, 2))
    X = jnp.ones((6, 3))
    t = st.insert_into_tracks(t, P, X, jnp.ones(6, bool))
    assert int(t.count()) == 4  # capacity-bounded, no error


def test_insert_does_not_clobber_occupied():
    t = st.make_track_table(4)
    t = st.insert_into_tracks(t, jnp.full((2, 2), 7.0), jnp.full((2, 3), 7.0), jnp.ones(2, bool))
    occupied = np.asarray(t.valid).copy()
    vals = np.asarray(t.P).copy()
    # second insert overflows: 3 new into 2 free
    t = st.insert_into_tracks(t, jnp.full((3, 2), 9.0), jnp.full((3, 3), 9.0), jnp.ones(3, bool))
    assert int(t.count()) == 4
    # original entries untouched
    assert np.allclose(np.asarray(t.P)[occupied], vals[occupied])


def test_candidate_lifecycle():
    c = st.make_candidate_table(8)
    R = jnp.eye(3)
    t = jnp.asarray([1.0, 2.0, 3.0])
    pts = jnp.asarray([[10.0, 20.0], [30.0, 40.0]])
    c = st.insert_into_candidates(c, pts, R, t, jnp.ones(2, bool))
    assert int(c.count()) == 2
    sel = np.asarray(c.valid)
    assert np.allclose(np.asarray(c.F)[sel], np.asarray(c.C)[sel])
    assert np.allclose(np.asarray(c.t_f)[sel], [1.0, 2.0, 3.0])
    c = st.prune_candidates(c, jnp.zeros(8, bool))
    assert int(c.count()) == 0


def test_state_ops_jittable():
    @jax.jit
    def step(t, P, X, v):
        return st.insert_into_tracks(t, P, X, v)

    t = st.make_track_table(16)
    t = step(t, jnp.ones((4, 2)), jnp.ones((4, 3)), jnp.ones(4, bool))
    assert int(t.count()) == 4
