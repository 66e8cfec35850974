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


def test_insert_tracks_carries_anchors():
    """Promotion carries the candidate anchor (first obs + frozen pose + parallax)
    into the track table for anchor re-triangulation (round 5)."""
    t = st.make_track_table(8)
    P = jnp.asarray([[5.0, 6.0], [7.0, 8.0]])
    X = jnp.ones((2, 3))
    F = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    R_f = jnp.stack([jnp.eye(3) * 1.0, jnp.eye(3) * 2.0])
    t_f = jnp.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    ang = jnp.asarray([0.05, 0.10])
    t = st.insert_into_tracks(t, P, X, jnp.ones(2, bool),
                              F_new=F, R_f_new=R_f, t_f_new=t_f, ang_new=ang)
    sel = np.asarray(t.valid)
    assert sel.sum() == 2
    # anchors landed index-aligned with their tracks
    got_F = np.asarray(t.F)[sel]
    got_ang = np.asarray(t.ang)[sel]
    order = np.argsort(got_ang)
    assert np.allclose(sorted(got_ang), [0.05, 0.10])
    assert np.allclose(got_F[order], np.asarray(F))
    assert np.allclose(np.asarray(t.t_f)[sel][order], np.asarray(t_f))


def test_insert_tracks_without_anchors_disables_refine():
    """Anchor-less inserts (tests, BA tables) get ang=pi: refinement can never
    trigger (parallax cannot exceed pi)."""
    t = st.make_track_table(4)
    t = st.insert_into_tracks(t, jnp.ones((2, 2)), jnp.ones((2, 3)), jnp.ones(2, bool))
    sel = np.asarray(t.valid)
    assert np.allclose(np.asarray(t.ang)[sel], np.pi)


def test_anchor_refinement_improves_depth():
    """process_frame's anchor re-triangulation (step 2.5): with a frozen anchor
    pose and growing baseline, a landmark's depth estimate is replaced by the
    wider-baseline triangulation when the parallax grows enough."""
    from lcvo_tpu.core import geometry as geo

    K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    X_true = jnp.asarray([[0.5, -0.2, 10.0], [-1.0, 0.3, 14.0]])
    R_a, t_a = jnp.eye(3), jnp.zeros(3)          # anchor camera
    R_c, t_c = jnp.eye(3), jnp.asarray([-2.0, 0.0, 0.0])  # current: 2 m baseline
    uv_a, _ = geo.project(K, R_a, t_a, X_true)
    uv_c, _ = geo.project(K, R_c, t_c, X_true)
    # simulate the pipeline's refinement math directly
    x_a = geo.normalize_points(uv_a, K)
    x_c = geo.normalize_points(uv_c, K)
    X_ref = geo.triangulate_linear(
        jnp.broadcast_to(R_a, (2, 3, 3)), jnp.broadcast_to(t_a, (2, 3)),
        R_c, t_c, x_a, x_c)
    assert np.allclose(np.asarray(X_ref), np.asarray(X_true), atol=1e-3)
    # parallax at 2 m baseline exceeds a promotion-time (0.2 m) angle by > 1.3x
    ang_promo = geo.bearing_angle(R_a, t_a, jnp.eye(3), jnp.asarray([-0.2, 0, 0]),
                                  uv_a, uv_a, K)  # ~ small
    ang_now = geo.bearing_angle(R_a, t_a, R_c, t_c, uv_a, uv_c, K)
    assert float(ang_now[0]) > 1.3 * max(float(ang_promo[0]), 0.01)


def test_pipeline_track_refine_e2e_improves():
    """End-to-end: track_refine reduces straight-corridor ATE (the seed signal
    measured at round-5 start: 0.214 -> 0.072 m on 50 frames)."""
    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.synthetic import SyntheticSequence
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.pipeline import VisualOdometry

    seq = SyntheticSequence(n_frames=36, width=256, height=128)
    frames = [seq.frame(i) for i in range(36)]
    ates = {}
    for refine in (False, True):
        cfg = load_config(overrides={
            "image_width": 256, "image_height": 128,
            "state": {"max_tracks": 192, "max_candidates": 192, "max_new_per_frame": 48},
            "ransac": {"pnp_hypotheses": 96, "e_hypotheses": 96},
            "triangulation": {"track_refine": refine}})
        vo = VisualOdometry(cfg, seq.K)
        traj = vo.run(iter(frames), 36)
        gt = seq.gt_positions()[cfg.bootstrap.frame_gap:][:len(traj)]
        ates[refine] = ate_rmse(np.stack(traj), gt)
    # refinement must not degrade the straight corridor (and in practice wins)
    assert ates[True] <= ates[False] * 1.2, ates
