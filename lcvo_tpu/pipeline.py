"""The Markovian VO state machine: bootstrap + per-frame processing.

Re-design of the reference's driver loop (``src/main.py:184-307``) and its four
algorithm modules (``VOInitializer``, ``KeypointsToLandmarksAssociator``,
``PoseEstimator``, ``LandmarkTriangulator`` — ``src/vo_pipeline.py:41-750``) as ONE
jitted, fixed-shape XLA program per frame:

    state_{i}, result_i = process_frame(state_{i-1}, I_i, key)

Inside the compiled step: pyramid build → joint KLT over tracks+candidates →
PnP-RANSAC localization → inlier filtering → candidate bearing-angle validation →
batched triangulation + promotion → masked re-detection. The host only decodes frames
and reads back small metrics — the equivalent of the reference's Python↔OpenCV
boundary is a single host↔TPU boundary per frame (SURVEY §3.2).

Failure recovery: the reference re-bootstraps inside ``estimatePose`` when inliers < 4
(``src/vo_pipeline.py:274-324``), reaching down into the dataset layer from an
algorithm class. Here inlier starvation sets a ``health`` counter in the state; the
host driver (:class:`VisualOdometry`) performs re-bootstrap as an explicit state-machine
transition — and unlike the reference (which merges camera-frame landmarks into the
world-frame map, SURVEY §2.1), re-initialized geometry is re-anchored through the last
known world pose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.config import VOConfig
from lcvo_tpu.frontend.match import knn_match_ratio, mutual_match
from lcvo_tpu.frontend.sift import sift as sift_detect
from lcvo_tpu.core import geometry as geo
from lcvo_tpu.core import state as st
from lcvo_tpu.ops import epipolar, harris, pnp
from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.pyramid import build_pyramid


class FrameResult(NamedTuple):
    R: jnp.ndarray          # (3,3) world→camera
    t: jnp.ndarray          # (3,)
    pose_ok: jnp.ndarray    # () bool — PnP had enough inliers
    n_tracked: jnp.ndarray  # () int — tracks surviving KLT
    n_inliers: jnp.ndarray  # () int — PnP inliers
    n_candidates: jnp.ndarray
    n_promoted: jnp.ndarray
    reproj_rms: jnp.ndarray  # () float — RMS reprojection error of inliers (px)


def _normalize(uv, K):
    return geo.normalize_points(uv, K)


def make_process_frame(cfg: VOConfig, K: np.ndarray):
    """Build the jitted per-frame step for a fixed config + intrinsics."""
    Kj = jnp.asarray(K, jnp.float32)
    fx = float(K[0][0] if isinstance(K, (list, tuple)) else K[0, 0])
    kltc = cfg.klt
    n_tracks = cfg.state.max_tracks
    alpha_rad = float(np.deg2rad(cfg.triangulation.alpha_deg))
    pnp_thresh_n = cfg.ransac.pnp_thresh_px / fx
    max_cand_age = cfg.triangulation.max_candidate_age
    pyr_dtype = jnp.dtype(cfg.runtime.dtype)

    def process_frame(state: st.VOState, image: jnp.ndarray, key) -> tuple[st.VOState, FrameResult]:
        # frames may arrive uint8 (H2D-lean ingest, datasets._imread_gray) —
        # the cast to compute dtype happens here, ON DEVICE, after the transfer
        image = image.astype(jnp.float32)
        pyr_new = build_pyramid(image.astype(pyr_dtype), kltc.levels)

        # ------ 1. joint KLT over landmark tracks P and candidate tracks C ------
        # (reference HOT LOOPs 1/1b: src/vo_pipeline.py:215,501 — one batched call)
        #
        # Constant-velocity warm start: extrapolate the last relative motion
        # T_rel = T_{t-1} ∘ T_{t-2}^{-1} one frame forward and predict each
        # point's position in the new frame — landmark tracks by reprojecting
        # their known 3D point under the predicted pose, candidates (depth
        # unknown) by the rotation-only homography K R_rel K^-1. The LK
        # correction then only covers prediction error, which keeps sustained
        # turns (50+ px/frame edge flow at 2°/frame, KITTI res) inside a small
        # per-level wander margin (klt.track_margin) — the analog of OpenCV's
        # OPTFLOW_USE_INITIAL_FLOW, which the reference leaves unused.
        R_rel = state.R @ state.prev_R.T
        t_rel = state.t - R_rel @ state.prev_t
        R_pred = R_rel @ state.R
        t_pred = R_rel @ state.t + t_rel
        uv_trk, z_trk = geo.project(Kj, R_pred, t_pred, state.tracks.X)
        d_trk = jnp.where((z_trk > 0.1)[:, None], uv_trk - state.tracks.P, 0.0)
        xh = jnp.concatenate(
            [_normalize(state.cands.C, Kj), jnp.ones((state.cands.C.shape[0], 1))], axis=-1
        )
        xr = xh @ R_rel.T
        zr = jnp.where(jnp.abs(xr[:, 2]) > 1e-6, xr[:, 2], 1e-6)
        uv_cnd = jnp.stack(
            [Kj[0, 0] * xr[:, 0] / zr + Kj[0, 2], Kj[1, 1] * xr[:, 1] / zr + Kj[1, 2]],
            axis=-1,
        )
        d_cnd = jnp.where((xr[:, 2] > 0.1)[:, None], uv_cnd - state.cands.C, 0.0)
        init_d = jnp.concatenate([d_trk, d_cnd], axis=0)
        init_d = jnp.clip(jnp.nan_to_num(init_d), -kltc.max_displacement, kltc.max_displacement)

        pts = jnp.concatenate([state.tracks.P, state.cands.C], axis=0)
        # the warm start absorbs bulk flow, so the in-pipeline tracker can run
        # on fewer (finer) levels / fewer coarse iterations than the zero-start
        # bootstrap hops (klt.track_levels / klt.iters_coarse); the coarsest
        # level gets a wider wander margin so a transiently-wrong velocity
        # prior (turn entry/exit) stays within correction reach
        n_lvl = kltc.track_levels or kltc.levels
        mc = kltc.track_margin_coarse or kltc.track_margin
        margins = tuple(
            mc if l == n_lvl - 1 and n_lvl > 1 else kltc.track_margin
            for l in range(n_lvl)
        )
        new_pts, klt_ok, _ = pyramidal_klt(
            state.prev_pyramid[:n_lvl],
            pyr_new[:n_lvl],
            pts,
            window=kltc.window,
            iters=kltc.iters,
            max_residual=kltc.max_residual,
            max_displacement=kltc.max_displacement,
            border=kltc.border,
            eps=kltc.eps,
            iter_dtype=kltc.iter_dtype,
            margin=margins,
            init_d=init_d,
            iters_coarse=kltc.iters_coarse,
        )
        P_new, C_new = new_pts[:n_tracks], new_pts[n_tracks:]
        tracks = state.tracks._replace(
            P=P_new,
            valid=state.tracks.valid & klt_ok[:n_tracks],
        )
        cands = state.cands._replace(
            C=C_new,
            valid=state.cands.valid & klt_ok[n_tracks:],
            age=state.cands.age + 1,
        )
        n_tracked = tracks.count()

        # ------ 2. PnP-RANSAC localization (reference src/vo_pipeline.py:245-272) ------
        k_pnp, k_det = jax.random.split(key)
        x_obs = _normalize(tracks.P, Kj)
        R, t, inl, n_inl = pnp.pnp_ransac(
            k_pnp,
            tracks.X,
            x_obs,
            tracks.valid,
            thresh=pnp_thresh_n,
            n_hyp=cfg.ransac.pnp_hypotheses,
            refine_iters=cfg.ransac.refine_iters,
        )
        pose_ok = n_inl >= cfg.ransac.min_pnp_inliers
        R = jnp.where(pose_ok, R, state.R)
        t = jnp.where(pose_ok, t, state.t)
        # filter state to PnP inliers (reference :327-331); on failure keep tracks
        tracks = st.prune_tracks(tracks, jnp.where(pose_ok, inl, tracks.valid))
        # reprojection RMS of inliers, in px
        err_n = pnp.reproj_sq_error(R, t, tracks.X, x_obs)
        err_n = jnp.where(tracks.valid & jnp.isfinite(err_n), err_n, 0.0)
        rms = jnp.sqrt(jnp.sum(err_n) / jnp.maximum(tracks.count(), 1)) * fx

        # ------ 2.5 continuous anchor re-triangulation of young landmarks ------
        # Each track carries its first observation (pixel + frozen promotion-time
        # pose). Whenever the parallax to that anchor has grown by
        # refine_min_improve since the last triangulation, re-triangulate the
        # landmark against the anchor at the LARGER baseline: depth noise is
        # inverse to parallax, so a landmark promoted at the α-gate's floor
        # (its noisiest possible estimate, with a systematic near-bias that
        # seeds the turn scale-decay spiral — BASELINE.md round 4) keeps
        # improving as the camera moves, with scale anchored by the frozen
        # promotion-time pose. The growth trigger staggers refinement across
        # frames, so map error never correlates with one frame's pose noise.
        tri = cfg.triangulation
        if tri.track_refine:
            ang_now = geo.bearing_angle(
                tracks.R_f, tracks.t_f, R, t, tracks.F, tracks.P, Kj
            )
            x_a = _normalize(tracks.F, Kj)
            x_p = _normalize(tracks.P, Kj)
            X_ref = geo.triangulate_linear(tracks.R_f, tracks.t_f, R, t, x_a, x_p)
            z_ref = geo.se3_apply(R, t, X_ref)[:, 2]
            z_anc = geo.se3_apply(tracks.R_f, tracks.t_f, X_ref)[:, 2]
            uv_ref, _ = geo.project(Kj, R, t, X_ref)
            uv_anc, _ = geo.project(Kj, tracks.R_f, tracks.t_f, X_ref)
            re_ref = jnp.sum((uv_ref - tracks.P) ** 2, axis=-1)
            re_anc = jnp.sum((uv_anc - tracks.F) ** 2, axis=-1)
            ref_ok = (
                tracks.valid
                & (ang_now > tracks.ang * tri.refine_min_improve)
                & (z_ref > tri.min_depth)
                & (z_ref < tri.max_depth)
                & (z_anc > tri.min_depth)
                & (re_ref < tri.max_reproj_px**2)
                & (re_anc < tri.max_reproj_px**2)
            )
            tracks = tracks._replace(
                X=jnp.where(ref_ok[:, None], X_ref, tracks.X),
                ang=jnp.where(ref_ok, ang_now, tracks.ang),
            )

        # ------ 3. candidate validation + batched triangulation + promotion ------
        # (reference src/vo_pipeline.py:607-673, per-candidate Python loops → batched)
        ang = geo.bearing_angle(cands.R_f, cands.t_f, R, t, cands.F, cands.C, Kj)
        x_f = _normalize(cands.F, Kj)
        x_c = _normalize(cands.C, Kj)
        X_tri = geo.triangulate_linear(cands.R_f, cands.t_f, R, t, x_f, x_c)
        Xc_cur = geo.se3_apply(R, t, X_tri)
        z_cur = Xc_cur[:, 2]
        # first-view depth must also be positive
        z_first = geo.se3_apply(cands.R_f, cands.t_f, X_tri)[:, 2]
        # reprojection gates in both views (px)
        uv_c, _ = geo.project(Kj, R, t, X_tri)
        re_c = jnp.sum((uv_c - cands.C) ** 2, axis=-1)
        geom_ok = (
            (z_cur > tri.min_depth)
            & (z_cur < tri.max_depth)
            & (z_first > tri.min_depth)
            & (re_c < tri.max_reproj_px**2)
        )
        if tri.max_depth_baseline_ratio > 0:
            # depth/baseline gate: low-parallax triangulations carry inverse-
            # depth-biased noise; promoting them during rotation-heavy map
            # turnover leaks metric scale (see TriangulationConfig)
            c_first = geo.camera_center(cands.R_f, cands.t_f)
            c_cur = geo.camera_center(R, t)
            baseline = jnp.linalg.norm(c_first - c_cur[None, :], axis=-1)
            geom_ok = geom_ok & (z_cur < tri.max_depth_baseline_ratio * baseline)
        promote = cands.valid & (ang > alpha_rad) & geom_ok
        # promoted tracks carry their candidate anchor (first obs + frozen pose
        # + promotion-time parallax) into the table for anchor re-triangulation
        tracks = st.insert_into_tracks(
            tracks, cands.C, X_tri, promote,
            F_new=cands.F, R_f_new=cands.R_f, t_f_new=cands.t_f, ang_new=ang,
        )
        n_promoted = jnp.sum(promote)
        # remove promoted and stale candidates
        cands = st.prune_candidates(cands, ~promote & (cands.age < max_cand_age))

        # ------ 4. re-detection of new candidates (reference :564-591) ------
        # the three reference modes (``find_new_candidates_{shi|sift_mask|sift_sift}``,
        # src/vo_pipeline.py:357-467), selected statically by config
        det = cfg.detector
        mode = cfg.find_new_candidates_method
        new_desc = new_desc_valid = None
        if mode in ("shi-mask", "harris-mask"):
            pts_det, _, det_ok = harris.detect_corners(
                image,
                max_corners=min(det.max_corners, cfg.state.max_new_per_frame),
                quality_level=det.quality_level,
                cells_y=det.grid_cells_y,
                cells_x=det.grid_cells_x,
                cells_topk=det.cells_topk,
                method=mode.split("-")[0],
                window=det.window,
                border=kltc.border,
                harris_k=det.harris_k,
            )
        elif mode in ("sift-mask", "sift-sift"):
            feats = sift_detect(
                image,
                max_keypoints=cfg.descriptor.max_keypoints,
                octaves=det.sift_octaves,
                scales_per_octave=det.sift_scales_per_octave,
                contrast_thresh=det.sift_contrast_thresh,
                edge_thresh=det.sift_edge_thresh,
                border=kltc.border,
                compute_desc=(mode == "sift-sift"),
                desc_method=cfg.descriptor.method,
                patch_size=cfg.descriptor.patch_size,
            )
            pts_det, det_ok = feats.pts, feats.valid
            if mode == "sift-sift":
                # keypoints whose descriptor matches the previous frame are old
                # content — only unmatched ones become candidates (the intended
                # semantics of reference :443-456; see SURVEY §2.1 stale-descriptor
                # quirk)
                _, matched = knn_match_ratio(
                    feats.desc,
                    feats.valid,
                    state.prev_desc,
                    state.prev_desc_valid,
                    ratio=cfg.descriptor.ratio_thresh,
                )
                det_ok = det_ok & ~matched
                new_desc, new_desc_valid = feats.desc, feats.valid
        else:
            raise ValueError(f"unknown find_new_candidates_method: {mode!r}")
        det_ok = harris.suppress_near_existing(
            pts_det, det_ok, tracks.P, tracks.valid, det.min_distance
        )
        det_ok = harris.suppress_near_existing(
            pts_det, det_ok, cands.C, cands.valid, det.min_distance
        )
        cands = st.insert_into_candidates(cands, pts_det, R, t, det_ok)

        health = jnp.where(pose_ok, 0, state.health + 1)
        new_state = st.VOState(
            tracks=tracks,
            cands=cands,
            R=R,
            t=t,
            frame_idx=state.frame_idx + 1,
            prev_image=image,
            prev_pyramid=pyr_new,
            health=health,
            prev_desc=new_desc,
            prev_desc_valid=new_desc_valid,
            # this frame's predecessor pose — next frame's velocity model
            prev_R=state.R,
            prev_t=state.t,
        )
        result = FrameResult(
            R=R,
            t=t,
            pose_ok=pose_ok,
            n_tracked=n_tracked,
            n_inliers=n_inl,
            n_candidates=cands.count(),
            n_promoted=n_promoted,
            reproj_rms=rms,
        )
        return new_state, result

    return process_frame


# ---------------------------------------------------------------------------
# Two-view bootstrap
# ---------------------------------------------------------------------------


def make_bootstrap_fns(cfg: VOConfig, K: np.ndarray):
    """Jitted pieces of the sequential-KLT two-view bootstrap.

    The reference bootstraps by SIFT-matching frames [0, gap] directly
    (``src/vo_pipeline.py:69-177``). Tracking through the intermediate frames with the
    same KLT kernel is more robust for video (no descriptor ambiguity) and reuses the
    hot kernel; a SIFT-matching bootstrap is also available via the frontend once
    descriptors are enabled.
    """
    Kj = jnp.asarray(K, jnp.float32)
    fx = float(K[0, 0])
    kltc = cfg.klt

    @jax.jit
    def detect0(image):
        det = cfg.detector
        pts, score, ok = harris.detect_corners(
            image,
            max_corners=min(det.max_corners, cfg.state.max_tracks),
            quality_level=det.quality_level,
            cells_y=det.grid_cells_y,
            cells_x=det.grid_cells_x,
            cells_topk=max(det.cells_topk, 8),
            method=det.method if det.method in ("shi", "harris") else "shi",
            window=det.window,
            border=kltc.border,
            harris_k=det.harris_k,
        )
        return pts, ok

    @jax.jit
    def track_pair(pyr0, pyr1, pts, valid):
        new_pts, ok, _ = pyramidal_klt(
            pyr0,
            pyr1,
            pts,
            window=kltc.window,
            iters=kltc.iters,
            max_residual=kltc.max_residual,
            max_displacement=kltc.max_displacement,
            border=kltc.border,
            eps=kltc.eps,
            iter_dtype=kltc.iter_dtype,
            # bootstrap hops have no motion prior: full (zero-start) margin
            margin=kltc.margin,
        )
        return new_pts, valid & ok

    @partial(jax.jit, static_argnames=())
    def two_view_init(key, pts0, pts1, valid):
        """E-RANSAC + cheirality + triangulation between bootstrap endpoints.

        Returns (R, t (unit baseline), X (N,3) world points, ok mask).
        Reference: ``getPoseEstimate`` + ``get_2D_3D_landmarks_association``
        (``src/vo_pipeline.py:139-177``).
        """
        x0 = _normalize(pts0, Kj)
        x1 = _normalize(pts1, Kj)
        E, inl, n_inl = epipolar.essential_ransac(
            key,
            x0,
            x1,
            valid,
            thresh=cfg.ransac.e_thresh_px / fx,
            n_hyp=cfg.ransac.e_hypotheses,
            solver=cfg.ransac.e_solver,
        )
        R, t, _ = epipolar.recover_pose(E, x0, x1, inl)
        X = geo.triangulate_linear(jnp.eye(3), jnp.zeros(3), R, t, x0, x1)
        z0 = X[:, 2]
        z1 = geo.se3_apply(R, t, X)[:, 2]
        uv1_hat, _ = geo.project(Kj, R, t, X)
        re1 = jnp.sum((uv1_hat - pts1) ** 2, axis=-1)
        ok = (
            inl
            & (z0 > cfg.triangulation.min_depth * 0.25)
            & (z1 > cfg.triangulation.min_depth * 0.25)
            & (re1 < cfg.ransac.e_thresh_px**2 * 16.0)
        )
        return R, t, X, ok, n_inl

    return detect0, track_pair, two_view_init


# ---------------------------------------------------------------------------
# Chunked (scan) step — the production streaming path
# ---------------------------------------------------------------------------


def make_chunk_fn(cfg: VOConfig, K: np.ndarray):
    """UNJITTED chunked-scan step for one VO stream: ``lax.scan`` of
    ``process_frame`` over a chunk of frames, including the keyframe push +
    Schur-complement window refine under ``lax.cond`` when BA is enabled.

    This is the code path every full-scale replay runs. Module-level (rather
    than a driver method) so the stream-DP layer can ``vmap`` + shard the SAME
    program over a device mesh (VERDICT r4 #6 — the multichip dry-run must
    exercise the production chunked path, not just the per-frame step).

    Signature: ``chunk_fn(carry, frames (chunk,H,W), keys (chunk,2)) ->
    (carry', (R, t, pose_ok, n_inliers))`` with ``carry = state`` (no BA) or
    ``(state, window)`` (BA).
    """
    Kj = jnp.asarray(K, jnp.float32)
    fn = make_process_frame(cfg, Kj)

    if not cfg.ba.enabled:
        def chunk_fn(state, frames, keys):
            def body(s, xk):
                img, k = xk
                s2, res = fn(s, img, k)
                return s2, (res.R, res.t, res.pose_ok, res.n_inliers)

            return jax.lax.scan(body, state, (frames, keys))

        return chunk_fn

    # BA-enabled streaming: the keyframe push + Schur-complement window refine
    # run INSIDE the scanned step under lax.cond — the whole pipeline including
    # BA is one compiled XLA program (BASELINE config 3 in throughput mode).
    # Cadence and pre-refine pose recording match the per-frame path (step()).
    from lcvo_tpu.solve.ba import window as win_mod

    ba = cfg.ba
    fx = float(K[0][0] if isinstance(K, (list, tuple)) else K[0, 0])
    huber_n = ba.huber_px / fx
    n_fix = min(2, ba.window - 1)

    def chunk_fn_ba(carry, frames, keys):
        def body(c, xk):
            s, w = c
            img, k = xk
            s2, res = fn(s, img, k)

            def do_ba(sw):
                s2, w = sw
                w2 = win_mod.push(w, s2.tracks, s2.R, s2.t)
                w2, tracks, R, t, _ = win_mod.refine_window(
                    w2, s2.tracks, Kj, iters=ba.gn_iters, n_fix=n_fix,
                    huber=huber_n, lam0=ba.damping,
                    landmarks_only=ba.landmarks_only, gauge=ba.gauge,
                )
                return s2._replace(tracks=tracks, R=R, t=t), w2

            is_kf = (s2.frame_idx % ba.keyframe_every) == 0
            c2 = jax.lax.cond(is_kf, do_ba, lambda sw: sw, (s2, w))
            return c2, (res.R, res.t, res.pose_ok, res.n_inliers)

        return jax.lax.scan(body, carry, (frames, keys))

    return chunk_fn_ba


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


class VisualOdometry:
    """Host-side driver: owns the compiled step, the bootstrap state machine, and
    failure recovery. The per-frame compute path is entirely on device."""

    def __init__(self, cfg: VOConfig, K: np.ndarray):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        donate = (0,) if cfg.runtime.donate_state else ()
        self._process = jax.jit(make_process_frame(cfg, jnp.asarray(K, jnp.float32)), donate_argnums=donate)
        self._detect0, self._track_pair, self._two_view = make_bootstrap_fns(cfg, self.K)
        self.state: st.VOState | None = None
        self._key = jax.random.PRNGKey(cfg.seed)
        self.trajectory: list[np.ndarray] = []  # camera centers (world)
        self.poses: list[np.ndarray] = []       # (4,4) cam→world, one per trajectory entry
        self.pose_ok_flags: list[bool] = []     # per-entry health (False: held/weak pose)
        self.results: list = []
        self.n_rebootstraps = 0                 # failure-recovery events (both driver modes)
        # sliding-window BA (BASELINE config 3; reference future work, report §3.2)
        self.window = None
        if cfg.ba.enabled:
            from lcvo_tpu.solve.ba import window as win_mod

            self._win_mod = win_mod
            self.window = win_mod.make_window(cfg.ba.window, cfg.state.max_tracks)
            self._ba_push = jax.jit(win_mod.push)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- bootstrap ---------------------------------------------------------
    def bootstrap(self, frames: list[np.ndarray], R0: np.ndarray | None = None,
                  t0: np.ndarray | None = None, scale: float | None = None):
        """Initialize from a short frame burst (length = bootstrap gap + 1).

        Optional (R0, t0) anchors the first bootstrap camera at a known world pose —
        used by re-bootstrap to keep the map in one frame (fixes the reference's
        camera-frame/world-frame merge, SURVEY §2.1).

        Optional ``scale`` sets the metric length of the two-view baseline
        (``recover_pose`` returns ||t|| = 1): re-bootstrap passes the expected
        baseline from the pre-failure velocity so the re-triangulated map keeps
        the trajectory's metric scale — the scale seam the reference never
        closed (its fallback merges an arbitrarily-scaled map,
        ``src/vo_pipeline.py:314-324``). ``None`` keeps the unit baseline (the
        initial bootstrap, where monocular scale is free).
        """
        cfg = self.cfg
        imgs = [jnp.asarray(f, jnp.float32) for f in frames]
        pyr_dtype = jnp.dtype(cfg.runtime.dtype)
        pyrs = [build_pyramid(im.astype(pyr_dtype), cfg.klt.levels) for im in imgs]
        det = cfg.detector

        def feats_of(im):
            return sift_detect(
                im,
                max_keypoints=cfg.descriptor.max_keypoints,
                octaves=det.sift_octaves,
                scales_per_octave=det.sift_scales_per_octave,
                contrast_thresh=det.sift_contrast_thresh,
                edge_thresh=det.sift_edge_thresh,
                border=cfg.klt.border,
                desc_method=cfg.descriptor.method,
                patch_size=cfg.descriptor.patch_size,
            )

        f1 = None
        if cfg.bootstrap.init_method == "sift":
            # reference init: SIFT detect+describe both endpoint frames, BF knn
            # match with Lowe ratio (``src/vo_pipeline.py:69-121``)
            f0 = feats_of(imgs[0])
            f1 = feats_of(imgs[-1])
            idx, ok = mutual_match(
                f0.desc, f0.valid, f1.desc, f1.valid, ratio=cfg.descriptor.ratio_thresh
            )
            pts0 = f0.pts
            pts = f1.pts[idx]
        else:
            pts0, ok = self._detect0(imgs[0])
            pts = pts0
            for i in range(len(imgs) - 1):
                pts, ok = self._track_pair(pyrs[i], pyrs[i + 1], pts, ok)
        R, t, X, good, n_inl = self._two_view(self._next_key(), pts0, pts, ok)
        if scale is not None and np.isfinite(scale) and scale > 1e-6:
            # uniform scaling of the two-view geometry preserves all image
            # observations: baseline ||t|| = scale, landmarks scale with it
            s = jnp.float32(scale)
            t = t * s
            X = X * s

        # anchor into world frame: cam0 pose = (R0, t0) (identity on first bootstrap)
        if R0 is None:
            R0 = np.eye(3)
            t0 = np.zeros(3)
        R0j = jnp.asarray(R0, jnp.float32)
        t0j = jnp.asarray(t0, jnp.float32)
        # world→cam_last = (R, t) ∘ (R0, t0)
        R_last, t_last = geo.se3_compose(R, t, R0j, t0j)
        # landmarks were triangulated in cam0 frame → world: X_w = R0^T (X - t0·0) ... cam0 frame → world
        Ri, ti = geo.se3_inverse(R0j, t0j)
        X_w = geo.se3_apply(Ri, ti, X)

        state = st.make_vo_state(cfg, imgs[0].shape)
        if self.window is not None:
            # stale keyframes must not constrain the re-initialized map
            self.window = self._win_mod.make_window(cfg.ba.window, cfg.state.max_tracks)
        # bootstrap landmarks anchor at the FIRST bootstrap frame (world pose
        # (R0, t0)) with their two-view parallax — anchor re-triangulation then
        # continues improving them as the trajectory extends the baseline
        boot_ang = geo.bearing_angle(
            R0j, t0j, R_last, t_last, pts0, pts, jnp.asarray(self.K, jnp.float32)
        )
        tracks = st.insert_into_tracks(
            state.tracks, pts, X_w, good,
            F_new=pts0, R_f_new=R0j, t_f_new=t0j, ang_new=boot_ang,
        )
        # seed the constant-velocity model with the bootstrap window's mean
        # per-frame translation (rotation step ≈ identity over one frame): the
        # first post-bootstrap KLT warm start then predicts real forward flow
        # instead of zero
        c_last = np.asarray(geo.camera_center(R_last, t_last))
        c0 = np.asarray(geo.camera_center(R0j, t0j))
        c_prev = c_last - (c_last - c0) / max(len(imgs) - 1, 1)
        # distinct buffer: prev_R must not alias R_last (the state is donated)
        prev_R = jnp.array(R_last, copy=True)
        prev_t = -(R_last @ jnp.asarray(c_prev, jnp.float32))
        state = state._replace(
            tracks=tracks,
            R=R_last,
            t=t_last,
            prev_R=prev_R,
            prev_t=prev_t,
            prev_image=imgs[-1],
            prev_pyramid=pyrs[-1],
        )
        if state.prev_desc is not None:
            # sift-sift mode: seed the previous-frame descriptor table with the last
            # bootstrap frame so the first post-bootstrap frame filters already-seen
            # keypoints instead of flooding the candidate set (the reference seeds
            # ``old_des = SIFT(img1)`` at bootstrap, ``src/main.py:190-191``)
            if f1 is None:
                f1 = feats_of(imgs[-1])
            state = state._replace(prev_desc=f1.desc, prev_desc_valid=f1.valid)
        self.state = state
        n = int(n_inl)
        if n < cfg.bootstrap.min_matches:
            import warnings

            warnings.warn(
                f"weak bootstrap: {n} essential-matrix inliers < "
                f"bootstrap.min_matches={cfg.bootstrap.min_matches}",
                stacklevel=2,
            )
        return n

    # -- per-frame ---------------------------------------------------------
    def step(self, image: np.ndarray) -> FrameResult:
        assert self.state is not None, "call bootstrap() first"
        # transfer in the frame's own dtype (uint8 stays uint8 — 4x fewer tunnel
        # bytes); process_frame casts to f32 on device
        self.state, res = self._process(self.state, jnp.asarray(image), self._next_key())
        if self.window is not None and int(self.state.frame_idx) % self.cfg.ba.keyframe_every == 0:
            self._ba_step()
        return res

    def _ba_step(self):
        """Push the current frame as a keyframe and refine the window.

        The refined newest-keyframe pose re-anchors the live pose; refined
        landmarks flow back into the track table (masked to participants).
        """
        cfg = self.cfg
        st_ = self.state
        win = self._ba_push(self.window, st_.tracks, st_.R, st_.t)
        win, tracks, R, t, _res = self._win_mod.refine_window(
            win,
            st_.tracks,
            jnp.asarray(self.K, jnp.float32),
            iters=cfg.ba.gn_iters,
            n_fix=min(2, cfg.ba.window - 1),
            huber=cfg.ba.huber_px / float(self.K[0, 0]),
            lam0=cfg.ba.damping,
            landmarks_only=cfg.ba.landmarks_only,
            gauge=cfg.ba.gauge,
        )
        self.window = win
        self.state = st_._replace(tracks=tracks, R=R, t=t)

    def record(self, res: FrameResult):
        self._append_pose(np.asarray(res.R), np.asarray(res.t), ok=bool(res.pose_ok))
        self.results.append(res)

    def _emit(self, res: FrameResult, on_frame):
        """Record a pose AND its metrics row. EVERY trajectory entry gets a metrics
        row — including held anchor poses during recovery bursts, which carry
        pose_ok=False — so summary rates can't read healthy through a recovery
        (the reference's per-frame prints never skip a frame, ``src/main.py:214``)."""
        self.record(res)
        if on_frame is not None:
            on_frame(len(self.trajectory) - 1, res)

    def _append_pose(self, R: np.ndarray, t: np.ndarray, ok: bool = True):
        """Append one world→camera pose to the trajectory as both a camera center
        (``trajectory``) and a full 4x4 cam→world matrix (``poses``, for the
        standard rotational RPE metrics). ``ok=False`` marks held/weak poses so
        scale estimation can skip them."""
        T = np.eye(4)
        T[:3, :3] = R.T
        T[:3, 3] = -R.T @ t
        self.trajectory.append(T[:3, 3].copy())
        self.poses.append(T)
        self.pose_ok_flags.append(bool(ok))

    def _recent_step_scale(self, k: int = 16) -> float | None:
        """Median per-frame translation over the last ``k`` healthy steps — the
        pre-failure velocity used to propagate metric scale through re-bootstrap.
        Only steps between two pose_ok frames count: held/frozen poses (zero
        displacement) and weak/garbage recovery poses are excluded. Returns None
        when too little healthy motion is recorded."""
        if len(self.trajectory) < 3:
            return None
        pts = np.asarray(self.trajectory[-(k + 1):])
        flags = np.asarray(self.pose_ok_flags[-(k + 1):], bool)
        d = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        good = flags[:-1] & flags[1:] & (d > 1e-9)
        if int(np.sum(good)) < 2:
            return None
        return float(np.median(d[good]))

    def _chunk_emit(self, on_chunk, Rs, ts, oks, ninl=None):
        """Append driver-synthesized poses in chunked mode WITH their metrics rows
        (bootstrap-end pose, held anchor poses during a recovery burst). Chunked
        summaries therefore count every trajectory entry — a replay with N
        recoveries can no longer print the same pose_ok_rate as one with zero
        (the reference's per-frame prints never skip a frame, ``src/main.py:214``).

        ``ninl=None`` emits the -1 sentinel ("not measured" — held anchor poses
        have no PnP solve) so analysis can't mistake synthesized rows for real
        zero-inlier frames (ADVICE r4); callers with a real count pass it."""
        if on_chunk is not None:
            on_chunk(len(self.trajectory), np.asarray(Rs), np.asarray(ts),
                     np.asarray(oks, bool),
                     np.full(len(oks), -1, np.int32) if ninl is None else np.asarray(ninl))
        for R, t, ok in zip(Rs, ts, oks):
            self._append_pose(np.asarray(R), np.asarray(t), ok=bool(ok))

    # -- chunked throughput mode -------------------------------------------
    def make_chunk_step(self, chunk: int):
        """Jitted scan of ``process_frame`` over a chunk of frames.

        The streaming/throughput path: one device dispatch per ``chunk`` frames
        (the Markovian loop compiles once and streams — SURVEY §7 design stance).
        Returns ``chunk_fn(state, frames (chunk,H,W), keys (chunk,2)) ->
        (state', (R (chunk,3,3), t (chunk,3), pose_ok, n_inliers))``; with BA
        enabled the carry is ``(state, window)`` (see :meth:`chunk_carry`).
        """
        return jax.jit(make_chunk_fn(self.cfg, self.K))

    def chunk_carry(self):
        """Scan carry for :meth:`make_chunk_step`: the VO state, plus the BA window
        when BA is enabled."""
        return self.state if self.window is None else (self.state, self.window)

    def set_chunk_carry(self, carry):
        if self.window is None:
            self.state = carry
        else:
            self.state, self.window = carry

    def run_chunked(self, frames, chunk: int = 16, n_frames: int | None = None,
                    checkpoint_every: int = 0, checkpoint_path: str | None = None,
                    on_chunk=None):
        """Replay a whole sequence in device-resident chunks (bootstrap first).

        ``frames``: a (T, H, W) array, OR any iterable of (H, W) frames — e.g. a
        :class:`~lcvo_tpu.data.datasets.Prefetcher`. The streaming path holds at
        most ``chunk`` decoded frames on the host at once, so full-length KITTI
        replays (2,760 frames ≈ 5 GB staged) run in O(chunk) host memory — the
        reference also streams one ``cv2.imread`` per frame
        (``src/main.py:216-226``). Poses are appended with the same convention as
        :meth:`run` — one pose per frame from frame ``gap`` onward (the
        bootstrap-end pose first), kept exact across failure recovery — so
        ground-truth alignment is ``gt[gap : gap + len(traj)]`` in both driver
        modes. Tail frames that don't fill a chunk run through the per-frame path.

        ``checkpoint_every=N`` saves a resumable checkpoint at the first chunk
        boundary past every N processed frames; resume via :meth:`resume` +
        :meth:`run_chunked_continue`. ``on_chunk(start, Rs, ts, ok, ninl)``
        receives each chunk's per-frame outputs (trajectory-indexed) for metrics.
        """
        cfg = self.cfg
        gap = cfg.bootstrap.frame_gap
        if n_frames is None and hasattr(frames, "__len__"):
            n_frames = len(frames)
        it = iter(frames)
        boot = [f for _, f in zip(range(gap + 1), it)]
        if len(boot) < gap + 1:
            raise ValueError(
                f"stream ended after {len(boot)} frame(s); the two-view bootstrap "
                f"needs at least bootstrap.frame_gap + 1 = {gap + 1}"
            )
        n_boot_inl = self.bootstrap(boot)
        self._chunk_emit(on_chunk, [np.asarray(self.state.R)], [np.asarray(self.state.t)],
                         [True], ninl=[n_boot_inl])
        return self.run_chunked_continue(
            it, produced=gap + 1, chunk=chunk, n_frames=n_frames,
            checkpoint_every=checkpoint_every, checkpoint_path=checkpoint_path,
            on_chunk=on_chunk,
        )

    def run_chunked_continue(self, frame_iter, produced: int, chunk: int = 16,
                             n_frames: int | None = None, checkpoint_every: int = 0,
                             checkpoint_path: str | None = None, on_chunk=None):
        """Chunked streaming loop from an already-initialized state (used by
        :meth:`run_chunked` after bootstrap, and by the CLI's ``--chunked
        --resume`` path). ``frame_iter`` yields frames ``produced, produced+1, …``.

        Failure recovery in throughput mode: the scanned step carries the same
        health counter as the per-frame path; if a chunk ends with tracking
        collapsed, the already-recorded poses for that chunk are the held
        last-good pose from the scan, and the driver re-bootstraps over the next
        ``rebootstrap_skip + 1`` frames (recording the held anchor pose for
        them) — with the metric scale propagated from the pre-failure velocity —
        before resuming the scan, so a corruption burst costs one chunk of frozen
        poses, not the replay.
        """
        cfg = self.cfg
        skip = max(cfg.bootstrap.rebootstrap_skip, 1)
        it = iter(frame_iter)
        chunk_fn = self.make_chunk_step(chunk)
        last_ckpt = produced

        # frames pulled from the stream but not yet processed (decode-ahead
        # buffer for the dispatch/decode overlap below); ``pulled`` counts every
        # frame taken from the stream, ``produced`` only processed ones
        lookahead: list = []
        pulled = produced

        def pull(k):
            nonlocal pulled
            out = []
            while len(out) < k and (n_frames is None or pulled < n_frames):
                try:
                    out.append(next(it))
                except StopIteration:
                    break
                pulled += 1
            return out

        def take(k):
            out = []
            while len(out) < k and lookahead:
                out.append(lookahead.pop(0))
            if len(out) < k:
                out.extend(pull(k - len(out)))
            return out

        buf = take(chunk)
        staged = None  # (frames, device_batch) pre-transferred for the next chunk
        while len(buf) == chunk:
            keys = jax.random.split(self._next_key(), chunk)
            # use the pre-transferred batch iff these are exactly the staged
            # frames (the recovery path consumes stream frames and invalidates)
            if staged is not None and buf[0] is staged[0][0]:
                batch = staged[1]
            else:
                batch = jnp.asarray(np.stack(buf))  # u8 frames transfer as u8
            staged = None
            carry, (Rs, ts, ok, ninl) = chunk_fn(self.chunk_carry(), batch, keys)
            self.set_chunk_carry(carry)
            # the chunk is now in flight on the device; decode AND pre-transfer
            # the next chunk before forcing results, so host decode and the H2D
            # tunnel transfer both ride under device compute
            if len(lookahead) < chunk:
                lookahead.extend(pull(chunk - len(lookahead)))
            if len(lookahead) >= chunk:
                nxt = lookahead[:chunk]
                staged = (nxt, jnp.asarray(np.stack(nxt)))
            # ONE host round trip for everything the driver reads per chunk
            # (each np.asarray is a separate ~18 ms tunnel round trip otherwise)
            Rs, ts, ok, ninl, health = jax.device_get(
                (Rs, ts, ok, ninl, self.state.health)
            )
            if on_chunk is not None:
                on_chunk(len(self.trajectory), Rs, ts, ok, ninl)
            for j in range(chunk):
                self._append_pose(Rs[j], ts[j], ok=bool(ok[j]))
            produced += chunk
            if int(health) >= 2:
                # tracking collapsed inside the chunk: re-bootstrap anchored at
                # the last pose (held through the failed frames by process_frame),
                # at the pre-failure metric scale (VERDICT r2 #2). The staged
                # device batch no longer matches the stream cursor — drop it
                # (its frames are still at the head of ``lookahead``).
                self.n_rebootstraps += 1
                staged = None
                R0 = np.asarray(self.state.R)
                t0 = np.asarray(self.state.t)
                speed = self._recent_step_scale()
                burst = take(skip + 1)
                if len(burst) == skip + 1:
                    scale = speed * (len(burst) - 1) if speed else None
                    n_rb_inl = self.bootstrap(burst, R0=R0, t0=t0, scale=scale)
                    # held anchor poses for the burst frames (-1 "not measured")
                    # + the fresh bootstrap-end pose with its real inlier count
                    self._chunk_emit(
                        on_chunk,
                        [R0] * skip + [np.asarray(self.state.R)],
                        [t0] * skip + [np.asarray(self.state.t)],
                        [False] * skip + [True],
                        ninl=[-1] * skip + [n_rb_inl],
                    )
                    produced += skip + 1
                else:  # sequence ended inside the burst: hold the anchor
                    if burst:
                        self._chunk_emit(on_chunk, [R0] * len(burst),
                                         [t0] * len(burst), [False] * len(burst))
                    produced += len(burst)
                    buf = []  # the last chunk was already processed — no tail
                    break
            if checkpoint_every and checkpoint_path and produced - last_ckpt >= checkpoint_every:
                self.save(checkpoint_path, produced)
                last_ckpt = produced
            buf = take(chunk)
        for img in buf:  # tail frames that don't fill a chunk: per-frame path
            res = self.step(img)
            self._chunk_emit(on_chunk, [np.asarray(res.R)], [np.asarray(res.t)],
                             [bool(res.pose_ok)], [int(res.n_inliers)])
            produced += 1
        return self.trajectory

    def _pose_result(self, R, t, pose_ok: bool) -> FrameResult:
        """A driver-synthesized FrameResult (bootstrap end pose, or a held pose for
        frames consumed while a re-bootstrap burst buffers)."""
        return FrameResult(
            R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
            pose_ok=jnp.array(pose_ok),
            n_tracked=self.state.tracks.count(),
            n_inliers=jnp.array(0, jnp.int32),
            n_candidates=jnp.array(0, jnp.int32), n_promoted=jnp.array(0, jnp.int32),
            reproj_rms=jnp.array(0.0),
        )

    # -- checkpoint / resume --------------------------------------------------
    def save(self, path: str, produced: int):
        """Checkpoint the full driver state (VO state, BA window, trajectory, RNG
        key, frame counter) so a long replay resumes bit-exactly (SURVEY §5)."""
        from lcvo_tpu.utils import checkpoint as ckpt

        ckpt.save_checkpoint(
            path,
            self.state,
            window=self.window,
            trajectory=self.trajectory,
            frame_idx=produced,
            rng_key=self._key,
            poses=self.poses,
            pose_ok_flags=self.pose_ok_flags,
            extras={"n_rebootstraps": self.n_rebootstraps},
        )

    def resume(self, path: str) -> int:
        """Restore a :meth:`save` checkpoint; returns the absolute frame index to
        continue from (feed frames[produced:] to :meth:`run_continue`)."""
        from lcvo_tpu.utils import checkpoint as ckpt

        cfg = self.cfg
        state_tmpl = st.make_vo_state(cfg, (cfg.image_height, cfg.image_width))
        win_tmpl = self.window
        state, window, traj, produced, key, poses, flags, extras = ckpt.load_checkpoint(path, state_tmpl, win_tmpl)
        if produced is None:
            raise ValueError(f"checkpoint {path} has no frame counter — not a driver checkpoint")
        self.n_rebootstraps = int(extras.get("n_rebootstraps", 0))
        self.state = state
        if window is not None:
            self.window = window
        self.trajectory = list(traj)
        if poses is not None:
            self.poses = list(poses)
        else:  # pre-r3 checkpoint: positions only — synthesize identity-rotation poses
            self.poses = []
            for p in self.trajectory:
                T = np.eye(4)
                T[:3, 3] = p
                self.poses.append(T)
        self.pose_ok_flags = list(flags) if flags is not None else [True] * len(self.trajectory)
        if key is not None:
            self._key = key
        return produced

    # -- full-sequence convenience ------------------------------------------
    def run(self, frame_iter, n_frames: int, bootstrap_gap: int | None = None,
            on_frame=None, checkpoint_every: int = 0, checkpoint_path: str | None = None):
        """Run bootstrap + continuous operation over an iterable of frames.

        Emits exactly one pose per frame from frame ``gap`` onward
        (``len(trajectory) == frames_consumed - gap``), so ground-truth alignment is
        index-exact even across failure recovery — unlike the reference, which
        recurses inside ``estimatePose`` but whose driver still records a pose every
        iteration (``src/vo_pipeline.py:274-324``, ``src/main.py:235-239``).

        Failure recovery: inlier starvation (health counter) triggers a driver-level
        re-bootstrap over the next ``bootstrap.rebootstrap_skip`` frames (the
        reference skips 4 frames, ``src/vo_pipeline.py:288``), anchored at the last
        good pose; frames consumed while the burst buffers record the held anchor
        pose. Bursts with fewer than ``bootstrap.min_matches`` inliers extend one
        frame at a time (bounded), as does the initial bootstrap window.

        ``checkpoint_every=N`` saves a resumable checkpoint to ``checkpoint_path``
        every N processed frames (at healthy frames only).
        """
        cfg = self.cfg
        gap = bootstrap_gap or cfg.bootstrap.frame_gap
        min_m = cfg.bootstrap.min_matches
        max_extend = 4
        it = iter(frame_iter)
        frames = [f for _, f in zip(range(gap + 1), it)]
        if len(frames) < gap + 1:
            raise ValueError(
                f"stream ended after {len(frames)} frame(s); the two-view bootstrap "
                f"needs at least bootstrap.frame_gap + 1 = {gap + 1}"
            )
        n_inl = self.bootstrap(frames)
        produced = gap + 1
        # quality gate (bootstrap.min_matches): while the two-view init is weak,
        # extend the window one frame at a time; each superseded window-end frame
        # keeps its (weak) pose so the trajectory stays index-exact
        extends = 0
        while n_inl < min_m and extends < max_extend and produced < n_frames:
            try:
                img = next(it)
            except StopIteration:
                break
            self._emit(self._pose_result(self.state.R, self.state.t, False), on_frame)
            frames.append(img)
            produced += 1
            extends += 1
            n_inl = self.bootstrap(frames)
        # pose for the bootstrap window's end frame
        self._emit(self._pose_result(self.state.R, self.state.t, True), on_frame)
        return self.run_continue(
            it, n_frames, produced,
            on_frame=on_frame, checkpoint_every=checkpoint_every,
            checkpoint_path=checkpoint_path,
        )

    def run_continue(self, frame_iter, n_frames: int, produced: int, on_frame=None,
                     checkpoint_every: int = 0, checkpoint_path: str | None = None):
        """Continuous-operation loop from an already-initialized state (used by
        :meth:`run` after bootstrap, and by the CLI's ``--resume`` path).

        ``produced`` is the absolute count of frames consumed so far;
        ``frame_iter`` yields frames ``produced, produced+1, ...``.
        """
        cfg = self.cfg
        skip = max(cfg.bootstrap.rebootstrap_skip, 1)
        min_m = cfg.bootstrap.min_matches
        max_extend = 4
        it = iter(frame_iter)
        rebootstrap_buf: list[np.ndarray] = []
        anchor: tuple | None = None  # (R, t, pre-failure speed)
        while produced < n_frames:
            try:
                img = next(it)
            except StopIteration:
                break
            produced += 1
            if rebootstrap_buf:
                rebootstrap_buf.append(img)
                if len(rebootstrap_buf) < skip + 1:
                    # burst still filling: hold the last-known anchor pose
                    self._emit(self._pose_result(anchor[0], anchor[1], False), on_frame)
                    continue
                scale = anchor[2] * (len(rebootstrap_buf) - 1) if anchor[2] else None
                n_inl = self.bootstrap(rebootstrap_buf, R0=anchor[0], t0=anchor[1], scale=scale)
                if n_inl >= min_m:
                    rebootstrap_buf = []
                    self._emit(self._pose_result(self.state.R, self.state.t, True), on_frame)
                    continue
                if n_inl < max(min_m // 4, 4) and slides < 30:
                    # tracking is broken from the window START (e.g. its leading
                    # frames are the corrupted ones): slide the window forward one
                    # frame and retry — end-extension alone can never recover when
                    # the first frame is unusable, and a bootstrap seeded from a
                    # corrupted frame produces a garbage map at garbage scale
                    rebootstrap_buf.pop(0)
                    slides += 1
                    self._emit(self._pose_result(anchor[0], anchor[1], False), on_frame)
                    continue
                if len(rebootstrap_buf) < skip + 1 + max_extend:
                    # weak but live geometry (few inliers: low parallax/texture):
                    # extend the window end for more baseline; hold the anchor
                    # pose rather than trusting a weak map
                    self._emit(self._pose_result(anchor[0], anchor[1], False), on_frame)
                    continue
                # best effort: accept the weak init rather than stalling forever
                rebootstrap_buf = []
                self._emit(self._pose_result(self.state.R, self.state.t, False), on_frame)
                continue
            res = self.step(img)
            # _emit indexes by the trajectory (restored across --resume), not the
            # session-local results list — keeps the per-frame record stream
            # index-exact after a checkpoint resume
            self._emit(res, on_frame)
            if int(self.state.health) >= 2:
                # tracking collapsed → re-bootstrap from the current frame burst,
                # anchored at the last pose AND at the pre-failure metric scale
                # (median healthy velocity) — closes the scale seam the reference
                # leaves open (``src/vo_pipeline.py:314-324``)
                self.n_rebootstraps += 1
                rebootstrap_buf = [img]
                slides = 0
                anchor = (np.asarray(self.state.R), np.asarray(self.state.t),
                          self._recent_step_scale())
            elif checkpoint_every and checkpoint_path and produced % checkpoint_every == 0:
                self.save(checkpoint_path, produced)
        return self.trajectory
