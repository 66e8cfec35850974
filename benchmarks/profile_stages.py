"""Per-stage TPU timing of the process_frame pipeline at bench shapes.

Times each compute stage of the jitted step in isolation to find where the
frame budget goes. Not part of the headline bench — a dev tool.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lcvo_tpu.config import load_config
from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import harris, pnp
from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.pyramid import build_pyramid


def _fence(out):
    # axon tunnel: block_until_ready does not wait for remote completion — a host
    # read of an output leaf is the only reliable fence
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return dt


def main():
    W, H = 1240, 376
    cfg = load_config(overrides={"image_width": W, "image_height": H})
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    kltc = cfg.klt
    N = cfg.state.max_tracks + cfg.state.max_candidates
    pts = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20], (N, 2)), jnp.float32)

    pyr0 = build_pyramid(img0, kltc.levels)
    pyr1 = build_pyramid(img1, kltc.levels)

    f_pyr = jax.jit(lambda im: build_pyramid(im, kltc.levels))
    timeit("build_pyramid", f_pyr, img1)

    f_klt = jax.jit(
        lambda a, b, p: pyramidal_klt(
            a, b, p, window=kltc.window, iters=kltc.iters,
            max_residual=kltc.max_residual, max_displacement=kltc.max_displacement,
            border=kltc.border,
        )
    )
    timeit(f"klt N={N} w={kltc.window} L={kltc.levels} it={kltc.iters}", f_klt, pyr0, pyr1, pts)

    K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
    Kj = jnp.asarray(K)
    nt = cfg.state.max_tracks
    X = jnp.asarray(rng.uniform([-10, -5, 4], [10, 5, 60], (nt, 3)), jnp.float32)
    x_obs = geo.normalize_points(pts[:nt], Kj)
    valid = jnp.ones((nt,), bool)
    key = jax.random.PRNGKey(0)

    f_pnp = jax.jit(
        lambda k, X, x, v: pnp.pnp_ransac(
            k, X, x, v, thresh=cfg.ransac.pnp_thresh_px / 718.0,
            n_hyp=cfg.ransac.pnp_hypotheses, refine_iters=cfg.ransac.refine_iters,
        )
    )
    timeit(f"pnp_ransac M={cfg.ransac.pnp_hypotheses}", f_pnp, key, X, x_obs, valid)

    det = cfg.detector
    f_det = jax.jit(
        lambda im: harris.detect_corners(
            im, max_corners=cfg.state.max_new_per_frame, quality_level=det.quality_level,
            cells_y=det.grid_cells_y, cells_x=det.grid_cells_x, cells_topk=det.cells_topk,
            method="shi", window=det.window, border=kltc.border,
        )
    )
    timeit("detect_corners", f_det, img1)

    nc = cfg.state.max_candidates
    Rf = jnp.broadcast_to(jnp.eye(3), (nc, 3, 3))
    tf = jnp.zeros((nc, 3))
    R = jnp.eye(3)
    t = jnp.zeros(3)
    Cc = pts[nt:]
    Ff = Cc + 2.0

    def tri_block(Rf, tf, R, t, Ff, Cc):
        ang = geo.bearing_angle(Rf, tf, R, t, Ff, Cc, Kj)
        x_f = geo.normalize_points(Ff, Kj)
        x_c = geo.normalize_points(Cc, Kj)
        X_tri = geo.triangulate_linear(Rf, tf, R, t, x_f, x_c)
        return ang, X_tri

    timeit("triangulate+bearing block", jax.jit(tri_block), Rf, tf, R, t, Ff, Cc)

    # full step for comparison
    from lcvo_tpu.core import state as st
    from lcvo_tpu.pipeline import make_process_frame

    fn = jax.jit(make_process_frame(cfg, K))
    state = st.make_vo_state(cfg, (H, W))
    tracks = state.tracks._replace(
        P=state.tracks.P.at[:nt].set(pts[:nt]),
        X=state.tracks.X.at[:nt].set(X),
        valid=state.tracks.valid.at[:nt].set(True),
    )
    state = state._replace(tracks=tracks, prev_image=img0, prev_pyramid=pyr0)
    timeit("FULL process_frame", fn, state, img1, key)


if __name__ == "__main__" and "--sift" not in sys.argv:
    main()


def main_sift():
    """Per-stage timing of the sift-sift candidate path (the reference's selected mode)."""
    W, H = 1240, 376
    cfg = load_config(
        overrides={"image_width": W, "image_height": H, "find_new_candidates_method": "sift-sift"}
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    from lcvo_tpu.frontend import sift as sf
    from lcvo_tpu.frontend import match as mt

    d = cfg.detector
    n_feat = cfg.state.max_new_per_frame
    f_ss = jax.jit(lambda im: sf.build_scale_space(im, d.sift_octaves, d.sift_scales_per_octave))
    timeit("sift scale space", f_ss, img)

    f_det = jax.jit(
        lambda im: sf.sift(
            im, max_keypoints=n_feat, octaves=d.sift_octaves, scales_per_octave=d.sift_scales_per_octave,
            contrast_thresh=d.sift_contrast_thresh, edge_thresh=d.sift_edge_thresh,
            compute_desc=False,
        )
    )
    timeit("sift detect only", f_det, img)

    f_full = jax.jit(
        lambda im: sf.sift(
            im, max_keypoints=n_feat, octaves=d.sift_octaves, scales_per_octave=d.sift_scales_per_octave,
            contrast_thresh=d.sift_contrast_thresh, edge_thresh=d.sift_edge_thresh,
            compute_desc=True,
        )
    )
    feats = f_full(img)
    timeit("sift detect+describe", f_full, img)

    da = feats.desc
    db = jnp.roll(da, 3, axis=0)
    va = feats.valid
    f_match = jax.jit(lambda a, b, va, vb: mt.knn_match_ratio(a, b, va, vb, ratio=0.8))
    timeit("bf match+ratio", f_match, da, db, va, va)

    from lcvo_tpu.core import state as st
    from lcvo_tpu.pipeline import make_process_frame

    K = np.array([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], np.float32)
    fn = jax.jit(make_process_frame(cfg, K))
    state = st.make_vo_state(cfg, (H, W))
    from lcvo_tpu.ops.pyramid import build_pyramid as bp
    state = state._replace(prev_image=img, prev_pyramid=bp(img, cfg.klt.levels))
    key = jax.random.PRNGKey(0)
    timeit("FULL process_frame sift-sift", fn, state, img, key)


if __name__ == "__main__" and "--sift" in sys.argv:
    main_sift()
    sys.exit(0)
