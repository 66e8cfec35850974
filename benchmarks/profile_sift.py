"""Per-stage TPU timing of the sift-sift candidate path at bench shapes (dev tool).

All timed functions reduce their outputs to a scalar inside jit so the host-read
fence transfers 4 bytes — fetching real outputs over the axon tunnel costs
~2-3 ms/MB and (in the round-1 version of this script) inflated stage timings by
2-3x (e.g. build_scale_space measured 4.7 ms vs a true 2.3 ms).
"""
from __future__ import annotations

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lcvo_tpu.config import load_config
from lcvo_tpu.frontend import sift as S
from lcvo_tpu.frontend.match import knn_match_ratio


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def _scalar(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(tree))


def main():
    W, H = 1240, 376
    cfg = load_config(overrides={"image_width": W, "image_height": H, "find_new_candidates_method": "sift-sift"})
    det, desc = cfg.detector, cfg.descriptor
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    s = det.sift_scales_per_octave
    k_oct = max(desc.max_keypoints // det.sift_octaves, 1)
    print(f"octaves={det.sift_octaves} s={s} maxk={desc.max_keypoints} k_oct={k_oct}")

    f_ss = jax.jit(lambda im: _scalar(S.build_scale_space(im, det.sift_octaves, s)))
    timeit("build_scale_space", f_ss, img)

    # detection stages, octave 0 only (the dominant octave)
    space0 = jax.jit(lambda im: S.build_scale_space(im, 1, s)[0])(img)

    f_det0 = jax.jit(lambda g: _scalar(S._detect_octave(g, k_oct, det.sift_contrast_thresh, det.sift_edge_thresh, s, cfg.klt.border)))
    timeit("  _detect_octave (oct0: extrema+topk+subpx)", f_det0, space0)

    def blocks_ori(g):
        xy, li, score, valid = S._detect_octave(g, k_oct, det.sift_contrast_thresh, det.sift_edge_thresh, s, cfg.klt.border)
        sig_rel = 1.6 * 2.0 ** (li.astype(jnp.float32) / s)
        gx_st, gy_st = S._stack_gradients(g)
        S_blk = min(int(np.ceil(2 * 2 * np.sqrt(2.0) * 3.0 * 1.6 * 2.0)) + 4, g.shape[2])
        gxB, oxb, oyb = S._extract_stack_blocks(gx_st, li, xy, S_blk)
        gyB, _, _ = S._extract_stack_blocks(gy_st, li, xy, S_blk)
        ori = S._orientation(gxB, gyB, oxb, oyb, xy, sig_rel, valid, S_blk)
        return _scalar((gxB, gyB, ori))

    timeit("  oct0 detect+blocks+orientation", jax.jit(blocks_ori), space0)

    f_detect = jax.jit(lambda im: _scalar(S.sift(
        im, max_keypoints=desc.max_keypoints, octaves=det.sift_octaves,
        scales_per_octave=s,
        contrast_thresh=det.sift_contrast_thresh, edge_thresh=det.sift_edge_thresh,
        border=cfg.klt.border, compute_desc=False)))
    timeit("sift detect only (all octaves)", f_detect, img)

    f_full = jax.jit(lambda im: _scalar(S.sift(
        im, max_keypoints=desc.max_keypoints, octaves=det.sift_octaves,
        scales_per_octave=s,
        contrast_thresh=det.sift_contrast_thresh, edge_thresh=det.sift_edge_thresh,
        border=cfg.klt.border, compute_desc=True)))
    timeit("sift detect+describe", f_full, img)

    d0 = jnp.asarray(rng.normal(size=(desc.max_keypoints, 128)), jnp.float32)
    d1 = jnp.asarray(rng.normal(size=(desc.max_keypoints, 128)), jnp.float32)
    v = jnp.ones((desc.max_keypoints,), bool)
    f_match = jax.jit(lambda a, av, b, bv: _scalar(knn_match_ratio(a, av, b, bv, ratio=desc.ratio_thresh)))
    timeit("knn_match_ratio", f_match, d0, v, d1, v)


if __name__ == "__main__":
    main()
