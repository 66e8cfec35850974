"""Per-stage TPU timing of the sift-sift candidate path at bench shapes (dev tool)."""
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


def _fence(out):
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
    print(f"{name:42s} {dt*1e3:8.2f} ms")
    return dt


def main():
    W, H = 1240, 376
    cfg = load_config(overrides={"image_width": W, "image_height": H, "find_new_candidates_method": "sift-sift"})
    det, desc = cfg.detector, cfg.descriptor
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    print(f"octaves={det.sift_octaves} s={det.sift_scales_per_octave} maxk={desc.max_keypoints}")

    f_ss = jax.jit(lambda im: S.build_scale_space(im, det.sift_octaves, det.sift_scales_per_octave))
    timeit("build_scale_space", f_ss, img)

    f_detect = jax.jit(lambda im: S.sift(
        im, max_keypoints=desc.max_keypoints, octaves=det.sift_octaves,
        scales_per_octave=det.sift_scales_per_octave,
        contrast_thresh=det.sift_contrast_thresh, edge_thresh=det.sift_edge_thresh,
        border=cfg.klt.border, compute_desc=False))
    timeit("sift detect only", f_detect, img)

    f_full = jax.jit(lambda im: S.sift(
        im, max_keypoints=desc.max_keypoints, octaves=det.sift_octaves,
        scales_per_octave=det.sift_scales_per_octave,
        contrast_thresh=det.sift_contrast_thresh, edge_thresh=det.sift_edge_thresh,
        border=cfg.klt.border, compute_desc=True))
    feats = f_full(img)
    timeit("sift detect+describe", f_full, img)

    d0 = jnp.asarray(rng.normal(size=feats.desc.shape), jnp.float32)
    v0 = jnp.ones((d0.shape[0],), bool)
    f_match = jax.jit(lambda a, av, b, bv: knn_match_ratio(a, av, b, bv, ratio=desc.ratio_thresh))
    timeit("knn_match_ratio", f_match, feats.desc, feats.valid, d0, v0)


if __name__ == "__main__":
    main()
