"""Single-chip multi-stream (DP) aggregate throughput at KITTI resolution.

The stream axis is the production scale-out story (SURVEY §2.3): this measures
how much aggregate frames/s ONE chip yields when the vmapped ``process_frame``
batches S independent VO streams — better MXU/VPU utilization than one stream's
latency chain. Complements benchmarks/SCALING.md (multi-device weak scaling on
the virtual CPU mesh) with real-hardware numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from lcvo_tpu.config import load_config
from lcvo_tpu.data.synthetic import make_intrinsics
from lcvo_tpu.parallel.streams import make_batched_state, make_multistream_step

W, H = 1240, 376


def main():
    cfg = load_config(overrides={"image_width": W, "image_height": H})
    K = make_intrinsics(W, H)
    rng = np.random.default_rng(0)
    for S in (1, 2, 4):
        step = make_multistream_step(cfg, K)
        states = make_batched_state(cfg, (H, W), S)
        # seed valid tracks so the full PnP/triangulation path runs
        P = rng.uniform([16, 16], [W - 16, H - 16], size=(S, 256, 2)).astype(np.float32)
        X = rng.uniform([-4, -2, 6], [4, 2, 16], size=(S, 256, 3)).astype(np.float32)
        states = states._replace(tracks=states.tracks._replace(
            P=states.tracks.P.at[:, :256].set(P),
            X=states.tracks.X.at[:, :256].set(X),
            valid=states.tracks.valid.at[:, :256].set(True),
        ))
        imgs = jnp.asarray(rng.uniform(0, 255, (S, H, W)), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), S)

        states, _, agg = step(states, imgs, keys)
        _ = float(agg["tracked"])  # host-read fence
        n = 30
        t0 = time.perf_counter()
        for _i in range(n):
            states, _, agg = step(states, imgs, keys)
        _ = float(agg["tracked"])
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "bench": "multistream_1chip",
            "streams": S,
            "ms_per_step": round(dt * 1e3, 2),
            "aggregate_frames_per_s": round(S / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
