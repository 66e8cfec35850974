"""Dev tool: measure in-executable VO throughput at KITTI res for a config override.

Usage: python benchmarks/sweep_config.py '{"klt": {"iters": 6}}'
Prints one JSON line with the fps for that variant. Uses bench.py's cached frames.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _frames
    from lcvo_tpu.config import load_config
    from lcvo_tpu.pipeline import VisualOdometry

    W, H = 1240, 376
    cfg = load_config(overrides={"image_width": W, "image_height": H, **overrides})
    frames, K = _frames(28, W, H)
    vo = VisualOdometry(cfg, K)
    gap = cfg.bootstrap.frame_gap
    vo.bootstrap(frames[: gap + 1])
    chunk = 16
    chunk_fn = vo.make_chunk_step(chunk)
    batch = jnp.asarray(np.stack(frames[gap + 1 : gap + 1 + chunk]), jnp.float32)

    def run_chunk(carry):
        keys = jax.random.split(vo._next_key(), chunk)
        return chunk_fn(carry, batch, keys)

    def fence(carry):
        st_ = carry if hasattr(carry, "frame_idx") else carry[0]
        return float(st_.frame_idx)  # axon: only a host read fences remote completion

    carry, out = run_chunk(vo.chunk_carry())
    fence(carry)
    t0 = time.perf_counter()
    for _ in range(4):
        carry, out = run_chunk(carry)
    fence(carry)
    fps = 4 * chunk / (time.perf_counter() - t0)
    print(json.dumps({"overrides": overrides, "fps": round(fps, 2)}))


if __name__ == "__main__":
    main()
