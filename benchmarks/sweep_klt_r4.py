"""Round-4 KLT operating-point sweep on the chip: iter_dtype x track_margin.

Measures steady-state sift-sift frames/s (bench methodology: distinct pre-staged
chunks) for the candidate KLT configurations, deciding the round-4 defaults:
bf16 iteration storage (VERDICT r3 #2) and the warm-start-enabled margin.

Run (chip): python benchmarks/sweep_klt_r4.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from lcvo_tpu.config import load_config

    W, H = 1240, 376
    frames, seq = bench._frames(128, W, H)
    for iter_dtype in ("float32", "bfloat16"):
        for margin in (4, 3, 6):
            cfg = load_config(overrides={
                "image_width": W, "image_height": H,
                "find_new_candidates_method": "sift-sift",
                "klt": {"iter_dtype": iter_dtype, "track_margin": margin},
            })
            fps = bench._measure_mode(cfg, frames, seq.K)
            print(json.dumps({"iter_dtype": iter_dtype, "track_margin": margin,
                              "fps": round(fps, 2)}), flush=True)


if __name__ == "__main__":
    main()
