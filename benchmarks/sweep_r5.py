"""Round-5 throughput sweep on the chip: KLT level/iteration schedule x anchor
refinement (VERDICT r4 #3 — the structural KLT latency attack).

Measures steady-state sift-sift frames/s (bench methodology: distinct pre-staged
chunks) for the candidate configurations:

- klt.track_levels (0 = all 3): the warm-started in-pipeline tracker's pyramid
  depth — dropping a level removes one whole per-level iteration loop + two
  block extractions from the latency-chained hot path.
- klt.iters_coarse (0 = same as iters): fewer LK iterations at coarse levels —
  a coarse level only needs to land within the next level's wander margin.
- triangulation.track_refine: the round-5 anchor re-triangulation (its cost
  must be priced into the headline mode).

Quality gating happens separately on the 311-frame turn band (diag_turn.py
variants); this script prices the knobs. Run (chip):
    python benchmarks/sweep_r5.py
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
    grid = [
        # (track_levels, iters_coarse, track_refine, track_margin)
        (0, 0, False, 4),   # round-4 defaults (control: r4 margins)
        (0, 0, False, 6),   # round-5 margins alone (the turn-exit fix)
        (0, 0, True, 6),    # + anchor refinement (price it)
        (0, 3, True, 6),    # 3-level, 3 coarse iters
        (0, 2, True, 6),
        (2, 0, True, 6),    # 2-level tracker
        (2, 3, True, 6),
    ]
    for tl, ic, tr, m in grid:
        cfg = load_config(overrides={
            "image_width": W, "image_height": H,
            "find_new_candidates_method": "sift-sift",
            "klt": {"track_levels": tl, "iters_coarse": ic, "track_margin": m},
            "triangulation": {"track_refine": tr},
        })
        fps = bench._measure_mode(cfg, frames, seq.K)
        print(json.dumps({"track_levels": tl, "iters_coarse": ic,
                          "track_refine": tr, "track_margin": m,
                          "fps": round(fps, 2)}), flush=True)


if __name__ == "__main__":
    main()
