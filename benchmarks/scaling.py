"""Scaling benchmark: frames/s at 1 chip / 1 host / N hosts (BASELINE.json north star).

Measures weak-scaling efficiency of the two scale-out axes (SURVEY §2.3):

1. **stream DP** — the multi-stream ``process_frame`` step over a device mesh with a
   fixed number of streams per device; efficiency = aggregate frames/s at N devices
   / (N x frames/s at 1 device).
2. **sharded BA** — the landmark-sharded Schur-complement solve at fixed
   landmarks-per-device.

On this image only a virtual CPU mesh exists (2 vCPUs oversubscribed 8x), so local
numbers characterize harness overhead, not hardware scaling — the same script runs
unchanged on a real pod slice (mesh axes spanning DCN x ICI after
``jax.distributed.initialize``; see lcvo_tpu/parallel/mesh.py).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--streams-per-device", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--ba", action="store_true", help="also benchmark sharded BA scaling")
    p.add_argument("--cpu", action="store_true", help="force CPU backend with 8 virtual devices")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    import numpy as np

    from lcvo_tpu.config import load_config
    from lcvo_tpu.data.synthetic import make_intrinsics
    from lcvo_tpu.parallel.mesh import make_mesh
    from lcvo_tpu.parallel.streams import make_batched_state, make_multistream_step

    W, H = args.width, args.height
    cfg = load_config(
        overrides={
            "image_width": W,
            "image_height": H,
            "state": {"max_tracks": 256, "max_candidates": 384, "max_new_per_frame": 64},
            "ransac": {"pnp_hypotheses": 128, "e_hypotheses": 128},
        }
    )
    K = make_intrinsics(W, H)
    rng = np.random.default_rng(0)
    results = {}

    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            print(f"# skipping {n_dev} devices (only {len(jax.devices())} available)")
            continue
        mesh = make_mesh(n_dev)
        n_streams = n_dev * args.streams_per_device
        step = make_multistream_step(cfg, K, mesh=mesh)
        states = make_batched_state(cfg, (H, W), n_streams)
        imgs = jnp.asarray(rng.random((n_streams, H, W), dtype=np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), n_streams)
        # warmup / compile
        states, _, agg = step(states, imgs, keys)
        jax.block_until_ready(agg)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            states, _, agg = step(states, imgs, keys)
        jax.block_until_ready(agg)
        dt = time.perf_counter() - t0
        fps = n_streams * args.steps / dt
        results[n_dev] = fps
        base = results[min(results)] / (min(results) * args.streams_per_device)
        eff = fps / (n_dev * args.streams_per_device * base) if base else float("nan")
        print(json.dumps({
            "bench": "stream_dp",
            "devices": n_dev,
            "streams": n_streams,
            "frames_per_s": round(fps, 2),
            "weak_scaling_efficiency": round(eff, 3),
        }))

    if args.ba:
        from lcvo_tpu.solve.ba.schur import BAProblem
        from lcvo_tpu.solve.ba.sharded import ba_solve_sharded

        def make_problem(n_points, seed=0):
            r = np.random.default_rng(seed)
            Wn = 10
            X = r.uniform([-4, -2, 6], [4, 2, 14], (n_points, 3)).astype(np.float32)
            Rs, ts, obs = [], [], []
            for w in range(Wn):
                ang = 0.02 * w
                Rw = np.array(
                    [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
                    np.float32,
                )
                t = (-Rw @ np.array([0.4 * w, 0.0, 0.0])).astype(np.float32)
                p = (Rw @ X.T).T + t
                obs.append(p[:, :2] / p[:, 2:3])
                Rs.append(Rw)
                ts.append(t)
            X_noisy = X + r.normal(0, 0.05, X.shape).astype(np.float32)
            return BAProblem(
                R=jnp.asarray(np.stack(Rs)),
                t=jnp.asarray(np.stack(ts)),
                X=jnp.asarray(X_noisy),
                obs=jnp.asarray(np.stack(obs).astype(np.float32)),
                mask=jnp.ones((Wn, n_points), bool),
            )

        for n_dev in args.devices:
            if n_dev > len(jax.devices()):
                continue
            mesh = make_mesh(n_dev)
            prob = make_problem(n_points=128 * n_dev)
            out = ba_solve_sharded(prob, mesh, iters=5)
            jax.block_until_ready(out.R)
            t0 = time.perf_counter()
            for _ in range(5):
                out = ba_solve_sharded(prob, mesh, iters=5)
            jax.block_until_ready(out.R)
            dt = (time.perf_counter() - t0) / 5
            print(json.dumps({
                "bench": "sharded_ba",
                "devices": n_dev,
                "landmarks": 128 * n_dev,
                "solve_ms": round(dt * 1e3, 2),
            }))


if __name__ == "__main__":
    main()
