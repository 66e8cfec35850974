"""Generate a full-scale KITTI-format replay dataset on disk.

The reference's published flagship run is KITTI 05, frames 0-2759 at 1241x376
(``README.md:16``, ``result-trajectory-plots/kitti_trajectory__sift-sift_0-2759_frames.png``).
KITTI itself is not redistributable, so this renders the synthetic corridor at the
same scale into the exact on-disk layout the kitti adapter consumes:

    <out>/kitti-dataset/05/image_0/%06d.png     (grayscale PNGs, native-decoder path)
    <out>/kitti-dataset/05/calib.txt            (P0 intrinsics row)
    <out>/kitti-dataset/poses/05.txt            (cam->world [R|t] rows, exact GT)

Rendering uses the jitted corridor renderer (ms/frame on an accelerator vs ~1
s/frame for the numpy fixture renderer); PNG encode is host-side PIL. ~800 MB for
2,760 frames — NOT committed (datasets/ is gitignored).

Run:  python benchmarks/make_replay_dataset.py [--frames 2760] [--out datasets]
Then: python -m lcvo_tpu.cli.run --dataset kitti --data-root datasets \
          --mode sift-sift --ba --chunked --checkpoint-every 500 --out runs/replay
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2760)
    ap.add_argument("--width", type=int, default=1240)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "datasets"))
    ap.add_argument("--speed", type=float, default=0.35)
    ap.add_argument("--cpu", action="store_true",
                    help="render on the CPU backend (PNG encode is the bottleneck "
                         "anyway; leaves the chip free for concurrent benchmarks)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from lcvo_tpu.data.render_jax import FastCorridorRenderer

    root = os.path.join(args.out, "kitti-dataset")
    img_dir = os.path.join(root, "05", "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    r = FastCorridorRenderer(args.frames, args.width, args.height, speed=args.speed)
    np.savetxt(os.path.join(root, "poses", "05.txt"), r.gt_pose_rows())
    P0 = np.hstack([r.K, np.zeros((3, 1))]).reshape(-1)
    with open(os.path.join(root, "05", "calib.txt"), "w") as fh:
        fh.write("P0: " + " ".join(f"{v:.12e}" for v in P0) + "\n")

    t0 = time.perf_counter()
    done = 0
    for i in range(args.frames):
        p = os.path.join(img_dir, f"{i:06d}.png")
        if os.path.exists(p):  # resumable
            continue
        Image.fromarray(r.frame(i), mode="L").save(p)
        done += 1
        if done % 200 == 0:
            dt = time.perf_counter() - t0
            print(f"{done} frames written ({done / dt:.1f} fps)", flush=True)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "frames": args.frames, "written": done, "seconds": round(dt, 1),
        "root": root,
    }))


if __name__ == "__main__":
    main()
