"""Generate full-scale on-disk replay datasets matching the reference's envelope.

The reference's published runs (``README.md:16,25,33``, ``src/main.py:14-65``,
``result-trajectory-plots/*.png``) are:

    kitti    KITTI 05, frames 0-2759, 1241x376, multiple sustained ~90 deg turns
    malaga   extract-07, frames 0-2119, 800x600, urban drive with turns
    parking  frames 0-597, 640x480, gentle motion

None of those datasets are redistributable, so this renders synthetic worlds with
exact ground truth at the same scales into the exact on-disk layouts the
``lcvo_tpu.data.datasets`` adapters consume:

    --dataset kitti       straight corridor, kitti layout (round-3 flagship)
    --dataset kitti-turn  arena LOOP with 9 sustained 90 deg turns (2 deg/frame),
                          kitti layout — the turn-rich profile of the reference's
                          KITTI 05 plot
    --dataset malaga      arena loop at 800x600 with the malaga adapter's K;
                          malaga layout: timestamped ``img_CAMERA1_<t>_left.jpg``
                          files + a 1 Hz GPS log (exercises the timestamp
                          interpolation path at scale)
    --dataset parking     corridor at 640x480 with the parking adapter's K
                          (597 frames); parking layout

Rendering uses the jitted renderers (ms/frame); image encode is host-side PIL.
Datasets land under ``<out>/<tag>/...`` and are NOT committed (gitignored).

Run:  python benchmarks/make_replay_dataset.py --dataset kitti-turn [--cpu]
Then e.g.: python -m lcvo_tpu.cli.run --dataset kitti --data-root datasets/turn \
          --mode sift-sift --ba --chunked --checkpoint-every 512 --out runs/turn
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's hard-coded per-dataset intrinsics (src/main.py:31-65), which the
# malaga/parking adapters also hard-code — the rendered worlds must match them
K_MALAGA = np.array([[621.18428, 0, 404.0076], [0, 621.18428, 309.05989], [0, 0, 1]])
K_PARKING = np.array([[331.37, 0, 320.0], [0, 369.568, 240.0], [0, 0, 1]])


def _write_frames(renderer, save_frame, n_frames):
    """Render + encode frames, resumable, with progress prints."""
    t0 = time.perf_counter()
    done = 0
    for i in range(n_frames):
        if save_frame(i, None, check=True):  # already on disk
            continue
        save_frame(i, renderer.frame(i))
        done += 1
        if done % 200 == 0:
            dt = time.perf_counter() - t0
            print(f"{done} frames written ({done / dt:.1f} fps)", flush=True)
    return done, time.perf_counter() - t0


def gen_kitti(out_root, renderer, n_frames):
    """KITTI odometry layout: 05/image_0/%06d.png + calib.txt + poses/05.txt."""
    from PIL import Image

    root = os.path.join(out_root, "kitti-dataset")
    img_dir = os.path.join(root, "05", "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    np.savetxt(os.path.join(root, "poses", "05.txt"), renderer.gt_pose_rows())
    P0 = np.hstack([renderer.K, np.zeros((3, 1))]).reshape(-1)
    with open(os.path.join(root, "05", "calib.txt"), "w") as fh:
        fh.write("P0: " + " ".join(f"{v:.12e}" for v in P0) + "\n")

    def save(i, img, check=False):
        p = os.path.join(img_dir, f"{i:06d}.png")
        if check:
            return os.path.exists(p)
        Image.fromarray(img, mode="L").save(p)

    return root, _write_frames(renderer, save, n_frames)


def gen_malaga(out_root, renderer, n_frames, fps=7.5, t0=100000.0):
    """Malaga extract-07 layout: timestamped left jpgs + 1 Hz GPS log.

    The GPS log (10 columns; col 0 = epoch time, cols 8/9 = local x/y — the
    columns the adapter reads, reference ``src/main.py:40-44``) is sampled at
    1 Hz from the exact trajectory, so the adapter's timestamp interpolation
    (``data/datasets.py:129-158``) is exercised at full scale.
    """
    from PIL import Image

    root = os.path.join(out_root, "malaga-urban-dataset-extract-07")
    img_dir = os.path.join(root, "malaga-urban-dataset-extract-07_rectified_800x600_Images")
    os.makedirs(img_dir, exist_ok=True)
    stamps = t0 + np.arange(n_frames) / fps
    pos = renderer.gt_positions()
    gps_t = np.arange(t0, stamps[-1] + 1.0, 1.0)
    rows = np.zeros((len(gps_t), 10))
    rows[:, 0] = gps_t
    rows[:, 8] = np.interp(gps_t, stamps, pos[:, 0])
    rows[:, 9] = np.interp(gps_t, stamps, pos[:, 2])
    gps_path = os.path.join(root, "malaga-urban-dataset-extract-07_all-sensors_GPS.txt")
    with open(gps_path, "w") as fh:
        fh.write("% Time ... LocalX LocalY (synthetic; cols 0/8/9 as real log)\n")
        np.savetxt(fh, rows)
    # exact full GT poses are NOT part of the real malaga layout (GPS only) —
    # keep them alongside for offline analysis
    np.savetxt(os.path.join(root, "exact_poses_kitti_format.txt"), renderer.gt_pose_rows())

    def save(i, img, check=False):
        p = os.path.join(img_dir, f"img_CAMERA1_{stamps[i]:.6f}_left.jpg")
        if check:
            return os.path.exists(p)
        Image.fromarray(img, mode="L").save(p, quality=92)

    return root, _write_frames(renderer, save, n_frames)


def gen_parking(out_root, renderer, n_frames):
    """Parking layout: images/img_%05d.png + poses.txt (KITTI-format rows)."""
    from PIL import Image

    root = os.path.join(out_root, "parking")
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    np.savetxt(os.path.join(root, "poses.txt"), renderer.gt_pose_rows())

    def save(i, img, check=False):
        p = os.path.join(img_dir, f"img_{i:05d}.png")
        if check:
            return os.path.exists(p)
        Image.fromarray(img, mode="L").save(p)

    return root, _write_frames(renderer, save, n_frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="kitti",
                    choices=("kitti", "kitti-turn", "malaga", "parking"))
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", default=None, help="data_root directory to write into")
    ap.add_argument("--speed", type=float, default=0.35)
    ap.add_argument("--cpu", action="store_true",
                    help="render on the CPU backend (image encode dominates "
                         "anyway; leaves the chip free for concurrent benchmarks)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lcvo_tpu.data.render_jax import FastArenaRenderer, FastCorridorRenderer
    from lcvo_tpu.data.synthetic import trajectory_loop

    if args.dataset == "kitti":
        n = args.frames or 2760
        out = args.out or os.path.join(REPO, "datasets")
        r = FastCorridorRenderer(n, 1240, 376, speed=args.speed)
        root, (done, dt) = gen_kitti(out, r, n)
    elif args.dataset == "kitti-turn":
        n = args.frames or 2760
        out = args.out or os.path.join(REPO, "datasets", "turn")
        traj = trajectory_loop(n, speed=args.speed, straight_frames=260, turn_frames=45)
        r = FastArenaRenderer(traj, 1240, 376)
        root, (done, dt) = gen_kitti(out, r, n)
    elif args.dataset == "malaga":
        n = args.frames or 2120
        out = args.out or os.path.join(REPO, "datasets", "malaga")
        traj = trajectory_loop(n, speed=args.speed, straight_frames=300, turn_frames=50)
        r = FastArenaRenderer(traj, 800, 600, K=K_MALAGA)
        root, (done, dt) = gen_malaga(out, r, n)
    else:  # parking
        n = args.frames or 598
        out = args.out or os.path.join(REPO, "datasets", "parking-root")
        r = FastCorridorRenderer(n, 640, 480, speed=args.speed, K=K_PARKING)
        root, (done, dt) = gen_parking(out, r, n)

    print(json.dumps({
        "dataset": args.dataset, "frames": n, "written": done,
        "seconds": round(dt, 1), "root": root,
    }))


if __name__ == "__main__":
    main()
