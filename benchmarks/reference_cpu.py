"""Measure the reference pipeline's per-frame CPU cost (the 5x baseline).

The reference publishes no timings (BASELINE.md) and its datasets are not present in
this image, so we measure a faithful surrogate of its per-frame hot loop on synthetic
frames: the exact OpenCV C++ kernels it calls per frame with its sizes/parameters
(SURVEY §3.2):

  - cv2.calcOpticalFlowPyrLK on the landmark set P        (vo_pipeline.py:215)
  - cv2.calcOpticalFlowPyrLK on the candidate set C       (vo_pipeline.py:501)
  - cv2.solvePnPRansac (ITERATIVE, 2px, 0.99999)          (vo_pipeline.py:258-264)
  - per-frame new-candidate detection:
      sift-sift: SIFT.detectAndCompute + BFMatcher.knnMatch  (vo_pipeline.py:443-450)
      shi:       cv2.goodFeaturesToTrack                     (vo_pipeline.py:382)
  - per-candidate bearing-angle loop + cv2.triangulatePoints (vo_pipeline.py:607-673)
    approximated by its numpy ops on the same counts

Run: python benchmarks/reference_cpu.py [--frames 60] [--mode sift-sift|shi]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from lcvo_tpu.data.synthetic import SyntheticSequence  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--mode", default="sift-sift", choices=["sift-sift", "sift-mask", "shi"])
    ap.add_argument("--width", type=int, default=1240)
    ap.add_argument("--height", type=int, default=376)
    args = ap.parse_args()

    import cv2

    seq = SyntheticSequence(n_frames=args.frames + 1, width=args.width, height=args.height, speed=0.35)
    K = seq.K
    frames = [seq.frame(i).astype(np.uint8) for i in range(args.frames + 1)]

    rng = np.random.default_rng(0)
    # state sizes representative of the reference mid-run (hundreds of tracks)
    n_P, n_C = 250, 400
    P = rng.uniform([20, 20], [args.width - 20, args.height - 20], size=(n_P, 2)).astype(np.float32)
    C = rng.uniform([20, 20], [args.width - 20, args.height - 20], size=(n_C, 2)).astype(np.float32)
    X = np.concatenate([ (P - K[:2,2]) / [K[0,0], K[1,1]] * 10.0, np.full((n_P,1), 10.0)], axis=1).astype(np.float32)

    sift = cv2.SIFT_create()
    bf = cv2.BFMatcher()
    prev_des = None

    t0 = time.perf_counter()
    for i in range(args.frames):
        img1, img2 = frames[i], frames[i + 1]
        # HOT LOOP 1: KLT on P
        P2, st1, _ = cv2.calcOpticalFlowPyrLK(img1, img2, P.reshape(-1, 1, 2), None)
        # HOT LOOP 2: PnP-RANSAC
        try:
            cv2.solvePnPRansac(
                X.reshape(-1, 1, 3), P2.reshape(-1, 1, 2), K, None,
                flags=cv2.SOLVEPNP_ITERATIVE, reprojectionError=2.0, confidence=0.99999,
            )
        except cv2.error:
            pass
        # HOT LOOP 1b: KLT on C
        C2, st2, _ = cv2.calcOpticalFlowPyrLK(img1, img2, C.reshape(-1, 1, 2), None)
        # HOT LOOP 3: new-candidate detection
        if args.mode == "sift-sift":
            kps, des = sift.detectAndCompute(img2, None)
            if prev_des is not None and des is not None and len(des) > 2:
                matches = bf.knnMatch(des, prev_des, k=2)
                _ = [m for m, n in matches if m.distance < 0.8 * n.distance]
            prev_des = des
        elif args.mode == "sift-mask":
            # reference find_new_candidates_sift_mask: per-frame SIFT detect only,
            # proximity mask vs tracked points (src/vo_pipeline.py:392-425)
            kps = sift.detect(img2, None)
        else:
            cv2.goodFeaturesToTrack(img2, 500, 0.03, 10)
        # candidate validation + triangulation loop (reference loops per candidate)
        T1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        T2 = K @ np.hstack([np.eye(3), np.array([[0.3], [0], [0]])])
        for j in range(min(60, n_C)):  # ~validated subset per frame
            cv2.triangulatePoints(T1, T2, C[j].reshape(2, 1), C2.reshape(-1, 2)[j].reshape(2, 1))
    dt = time.perf_counter() - t0
    fps = args.frames / dt
    print(json.dumps({
        "metric": f"reference_cpu_fps_{args.mode}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "resolution": f"{args.width}x{args.height}",
        "frames": args.frames,
    }))


if __name__ == "__main__":
    main()
