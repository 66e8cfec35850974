"""Full-scale replay harness: the reference's published envelope through the CLI
(VERDICT r2 #1 / r3 #1 — ``README.md:16,25,33``, ``src/main.py:14-65``):

    kitti    2,760 frames at 1240x376 (straight corridor, or the turn-rich loop
             when --data-root points at datasets/turn)
    malaga   2,120 frames at 800x600 (timestamp-interpolated GPS ground truth)
    parking  598 frames at 640x480 (BASELINE config 1: --no-ba, shi-mask)

Drives ``python -m lcvo_tpu.cli.run --chunked`` as a subprocess over the on-disk
dataset from make_replay_dataset.py, with periodic checkpoints, while sampling
the child's RSS (the streaming ingest must hold O(chunk) frames — staging 2,760
KITTI frames would be ~5.1 GB).

``--kill-resume`` additionally rehearses failure recovery at scale: a second run
is KILLED mid-replay (SIGKILL, no cleanup) and resumed from its last checkpoint;
the resumed trajectory must match the uninterrupted one (same chunk boundaries +
checkpointed RNG key -> deterministic continuation).

Writes REPLAY_r{N}_{tag}.json at the repo root and prints it.

Run (chip), round-4 envelope:
    python benchmarks/run_replay.py --data-root datasets/turn --tag kitti_turn --kill-resume
    python benchmarks/run_replay.py --dataset malaga --data-root datasets/malaga --frames 2120
    python benchmarks/run_replay.py --dataset parking --data-root datasets/parking-root \
        --frames 598 --mode shi-mask --no-ba
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_args(out, frames, dataset="kitti", data_root=None, mode="sift-sift",
              ba=True, config=None, extra=()):
    return [
        sys.executable, "-u", "-m", "lcvo_tpu.cli.run",
        "--dataset", dataset, "--data-root", data_root or os.path.join(REPO, "datasets"),
        "--mode", mode, *(("--ba",) if ba else ()), "--chunked",
        *(("--config", config) if config else ()),
        "--frames", str(frames),
        "--checkpoint-every", "512",
        "--out", out,
        *extra,
    ]


def _rss_mb(pid):
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except FileNotFoundError:
        pass
    return None


def run_sampled(args, kill_after_ckpt=None):
    """Run a CLI subprocess, sampling RSS. ``kill_after_ckpt=(ckpt_path, s)``
    sends SIGKILL ``s`` seconds after ``ckpt_path`` first appears — tied to the
    checkpoint rather than wall time, so the kill always lands mid-replay with
    a resumable checkpoint on disk (a wall-time kill can fire during the
    one-time compile, before anything exists to resume from).
    Returns (rc, peak_rss_mb, wall_s, stdout_lines)."""
    t0 = time.perf_counter()
    p = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO)
    peak = 0.0
    killed = False
    ckpt_seen_at = None
    out_lines = []
    import threading

    def drain():
        for line in p.stdout:
            out_lines.append(line.rstrip())

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    while p.poll() is None:
        rss = _rss_mb(p.pid)
        if rss:
            peak = max(peak, rss)
        if kill_after_ckpt and not killed:
            ckpt, delay = kill_after_ckpt
            if ckpt_seen_at is None and os.path.exists(ckpt):
                ckpt_seen_at = time.perf_counter()
            if ckpt_seen_at is not None and time.perf_counter() - ckpt_seen_at > delay:
                p.send_signal(signal.SIGKILL)
                killed = True
        time.sleep(0.25)
    th.join(timeout=5)
    return p.returncode, peak, time.perf_counter() - t0, out_lines


def steady_fps(metrics_path):
    """Frames/s excluding the one-time compile: rate over the metric rows from
    the first chunk's completion timestamp onward (rows carry monotonic
    timestamps; rows within one chunk share the stamp written when that chunk
    COMPLETED — so frames counted are those strictly after ts[0], over the
    elapsed time from ts[0] to the last stamp)."""
    try:
        rows = [json.loads(l) for l in open(metrics_path)]
        ts = [r["t"] for r in rows if "t" in r]
        if len(ts) < 32:
            return None
        first = next(i for i, t in enumerate(ts) if t > ts[0])
        dt = ts[-1] - ts[0]
        return round((len(ts) - first) / dt, 2) if dt > 0 else None
    except (OSError, StopIteration, ValueError):
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2760)
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--dataset", default="kitti", choices=("kitti", "malaga", "parking"))
    ap.add_argument("--data-root", default=None,
                    help="data_root holding the dataset folder (default: <repo>/datasets)")
    ap.add_argument("--mode", default="sift-sift")
    ap.add_argument("--config", default=None,
                    help="YAML preset passed through to the CLI (e.g. "
                         "configs/turn_robust.yaml); --mode/--ba flags override it")
    ap.add_argument("--no-ba", action="store_true", help="disable sliding-window BA "
                    "(BASELINE config 1: KLT + P3P only — the parking preset)")
    ap.add_argument("--tag", default=None,
                    help="artifact suffix: REPLAY_r{N}_{tag}.json (default: dataset name)")
    ap.add_argument("--kill-resume", action="store_true",
                    help="also rehearse SIGKILL mid-replay + --resume (runs the "
                         "replay twice more)")
    ap.add_argument("--kill-after", type=float, default=20.0,
                    help="seconds after run B's first checkpoint appears to SIGKILL")
    args = ap.parse_args()

    tag = args.tag or args.dataset
    ba = not args.no_ba
    runs = os.path.join(REPO, "runs")
    os.makedirs(runs, exist_ok=True)
    out_a = os.path.join(runs, f"replay_{tag}_a")
    out_b = os.path.join(runs, f"replay_{tag}_b")
    # a leftover checkpoint from a prior invocation would start run B's kill
    # timer immediately (SIGKILL during compile) and make the resume restore
    # STALE state — always start from clean output dirs (ADVICE r3)
    import shutil

    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)

    def cli(out, extra=()):
        return _cli_args(out, args.frames, dataset=args.dataset,
                         data_root=args.data_root, mode=args.mode, ba=ba,
                         config=args.config, extra=extra)

    # --- run A: uninterrupted full replay, RSS-sampled ---
    rc, peak_a, wall_a, lines = run_sampled(cli(out_a))
    if rc != 0:
        print("\n".join(lines[-30:]))
        raise SystemExit(f"replay A failed rc={rc}")
    summary = json.loads(lines[-1])

    report = {
        "metric": f"full_scale_replay_{tag}",
        "frames": args.frames,
        "mode": f"{args.mode}{'+ba' if ba else ''}"
                + (f" [{os.path.basename(args.config)}]" if args.config else "")
                + ", chunked streaming, checkpoint-every 512",
        "dataset": args.dataset,
        "data_root": args.data_root,
        "wall_s": round(wall_a, 1),
        "frames_per_s": round(summary.get("frames", 0) / wall_a, 2),
        "frames_per_s_steady": steady_fps(os.path.join(out_a, "metrics.jsonl")),
        "ate_rmse_m": summary.get("ate_rmse_m"),
        # GPS-only GT (Malaga) carries no rotations: the CLI emits the
        # position-based equivalents + explicit "n/a (GPS GT)" rotation fields
        # instead of nulls (VERDICT r4 #4)
        "rpe_trans_rmse_m": summary.get(
            "rpe_trans_rmse_m",
            f"position-based rpe_rmse_m={summary.get('rpe_rmse_m')} (GPS GT)"),
        "rpe_rot_rmse_deg": summary.get("rpe_rot_rmse_deg"),
        "kitti_t_err_pct": summary.get(
            "kitti_t_err_pct",
            f"position-based kitti_t_err_pct_pos={summary.get('kitti_t_err_pct_pos')}"),
        "kitti_r_err_deg_per_m": summary.get("kitti_r_err_deg_per_m"),
        # worst per-50-frame segment scale deviation (VERDICT r4 #2): the
        # scale-decay spiral's signature, surfaced in every replay artifact
        "seg_scale_min": summary.get("seg_scale_min"),
        "seg_scale_max": summary.get("seg_scale_max"),
        "seg_scale_worst_log2": summary.get("seg_scale_worst"),
        "pose_ok_rate": summary.get("pose_ok_rate"),
        "n_rebootstraps": summary.get("n_rebootstraps"),
        "peak_rss_mb": round(peak_a, 1),
        "rss_under_1gb": peak_a < 1024.0,
        # the pipeline stages O(chunk) frames; the remainder of RSS is the
        # axon tunnel client retaining ~1x the bytes of every H2D transfer
        # (reproducible probe: benchmarks/probe_tunnel_rss.py; BASELINE.md
        # round 3/4). uint8 ingest cuts it 4x.
        "rss_note": "tunnel client retains ~bytes-transferred; pipeline stages O(chunk)",
        "cli_summary": summary,
    }

    # --- optional: kill mid-replay (after its first checkpoint lands), resume ---
    if args.kill_resume:
        ck = os.path.join(out_b, "checkpoint.npz")
        rc_b, peak_b, wall_b, lines_b = run_sampled(
            cli(out_b), kill_after_ckpt=(ck, args.kill_after)
        )
        resumed = False
        resume_match = None
        if os.path.exists(ck):
            rc_r, peak_r, wall_r, lines_r = run_sampled(
                cli(out_b, extra=("--resume", ck))
            )
            if rc_r == 0:
                resumed = True
                tr_a = np.load(os.path.join(out_a, "trajectory.npz"))["positions"]
                tr_b = np.load(os.path.join(out_b, "trajectory.npz"))["positions"]
                resume_match = bool(
                    tr_a.shape == tr_b.shape
                    and np.allclose(tr_a, tr_b, atol=1e-3)
                )
                peak_b = max(peak_b, peak_r)
            else:
                print("\n".join(lines_r[-30:]))
        report["kill_resume"] = {
            "killed_s_after_first_checkpoint": args.kill_after,
            "resumed": resumed,
            "trajectory_matches_uninterrupted": resume_match,
            "peak_rss_mb": round(peak_b, 1),
        }

    path = os.path.join(REPO, f"REPLAY_r{args.round:02d}_{tag}.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
