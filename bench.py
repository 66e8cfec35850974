"""Headline benchmark: VO frames/s at KITTI resolution on one chip, all modes.

Baseline: the reference's per-frame OpenCV kernel sequence measured on this image's
CPU via benchmarks/reference_cpu.py (BASELINE.md): sift-sift 9.45 fps (its selected
mode, report §3.1), shi 59.3 fps, sift-mask 12.63 fps. North star (BASELINE.json):
>=5x the selected mode -> 47.2 frames/s.

The headline metric is the MODE-MATCHED comparison: our sift-sift throughput vs the
reference's selected sift-sift mode. Also measured into the same JSON line: the
other two reference candidate modes, the BA-enabled pipeline, the reference-matched
operating point (configs/reference.yaml: 5-point + SIFT init + 21x21/10 KLT), and
single-frame LATENCY (one dispatch + host readback per frame — the reference's
"viable in real-time" framing is a latency claim, report §3.2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "modes",
"baseline_fps", "mode_vs_baseline", "latency_ms_per_frame"}.

``--quality``: TPU-path quality smoke instead — e2e ATE (sift-sift + shi-mask,
100+ frames through the chunked scan) plus KLT/SIFT golden deltas against the CPU
exact paths (the ``approx_max_k`` top-k and Pallas block extraction run ONLY on
TPU backends, so CPU CI never sees them — this is their regression gate; VERDICT
r2 #3). One JSON line with explicit bounds and an overall "ok".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# BASELINE.md: reference surrogate fps on this image's CPU, per candidate mode
REF_FPS = {
    "sift-sift": 9.45,
    "shi-mask": 59.3,
    "sift-mask": 12.63,
    # the reference has no BA; its comparable mode is plain shi
    "shi-mask+ba": 59.3,
    # reference-preset is our pipeline AT the reference's sift-sift operating point
    "reference-preset": 9.45,
    # the round-5 flagship accuracy config (sift-sift + anchor refinement +
    # newest-gauge window BA); reference comparable mode is its selected sift-sift
    "turn-robust": 9.45,
}

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_DIR, "benchmarks", ".frame_cache.npz")
_TURN_CACHE = os.path.join(_DIR, "benchmarks", ".turn_cache.npz")


def _turn_frames(n_frames, W, H):
    """KITTI-res arena-loop frames with two sustained 90° turns (2°/frame) AND a
    moving occluder — the turn/occluder stress profile of the reference's KITTI
    05 envelope (VERDICT r3 #6), cached on disk as uint8. The cache records a
    fingerprint of every render parameter; changing the trajectory or renderer
    knobs invalidates it instead of silently mismatching the fresh ground truth
    (ADVICE r4)."""
    from lcvo_tpu.data.render_jax import FastArenaRenderer
    from lcvo_tpu.data.synthetic import trajectory_loop

    params = dict(speed=0.35, straight_frames=100, turn_frames=45, occluder=1, seed=7)
    fp = np.asarray([params[k] for k in sorted(params)], np.float64)
    traj = trajectory_loop(n_frames, speed=params["speed"],
                           straight_frames=params["straight_frames"],
                           turn_frames=params["turn_frames"])
    seq = FastArenaRenderer(traj, W, H, occluder=bool(params["occluder"]),
                            seed=params["seed"])
    if os.path.exists(_TURN_CACHE):
        d = np.load(_TURN_CACHE)
        if (
            d["frames"].shape[0] >= n_frames
            and d["frames"].shape[1:] == (H, W)
            and "fingerprint" in d
            and d["fingerprint"].shape == fp.shape
            and np.array_equal(d["fingerprint"], fp)
        ):
            return [f for f in d["frames"][:n_frames]], seq
    frames = np.stack([seq.frame(i) for i in range(n_frames)])
    np.savez_compressed(_TURN_CACHE, frames=frames, fingerprint=fp)
    return [f for f in frames], seq


def _frames(n_frames, W, H, speed=0.35):
    """Synthetic KITTI-res frames, cached on disk. Rendered with the jitted
    corridor renderer (ms/frame on the chip) so the measurement horizon can span
    100+ DISTINCT frames — every timed chunk sees new imagery, so the candidate
    and track tables keep churning as they do in a real sequence (VERDICT r2
    weak #8: the old 28-frame cache replayed one batch)."""
    from lcvo_tpu.data.render_jax import FastCorridorRenderer

    seq = FastCorridorRenderer(n_frames, W, H, speed=speed)
    fp = np.asarray([speed], np.float64)
    if os.path.exists(_CACHE):
        d = np.load(_CACHE)
        if (
            d["frames"].shape[0] >= n_frames
            and d["frames"].shape[1:] == (H, W)
            and "fingerprint" in d
            and np.array_equal(d["fingerprint"], fp)
        ):
            return [f.astype(np.float32) for f in d["frames"][:n_frames]], seq
    frames = np.stack([seq.frame(i) for i in range(n_frames)])
    np.savez_compressed(_CACHE, frames=frames, fingerprint=fp)
    return [f.astype(np.float32) for f in frames], seq


def _measure_mode(cfg, frames, K, chunk=16, n_chunks=6):
    """Steady-state frames/s of the compiled chunked scan for one config.

    Each chunk gets a DISTINCT pre-staged device batch (warmup chunk + n_chunks
    timed), so the measurement covers (n_chunks+1)*chunk unique frames of
    sequence progression, not one replayed batch."""
    import jax
    import jax.numpy as jnp

    from lcvo_tpu.pipeline import VisualOdometry

    vo = VisualOdometry(cfg, K)
    gap = cfg.bootstrap.frame_gap
    vo.bootstrap(frames[: gap + 1])
    chunk_fn = vo.make_chunk_step(chunk)
    pool = frames[gap + 1 :]
    batches = [
        jax.device_put(
            jnp.asarray(np.stack([pool[(c * chunk + j) % len(pool)] for j in range(chunk)]),
                        jnp.float32)
        )
        for c in range(n_chunks + 1)
    ]

    def run_chunk(carry, batch):
        keys = jax.random.split(vo._next_key(), chunk)
        carry, out = chunk_fn(carry, batch, keys)
        return carry, out

    def fence(carry):
        st_ = carry if hasattr(carry, "frame_idx") else carry[0]
        return float(st_.frame_idx)

    # warmup: compile. NOTE: the axon tunnel's block_until_ready does NOT wait for
    # remote completion — a host read of a value dependent on the whole chain is the
    # only reliable fence, so every timing below ends with a device_get.
    carry, _ = run_chunk(vo.chunk_carry(), batches[0])
    fence(carry)

    t0 = time.perf_counter()
    for c in range(n_chunks):
        carry, _ = run_chunk(carry, batches[c + 1])
    fence(carry)
    dt = time.perf_counter() - t0
    return n_chunks * chunk / dt


def _measure_latency(cfg, frames, K, n=24):
    """Single-frame latency: one process_frame dispatch per frame with a host
    readback of the pose each time (the online/real-time operating mode — no
    batching amortization). Returns mean ms/frame. NOTE: on the tunneled chip
    this includes the tunnel round trip (~15-20 ms), an upper bound on real
    host-attached latency."""
    import jax
    import jax.numpy as jnp

    from lcvo_tpu.pipeline import VisualOdometry

    vo = VisualOdometry(cfg, K)
    gap = cfg.bootstrap.frame_gap
    vo.bootstrap(frames[: gap + 1])
    imgs = [jnp.asarray(f, jnp.float32) for f in frames[gap + 1 :]]
    # warmup/compile
    res = vo.step(imgs[0])
    float(np.asarray(res.t[0]))
    t0 = time.perf_counter()
    for i in range(1, min(n + 1, len(imgs))):
        res = vo.step(imgs[i])
        float(np.asarray(res.t[0]))  # scalar fence: the pose IS the product
    dt = time.perf_counter() - t0
    return dt / min(n, len(imgs) - 1) * 1e3


def _measure_latency_device(cfg, frames, K, n=48):
    """DEVICE-ONLY per-frame latency of the single-dispatch step: an N-deep
    dependent chain of process_frame dispatches (state feeds state — no
    batching, no scan) fenced ONCE at the end, so the tunnel round trip is
    amortized to ~1/N per frame. This is the per-frame latency a host-attached
    deployment (PCIe, microsecond RTT) would see in the online operating mode —
    the number the reference's "viable in real-time" framing is about
    (report §3.2); ``_measure_latency`` bounds it from above with the full
    tunnel RTT included."""
    import jax
    import jax.numpy as jnp

    from lcvo_tpu.pipeline import VisualOdometry

    vo = VisualOdometry(cfg, K)
    gap = cfg.bootstrap.frame_gap
    vo.bootstrap(frames[: gap + 1])
    pool = frames[gap + 1 :]
    n = min(n, len(pool) - 1)
    imgs = [jax.device_put(jnp.asarray(pool[i], jnp.float32)) for i in range(n + 1)]
    keys = list(jax.random.split(vo._next_key(), n + 1))
    state = vo.state
    # warmup: compile + sync (also lands the staged images)
    state, res = vo._process(state, imgs[0], keys[0])
    float(np.asarray(res.t[0]))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        state, res = vo._process(state, imgs[i], keys[i])
    float(np.asarray(res.t[0]))  # one fence for the whole dependent chain
    dt = time.perf_counter() - t0
    return dt / n * 1e3


def _cfg_for(mode, W, H):
    from lcvo_tpu.config import load_config

    if mode == "reference-preset":
        return load_config(
            os.path.join(_DIR, "configs", "reference.yaml"),
            overrides={"image_width": W, "image_height": H},
        )
    if mode == "turn-robust":
        return load_config(
            os.path.join(_DIR, "configs", "turn_robust.yaml"),
            overrides={"image_width": W, "image_height": H},
        )
    ov = {"image_width": W, "image_height": H}
    if mode.endswith("+ba"):
        ov["find_new_candidates_method"] = mode[: -len("+ba")]
        ov["ba"] = {"enabled": True}
    else:
        ov["find_new_candidates_method"] = mode
    return load_config(overrides=ov)


def main():
    import jax

    # persistent compile cache: axon's first in-process compilation pays a ~200 s
    # compiler warmup; cached executables skip it on subsequent bench runs
    jax.config.update("jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if "--quality" in sys.argv:
        return quality()

    W, H = 1240, 376  # KITTI 05 resolution (reference src/main.py:14-29)
    frames, seq = _frames(128, W, H)
    K = seq.K

    modes = {}
    for mode in ("sift-sift", "shi-mask", "sift-mask", "shi-mask+ba",
                 "reference-preset", "turn-robust"):
        cfg = _cfg_for(mode, W, H)
        modes[mode] = round(_measure_mode(cfg, frames, K), 2)

    cfg_lat = _cfg_for("sift-sift", W, H)
    latency_ms = round(_measure_latency(cfg_lat, frames, K), 2)
    latency_dev_ms = round(_measure_latency_device(cfg_lat, frames, K), 2)

    fps = modes["sift-sift"]
    print(
        json.dumps(
            {
                "metric": "vo_frames_per_s_kitti_res_1chip_sift_sift",
                "value": fps,
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_FPS["sift-sift"], 2),
                "modes": modes,
                "baseline_fps": {m: REF_FPS[m] for m in modes},
                "mode_vs_baseline": {
                    m: round(v / REF_FPS[m], 2) for m, v in modes.items()
                },
                # tunnel: per-dispatch host readback INCLUDING the ~15-20 ms
                # axon tunnel round trip (upper bound); device: dependent-chain
                # measurement — the on-device per-frame latency a host-attached
                # deployment would see (the real-time number, report §3.2)
                "latency_ms_tunnel": latency_ms,
                "latency_ms_device": latency_dev_ms,
                "latency_ms_per_frame": latency_ms,  # back-compat alias (tunnel)
            }
        )
    )


# ---------------------------------------------------------------------------
# --quality: TPU-path regression smoke (VERDICT r2 #3)
# ---------------------------------------------------------------------------

_CPU_GOLDEN_SCRIPT = r"""
import os
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon; env var is ignored
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

inp = np.load(sys.argv[1])
from lcvo_tpu.ops.klt import pyramidal_klt
from lcvo_tpu.ops.pyramid import build_pyramid
from lcvo_tpu.frontend.sift import sift

p0 = build_pyramid(jnp.asarray(inp["img0"]), 3)
p1 = build_pyramid(jnp.asarray(inp["img1"]), 3)
pts, ok, _ = pyramidal_klt(p0, p1, jnp.asarray(inp["pts"]), window=15, iters=6)
f = sift(jnp.asarray(inp["img1"]), max_keypoints=1024)
np.savez(sys.argv[2], klt_pts=np.asarray(pts), klt_ok=np.asarray(ok),
         sift_pts=np.asarray(f.pts), sift_valid=np.asarray(f.valid))
"""


def quality():
    """TPU-path quality smoke: one JSON line, explicit bounds, overall ok flag."""
    import jax
    import jax.numpy as jnp

    from lcvo_tpu.frontend.sift import sift
    from lcvo_tpu.metrics import ate_rmse
    from lcvo_tpu.ops.klt import pyramidal_klt
    from lcvo_tpu.ops.pyramid import build_pyramid
    from lcvo_tpu.pipeline import VisualOdometry

    W, H = 1240, 376
    n = 110
    frames, seq = _frames(n, W, H)
    K = seq.K
    gap = 6
    backend = jax.default_backend()

    out = {"metric": "tpu_quality_smoke", "backend": backend, "frames": n}

    # --- e2e ATE through the chunked scan (exercises approx_max_k + Pallas).
    # reference-preset (configs/reference.yaml: 5-point + SIFT init + 21x21/10
    # KLT) is the PARITY configuration — the one whose trajectory answers "does
    # it match the reference?" — so it gets its own on-chip bound (VERDICT r4 #5)
    for mode in ("sift-sift", "shi-mask", "reference-preset"):
        vo = VisualOdometry(_cfg_for(mode, W, H), K)
        # 7 bootstrap + 6 full chunks: no ragged tail (a tail would compile the
        # per-frame step a second time just for a few frames)
        traj = vo.run_chunked(np.stack(frames[: 7 + 6 * 16]), chunk=16)
        gt = seq.gt_positions()[gap : gap + len(traj)]
        out[f"ate_{mode.replace('-', '_')}_m"] = round(
            ate_rmse(np.asarray(traj), gt[: len(traj)]), 4
        )

    # --- turn + occluder stress at KITTI res (VERDICT r3 #6): two sustained
    # 90° corners (2°/frame) + an independently moving billboard, ≥300 frames
    # through the chunked scan on the chip ---
    n_t = gap + 1 + 19 * 16  # bootstrap + 19 full chunks = 311
    frames_t, seq_t = _turn_frames(n_t, W, H)
    vo_t = VisualOdometry(_cfg_for("sift-sift", W, H), seq_t.K)
    traj_t = vo_t.run_chunked(np.stack(frames_t), chunk=16)
    gt_t = seq_t.gt_positions()[gap : gap + len(traj_t)]
    out["ate_turn_m"] = round(ate_rmse(np.asarray(traj_t), gt_t[: len(traj_t)]), 4)
    out["turn_rebootstraps"] = vo_t.n_rebootstraps
    # per-segment scale band (VERDICT r4 #2): the scale-decay spiral drives
    # per-50-frame scale far from 1.0 long before ATE explodes — gate the band
    # so scale drift fails loudly while it is still small
    from lcvo_tpu.metrics import segment_scale_stats

    seg = segment_scale_stats(
        np.asarray(traj_t), gt_t[: len(traj_t)],
        pose_ok=vo_t.pose_ok_flags[: len(traj_t)],
    )
    out["seg_scale_min"] = seg.get("seg_scale_min")
    out["seg_scale_max"] = seg.get("seg_scale_max")

    # --- flagship accuracy configuration (configs/turn_robust.yaml: anchor
    # re-triangulation + newest-gauge window BA) on the same turn sequence —
    # 3-seed band 0.22-0.35 m (round 5); the bound pins the configuration the
    # full-scale turn replay ships with
    vo_tr = VisualOdometry(_cfg_for("turn-robust", W, H), seq_t.K)
    traj_tr = vo_tr.run_chunked(np.stack(frames_t), chunk=16)
    out["ate_turn_robust_m"] = round(
        ate_rmse(np.asarray(traj_tr), gt_t[: len(traj_tr)]), 4
    )

    # --- golden deltas vs the CPU exact paths (subprocess forces cpu backend) ---
    img0, img1 = frames[10], frames[11]
    rng = np.random.default_rng(0)
    pts = rng.uniform([30, 30], [W - 30, H - 30], size=(512, 2)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "inp.npz")
        ref = os.path.join(td, "ref.npz")
        np.savez(inp, img0=img0, img1=img1, pts=pts)
        subprocess.run(
            [sys.executable, "-c", _CPU_GOLDEN_SCRIPT, inp, ref],
            check=True, cwd=_DIR, capture_output=True,
        )
        g = np.load(ref)

    p0 = build_pyramid(jnp.asarray(img0), 3)
    p1 = build_pyramid(jnp.asarray(img1), 3)
    tpts, tok, _ = pyramidal_klt(p0, p1, jnp.asarray(pts), window=15, iters=6)
    tpts, tok = np.asarray(tpts), np.asarray(tok)
    both = tok & g["klt_ok"]
    d = np.linalg.norm(tpts[both] - g["klt_pts"][both], axis=1)
    out["klt_common_tracks"] = int(both.sum())
    out["klt_p90_delta_px"] = round(float(np.percentile(d, 90)), 4) if both.any() else None

    f = sift(jnp.asarray(img1), max_keypoints=1024)
    sp = np.asarray(f.pts)[np.asarray(f.valid)]
    gp = g["sift_pts"][g["sift_valid"]]
    # recall: fraction of CPU-exact keypoints that a TPU keypoint lands within 2 px of
    dist = np.linalg.norm(gp[:, None, :] - sp[None, :, :], axis=-1).min(axis=1)
    out["sift_kp_cpu"] = int(len(gp))
    out["sift_kp_tpu"] = int(len(sp))
    out["sift_recall_2px"] = round(float((dist < 2.0).mean()), 4) if len(gp) else None

    bounds = {
        "ate_sift_sift_m": ("<", 0.5),
        "ate_shi_mask_m": ("<", 0.5),
        "ate_reference_preset_m": ("<", 0.5),
        # ~108 m path with two 90° corners + occluder; measured 1.28-1.88 m
        # across seeds WITH the depth/baseline triangulation gate (without it,
        # seed-dependent scale collapse to 4.4-10 m — benchmarks/diag_turn.py)
        "ate_turn_m": ("<", 2.5),
        # flagship config (turn_robust.yaml): 3-seed band 0.22-0.35 m
        "ate_turn_robust_m": ("<", 1.0),
        # normalized per-50-frame scale band: healthy turn runs sit well inside
        # [0.7, 1.4]; the collapse signature is 0.5 → 0.05 (VERDICT r4 #2)
        "seg_scale_min": (">", 0.65),
        "seg_scale_max": ("<", 1.55),
        "klt_p90_delta_px": ("<", 0.5),
        "sift_recall_2px": (">", 0.7),
    }
    ok = True
    fails = []
    for k, (op, b) in bounds.items():
        v = out.get(k)
        good = v is not None and ((v < b) if op == "<" else (v > b))
        if not good:
            ok = False
            fails.append(f"{k}={v} !{op} {b}")
    out["bounds"] = {k: f"{op}{b}" for k, (op, b) in bounds.items()}
    out["ok"] = ok
    if fails:
        out["failed"] = fails
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main() or 0)
