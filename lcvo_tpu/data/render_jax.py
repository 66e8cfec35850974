"""JAX port of the corridor renderer — fast synthetic-sequence generation.

``lcvo_tpu.data.synthetic`` renders on the host in numpy (~1 s/frame at KITTI
resolution), fine for short test fixtures but not for full-length replays (the
reference's KITTI 05 run is 2,760 frames, ``README.md:16``). This module renders
the SAME corridor world as a jitted elementwise program — milliseconds per frame
on an accelerator — for generating full-scale on-disk replay datasets
(benchmarks/make_replay_dataset.py).

The integer lattice hash matches ``synthetic._hash2`` exactly (uint32 wrapping
arithmetic ≡ the numpy uint64-then-mask formulation); interpolation runs in f32
rather than f64, a sub-1% intensity difference that leaves the dataset fully
self-consistent with its exact ground-truth poses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lcvo_tpu.data.synthetic import CorridorWorld


def _hash2(xi, yi, seed: int):
    """uint32 lattice hash → [0, 1); bit-exact vs synthetic._hash2."""
    h = (
        xi.astype(jnp.uint32) * jnp.uint32(374761393)
        + yi.astype(jnp.uint32) * jnp.uint32(668265263)
        + jnp.uint32((seed % (1 << 32)) * 40503 & 0xFFFFFFFF)
    )
    h = (h ^ (h >> jnp.uint32(13))) * jnp.uint32(1274126177)
    h = h ^ (h >> jnp.uint32(16))
    return (h & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / jnp.float32(0x1000000)


def _value_noise(u, v, seed: int, octaves: int = 4, base_freq: float = 1.0):
    out = jnp.zeros_like(u)
    amp_total = 0.0
    for k in range(octaves):
        f = base_freq * (2.0 ** k)
        amp = 0.6 ** k
        x = u * f
        y = v * f
        xi = jnp.floor(x)
        yi = jnp.floor(y)
        fx = x - xi
        fy = y - yi
        sx = fx * fx * (3 - 2 * fx)
        sy = fy * fy * (3 - 2 * fy)
        xi = xi.astype(jnp.int32)
        yi = yi.astype(jnp.int32)
        a = _hash2(xi, yi, seed + k)
        b = _hash2(xi + 1, yi, seed + k)
        c = _hash2(xi, yi + 1, seed + k)
        d = _hash2(xi + 1, yi + 1, seed + k)
        out = out + amp * ((a * (1 - sx) + b * sx) * (1 - sy) + (c * (1 - sx) + d * sx) * sy)
        amp_total += amp
    return out / amp_total


@partial(jax.jit, static_argnames=("H", "W", "ground_y", "half_width", "end_z", "seed"))
def render_frame(R_wc, cam, Kinv, H: int, W: int, ground_y: float = 1.6,
                 half_width: float = 6.0, end_z: float = 400.0, seed: int = 7):
    """Render one (H, W) grayscale frame of the corridor world, uint8.

    Same geometry/texture as ``synthetic.SyntheticSequence.frame`` (ground plane,
    two walls, far wall, multi-octave value noise, depth attenuation).
    """
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                        jnp.arange(H, dtype=jnp.float32) + 0.5)
    rays = jnp.stack([u, v, jnp.ones_like(u)], axis=-1) @ Kinv.T
    d = rays @ R_wc.T
    eps = 1e-9

    def plane_hit(t_hit, mask_extra, uu, vv, sd, shade):
        t_hit = jnp.where((t_hit > 0.1) & mask_extra, t_hit, jnp.inf)
        tex = _value_noise(uu, vv, sd, octaves=4, base_freq=1.7) * 0.75 + 0.25
        return t_hit, tex * shade

    hits, texs = [], []
    dy = jnp.where(jnp.abs(d[..., 1]) > eps, d[..., 1], eps)
    ty = (ground_y - cam[1]) / dy
    gx = cam[0] + ty * d[..., 0]
    gz = cam[2] + ty * d[..., 2]
    t_hit, tex = plane_hit(ty, jnp.ones_like(ty, bool), gx, gz, seed, 1.0)
    hits.append(t_hit)
    texs.append(tex)
    dx = jnp.where(jnp.abs(d[..., 0]) > eps, d[..., 0], eps)
    for sgn, sd in ((-1.0, seed + 101), (1.0, seed + 202)):
        tx = (sgn * half_width - cam[0]) / dx
        wy = cam[1] + tx * d[..., 1]
        wz = cam[2] + tx * d[..., 2]
        t_hit, tex = plane_hit(tx, wy < ground_y, wz, wy, sd, 0.85)
        hits.append(t_hit)
        texs.append(tex)
    dz = jnp.where(jnp.abs(d[..., 2]) > eps, d[..., 2], eps)
    tz = (end_z - cam[2]) / dz
    fx = cam[0] + tz * d[..., 0]
    fy = cam[1] + tz * d[..., 1]
    t_hit, tex = plane_hit(tz, jnp.ones_like(tz, bool), fx, fy, seed + 303, 0.7)
    hits.append(t_hit)
    texs.append(tex)

    hits = jnp.stack(hits)
    texs = jnp.stack(texs)
    best = jnp.argmin(hits, axis=0)
    img = jnp.take_along_axis(texs, best[None], axis=0)[0]
    depth = jnp.take_along_axis(hits, best[None], axis=0)[0]
    depth = jnp.where(jnp.isfinite(depth), depth, end_z)
    img = img * (1.0 / (1.0 + 0.002 * depth))
    return jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("H", "W", "ground_y", "x_lo", "x_hi", "z_lo",
                                   "z_hi", "seed"))
def render_frame_arena(R_wc, cam, Kinv, H: int, W: int, ground_y: float,
                       x_lo: float, x_hi: float, z_lo: float, z_hi: float,
                       seed: int = 7, occ=None):
    """Render one uint8 frame of an :class:`~lcvo_tpu.data.synthetic.ArenaWorld`:
    ground plane + four axis-aligned walls. The closed room means every ray hits
    textured geometry in any heading — required for loop trajectories with
    sustained 90° turns (the corridor's open ends would show void mid-turn).
    Same lattice-hash texture and depth attenuation as :func:`render_frame`.

    ``occ``: optional independently-moving textured billboard (static-world
    violation, the arena analog of ``synthetic.SyntheticSequence(occluder=True)``):
    a dict of traced arrays ``{"q": (3,) center, "right": (3,), "up": (3,),
    "normal": (3,), "uoff": ()}`` — a 2x1.5 m quad at ``q`` spanned by
    right/up, texture drifting by ``uoff`` (so tracks on it see independent
    motion and must be rejected by RANSAC)."""
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                        jnp.arange(H, dtype=jnp.float32) + 0.5)
    rays = jnp.stack([u, v, jnp.ones_like(u)], axis=-1) @ Kinv.T
    d = rays @ R_wc.T
    eps = 1e-9

    def plane_hit(t_hit, mask_extra, uu, vv, sd, shade):
        t_hit = jnp.where((t_hit > 0.1) & mask_extra, t_hit, jnp.inf)
        tex = _value_noise(uu, vv, sd, octaves=4, base_freq=1.7) * 0.75 + 0.25
        return t_hit, tex * shade

    hits, texs = [], []
    dy = jnp.where(jnp.abs(d[..., 1]) > eps, d[..., 1], eps)
    ty = (ground_y - cam[1]) / dy
    gx = cam[0] + ty * d[..., 0]
    gz = cam[2] + ty * d[..., 2]
    t_hit, tex = plane_hit(ty, jnp.ones_like(ty, bool), gx, gz, seed, 1.0)
    hits.append(t_hit)
    texs.append(tex)
    dx = jnp.where(jnp.abs(d[..., 0]) > eps, d[..., 0], eps)
    for wall_x, sd in ((x_lo, seed + 101), (x_hi, seed + 202)):
        tx = (wall_x - cam[0]) / dx
        wy = cam[1] + tx * d[..., 1]
        wz = cam[2] + tx * d[..., 2]
        t_hit, tex = plane_hit(tx, wy < ground_y, wz, wy, sd, 0.85)
        hits.append(t_hit)
        texs.append(tex)
    dz = jnp.where(jnp.abs(d[..., 2]) > eps, d[..., 2], eps)
    for wall_z, sd in ((z_lo, seed + 303), (z_hi, seed + 404)):
        tz = (wall_z - cam[2]) / dz
        wx = cam[0] + tz * d[..., 0]
        wy = cam[1] + tz * d[..., 1]
        t_hit, tex = plane_hit(tz, wy < ground_y, wx, wy, sd, 0.78)
        hits.append(t_hit)
        texs.append(tex)

    if occ is not None:
        q, rt, up, nq = occ["q"], occ["right"], occ["up"], occ["normal"]
        dn = jnp.einsum("hwc,c->hw", d, nq)
        dn = jnp.where(jnp.abs(dn) > eps, dn, eps)
        tq = jnp.dot(q - cam, nq) / dn
        h3 = cam[None, None, :] + tq[..., None] * d
        hu = jnp.einsum("hwc,c->hw", h3 - q[None, None, :], rt)
        hv = jnp.einsum("hwc,c->hw", h3 - q[None, None, :], up)
        on_quad = (jnp.abs(hu) < 1.0) & (hv > -0.75) & (hv < 0.75)
        t_hit, tex = plane_hit(tq, on_quad, hu + occ["uoff"], hv, seed + 505, 0.95)
        hits.append(t_hit)
        texs.append(tex)

    hits = jnp.stack(hits)
    texs = jnp.stack(texs)
    best = jnp.argmin(hits, axis=0)
    img = jnp.take_along_axis(texs, best[None], axis=0)[0]
    depth = jnp.take_along_axis(hits, best[None], axis=0)[0]
    depth = jnp.where(jnp.isfinite(depth), depth, 1e4)
    img = img * (1.0 / (1.0 + 0.002 * depth))
    return jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)


class FastArenaRenderer:
    """Device-rendered arena sequence over an arbitrary trajectory, with exact
    host-side ground truth. The turn-rich counterpart of
    :class:`FastCorridorRenderer` — pass a (R_wc, t_wc) trajectory (e.g.
    ``synthetic.trajectory_loop``); the arena auto-sizes around it."""

    def __init__(self, trajectory: tuple, width: int, height: int,
                 K: np.ndarray | None = None, margin: float = 8.0, seed: int = 7,
                 occluder: bool = False):
        from lcvo_tpu.data.synthetic import ArenaWorld, make_intrinsics

        self.R_wc, self.t_wc = trajectory
        self.n_frames = len(self.R_wc)
        self.W, self.H = width, height
        self.world = ArenaWorld.around(self.t_wc, margin=margin, seed=seed)
        self.K = make_intrinsics(width, height) if K is None else np.asarray(K, np.float64)
        self._Kinv = jnp.asarray(np.linalg.inv(self.K), jnp.float32)
        self.occluder = occluder

    def _occ(self, i: int):
        """Billboard 12 m ahead along the current heading, sweeping laterally
        (independent motion) with drifting texture — always in view regardless
        of where the loop trajectory points."""
        R, cam = self.R_wc[i], self.t_wc[i]
        fwd, right = R[:, 2], R[:, 0]
        up = np.array([0.0, -1.0, 0.0])
        x_q = -3.0 + 0.12 * (i % 50)
        q = cam + fwd * 12.0 + right * x_q + np.array([0.0, -0.4, 0.0])
        return {
            "q": jnp.asarray(q, jnp.float32),
            "right": jnp.asarray(right, jnp.float32),
            "up": jnp.asarray(up, jnp.float32),
            "normal": jnp.asarray(fwd, jnp.float32),
            "uoff": jnp.float32(0.04 * i),
        }

    def frame(self, i: int) -> np.ndarray:
        w = self.world
        out = render_frame_arena(
            jnp.asarray(self.R_wc[i], jnp.float32), jnp.asarray(self.t_wc[i], jnp.float32),
            self._Kinv, self.H, self.W, ground_y=w.ground_y,
            x_lo=w.x_lo, x_hi=w.x_hi, z_lo=w.z_lo, z_hi=w.z_hi, seed=w.seed,
            occ=self._occ(i) if self.occluder else None,
        )
        return np.asarray(out)

    def gt_pose_rows(self) -> np.ndarray:
        P = np.concatenate([self.R_wc, self.t_wc[:, :, None]], axis=2)
        return P.reshape(self.n_frames, 12)

    def gt_positions(self) -> np.ndarray:
        return self.t_wc.copy()


class FastCorridorRenderer:
    """Device-rendered corridor sequence with exact host-side ground truth."""

    def __init__(self, n_frames: int, width: int, height: int, speed: float = 0.35,
                 world: CorridorWorld | None = None, K: np.ndarray | None = None):
        from lcvo_tpu.data.synthetic import make_intrinsics, trajectory_forward

        self.n_frames = n_frames
        self.W, self.H = width, height
        # push the far wall beyond the full trajectory (the short-fixture default
        # of 400 m would be reached after ~1,100 frames at 0.35 m/frame)
        far = max(400.0, n_frames * speed + 500.0)
        self.world = world or CorridorWorld(end_z=far)
        self.K = make_intrinsics(width, height) if K is None else K
        self.R_wc, self.t_wc = trajectory_forward(n_frames, speed=speed)
        self._Kinv = jnp.asarray(np.linalg.inv(self.K), jnp.float32)

    def frame(self, i: int) -> np.ndarray:
        w = self.world
        out = render_frame(
            jnp.asarray(self.R_wc[i], jnp.float32), jnp.asarray(self.t_wc[i], jnp.float32),
            self._Kinv, self.H, self.W,
            ground_y=w.ground_y, half_width=w.half_width, end_z=w.end_z, seed=w.seed,
        )
        return np.asarray(out)

    def gt_pose_rows(self) -> np.ndarray:
        """(N, 12) KITTI pose-file rows: flattened cam→world [R|t]."""
        P = np.concatenate([self.R_wc, self.t_wc[:, :, None]], axis=2)
        return P.reshape(self.n_frames, 12)

    def gt_positions(self) -> np.ndarray:
        """(N, 3) camera positions in world frame (same API as SyntheticSequence)."""
        return self.t_wc.copy()
