"""Checkpoint / resume of the Markovian VO state.

The reference has no state persistence — its only artifacts are periodic plots
(``src/main.py:264-277``). Here the full fixed-shape state pytree (track tables,
candidates, pose, pyramid, health, optional BA window) serializes to one ``.npz``:
long replays resume mid-sequence, and a crashed run restarts from its last
checkpoint (SURVEY §5 checkpoint/resume).

Plain npz rather than orbax: the state is a few MB of dense arrays, single-host;
orbax's async/multihost machinery buys nothing at this size. The on-disk format is
path-keyed leaves, so it round-trips any pytree with stable structure.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, state, window=None, trajectory=None, frame_idx: int | None = None, rng_key=None, poses=None, pose_ok_flags=None, extras: dict | None = None):
    """Serialize VO state (+ optional BA window, host-side trajectory and full
    4x4 poses, and the driver's RNG key — needed for bit-exact resume) to npz.
    ``extras``: small host-side scalars (e.g. the recovery counter) stored as
    ``extra:<name>`` keys."""
    payload = {f"state:{k}": v for k, v in _flatten(state).items()}
    for k, v in (extras or {}).items():
        payload[f"extra:{k}"] = np.asarray(v)
    if window is not None:
        payload.update({f"window:{k}": v for k, v in _flatten(window).items()})
    if trajectory is not None and len(trajectory):
        payload["trajectory"] = np.asarray(trajectory)
    if poses is not None and len(poses):
        payload["poses"] = np.asarray(poses)
    if pose_ok_flags is not None and len(pose_ok_flags):
        payload["pose_ok_flags"] = np.asarray(pose_ok_flags, bool)
    if frame_idx is not None:
        payload["frame_idx_host"] = np.asarray(frame_idx)
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    # ATOMIC write: a SIGKILL mid-write must never leave a truncated archive at
    # the checkpoint path (measured: the round-5 kill-resume rehearsal landed a
    # SIGKILL during np.savez and the resume died on BadZipFile). Write to a
    # temp file in the same directory, fsync, then rename — os.replace is
    # atomic on POSIX, so the path always holds either the old or the new
    # complete checkpoint.
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **payload)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template, window_template=None):
    """Restore (state, window, trajectory, frame_idx) from npz.

    Templates supply the pytree STRUCTURE (e.g. ``make_vo_state(cfg, shape)``);
    leaves are filled from the file and must match shapes exactly.
    """
    data = np.load(path, allow_pickle=False)

    def restore(tree, prefix):
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for pth, leaf in leaves_paths:
            key = prefix + "/".join(str(p) for p in pth)
            arr = data[key]
            if arr.shape != tuple(np.shape(leaf)):
                raise ValueError(f"checkpoint leaf {key}: shape {arr.shape} != template {np.shape(leaf)}")
            new_leaves.append(jnp.asarray(arr))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    state = restore(state_template, "state:")
    window = restore(window_template, "window:") if window_template is not None else None
    trajectory = [p for p in data["trajectory"]] if "trajectory" in data else []
    frame_idx = int(data["frame_idx_host"]) if "frame_idx_host" in data else None
    rng_key = jnp.asarray(data["rng_key"]) if "rng_key" in data else None
    poses = [p for p in data["poses"]] if "poses" in data else None
    flags = [bool(f) for f in data["pose_ok_flags"]] if "pose_ok_flags" in data else None
    extras = {k[len("extra:"):]: data[k] for k in data.files if k.startswith("extra:")}
    return state, window, trajectory, frame_idx, rng_key, poses, flags, extras
