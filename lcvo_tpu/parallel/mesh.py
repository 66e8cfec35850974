"""Device mesh construction, sharding specs and collective helpers.

The reference is strictly single-process with no comm backend (SURVEY §2.3). The
TPU-native scale-out story (BASELINE.json config 5) has two axes:

- **stream parallelism (DP)**: independent VO streams (sequence replays / camera
  feeds) sharded over devices — every per-frame kernel is batched over the stream dim
  and each device runs its own streams; metrics reduce with ``psum`` over ICI.
- **map/window sharding for BA**: landmark blocks of the sliding-window bundle
  adjustment partitioned over devices, reduced camera system assembled via ``psum``
  (see :mod:`lcvo_tpu.solve.ba`).

Multi-host entry: ``jax.distributed.initialize`` + the same mesh helpers — the mesh
axes ('host', 'chip') map DCN × ICI. In CI all of this runs on a virtual 8-device CPU
mesh (tests/conftest.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: tuple = ("data",), shape: tuple | None = None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    For multi-host runs call :func:`init_distributed` first; devices then span hosts
    and the leading mesh axis should be the DCN (host) axis.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def mesh_from_config(cfg) -> Mesh:
    """Mesh from ``cfg.runtime``: ``mesh_shape`` (empty = all local devices on the
    first axis) laid out over ``mesh_axes``."""
    rt = cfg.runtime
    shape = tuple(rt.mesh_shape) or None
    n = int(np.prod(shape)) if shape else None
    return make_mesh(n_devices=n, axis_names=tuple(rt.mesh_axes), shape=shape)


def init_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host bring-up (``jax.distributed.initialize``). No-op when single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def stream_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading dim is the stream/batch dim."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batched_state(state_pytree, mesh: Mesh, axis: str = "data"):
    """Place a batched (leading stream dim) VO-state pytree with the leading dim
    sharded over ``axis``; scalars replicated."""
    sh = stream_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == mesh.shape[axis] * (x.shape[0] // mesh.shape[axis]) and x.shape[0] > 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, state_pytree)
