"""Worker for the 2-process ``jax.distributed`` test (run via subprocess, not pytest).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices across the
process boundary (DCN analog). The sharded BA solve then exercises real
cross-process collectives (Gloo) through the exact production code path
(``lcvo_tpu.parallel.mesh.init_distributed`` + ``solve.ba.sharded``).

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
"""

import sys

import os

import jax

jax.config.update("jax_platforms", "cpu")
# share the repo's persistent compile cache (see tests/conftest.py): the
# sharded-BA compile dominates this worker's wall time on repeat runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from lcvo_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == nproc * len(jax.local_devices())
    mesh = make_mesh(axis_names=("data",))

    # identical seeded scene on every process (global-semantics inputs)
    from lcvo_tpu.solve.ba.schur import BAProblem, ba_solve
    from lcvo_tpu.solve.ba.sharded import ba_solve_sharded

    rng = np.random.default_rng(0)
    W, K, fx = 6, 64, 500.0
    X = rng.uniform([-4, -2, 6], [4, 2, 14], (K, 3))
    Rs, ts, obs = [], [], []
    for w in range(W):
        ang = 0.02 * w
        Rw = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.4 * w, 0.0, 0.0])
        t = -Rw @ c
        p = (Rw @ X.T).T + t
        xy = p[:, :2] / p[:, 2:3] + rng.normal(0, 0.3 / fx, (K, 2))
        Rs.append(Rw)
        ts.append(t)
        obs.append(xy)
    R0 = np.stack(Rs).astype(np.float32)
    t0 = np.stack(ts).astype(np.float32)
    obs = np.stack(obs).astype(np.float32)
    mask = np.ones((W, K), bool)
    X0 = (X + rng.normal(0, 0.05, X.shape)).astype(np.float32)
    Rp = R0.copy()
    tp = t0 + rng.normal(0, 0.01, t0.shape).astype(np.float32)
    tp[:2] = t0[:2]  # keep the gauge-fixed cameras exact
    prob = BAProblem(R=Rp, t=tp.astype(np.float32), X=X0, obs=obs, mask=mask)

    res_sh = ba_solve_sharded(prob, mesh, iters=5, n_fix=2)
    res_1d = ba_solve(prob, iters=5, n_fix=2)

    # replicated outputs must match the single-device solve on every process
    np.testing.assert_allclose(np.asarray(res_sh.R), np.asarray(res_1d.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_sh.t), np.asarray(res_1d.t), atol=1e-5)
    assert float(res_sh.cost) <= float(res_sh.cost0)
    np.testing.assert_allclose(float(res_sh.cost), float(res_1d.cost), rtol=1e-4)

    # landmark shards: each process checks its addressable slice
    X_sh = res_sh.X
    for s in X_sh.addressable_shards:
        lo = s.index[0].start or 0
        np.testing.assert_allclose(
            np.asarray(s.data), np.asarray(res_1d.X)[lo : lo + s.data.shape[0]], atol=1e-4
        )

    # one explicit cross-process collective through the production mesh helpers
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    ones = jax.device_put(np.ones((n_global,), np.float32), NamedSharding(mesh, P("data")))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(ones)
    assert float(total) == float(n_global)

    print(f"MULTIPROC-OK pid={pid} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()
