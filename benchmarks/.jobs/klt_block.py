import time, numpy as np, jax, jax.numpy as jnp
from lcvo_tpu.ops.pyramid import build_pyramid
from lcvo_tpu.ops.klt import pyramidal_klt

W, H = 1240, 376
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
t0 = time.perf_counter()
pyr = jax.jit(lambda im: build_pyramid(im, 3))(img)
jax.block_until_ready(pyr)
print("pyramid compile+1", round(time.perf_counter() - t0, 1))
N = 2560
pts = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20], (N, 2)), jnp.float32)
f = jax.jit(lambda a, b, p: pyramidal_klt(a, b, p, window=21, iters=10))
t0 = time.perf_counter()
jax.block_until_ready(f(pyr, pyr, pts))
print("klt compile+1", round(time.perf_counter() - t0, 1))
t0 = time.perf_counter()
for _ in range(20):
    out = f(pyr, pyr, pts)
jax.block_until_ready(out)
print("klt run ms", round((time.perf_counter() - t0) / 20 * 1000, 2))
