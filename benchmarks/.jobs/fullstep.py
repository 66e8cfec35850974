import time, numpy as np, jax
from lcvo_tpu.config import load_config
from lcvo_tpu.data.synthetic import make_intrinsics
from lcvo_tpu.core import state as st
from lcvo_tpu.pipeline import make_process_frame

W, H = 1240, 376
cfg = load_config(overrides={"image_width": W, "image_height": H})
K = make_intrinsics(W, H)
fn = jax.jit(make_process_frame(cfg, K), donate_argnums=(0,))
state = st.make_vo_state(cfg, (H, W))
rng = np.random.default_rng(0)
# populate plausible state so all paths do real work
nt, nc = cfg.state.max_tracks, cfg.state.max_candidates
P = rng.uniform([20, 20], [W - 20, H - 20], (nt, 2)).astype(np.float32)
X = np.concatenate([(P - [W / 2, H / 2]) / K[0, 0] * 15.0, np.full((nt, 1), 15.0)], 1).astype(np.float32)
C = rng.uniform([20, 20], [W - 20, H - 20], (nc, 2)).astype(np.float32)
state = state._replace(
    tracks=state.tracks._replace(P=jax.numpy.asarray(P), X=jax.numpy.asarray(X), valid=state.tracks.valid | True),
    cands=state.cands._replace(C=jax.numpy.asarray(C), F=jax.numpy.asarray(C), valid=state.cands.valid | True),
    prev_image=jax.numpy.asarray(rng.uniform(0, 255, (H, W)), jax.numpy.float32),
)
from lcvo_tpu.ops.pyramid import build_pyramid
state = state._replace(prev_pyramid=jax.jit(lambda im: build_pyramid(im, cfg.klt.levels))(state.prev_image))
img = jax.numpy.asarray(rng.uniform(0, 255, (H, W)), jax.numpy.float32)
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
s2, res = fn(state, img, key)
jax.block_until_ready(res)
print("process_frame compile+1", round(time.perf_counter() - t0, 1))
t0 = time.perf_counter()
n = 20
for _ in range(n):
    s2, res = fn(s2, img, key)
jax.block_until_ready(res)
dt = (time.perf_counter() - t0) / n
print("process_frame run ms", round(dt * 1000, 2), " -> fps", round(1 / dt, 1))
