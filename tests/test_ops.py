import jax.numpy as jnp
import numpy as np

from lcvo_tpu.ops import harris, interp, klt, pyramid


def synth_texture(rng, H=128, W=192, smooth=1.5):
    img = rng.normal(size=(H, W)).astype(np.float32)
    img = np.asarray(pyramid.gaussian_blur(jnp.asarray(img), smooth)) * 50 + 128
    return img.astype(np.float32)


def test_pyramid_shapes():
    img = jnp.zeros((128, 192))
    pyr = pyramid.build_pyramid(img, 3)
    assert [p.shape for p in pyr] == [(128, 192), (64, 96), (32, 48)]


def test_bilinear_sample_exact_on_grid(rng):
    img = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
    ys = jnp.asarray([[3.0, 5.0]])
    xs = jnp.asarray([[2.0, 7.0]])
    s = interp.bilinear_sample(img, ys, xs)
    assert np.allclose(s, [[img[3, 2], img[5, 7]]], atol=1e-6)


def test_bilinear_sample_interpolates(rng):
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    s = interp.bilinear_sample(img, jnp.asarray([1.5]), jnp.asarray([1.5]))
    assert np.allclose(s, [(5 + 6 + 9 + 10) / 4.0], atol=1e-6)


def test_detect_corners_finds_checker_corners():
    # checkerboard: corners at every 16-px grid crossing
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W]
    img = (((yy // 16) + (xx // 16)) % 2).astype(np.float32) * 255
    pts, score, valid = harris.detect_corners(jnp.asarray(img), max_corners=100, border=4)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 10
    # every detected corner should be near a multiple-of-16 grid crossing
    d = np.abs((pts + 8) % 16 - 8)
    assert np.max(d) <= 3.5 and np.mean(d) < 2.5


def test_suppress_near_existing():
    pts = jnp.asarray([[10.0, 10.0], [50.0, 50.0]])
    valid = jnp.ones(2, bool)
    existing = jnp.asarray([[12.0, 11.0], [200.0, 200.0]])
    out = harris.suppress_near_existing(pts, valid, existing, jnp.ones(2, bool), 10.0)
    assert np.asarray(out).tolist() == [False, True]


def test_klt_tracks_pure_translation(rng):
    img = synth_texture(rng, 160, 224)
    shift = (3.4, -2.2)  # (dx, dy)
    # next frame = img shifted by (dx, dy): sample at (y - dy, x - dx)... build via interp
    yy, xx = np.mgrid[0:160, 0:224].astype(np.float32)
    nxt = np.asarray(interp.bilinear_sample(jnp.asarray(img), jnp.asarray(yy - shift[1]), jnp.asarray(xx - shift[0])))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(nxt), 3)
    pts = jnp.asarray(rng.uniform([40, 40], [180, 120], size=(64, 2)).astype(np.float32))
    new_pts, status, resid = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=10)
    ok = np.asarray(status)
    assert ok.mean() > 0.8
    err = np.asarray(new_pts)[ok] - (np.asarray(pts)[ok] + np.asarray(shift))
    assert np.percentile(np.abs(err), 90) < 0.25


def test_klt_large_motion_needs_pyramid(rng):
    img = synth_texture(rng, 192, 256, smooth=2.5)
    shift = (14.0, 9.0)
    yy, xx = np.mgrid[0:192, 0:256].astype(np.float32)
    nxt = np.asarray(interp.bilinear_sample(jnp.asarray(img), jnp.asarray(yy - shift[1]), jnp.asarray(xx - shift[0])))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 4)
    pyr1 = pyramid.build_pyramid(jnp.asarray(nxt), 4)
    pts = jnp.asarray(rng.uniform([60, 60], [200, 140], size=(48, 2)).astype(np.float32))
    new_pts, status, _ = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=15)
    ok = np.asarray(status)
    assert ok.mean() > 0.6
    err = np.asarray(new_pts)[ok] - (np.asarray(pts)[ok] + np.asarray(shift))
    assert np.percentile(np.abs(err), 80) < 0.5


def test_klt_bf16_iter_matches_f32(rng):
    """iter_dtype='bfloat16' (half the iteration loop's HBM stream) must track
    within a few hundredths of a pixel of the f32 path — the gate that lets the
    throughput configs use it."""
    img = synth_texture(rng, 160, 224)
    shift = (3.4, -2.2)
    yy, xx = np.mgrid[0:160, 0:224].astype(np.float32)
    nxt = np.asarray(interp.bilinear_sample(jnp.asarray(img), jnp.asarray(yy - shift[1]), jnp.asarray(xx - shift[0])))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(nxt), 3)
    pts = jnp.asarray(rng.uniform([40, 40], [180, 120], size=(64, 2)).astype(np.float32))
    p32, s32, _ = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=10)
    p16, s16, _ = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=10,
                                    iter_dtype="bfloat16")
    both = np.asarray(s32) & np.asarray(s16)
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(p16)[both] - np.asarray(p32)[both], axis=-1)
    assert np.percentile(d, 90) < 0.05
    # and it still solves the actual tracking problem
    err = np.asarray(p16)[both] - (np.asarray(pts)[both] + np.asarray(shift))
    assert np.percentile(np.abs(err), 90) < 0.25


def test_klt_status_drops_flat_regions(rng):
    img = np.full((128, 128), 100.0, np.float32)
    pyr = pyramid.build_pyramid(jnp.asarray(img), 3)
    pts = jnp.asarray([[64.0, 64.0]])
    _, status, _ = klt.pyramidal_klt(pyr, pyr, pts, window=15, iters=5)
    assert not bool(np.asarray(status)[0])


def test_klt_init_d_extends_reach(rng):
    """A motion prior (init_d) must let KLT converge on displacements far beyond
    the zero-start wander reach at a SMALL margin — the mechanism behind the
    pipeline's constant-velocity warm start (sustained turns produce 50+ px
    edge flow at KITTI resolution)."""
    img = synth_texture(rng, 192, 256, smooth=2.5)
    shift = (26.0, -3.0)  # beyond margin-3 three-level zero-start reach (~21 px)
    yy, xx = np.mgrid[0:192, 0:256].astype(np.float32)
    nxt = np.asarray(interp.bilinear_sample(jnp.asarray(img), jnp.asarray(yy - shift[1]), jnp.asarray(xx - shift[0])))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(nxt), 3)
    pts = jnp.asarray(rng.uniform([50, 40], [190, 140], size=(48, 2)).astype(np.float32))
    # zero start at margin 3: the true shift is out of reach for most tracks
    _, st0, _ = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=10, margin=3)
    # an imperfect prior (2.5 px off) brings it within the margin
    prior = jnp.tile(jnp.asarray([[shift[0] - 2.0, shift[1] + 1.5]], jnp.float32), (48, 1))
    new_pts, st1, _ = klt.pyramidal_klt(pyr0, pyr1, pts, window=15, iters=10,
                                        margin=3, init_d=prior)
    assert np.asarray(st0).mean() < 0.6, "zero-start unexpectedly reached the shift"
    ok = np.asarray(st1)
    assert ok.mean() > 0.8, f"warm start survival {ok.mean():.2f}"
    err = np.asarray(new_pts)[ok] - (np.asarray(pts)[ok] + np.asarray(shift))
    assert np.percentile(np.abs(err), 90) < 0.3


def test_klt_coarse_margin_survives_wrong_prior(rng):
    """Per-level margins (round 5): a transiently WRONG motion prior (the
    constant-velocity model at a turn entry/exit mispredicts by one frame's yaw
    step, 25-43 px at KITTI focal) must stay within correction REACH — the
    per-level clamp Σ margin[l]·2^l — once the margins are widened. Wide-basin
    targets (Gaussian blobs: gradient pull everywhere) isolate the clamp from
    texture-basin effects; the production evidence is the turn-exit microscope
    (track-table survival 15 → 93 inliers at the cliff, BASELINE.md round 5)."""
    H, W = 192, 256
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W), np.float32)
    rngl = np.random.default_rng(5)
    centers = rngl.uniform([60, 60], [190, 130], size=(12, 2)).astype(np.float32)
    for cx, cy in centers:
        img += 200.0 * np.exp(-(((xx - cx) / 20.0) ** 2 + ((yy - cy) / 20.0) ** 2))
    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pts = jnp.asarray(centers)
    # true motion is zero; the prior claims 38 px (turn-exit scenario)
    prior = jnp.tile(jnp.asarray([[38.0, 0.0]], jnp.float32), (len(centers), 1))

    def correct(margin):
        npts, st, _ = klt.pyramidal_klt(pyr0, pyr0, pts, window=15, iters=8,
                                        margin=margin, init_d=prior)
        e = np.linalg.norm(np.asarray(npts) - np.asarray(pts), axis=1)
        return float((np.asarray(st) & (e < 1.0)).mean())

    # reach 28 px < 38 px error: the clamp pins tracks short of truth
    assert correct((4, 4, 4)) < 0.3
    # production margins (6,6,8): reach ~44 px covers the transient
    assert correct((6, 6, 8)) > 0.7
