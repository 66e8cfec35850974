"""Golden parity vs OpenCV's C++ kernels on synthetic scenes (SURVEY §4 plan
item 2). OpenCV here is the *reference oracle* (the exact kernel surface the
reference calls, SURVEY §2.2) — never a runtime dependency of the framework.
Tolerances are behavioral: same tracks/inliers/poses within noise, not bitwise."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from lcvo_tpu.core import geometry as geo
from lcvo_tpu.ops import epipolar, harris, klt, pnp, pyramid
from lcvo_tpu.ops import interp

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"


def synth_texture(rng, H, W, smooth=1.5):
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    k = int(3 * smooth) | 1
    img = cv2.GaussianBlur(img, (k, k), smooth)
    return (img - img.min()) * (255.0 / (img.max() - img.min()))


def test_klt_matches_opencv(rng):
    img = synth_texture(rng, 240, 320, smooth=2.0)
    shift = (7.3, -4.6)
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    nxt = cv2.warpAffine(img, M, (320, 240))

    pts = rng.uniform([40, 40], [280, 200], (64, 2)).astype(np.float32)
    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8), pts.reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=2)
    cv_pts = cv_pts.reshape(-1, 2)
    cv_st = cv_st.reshape(-1).astype(bool)

    pyr0 = pyramid.build_pyramid(jnp.asarray(img), 3)
    pyr1 = pyramid.build_pyramid(jnp.asarray(nxt), 3)
    our_pts, our_st, _ = klt.pyramidal_klt(pyr0, pyr1, jnp.asarray(pts), window=21, iters=10)
    our_pts = np.asarray(our_pts)
    our_st = np.asarray(our_st)

    both = cv_st & our_st
    assert both.mean() > 0.7
    d = np.abs(our_pts[both] - cv_pts[both])
    assert np.percentile(d, 90) < 0.35, f"90pct deviation vs OpenCV {np.percentile(d, 90):.3f}px"


def _two_view_scene(rng, n=120, noise=0.3, fx=500.0):
    K = np.array([[fx, 0, 320], [0, fx, 240], [0, 0, 1]])
    X = rng.uniform([-4, -2, 6], [4, 2, 16], (n, 3))
    R = cv2.Rodrigues(np.array([0.02, -0.04, 0.01]))[0]
    t = np.array([0.6, 0.05, 0.1])
    uv1 = (K @ X.T).T
    uv1 = uv1[:, :2] / uv1[:, 2:]
    Xc = (R @ X.T).T + t
    uv2 = (K @ Xc.T).T
    uv2 = uv2[:, :2] / uv2[:, 2:]
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    return K, R, t, X, uv1.astype(np.float32), uv2.astype(np.float32)


def test_essential_pose_matches_opencv(rng):
    K, R_gt, t_gt, X, uv1, uv2 = _two_view_scene(rng)
    E_cv, _ = cv2.findEssentialMat(uv1, uv2, K, method=cv2.RANSAC, prob=0.999, threshold=1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv1, uv2, K)

    Kj = jnp.asarray(K, jnp.float32)
    x1 = geo.normalize_points(jnp.asarray(uv1), Kj)
    x2 = geo.normalize_points(jnp.asarray(uv2), Kj)
    import jax
    E, inl, n_inl = epipolar.essential_ransac(
        jax.random.PRNGKey(0), x1, x2, jnp.ones(len(uv1), bool), thresh=1.0 / 500, n_hyp=256)
    R_o, t_o, _ = epipolar.recover_pose(E, x1, x2, inl)
    R_o = np.asarray(R_o); t_o = np.asarray(t_o)

    # both must recover the ground-truth rotation and translation direction
    # (0.3 px observation noise over a 0.6 m baseline leaves a few degrees of
    # legitimate direction uncertainty — OpenCV itself lands ~3 deg off here)
    for name, Rx, tx in (("opencv", R_cv, t_cv.reshape(-1)), ("ours", R_o, t_o)):
        ang = np.degrees(np.arccos(np.clip((np.trace(Rx @ R_gt.T) - 1) / 2, -1, 1)))
        assert ang < 0.5, f"{name} rotation off by {ang:.2f} deg"
        cos = abs(np.dot(tx / np.linalg.norm(tx), t_gt / np.linalg.norm(t_gt)))
        assert cos > np.cos(np.radians(5.0)), f"{name} direction off: cos={cos:.5f}"


def test_pnp_matches_opencv(rng):
    K, R_gt, t_gt, X, uv1, uv2 = _two_view_scene(rng, noise=0.2)
    # corrupt 15% of observations
    n_out = len(uv2) * 15 // 100
    uv2c = uv2.copy()
    uv2c[:n_out] += rng.uniform(15, 40, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))

    okcv, rvec, tvec, inl_cv = cv2.solvePnPRansac(
        X.astype(np.float32), uv2c.reshape(-1, 1, 2), K, None,
        reprojectionError=2.0, confidence=0.99999, flags=cv2.SOLVEPNP_ITERATIVE)
    R_cv = cv2.Rodrigues(rvec)[0]

    import jax
    Kj = jnp.asarray(K, jnp.float32)
    x_obs = geo.normalize_points(jnp.asarray(uv2c), Kj)
    R_o, t_o, inl_o, n_inl = pnp.pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(X, jnp.float32), x_obs,
        jnp.ones(len(X), bool), thresh=2.0 / 500, n_hyp=256)

    for Rx, tx in ((R_cv, tvec.reshape(-1)), (np.asarray(R_o), np.asarray(t_o))):
        ang = np.degrees(np.arccos(np.clip((np.trace(Rx @ R_gt.T) - 1) / 2, -1, 1)))
        assert ang < 0.5
        assert np.linalg.norm(tx - t_gt) < 0.05
    # inlier sets agree on the clean points
    assert np.asarray(inl_o)[n_out:].mean() > 0.9
    assert int(n_inl) >= len(inl_cv) - 10


def test_triangulation_matches_opencv(rng):
    K, R_gt, t_gt, X, uv1, uv2 = _two_view_scene(rng, noise=0.0)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R_gt, t_gt.reshape(3, 1)])
    Xh = cv2.triangulatePoints(P1, P2, uv1.T, uv2.T)
    X_cv = (Xh[:3] / Xh[3]).T

    Kj = jnp.asarray(K, jnp.float32)
    x1 = geo.normalize_points(jnp.asarray(uv1), Kj)
    x2 = geo.normalize_points(jnp.asarray(uv2), Kj)
    X_o = np.asarray(geo.triangulate_linear(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32), x1, x2))
    np.testing.assert_allclose(X_o, X_cv, atol=2e-2)
    np.testing.assert_allclose(X_o, X, atol=2e-2)


def _octave_of(kp):
    o = kp.octave & 255
    return o - 256 if o >= 128 else o


def test_sift_keypoints_match_opencv(rng):
    """N1 golden parity (reference's most-used kernel, ``src/vo_pipeline.py:95-104,
    443-444``): on textured content, our detector must recover the bulk of
    cv2.SIFT's keypoints (those in our octave range — we skip OpenCV's 2x-upsample
    octave by design, see frontend/sift.py docstring) with consistent scale and
    orientation. Measured on this scene: recall@2px 0.84, sigma ratio 1.02,
    median |dtheta| 7.8 deg."""
    from lcvo_tpu.frontend.sift import sift as our_sift

    img = synth_texture(rng, 240, 320, smooth=1.5)
    s = cv2.SIFT_create(nfeatures=300)
    kps = s.detect(img.astype(np.uint8), None)
    arr = np.array([(kp.pt[0], kp.pt[1], kp.size / 2, kp.angle) for kp in kps])
    octs = np.array([_octave_of(kp) for kp in kps])
    cvk = arr[octs >= 0]
    assert len(cvk) >= 20, "oracle found too few octave>=0 keypoints"

    f = our_sift(jnp.asarray(img), max_keypoints=512, octaves=3)
    v = np.asarray(f.valid)
    ours = np.asarray(f.pts)[v]
    osig = np.asarray(f.sigma)[v]
    oori = np.asarray(f.ori)[v]

    d = np.linalg.norm(cvk[:, None, :2] - ours[None, :, :], axis=-1)
    nn, dm = d.argmin(1), d.min(1)
    recall = (dm < 2.0).mean()
    assert recall > 0.6, f"keypoint recall@2px vs cv2.SIFT only {recall:.0%}"

    m = dm < 2.0
    ratio = np.median(osig[nn[m]] / cvk[m, 2])
    assert 0.7 < ratio < 1.4, f"scale ratio vs cv2.SIFT off: {ratio:.2f}"
    dth = np.degrees(np.angle(np.exp(1j * (np.deg2rad(cvk[m, 3]) - oori[nn[m]]))))
    med = np.median(np.abs(dth))
    assert med < 15.0, f"median orientation delta vs cv2.SIFT {med:.1f} deg"


def test_sift_descriptor_match_overlap_vs_opencv(rng):
    """Cross-implementation descriptor quality through the BF-ratio pipeline
    (reference bootstrap + sift-sift mode): under a known rotation+shift warp, our
    detect→describe→ratio-match chain must produce a healthy number of matches,
    nearly all consistent with the ground-truth warp — same protocol as cv2's own
    chain on the same frames (measured: ours 94 matches @ 1.00 consistent, cv2 354
    @ 0.997; cv2's surplus is its upsampled octave + multi-orientation output)."""
    from lcvo_tpu.frontend.match import mutual_match
    from lcvo_tpu.frontend.sift import sift as our_sift

    img = synth_texture(rng, 240, 320, smooth=1.5)
    H, W = img.shape
    M = cv2.getRotationMatrix2D((W / 2, H / 2), 20.0, 1.0)
    M[:, 2] += [5.0, -3.0]
    warp = cv2.warpAffine(img, M, (W, H))

    def gt_map(p):
        return p @ M[:, :2].T + M[:, 2]

    f0 = our_sift(jnp.asarray(img), max_keypoints=512, octaves=3)
    f1 = our_sift(jnp.asarray(warp), max_keypoints=512, octaves=3)
    idx, ok = mutual_match(f0.desc, f0.valid, f1.desc, f1.valid, ratio=0.8)
    ok = np.asarray(ok)
    p0 = np.asarray(f0.pts)[ok]
    p1 = np.asarray(f1.pts)[np.asarray(idx)[ok]]
    err = np.linalg.norm(p1 - gt_map(p0), axis=1)
    assert ok.sum() >= 30, f"only {ok.sum()} ratio matches under warp"
    assert (err < 3.0).mean() > 0.85, f"match consistency {(err < 3.0).mean():.0%}"

    # cv2 oracle on the same frames: our match count must be a sane fraction of its
    s = cv2.SIFT_create(nfeatures=512)
    k0, d0 = s.detectAndCompute(img.astype(np.uint8), None)
    k1, d1 = s.detectAndCompute(warp.astype(np.uint8), None)
    mm = cv2.BFMatcher().knnMatch(d0, d1, k=2)
    good = [m for m, n in mm if m.distance < 0.8 * n.distance]
    assert ok.sum() >= 0.2 * len(good), (ok.sum(), len(good))


def test_shi_tomasi_matches_opencv(rng):
    # checkerboard: unambiguous corner set — both detectors must find the
    # interior corners (random textures have no well-defined corner ranking,
    # so grid-NMS vs global-NMS would legitimately diverge there)
    H, W, sq = 200, 280, 28
    yy, xx = np.mgrid[0:H, 0:W]
    img = (((yy // sq) + (xx // sq)) % 2 * 180.0 + 30.0).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)

    cv_pts = cv2.goodFeaturesToTrack(
        img.astype(np.uint8), maxCorners=60, qualityLevel=0.05, minDistance=10)
    cv_pts = cv_pts.reshape(-1, 2)
    # compare away from the frame: OpenCV's implicit border is 3 px, ours is a
    # config (8 px here + KLT window clearance) — border corners aren't tracked
    # downstream anyway
    margin = 12
    inb = ((cv_pts[:, 0] > margin) & (cv_pts[:, 0] < W - margin)
           & (cv_pts[:, 1] > margin) & (cv_pts[:, 1] < H - margin))
    cv_pts = cv_pts[inb]

    pts, score, ok = harris.detect_corners(
        jnp.asarray(img), max_corners=96, quality_level=0.05,
        cells_y=8, cells_x=11, cells_topk=4, method="shi", window=3, border=8)
    ours = np.asarray(pts)[np.asarray(ok)]

    d = np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1).min(axis=1)
    assert (d < 3.0).mean() > 0.9, f"only {(d < 3.0).mean():.0%} of OpenCV corners recovered"
