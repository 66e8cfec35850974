"""SIFT-class detector/descriptor + MXU matcher tests (SURVEY §4: analytic unit
tests per kernel — synthetic blobs for the detector, rotated scenes for the
descriptor, constructed descriptor sets for the matcher)."""

import numpy as np
import jax.numpy as jnp

from lcvo_tpu.frontend.match import knn_match_ratio, mutual_match
from lcvo_tpu.frontend.sift import sift
import pytest

pytestmark = pytest.mark.slow  # e2e tier: run fast tier with -m "not slow"


def _blob_image(H=128, W=192, blobs=((40, 60, 3.0), (90, 140, 5.0), (30, 150, 2.5))):
    # smallest blob sigma 2.5: without OpenCV's 2x-upsample octave the detectable
    # band starts at DoG layer sigma ~2.0 (see module docstring of frontend.sift)
    """Dark background with bright Gaussian blobs at (y, x, sigma)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    for y, x, s in blobs:
        img += 200.0 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    return img.astype(np.float32), blobs


def test_sift_detects_blobs():
    img, blobs = _blob_image()
    f = sift(jnp.asarray(img), max_keypoints=96, octaves=3)
    pts = np.asarray(f.pts)[np.asarray(f.valid)]
    assert pts.shape[0] >= len(blobs)
    for y, x, s in blobs:
        d = np.sqrt(((pts - [x, y]) ** 2).sum(1)).min()
        assert d < 2.0, f"blob at ({x},{y}) missed by {d:.2f}px"


def test_sift_scale_assignment():
    # a single large blob should be detected with a proportional scale
    img, _ = _blob_image(blobs=((64, 96, 6.0),))
    f = sift(jnp.asarray(img), max_keypoints=96, octaves=4)
    pts = np.asarray(f.pts)[np.asarray(f.valid)]
    sig = np.asarray(f.sigma)[np.asarray(f.valid)]
    d = np.sqrt(((pts - [96, 64]) ** 2).sum(1))
    i = d.argmin()
    assert d[i] < 2.0
    # DoG responds at sigma ~ blob sigma (same order of magnitude)
    assert 2.0 < sig[i] < 14.0


def _textured(H=160, W=160, seed=3):
    from lcvo_tpu.data.synthetic import value_noise

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = value_noise(xx * 0.08, yy * 0.08, seed, octaves=4) * 255.0
    return img.astype(np.float32)


def test_sift_descriptor_rotation_matching():
    """Descriptors must match under a 90-degree rotation of the scene."""
    img = _textured()
    H, W = img.shape
    rot = np.rot90(img).copy()  # (x, y) -> (y', x') with x' = y, y' = W-1-x
    f0 = sift(jnp.asarray(img), max_keypoints=192, octaves=3)
    f1 = sift(jnp.asarray(rot), max_keypoints=192, octaves=3)
    idx, ok = mutual_match(f0.desc, f0.valid, f1.desc, f1.valid, ratio=0.8)
    ok = np.asarray(ok)
    assert ok.sum() >= 20, f"only {ok.sum()} mutual matches under rotation"
    p0 = np.asarray(f0.pts)[ok]
    p1 = np.asarray(f1.pts)[np.asarray(idx)[ok]]
    # expected mapping of (x, y) under np.rot90: new_x = y, new_y = W-1-x
    exp = np.stack([p0[:, 1], W - 1 - p0[:, 0]], axis=1)
    err = np.sqrt(((p1 - exp) ** 2).sum(1))
    frac_good = (err < 3.0).mean()
    assert frac_good > 0.8, f"only {frac_good:.0%} of matches geometrically consistent"


def test_patch_descriptor_matching():
    """The cheap normalized-patch descriptor (DescriptorConfig.method='patch') must
    match under a 90-degree rotation like the SIFT histogram descriptor."""
    img = _textured()
    H, W = img.shape
    rot = np.rot90(img).copy()
    f0 = sift(jnp.asarray(img), max_keypoints=192, octaves=3, desc_method="patch")
    f1 = sift(jnp.asarray(rot), max_keypoints=192, octaves=3, desc_method="patch")
    # valid descriptors are unit-norm
    n = np.linalg.norm(np.asarray(f0.desc)[np.asarray(f0.valid)], axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    idx, ok = mutual_match(f0.desc, f0.valid, f1.desc, f1.valid, ratio=0.8)
    ok = np.asarray(ok)
    assert ok.sum() >= 15, f"only {ok.sum()} mutual patch matches under rotation"
    p0 = np.asarray(f0.pts)[ok]
    p1 = np.asarray(f1.pts)[np.asarray(idx)[ok]]
    exp = np.stack([p0[:, 1], W - 1 - p0[:, 0]], axis=1)
    err = np.sqrt(((p1 - exp) ** 2).sum(1))
    frac_good = (err < 3.0).mean()
    assert frac_good > 0.7, f"only {frac_good:.0%} of patch matches geometrically consistent"


def test_knn_ratio_match_synthetic():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(40, 128)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noisy = base + 0.05 * rng.normal(size=base.shape).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    perm = rng.permutation(40)
    idx, ok = knn_match_ratio(
        jnp.asarray(base),
        jnp.ones(40, bool),
        jnp.asarray(noisy[perm]),
        jnp.ones(40, bool),
        ratio=0.8,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    inv = np.empty(40, int)
    inv[perm] = np.arange(40)
    assert ok.mean() > 0.9
    assert (idx[ok] == inv[ok]).all()


def test_knn_ratio_rejects_ambiguous():
    # two identical targets -> ratio test must reject (best ~= second best)
    q = np.ones((1, 128), np.float32)
    t = np.stack([np.ones(128), np.ones(128)]).astype(np.float32)
    _, ok = knn_match_ratio(
        jnp.asarray(q), jnp.ones(1, bool), jnp.asarray(t), jnp.ones(2, bool)
    )
    assert not bool(ok[0])
