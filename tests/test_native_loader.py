"""Native C++ PNG loader vs PIL: bit-exact grayscale decode across PNG variants."""

import numpy as np
import pytest
from PIL import Image

from lcvo_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native library not built"
)


def _roundtrip(tmp_path, arr, mode, name):
    p = str(tmp_path / name)
    Image.fromarray(arr, mode=mode).save(p)
    ours = native_loader.decode_png(p)
    with Image.open(p) as im:
        ref = np.asarray(im.convert("L"), dtype=np.float32)
    return ours, ref


def test_gray8(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    ours, ref = _roundtrip(tmp_path, arr, "L", "g8.png")
    assert ours is not None
    np.testing.assert_array_equal(ours, arr.astype(np.float32))


def test_rgb8(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    ours, ref = _roundtrip(tmp_path, arr, "RGB", "rgb.png")
    assert ours is not None
    # both use ITU-R 601 luma; PIL rounds to uint8, we keep float — within 1 level
    assert np.abs(ours - ref).max() <= 1.0


def test_shape_probe(tmp_path):
    arr = np.zeros((10, 20), np.uint8)
    p = str(tmp_path / "s.png")
    Image.fromarray(arr).save(p)
    assert native_loader.png_shape(p) == (10, 20)


def test_batch_decode(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    arrs = []
    for i in range(6):
        a = rng.integers(0, 256, (16, 18), dtype=np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(a).save(p)
        paths.append(p)
        arrs.append(a)
    out = native_loader.decode_batch(paths, 16, 18, n_threads=3)
    assert out is not None
    np.testing.assert_array_equal(out, np.stack(arrs).astype(np.float32))


def test_unsupported_falls_back(tmp_path):
    # palette PNG -> native path declines, dataset reader falls back to PIL
    arr = np.tile(np.arange(16, dtype=np.uint8), (8, 1))
    p = str(tmp_path / "pal.png")
    Image.fromarray(arr).convert("P").save(p)
    assert native_loader.decode_png(p) is None
    from lcvo_tpu.data.datasets import _imread_gray

    out = _imread_gray(p)
    assert out.shape == (8, 16)


def test_gray8_u8_output(tmp_path):
    """uint8 decode (the H2D-lean ingest path) must match the source bytes and
    the f32 decode exactly for 8-bit gray sources."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (41, 67), dtype=np.uint8)
    p = str(tmp_path / "u8.png")
    Image.fromarray(arr, mode="L").save(p)
    ours = native_loader.decode_png(p, dtype=np.uint8)
    if ours is None:
        import pytest

        pytest.skip("native loader unavailable")
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, arr)
    f32 = native_loader.decode_png(p)
    np.testing.assert_array_equal(ours.astype(np.float32), f32)
