"""Native C++ image-ops library: build, load, match cv2/numpy semantics."""

import numpy as np
import pytest

from nerf_shared_tpu.data import native_imageops as nio

pytestmark = pytest.mark.skipif(
    not nio.available(), reason="native toolchain unavailable"
)


def test_box_average_exact():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = nio.resize_area(img, 2, 2)
    np.testing.assert_allclose(
        out.squeeze(), [[2.5, 4.5], [10.5, 12.5]]
    )


def test_matches_cv2_integer_factor(rng):
    import cv2

    big = rng.random((64, 48, 3)).astype(np.float32)
    a = nio.resize_area(big, 16, 12)
    b = cv2.resize(big, (12, 16), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_noninteger_factor_close_to_cv2(rng):
    import cv2

    big = rng.random((30, 20, 3)).astype(np.float32)
    a = nio.resize_area(big, 13, 9)
    b = cv2.resize(big, (9, 13), interpolation=cv2.INTER_AREA)
    # cv2 uses a slightly different non-integer decimation; stay close
    assert np.abs(a - b).max() < 0.05


def test_u8_fused_conversion(rng):
    u8 = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = nio.resize_area(u8, 8, 8)
    assert out.dtype == np.float32
    assert out.min() >= 0 and out.max() <= 1.0


def test_composite_background(rng):
    rgba = rng.random((5, 7, 4)).astype(np.float32)
    got = nio.composite_background(rgba, 1.0)
    want = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_grayscale_2d_roundtrip(rng):
    img = rng.random((16, 16)).astype(np.float32)
    out = nio.resize_area(img, 4, 4)
    assert out.shape == (4, 4)
