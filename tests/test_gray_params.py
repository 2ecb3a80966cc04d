"""Grayscale conversion and parameter validation tests."""

import numpy as np
import pytest

from steroscopic_hardware_tpu.ops.gray import to_grayscale
from steroscopic_hardware_tpu.utils.params import (
    ParamValidationError,
    Parameters,
    ParamStore,
    validate_params,
)


def _go_nrgba_gray(r8, g8, b8, a8=255):
    """Literal Go generic-path luma: NRGBA.RGBA() 16-bit premultiplied
    channels through (19595r + 38470g + 7471b + 1<<15) >> 24."""
    r = (r8 * 0x101) * a8 // 0xFF
    g = (g8 * 0x101) * a8 // 0xFF
    b = (b8 * 0x101) * a8 // 0xFF
    return (19595 * r + 38470 * g + 7471 * b + (1 << 15)) >> 24 & 0xFF


def test_gray_rgba_matches_go_literal(rng):
    img = rng.integers(0, 256, (11, 13, 4), dtype=np.uint8)
    out = to_grayscale(img)
    for y in range(11):
        for x in range(13):
            r, g, b, a = (int(v) for v in img[y, x])
            assert out[y, x] == _go_nrgba_gray(r, g, b, a), (y, x)


def test_gray_rgb_matches_go_literal(rng):
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    out = to_grayscale(img)
    for y in range(9):
        for x in range(7):
            r, g, b = (int(v) for v in img[y, x])
            assert out[y, x] == _go_nrgba_gray(r, g, b, 255)


def test_gray_identity():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(to_grayscale(img), img)


def test_gray_extremes():
    white = np.full((2, 2, 4), 255, dtype=np.uint8)
    assert to_grayscale(white).max() == 255
    black = np.zeros((2, 2, 3), dtype=np.uint8)
    black[..., :] = 0
    assert to_grayscale(black).max() == 0


def test_validate_params_envelope():
    assert validate_params(7, 64) == Parameters(7, 64)
    assert validate_params(31, 256) == Parameters(31, 256)
    assert validate_params(3, 16) == Parameters(3, 16)
    for bad in [(2, 64), (16, 64), (33, 64), (1, 64)]:
        with pytest.raises(ParamValidationError):
            validate_params(*bad)
    for bad in [(7, 15), (7, 17), (7, 0), (7, 272), (7, 100)]:
        with pytest.raises(ParamValidationError):
            validate_params(*bad)


def test_param_store_swap():
    store = ParamStore()
    assert store.get() == Parameters(16, 64)  # reference defaults
    store.set(Parameters(7, 128))
    assert store.get() == Parameters(7, 128)
