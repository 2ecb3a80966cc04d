"""Depth colorization tests."""

import numpy as np

from steroscopic_hardware_tpu.ops.colorize import (
    colorize_disparity,
    turbo_colormap,
)


def test_turbo_range_and_shape(rng):
    x = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    rgb = turbo_colormap(x)
    assert rgb.shape == (16, 20, 3) and rgb.dtype == np.uint8


def test_turbo_endpoints_distinct():
    lo = turbo_colormap(np.array(0.1))
    hi = turbo_colormap(np.array(0.9))
    mid = turbo_colormap(np.array(0.5))
    # low end of Turbo is blue-dominant, high end red-dominant, middle bright
    assert lo[2] > lo[0]       # low = blueish
    assert hi[0] > hi[2]       # high = reddish
    assert int(mid.sum()) > int(turbo_colormap(np.array(0.0)).sum())


def test_colorize_invalid_black(rng):
    d = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    d[0, 0] = 255
    rgb = colorize_disparity(d, invalid_value=255)
    assert (rgb[0, 0] == 0).all()
    assert rgb.shape == (8, 8, 3)


def test_colormap_monotone_hue_progression():
    # increasing disparity shifts red weight up
    d = np.arange(256, dtype=np.uint8).reshape(1, -1)
    rgb = colorize_disparity(d)
    red = rgb[0, :, 0].astype(int)
    assert red[250] > red[5]


def test_colorize_jax_matches_numpy():
    """The on-device colorize (fused into the serving dispatch) must match
    the numpy reference to within 1 LSB per channel (same polynomial,
    same op order; float assoc. differences only)."""
    import jax.numpy as jnp

    from steroscopic_hardware_tpu.ops.colorize import (
        colorize_disparity,
        colorize_disparity_jax,
    )

    d = np.arange(256, dtype=np.uint8).reshape(16, 16)
    want = colorize_disparity(d).astype(np.int32)
    got = np.asarray(colorize_disparity_jax(jnp.asarray(d))).astype(np.int32)
    assert np.abs(want - got).max() <= 1


def test_colorize_lut_bitexact_vs_polynomial(rng):
    """The host 256-entry Turbo LUT must be BIT-identical to the direct
    polynomial colorization for every uint8 input (it is the polynomial,
    precomputed)."""
    from steroscopic_hardware_tpu.ops.colorize import (
        colorize_disparity,
        colorize_disparity_lut,
        turbo_lut,
    )

    assert turbo_lut().shape == (256, 3)
    d = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    np.testing.assert_array_equal(
        colorize_disparity_lut(d), colorize_disparity(d))
    np.testing.assert_array_equal(
        colorize_disparity_lut(d, invalid_value=255),
        colorize_disparity(d, invalid_value=255))
