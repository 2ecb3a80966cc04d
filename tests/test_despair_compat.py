"""Reference-parity convenience API tests (despair compat shim)."""

import numpy as np

from steroscopic_hardware_tpu import despair
from steroscopic_hardware_tpu.ops.sad_golden import (
    disparity_numpy,
    sad_window_golden_scalar,
)
from steroscopic_hardware_tpu.utils.params import Parameters


def test_run_sad_bit_exact(rng):
    left = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    out = despair.run_sad(left, right, 7, 16)
    assert np.array_equal(out, disparity_numpy(left, right, 7, 16))


def test_default_params_flow(rng):
    despair.set_default_params(Parameters(5, 32))
    assert despair.default_params() == Parameters(5, 32)
    left = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    right = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    out = despair.run_sad(left, right)  # uses defaults
    assert np.array_equal(out, disparity_numpy(left, right, 5, 32))
    despair.set_default_params(Parameters())  # restore


def test_sum_absolute_differences(rng):
    left = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    right = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    for args in [(5, 5, 3, 5, 7), (0, 0, 0, 0, 15), (13, 11, 2, 11, 16)]:
        lx, ly, rx, ry, b = args
        assert despair.sum_absolute_differences(
            left, right, lx, ly, rx, ry, b
        ) == sad_window_golden_scalar(left, right, lx, ly, rx, ry, b)


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (10, 12), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    despair.save_png(p, img)
    assert np.array_equal(despair.load_png(p), img)
