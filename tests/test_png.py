"""PNG codec tests (capability parity with pkg/despair/png_test.go:12-317:
round-trips, gray/RGB/RGBA variants, invalid files)."""

import numpy as np
import pytest

from steroscopic_hardware_tpu.io.png import PNGError, read_png, write_png


@pytest.mark.parametrize(
    "shape",
    [(7, 5), (32, 48), (1, 1), (480, 640)],
)
def test_gray_roundtrip(shape, rng):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(read_png(write_png(None, img)), img)


@pytest.mark.parametrize("nchan", [2, 3, 4])
def test_color_roundtrip(nchan, rng):
    img = rng.integers(0, 256, (21, 17, nchan), dtype=np.uint8)
    assert np.array_equal(read_png(write_png(None, img)), img)


def test_gray16_roundtrip(rng):
    img = rng.integers(0, 65536, (9, 13), dtype=np.uint16)
    assert np.array_equal(read_png(write_png(None, img)), img)


def test_decode_reference_testdata():
    img = read_png("/root/reference/testdata/L_00001.png")
    assert img.shape == (480, 640, 4)
    assert img.dtype == np.uint8
    img = read_png("/root/reference/testdata/im0.png")
    assert img.shape == (1080, 1920, 3)


def test_invalid_file(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"not a png at all")
    with pytest.raises(PNGError):
        read_png(str(p))


def test_file_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (15, 23), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    write_png(path, img)
    assert np.array_equal(read_png(path), img)
