"""Calibration files + rectification in the live pipeline."""

import numpy as np
import pytest

from steroscopic_hardware_tpu.io.calib import (
    load_calibration,
    save_calibration,
)
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline

K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
SIZE = (240, 320)


def _write(tmp_path, **over):
    path = str(tmp_path / "rig.json")
    kw = dict(K1=K, K2=K, R=np.eye(3), T=[-0.1, 0, 0], size=SIZE)
    kw.update(over)
    save_calibration(path, **kw)
    return path


def test_roundtrip(tmp_path):
    rect = load_calibration(
        _write(tmp_path, dist1=[-0.2, 0.05, 0.001, -0.001, 0.0])
    )
    assert rect.baseline == pytest.approx(0.1)
    assert rect.K_new[0, 0] == pytest.approx(300.0)
    # K_new principal point is centered
    assert rect.K_new[0, 2] == pytest.approx(SIZE[1] / 2)
    assert rect.K_new[1, 2] == pytest.approx(SIZE[0] / 2)


def test_validation(tmp_path):
    with pytest.raises(ValueError, match="K1"):
        load_calibration(_write(tmp_path, K1=np.eye(2)))
    with pytest.raises(ValueError, match="size"):
        load_calibration(_write(tmp_path, size=(0, 320)))
    with pytest.raises(ValueError, match="dist2"):
        load_calibration(_write(tmp_path, dist2=[0.1, 0.2]))


def test_trivial_calibration_is_identity(tmp_path, rng):
    """Identity rotation, pure-x baseline, centered K, no distortion:
    rectification must be an exact no-op, so the pipeline output matches
    the unrectified pipeline bit for bit."""
    rect = load_calibration(_write(tmp_path))
    img_l = rng.integers(0, 256, SIZE, dtype=np.uint8)
    img_r = np.roll(img_l, -4, axis=1)
    out_l, out_r = rect(img_l, img_r)
    assert np.array_equal(out_l, img_l)
    assert np.array_equal(out_r, img_r)

    bus = FrameBus()
    bus.publish("left", img_l)
    bus.publish("right", img_r)
    p_rect = DepthPipeline(bus, rectifier=rect)
    p_none = DepthPipeline(bus)
    d1 = p_rect.step()
    d2 = p_none.step()
    assert np.array_equal(d1, d2)


def test_distorted_rig_rectifies(tmp_path, rng):
    """A barrel-distorted rig: rectified output differs from the raw
    frames but has the calibration's output size and full dtype range."""
    dist = [-0.25, 0.08, 0.0, 0.0, 0.0]
    rect = load_calibration(_write(tmp_path, dist1=dist, dist2=dist))
    img = rng.integers(0, 256, SIZE, dtype=np.uint8)
    out_l, out_r = rect(img, img)
    assert out_l.shape == SIZE and out_l.dtype == np.uint8
    assert not np.array_equal(out_l, img)
    # identical inputs + identical per-camera models -> identical outputs
    assert np.array_equal(out_l, out_r)

    bus = FrameBus()
    bus.publish("left", img)
    bus.publish("right", img)
    pipe = DepthPipeline(bus, rectifier=rect)
    depth = pipe.step()
    assert depth is not None and depth.shape == SIZE
