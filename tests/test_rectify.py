"""Stereo rectification / undistortion tests."""

import jax.numpy as jnp
import numpy as np

from steroscopic_hardware_tpu.ops.rectify import (
    StereoRectifier,
    distort_points,
    remap,
    stereo_rectify,
    undistort_points,
)
from steroscopic_hardware_tpu.ops import se3


def test_remap_identity(rng):
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    ys, xs = np.mgrid[0:24, 0:32].astype(np.float32)
    out = np.asarray(remap(jnp.asarray(img), jnp.asarray(ys),
                           jnp.asarray(xs)))
    assert np.array_equal(out, img)


def test_remap_shift(rng):
    img = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    ys, xs = np.mgrid[0:16, 0:20].astype(np.float32)
    out = np.asarray(remap(jnp.asarray(img), jnp.asarray(ys),
                           jnp.asarray(xs + 3)))
    assert np.array_equal(out[:, :-3], img[:, 3:])
    assert (out[:, -3:] == 0).all()  # out-of-source zeroed


def test_distort_undistort_roundtrip(rng):
    dist = (-0.3, 0.1, 0.001, -0.002, 0.05)
    xn = rng.uniform(-0.5, 0.5, 200)
    yn = rng.uniform(-0.4, 0.4, 200)
    xd, yd = distort_points(xn, yn, dist)
    xu, yu = undistort_points(xd, yd, dist, iters=12)
    assert np.abs(xu - xn).max() < 1e-4
    assert np.abs(yu - yn).max() < 1e-4


def test_rectified_epipolar_alignment(rng):
    """After rectification, projections of any 3D point share the row
    coordinate and disparity = fx * |b| / z_rect."""
    phi = np.array([0.03, -0.05, 0.02], np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(phi)), np.float64)
    T = np.array([-0.3, 0.01, 0.02])
    R1, R2 = stereo_rectify(R, T)
    # rotations are orthonormal and identical-orientation
    assert np.allclose(R1 @ R1.T, np.eye(3), atol=1e-6)
    assert np.allclose(R2 @ R2.T, np.eye(3), atol=1e-6)
    b = -R.T @ T
    # baseline maps to pure +x in the rectified frame
    assert np.allclose(R1 @ b, [np.linalg.norm(b), 0, 0], atol=1e-6)

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    pts = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50),
                    rng.uniform(3, 8, 50)], -1)
    pl = (K @ (R1 @ pts.T)).T
    pl = pl[:, :2] / pl[:, 2:3]
    xr_cam = (R @ pts.T).T + T
    pr = (K @ (R2 @ xr_cam.T)).T
    pr = pr[:, :2] / pr[:, 2:3]
    # equal rows
    assert np.abs(pl[:, 1] - pr[:, 1]).max() < 1e-4
    # positive horizontal disparity = fx*|b|/z_rect
    z_rect = (R1 @ pts.T).T[:, 2]
    want = K[0, 0] * np.linalg.norm(b) / z_rect
    assert np.allclose(pl[:, 0] - pr[:, 0], want, atol=1e-4)


def test_stereo_rectifier_on_rendered_dot(rng):
    """Render one bright dot through two distorted, rotated cameras; after
    rectification its rows must align and its disparity must match
    fx*b/z."""
    H, W = 120, 160
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    dist = (-0.15, 0.05, 0.0, 0.0, 0.0)
    phi = np.array([0.0, -0.04, 0.015], np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(phi)), np.float64)
    T = np.array([-0.25, 0.0, 0.0])
    X = np.array([0.15, -0.1, 2.5])

    def render(Rc, tc):
        x = Rc @ X + tc
        xn, yn = x[0] / x[2], x[1] / x[2]
        xd, yd = distort_points(np.array([xn]), np.array([yn]), dist)
        u = K[0, 0] * xd[0] + K[0, 2]
        v = K[1, 1] * yd[0] + K[1, 2]
        img = np.zeros((H, W), np.uint8)
        ui, vi = int(round(u)), int(round(v))
        img[vi - 1 : vi + 2, ui - 1 : ui + 2] = 255
        return img

    left = render(np.eye(3), np.zeros(3))
    right = render(R, T)
    rect = StereoRectifier(K, dist, K, dist, R, T, (H, W))
    lrect, rrect = rect(left, right)

    def centroid(img):
        ys, xs = np.nonzero(img > 40)
        w = img[ys, xs].astype(float)
        return (ys * w).sum() / w.sum(), (xs * w).sum() / w.sum()

    ly, lx = centroid(lrect)
    ry, rx = centroid(rrect)
    assert abs(ly - ry) < 1.0, (ly, ry)
    R1, _ = stereo_rectify(R, T)
    z_rect = (R1 @ X)[2]
    want_disp = rect.K_new[0, 0] * rect.baseline / z_rect
    assert abs((lx - rx) - want_disp) < 1.5, (lx - rx, want_disp)
