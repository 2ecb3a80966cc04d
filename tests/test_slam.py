"""End-to-end stereo SLAM tests on synthetic rendered sequences.

A textured-landmark renderer projects persistent random patches through a
known trajectory into left/right images; StereoVO must recover the
trajectory through the full stack (dense SAD disparity -> FAST/ORB ->
matching -> RANSAC PnP), measured as ATE RMSE after alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from steroscopic_hardware_tpu.models.slam import (
    StereoCamera,
    StereoVO,
    ate_rmse,
    pose_graph_optimize,
)
from steroscopic_hardware_tpu.ops import se3

CAM = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, baseline=0.4)
H, W = 240, 320


def _make_world(rng, n=60):
    pts = np.stack(
        [
            rng.uniform(-3.5, 3.5, n),
            rng.uniform(-2.5, 2.5, n),
            rng.uniform(5.0, 11.0, n),
        ],
        -1,
    ).astype(np.float32)
    patches = rng.integers(40, 250, (n, 9, 9)).astype(np.uint8)
    return pts, patches


def _render(pts_w, patches, xi, right=False):
    R, t = se3.se3_exp(jnp.asarray(xi))
    cam = pts_w @ np.asarray(R).T + np.asarray(t)
    if right:
        cam = cam - np.array([CAM.baseline, 0, 0], np.float32)
    img = np.full((H, W), 90, np.uint8)
    order = np.argsort(-cam[:, 2])  # far to near
    for j in order:
        X, Y, Z = cam[j]
        if Z <= 0.5:
            continue
        u = int(round(CAM.fx * X / Z + CAM.cx))
        v = int(round(CAM.fy * Y / Z + CAM.cy))
        if 5 <= u < W - 5 and 5 <= v < H - 5:
            img[v - 4 : v + 5, u - 4 : u + 5] = patches[j]
    return img


def _trajectory(n_frames):
    xis = [np.zeros(6, np.float32)]
    for i in range(1, n_frames):
        xi = xis[-1].copy()
        xi[:3] += np.array([0.06, 0.0, -0.12], np.float32)  # forward+right
        xi[4] += 0.008  # slight yaw
        xis.append(xi)
    return xis


def test_stereo_vo_recovers_trajectory(rng):
    pts, patches = _make_world(rng)
    xis = _trajectory(6)
    vo = StereoVO(CAM, block_size=7, max_disparity=32, max_keypoints=128,
                  fast_threshold=15)
    gt_positions = []
    for xi in xis:
        left = _render(pts, patches, xi)
        right = _render(pts, patches, xi, right=True)
        vo.process(left, right)
        R, t = se3.se3_exp(jnp.asarray(xi))
        Ri, ti = se3.inverse(R, t)
        gt_positions.append(np.asarray(ti))
    assert min(vo.n_inliers[1:]) >= 15
    est = vo.positions()
    ate = ate_rmse(est, np.stack(gt_positions))
    # sub-decimeter on a ~0.8 m trajectory with 1px-quantized rendering
    assert ate < 0.12, f"ATE {ate}"


def test_pose_graph_closes_loop(rng):
    # ground-truth square loop of 8 poses
    M = 8
    xi_true = np.zeros((M, 6), np.float32)
    for i in range(1, M):
        xi_true[i] = np.asarray(
            se3.se3_log(*se3.compose(
                *se3.se3_exp(jnp.asarray(
                    np.array([0.5, 0, 0, 0, np.pi / 4, 0], np.float32))),
                *se3.se3_exp(jnp.asarray(xi_true[i - 1])),
            ))
        )

    def rel(i, j):
        Ri, ti = se3.se3_exp(jnp.asarray(xi_true[i]))
        Rj, tj = se3.se3_exp(jnp.asarray(xi_true[j]))
        Rii, tii = se3.inverse(Ri, ti)
        return np.asarray(se3.se3_log(*se3.compose(Rj, tj, Rii, tii)))

    edges = [(i, i + 1) for i in range(M - 1)] + [(M - 1, 0)]
    meas = np.stack([rel(i, j) for i, j in edges]).astype(np.float32)

    # corrupt odometry chain: drifted initial guess
    xi_init = xi_true + np.concatenate(
        [np.zeros((1, 6)), rng.normal(0, 0.05, (M - 1, 6))], 0
    ).astype(np.float32)

    xi_opt, costs = pose_graph_optimize(
        jnp.asarray(xi_init), jnp.asarray(np.array(edges, np.int32)),
        jnp.asarray(meas), jnp.ones(len(edges), np.float32),
    )
    costs = np.asarray(costs)
    assert costs[-1] < costs[0] * 1e-3
    assert np.allclose(np.asarray(xi_opt), xi_true, atol=1e-3)


def test_ate_alignment_invariance(rng):
    traj = rng.normal(0, 1, (20, 3))
    R = np.asarray(se3.so3_exp(jnp.asarray(
        np.array([0.3, -0.2, 0.5], np.float32))))
    moved = traj @ R.T + np.array([5.0, -2.0, 1.0])
    assert ate_rmse(moved, traj) < 1e-6
    noisy = moved + rng.normal(0, 0.01, traj.shape)
    assert 0.001 < ate_rmse(noisy, traj) < 0.05
