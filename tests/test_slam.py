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

from steroscopic_hardware_tpu.utils.synth import (
    SyntheticScene,
    straight_trajectory as _trajectory,
)

CAM = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, baseline=0.4)
H, W = 240, 320


def _make_world(rng, n=60):
    """Scene keyed off the shared synth module (seeded from rng)."""
    scene = SyntheticScene(CAM, size=(H, W), n_landmarks=n,
                           seed=int(rng.integers(0, 2**31)))
    return scene.points, scene.patches


def _render(pts_w, patches, xi, right=False):
    scene = SyntheticScene.__new__(SyntheticScene)
    scene.cam, scene.H, scene.W = CAM, H, W
    scene.points, scene.patches = pts_w, patches
    return scene.render(xi, right=right)


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
