"""Checkpoint/resume and integrated StereoSLAM tests."""

import numpy as np
import pytest

from steroscopic_hardware_tpu.models.slam import StereoSLAM, ate_rmse
from steroscopic_hardware_tpu.utils import checkpoint as ckpt

from tests.test_slam import (  # reuse the synthetic renderer
    CAM, _make_world, _render, _trajectory,
)
from steroscopic_hardware_tpu.ops import se3
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path, rng):
    arrays = {
        "a": rng.normal(0, 1, (8, 3)).astype(np.float32),
        "b": rng.integers(0, 255, (4, 4), dtype=np.uint8),
    }
    path = str(tmp_path / "x.ckpt")
    man = ckpt.save(path, arrays, {"note": "hi"})
    assert man["meta"]["note"] == "hi"
    loaded, man2 = ckpt.load(path)
    assert man2["sha256"] == man["sha256"]
    for k in arrays:
        assert np.array_equal(loaded[k], arrays[k])


def test_checkpoint_corruption_detected(tmp_path, rng):
    path = str(tmp_path / "x.ckpt")
    ckpt.save(path, {"a": np.zeros(4)})
    blob = bytearray(open(path, "rb").read())
    # flip a byte inside the zip payload region
    blob[len(blob) // 2] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        ckpt.load(path)


def test_checkpoint_latest_and_prune(tmp_path):
    import time

    for i in range(7):
        ckpt.save(str(tmp_path / f"slam-{i}.ckpt"), {"i": np.array([i])})
        time.sleep(0.01)
    assert ckpt.latest(str(tmp_path)).endswith("slam-6.ckpt")
    assert ckpt.prune(str(tmp_path), keep=3) == 4
    assert ckpt.latest(str(tmp_path)).endswith("slam-6.ckpt")


def test_slam_with_ba_and_resume(tmp_path, rng):
    pts, patches = _make_world(rng)
    xis = _trajectory(8)
    slam = StereoSLAM(CAM, window=3, kf_every=2, ba_iters=4,
                      block_size=7, max_disparity=32, max_keypoints=128,
                      fast_threshold=15)
    gt = []
    for xi in xis[:5]:
        left = _render(pts, patches, xi)
        right = _render(pts, patches, xi, right=True)
        slam.process(left, right)
        R, t = se3.se3_exp(jnp.asarray(xi))
        _, ti = se3.inverse(R, t)
        gt.append(np.asarray(ti))
    assert slam.ba_runs >= 1
    assert slam.last_ba_errs is not None
    # BA must not diverge: final window error bounded
    assert slam.last_ba_errs[-1] < 5.0

    # checkpoint, resume, continue the remaining frames
    path = str(tmp_path / "slam-0.ckpt")
    slam.save_checkpoint(path)
    slam2 = StereoSLAM.load_checkpoint(
        path, ba_iters=4, block_size=7, max_disparity=32,
        max_keypoints=128, fast_threshold=15,
    )
    assert slam2.frame_idx == slam.frame_idx
    assert len(slam2.vo.trajectory) == len(slam.vo.trajectory)
    for xi in xis[5:]:
        left = _render(pts, patches, xi)
        right = _render(pts, patches, xi, right=True)
        slam2.process(left, right)
        R, t = se3.se3_exp(jnp.asarray(xi))
        _, ti = se3.inverse(R, t)
        gt.append(np.asarray(ti))

    est = slam2.vo.positions()
    ate = ate_rmse(est, np.stack(gt))
    assert ate < 0.15, f"ATE {ate}"


@pytest.mark.parametrize("loop_index", ["bow", "exhaustive"])
def test_loop_closure_fires_and_reduces_drift(loop_index):
    """Out-and-back trajectory: the final pose revisits the start; loop
    closure must fire and pull the drifted estimate toward the loop
    constraint — both via BoW retrieval (default, O(1) dispatches) and
    the exhaustive matcher. (Own deterministic rng: the shared session
    fixture's state depends on test order.)"""
    rng = np.random.default_rng(42)
    pts, patches = _make_world(rng)
    # out-and-back along x
    xis = []
    steps = [0.12] * 5 + [-0.12] * 5
    cur = np.zeros(6, np.float32)
    xis.append(cur.copy())
    for s in steps:
        cur = cur.copy()
        cur[0] += s
        xis.append(cur.copy())

    slam = StereoSLAM(CAM, window=3, kf_every=1, ba_iters=3,
                      loop_closure=True, loop_min_matches=25, loop_gap=4,
                      loop_index=loop_index,
                      block_size=7, max_disparity=32, max_keypoints=128,
                      fast_threshold=15)
    for xi in xis:
        left = _render(pts, patches, xi)
        right = _render(pts, patches, xi, right=True)
        slam.process(left, right)
    assert slam.loops_closed >= 1
    # final pose should be near the start (ground truth returns to origin)
    import jax.numpy as jnp
    from steroscopic_hardware_tpu.ops import se3 as _se3
    R, t = _se3.se3_exp(jnp.asarray(slam.vo.trajectory[-1]))
    _, ti = _se3.inverse(R, t)
    assert np.linalg.norm(np.asarray(ti)) < 0.12


def test_slam_pipeline_autocheckpoint_resume(tmp_path):
    """SlamPipeline persists every N frames and resumes from the newest
    checkpoint on construction (elastic recovery)."""
    from steroscopic_hardware_tpu.runtime.bus import FrameBus
    from steroscopic_hardware_tpu.runtime.pipeline import SlamPipeline
    from steroscopic_hardware_tpu.utils.synth import (
        SyntheticScene, straight_trajectory,
    )

    rng = np.random.default_rng(5)
    scene = SyntheticScene(CAM, n_landmarks=60, seed=11)
    xis = straight_trajectory(5)
    kwargs = dict(block_size=7, max_disparity=32, max_keypoints=128,
                  fast_threshold=15)
    bus = FrameBus()
    pipe = SlamPipeline(bus, CAM, slam_kwargs=kwargs,
                        checkpoint_dir=str(tmp_path), checkpoint_every=2)
    for xi in xis[:4]:
        left, right = scene.render_pair(xi)
        bus.publish("left", left)
        bus.publish("right", right)
        pipe.step()
    assert pipe.frames == 4
    assert ckpt.latest(str(tmp_path)) is not None

    # a fresh pipeline on the same dir resumes
    bus2 = FrameBus()
    pipe2 = SlamPipeline(bus2, CAM, slam_kwargs=kwargs,
                         checkpoint_dir=str(tmp_path))
    assert pipe2.frames >= 2  # resumed at the last checkpoint boundary
    left, right = scene.render_pair(xis[4])
    bus2.publish("left", left)
    bus2.publish("right", right)
    pipe2.step()
    assert pipe2.frames >= 3
