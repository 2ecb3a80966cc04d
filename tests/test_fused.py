"""Fused serve+track dispatch (runtime/fused.py): the one-RPC-per-batch
live-SLAM path (VERDICT r4 directive #1).

Verifies (on the CPU backend) that the fused executable's serve half is
bit-exact against the unfused ``compute_serve_async`` layouts, that its
tracking half reproduces the classic ``StereoVO.process`` chain
bit-comparably (same fold_in key stream), that the in-dispatch BoW
vector matches ``BowIndex.vector``, and that the fused pipeline pair
(DepthPipeline + SlamPipeline) runs end-to-end over the frame bus.
"""

import time

import numpy as np

from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.models.slam import StereoCamera, StereoSLAM
from steroscopic_hardware_tpu.runtime.fused import (
    FusedServeTrack,
    split_serve,
)
from steroscopic_hardware_tpu.utils.synth import (
    SyntheticScene,
    straight_trajectory,
)

CAM = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, baseline=0.4)
H, W = 240, 320
VO_KW = dict(block_size=7, max_disparity=32, max_keypoints=128,
             fast_threshold=15)


def _sequence(rng, n=6):
    scene = SyntheticScene(CAM, size=(H, W), n_landmarks=60,
                           seed=int(rng.integers(0, 2**31)))
    out = []
    for xi in straight_trajectory(n):
        out.append((scene.render(xi), scene.render(xi, right=True)))
    return out


def _mk(rng, **slam_kw):
    slam = StereoSLAM(CAM, async_backend=False, **slam_kw, **VO_KW)
    matcher = BlockMatcher()
    matcher.set_params(
        type(matcher.get_params())(block_size=7, max_disparity=32))
    return FusedServeTrack(matcher, slam), matcher, slam


def test_fused_serve_bitexact_vs_unfused(rng):
    frames = _sequence(rng, n=4)
    fused, matcher, slam = _mk(rng)
    pairs = [frames[0], frames[1], frames[2]]
    B = len(pairs)

    # host-colorize mode (the flagship serving config)
    flat, track = fused.step(pairs, fetch_all=True, colorize_dev=False)
    depths, rgb = split_serve(flat, B, H, W, fetch_all=True,
                              colorize_dev=False)
    ref = np.asarray(matcher.compute_serve_async(
        pairs, fetch_all=True, colorize_dev=False))
    assert rgb is None
    np.testing.assert_array_equal(depths, ref)

    # device-colorize full mode
    flat, _ = fused.step(pairs)
    depths, rgb = split_serve(flat, B, H, W)
    ref = np.asarray(matcher.compute_serve_async(pairs))
    np.testing.assert_array_equal(depths, ref[:B])
    np.testing.assert_array_equal(rgb, ref[B:].transpose(1, 2, 0))

    # light mode (preview_scale=2, newest only)
    flat, _ = fused.step(pairs, preview_scale=2, fetch_all=False)
    depths, rgb = split_serve(flat, B, H, W, preview_scale=2,
                              fetch_all=False)
    ref = np.asarray(matcher.compute_serve_async(
        pairs, preview_scale=2, fetch_all=False))
    np.testing.assert_array_equal(
        np.concatenate([depths.ravel(), rgb.ravel()]), ref)


def test_fused_track_matches_classic_vo(rng):
    frames = _sequence(rng, n=6)
    fused, matcher, slam = _mk(rng)
    classic = StereoSLAM(CAM, async_backend=False, **VO_KW)

    for left, right in frames:
        flat, track = fused.step([(left, right)], fetch_all=True,
                                 colorize_dev=False)
        slam.process_tracked(track)
        classic.process(left, right)

    est = slam.vo.positions()
    ref = classic.vo.positions()
    assert est.shape == ref.shape
    # identical key stream + identical computation -> bit-comparable
    np.testing.assert_allclose(est, ref, atol=1e-5)
    assert slam.vo.n_inliers[1:] == classic.vo.n_inliers[1:]
    assert slam.frame_idx == classic.frame_idx
    assert slam.ba_runs == classic.ba_runs


def test_fused_batch_tracking_matches_classic(rng):
    """The fused executable tracks EVERY frame of a batch, chained on
    device; with keyframing disabled the pose chain is bit-comparable
    to feeding the classic VO one frame at a time (same fold_in keys:
    frame i draws ctr=i in both paths)."""
    frames = _sequence(rng, n=6)
    fused, matcher, slam = _mk(rng, kf_every=1000)
    classic = StereoSLAM(CAM, async_backend=False, kf_every=1000,
                         **VO_KW)

    for i in range(0, 6, 2):  # batches of 2
        pairs = [frames[i], frames[i + 1]]
        flat, track = fused.step(pairs, fetch_all=True,
                                 colorize_dev=False)
        assert track.xi_rel.shape == (2, 6)
        slam.process_tracked(track)
    for left, right in frames:
        classic.process(left, right)

    assert slam.frame_idx == classic.frame_idx == 6
    np.testing.assert_allclose(slam.vo.positions(),
                               classic.vo.positions(), atol=1e-5)
    assert slam.vo.n_inliers[1:] == classic.vo.n_inliers[1:]


def test_fused_bow_vector_matches_index(rng):
    frames = _sequence(rng, n=3)
    fused, matcher, slam = _mk(rng, loop_closure=True)
    flat, track = fused.step([frames[0]], fetch_all=True,
                             colorize_dev=False)
    assert track.bow_vec is not None and track.bow_vec.shape == (256,)
    import jax

    feats = jax.device_get(track.feat_dev)
    ref = slam._bow.vector(feats[2], feats[3])
    np.testing.assert_allclose(track.bow_vec, ref, atol=1e-6)


def test_fused_track_without_bow_has_no_vec(rng):
    frames = _sequence(rng, n=2)
    fused, matcher, slam = _mk(rng)  # loop_closure off
    _, track = fused.step([frames[0]], fetch_all=True,
                          colorize_dev=False)
    assert track.bow_vec is None
    assert track.bootstrap


def test_fused_pipeline_end_to_end(rng):
    from steroscopic_hardware_tpu.runtime.bus import FrameBus
    from steroscopic_hardware_tpu.runtime.pipeline import (
        DepthPipeline,
        SlamPipeline,
    )
    from steroscopic_hardware_tpu.runtime.sources import SyntheticSource

    bus = FrameBus()
    slam_pipe = SlamPipeline(bus, CAM, slam_kwargs=dict(
        loop_closure=True, **VO_KW))
    matcher = BlockMatcher()
    matcher.set_params(
        type(matcher.get_params())(block_size=7, max_disparity=32))
    depth_pipe = DepthPipeline(bus, matcher, slam_pipeline=slam_pipe)
    assert depth_pipe._fused is not None
    assert slam_pipe.fused

    left = SyntheticSource(bus, "left", shape=(H, W), fps=60.0).start()
    right = SyntheticSource(bus, "right", shape=(H, W), fps=60.0,
                            shift=8).start()
    depth_pipe.start()
    slam_pipe.start()
    try:
        # generous: the CPU backend compiles the fused buckets AND the
        # 9 warmup programs concurrently before frames can flow
        deadline = time.time() + 120.0
        while time.time() < deadline:
            if slam_pipe.frames >= 4 and depth_pipe.frames >= 4:
                break
            time.sleep(0.1)
        snap = slam_pipe.snapshot()
        assert snap["frames"] >= 4, snap
        assert snap["fused"]
        assert depth_pipe.frames >= 4
        assert depth_pipe.errors == 0
        assert slam_pipe.errors == 0
        assert len(snap["positions"]) >= 4
        assert bus.latest("out") is not None
        assert bus.latest("depth") is not None
    finally:
        left.close()
        right.close()
        depth_pipe.close()
        slam_pipe.close()


def test_backend_warmup_compiles(rng):
    slam = StereoSLAM(CAM, async_backend=False, loop_closure=True,
                      **VO_KW)
    n = slam.warmup_backend()
    # match x2, pnp, BA windows (M=2..4), pose-graph bucket, BoW x2
    assert n >= 8


def test_fused_serve_sgm_engine_bitexact(rng):
    """The fused dispatch with the SGM serve engine matches the unfused
    SGMMatcher serve byte-for-byte (the slam-sgm product config)."""
    from steroscopic_hardware_tpu.models.blockmatch import SGMMatcher

    frames = _sequence(rng, n=2)
    slam = StereoSLAM(CAM, async_backend=False, **VO_KW)
    matcher = SGMMatcher()
    matcher.set_params(
        type(matcher.get_params())(block_size=7, max_disparity=32))
    fused = FusedServeTrack(matcher, slam)
    assert fused.engine == "sgm"
    pairs = [frames[0], frames[1]]
    flat, track = fused.step(pairs, fetch_all=True, colorize_dev=False)
    depths, rgb = split_serve(flat, 2, H, W, fetch_all=True,
                              colorize_dev=False)
    ref = np.asarray(matcher.compute_serve_async(
        pairs, fetch_all=True, colorize_dev=False))
    np.testing.assert_array_equal(depths, ref)
    assert track.xi_rel.shape == (2, 6)


def test_fused_retune_compiles_in_background(rng):
    """A live parameter retune must not stall the depth stream: the new
    program compiles in the background while serving continues on the
    outgoing parameters (counted), then swaps in."""
    frames = _sequence(rng, n=2)
    fused, matcher, slam = _mk(rng)
    fused.step([frames[0]], fetch_all=True, colorize_dev=False)
    n_exes = len(fused._exes)

    matcher.set_params(
        type(matcher.get_params())(block_size=9, max_disparity=32))
    fused.step([frames[1]], fetch_all=True, colorize_dev=False)
    assert fused.stale_param_serves >= 1  # served on outgoing params

    deadline = time.time() + 90.0
    while time.time() < deadline and len(fused._exes) <= n_exes:
        time.sleep(0.2)
    assert len(fused._exes) > n_exes, "background compile never landed"

    flat, _ = fused.step([frames[1]], fetch_all=True,
                         colorize_dev=False)
    depths, _ = split_serve(flat, 1, H, W, fetch_all=True,
                            colorize_dev=False)
    ref = np.asarray(matcher.compute_serve_async(
        [frames[1]], fetch_all=True, colorize_dev=False))
    np.testing.assert_array_equal(depths, ref)


def test_fused_exe_cache_keys_on_batch_shape(rng):
    """Different batch sizes are different SHAPES: each gets its own
    executable and none evicts another (regression: statics-only keying
    thrashed the cache whenever B changed)."""
    frames = _sequence(rng, n=4)
    fused, matcher, slam = _mk(rng)
    fused.step([frames[0]], fetch_all=True, colorize_dev=False)
    fused.step([frames[1], frames[2]], fetch_all=True,
               colorize_dev=False)
    fused.step([frames[3]], fetch_all=True, colorize_dev=False)
    assert len(fused._exes) == 2  # B=1 and B=2 coexist
