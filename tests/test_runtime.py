"""Streaming-runtime tests: bus, sources, manager, pipeline, wire
protocol, emitter<->TcpSource over a real socket, LZMA codec.

These are the protocol-level fakes the reference itself uses in place of
hardware (SURVEY.md section 4: UART assertions in image_receive.c TEST
mode; golden vectors for the fabric)."""

import time

import numpy as np
import pytest

from steroscopic_hardware_tpu.io import lzma_codec
from steroscopic_hardware_tpu.runtime import wire
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.emitter import CameraEmitter
from steroscopic_hardware_tpu.runtime.manager import CameraManager
from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
from steroscopic_hardware_tpu.runtime.sources import (
    StaticSource,
    SyntheticSource,
    TcpSource,
)
from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.utils.params import Parameters


def _wait(cond, timeout=5.0, dt=0.01):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(dt)
    return False


# -- bus ---------------------------------------------------------------------

def test_bus_publish_latest_wait(rng):
    bus = FrameBus()
    assert bus.latest("left") is None
    f1 = bus.publish("left", rng.integers(0, 256, (4, 4), dtype=np.uint8))
    assert f1.seq == 1
    f2 = bus.publish("left", rng.integers(0, 256, (4, 4), dtype=np.uint8))
    assert bus.latest("left").seq == 2
    assert bus.wait_next("left", 1, timeout=0.1).seq == 2
    assert bus.wait_next("left", 2, timeout=0.05) is None
    assert np.array_equal(bus.latest("left").data, f2.data)


# -- sources + manager -------------------------------------------------------

def test_static_source_publishes(tmp_path, rng):
    from steroscopic_hardware_tpu.io.png import write_png

    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    bus = FrameBus()
    src = StaticSource(bus, "left", p, fps=100.0).start()
    assert _wait(lambda: bus.seq("left") >= 3)
    assert np.array_equal(bus.latest("left").data, img)
    src.pause()
    s = bus.seq("left")
    time.sleep(0.1)
    assert bus.seq("left") <= s + 1  # at most one in-flight frame
    src.resume()
    assert _wait(lambda: bus.seq("left") > s + 1)
    src.close()
    assert src.closed


def test_manager_swap_and_close(rng):
    mgr = CameraManager()
    a = SyntheticSource(mgr.bus, "left", shape=(8, 16), fps=200.0)
    mgr.set_source("left", a)
    assert _wait(lambda: mgr.bus.seq("left") > 0)
    b = SyntheticSource(mgr.bus, "left", shape=(8, 16), fps=200.0)
    mgr.set_source("left", b)  # pause-swap-close dance
    assert a.closed and not b.closed
    st = mgr.status()
    assert st["left"]["type"] == "SyntheticSource"
    mgr.close_all()
    assert b.closed
    assert mgr.status() == {}


# -- pipeline ----------------------------------------------------------------

def test_pipeline_end_to_end(rng):
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=100.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=100.0, shift=4, seed=7))
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher).start()
    try:
        assert _wait(lambda: pipe.frames >= 3, timeout=20.0)
        out = mgr.bus.latest("out")
        assert out is not None and out.data.shape == (32, 64)
        m = pipe.metrics()
        assert m["frames"] >= 3 and m["block_size"] == 7
    finally:
        pipe.close()
        mgr.close_all()


def test_pipeline_batches_backlogged_frames(rng):
    """The serving loop must micro-batch the pairs that arrived while the
    previous batch was in flight (collector thread + power-of-two newest
    selection) and publish a depth for every batched frame."""
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=200.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=200.0, shift=4, seed=7))
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher).start()
    try:
        # at 200 Hz sources vs ~10 Hz XLA-on-CPU compute, backlog forms
        # and batches must exceed 1 (frames counter advances per batched
        # frame; out seq advances per publish)
        assert _wait(lambda: pipe.frames >= 6, timeout=30.0)
        assert mgr.bus.seq("out") >= 6
        m = pipe.metrics()
        assert m["frames"] >= 6 and m["fps"] > 0
        # colorized viz published for the newest frame of each batch
        assert mgr.bus.latest("depth") is not None
        assert mgr.bus.latest("depth").data.shape == (32, 64, 3)
    finally:
        pipe.close()
        mgr.close_all()


def test_serve_light_fetch_matches_full(rng):
    """preview_scale/fetch_all=False ("light" tunnel mode) must return the
    SAME newest depth as the full packed layout, plus an RGB preview equal
    to colorizing the k x k integer-mean-pooled depth."""
    from steroscopic_hardware_tpu.ops.colorize import colorize_disparity

    H, W, k = 32, 64, 2
    pairs = [
        (rng.integers(0, 256, (H, W), dtype=np.uint8),
         rng.integers(0, 256, (H, W), dtype=np.uint8))
        for _ in range(3)
    ]
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    full = np.asarray(matcher.compute_serve_async(pairs))
    depths = full[: len(pairs)]

    flat = np.asarray(matcher.compute_serve_async(
        pairs, preview_scale=k, fetch_all=False))
    assert flat.ndim == 1
    assert flat.size == H * W + (H // k) * (W // k) * 3
    np.testing.assert_array_equal(
        flat[: H * W].reshape(H, W), depths[-1])

    s = depths[-1].astype(np.int64).reshape(H // k, k, W // k, k).sum((1, 3))
    pooled = ((s + k * k // 2) // (k * k)).astype(np.uint8)
    np.testing.assert_array_equal(
        flat[H * W:].reshape(H // k, W // k, 3), colorize_disparity(pooled))


def test_sgm_serve_async_matches_per_frame(rng):
    """SGMMatcher's fused serve dispatch must produce the same uint8 maps
    as its per-frame compute()/compute_checked() (serving parity with
    BlockMatcher)."""
    from steroscopic_hardware_tpu.models.blockmatch import SGMMatcher

    H, W = 24, 48
    pairs = [
        (rng.integers(0, 256, (H, W), dtype=np.uint8),
         rng.integers(0, 256, (H, W), dtype=np.uint8))
        for _ in range(2)
    ]
    m = SGMMatcher()
    m.set_params(Parameters(7, 16))
    packed = np.asarray(m.compute_serve_async(pairs))
    assert packed.shape == (len(pairs) + 3, H, W)
    for b, (l, r) in enumerate(pairs):
        np.testing.assert_array_equal(packed[b], m.compute(l, r))

    packed_lr = np.asarray(m.compute_serve_async(pairs, lr=True))
    want, _ = m.compute_checked(*pairs[-1])
    np.testing.assert_array_equal(packed_lr[len(pairs) - 1], want)

    flat = np.asarray(m.compute_serve_async(
        pairs, preview_scale=2, fetch_all=False))
    assert flat.size == H * W + (H // 2) * (W // 2) * 3
    np.testing.assert_array_equal(
        flat[: H * W].reshape(H, W), packed[len(pairs) - 1])


def test_pipeline_preview_scale_light_mode(rng):
    """A preview_scale>1 pipeline publishes the full-res newest depth to
    the out slot and a downscaled RGB preview to the depth slot."""
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=100.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=100.0, shift=4, seed=7))
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher, preview_scale=2).start()
    try:
        assert _wait(lambda: pipe.frames >= 3, timeout=20.0)
        out = mgr.bus.latest("out")
        assert out is not None and out.data.shape == (32, 64)
        depth = mgr.bus.latest("depth")
        assert depth is not None and depth.data.shape == (16, 32, 3)
    finally:
        pipe.close()
        mgr.close_all()


# -- wire protocol ------------------------------------------------------------

@pytest.mark.parametrize("codec", [wire.CODEC_RAW, wire.CODEC_RANGE,
                                   wire.CODEC_LZMA])
def test_wire_roundtrip(rng, codec):
    frame = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    blob = wire.encode_frame(frame, codec=codec)
    parser = wire.FrameParser()
    # feed in awkward chunk sizes with garbage prefix
    stream = b"junk\xff" + blob + b"\xfftail"
    got = []
    for i in range(0, len(stream), 7):
        got.extend(parser.feed(stream[i : i + 7]))
    assert len(got) == 1
    assert np.array_equal(got[0], frame)
    assert parser.bytes_dropped >= 5


def test_wire_multiple_frames(rng):
    frames = [rng.integers(0, 256, (8, 16), dtype=np.uint8)
              for _ in range(3)]
    stream = b"".join(wire.encode_frame(f) for f in frames)
    parser = wire.FrameParser()
    got = parser.feed(stream)
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


# -- emitter <-> TcpSource over a real socket --------------------------------

def test_tcp_source_receives_frames(rng):
    base = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    emitter = CameraEmitter(
        lambda n: np.roll(base, n, axis=1), fps=200.0
    ).start()
    bus = FrameBus()
    src = TcpSource(bus, "left", "127.0.0.1", emitter.port)
    src.start()
    try:
        assert _wait(lambda: bus.seq("left") >= 3)
        got = bus.latest("left").data
        assert got.shape == (16, 32)
    finally:
        src.close()
        emitter.close()


@pytest.mark.parametrize("codec", [wire.CODEC_RANGE, wire.CODEC_LZMA])
def test_tcp_source_compressed_codecs_live(rng, codec):
    """Live soak of the compressed wire codecs (VERDICT r1 missing #1 /
    next-step 6): a CameraEmitter streaming codec 1 (native adaptive
    range coder) / codec 2 (LZMA) into a TcpSource over a real socket
    must deliver frames bit-exactly."""
    base = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    emitter = CameraEmitter(
        lambda n: np.roll(base, n % 7, axis=1), fps=200.0, codec=codec
    ).start()
    bus = FrameBus()
    src = TcpSource(bus, "left", "127.0.0.1", emitter.port)
    src.start()
    try:
        assert _wait(lambda: bus.seq("left") >= 5)
        f = bus.latest("left")
        # the emitter rolls by n%7; the received frame must be one of the
        # 7 exact variants (bit-exact transport, no codec loss)
        variants = [np.roll(base, k, axis=1) for k in range(7)]
        assert any(np.array_equal(f.data, v) for v in variants)
    finally:
        src.close()
        emitter.close()


def test_tcp_source_reconnects(rng):
    """Source retries with backoff when the endpoint is initially down
    (serial.go:181-229 behavior)."""
    bus = FrameBus()
    src = TcpSource(bus, "left", "127.0.0.1", 1)  # nothing listens on :1
    src.start()
    assert _wait(lambda: src.reconnects >= 2, timeout=5.0)
    src.close()


# -- lzma codec ---------------------------------------------------------------

def test_lzma_roundtrip_levels(rng):
    data = rng.integers(0, 50, 10_000, dtype=np.uint8).tobytes()
    for level in (1, 5, 9):
        enc = lzma_codec.compress(data, level)
        assert lzma_codec.decompress(enc) == data
        assert len(enc) < len(data)


def test_lzma_known_size_header(rng):
    data = b"steroscopic" * 500
    enc = lzma_codec.compress_known_size(data, 5)
    # header size field holds the payload length
    assert int.from_bytes(enc[5:13], "little") == len(data)
    assert lzma_codec.decompress(enc) == data


def test_lzma_streaming(rng):
    data = rng.integers(0, 10, 50_000, dtype=np.uint8).tobytes()
    w = lzma_codec.Writer(level=3)
    for i in range(0, len(data), 4096):
        w.write(data[i : i + 4096])
    enc = w.close()
    r = lzma_codec.Reader()
    out = b"".join(r.read(enc[i : i + 1024])
                   for i in range(0, len(enc), 1024))
    assert out == data


def test_lzma_empty():
    assert lzma_codec.decompress(lzma_codec.compress(b"")) == b""


def test_lzma_bad_level():
    with pytest.raises(ValueError):
        lzma_codec.compress(b"x", 0)
    with pytest.raises(ValueError):
        lzma_codec.compress(b"x", 10)


def test_native_parser_matches_python(rng):
    """The C++ parser must behave identically to the Python one, including
    resync over garbage and multi-frame chunked feeds."""
    from steroscopic_hardware_tpu._native import get_lib
    from steroscopic_hardware_tpu.runtime.wire import (
        FrameParser, NativeFrameParser,
    )

    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    frames = [rng.integers(0, 256, (8, 16), dtype=np.uint8)
              for _ in range(3)]
    stream = (b"junk\xff" + wire.encode_frame(frames[0])
              + b"\x00\x01" + wire.encode_frame(frames[1])
              + wire.encode_frame(frames[2]) + b"tail")
    for chunk in (7, 64, len(stream)):
        py, nat = FrameParser(), NativeFrameParser(lib)
        got_py, got_nat = [], []
        for i in range(0, len(stream), chunk):
            got_py.extend(py.feed(stream[i:i + chunk]))
            got_nat.extend(nat.feed(stream[i:i + chunk]))
        assert len(got_py) == len(got_nat) == 3
        for a, b in zip(got_py, got_nat):
            assert np.array_equal(a, b)


def test_serve_depth_only_fetch_matches_full(rng):
    """colorize_dev=False (host-LUT serving mode) must return the same
    depth maps as the packed-RGB layout, with no RGB on the wire."""
    H, W = 32, 64
    pairs = [
        (rng.integers(0, 256, (H, W), dtype=np.uint8),
         rng.integers(0, 256, (H, W), dtype=np.uint8))
        for _ in range(3)
    ]
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    full = np.asarray(matcher.compute_serve_async(pairs))
    depths_only = np.asarray(matcher.compute_serve_async(
        pairs, colorize_dev=False))
    assert depths_only.shape == (len(pairs), H, W)
    np.testing.assert_array_equal(depths_only, full[: len(pairs)])
    newest = np.asarray(matcher.compute_serve_async(
        pairs, fetch_all=False, colorize_dev=False))
    assert newest.shape == (1, H, W)
    np.testing.assert_array_equal(newest[0], full[len(pairs) - 1])


def test_pipeline_host_colorize_publishes_lut_rgb(rng):
    """The default pipeline (host_colorize=True) publishes full-res depth
    and a host-LUT-colorized preview identical to colorizing the fetched
    depth."""
    from steroscopic_hardware_tpu.ops.colorize import colorize_disparity

    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=100.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=100.0, shift=4, seed=7))
    matcher = BlockMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher, host_colorize=True).start()
    try:
        assert _wait(lambda: pipe.frames >= 3, timeout=20.0)
        out = mgr.bus.latest("out")
        depth = mgr.bus.latest("depth")
        assert out is not None and out.data.shape == (32, 64)
        assert depth is not None and depth.data.shape == (32, 64, 3)
    finally:
        pipe.close()
        mgr.close_all()
    assert depth.data.dtype == np.uint8
    # Exact depth/RGB correspondence (ADVICE r3): a synchronized pair via
    # step() on a fresh, non-started pipeline — the published preview
    # must be BIT-IDENTICAL to colorizing the depth published in the
    # same step, and LUT == polynomial path.
    from steroscopic_hardware_tpu.ops.colorize import colorize_disparity_lut

    pipe2 = DepthPipeline(mgr.bus, matcher, host_colorize=True)
    newest = pipe2.step()
    assert newest is not None
    depth_frame = mgr.bus.latest("out").data
    rgb_frame = mgr.bus.latest("depth").data
    np.testing.assert_array_equal(newest, depth_frame)
    np.testing.assert_array_equal(
        colorize_disparity_lut(depth_frame), rgb_frame)
    np.testing.assert_array_equal(
        colorize_disparity(depth_frame), rgb_frame)


def test_pipeline_sgm_engine_host_colorize(rng):
    """The SGM engine rides the same host-LUT depth-only serve path as
    the SAD engine (serving parity, VERDICT r2 directive #10)."""
    from steroscopic_hardware_tpu.models.blockmatch import SGMMatcher

    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=100.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=100.0, shift=4, seed=7))
    matcher = SGMMatcher()
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher, host_colorize=True).start()
    try:
        # first SGM serve compile on CPU can take >30 s
        assert _wait(lambda: pipe.frames >= 2 or pipe.errors > 0,
                     timeout=120.0)
        assert pipe.errors == 0
        out = mgr.bus.latest("out")
        depth = mgr.bus.latest("depth")
        assert out is not None and out.data.shape == (32, 64)
        assert depth is not None and depth.data.shape == (32, 64, 3)
    finally:
        pipe.close()
        mgr.close_all()


def test_pipeline_latency_decomposition_and_queue_cap(rng):
    """The capture->publish latency decomposition (queue/serve/host
    p50+p95) must appear in metrics, and the capped collector inbox
    must convert backlog to counted queue_dropped, never silent loss
    (VERDICT r3 weak #7)."""
    mgr = CameraManager()
    mgr.set_source("left", SyntheticSource(
        mgr.bus, "left", shape=(32, 64), fps=200.0, shift=0, seed=7))
    mgr.set_source("right", SyntheticSource(
        mgr.bus, "right", shape=(32, 64), fps=200.0, shift=4, seed=7))
    class SlowMatcher(BlockMatcher):
        # deterministic backlog: +80 ms/batch against 200 fps sources
        def compute_serve_async(self, pairs, **kw):
            time.sleep(0.08)
            return super().compute_serve_async(pairs, **kw)

    matcher = SlowMatcher(backend="xla")
    matcher.set_params(Parameters(7, 16))
    pipe = DepthPipeline(mgr.bus, matcher, max_batch=2,
                         max_queue=2).start()
    try:
        assert _wait(lambda: pipe.frames >= 6, timeout=30.0)
        m = pipe.metrics()
        for part in ("queue", "serve", "host"):
            assert f"lat_{part}_p50" in m, m
            assert f"lat_{part}_p95" in m, m
        assert m["lat_serve_p50"] > 0
        # an 80 ms/frame pipeline against 200 fps sources MUST overflow
        # the 2-deep inbox: backlog shows up as counted drops, not lag
        assert _wait(lambda: pipe.queue_dropped > 0, timeout=10.0), (
            pipe.metrics())
    finally:
        pipe.close()
        mgr.close_all()


def test_dedup_uploads_skips_identical_pairs():
    """--dedup-uploads: byte-identical consecutive pairs never reach
    the compute batch (paused/static feeds; also the dev-tunnel
    upload-retention mitigation — see tools/leak_probe.py)."""
    import numpy as np
    import time

    from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
    from steroscopic_hardware_tpu.runtime.bus import FrameBus
    from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
    from steroscopic_hardware_tpu.runtime.sources import StaticSource

    bus = FrameBus()
    frame = np.random.default_rng(0).integers(
        0, 256, (64, 96), np.uint8)
    m = BlockMatcher()
    m.set_params(type(m.get_params())(block_size=7, max_disparity=16))
    pipe = DepthPipeline(bus, m, colorize=False, dedup_uploads=True)
    left = StaticSource(bus, "left", frame, fps=60.0).start()
    right = StaticSource(bus, "right", frame, fps=60.0).start()
    pipe.start()
    try:
        deadline = time.time() + 30.0
        while time.time() < deadline and pipe.frames < 1:
            time.sleep(0.05)
        assert pipe.frames >= 1  # the first distinct pair computes
        time.sleep(1.0)
        assert pipe.dup_skipped > 10  # the re-published clones do not
        assert pipe.frames <= 3
    finally:
        left.close()
        right.close()
        pipe.close()
