"""Real serial transport (VERDICT r4 directive #4): SerialSource speaks
the reference's 0xFFD8/ack/0xFFD9 protocol over an actual termios
device (``pkg/camera/serial.go:46-91``), proven hardware-free against a
SerialEmitter on a pty (``os.openpty`` gives a real tty pair), with
fault injection and the /ports + /configure serving surface."""

import os
import threading
import time

import numpy as np

from steroscopic_hardware_tpu.runtime import wire
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.emitter import SerialEmitter
from steroscopic_hardware_tpu.runtime.sources import (
    SerialSource,
    list_serial_ports,
)


def _wait(cond, timeout=10.0, dt=0.01):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(dt)
    return False


def _frames(n=8, shape=(48, 64), seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, shape, dtype=np.uint8)
            for _ in range(n)]


def _pty_pair():
    master, slave = os.openpty()
    return master, os.ttyname(slave), slave


def test_serial_source_streams_frames_over_pty():
    frames = _frames()
    master, slave_path, slave_fd = _pty_pair()
    em = SerialEmitter(lambda i: frames[i % len(frames)], master,
                       fps=200.0, max_frames=len(frames)).start()
    bus = FrameBus()
    src = SerialSource(bus, "left", slave_path, baud=115200,
                       frame_timeout=5.0)
    src.start()
    try:
        assert _wait(lambda: src.frames_published >= len(frames))
        got = bus.latest("left")
        assert got is not None and got.data.shape == frames[0].shape
        # last published frame is bit-exact the last emitted one
        np.testing.assert_array_equal(got.data,
                                      frames[(em.frames_sent - 1)
                                             % len(frames)])
    finally:
        src.close()
        em.close()
        os.close(slave_fd)


def test_serial_source_all_codecs_roundtrip():
    for codec in (wire.CODEC_RAW, wire.CODEC_RANGE, wire.CODEC_LZMA):
        frames = _frames(n=3, seed=codec)
        master, slave_path, slave_fd = _pty_pair()
        em = SerialEmitter(lambda i: frames[i % 3], master, codec=codec,
                           fps=200.0, max_frames=3).start()
        bus = FrameBus()
        src = SerialSource(bus, "left", slave_path, frame_timeout=5.0)
        src.start()
        try:
            assert _wait(lambda: src.frames_published >= 3), codec
            np.testing.assert_array_equal(bus.latest("left").data,
                                          frames[2])
        finally:
            src.close()
            em.close()
            os.close(slave_fd)


def test_serial_source_resyncs_through_garbage():
    """Garbage bytes between frames must not kill the stream — the
    parser drops them and resyncs on the next start marker (the serial
    reader behavior the reference's scan loop has)."""
    frames = _frames(n=4)
    master, slave_path, slave_fd = _pty_pair()
    bus = FrameBus()
    src = SerialSource(bus, "left", slave_path, frame_timeout=5.0)

    def emit():
        # hand-rolled firmware loop with injected garbage
        buf = b""
        while len(buf) < 2:
            buf += os.read(master, 2 - len(buf))
            if buf[-2:] == wire.START_SEQ:
                break
        os.write(master, wire.ACK)
        for i, f in enumerate(frames):
            os.write(master, wire.encode_frame(f))
            os.write(master, b"\x00\xffjunk\xd8garbage" * 3)
        # a truncated frame at the end must simply be dropped
        os.write(master, wire.encode_frame(frames[0])[:40])

    t = threading.Thread(target=emit, daemon=True)
    src.start()
    t.start()
    try:
        assert _wait(lambda: src.frames_published >= len(frames))
        np.testing.assert_array_equal(bus.latest("left").data,
                                      frames[-1])
    finally:
        src.close()
        os.close(master)
        os.close(slave_fd)


def test_serial_source_reconnect_backoff_on_dead_device():
    """Opening a path that is not a serial device fails fast and
    retries with backoff (never busy-spins, never crashes the thread)."""
    bus = FrameBus()
    src = SerialSource(bus, "left", "/nonexistent/ttyXYZ",
                       frame_timeout=1.0)
    src.start()
    try:
        assert _wait(lambda: src.reconnects >= 2, timeout=5.0)
        assert src.frames_published == 0
    finally:
        src.close()


def test_list_serial_ports_runs_and_filters():
    ports = list_serial_ports()
    assert isinstance(ports, list)
    for p in ports:
        assert p.startswith("/dev/")


def test_server_configure_serial_end_to_end():
    """POST /configure with device= attaches a SerialSource; /ports
    reports it; frames flow into the bus through the HTTP-configured
    serial camera."""
    import json
    import urllib.request

    from steroscopic_hardware_tpu.runtime.manager import CameraManager
    from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
    from steroscopic_hardware_tpu.runtime.server import (
        AppContext,
        Server,
    )

    frames = _frames(n=64)
    master, slave_path, slave_fd = _pty_pair()
    em = SerialEmitter(lambda i: frames[i % len(frames)], master,
                       fps=100.0).start()

    manager = CameraManager()
    pipe = DepthPipeline(manager.bus, colorize=False)
    ctx = AppContext(manager=manager, pipeline=pipe)
    server = Server(ctx, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        body = f"device={slave_path}&baud=115200".encode()
        with urllib.request.urlopen(urllib.request.Request(
                base + "/left/configure", data=body)) as r:
            resp = json.loads(r.read())
        assert resp["device"] == slave_path
        assert resp["baud"] == 115200

        assert _wait(
            lambda: manager.bus.latest("left") is not None, timeout=8.0)

        with urllib.request.urlopen(base + "/ports") as r:
            ports = json.loads(r.read())["ports"]
        configured = [p for p in ports
                      if p.get("kind") == "configured"
                      and p.get("device") == slave_path]
        assert configured and configured[0]["baud"] == 115200
    finally:
        server.shutdown()
        em.close()
        os.close(slave_fd)
