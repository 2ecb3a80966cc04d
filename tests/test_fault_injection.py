"""Fault-injection tests for the ingest path (SURVEY.md section 5: the
reference's only fault tooling is image_receive.c TEST mode; here we
inject corruption, truncation, and disconnects and assert recovery)."""

import socket
import threading
import time

import numpy as np

from steroscopic_hardware_tpu.runtime import wire
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.sources import TcpSource


def _wait(cond, timeout=8.0, dt=0.01):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(dt)
    return False


class ChaosEmitter:
    """Protocol emitter that injects faults between valid frames."""

    def __init__(self, frames, faults):
        self.frames = frames
        self.faults = faults  # list of callables(bytes)->bytes per frame
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.accepted = 0
        self._closed = threading.Event()
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        while not self._closed.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            self.accepted += 1
            with conn:
                try:
                    if conn.recv(2) != wire.START_SEQ:
                        continue
                    conn.sendall(wire.ACK)
                    for frame, fault in zip(self.frames, self.faults):
                        blob = wire.encode_frame(frame)
                        conn.sendall(fault(blob))
                        time.sleep(0.01)
                except OSError:
                    pass
            # connection closes -> client must reconnect

    def close(self):
        self._closed.set()
        self.sock.close()


def test_recovers_from_garbage_between_frames(rng):
    frames = [rng.integers(0, 256, (8, 16), dtype=np.uint8)
              for _ in range(4)]
    faults = [
        lambda b: b,
        lambda b: b"\x00\xff\xd8garbage" + b,     # fake start marker + junk
        lambda b: b[: len(b) // 2],               # truncated frame
        lambda b: b,                              # parser must resync
    ]
    em = ChaosEmitter(frames, faults)
    bus = FrameBus()
    src = TcpSource(bus, "left", "127.0.0.1", em.port).start()
    try:
        # valid frames 0, 1 and 3 should land despite the noise
        assert _wait(lambda: bus.seq("left") >= 3)
    finally:
        src.close()
        em.close()


def test_reconnect_after_disconnect(rng):
    frames = [rng.integers(0, 256, (8, 16), dtype=np.uint8)] * 2
    em = ChaosEmitter(frames, [lambda b: b, lambda b: b])
    bus = FrameBus()
    src = TcpSource(bus, "left", "127.0.0.1", em.port).start()
    try:
        assert _wait(lambda: bus.seq("left") >= 2)
        # the emitter drops the connection after its frames; the source
        # must reconnect and pull the stream again
        assert _wait(lambda: em.accepted >= 2)
        assert _wait(lambda: bus.seq("left") >= 4)
    finally:
        src.close()
        em.close()


def test_parser_never_crashes_on_fuzz(rng):
    parser = wire.FrameParser()
    for _ in range(50):
        blob = rng.integers(0, 256, rng.integers(1, 400),
                            dtype=np.uint8).tobytes()
        parser.feed(blob)  # must not raise
    # and still parses a valid frame afterwards
    f = rng.integers(0, 256, (4, 8), dtype=np.uint8)
    got = parser.feed(wire.encode_frame(f))
    # fuzz may have left a partial header consuming the start marker;
    # a second frame must definitely parse
    got += parser.feed(wire.encode_frame(f))
    assert any(np.array_equal(g, f) for g in got)
