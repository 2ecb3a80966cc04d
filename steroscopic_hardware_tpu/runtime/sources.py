"""Frame sources — the ``Camera`` interface equivalent.

The reference defines a ``Camera`` interface with Stream/Pause/Resume/Close
and three implementations (``pkg/camera/types.go:32-45``): a file-backed
static camera on a 10 Hz ticker (``static.go:45``), a UART serial camera
speaking the start/ack/stop raw-gray protocol (``serial.go``), and the
output camera that runs the compute loop (``output.go``, reimplemented in
``runtime/pipeline.py``). Here:

* ``StaticSource``    — re-reads an image file at a fixed rate (upload and
                        test-image boot path, ``cmd/root.go:160-189``).
* ``SyntheticSource`` — procedurally generated stereo-shifted noise frames
                        (the golden-vector pattern of ``hardware/test.py``
                        as a live source; useful for soak tests).
* ``TcpSource``       — connects to a camera endpoint over TCP and speaks
                        the reference's wire protocol semantics (start
                        0xFFD8 / ack 0x01 / payload / stop 0xFFD9, framed
                        headers — ``serial.go:17-27``, ``camera_app.c:130-233``)
                        with reconnect + exponential backoff
                        (``serial.go:181-229``).

Each source runs a daemon thread publishing grayscale frames to a
``FrameBus`` slot, with pause/resume/close lifecycle.
"""

from __future__ import annotations

import socket
import threading
import time

import numpy as np

from steroscopic_hardware_tpu.runtime import wire
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.logger import get_logger


class BaseSource:
    """Lifecycle shared by all sources (pkg/camera/base.go equivalent)."""

    def __init__(self, bus: FrameBus, slot: str):
        self.bus = bus
        self.slot = slot
        self._paused = threading.Event()
        self._closed = threading.Event()
        self._thread: threading.Thread | None = None
        self.log = get_logger(f"{type(self).__name__}.{slot}")
        self.frames_published = 0

    # -- Camera interface ---------------------------------------------------
    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        return self

    def pause(self):
        self._paused.set()

    def resume(self):
        self._paused.clear()

    def close(self, timeout: float = 2.0):
        self._closed.set()
        if self._thread is not None:
            self._thread.join(timeout)

    @property
    def closed(self) -> bool:
        return self._closed.is_set()

    # -- implementation helpers --------------------------------------------
    def _publish(self, frame: np.ndarray):
        if not self._paused.is_set():
            self.bus.publish(self.slot, frame, source=type(self).__name__)
            self.frames_published += 1

    def _run(self):  # pragma: no cover - overridden
        raise NotImplementedError


class StaticSource(BaseSource):
    """Publishes a fixed image at ``fps`` (default 10 Hz like
    static.go:45). The file is re-read every ``reload_every`` frames so an
    upload can swap the backing file without restarting."""

    def __init__(self, bus, slot, path_or_array, fps: float = 10.0,
                 reload_every: int = 10):
        super().__init__(bus, slot)
        self.fps = fps
        self.reload_every = reload_every
        if isinstance(path_or_array, np.ndarray):
            self.path = None
            self._frame = path_or_array
        else:
            self.path = path_or_array
            self._frame = self._load()

    def _load(self) -> np.ndarray:
        from steroscopic_hardware_tpu.ops.gray import load_gray

        return load_gray(self.path)

    def _run(self):
        n = 0
        period = 1.0 / self.fps
        while not self._closed.is_set():
            t0 = time.time()
            if self.path is not None and n % self.reload_every == 0 and n > 0:
                try:
                    self._frame = self._load()
                except Exception:
                    # keep serving the last good frame (static.go:54-56
                    # retry-style resilience)
                    pass
            self._publish(self._frame)
            n += 1
            time.sleep(max(0.0, period - (time.time() - t0)))


class SyntheticSource(BaseSource):
    """Procedural stereo test pattern: drifting textured noise; the right
    channel (shift > 0) is the same texture shifted horizontally so the
    disparity engine sees a known ground truth."""

    def __init__(self, bus, slot, shape=(480, 640), fps: float = 30.0,
                 shift: int = 0, seed: int = 0):
        super().__init__(bus, slot)
        self.shape = shape
        self.fps = fps
        self.shift = shift
        rng = np.random.default_rng(seed)
        self._texture = rng.integers(0, 256, shape, dtype=np.uint8)

    def _run(self):
        n = 0
        period = 1.0 / self.fps
        while not self._closed.is_set():
            t0 = time.time()
            frame = np.roll(self._texture, n - self.shift, axis=1)
            self._publish(frame)
            n += 1
            time.sleep(max(0.0, period - (time.time() - t0)))


class TcpSource(BaseSource):
    """Streams frames from a TCP camera endpoint with the reference wire
    protocol; reconnects with exponential backoff 10ms -> 1s
    (serial.go:181-229)."""

    def __init__(self, bus, slot, host: str, port: int,
                 frame_timeout: float = 240.0):
        super().__init__(bus, slot)
        self.host = host
        self.port = port
        self.frame_timeout = frame_timeout  # serial.go:242 (4 min)
        self.reconnects = 0

    def _run(self):
        backoff = 0.01
        while not self._closed.is_set():
            try:
                with socket.create_connection(
                    (self.host, self.port), timeout=5.0
                ) as sock:
                    sock.settimeout(self.frame_timeout)
                    self.log.info("connected %s:%d", self.host, self.port)
                    # start request + ack (serial.go:140-168)
                    sock.sendall(wire.START_SEQ)
                    ack = sock.recv(1)
                    if ack != wire.ACK:
                        raise ConnectionError(f"bad ack {ack!r}")
                    backoff = 0.01
                    parser = wire.make_parser()
                    while not self._closed.is_set():
                        data = sock.recv(65536)
                        if not data:
                            raise ConnectionError("EOF")
                        for frame in parser.feed(data):
                            self._publish(frame)
                    sock.sendall(wire.END_SEQ)
            except (OSError, ConnectionError) as e:
                if self._closed.is_set():
                    break
                self.log.warning("stream error: %s; retry in %.0fms",
                                 e, backoff * 1000)
                self.reconnects += 1
                time.sleep(backoff)
                backoff = min(backoff * 2, 1.0)
