"""Concurrency stress tests (SURVEY.md section 5: the reference has no
race detection; its atomic-params + pause-swap idioms are replicated here
and hammered under real thread contention)."""

import threading
import time

import numpy as np

from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.ops.sad_golden import disparity_numpy
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.manager import CameraManager
from steroscopic_hardware_tpu.runtime.pipeline import DepthPipeline
from steroscopic_hardware_tpu.runtime.sources import SyntheticSource
from steroscopic_hardware_tpu.utils.params import Parameters


def test_param_updates_during_compute(rng):
    """Hammer parameter swaps while the pipeline computes: every output
    frame must be bit-exact for SOME envelope parameter set (params apply
    atomically per frame, never mid-frame — sad.go:51-53 semantics)."""
    left = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    param_sets = [Parameters(3, 16), Parameters(7, 32), Parameters(9, 16)]
    expected = {
        p: disparity_numpy(left, right, p.block_size, p.max_disparity)
        for p in param_sets
    }

    bus = FrameBus()
    matcher = BlockMatcher(backend="xla")
    pipe = DepthPipeline(bus, matcher)
    stop = threading.Event()

    def swapper():
        i = 0
        while not stop.is_set():
            matcher.set_params(param_sets[i % len(param_sets)])
            i += 1
            time.sleep(0.001)

    th = threading.Thread(target=swapper, daemon=True)
    th.start()
    try:
        outputs = []
        for _ in range(30):
            bus.publish("left", left)
            bus.publish("right", right)
            outputs.append(pipe.step())
    finally:
        stop.set()
        th.join(1)

    for out in outputs:
        assert any(
            np.array_equal(out, want) for want in expected.values()
        ), "output matched no parameter set: mid-frame param tear"


def test_manager_swap_storm():
    """Rapid source hot-swaps must never deadlock or leak running
    sources."""
    mgr = CameraManager()
    for i in range(30):
        mgr.set_source("left", SyntheticSource(
            mgr.bus, "left", shape=(8, 16), fps=500.0, seed=i))
    st = mgr.status()
    assert st["left"]["type"] == "SyntheticSource"
    mgr.close_all()
    assert mgr.status() == {}


def test_bus_concurrent_producers_consumers(rng):
    bus = FrameBus()
    n_frames = 200
    errors = []

    def producer():
        for i in range(n_frames):
            bus.publish("x", np.full((4, 4), i % 256, np.uint8))
            time.sleep(0.0005)

    def consumer():
        # latest-value slots drop intermediate frames by design; assert
        # monotonic observation up to the final frame
        last = 0
        while last < n_frames:
            f = bus.wait_next("x", last, timeout=5.0)
            if f is None:
                errors.append(f"timeout at seq {last}")
                return
            if f.seq <= last:
                errors.append(f"non-monotonic seq {f.seq} <= {last}")
                return
            last = f.seq

    threads = [threading.Thread(target=consumer) for _ in range(4)]
    for t in threads:
        t.start()
    producer()
    for t in threads:
        t.join(10)
    assert not errors, errors


def test_stale_source_detection():
    mgr = CameraManager()
    src = SyntheticSource(mgr.bus, "left", shape=(8, 16), fps=100.0)
    mgr.set_source("left", src)
    time.sleep(0.1)
    assert mgr.status(stale_after=2.0)["left"]["stale"] is False
    src.pause()
    time.sleep(0.25)
    assert mgr.status(stale_after=0.2)["left"]["stale"] is True
    mgr.close_all()


def test_dispatch_lock_policy_and_classes():
    """devlock: env-forced policy resolution, the two dispatch classes
    (stream serializes iff policy on; sporadic NEVER blocks), and
    re-arming auto-detection."""
    import threading
    import time

    from steroscopic_hardware_tpu.utils import devlock

    lock = devlock.device_lock
    old = lock._serialize
    try:
        lock.force(True)
        assert lock.serialize is True
        # stream dispatch serializes: a holder blocks a second stream
        entered = threading.Event()
        release = threading.Event()

        def holder():
            with devlock.dispatch("stream"):
                entered.set()
                release.wait(5.0)

        t = threading.Thread(target=holder, daemon=True)
        t.start()
        assert entered.wait(2.0)
        # sporadic NEVER waits on the stream lock
        t0 = time.monotonic()
        with devlock.dispatch("sporadic"):
            pass
        assert time.monotonic() - t0 < 0.5
        # a second stream would block; probe with a timed thread
        got = threading.Event()

        def second():
            with devlock.dispatch("stream"):
                got.set()

        t2 = threading.Thread(target=second, daemon=True)
        t2.start()
        assert not got.wait(0.3)  # blocked behind the holder
        release.set()
        assert got.wait(2.0)

        lock.force(False)
        assert lock.serialize is False
        # with serialization off, streams overlap freely
        release2 = threading.Event()
        entered2 = threading.Event()

        def holder2():
            with devlock.dispatch("stream"):
                entered2.set()
                release2.wait(5.0)

        t3 = threading.Thread(target=holder2, daemon=True)
        t3.start()
        assert entered2.wait(2.0)
        t0 = time.monotonic()
        with devlock.dispatch("stream"):
            pass
        assert time.monotonic() - t0 < 0.5
        release2.set()

        try:
            devlock.dispatch("bogus").__enter__()
            raise AssertionError("bogus kind accepted")
        except ValueError:
            pass
    finally:
        lock.force(old)
