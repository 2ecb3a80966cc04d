"""Transport-aware device dispatch serialization.

One process may hold the chip, but several THREADS inside it can race
dispatches: the depth pipeline's batched serve executions and the live
SLAM tracker's per-frame step. On the remote (axon-tunnel) transport
these concurrent in-flight executions can starve each other
indefinitely — observed live: the depth stream served 15 fps while the
SLAM thread's freshly compiled step sat in its first execution for 10+
minutes (round-4 serve_bench). RPCs through the tunnel serialize anyway,
so a host-side lock around each execution costs no throughput there; it
only makes the serialization explicit and fair.

On a COLOCATED device (local PCIe TPU, CPU) the hardware overlaps
streams and a process-wide lock would forfeit real concurrency
(VERDICT r4 weak #5), so the lock resolves to a no-op unless forced.

Two dispatch classes, enforced in code (not prose):

* ``dispatch("stream")`` (or ``with device_lock:``) — streaming
  executions that run at frame rate (depth serve batches, SLAM
  tracking). Serialized on remote transports.
* ``dispatch("sporadic")`` — sporadic backend programs (windowed BA,
  pose-graph solves, loop-closure match/PnP). NEVER takes the lock:
  holding it through a long solver execution (or a 30 s first-call
  remote compile) would stall the frame loop, and lone dispatches have
  been observed to coexist with the streams. Callers must AOT-warm
  these programs at boot (``StereoSLAM.warmup_backend``) so no remote
  compile hides inside a sporadic execution.

Policy resolution (lazy — deciding needs jax backend initialization,
which must not happen at import time):
  * ``SHTPU_DISPATCH_SERIALIZE=1``    -> always serialize
  * ``SHTPU_DISPATCH_SERIALIZE=0``    -> never serialize
  * unset / ``auto``                  -> serialize iff the backend's
    ``platform_version`` identifies the axon remote tunnel.
"""

from __future__ import annotations

import contextlib
import os
import threading


def _remote_transport() -> bool:
    """True when the jax backend reaches the device over the axon
    tunnel (serialized RPC transport) rather than local PCIe/host."""
    try:
        import jax

        ver = getattr(jax.devices()[0].client, "platform_version", "")
        return "axon" in str(ver).lower()
    except Exception:
        return True  # fail safe: serialize


class _DispatchLock:
    """Process-wide dispatch serializer that is a real lock only when
    the transport needs one (see module docstring). Context-manager
    compatible with the plain RLock it replaces."""

    def __init__(self):
        self._lock = threading.RLock()
        self._serialize: bool | None = None

    def _resolve(self) -> bool:
        env = os.environ.get("SHTPU_DISPATCH_SERIALIZE", "auto").lower()
        if env in ("1", "true", "always"):
            return True
        if env in ("0", "false", "never"):
            return False
        return _remote_transport()

    @property
    def serialize(self) -> bool:
        if self._serialize is None:
            self._serialize = self._resolve()
        return self._serialize

    def force(self, serialize: bool | None) -> None:
        """Override the policy (tests / explicit config); None re-arms
        lazy auto-detection."""
        self._serialize = serialize

    def __enter__(self):
        if self.serialize:
            self._lock.acquire()
        return self

    def __exit__(self, *exc):
        if self.serialize:
            self._lock.release()
        return False


device_lock = _DispatchLock()


@contextlib.contextmanager
def dispatch(kind: str = "stream"):
    """Dispatch-discipline context manager — the in-code form of the
    two-class rule above. Wrap every device execution cluster in one of:

        with dispatch("stream"):    # frame-rate serving / tracking
        with dispatch("sporadic"):  # backend solvers (BA, pose graph)
    """
    if kind == "stream":
        with device_lock:
            yield
    elif kind == "sporadic":
        yield
    else:
        raise ValueError(f"unknown dispatch kind {kind!r}")
