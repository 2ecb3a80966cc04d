"""Process-wide device dispatch serialization.

One process may hold the chip, but several THREADS inside it can race
dispatches: the depth pipeline's batched serve executions and the live
SLAM tracker's per-frame step. On the remote (axon-tunnel) transport
these concurrent in-flight executions can starve each other
indefinitely — observed live: the depth stream served 15 fps while the
SLAM thread's freshly compiled step sat in its first execution for 10+
minutes (round-4 serve_bench). RPCs through the tunnel serialize anyway,
so a host-side lock around each execution costs no throughput; it only
makes the serialization explicit and fair.

Colocated hosts (sub-ms PCIe dispatch) pay a negligible critical
section. Long-running first-call compiles of SPORADIC backend programs
(windowed BA, pose-graph solve) intentionally do NOT take this lock —
holding it through a 30 s remote compile would stall the frame loop,
and lone dispatches have been observed to coexist with the streams.
"""

from __future__ import annotations

import threading

device_lock = threading.RLock()
