#!/usr/bin/env python
"""Characterize the dev tunnel's per-upload host-memory retention.

Finding (2026-08-21, round 5): through the axon remote-TPU transport,
EVERY ``jax.device_put`` retains approximately the full payload in host
RSS, permanently — independent of the source object's identity, of
garbage collection, of explicit ``Array.delete()``, and of
``malloc_trim``. 40 uploads of a 4.9 MB array grow RSS by ~190 MB; 400
uploads of 64 KB grow it by ~20 MB (≈ total bytes uploaded). The
device-side execute/fetch path retains ~nothing (~0.3 MB/iter at
2.4 MB fetched). This is a transport-client bug, not a framework leak:
the depth-only serving soak leaks at exactly (upload bytes)/s while the
pure-CPU engine soak is flat modulo bounded jit caches.

Consequences for this repo: long tunnel-hosted serving runs grow RSS at
~wire-upload rate (~0.55 MB per VGA frame served). Mitigations: the
framework already minimizes uploads by design (one upload per serve
batch, zero duplicate uploads for SLAM); ``--dedup-uploads`` skips
byte-identical consecutive pairs (paused/static feeds). Colocated
(non-tunnel) deployments use the standard PJRT client and do not take
this path.

  python tools/leak_probe.py
"""

import ctypes
import gc

import numpy as np
import jax


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024


def phase(name, fn, iters):
    gc.collect()
    r0 = rss_mb()
    for i in range(iters):
        fn(i)
    gc.collect()
    d = rss_mb() - r0
    print(f"{name}: +{d:.0f} MB over {iters} iters "
          f"({d / iters * 1024:.0f} KB/iter)")
    return d


def main():
    libc = ctypes.CDLL("libc.so.6")
    h = np.random.default_rng(0).integers(
        0, 256, (8 * 2 * 480 * 640,), np.uint8)
    f = jax.jit(lambda a: (a ^ np.uint8(3))[: a.shape[0] // 2])
    hd = jax.device_put(h)
    f(hd).block_until_ready()  # warm compile

    phase("upload same object      ",
          lambda i: jax.device_put(h).block_until_ready(), 40)
    phase("upload fresh copy       ",
          lambda i: jax.device_put(h.copy()).block_until_ready(), 40)

    def del_fn(i):
        x = jax.device_put(h)
        x.block_until_ready()
        x.delete()
    phase("upload + explicit delete", del_fn, 40)

    small = h[:65536]
    phase("upload 64 KB x400       ",
          lambda i: jax.device_put(small).block_until_ready(), 400)

    def exec_fetch(i):
        np.asarray(f(hd))
    phase("exec+fetch only         ", exec_fetch, 40)

    gc.collect()
    r = rss_mb()
    libc.malloc_trim(0)
    print(f"malloc_trim reclaimed {r - rss_mb():.0f} MB")


if __name__ == "__main__":
    main()
