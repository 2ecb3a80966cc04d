#!/usr/bin/env python
"""Kernel microbenchmark: on-device chained frame loop.

Times the fused SAD kernel with the N-frame loop INSIDE one jitted scan
(each frame's uint8 output feeds the next frame's left input), so a single
dispatch covers the whole chain and neither tunnel RPC latency nor Python
dispatch appears in the per-frame number. This is the authoritative
device-time protocol (BENCH.md "measurement protocol").

Usage: python tools/kbench.py [--frames 50] [--unrolls 1,2,4,8]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steroscopic_hardware_tpu.ops.gray import load_gray  # noqa: E402

TESTDATA = "/root/reference/testdata"


def chained(step, n):
    def run(l, r):
        def body(x, _):
            return step(x, r), None
        out, _ = jax.lax.scan(body, l, None, length=n)
        # 8-byte fetch: the differenced timing must not carry a
        # bandwidth-dependent fetch term
        return out.ravel()[:8]
    return jax.jit(run)


def time_one(step, L, R, n, reps=3):
    """Two-point differenced chained timing (see bench.py docstring):
    a chained dispatch still pays one fixed dispatch+fetch round trip
    (~24 ms via the tunnel), so per-frame time is
    (T(n2) - T(n1)) / (n2 - n1) with n1 = n/2, n2 = 2n — every fixed
    cost cancels exactly."""
    n1, n2 = max(1, n // 2), 2 * n
    f1, f2 = chained(step, n1), chained(step, n2)
    np.asarray(f1(L, R))
    np.asarray(f2(L, R))  # compile both
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(L, R))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(L, R))
        t2 = min(t2, time.perf_counter() - t0)
    if t2 <= t1:
        raise RuntimeError(
            f"noise-dominated timing: T({n1})={t1*1e3:.1f}ms >= "
            f"T({n2})={t2*1e3:.1f}ms — rerun with more frames")
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--block", type=int, default=7)
    ap.add_argument("--maxd", type=int, default=64)
    ap.add_argument("--unrolls", default="1,2,4,8")
    ap.add_argument("--row-tiles", default="128")
    ap.add_argument("--size", default="640x480")
    args = ap.parse_args()

    W, H = map(int, args.size.split("x"))
    left = load_gray(os.path.join(TESTDATA, "L_00001.png"))
    right = load_gray(os.path.join(TESTDATA, "R_00001.png"))
    if (H, W) != left.shape:
        rng = np.random.default_rng(0)
        left = rng.integers(0, 256, (H, W), dtype=np.uint8)
        right = rng.integers(0, 256, (H, W), dtype=np.uint8)
    L, R = jax.device_put(left), jax.device_put(right)

    platform = jax.devices()[0].platform
    print(f"platform={platform} size={W}x{H} block={args.block} "
          f"maxd={args.maxd} frames={args.frames}")

    from steroscopic_hardware_tpu.ops.sad_pallas import disparity_pallas

    for rt in map(int, args.row_tiles.split(",")):
        for u in map(int, args.unrolls.split(",")):
            def step(l, r, u=u, rt=rt):
                return disparity_pallas(
                    l, r, block_size=args.block, max_disparity=args.maxd,
                    row_tile=rt, d_unroll=u,
                )
            try:
                dt = time_one(step, L, R, args.frames)
                print(f"  rt={rt:4d} U={u:3d}: {dt*1e3:7.3f} ms/frame "
                      f"({1/dt:8.1f} fps, {H*W/1e6/dt:7.1f} Mpix/s)")
            except Exception as e:  # noqa: BLE001
                print(f"  rt={rt:4d} U={u:3d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
