#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE config #5).

Measures row-sharded disparity throughput across mesh sizes and reports
fps scaling efficiency vs. the single-device run. With one physical TPU
chip (this environment) run it on the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py

On a real pod slice the same code paths measure ICI scaling (the mesh
axes and collectives are identical).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's sitecustomize force-registers the TPU platform in jax
# config; honor an explicit JAX_PLATFORMS=cpu request over it.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def bench_batch_axis(args):
    """Batch-axis scaling on ONE chip (the measurable half of config #5
    in a single-chip environment): frames per launch F = 1..8, on-device
    chained timing (see bench.py protocol) so tunnel RPC latency cannot
    contaminate the numbers."""

    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas_batch,
    )

    rng = np.random.default_rng(0)
    base = None
    for F in (1, 2, 4, 8):
        lefts = rng.integers(0, 256, (F, args.height, args.width),
                             dtype=np.uint8)
        rights = rng.integers(0, 256, (F, args.height, args.width),
                              dtype=np.uint8)

        def chained(ls, rs):
            def body(x, _):
                return disparity_pallas_batch(
                    x, rs, block_size=args.block, max_disparity=args.disp
                ), None
            out, _ = jax.lax.scan(body, ls, None, length=args.n)
            return out

        f = jax.jit(chained)
        L, R = jax.device_put(lefts), jax.device_put(rights)
        np.asarray(f(L, R))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(L, R))
            best = min(best, (time.perf_counter() - t0) / args.n)
        fps = F / best
        if base is None:
            base = fps
        # batch amortization gain on ONE chip: throughput relative to
        # batch=1 (not divided by F — frames share the chip, they are
        # not extra devices)
        gain = fps / base * 100
        print(f"batch={F}  {best * 1000 / F:7.3f} ms/frame  "
              f"{fps:8.1f} fps  {args.height * args.width * F / 1e6 / best:7.1f} "
              f"Mpix/s  vs batch=1 {gain:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--block", type=int, default=7)
    ap.add_argument("--disp", type=int, default=64)
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("--batch-axis", action="store_true",
                    help="single-chip batch-axis scaling (real TPU)")
    args = ap.parse_args()

    if args.batch_axis:
        bench_batch_axis(args)
        return

    from steroscopic_hardware_tpu.parallel.mesh import make_mesh
    from steroscopic_hardware_tpu.parallel.disparity_shard import (
        disparity_sharded,
    )

    ndev = len(jax.devices())
    rng = np.random.default_rng(0)
    left = rng.integers(0, 256, (args.height, args.width), dtype=np.uint8)
    right = rng.integers(0, 256, (args.height, args.width), dtype=np.uint8)

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= ndev
             and args.height % s == 0]
    for n in sizes:
        mesh = make_mesh(n_rows=n)
        f = lambda: disparity_sharded(
            left, right, block_size=args.block,
            max_disparity=args.disp, mesh=mesh,
        )
        np.asarray(f())  # compile
        t0 = time.time()
        for _ in range(args.n):
            r = f()
        np.asarray(r)
        dt = (time.time() - t0) / args.n
        results[n] = 1.0 / dt
        base = results[sizes[0]]
        eff = results[n] / (base * n / sizes[0]) * 100
        print(f"devices={n:2d}  {dt * 1000:8.2f} ms/frame  "
              f"{results[n]:8.1f} fps  efficiency {eff:5.1f}%")


if __name__ == "__main__":
    main()
