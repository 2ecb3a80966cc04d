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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--block", type=int, default=7)
    ap.add_argument("--disp", type=int, default=64)
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()

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
