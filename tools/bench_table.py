#!/usr/bin/env python
"""Measure the full BENCH.md kernel table on the real TPU.

Authoritative protocol (see bench.py): the N-frame loop runs on device as
one jitted ``lax.scan`` whose carry feeds each frame's output into the
next frame's input; one host fetch closes the chain; best of 3.

  python tools/bench_table.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_time(step, carry0, n=30, reps=3):
    def run(c0):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, c0, None, length=n)
        return out

    f = jax.jit(run)
    jax.block_until_ready(f(carry0))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(carry0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def row(name, dt, npix, per=1):
    dt = dt / per
    print(f"{name:55s} {dt*1e3:8.3f} ms  {npix/1e6/dt:7.1f} Mpix/s "
          f"{1/dt:8.1f} fps", flush=True)


def main():
    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas,
        disparity_pallas_batch,
        disparity_pallas_lr,
        disparity_pallas_subpixel,
    )
    from steroscopic_hardware_tpu.ops.sgm import sgm_disparity

    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)

    def pair(h, w):
        l = rng.integers(0, 256, (h, w), dtype=np.uint8)
        r = np.clip(np.roll(l, -6, 1).astype(int)
                    + rng.integers(-3, 4, (h, w)), 0, 255).astype(np.uint8)
        return jax.device_put(l), jax.device_put(r)

    # plain disparity sweeps
    for (h, w, b, d, n) in [(480, 640, 7, 64, 50), (1080, 1920, 7, 64, 20),
                            (1080, 1920, 16, 64, 20),
                            (1080, 1920, 31, 256, 10),
                            (2160, 3840, 9, 128, 5)]:
        L, R = pair(h, w)
        dt = chained_time(
            lambda x, R=R, b=b, d=d: disparity_pallas(
                x, R, block_size=b, max_disparity=d),
            L, n=n)
        row(f"{w}x{h} b{b} d{d} plain", dt, h * w)

    # batch of 8 VGA streams (native frame x tile grid)
    F = 8
    Ls = jnp.stack([pair(480, 640)[0] for _ in range(F)])
    Rs = jnp.stack([pair(480, 640)[1] for _ in range(F)])
    dt = chained_time(
        lambda x: disparity_pallas_batch(
            x, Rs, block_size=7, max_disparity=64),
        Ls, n=30)
    row("640x480 b7 d64 batch of 8 (per frame)", dt, 480 * 640 * F, per=F)

    # fused LR and subpixel (carry: normalized uint8 of dL)
    L, R = pair(480, 640)

    def lr_step(x):
        dL, dR = disparity_pallas_lr(x, R, block_size=7, max_disparity=64)
        return ((dL * 255) // 64).astype(jnp.uint8)

    row("640x480 b7 d64 fused LEFT+RIGHT (one sweep)",
        chained_time(lr_step, L, n=30), 480 * 640)

    def sub_step(x):
        dL, dR = disparity_pallas_subpixel(
            x, R, block_size=7, max_disparity=64)
        return jnp.clip(dL * 4.0, 0, 255).astype(jnp.uint8)

    row("640x480 b7 d64 fused LR + SUBPIXEL",
        chained_time(sub_step, L, n=30), 480 * 640)

    # SGM
    for (h, w, n) in [(480, 640, 20), (1080, 1920, 8)]:
        L, R = pair(h, w)

        def sgm_step(x, R=R):
            disp = sgm_disparity(x, R, max_disparity=64, subpixel=True)
            return jnp.clip(disp * 4.0, 0, 255).astype(jnp.uint8)

        row(f"{w}x{h} SGM d64 subpixel (uint8 volumes)",
            chained_time(sgm_step, L, n=n), h * w)


if __name__ == "__main__":
    main()
