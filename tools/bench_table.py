#!/usr/bin/env python
"""Measure the full BENCH.md kernel table on the real TPU.

Authoritative protocol (identical to bench.py): the N-frame loop runs on
device as one jitted ``lax.scan`` whose carry feeds each frame's uint8
output into the next frame's input, the fetch is 8 bytes, and the
per-frame time is TWO-POINT DIFFERENCED — (T(2n) - T(n/2)) / (2n - n/2)
— so the fixed ~24 ms dispatch+fetch round trip through the axon tunnel
cancels exactly (round-2 correction; the single-chain form inflates every
row by RTT/n).

  python tools/bench_table.py [--filter sgm] [--scale 1.0] [--json out]

Every BENCH.md kernel-table row comes from this tool under this one
protocol: SAD plain at VGA/1080p/4K incl. the b31/d256 envelope worst
case, batch-axis scaling B in {1,2,4,8}, fused LR and LR+subpixel, and
the SGM family (plain/LR at VGA and 1080p).
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def diff_time(step, carry0, n=30, reps=3):
    """Two-point differenced chained timing: per-frame device time with
    every fixed (chain-length-independent) cost cancelled."""
    n1, n2 = max(1, n // 2), 2 * n

    def chained(length):
        def run(c):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, c, None, length=length)
            # 8-byte fetch: the differenced timing must not carry a
            # bandwidth-dependent fetch term
            return out.ravel()[:8]
        return jax.jit(run)

    f1, f2 = chained(n1), chained(n2)
    np.asarray(f1(carry0))
    np.asarray(f2(carry0))  # compile both
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(carry0))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(carry0))
        t2 = min(t2, time.perf_counter() - t0)
    if t2 <= t1:
        raise RuntimeError(
            f"noise-dominated timing: T({n1})={t1*1e3:.1f}ms >= "
            f"T({n2})={t2*1e3:.1f}ms — rerun with a larger --scale")
    return (t2 - t1) / (n2 - n1)


def row(name, dt, npix, per=1):
    dt = dt / per
    print(f"{name:55s} {dt*1e3:8.3f} ms  {npix/per/1e6/dt:7.1f} Mpix/s "
          f"{1/dt:8.1f} fps", flush=True)
    RESULTS.append({"name": name, "ms": round(dt * 1e3, 3),
                    "mpix_s": round(npix / per / 1e6 / dt, 1),
                    "fps": round(1 / dt, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="", help="only rows whose name "
                    "contains this substring")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="multiply every chain length")
    ap.add_argument("--json", default="", help="dump rows as JSON here")
    args = ap.parse_args()

    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas,
        disparity_pallas_batch,
        disparity_pallas_lr,
        disparity_pallas_subpixel,
    )
    from steroscopic_hardware_tpu.ops.sgm import (
        sgm_disparity,
        sgm_disparity_lr,
    )

    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)

    def pair(h, w):
        l = rng.integers(0, 256, (h, w), dtype=np.uint8)
        r = np.clip(np.roll(l, -6, 1).astype(int)
                    + rng.integers(-3, 4, (h, w)), 0, 255).astype(np.uint8)
        return jax.device_put(l), jax.device_put(r)

    def run(name, fn, n):
        if args.filter and args.filter not in name:
            return
        n = max(2, int(n * args.scale))
        try:
            dt, npix, per = fn(n)
            row(name, dt, npix, per)
        except Exception as e:  # noqa: BLE001 — keep the table going
            print(f"{name:55s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            RESULTS.append({"name": name, "error": str(e)[:300]})

    # ---- SAD plain sweeps -------------------------------------------
    def sad_plain(h, w, b, d):
        def fn(n):
            L, R = pair(h, w)
            dt = diff_time(
                lambda x: disparity_pallas(
                    x, R, block_size=b, max_disparity=d), L, n=n)
            return dt, h * w, 1
        return fn

    run("640x480 b7 d64 plain", sad_plain(480, 640, 7, 64), 50)
    run("1920x1080 b7 d64 plain", sad_plain(1080, 1920, 7, 64), 20)
    run("1920x1080 b16 d64 plain", sad_plain(1080, 1920, 16, 64), 20)
    run("1920x1080 b31 d256 plain (envelope worst)",
        sad_plain(1080, 1920, 31, 256), 6)
    run("3840x2160 b9 d128 plain", sad_plain(2160, 3840, 9, 128), 5)

    # ---- batch-axis scaling (per-frame numbers) ---------------------
    for F in (1, 2, 4, 8):
        def fn(n, F=F):
            Ls = jnp.stack([pair(480, 640)[0] for _ in range(F)])
            Rs = jnp.stack([pair(480, 640)[1] for _ in range(F)])
            dt = diff_time(
                lambda x: disparity_pallas_batch(
                    x, Rs, block_size=7, max_disparity=64), Ls, n=n)
            return dt, 480 * 640 * F, F
        run(f"640x480 b7 d64 batch B={F} (per frame)", fn, 30)

    # ---- fused LR and subpixel --------------------------------------
    def lr_fn(n):
        L, R = pair(480, 640)

        def step(x):
            dL, dR = disparity_pallas_lr(
                x, R, block_size=7, max_disparity=64)
            return ((dL * 255) // 64).astype(jnp.uint8)
        return diff_time(step, L, n=n), 480 * 640, 1

    run("640x480 b7 d64 fused LEFT+RIGHT (one sweep)", lr_fn, 30)

    def sub_fn(n):
        L, R = pair(480, 640)

        def step(x):
            dL, dR = disparity_pallas_subpixel(
                x, R, block_size=7, max_disparity=64)
            return jnp.clip(dL * 4.0, 0, 255).astype(jnp.uint8)
        return diff_time(step, L, n=n), 480 * 640, 1

    run("640x480 b7 d64 fused LR + SUBPIXEL", sub_fn, 30)

    # ---- SGM family -------------------------------------------------
    def sgm_fn(h, w, d, lr=False):
        def fn(n):
            L, R = pair(h, w)
            if lr:
                def step(x):
                    dL, dR = sgm_disparity_lr(x, R, max_disparity=d,
                                              subpixel=True)
                    return jnp.clip(dL * 4.0, 0, 255).astype(jnp.uint8)
            else:
                def step(x):
                    disp = sgm_disparity(x, R, max_disparity=d,
                                         subpixel=True)
                    return jnp.clip(disp * 4.0, 0, 255).astype(jnp.uint8)
            return diff_time(step, L, n=n), h * w, 1
        return fn

    run("640x480 SGM d64 subpixel", sgm_fn(480, 640, 64), 20)
    run("640x480 SGM d64 fused LR", sgm_fn(480, 640, 64, lr=True), 16)
    run("640x480 SGM d128 subpixel", sgm_fn(480, 640, 128), 12)
    run("1920x1080 SGM d64 subpixel", sgm_fn(1080, 1920, 64), 8)
    run("1920x1080 SGM d128 subpixel", sgm_fn(1080, 1920, 128), 5)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "protocol": "two-point differenced chained scan",
                       "rows": RESULTS}, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
