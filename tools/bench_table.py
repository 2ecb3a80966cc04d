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
            # bandwidth-dependent fetch term. Pytree carries fetch their
            # first leaf (steps must route a data dependency on ALL live
            # compute through it, or XLA dead-code-eliminates the rest).
            return jax.tree_util.tree_leaves(out)[0].ravel()[:8]
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
    # the full utils/params.py envelope: maxDisparity goes to 256 and the
    # SAD engine is verified/benched there, so the quality engine must be
    # too (VERDICT r3 weak #5)
    run("640x480 SGM d256 subpixel", sgm_fn(480, 640, 256), 8)
    run("1920x1080 SGM d256 subpixel", sgm_fn(1080, 1920, 256), 3)

    # ---- SLAM per-frame compute (VERDICT r3 directive #2) -----------
    # Chained timing of the on-chip tracking chain: fused-LR subpixel
    # disparity -> FAST/ORB -> LR-gated triangulation
    # (models/slam.py _frame_frontend), then descriptor matching vs the
    # previous frame's features and RANSAC PnP — the complete per-frame
    # device compute of StereoVO.process. The data dependency threads
    # tracking results back into the next frame's image (LSB flip: the
    # workload is unchanged, the chain is real).
    from steroscopic_hardware_tpu.models.slam import _frame_frontend
    from steroscopic_hardware_tpu.models.vo import pnp_ransac
    from steroscopic_hardware_tpu.ops.matching import match as desc_match

    def slam_fn(h, w, d, frontend, track=True, kpts=512):
        intr = (h / 2.0, h / 2.0, w / 2.0, h / 2.0)

        def fe(x, R):
            return _frame_frontend(
                x, R, block_size=7, max_disparity=d, fast_threshold=20,
                max_keypoints=kpts, intr=intr, baseline=0.4,
                use_pallas=jax.devices()[0].platform == "tpu",
                frontend=frontend,
            )

        def fn(n):
            L, R = pair(h, w)
            feats0 = fe(L, R)
            key = jax.random.PRNGKey(0)

            if not track:
                def step(x):
                    xy, xy_sub, desc, valid, pts, ok = fe(x, R)
                    bump = (
                        xy.sum() + desc.sum()
                        + jnp.round(jnp.abs(pts).sum()).astype(jnp.int32)
                        + ok.sum() + valid.sum()
                        + jnp.round(xy_sub.sum()).astype(jnp.int32)
                    ).astype(jnp.uint8) & 1
                    return x ^ bump
                return diff_time(step, L, n=n), h * w, 1

            def step(c):
                x, (pxy, pxy_sub, pdesc, pvalid, ppts, pok), i = c
                xy, xy_sub, desc, valid, pts, ok = fe(x, R)
                idx, good = desc_match(pdesc, desc, pvalid, valid,
                                       ratio=0.9, max_distance=80.0)
                good = good & pok
                uv = xy_sub[idx].astype(jnp.float32)
                xi_rel, _, n_inl = pnp_ransac(
                    ppts, uv, good, intr, jax.random.fold_in(key, i),
                    n_hypotheses=32,
                )
                bump = (
                    n_inl
                    + jnp.round(jnp.abs(xi_rel).sum() * 1e4).astype(
                        jnp.int32)
                ).astype(jnp.uint8) & 1
                return (x ^ bump, (xy, xy_sub, desc, valid, pts, ok),
                        i + 1)

            dt = diff_time(step, (L, feats0, jnp.int32(0)), n=n)
            return dt, h * w, 1
        return fn

    run("640x480 SLAM frontend SAD d64 (disp+feat+triang)",
        slam_fn(480, 640, 64, "sad", track=False), 16)
    run("640x480 SLAM track SAD d64 (frontend+match+PnP)",
        slam_fn(480, 640, 64, "sad"), 16)
    run("640x480 SLAM track SGM d64 (frontend+match+PnP)",
        slam_fn(480, 640, 64, "sgm"), 10)
    run("1920x1080 SLAM track SAD d64 (frontend+match+PnP)",
        slam_fn(1080, 1920, 64, "sad"), 8)
    run("1920x1080 SLAM track SGM d64 (frontend+match+PnP)",
        slam_fn(1080, 1920, 64, "sgm"), 4)
    run("1920x1080 SLAM track SGMhalf d64 (pyramid census frontend)",
        slam_fn(1080, 1920, 64, "sgm_half"), 8)
    run("640x480 SLAM track SGMhalf d64 (pyramid census frontend)",
        slam_fn(480, 640, 64, "sgm_half"), 12)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "protocol": "two-point differenced chained scan",
                       "rows": RESULTS}, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
