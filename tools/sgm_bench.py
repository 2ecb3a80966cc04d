#!/usr/bin/env python
"""SGM stage-level microbenchmark on the real TPU.

Times the full SGM variants AND each pipeline stage in isolation under
the authoritative two-point differenced chained protocol (see bench.py),
so regressions localize to a stage instead of a 5 ms blob: census volume
build, MXU transpose-add, the in-kernel DMA aggregation (per family),
the fused Pallas epilogue, and the three end-to-end variants
(plain raw / plain subpixel / fused LR).

Chaining per stage feeds the stage output back into its input (uint8
wraparound / bf16 accumulation — values drift, shapes and op mix don't),
which keeps the data dependency that stops XLA from overlapping or
eliding iterations.

  python tools/sgm_bench.py [--size 640x480] [--maxd 64] [--frames 12]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def diff_time(step, carry0, n, reps=3):
    n1, n2 = max(1, n // 2), 2 * n

    def chained(length):
        def run(c):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, c, None, length=length)
            leaves = jax.tree_util.tree_leaves(out)
            return leaves[0].ravel()[:8]
        return jax.jit(run)

    f1, f2 = chained(n1), chained(n2)
    np.asarray(f1(carry0))
    np.asarray(f2(carry0))
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(carry0))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(carry0))
        t2 = min(t2, time.perf_counter() - t0)
    if t2 <= t1:
        raise RuntimeError(f"noise-dominated: T({n1})={t1*1e3:.1f} >= "
                           f"T({n2})={t2*1e3:.1f} ms")
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--maxd", type=int, default=64)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--filter", default="")
    args = ap.parse_args()
    W, H = map(int, args.size.split("x"))
    D = args.maxd
    n = args.frames

    from steroscopic_hardware_tpu.ops.census import census_cost_volume_T
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis_pallas,
        _round_up,
        _sgm_epilogue_pallas,
        _transpose_add_pallas,
        sgm_disparity,
        sgm_disparity_lr,
    )

    rng = np.random.default_rng(0)
    left = rng.integers(0, 256, (H, W), dtype=np.uint8)
    right = np.clip(np.roll(left, -6, 1).astype(int)
                    + rng.integers(-3, 4, (H, W)), 0, 255).astype(np.uint8)
    L, R = jax.device_put(left), jax.device_put(right)
    print(f"platform={jax.devices()[0].platform} {W}x{H} d{D}", flush=True)

    def row(name, fn, carry, n=n):
        if args.filter and args.filter not in name:
            return
        try:
            dt = diff_time(fn, carry, n)
            print(f"  {name:42s} {dt*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:42s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # ---- end-to-end variants ----------------------------------------
    def e2e(subpixel, epilogue="unfused"):
        def step(x):
            d = sgm_disparity(x, R, max_disparity=D, subpixel=subpixel,
                              backend="pallas", epilogue=epilogue)
            return jnp.clip(d * 4.0, 0, 255).astype(jnp.uint8)
        return step

    row("sgm plain raw (default unfused epilogue)", e2e(False), L)
    row("sgm plain subpixel (default unfused)", e2e(True), L)
    row("sgm plain subpixel (fused epilogue)",
        e2e(True, epilogue="fused"), L)
    # the round-4 scan-major chain: zero XLA volume relayouts + u8
    # aggregate tier (VERDICT r3 directive #5 A/B)
    row("sgm plain raw (s_unfused scan-major)",
        e2e(False, epilogue="s_unfused"), L)
    row("sgm plain subpixel (s_unfused scan-major)",
        e2e(True, epilogue="s_unfused"), L)

    def lr_step(x):
        dl, dr = sgm_disparity_lr(x, R, max_disparity=D, subpixel=True,
                                  backend="pallas")
        return jnp.clip(dl * 4.0, 0, 255).astype(jnp.uint8)
    row("sgm fused LR (summed vol + XLA epilogue)", lr_step, L)

    # plain disparity through the LR-style UNFUSED epilogue (summed
    # volume via MXU transpose-add + XLA masked reductions) — candidate
    # production path if the fused-epilogue composition stays slower
    from steroscopic_hardware_tpu.ops.sgm import (
        _bf16_exact,
        _epilogue_xla,
    )

    def plain_unfused_step(x):
        ct = census_cost_volume_T(x, R, max_disparity=D)
        cost = _transpose_add_pallas(ct, out_dtype=jnp.bfloat16)
        agg_dtype = jnp.bfloat16 if _bf16_exact(1.0, 8.0) else jnp.float32
        agg_v = _aggregate_axis_pallas(cost, 1.0, 8.0, axis=1,
                                       out_dtype=agg_dtype)
        agg_ht = _aggregate_axis_pallas(ct, 1.0, 8.0, axis=1,
                                        out_dtype=agg_dtype)
        agg = _transpose_add_pallas(agg_ht, agg_v,
                                    out_dtype=jnp.float32)
        disp = _epilogue_xla(agg, True)
        return jnp.clip(disp * 4.0, 0, 255).astype(jnp.uint8)
    row("sgm plain via summed vol + XLA epilogue", plain_unfused_step, L)

    # ---- stages ------------------------------------------------------
    def census_step(x):
        ct = census_cost_volume_T(x, R, max_disparity=D)
        return (x + ct[0].T).astype(jnp.uint8)
    row("stage: census_cost_volume_T", census_step, L)

    ct0 = jax.device_put(np.asarray(
        jax.jit(lambda a, b: census_cost_volume_T(
            a, b, max_disparity=D))(L, R)))

    def ta_step(c):
        out = _transpose_add_pallas(c, out_dtype=jnp.bfloat16)
        return (c + out.astype(jnp.uint8).transpose(0, 2, 1)).astype(
            jnp.uint8)
    row("stage: MXU transpose-add (build std frame)", ta_step, ct0)

    cost_bf16 = jax.device_put(np.asarray(jax.jit(
        lambda c: _transpose_add_pallas(c, out_dtype=jnp.bfloat16))(ct0)))

    def agg_step(c):
        agg = _aggregate_axis_pallas(c, 1.0, 8.0, axis=1,
                                     out_dtype=jnp.uint8)
        return c + agg.astype(jnp.bfloat16)
    row("stage: aggregation kernel (vertical fam)", agg_step, cost_bf16)

    def agg_t_step(c):
        agg = _aggregate_axis_pallas(c, 1.0, 8.0, axis=1,
                                     out_dtype=jnp.uint8)
        return (c + agg).astype(jnp.uint8)
    row("stage: aggregation kernel (u8 in, horiz fam)", agg_t_step, ct0)

    Dp = ct0.shape[0]
    Hp, Wp = _round_up(H, 128), _round_up(W, 128)
    av0 = jax.device_put(rng.integers(0, 96, (Dp, Hp, Wp), dtype=np.uint8))
    ah0 = jax.device_put(rng.integers(0, 96, (Dp, Wp, Hp), dtype=np.uint8))

    def epi_step(c):
        av, ah = c
        disp = _sgm_epilogue_pallas(av, ah, D=Dp, subpixel=True)
        return (av + disp.astype(jnp.uint8)[None], ah)
    row("stage: fused Pallas epilogue", epi_step, (av0, ah0))

    def epi_raw_step(c):
        av, ah = c
        disp = _sgm_epilogue_pallas(av, ah, D=Dp, subpixel=False)
        return (av + disp.astype(jnp.uint8)[None], ah)
    row("stage: fused Pallas epilogue (raw)", epi_raw_step, (av0, ah0))

    # ---- cumulative prefixes of the REAL composed program -------------
    # Times pipeline prefixes to localize costs that only appear in the
    # composed program (inter-stage relayouts, rematerialization):
    # each prefix chains image -> ... -> uint8 image.
    def prefix(upto):
        def step(x):
            ct = census_cost_volume_T(x, R, max_disparity=D)
            if upto == "census":
                return (x + ct[0].T).astype(jnp.uint8)
            cost = _transpose_add_pallas(ct, out_dtype=jnp.bfloat16)
            if upto == "ta":
                return (x + cost[0].astype(jnp.uint8)).astype(jnp.uint8)
            agg_v = _aggregate_axis_pallas(cost, 1.0, 8.0, axis=1,
                                           out_dtype=jnp.uint8)
            if upto == "agg_v":
                return (x + agg_v[0]).astype(jnp.uint8)
            agg_ht = _aggregate_axis_pallas(ct, 1.0, 8.0, axis=1,
                                            out_dtype=jnp.uint8)
            if upto == "agg_ht":
                # consume via a scalar reduction — a full-plane .T here
                # is itself a pathological lane transpose and was
                # measured to add ~27 ms at 1080p, polluting the row
                return (x + agg_v[0]
                        + (agg_ht.sum() % 7).astype(jnp.uint8)
                        ).astype(jnp.uint8)
            Dv = agg_v.shape[0]
            Hp2, Wp2 = _round_up(H, 128), _round_up(W, 128)
            av = jnp.pad(agg_v, ((0, 0), (0, Hp2 - H), (0, Wp2 - W)))
            ah = jnp.pad(agg_ht, ((0, 0), (0, Wp2 - W), (0, Hp2 - H)))
            if upto == "pads":
                return (x + av[0, :H, :W] + ah[0, :W, :H].T).astype(
                    jnp.uint8)
            disp = _sgm_epilogue_pallas(av, ah, D=Dv, subpixel=True)
            return jnp.clip(disp[:H, :W] * 4.0, 0, 255).astype(jnp.uint8)
        return step

    for upto in ("census", "ta", "agg_v", "agg_ht", "pads", "full"):
        row(f"prefix: through {upto}", prefix(upto), L)

    # ---- scan-major chain bisection (round-4 s_unfused A/B) -----------
    def sprefix(upto):
        def step(x):
            cth = census_cost_volume_T(x, R, max_disparity=D,
                                       s_major=True)          # (W, D, H)
            if upto == "census":
                return (x + cth[:, 0, :].T).astype(jnp.uint8)
            csv = _transpose_add_pallas(cth, out_dtype=jnp.bfloat16,
                                        s_major=True)         # (H, D, W)
            if upto == "ta":
                return (x + csv[:, 0, :].astype(jnp.uint8)).astype(
                    jnp.uint8)
            agg_v = _aggregate_axis_pallas(
                csv, 1.0, 8.0, axis=1, out_dtype=jnp.uint8,
                s_major=True, return_s_major=True)            # (H, D, W)
            if upto == "agg_v":
                return (x + agg_v[:, 0, :]).astype(jnp.uint8)
            agg_h = _aggregate_axis_pallas(
                cth, 1.0, 8.0, axis=1, out_dtype=jnp.uint8,
                s_major=True, return_s_major=True)            # (W, D, H)
            if upto == "agg_h":
                return (x + agg_v[:, 0, :]
                        + (agg_h.sum() % 7).astype(jnp.uint8)
                        ).astype(jnp.uint8)
            agg = _transpose_add_pallas(agg_h, agg_v,
                                        out_dtype=jnp.float32,
                                        s_major=True)         # (H, D, W)
            if upto == "sum":
                return (x + agg[:, 0, :].astype(jnp.uint8)).astype(
                    jnp.uint8)
            disp = _epilogue_xla(agg, True, d_axis=1)
            return jnp.clip(disp * 4.0, 0, 255).astype(jnp.uint8)
        return step

    for upto in ("census", "ta", "agg_v", "agg_h", "sum", "full"):
        row(f"sprefix: through {upto}", sprefix(upto), L)

    # ---- PRODUCTION (d-major unfused) chain bisection -----------------
    from steroscopic_hardware_tpu.ops.sgm import _bf16_sum_exact

    def uprefix(upto):
        agg_dtype = jnp.bfloat16
        sum_dtype = (jnp.bfloat16 if _bf16_sum_exact(1.0, 8.0)
                     else jnp.float32)

        def step(x):
            ct = census_cost_volume_T(x, R, max_disparity=D)
            if upto == "census":
                return (x + ct[0].T).astype(jnp.uint8)
            cost = _transpose_add_pallas(ct, out_dtype=jnp.bfloat16)
            if upto == "ta":
                return (x + cost[0].astype(jnp.uint8)).astype(jnp.uint8)
            agg_v = _aggregate_axis_pallas(cost, 1.0, 8.0, axis=1,
                                           out_dtype=agg_dtype)
            if upto == "agg_v":
                return (x + agg_v[0].astype(jnp.uint8)).astype(jnp.uint8)
            agg_ht = _aggregate_axis_pallas(ct, 1.0, 8.0, axis=1,
                                            out_dtype=agg_dtype)
            if upto == "agg_ht":
                return (x + agg_v[0].astype(jnp.uint8)
                        + (agg_ht.sum() % 7).astype(jnp.uint8)
                        ).astype(jnp.uint8)
            agg = _transpose_add_pallas(agg_ht, agg_v,
                                        out_dtype=sum_dtype)
            if upto == "sum":
                return (x + agg[0].astype(jnp.uint8)).astype(jnp.uint8)
            disp = _epilogue_xla(agg, True)
            return jnp.clip(disp * 4.0, 0, 255).astype(jnp.uint8)
        return step

    for upto in ("census", "ta", "agg_v", "agg_ht", "sum", "full"):
        row(f"uprefix: through {upto}", uprefix(upto), L)


if __name__ == "__main__":
    main()
