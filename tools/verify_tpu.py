#!/usr/bin/env python
"""On-hardware verification harness (VERDICT r2 directive #2).

Runs, on the real TPU chip, every correctness contract the interpret-mode
test suite asserts on CPU — because this toolchain has a documented
miscompile history (pure-scan SGM nondeterminism, in-kernel swapaxes:
ops/sgm.py), interpret-mode green is NOT evidence of hardware
correctness. Prints PASS/FAIL per item and a summary; exit code 1 on any
FAIL. A recorded all-PASS run for the shipping code lives in BENCH.md.

CPU references are computed in-process on the CPU backend (coexists with
the axon TPU platform), TPU results on the chip, compared on host.

  python tools/verify_tpu.py [--filter sad] [--quick]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steroscopic_hardware_tpu.ops.gray import load_gray  # noqa: E402

TESTDATA = "/root/reference/testdata"
FAILURES = []
CHECKS = 0


def report(name, ok, detail=""):
    global CHECKS
    CHECKS += 1
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name}" + (f" — {detail}" if detail else ""),
          flush=True)
    if not ok:
        FAILURES.append(name)


def check(name, fn):
    try:
        ok, detail = fn()
        report(name, ok, detail)
    except Exception as e:  # noqa: BLE001 — a crash is a FAIL, keep going
        report(name, False, f"{type(e).__name__}: {str(e)[:200]}")


def cpu(x):
    return jax.device_put(np.asarray(x), jax.devices("cpu")[0])


def max_abs_diff(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="")
    ap.add_argument("--quick", action="store_true",
                    help="VGA-crop frames instead of full frames")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})", flush=True)
    if dev.platform not in ("tpu",):
        print("WARNING: not running on TPU — this harness only means "
              "something on the real chip", flush=True)

    left = load_gray(os.path.join(TESTDATA, "L_00001.png"))
    right = load_gray(os.path.join(TESTDATA, "R_00001.png"))
    if args.quick:
        left, right = left[:256, :384], right[:256, :384]
    L, R = jax.device_put(left), jax.device_put(right)
    H, W = left.shape

    def run(name, fn):
        if args.filter and args.filter not in name:
            return
        check(name, fn)

    # ---------------- SAD ladder --------------------------------------
    from steroscopic_hardware_tpu.ops.sad_golden import (
        disparity_golden,
        disparity_golden_scalar,
        disparity_numpy,
    )
    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas,
        disparity_pallas_batch,
        disparity_pallas_lr,
        disparity_pallas_subpixel,
    )
    from steroscopic_hardware_tpu.ops.sad_xla import (
        disparity_raw_lr_xla,
        disparity_subpixel_lr_xla,
        disparity_xla,
    )

    crop = np.s_[200:232, 200:296] if not args.quick else np.s_[64:96, 64:160]
    lc, rc = left[crop], right[crop]

    def sad_ladder():
        # scalar model is pure Python — keep its crop tiny
        a = disparity_golden_scalar(lc[:16, :48], rc[:16, :48], 7, 64)
        b = disparity_golden(lc[:16, :48], rc[:16, :48], 7, 64)
        ok = np.array_equal(a, b)
        b2 = disparity_golden(lc, rc, 7, 64)
        c = disparity_numpy(lc, rc, 7, 64)
        ok = ok and np.array_equal(b2, c)
        return ok, "golden-scalar == golden == numpy (crops)"
    run("sad ladder: golden-scalar/golden/numpy", sad_ladder)

    ref_full = disparity_numpy(left, right, 7, 64)

    def sad_xla_vs_numpy():
        got = np.asarray(disparity_xla(L, R, block_size=7,
                                       max_disparity=64))
        return np.array_equal(got, ref_full), f"{H}x{W} b7 d64 on chip"
    run("sad XLA(tpu) == numpy golden", sad_xla_vs_numpy)

    for b, d in [(7, 64), (16, 64), (3, 16), (31, 256)]:
        def sad_pallas_vs_xla(b=b, d=d):
            want = np.asarray(disparity_xla(L, R, block_size=b,
                                            max_disparity=d))
            got = np.asarray(disparity_pallas(L, R, block_size=b,
                                              max_disparity=d))
            n = int((want != got).sum())
            return n == 0, f"b{b} d{d}: {n} mismatched pixels"
        run(f"sad Pallas == XLA on chip (b{b} d{d})", sad_pallas_vs_xla)

    def sad_batch():
        F = 4
        rng = np.random.default_rng(1)
        Ls = np.stack([left] + [rng.integers(0, 256, left.shape,
                                             dtype=np.uint8)
                                for _ in range(F - 1)])
        Rs = np.stack([right] + [rng.integers(0, 256, right.shape,
                                              dtype=np.uint8)
                                 for _ in range(F - 1)])
        got = np.asarray(disparity_pallas_batch(
            jax.device_put(Ls), jax.device_put(Rs),
            block_size=7, max_disparity=64))
        for f in range(F):
            want = np.asarray(disparity_pallas(
                jax.device_put(Ls[f]), jax.device_put(Rs[f]),
                block_size=7, max_disparity=64))
            if not np.array_equal(got[f], want):
                return False, f"frame {f} differs from unbatched"
        return True, f"batch of {F} == per-frame"
    run("sad Pallas batch == unbatched", sad_batch)

    def sad_lr():
        wl, wr = disparity_raw_lr_xla(L, R, block_size=7, max_disparity=64)
        gl, gr = disparity_pallas_lr(L, R, block_size=7, max_disparity=64)
        okl = np.array_equal(np.asarray(wl), np.asarray(gl))
        okr = np.array_equal(np.asarray(wr), np.asarray(gr))
        return okl and okr, f"L match={okl} R match={okr}"
    run("sad Pallas fused LR == XLA LR", sad_lr)

    def sad_subpixel():
        wl, wr = disparity_subpixel_lr_xla(L, R, block_size=7,
                                           max_disparity=64)
        gl, gr = disparity_pallas_subpixel(L, R, block_size=7,
                                           max_disparity=64)
        dl = max_abs_diff(wl, gl)
        dr = max_abs_diff(wr, gr)
        return dl <= 1e-4 and dr <= 1e-4, f"max|dL|={dl:.2e} |dR|={dr:.2e}"
    run("sad Pallas subpixel ~= XLA subpixel", sad_subpixel)

    # ---------------- SGM family --------------------------------------
    from steroscopic_hardware_tpu.ops import sgm as sgm_mod
    from steroscopic_hardware_tpu.ops.census import (
        census_cost_volume,
        census_cost_volume_T,
    )
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
        _transpose_add_pallas,
        sgm_disparity,
        sgm_disparity_lr,
    )

    Lc, Rc = cpu(left), cpu(right)

    def cpu_sgm(**kw):
        with jax.default_device(jax.devices("cpu")[0]):
            return np.asarray(sgm_disparity(Lc, Rc, backend="xla", **kw))

    # Both production epilogues vs the XLA reference (the unfused
    # summed-volume form is the single-chip default since r3 — measured
    # 1.7x the fused kernel end-to-end; the fused kernel remains the
    # per-shard epilogue of parallel/sgm_shard.py)
    def sgm_epilogues():
        want = cpu_sgm(max_disparity=64, subpixel=False)
        for epi in ("unfused", "fused"):
            got = np.asarray(sgm_disparity(
                L, R, max_disparity=64, subpixel=False,
                backend="pallas", epilogue=epi))
            n = int((want != got).sum())
            if n:
                return False, f"epilogue={epi}: {n} mismatched pixels"
        return True, "unfused and fused epilogues bit-exact"
    run("sgm epilogue variants == XLA(cpu)", sgm_epilogues)

    # u8 tier (default P1=1 P2=8), raw integer argmin: must be bit-exact
    def sgm_raw_u8():
        want = cpu_sgm(max_disparity=64, subpixel=False)
        got = np.asarray(sgm_disparity(L, R, max_disparity=64,
                                       subpixel=False, backend="pallas"))
        n = int((want != got).sum())
        return n == 0, f"d64 u8-tier raw: {n} mismatched pixels"
    run("sgm Pallas(tpu) raw == XLA(cpu), u8 tier", sgm_raw_u8)

    def sgm_sub_u8():
        want = cpu_sgm(max_disparity=64, subpixel=True)
        got = np.asarray(sgm_disparity(L, R, max_disparity=64,
                                       subpixel=True, backend="pallas"))
        d = max_abs_diff(want, got)
        return d <= 5e-3, f"d64 u8-tier subpixel: max|diff|={d:.2e}"
    run("sgm Pallas(tpu) subpixel ~= XLA(cpu), u8 tier", sgm_sub_u8)

    def sgm_bf16_tier():
        kw = dict(max_disparity=64, P1=2.0, P2=104.0, subpixel=False)
        want = cpu_sgm(**kw)
        got = np.asarray(sgm_disparity(L, R, backend="pallas", **kw))
        n = int((want != got).sum())
        return n == 0, f"P2=104 bf16-tier raw: {n} mismatched pixels"
    run("sgm Pallas(tpu) == XLA(cpu), bf16 tier", sgm_bf16_tier)

    def sgm_f32_tier():
        kw = dict(max_disparity=64, P1=1.5, P2=110.5, subpixel=False)
        want = cpu_sgm(**kw)
        got = np.asarray(sgm_disparity(L, R, backend="pallas", **kw))
        n = int((want != got).sum())
        return n == 0, f"fractional penalties f32 tier: {n} mismatches"
    run("sgm Pallas(tpu) == XLA(cpu), f32 tier", sgm_f32_tier)

    def sgm_d128():
        want = cpu_sgm(max_disparity=128, subpixel=False)
        got = np.asarray(sgm_disparity(L, R, max_disparity=128,
                                       subpixel=False, backend="pallas"))
        n = int((want != got).sum())
        return n == 0, f"d128: {n} mismatched pixels"
    run("sgm Pallas(tpu) == XLA(cpu), d128", sgm_d128)

    # d256: the top of the utils/params.py envelope — the SAD path
    # needed a row-tile fix at exactly this edge, so the quality engine
    # gets the same hardware checks (VERDICT r3 directive #3): u8 and
    # bf16 tiers, raw + subpixel (covers both epilogues' arithmetic)
    def sgm_d256_u8():
        want = cpu_sgm(max_disparity=256, subpixel=False)
        got = np.asarray(sgm_disparity(L, R, max_disparity=256,
                                       subpixel=False, backend="pallas"))
        n = int((want != got).sum())
        return n == 0, f"d256 u8-tier raw: {n} mismatched pixels"
    run("sgm Pallas(tpu) == XLA(cpu), d256 u8 tier", sgm_d256_u8)

    def sgm_d256_sub():
        want = cpu_sgm(max_disparity=256, subpixel=True)
        got = np.asarray(sgm_disparity(L, R, max_disparity=256,
                                       subpixel=True, backend="pallas"))
        d = max_abs_diff(want, got)
        return d <= 5e-3, f"d256 subpixel: max|diff|={d:.2e}"
    run("sgm Pallas(tpu) subpixel ~= XLA(cpu), d256", sgm_d256_sub)

    def sgm_d256_bf16():
        kw = dict(max_disparity=256, P1=2.0, P2=104.0, subpixel=False)
        want = cpu_sgm(**kw)
        got = np.asarray(sgm_disparity(L, R, backend="pallas", **kw))
        n = int((want != got).sum())
        return n == 0, f"d256 bf16-tier raw: {n} mismatched pixels"
    run("sgm Pallas(tpu) == XLA(cpu), d256 bf16 tier", sgm_d256_bf16)

    def sgm_d256_fused_epi():
        want = cpu_sgm(max_disparity=256, subpixel=False)
        got = np.asarray(sgm_disparity(
            L, R, max_disparity=256, subpixel=False,
            backend="pallas", epilogue="fused"))
        n = int((want != got).sum())
        return n == 0, f"d256 fused epilogue: {n} mismatched pixels"
    run("sgm Pallas(tpu) fused epilogue == XLA(cpu), d256",
        sgm_d256_fused_epi)

    def sgm_lr_check():
        with jax.default_device(jax.devices("cpu")[0]):
            wdl, wdr = sgm_disparity_lr(Lc, Rc, max_disparity=64,
                                        subpixel=True, backend="xla")
            wdl, wdr = np.asarray(wdl), np.asarray(wdr)
        gdl, gdr = sgm_disparity_lr(L, R, max_disparity=64,
                                    subpixel=True, backend="pallas")
        dl = max_abs_diff(wdl, gdl)
        nr = int((wdr != np.asarray(gdr)).sum())
        return dl <= 5e-3 and nr == 0, f"max|dL|={dl:.2e}, dR mism={nr}"
    run("sgm Pallas(tpu) LR == XLA(cpu) LR", sgm_lr_check)

    # ---------------- SGM internals on chip ---------------------------
    cost_np = None

    def get_cost():
        nonlocal cost_np
        if cost_np is None:
            with jax.default_device(jax.devices("cpu")[0]):
                cost_np = np.asarray(census_cost_volume(
                    Lc, Rc, max_disparity=64))
        return cost_np

    def agg_kernel_axis1():
        c = get_cost()
        with jax.default_device(jax.devices("cpu")[0]):
            want = np.asarray(_aggregate_axis(
                cpu(c.astype(np.float32)), 1.0, 8.0, axis=1))
        got = np.asarray(_aggregate_axis_pallas(
            jax.device_put(c), 1.0, 8.0, axis=1, out_dtype=jnp.uint8))
        d = max_abs_diff(want, got)
        return d == 0, f"u8-in/u8-out vertical agg: max|diff|={d:g}"
    run("sgm aggregate kernel (axis=1, u8) == XLA scan", agg_kernel_axis1)

    def agg_kernel_s_major():
        c = get_cost()
        with jax.default_device(jax.devices("cpu")[0]):
            want = np.asarray(_aggregate_axis(
                cpu(c.astype(np.float32)), 1.0, 8.0, axis=1))
        sm = jnp.transpose(jax.device_put(c), (1, 0, 2))  # (S=H, D, W)
        got = np.asarray(_aggregate_axis_pallas(
            sm, 1.0, 8.0, axis=1, out_dtype=jnp.uint8, s_major=True))
        d = max_abs_diff(want, got)
        return d == 0, f"s_major ingest: max|diff|={d:g}"
    run("sgm aggregate kernel s_major ingest == XLA scan",
        agg_kernel_s_major)

    def census_T_s_major():
        a = np.asarray(census_cost_volume_T(L, R, max_disparity=64))
        b = np.asarray(census_cost_volume_T(L, R, max_disparity=64,
                                            s_major=True))
        ok = np.array_equal(a, b.transpose(1, 0, 2))
        return ok, "(D,W,H) == s_major (W,D,H) transposed"
    run("census_cost_volume_T s_major consistency", census_T_s_major)

    def transpose_add():
        rng = np.random.default_rng(2)
        aT = rng.integers(0, 25, (65, W, H)).astype(np.uint8)
        b = rng.integers(0, 200, (65, H, W)).astype(np.float32)
        want = aT.transpose(0, 2, 1).astype(np.float32) + b
        got = np.asarray(_transpose_add_pallas(
            jax.device_put(aT), jax.device_put(b),
            out_dtype=jnp.float32))
        d = max_abs_diff(want, got)
        return d == 0, f"MXU transpose-add: max|diff|={d:g}"
    run("sgm MXU transpose-add kernel exact", transpose_add)

    # epilogue determinism: same input twice must agree bit-for-bit
    def sgm_determinism():
        a = np.asarray(sgm_disparity(L, R, max_disparity=64,
                                     subpixel=True, backend="pallas"))
        b = np.asarray(sgm_disparity(
            jax.device_put(left.copy()), jax.device_put(right.copy()),
            max_disparity=64, subpixel=True, backend="pallas"))
        return np.array_equal(a, b), "two runs bit-identical"
    run("sgm Pallas(tpu) deterministic across runs", sgm_determinism)

    print(f"\n{CHECKS - len(FAILURES)}/{CHECKS} checks passed "
          f"on {dev.platform}", flush=True)
    if FAILURES:
        print("FAILED:", *FAILURES, sep="\n  - ")
        sys.exit(1)
    # keep a handle on the module so linters see the import used
    _ = sgm_mod


if __name__ == "__main__":
    main()
