#!/usr/bin/env python
"""Parallel-prefix min-recursion probe (ROADMAP gap 3 / VERDICT r3 #5).

The SGM scanline recursion L_s = C_s + relax(L_{s-1}) is an affine map
in the (min, +) semiring: L_s = M_s (x) L_{s-1} (+) c_s with M_s a
(D, D) min-plus matrix. Min-plus maps COMPOSE associatively, so the
S-step recursion could in principle run as an associative scan
(Blelloch) in O(log S) depth — the only algorithmic lever on the
aggregation floor (the sequential recursion already runs at
VPU-throughput parity, BENCH.md r3 roofline).

The catch is WORK: composing two relax-affine operators yields a
general (D, D) min-plus matrix, and each composition costs D^3 min+add
per image column (the operator is per-column — every column has its own
costs). The scan needs ~2S compositions per column (up+down sweep)
versus the sequential form's S * ~10 VPU ops on (D,) — a work ratio of
~2 D^2 / 10 (~800x at D=64), paid for latency parallelism the chip
cannot absorb (the sequential kernel already saturates the VPU across
its (D, lane) axes).

This probe MEASURES the per-level cost on the real chip: one scan level
at VGA d64 = 240 compositions x 640 columns of (64, 64) (x) (64, 64)
min-plus matmuls, run batched on the VPU under the differenced chained
protocol, compared with the measured cost of the ENTIRE sequential
aggregation (~0.4 ms/family). One level alone exceeding the whole
recursion rules the lever out with data.

  python tools/prefix_min_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def diff_time(step, carry0, n=8, reps=3):
    n1, n2 = max(1, n // 2), 2 * n

    def chained(length):
        def run(c):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, c, None, length=length)
            return jax.tree_util.tree_leaves(out)[0].ravel()[:8]
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
        raise RuntimeError("noise-dominated timing")
    return (t2 - t1) / (n2 - n1)


def main():
    D, W, S = 64, 640, 480
    comps_per_level = S // 2          # pairs composed at scan level 0
    # batch: all columns' compositions at one level, blocked to bound
    # memory — (B, D, D) (x) (B, D, D), B = W * comps_per_level split
    # into CHUNK-sized vmapped blocks inside one jit
    CHUNK = 4096
    n_chunks = (W * comps_per_level + CHUNK - 1) // CHUNK

    print(f"prefix-min probe: D={D}, VGA level-0 = {W * comps_per_level} "
          f"compositions of (D,D)(x)(D,D); timing {CHUNK} per dispatch",
          flush=True)
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.random((CHUNK, D, D), np.float32))
    B0 = jnp.asarray(rng.random((CHUNK, D, D), np.float32))

    def compose(c):
        a, b = c
        # min-plus matmul: out[b, i, k] = min_j a[b, i, j] + b[b, j, k]
        out = jnp.min(a[:, :, :, None] + b[:, None, :, :], axis=2)
        return (out - jnp.mean(out, keepdims=True, axis=(1, 2)), a)

    dt = diff_time(compose, (A0, B0), n=6)
    per_level_ms = dt * n_chunks * 1e3
    print(f"one (D,D)(x)(D,D) chunk of {CHUNK}: {dt*1e3:.3f} ms", flush=True)
    print(f"=> ONE scan level at VGA d64: {per_level_ms:.1f} ms "
          f"({n_chunks} chunks)", flush=True)
    levels = 2 * int(np.ceil(np.log2(S)))
    print(f"=> full Blelloch scan (~{levels} levels): "
          f"{per_level_ms * levels / 2:.0f}+ ms  "
          f"vs measured sequential aggregation ~0.4 ms/family "
          f"(BENCH.md r3)", flush=True)
    verdict = ("RULED OUT" if per_level_ms > 1.0 else "VIABLE?!")
    print(f"prefix-min lever: {verdict} — one level alone costs "
          f"{per_level_ms:.1f} ms against the 0.4 ms it would replace",
          flush=True)


if __name__ == "__main__":
    main()
