"""Semi-global matching (SGM) disparity in pure XLA.

Quality upgrade over plain block matching (the reference only has SAD
winner-take-all): census Hamming costs aggregated along 4 scanline
directions with the classic P1/P2 smoothness recursion

  L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                             L_r(p-r, d+-1) + P1,
                             min_d' L_r(p-r, d') + P2 ) - min_d' L_r(p-r, d')

re-designed for XLA: each direction is one ``lax.scan`` along rows or
columns whose step updates an entire (H, D) or (W, D) slice on the VPU
(compiler-friendly sequential structure, no per-pixel control flow).
Sub-pixel refinement by parabola interpolation on the aggregated volume.
Pattern sources: Hirschmueller's SGM via the embedded-GPU formulation
(arXiv:1610.04121) and FP-Stereo (arXiv:2006.03250); implementation is
original.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from steroscopic_hardware_tpu.ops.census import (
    census_cost_volume,
    census_cost_volume_T,
)

# numpy scalar: a module-level jnp constant initialises the XLA backend at
# import, breaking jax.distributed.initialize() (tests/mp_worker.py)
_INF = np.float32(1e9)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _aggregate_axis(cost, P1, P2, axis: int):
    """Sum of forward + backward aggregations along ``axis`` (1 = vertical
    paths, 2 = horizontal paths), with both directions batched into ONE
    ``lax.scan`` (the per-step recursion is latency-bound on TPU, so
    halving the step count nearly halves the wall time).

    cost: (D, H, W) float32. Returns same-shape summed aggregated costs.
    """
    if axis == 1:
        vol = jnp.transpose(cost, (1, 0, 2))   # (S=H, D, W)
    else:
        vol = jnp.transpose(cost, (2, 0, 1))   # (S=W, D, H)

    # stack forward and reversed sequences as a leading batch of 2
    sc = jnp.stack([vol, vol[::-1]], axis=1)   # (S, 2, D, K)

    def step(prev, c):
        # prev, c: (2, D, K)
        m = prev.min(axis=1, keepdims=True)
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full_like(prev[:, :1], _INF)], 1
        )
        dn = jnp.concatenate(
            [jnp.full_like(prev[:, :1], _INF), prev[:, :-1]], 1
        )
        best = jnp.minimum(
            jnp.minimum(prev, jnp.minimum(up, dn) + P1), m + P2
        )
        out = c + best - m
        return out, out

    init = sc[0]
    _, agg = jax.lax.scan(step, init, sc[1:])
    agg = jnp.concatenate([init[None], agg], 0)  # (S, 2, D, K)
    both = agg[:, 0] + agg[::-1, 1]              # (S, D, K)
    if axis == 1:
        return jnp.transpose(both, (1, 0, 2))
    return jnp.transpose(both, (1, 2, 0))


def _pick_col_tile(Dp: int, Kp: int, TS: int = 1, in_size: int = 4,
                   out_size: int = 4, budget_bytes: int = 12 << 20) -> int:
    """Largest lane tile (multiple of 128, EXACTLY dividing Kp) such that
    the kernel's VMEM working set — 2 pipelined buffers for each of the 2
    (TS, Dp, TK) inputs and outputs, plus the 2 f32 carries — fits the
    budget. The divisibility requirement is load-bearing: the grid is
    ``Kp // TK`` wide, so a non-dividing tile would silently drop the
    trailing lanes (a plain halving loop picks e.g. 768 for Kp=1408)."""
    per_lane = 4 * TS * Dp * (in_size + out_size) + 8 * Dp
    m = Kp // 128
    best = 128
    for t in range(1, m + 1):
        if m % t == 0 and per_lane * 128 * t <= budget_bytes:
            best = 128 * t
    return best


def _bf16_exact(P1: float, P2: float) -> bool:
    """True when every value the SGM recursion stores can be held in
    bfloat16 with bit-identical results. Stored values are the
    per-direction path values — integers <= 24 + P2, since census costs
    are <= 24 and the recursion subtracts min_d' each step while adding at
    most P2 — and their fwd+bwd 2-way sums (<= 2*(24+P2)). The
    vertical+horizontal add happens in FLOAT32 inside the fused epilogue
    (``_sgm_epilogue_pallas`` widens before adding), so only the 2-way sum
    must be exact in bf16's 8-bit mantissa (integers <= 256):
    2*(24+P2) <= 256 <=> P2 <= 104. P1's magnitude never enters the bound
    (a +P1 candidate only wins when below the +P2 one)."""
    return (
        float(P1).is_integer()
        and float(P2).is_integer()
        and 0 <= P1
        and 0 <= P2 <= 104
    )


def _u8_exact(P1: float, P2: float) -> bool:
    """True when the aggregated volumes can be stored as uint8 — a further
    2x HBM-traffic cut over bf16. Requirements: integer penalties (values
    stay integers), per-path values <= 24 + P2 <= 127 and fwd+bwd sums
    <= 2*(24+P2) <= 254 fit uint8 exactly. Unlike the bf16 gate there is
    NO constraint from the 4-way sum: the fused epilogue widens to float32
    before adding the vertical and horizontal aggregates, so only the
    stored intermediates must fit. The default P1=1/P2=8 qualifies.
    """
    return (
        float(P1).is_integer()
        and float(P2).is_integer()
        and 0 <= P1 <= 103
        and 0 <= P2 <= 103
    )


def _bf16_sum_exact(P1: float, P2: float) -> bool:
    """True when the 4-path SUMMED volume (vertical + horizontal
    aggregates, each a 2-way sum <= 2*(24+P2)) holds bf16-exact
    integers: 4*(24+P2) <= 256 <=> P2 <= 40. Lets the unfused epilogue
    read HALF the bytes of the dominant volume (the argmin/parabola
    masked reductions are bandwidth-bound on it); covers the default
    P1=1/P2=8. The parabola upcasts to f32 before differencing, so
    exactness of the stored integers is the only requirement."""
    return (
        float(P1).is_integer()
        and float(P2).is_integer()
        and 0 <= P1
        and 0 <= P2 <= 40
    )


def _vstore(x, dtype):
    """Cast a float32 value for a VMEM store. Mosaic has no direct
    f32<->u8 conversion; round-trip through int32 (exact for the small
    non-negative integers stored here)."""
    if dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.uint8)
    return x.astype(dtype)


def _vload(x):
    """Widen a VMEM-loaded value to float32 (u8 via int32: Mosaic has no
    direct u8->f32 cast)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.float32)
    if x.dtype != jnp.float32:
        return x.astype(jnp.float32)
    return x


def _aggregate_axis_pallas(cost, P1, P2, axis: int, interpret: bool = False,
                           out_dtype=jnp.float32, s_major: bool = False,
                           return_s_major: bool = False):
    """Pallas-TPU counterpart of :func:`_aggregate_axis`: the same
    direction-batched recursion, but run as ONE grid step per lane tile
    with the scan over S living in-kernel — a ``fori_loop`` that manually
    DMAs (TS, D, K) chunks HBM->VMEM double-buffered, updates the VMEM
    recursion carry, and DMAs results back. The earlier grid-stepped form
    (one grid step per TS-row block) paid a fixed DMA-issue/sequencing
    cost of ~15-30 us per step on v5e — the same overhead the SAD kernel
    shed in its round-2 in-kernel-sweep restructure; here the issue
    latency hides under the recursion compute instead. The backward
    direction reads mirrored chunks (base (n_s-1-s)*TS) in the same loop,
    so both directions still cost one pass over HBM.

    cost: (D, H, W) float32 or uint8. Returns same-shape float32 summed
    aggregated costs, numerically identical to the XLA path on the float32
    cost (same op order per element). uint8 input is the HBM-traffic
    optimization: the raw census costs (<= 24) stream into the kernel at a
    quarter of the float32 bandwidth and are widened in VMEM, with the
    d-pad rows masked to +INF in-kernel (a uint8 pad value cannot encode
    "never wins the min over d'").

    NOTE: only worth using for axis=1. axis=2 requires the (2,0,1)
    transpose, which moves the lane dimension and relayouts through 8x128
    tiles — measured ~25x slower than the whole aggregation on v5e. The
    production TPU path (see ``_sgm_impl``) therefore feeds this kernel
    (axis=1) both the (D, H, W) volume and a transposed-frame (D, W, H)
    volume, which together cover all 4 path directions.

    ``s_major=True`` ingests a volume the producer already wrote
    scan-major, skipping the (1,0,2) relayout here;
    ``return_s_major=True`` hands the (S, D, K) result back relayout-
    free. Both are wired through the ``epilogue="s_unfused"`` chain
    (see ``_sgm_impl``) — resolved from the r2/r3 STAGED state. The
    chain is bit-exact but measured SLOWER end-to-end than the d-major
    default (VGA 5.0 vs 2.36 ms, 1080p 46.1 vs 28.7 ms, 2026-08-21):
    the s-major MXU transpose-add must address its d slot on the
    sublane axis, which costs more than the XLA major-axis volume
    transposes it removes. Kept as a measured variant, not the default.
    """
    if s_major:
        # input already (S, D, K) — the producer wrote scan-major directly
        # (census_cost_volume_T(s_major=True)); no volume relayout at all
        assert axis == 1, "s_major input implies axis=1 semantics"
        vol = cost
    elif axis == 1:
        vol = jnp.transpose(cost, (1, 0, 2))   # (S=H, D, W)
    else:
        vol = jnp.transpose(cost, (2, 0, 1))   # (S=W, D, H)
    S, D, K = vol.shape
    is_u8 = vol.dtype == jnp.uint8
    # 8-bit VMEM tiles are (32, 128), 16-bit (16, 128); keep the d-pad a
    # multiple of every tile in play so the block layouts stay native.
    align = {1: 32, 2: 16, 4: 8}
    Dp = _round_up(D, max(align[vol.dtype.itemsize],
                          align[jnp.dtype(out_dtype).itemsize]))
    Kp = _round_up(K, 128)
    # d-pads hold _INF so they never win the min over d'; lane pads are
    # independent columns and never mix with real ones. (uint8 pads are
    # masked to _INF inside the kernel instead.)
    volp = jnp.pad(vol, ((0, 0), (0, Dp - D), (0, Kp - K)),
                   constant_values=255 if is_u8 else _INF)
    # Scan-axis pad: unlock TS=32 on non-32-divisible S (e.g. 1080). A
    # UNIFORM-cost pad row is ABSORBING for the normalized recursion
    # (carry = c + best - m): with the previous row's carry constant K
    # across d, best = min(K, K+P1, K+P2) = K, so best - m = 0 and the
    # next row's carry is exactly its own cost — the recursion's
    # boundary init. Forward hits pad rows last (outputs cropped);
    # backward starts on them and has fully reset by the first real
    # row, so every real output is bit-identical to the unpadded scan.
    # The pad value 255 is finite (float tiers stay NaN-free) and
    # uniform across ALL columns of the pad rows (jnp.pad after the
    # d-pad), and the u8 in-kernel d-pad masking preserves the reset
    # (255 is itself the row minimum). Gated to S >= 256 so tiny test
    # volumes keep the historical chunking.
    Sp = S
    if S >= 256 and S % 32:
        Sp = _round_up(S, 32)
        volp = jnp.pad(volp, ((0, Sp - S), (0, 0), (0, 0)),
                       constant_values=255 if is_u8 else 255.0)
    # Rows per DMA chunk. TS must divide Sp exactly (mirrored backward
    # indexing); power-of-two so common sizes hit 32 (VGA, padded
    # 1080p). Fewer, larger chunks amortize the per-chunk DMA-issue
    # latency the sequential recursion cannot hide across chunks (r3
    # roofline: the scan structure, not bandwidth, limits SGM).
    TS = 1
    while TS < 32 and Sp % (TS * 2) == 0:
        TS *= 2
    # d256 envelope guard: at Dp ~ 272 the double-buffered
    # (2, 2, TS, Dp, 128) in+out working set overflows the 16 MB scoped
    # VMEM limit even at the minimum lane tile (measured: 17.27 M
    # requested at bf16 TS=32 — hardware compile error, not a warning),
    # so halve the chunk rows until the TK=128 floor fits the same
    # budget _pick_col_tile enforces. Envelope-edge cousin of the SAD
    # d>=256 row-tile fix (ops/sad_pallas.py _pick_row_tile).
    itm = vol.dtype.itemsize + jnp.dtype(out_dtype).itemsize

    def _ws_min(ts):
        return (4 * ts * Dp * itm + 8 * Dp) * 128

    while TS > 1 and _ws_min(TS) > (12 << 20):
        TS //= 2
    n_s = Sp // TS
    TK = _pick_col_tile(Dp, Kp, TS, vol.dtype.itemsize,
                        jnp.dtype(out_dtype).itemsize)
    n_k = Kp // TK
    p12 = jnp.asarray([[P1, P2]], jnp.float32)

    def kernel(p_ref, v_hbm, of_hbm, ob_hbm, vin, vout, cf, cb,
               sem_in, sem_out):
        kk = pl.program_id(0)
        lanes = pl.ds(kk * TK, TK)
        p1 = p_ref[0, 0]
        p2 = p_ref[0, 1]

        def in_dma(slot, s, dirn):
            base = s * TS if dirn == 0 else (n_s - 1 - s) * TS
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(base, TS), :, lanes],
                vin.at[slot, dirn],
                sem_in.at[slot, dirn],
            )

        def out_dma(slot, s, dirn):
            o_hbm = of_hbm if dirn == 0 else ob_hbm
            base = s * TS if dirn == 0 else (n_s - 1 - s) * TS
            return pltpu.make_async_copy(
                vout.at[slot, dirn],
                o_hbm.at[pl.ds(base, TS), :, lanes],
                sem_out.at[slot, dirn],
            )

        def prep(c):
            if is_u8:
                d_iota = jax.lax.broadcasted_iota(jnp.int32, (Dp, TK), 0)
                # Mosaic has no direct uint8->f32 cast; widen via int32.
                return jnp.where(d_iota < D,
                                 c.astype(jnp.int32).astype(jnp.float32),
                                 jnp.float32(1e9))
            if c.dtype != jnp.float32:
                return c.astype(jnp.float32)    # bf16 cost volume input
            return c

        def recurse(carry, c):
            prev = carry[:]
            m = jnp.min(prev, axis=0, keepdims=True)
            inf_row = jnp.full((1, TK), 1e9, jnp.float32)
            up = jnp.concatenate([prev[1:], inf_row], 0)
            dn = jnp.concatenate([inf_row, prev[:-1]], 0)
            best = jnp.minimum(
                jnp.minimum(prev, jnp.minimum(up, dn) + p1), m + p2
            )
            carry[:] = c + best - m

        def one(slot, s, dirn, carry):
            order = (range(TS) if dirn == 0 else range(TS - 1, -1, -1))
            for i, u in enumerate(order):
                c = prep(vin[slot, dirn, u])
                if i == 0:
                    @pl.when(s == 0)
                    def _(c=c, carry=carry):
                        carry[:] = c

                    @pl.when(s > 0)
                    def _(c=c, carry=carry):
                        recurse(carry, c)
                else:
                    recurse(carry, c)
                vout[slot, dirn, u] = _vstore(carry[:], out_dtype)

        # Warm up the in-pipeline, then loop: issue chunk s+1's loads,
        # wait chunk s's, recurse both directions, drain the out-DMA that
        # last used this slot (s-2) before overwriting, store, issue.
        in_dma(0, 0, 0).start()
        in_dma(0, 0, 1).start()

        def body(s, _):
            slot = jax.lax.rem(s, 2)
            nxt = jax.lax.rem(s + 1, 2)

            @pl.when(s + 1 < n_s)
            def _():
                in_dma(nxt, s + 1, 0).start()
                in_dma(nxt, s + 1, 1).start()

            in_dma(slot, s, 0).wait()
            in_dma(slot, s, 1).wait()

            @pl.when(s >= 2)
            def _():
                out_dma(slot, s - 2, 0).wait()
                out_dma(slot, s - 2, 1).wait()

            one(slot, s, 0, cf)
            one(slot, s, 1, cb)
            out_dma(slot, s, 0).start()
            out_dma(slot, s, 1).start()
            return 0

        jax.lax.fori_loop(0, n_s, body, 0)
        for s in range(max(0, n_s - 2), n_s):
            out_dma(s % 2, s, 0).wait()
            out_dma(s % 2, s, 1).wait()

    out_shape = jax.ShapeDtypeStruct((Sp, Dp, Kp), out_dtype)
    fwd, bwd = pl.pallas_call(
        kernel,
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, 2, TS, Dp, TK), volp.dtype),
            pltpu.VMEM((2, 2, TS, Dp, TK), out_dtype),
            pltpu.VMEM((Dp, TK), jnp.float32),
            pltpu.VMEM((Dp, TK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(p12, volp)
    if out_dtype == jnp.uint8:
        # u8 + u8 would wrap; widen, add, narrow (sums <= 2*(24+P2) <= 254
        # under the _u8_exact gate). XLA fuses this into one pass.
        both = (fwd.astype(jnp.int32)
                + bwd.astype(jnp.int32)).astype(jnp.uint8)[:S, :D, :K]
    else:
        both = (fwd + bwd)[:S, :D, :K]          # (S, D, K)
    if return_s_major:
        # scan-major consumer (the s-major unfused chain): hand back
        # (S, D, K) exactly as the kernel wrote it — no relayout
        return both
    if axis == 1:
        return jnp.transpose(both, (1, 0, 2))
    return jnp.transpose(both, (1, 2, 0))


def _transpose_add_pallas(aT, b=None, interpret: bool = False,
                          out_dtype=None, s_major: bool = False):
    """``transpose(aT, (0, 2, 1)) [+ b]`` as a Pallas TPU kernel.

    aT: (D, B, A), b: (D, A, B) or None -> (D, A, B) in ``out_dtype``
    (default: aT's dtype; uint8 input requires an explicit float out).

    ``s_major=True`` runs the SAME frame-transpose in the scan-major
    layout family: aT (B, D, A), b (A, D, B) -> (A, D, B) with
    out[a, d, b] = aT[b, d, a] + b[a, d, b]. This is the layout the
    aggregation kernel reads and writes natively, so the whole unfused
    SGM chain (cost build -> both aggregations -> summed volume ->
    epilogue) can flow scan-major with ZERO XLA volume relayouts
    (VERDICT r3 directive #5); the per-d MXU transpose trick is
    unchanged, only the block index maps and the in-block d slot move.

    The lane-moving transpose is the one operation XLA handles
    pathologically on v5e (a standalone (D, H, W)->(D, W, H) relayout of a
    64x480x640 volume measures ~2.6 s) and in-kernel ``jnp.swapaxes``
    miscompiles on this toolchain. The MXU, however, transposes for free:
    per 128x128 d-slice tile, X^T = dot_general(X, I) contracting the
    first axes (out[i, j] = sum_k X[k, i] * I[k, j] = X[j, i]) — exact,
    since each output element is one x*1 product plus exact zeros
    (precision=HIGHEST keeps f32 operands from bf16 truncation; bf16
    operands are exact natively for the small integers stored here).
    The optional ``b`` volume rides the same grid so the sum costs no
    extra HBM pass. uint8 input (the raw census cost volume) is widened
    to f32 in VMEM via int32 (Mosaic has no direct u8->f32 cast).
    """
    if s_major:
        B, D, A = aT.shape
        if b is not None:
            assert b.shape == (A, D, B), (aT.shape, b.shape)
    else:
        D, B, A = aT.shape
        if b is not None:
            assert b.shape == (D, A, B), (aT.shape, b.shape)
    if out_dtype is None:
        out_dtype = aT.dtype
    is_u8 = aT.dtype == jnp.uint8
    assert not (is_u8 and out_dtype == jnp.uint8)
    # TD scales with the input dtype's sublane tile: the TD=8 form ran a
    # 240-step grid at VGA d64 whose per-step sequencing cost dominated
    # (same finding as the fused epilogue — BENCH.md r3 anomaly).
    TA, TB = 128, 128
    TD = {1: 32, 2: 16}.get(aT.dtype.itemsize, 8)
    Dp = _round_up(D, max(TD, 32 if is_u8 else TD))
    Ap = _round_up(A, TA)
    Bp = _round_up(B, TB)
    if s_major:
        aTp = jnp.pad(aT, ((0, Bp - B), (0, Dp - D), (0, Ap - A)))
        operands = [aTp]
        if b is not None:
            operands.append(jnp.pad(b, ((0, Ap - A), (0, Dp - D),
                                        (0, Bp - B))))
    else:
        aTp = jnp.pad(aT, ((0, Dp - D), (0, Bp - B), (0, Ap - A)))
        operands = [aTp]
        if b is not None:
            operands.append(jnp.pad(b, ((0, Dp - D), (0, Ap - A),
                                        (0, Bp - B))))

    mm_dtype = jnp.float32 if is_u8 else aT.dtype
    # HIGHEST keeps true-f32 operands from bf16 truncation in the MXU;
    # bf16 operands are exact natively (0/1 identity times exactly-
    # representable values), and the u8 census costs (integers <= 24,
    # bf16-exact) take the 1-pass DEFAULT mode instead of the 3-pass f32
    # HIGHEST emulation.
    prec = (jax.lax.Precision.HIGHEST
            if (mm_dtype == jnp.float32 and not is_u8)
            else jax.lax.Precision.DEFAULT)

    def kernel(aT_ref, *rest):
        b_ref = rest[0] if b is not None else None
        o_ref = rest[-1]
        ir = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
        eye = (ir == ic).astype(mm_dtype)
        for t in range(TD):
            # s-major blocks carry d in the MIDDLE (sublane) slot: the
            # per-slice select is a static sublane index, which Mosaic
            # lowers to a strided VMEM access (no swapaxes involved —
            # that path miscompiles on this toolchain)
            X = aT_ref[:, t, :] if s_major else aT_ref[t]   # (TB, TA)
            if is_u8:
                X = X.astype(jnp.int32).astype(jnp.float32)
            xt = jax.lax.dot_general(
                X, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if b_ref is not None:
                bb = b_ref[:, t, :] if s_major else b_ref[t]
                if bb.dtype == jnp.uint8:
                    # no direct u8->f32 cast on Mosaic; via int32
                    bb = bb.astype(jnp.int32)
                xt = bb.astype(jnp.float32) + xt
            if s_major:
                o_ref[:, t, :] = xt.astype(out_dtype)
            else:
                o_ref[t] = xt.astype(out_dtype)

    if s_major:
        in_specs = [pl.BlockSpec((TB, TD, TA), lambda d, i, j: (j, d, i),
                                 memory_space=pltpu.VMEM)]
        if b is not None:
            in_specs.append(pl.BlockSpec((TA, TD, TB),
                                         lambda d, i, j: (i, d, j),
                                         memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((TA, TD, TB), lambda d, i, j: (i, d, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Ap, Dp, Bp), out_dtype)
    else:
        in_specs = [pl.BlockSpec((TD, TB, TA), lambda d, i, j: (d, j, i),
                                 memory_space=pltpu.VMEM)]
        if b is not None:
            in_specs.append(pl.BlockSpec((TD, TA, TB),
                                         lambda d, i, j: (d, i, j),
                                         memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((TD, TA, TB), lambda d, i, j: (d, i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Dp, Ap, Bp), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(Dp // TD, Ap // TA, Bp // TB),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if s_major:
        return out[:A, :D, :B]
    return out[:D, :A, :B]


def _sgm_epilogue_pallas(agg_v, agg_ht, *, D: int, subpixel: bool,
                         interpret: bool = False):
    """Fused SGM epilogue: transpose-add of the horizontal aggregate onto
    the vertical one + running argmin + (optional) subpixel parabola, in
    ONE pass over the two aggregated volumes (ROADMAP item 12).

    Replaces ``_transpose_add_pallas(agg_ht, agg_v)`` (which materialized
    the summed (D, H, W) volume) plus the XLA masked-reduction epilogue
    (~4 more reads of that volume): same grid and MXU-transpose trick as
    the transpose-add kernel, but the per-d cost slices feed a running
    argmin in VMEM scratch and only the (H, W) disparity ever reaches HBM.
    The argmin keeps first-minimum ties (strict ``<`` over increasing d)
    and the neighbor costs c0/c2 are captured in-sweep (a win records the
    previous slice as its left neighbor; the slice after a win supplies
    the right neighbor — same scheme as ``sad_pallas.disparity_pallas_lr``
    ``with_costs``), so the result is identical to the unfused form.

    agg_v: (D, Hp, Wp) bf16/f32 vertical-path aggregate, agg_ht:
    (D, Wp, Hp) horizontal-path aggregate in the transposed frame, with
    Hp/Wp multiples of 128 (zero padding is harmless: pad pixels never
    escape the crop). Returns disp float32 (Hp, Wp).
    """
    Dv, Hp, Wp = agg_v.shape
    assert agg_ht.shape == (Dv, Wp, Hp), (agg_v.shape, agg_ht.shape)
    assert Hp % 128 == 0 and Wp % 128 == 0, (Hp, Wp)
    is_u8 = agg_v.dtype == jnp.uint8
    # TD scales with the dtype's sublane tile so the d-grid stays SHORT:
    # the round-2 TD=8 form ran 240 grid steps at VGA d64 and its
    # ~15-30 us/step sequencing cost dominated the whole epilogue
    # (measured slower than the unfused transpose-add + XLA epilogue it
    # replaced — BENCH.md r3 anomaly). u8 tier: TD=32 -> 4x fewer steps
    # at identical VMEM block residency per byte.
    TA, TB = 128, 128
    TD = {1: 32, 2: 16}.get(agg_v.dtype.itemsize, 8)
    # 8-bit VMEM tiles are (32, 128) on the sublane axis; the d-pad only
    # affects block counts, and zero-pad slices are masked by d < D below.
    Dp = _round_up(Dv, max(TD, 32 if is_u8 else TD))
    if Dp != Dv:
        agg_v = jnp.pad(agg_v, ((0, Dp - Dv), (0, 0), (0, 0)))
        agg_ht = jnp.pad(agg_ht, ((0, Dp - Dv), (0, 0), (0, 0)))
    n_dg = Dp // TD
    mm_dtype = jnp.float32 if is_u8 else agg_ht.dtype
    # Precision of the dot-with-identity transpose: each output element
    # is exactly ONE product x * 1.0, so it is exact whenever x survives
    # the bf16 input rounding. u8 aggregates are integers <= 255 — all
    # exactly representable in bf16 — so the u8 tier takes the 1-pass
    # DEFAULT MXU mode instead of the 3-pass f32 HIGHEST emulation. The
    # f32 tier (fractional penalties) keeps HIGHEST for bit-identity with
    # the XLA path.
    prec = (jax.lax.Precision.HIGHEST
            if (mm_dtype == jnp.float32 and not is_u8)
            else jax.lax.Precision.DEFAULT)

    def kernel(v_ref, ht_ref, o_ref, best, bestd, c0, c2, prev):
        dg = pl.program_id(2)

        @pl.when(dg == 0)
        def _():
            best[:] = jnp.full((TA, TB), 1e9, jnp.float32)
            bestd[:] = jnp.full((TA, TB), 0, jnp.int32)
            c0[:] = jnp.full((TA, TB), 1e9, jnp.float32)
            c2[:] = jnp.full((TA, TB), 1e9, jnp.float32)
            prev[:] = jnp.full((TA, TB), 1e9, jnp.float32)

        ir = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
        eye = (ir == ic).astype(mm_dtype)
        for t in range(TD):
            d = dg * TD + t
            # MXU transpose of the horizontal slice (see
            # _transpose_add_pallas for why dot-with-identity is exact).
            # uint8 aggregates widen in VMEM via int32 (Mosaic has no
            # direct u8<->f32 cast) — the quarter-bandwidth tier.
            X = ht_ref[t]
            v = v_ref[t]
            if is_u8:
                X = X.astype(jnp.int32).astype(jnp.float32)
                v = v.astype(jnp.int32)
            ht = jax.lax.dot_general(
                X, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            c = v.astype(jnp.float32) + ht
            # d-pad slices (only in the last group) must never win.
            c = jnp.where(d < D, c, jnp.float32(1e9))
            win = c < best[:]
            c0[:] = jnp.where(win, prev[:], c0[:])
            best[:] = jnp.where(win, c, best[:])
            bestd[:] = jnp.where(win, d, bestd[:])
            c2[:] = jnp.where(bestd[:] == d - 1, c, c2[:])
            prev[:] = c

        @pl.when(dg == n_dg - 1)
        def _():
            db = bestd[:]
            if not subpixel:
                o_ref[:] = db.astype(jnp.float32)
            else:
                denom = jnp.maximum(c0[:] - 2 * best[:] + c2[:], 1e-6)
                delta = jnp.clip(0.5 * (c0[:] - c2[:]) / denom, -0.5, 0.5)
                o_ref[:] = jnp.where(
                    (db >= 1) & (db <= D - 2),
                    db.astype(jnp.float32) + delta,
                    db.astype(jnp.float32),
                )

    out = pl.pallas_call(
        kernel,
        grid=(Hp // TA, Wp // TB, n_dg),
        in_specs=[
            pl.BlockSpec((TD, TA, TB), lambda i, j, d: (d, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TD, TB, TA), lambda i, j, d: (d, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TA, TB), lambda i, j, d: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TA, TB), jnp.float32),   # best
            pltpu.VMEM((TA, TB), jnp.int32),     # bestd
            pltpu.VMEM((TA, TB), jnp.float32),   # c0
            pltpu.VMEM((TA, TB), jnp.float32),   # c2
            pltpu.VMEM((TA, TB), jnp.float32),   # prev
        ],
        interpret=interpret,
    )(agg_v, agg_ht)
    return out


def _argmin_first(agg, axis: int = 0):
    """First-minimum argmin over the disparity axis (default leading) of
    an aggregated volume via masked reductions (gather-free, see the
    epilogue note in ``_sgm_impl``)."""
    D = agg.shape[axis]
    m = jnp.min(agg, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, agg.shape, axis)
    return jnp.min(jnp.where(agg == m, iota, D), axis=axis)


def _diagonal_argmin_right(agg):
    """Right-referenced argmin over the diagonal of a LEFT-referenced
    (D, H, W) aggregated volume: costR(xr, d) = agg[d, y, xr + d] — the
    standard trick for SGM LR checks (one volume serves both directions,
    same scheme as ``sad_xla.disparity_raw_lr_xla``). Returns (H, W)
    int32 dR indexed by right-image pixel."""
    D, H, W = agg.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    aggP = jnp.pad(agg, ((0, 0), (0, 0), (0, D)), constant_values=_INF)

    def body(d, c):
        bc, bd = c
        costR = jax.lax.dynamic_slice_in_dim(aggP[d], d, W, axis=-1)
        # xr + d must be a real left pixel: xr < W - d
        costR = jnp.where(xs < W - d, costR, _INF)
        better = costR < bc
        return jnp.where(better, costR, bc), jnp.where(better, d, bd)

    _, dR = jax.lax.fori_loop(
        0, D, body,
        (jnp.full((H, W), _INF, jnp.float32), jnp.zeros((H, W), jnp.int32)),
    )
    return dR


def sgm_disparity_lr(
    left,
    right,
    *,
    max_disparity: int,
    P1: float = 1.0,
    P2: float = 8.0,
    subpixel: bool = True,
    backend: str = "auto",
    interpret: bool = False,
):
    """SGM disparity in BOTH directions from one aggregation: returns
    (dispL float32 (H, W), dR int32 (H, W) right-referenced integer map)
    for left-right consistency gating — SGM product parity with the SAD
    engine's fused LR path (VERDICT r1 weak #7).

    Unlike :func:`sgm_disparity` this materializes the summed aggregate
    volume (the diagonal right argmin needs it), so it costs one extra
    HBM pass over the fused-epilogue path."""
    if backend == "auto":
        backend = _default_sgm_backend()
    if backend not in ("pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    return _sgm_lr_impl(
        left, right, P1=float(P1), P2=float(P2),
        max_disparity=max_disparity, subpixel=subpixel,
        backend=backend, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "P1", "P2", "max_disparity", "subpixel", "backend", "interpret",
    ),
)
def _sgm_lr_impl(left, right, *, P1, P2, max_disparity, subpixel,
                 backend, interpret):
    if backend == "pallas":
        cost_t = census_cost_volume_T(
            left, right, max_disparity=max_disparity
        )
        cost = _transpose_add_pallas(cost_t, interpret=interpret,
                                     out_dtype=jnp.bfloat16)
        # bf16 tier only: the summed-volume transpose-add below widens the
        # *b* operand with a direct cast, which Mosaic lacks for uint8
        agg_dtype = (jnp.bfloat16 if _bf16_exact(P1, P2)
                     else jnp.float32)
        agg_v = _aggregate_axis_pallas(cost, P1, P2, axis=1,
                                       interpret=interpret,
                                       out_dtype=agg_dtype)
        agg_ht = _aggregate_axis_pallas(cost_t, P1, P2, axis=1,
                                        interpret=interpret,
                                        out_dtype=agg_dtype)
        agg = _transpose_add_pallas(
            agg_ht, agg_v, interpret=interpret,
            out_dtype=(jnp.bfloat16 if _bf16_sum_exact(P1, P2)
                       else jnp.float32),
        )
    else:
        cost = census_cost_volume(
            left, right, max_disparity=max_disparity
        ).astype(jnp.float32)
        agg = (
            _aggregate_axis(cost, P1, P2, axis=2)
            + _aggregate_axis(cost, P1, P2, axis=1)
        )

    dR = _diagonal_argmin_right(agg)
    return _epilogue_xla(agg, subpixel), dR


def sgm_lr_checked(
    left,
    right,
    *,
    max_disparity: int,
    P1: float = 1.0,
    P2: float = 8.0,
    threshold: float = 1.0,
    backend: str = "auto",
    interpret: bool = False,
):
    """SGM disparity with left-right consistency filtering: returns
    (disp float32 with invalid pixels at 0, valid mask) — the SGM
    counterpart of ``lr_check.disparity_lr_checked``."""
    dL, dR = sgm_disparity_lr(
        left, right, max_disparity=max_disparity, P1=P1, P2=P2,
        backend=backend, interpret=interpret,
    )
    W = left.shape[-1]
    xs = jax.lax.broadcasted_iota(jnp.int32, dL.shape, dL.ndim - 1)
    idx = jnp.clip(xs - jnp.round(dL).astype(jnp.int32), 0, W - 1)
    dR_at = jnp.take_along_axis(dR, idx, axis=-1)
    valid = jnp.abs(dL - dR_at.astype(jnp.float32)) <= threshold
    return jnp.where(valid, dL, 0.0), valid


def _default_sgm_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return "xla"
    return "pallas" if platform == "tpu" else "xla"


def sgm_disparity(
    left,
    right,
    *,
    max_disparity: int,
    P1: float = 1.0,
    P2: float = 8.0,
    subpixel: bool = True,
    backend: str = "auto",
    interpret: bool = False,
    epilogue: str = "unfused",
):
    """SGM disparity from a rectified uint8 stereo pair.

    Returns (disp float32 (H, W) — subpixel when enabled, uniqueness
    handled by the caller; raw integer argmin otherwise).
    ``backend``: "pallas" (TPU path: grid-stepped Pallas kernel for the
    vertical paths + ``lax.scan`` for the horizontal ones, separated from
    the argmin/subpixel epilogue by an ``optimization_barrier``), "xla"
    (portable pure-``lax.scan``), or "auto" (pallas on TPU, xla elsewhere).

    The split exists for CORRECTNESS, not just speed: the pure-scan
    program miscompiles on the v5e toolchain when XLA fuses the scan
    output into the subpixel gather — nondeterministic results, errors up
    to ~4 disparity units (verified against a CPU reference). The hybrid
    is bit-stable, matches the CPU reference to float rounding, and is
    measured faster (23.8ms vs 26ms at 640x480 D=64).

    ``epilogue`` (pallas backend only): "unfused" (default — MXU
    transpose-add of the two aggregates into a summed volume + XLA
    masked-reduction argmin/subpixel; measured 2.90 ms vs the fused
    kernel's 4.96 ms at VGA d64 on v5e, tools/sgm_bench.py 2026-08-21)
    or "fused" (the one-pass Pallas epilogue kernel — the summed volume
    never reaches HBM; composes ~2 ms of inter-stage relayout in the
    full program, so it loses end-to-end on a single chip despite
    winning in isolation; still used per-shard by parallel/sgm_shard
    where the W-band volumes are n-times smaller). Results are
    identical (exact small-integer sums, same first-min/parabola
    arithmetic; the equality is asserted in tests/test_sgm.py).

    A third variant "s_unfused" runs the whole unfused chain scan-major
    (zero XLA volume relayouts, u8 aggregate tier) — bit-identical, but
    measured SLOWER end-to-end (VGA 5.0 vs 2.36 ms; 1080p 46.1 vs
    28.7 ms; tools/sgm_bench.py sprefix bisection localizes ~2.9 ms to
    the s-major transpose-add's sublane-axis d addressing), so the
    d-major "unfused" stays the default. The only remaining algorithmic
    lever on the aggregation floor — a parallel-prefix (Blelloch)
    min-plus scan — is ruled out by measurement: one scan level at VGA
    d64 costs 65.7 ms against the 0.4 ms sequential recursion it would
    replace (tools/prefix_min_probe.py, chip, 2026-08-21).
    """
    if backend == "auto":
        backend = _default_sgm_backend()
    if backend not in ("pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    if epilogue not in ("unfused", "fused", "s_unfused"):
        raise ValueError(f"unknown epilogue {epilogue!r}")
    return _sgm_impl(
        left, right,
        P1=float(P1), P2=float(P2),
        max_disparity=max_disparity, subpixel=subpixel,
        backend=backend, interpret=interpret, epilogue=epilogue,
    )


# P1/P2 are static: they change only on operator retune (a recompile is
# fine), and passing them as device scalars costs two host->device
# transfers per frame — tens of ms through the axon tunnel.
@functools.partial(
    jax.jit,
    static_argnames=(
        "P1", "P2", "max_disparity", "subpixel", "backend", "interpret",
        "epilogue",
    ),
)
def _sgm_impl(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    P1: float,
    P2: float,
    max_disparity: int,
    subpixel: bool,
    backend: str,
    interpret: bool,
    epilogue: str = "unfused",
):
    if backend == "pallas":
        # Both path families run the SAME grid-stepped Pallas kernel: the
        # vertical paths on the (D, H, W) volume, the horizontal paths on
        # a cost volume built DIRECTLY in the transposed (D, W, H) frame
        # (census codes commute with image transposition up to a shared
        # bit permutation, so the tiny uint8 image transpose replaces the
        # pathological volume transpose). Both volumes stream in as raw
        # uint8 census costs (quarter bandwidth) and are widened in VMEM.
        # The MXU transpose-add kernel brings the horizontal aggregate
        # back to (D, H, W), folding in the vertical aggregate in the
        # same HBM pass. The barrier keeps XLA from fusing into the
        # epilogue — that fusion miscompiles on TPU (see sgm_disparity
        # docstring).
        # Only the TRANSPOSED volume is built in XLA: its disparity shift
        # slices along a major axis (nearly free), whereas the standard
        # frame's lane-axis shifts measured ~50 ms at 1080p. The standard
        # frame comes from the MXU transpose kernel instead, as exact
        # small-integer bf16 (census costs <= 24).
        if epilogue == "s_unfused":
            # Fully SCAN-MAJOR unfused chain (VERDICT r3 directive #5):
            # every volume lives in the (scan, D, lane) layout the
            # aggregation kernel reads/writes natively — the census
            # fusion WRITES (W, D, H) directly, the s-major MXU
            # transpose-add produces the (H, D, W) vertical input and
            # later folds the two aggregates, and the epilogue reduces
            # over the middle axis. ZERO XLA volume relayouts; the
            # aggregates ride the u8 tier when exact (the s-major
            # transpose-add widens u8 via int32 in-kernel).
            cost_th = census_cost_volume_T(
                left, right, max_disparity=max_disparity, s_major=True
            )                                             # (W, D+1, H) u8
            cost_sv = _transpose_add_pallas(
                cost_th, interpret=interpret,
                out_dtype=jnp.bfloat16, s_major=True,
            )                                             # (H, D+1, W)
            if _u8_exact(P1, P2):
                agg_dtype = jnp.uint8
            elif _bf16_exact(P1, P2):
                agg_dtype = jnp.bfloat16
            else:
                agg_dtype = jnp.float32
            agg_h = _aggregate_axis_pallas(
                cost_th, P1, P2, axis=1, interpret=interpret,
                out_dtype=agg_dtype, s_major=True, return_s_major=True,
            )                                             # (W, D+1, H)
            agg_v = _aggregate_axis_pallas(
                cost_sv, P1, P2, axis=1, interpret=interpret,
                out_dtype=agg_dtype, s_major=True, return_s_major=True,
            )                                             # (H, D+1, W)
            agg = _transpose_add_pallas(
                agg_h, agg_v, interpret=interpret,
                out_dtype=jnp.float32, s_major=True,
            )                                             # (H, D+1, W)
            return _epilogue_xla(agg, subpixel, d_axis=1)
        cost_t = census_cost_volume_T(
            left, right, max_disparity=max_disparity
        )
        cost = _transpose_add_pallas(cost_t, interpret=interpret,
                                     out_dtype=jnp.bfloat16)
        # Integer penalties keep every aggregated value an exact small
        # integer, so the volumes can live in uint8 (quarter HBM
        # bandwidth, see _u8_exact) or bfloat16 (half, see _bf16_exact)
        # with bit-identical disparities. The default P1=1/P2=8 takes the
        # uint8 tier; bf16 covers only the sliver P2=104, f32 the rest.
        if epilogue == "unfused":
            # Production default (measured 2.90 vs 4.96 ms at VGA d64 —
            # see sgm_disparity docstring): sum the two aggregates into
            # one volume via the MXU transpose-add, then the XLA masked-
            # reduction epilogue. The transpose-add widens its `b`
            # operand with a direct cast, which Mosaic lacks for uint8,
            # so the aggregate tier floor is bf16 (u8-exact values
            # <= 255 are bf16-exact integers — same disparities).
            agg_dtype = (jnp.bfloat16
                         if (_u8_exact(P1, P2) or _bf16_exact(P1, P2))
                         else jnp.float32)
            agg_v = _aggregate_axis_pallas(cost, P1, P2, axis=1,
                                           interpret=interpret,
                                           out_dtype=agg_dtype)
            agg_ht = _aggregate_axis_pallas(cost_t, P1, P2, axis=1,
                                            interpret=interpret,
                                            out_dtype=agg_dtype)
            agg = _transpose_add_pallas(
                agg_ht, agg_v, interpret=interpret,
                out_dtype=(jnp.bfloat16 if _bf16_sum_exact(P1, P2)
                           else jnp.float32),
            )
            return _epilogue_xla(agg, subpixel)
        if _u8_exact(P1, P2):
            agg_dtype = jnp.uint8
        elif _bf16_exact(P1, P2):
            agg_dtype = jnp.bfloat16
        else:
            agg_dtype = jnp.float32
        agg_v = _aggregate_axis_pallas(cost, P1, P2, axis=1,
                                       interpret=interpret,
                                       out_dtype=agg_dtype)
        agg_ht = _aggregate_axis_pallas(cost_t, P1, P2, axis=1,
                                        interpret=interpret,
                                        out_dtype=agg_dtype)
        # Fused epilogue (ROADMAP 12): the transpose-add of the two
        # aggregates, the argmin and the subpixel parabola all happen in
        # one Pallas pass — the summed volume never reaches HBM. The lane/
        # sublane pads fuse into the aggregate-producing fusions (pad
        # pixels compute garbage independently and are cropped). No
        # optimization_barrier needed: there is no XLA epilogue left to
        # mis-fuse into the scan output (see sgm_disparity docstring).
        # Wins in isolation but composes ~2 ms of inter-stage relayout in
        # the full program (BENCH.md r3) — kept for the sharded engine
        # and for epilogue="fused" callers.
        Hd, Wd = left.shape
        D = agg_v.shape[0]
        Hp = _round_up(Hd, 128)
        Wp = _round_up(Wd, 128)
        agg_v = jnp.pad(agg_v, ((0, 0), (0, Hp - Hd), (0, Wp - Wd)))
        agg_ht = jnp.pad(agg_ht, ((0, 0), (0, Wp - Wd), (0, Hp - Hd)))
        disp = _sgm_epilogue_pallas(
            agg_v, agg_ht, D=D, subpixel=subpixel, interpret=interpret
        )
        return disp[:Hd, :Wd]
    else:
        cost = census_cost_volume(
            left, right, max_disparity=max_disparity
        ).astype(jnp.float32)
        agg = (
            _aggregate_axis(cost, P1, P2, axis=2)   # left<->right paths
            + _aggregate_axis(cost, P1, P2, axis=1) # up<->down paths
        )

    return _epilogue_xla(agg, subpixel)


def _epilogue_xla(agg, subpixel: bool, d_axis: int = 0):
    """Argmin + (optional) subpixel parabola over the summed aggregate,
    as masked reductions over d instead of argmin + take_along_axis:
    per-pixel gathers along the major axis of (D, H, W) cost ~11 ms at
    640x480 on v5e, while min/where/sum sweeps are bandwidth-bound (~2x
    whole-SGM speedup, measured 22.9 -> 11.2 ms). Tie-breaking stays
    first-minimum, bit-exact vs the gather form. Shared by the portable
    backend here and the sharded engine (parallel/sgm_shard.py).

    ``d_axis``: which axis holds disparity — 0 for the (D, H, W)
    d-major volume, 1 for the scan-major (H, D, W) layout."""
    D = agg.shape[d_axis]
    d_best = _argmin_first(agg, axis=d_axis)
    if not subpixel:
        return d_best.astype(jnp.float32)

    iota = jax.lax.broadcasted_iota(jnp.int32, agg.shape, d_axis)
    d_c = jnp.clip(d_best, 1, D - 2)
    # Upcast before the masked sum: the parabola arithmetic needs f32
    # even when agg is bf16 (c0 - 2*c1 + c2 exceeds bf16's exact-integer
    # range); the cast fuses into the reduction, nothing materializes.
    sel = lambda d: jnp.where(
        iota == jnp.expand_dims(d, d_axis), agg, 0
    ).astype(jnp.float32).sum(d_axis)
    c0 = sel(d_c - 1)
    c1 = sel(d_c)
    c2 = sel(d_c + 1)
    denom = jnp.maximum(c0 - 2 * c1 + c2, 1e-6)
    delta = jnp.clip(0.5 * (c0 - c2) / denom, -0.5, 0.5)
    disp = jnp.where(
        (d_best >= 1) & (d_best <= D - 2),
        d_c.astype(jnp.float32) + delta,
        d_best.astype(jnp.float32),
    )
    return disp
