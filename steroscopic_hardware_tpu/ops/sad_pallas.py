"""Fused Pallas TPU kernel: SAD cost volume + winner-take-all disparity.

TPU-native equivalent of the reference's entire compute tier — the Go worker
pool (``pkg/despair/sad.go:29-113``) and the FPGA datapath
(``hardware/compute_SAD.v:62-265`` per-pixel WTA FSM and the streaming
``disparity_top`` design, ``compute_SAD.v:267-545``) — re-designed for the
VPU/MXU instead of translated:

* The Verilog line buffers + WIN x WIN shift registers become VMEM-resident
  row tiles with halo; the serial FSM disparity sweep becomes the inner grid
  dimension with all pixels of a tile evaluated per step in parallel.
* The separable (2h+1)^2 box sum is computed as log-tree windowed sums
  (power-of-2 doubling) on the 8x128 VPU — ~2*log2(B)+1 adds per axis
  instead of B — in exact int32 arithmetic.
* Winner-take-all runs as a running argmin in VMEM scratch across the
  disparity grid dimension (strict ``<`` so the smallest disparity wins
  ties, matching ``sad.go:79``); the normalized uint8 map
  (``bestD * 255 // maxD``, ``sad.go:91-93``) is written once on the final
  step.

Bit-exact with ``ops/sad_golden.py`` / ``ops/sad_xla.py`` (tested in
``tests/test_sad_pallas.py``).

Memory layout (built by the jitted wrapper, all static shapes):
  Lbuf: [h zeros | W image | zeros]                 width Wbuf, height Hp
  Rbuf: same layout; the disparity shift is incremental — one static
        lane shift with zero fill per grid step
  Hp = n_tiles * TH + 2h rows (h zeros top, zeros bottom)
with Wout = roundup(W, 128), Wbuf = Wout + 2h. Buffer column j holds image
column j - h, so every window read is an in-bounds static slice and the
zero padding implements the reference's border-truncation semantics exactly
(truncated terms contribute 0 to the sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_row_tile(row_tile: int, H: int, W: int, h: int,
                   budget_bytes: int = 12 << 20,
                   max_disparity: int = 0,
                   lr: bool = False, with_costs: bool = False) -> int:
    """Largest row tile <= row_tile whose VMEM footprint (DMA stages +
    int32 working set + argmin accumulators + box-sum temporaries + any
    LR/with_costs extras and output blocks) fits the budget — keeps 4K
    frames compiling without manual tuning.

    At the d256 envelope edge the COMPILER's working set fails before
    VMEM does: 1080p b31/d256 at TH=128 (est ~10 MB, inside the 12 MB
    budget) deterministically crashes the remote tpu_compile_helper,
    while TH=64 compiles and runs at 17.6 ms (measured 2026-08-21, see
    BENCH.md). Halve the budget for d >= 256 so the picker lands on the
    tile the toolchain can actually build."""
    if max_disparity >= 256:
        budget_bytes = min(budget_bytes, 6 << 20)
    TH = min(row_tile, _round_up(max(H, 8), 8))
    while TH > 8:
        Wout = _round_up(W, 128)
        Wbuf = _round_up(Wout + 2 * h, 128)
        TR = _round_up(TH + 2 * h, 32)
        # base: u8 stages x2, int32 lt/rs x2, ~4 live box-sum temporaries
        est = TR * Wbuf * (2 * 1 + 2 * 4 + 4 * 4)
        # bcL/bdL accumulators + output block(s)
        n_small = 2 + 1
        if lr:
            Wacc = _round_up(Wout + max_disparity, 128)
            est += 2 * TH * Wacc * 4          # bcR/bdR drifting accs
            n_small += 1                      # second output
        if with_costs:
            n_small += 3 + 3                  # clL/crL/prevL + 3 outputs
        est += n_small * TH * Wout * 4
        if est <= budget_bytes:
            break
        TH = _round_up(TH // 2, 8)
    return TH


def _window_sum(a, B: int, out_len: int, axis: int):
    """Sliding-window sum: out[..., x] = sum_{k<B} a[..., x+k] (length
    ``out_len``), via power-of-2 doubling partial sums (log-tree)."""

    def sl(arr, start, length):
        if axis == 0:
            return arr[start : start + length, :]
        return arr[:, start : start + length]

    size = a.shape[axis]
    pows = {1: a}
    p = 1
    while 2 * p <= B:
        prev = pows[p]
        plen = size - 2 * p + 1
        pows[2 * p] = sl(prev, 0, plen) + sl(prev, p, plen)
        size_p = plen  # noqa: F841  (length tracked via shapes)
        p *= 2

    out = None
    off = 0
    rem = B
    for p in sorted(pows, reverse=True):
        while rem >= p:
            piece = sl(pows[p], off, out_len)
            out = piece if out is None else out + piece
            off += p
            rem -= p
    return out


def _make_kernel(H, W, block_size, max_disparity, TH, Wout, Wbuf, TR,
                 U=1, hbm_inputs=True, n_t=None, Hp=None):
    """``n_t``/``Hp``: tiles per frame and padded frame row stride — the
    1D grid enumerates (frame, tile) pairs so a whole frame BATCH runs in
    one launch (grid size F * n_t); single-frame calls pass n_t == grid
    size, making the frame index identically 0."""
    h = block_size // 2
    B = 2 * h + 1
    n_d = max_disparity + 1

    def _sweep(in_image, out_ref, lt32, rs, best_key):
        # The whole disparity sweep lives IN-kernel as a fori_loop over
        # VMEM-carried scratch state (one grid step per row tile). Round 1
        # ran one grid step per disparity and was sequencing-bound: ~1 us
        # of VPU work per step against several us of fixed grid-step
        # overhead. A scalar-core loop carries none of that overhead, and
        # unlike static grid unrolling, loop iterations share spill space,
        # so any d_unroll is VMEM-safe.
        x = jax.lax.broadcasted_iota(jnp.int32, (TH, Wout), 1)

        # Winner-take-all as a SINGLE packed-key min: key = cost*512 + d.
        # cost <= 255*31*31 < 2^18 and d <= 256 < 512, so the key fits
        # int32 and orders exactly like (cost, d) lexicographically —
        # i.e. the reference's strict-< smallest-d tie-break (sad.go:79)
        # — in one jnp.minimum on one accumulator instead of a
        # compare+two-selects on two. Invalid candidates (d > x - h,
        # sad.go:64-67) take the sentinel 2^30, which also serves as the
        # init: if nothing valid ever wins, 2^30 & 511 == 0 -> output 0,
        # matching the reference's untouched-pixel value.
        def key_at(d):
            ad = jnp.abs(lt32[:] - rs[:])
            # Separable box sum: columns (lane axis) then rows (sublane
            # axis), each as a log-tree windowed sum: power-of-2 partial
            # sums built by doubling, then O(popcount(B)) combines —
            # ~2*log2(B)+1 adds per axis instead of B (the win that makes
            # block 31 cheap).
            colsum = _window_sum(ad, B, Wout, axis=1)
            cost = _window_sum(colsum, B, TH, axis=0)
            # Candidate validity: d <= x - h (for x < h no candidate is
            # valid, best stays the sentinel -> output 0, as above).
            return jnp.where(x >= d + h, cost * 512 + d, _BIG)

        def update(key):
            best_key[:] = jnp.minimum(best_key[:], key)

        # d = 0 hoisted out of the loop (no shift), so the loop body's
        # shift is unconditional — no per-step predicate.
        update(key_at(0))

        def shift():
            # Incremental disparity shift (rs[:, j] = R[:, j - h - d]) as
            # a lane rotate plus ONE static column zero: column W + h is
            # the only one that ever receives a live image pixel it must
            # not keep (all columns beyond it were zeroed on earlier
            # steps, and the wrap-around into column 0 is a zero from
            # that region), so re-zeroing it each step maintains the
            # invariant "columns >= W + h read as zero" that the
            # reference's truncated right windows require — without the
            # full-width select of the naive masked shift.
            rs[:] = pltpu.roll(rs[:], 1, 1)
            rs[:, W + h : W + h + 1] = jnp.zeros((TR, 1), jnp.int32)

        # Manual partial unroll: Mosaic's fori_loop supports only
        # unroll=1 or full unroll, so U disparity steps are batched per
        # loop iteration with a Python-level inner loop. Tail steps of the
        # last group (only when U doesn't divide n_d - 1) shift harmlessly
        # past the sweep and are masked out of the argmin, keeping any U
        # bit-exact.
        n_steps = n_d - 1
        n_g = -(-n_steps // U) if n_steps else 0
        exact = n_steps % U == 0

        def group(g, _):
            for i in range(U):
                d = 1 + g * U + i
                shift()
                key = key_at(d)
                if not exact:
                    key = jnp.where(d <= max_disparity, key, _BIG)
                update(key)
            return 0

        if n_g:
            jax.lax.fori_loop(0, n_g, group, 0)
        best_d = jax.lax.rem(best_key[:], 512)
        out_ref[:] = ((best_d * 255) // max_disparity).astype(jnp.uint8)

    def _row0():
        g = pl.program_id(0)
        if n_t is None:
            return g * TH
        return (g // n_t) * Hp + (g % n_t) * TH

    def kernel_vmem(l_ref, r_ref, out_ref, lt32, rs, best_key):
        row0 = _row0()
        cols = jax.lax.broadcasted_iota(jnp.int32, (TR, Wbuf), 1)
        in_image = cols < W + h

        lt32[:] = l_ref[pl.ds(row0, TR), :].astype(jnp.int32)
        rs[:] = jnp.where(
            in_image, r_ref[pl.ds(row0, TR), :].astype(jnp.int32), 0
        )
        best_key[:] = jnp.full((TH, Wout), _BIG, jnp.int32)
        _sweep(in_image, out_ref, lt32, rs, best_key)

    def kernel(
        l_hbm, r_hbm, out_ref, lt_u8, rt_u8, lt32, rs, best_key, sems
    ):
        row0 = _row0()
        cols = jax.lax.broadcasted_iota(jnp.int32, (TR, Wbuf), 1)
        # Out-of-image columns (buffer col j >= W + h) must read as zero so
        # the reference's truncated right windows see zeros; applying the
        # mask to rs on every step keeps shifted-in pixels from surviving.
        in_image = cols < W + h

        # Per-tile init: DMA the row tile (+halo) from HBM — VMEM usage
        # is bounded regardless of image size — then hoist the
        # uint8 -> int32 conversion out of the disparity sweep and reset
        # the winner-take-all accumulators.
        cl = pltpu.make_async_copy(
            l_hbm.at[pl.ds(row0, TR), :], lt_u8, sems.at[0]
        )
        cr = pltpu.make_async_copy(
            r_hbm.at[pl.ds(row0, TR), :], rt_u8, sems.at[1]
        )
        cl.start()
        cr.start()
        cl.wait()
        cr.wait()
        lt32[:] = lt_u8[:].astype(jnp.int32)
        rs[:] = jnp.where(in_image, rt_u8[:].astype(jnp.int32), 0)
        best_key[:] = jnp.full((TH, Wout), _BIG, jnp.int32)
        _sweep(in_image, out_ref, lt32, rs, best_key)

    return kernel if hbm_inputs else kernel_vmem


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "max_disparity", "row_tile", "hbm_inputs", "d_unroll",
        "interpret",
    ),
)
def disparity_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    block_size: int,
    max_disparity: int,
    row_tile: int = 256,
    hbm_inputs: bool = True,
    d_unroll: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense uint8 disparity map on TPU via the fused Pallas kernel.

    Args: uint8 grayscale (H, W) images; parameters as in
    :func:`steroscopic_hardware_tpu.ops.sad_xla.disparity_xla`.
    The disparity sweep runs as an in-kernel ``fori_loop`` (one grid step
    per row tile); ``d_unroll`` is the loop's unroll factor (bit-exact —
    same ops, same order). Loop iterations share spill space, so unlike
    grid-step unrolling any value is VMEM-safe.
    """
    if left.shape != right.shape or left.ndim != 2:
        raise ValueError("left/right must be identical-shape (H, W) images")
    H, W = left.shape
    h = block_size // 2
    TH = _pick_row_tile(row_tile, H, W, h,
                        max_disparity=max_disparity)
    n_tiles = -(-H // TH)
    # Native-tile-aligned shapes: lane dims multiples of 128, sublane loads
    # multiples of 8, so Mosaic keeps everything in the natural layout.
    Wout = _round_up(W, 128)
    Wbuf = _round_up(Wout + 2 * h, 128)
    # TR is a multiple of 32 so the HBM->VMEM DMA of uint8 row tiles starts
    # and ends on native (32, 128) tile boundaries.
    TR = _round_up(TH + 2 * h, 32)
    Hp = n_tiles * TH + (TR - TH)
    n_d = max_disparity + 1
    U = max(1, min(d_unroll, max(1, n_d - 1)))

    Lbuf = jnp.zeros((Hp, Wbuf), jnp.uint8)
    Lbuf = jax.lax.dynamic_update_slice(Lbuf, left, (h, h))
    Rbuf = jnp.zeros((Hp, Wbuf), jnp.uint8)
    Rbuf = jax.lax.dynamic_update_slice(Rbuf, right, (h, h))

    kernel = _make_kernel(
        H, W, block_size, max_disparity, TH, Wout, Wbuf, TR,
        U=U, hbm_inputs=hbm_inputs,
    )
    if hbm_inputs:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        scratch = [
            pltpu.VMEM((TR, Wbuf), jnp.uint8),  # lt_u8 DMA stage
            pltpu.VMEM((TR, Wbuf), jnp.uint8),  # rt_u8 DMA stage
            pltpu.VMEM((TR, Wbuf), jnp.int32),  # lt32
            pltpu.VMEM((TR, Wbuf), jnp.int32),  # rs (shifted right image)
            pltpu.VMEM((TH, Wout), jnp.int32),  # best_key (cost*512 + d)
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        in_specs = [
            pl.BlockSpec(
                (Hp, Wbuf), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Hp, Wbuf), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        scratch = [
            pltpu.VMEM((TR, Wbuf), jnp.int32),  # lt32
            pltpu.VMEM((TR, Wbuf), jnp.int32),  # rs (shifted right image)
            pltpu.VMEM((TH, Wout), jnp.int32),  # best_key (cost*512 + d)
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TH, Wout), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TH, Wout), jnp.uint8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(Lbuf, Rbuf)
    return out[:H, :W]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "max_disparity", "row_tile", "d_unroll", "interpret"
    ),
)
def disparity_pallas_batch(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    *,
    block_size: int,
    max_disparity: int,
    row_tile: int = 256,
    d_unroll: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched disparity for multi-stream serving: (F, H, W) uint8 pairs
    in ONE kernel launch, bit-identical per frame to separate calls.

    Native batch path: the grid enumerates (frame, tile) pairs over a
    single (F * Hp, Wbuf) buffer built with ONE fused pad + free reshape.
    (The round 1 version stacked frames vertically with per-frame
    dynamic-update-slices and restacked the outputs — ~0.5 ms/frame of
    pure data movement that capped batch-axis scaling at ~45%
    efficiency.) Per-frame zero padding gives exactly the reference's
    border truncation, so frames cannot bleed into each other.
    """
    if lefts.ndim != 3 or lefts.shape != rights.shape:
        raise ValueError("expected identical (F, H, W) uint8 stacks")
    F, H, W = lefts.shape
    h = block_size // 2
    TH = _pick_row_tile(row_tile, H, W, h,
                        max_disparity=max_disparity)
    n_t = -(-H // TH)
    Wout = _round_up(W, 128)
    Wbuf = _round_up(Wout + 2 * h, 128)
    TR = _round_up(TH + 2 * h, 32)
    Hp = n_t * TH + (TR - TH)
    n_d = max_disparity + 1
    U = max(1, min(d_unroll, max(1, n_d - 1)))

    Lbuf = jnp.pad(lefts, ((0, 0), (h, Hp - H - h), (h, Wbuf - W - h))
                   ).reshape(F * Hp, Wbuf)
    Rbuf = jnp.pad(rights, ((0, 0), (h, Hp - H - h), (h, Wbuf - W - h))
                   ).reshape(F * Hp, Wbuf)

    kernel = _make_kernel(
        H, W, block_size, max_disparity, TH, Wout, Wbuf, TR,
        U=U, hbm_inputs=True, n_t=n_t, Hp=Hp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(F * n_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (TH, Wout), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((F * n_t * TH, Wout), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((TR, Wbuf), jnp.uint8),
            pltpu.VMEM((TR, Wbuf), jnp.uint8),
            pltpu.VMEM((TR, Wbuf), jnp.int32),
            pltpu.VMEM((TR, Wbuf), jnp.int32),
            pltpu.VMEM((TH, Wout), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(Lbuf, Rbuf)
    return out.reshape(F, n_t * TH, Wout)[:, :H, :W]


def _make_lr_kernel(H, W, block_size, max_disparity, TH, Wout, Wbuf, TR,
                    Wacc, with_costs=False):
    h = block_size // 2
    B = 2 * h + 1
    n_d = max_disparity + 1

    def kernel(l_hbm, r_hbm, *rest):
        if with_costs:
            (outL, outR, outCl, outCc, outCr, lt_u8, rt_u8, lt32, rs,
             bcL, bdL, bcR, bdR, clL, crL, prevL, sems) = rest
        else:
            (outL, outR, lt_u8, rt_u8, lt32, rs,
             bcL, bdL, bcR, bdR, sems) = rest
        t = pl.program_id(0)
        row0 = t * TH
        cols = jax.lax.broadcasted_iota(jnp.int32, (TR, Wbuf), 1)
        in_image = cols < W + h
        x = jax.lax.broadcasted_iota(jnp.int32, (TH, Wout), 1)

        cl = pltpu.make_async_copy(
            l_hbm.at[pl.ds(row0, TR), :], lt_u8, sems.at[0]
        )
        cr = pltpu.make_async_copy(
            r_hbm.at[pl.ds(row0, TR), :], rt_u8, sems.at[1]
        )
        cl.start()
        cr.start()
        cl.wait()
        cr.wait()
        lt32[:] = lt_u8[:].astype(jnp.int32)
        rs[:] = jnp.where(in_image, rt_u8[:].astype(jnp.int32), 0)
        bcL[:] = jnp.full((TH, Wout), _BIG, jnp.int32)
        bdL[:] = jnp.zeros((TH, Wout), jnp.int32)
        bcR[:] = jnp.full((TH, Wacc), _BIG, jnp.int32)
        bdR[:] = jnp.zeros((TH, Wacc), jnp.int32)
        if with_costs:
            clL[:] = jnp.full((TH, Wout), _BIG, jnp.int32)
            crL[:] = jnp.full((TH, Wout), _BIG, jnp.int32)
            prevL[:] = jnp.full((TH, Wout), _BIG, jnp.int32)

        def body(d):
            ad = jnp.abs(lt32[:] - rs[:])
            colsum = _window_sum(ad, B, Wout, axis=1)
            cost = _window_sum(colsum, B, TH, axis=0)

            costL = jnp.where(x >= d + h, cost, _BIG)
            betterL = costL < bcL[:]
            if with_costs:
                # subpixel neighbor tracking (same scheme as
                # sad_xla.disparity_subpixel_xla): a win captures the
                # previous step's cost as the left neighbor and invalidates
                # the right neighbor; the step after a win supplies the
                # right neighbor.
                clL[:] = jnp.where(betterL, prevL[:], clL[:])
                crL[:] = jnp.where(betterL, _BIG, crL[:])
            bcL[:] = jnp.where(betterL, costL, bcL[:])
            bdL[:] = jnp.where(betterL, d, bdL[:])
            if with_costs:
                crL[:] = jnp.where(bdL[:] == d - 1, costL, crL[:])
                prevL[:] = costL

            # Right-referenced diagonal bcR[xr] = min_d cost_d[xr + d],
            # accumulated in DRIFTING coordinates so every step is a cheap
            # static shift-by-one:
            #   A_d = min(shift_right_1(A_{d-1}), cost_d)
            # gives A_D[j] = min_d cost_d[j - (D - d)], i.e. bcR = A_D
            # offset by the static max_disparity (one static slice at the
            # end). costL already carries the shared validity
            # (d <= x-h <=> xr >= h); additionally mask the width-pad
            # columns (x >= W), whose zero-pad costs are meaningless and
            # would drift into valid xr slots.
            costP = jnp.concatenate(
                [jnp.where(x < W, costL, _BIG),
                 jnp.full((TH, Wacc - Wout), _BIG, jnp.int32)], axis=1
            )
            shift_c = jnp.concatenate(
                [jnp.full((TH, 1), _BIG, jnp.int32), bcR[:, : Wacc - 1]],
                axis=1,
            )
            shift_i = jnp.concatenate(
                [jnp.zeros((TH, 1), jnp.int32), bdR[:, : Wacc - 1]], axis=1
            )
            takeNew = costP < shift_c
            bcR[:] = jnp.where(takeNew, costP, shift_c)
            bdR[:] = jnp.where(takeNew, d, shift_i)

        # d = 0 hoisted (no shift); the in-kernel loop covers d = 1..maxD
        # with an unconditional shift — same restructure as _make_kernel
        # (one grid step per row tile, no per-disparity grid overhead).
        body(0)

        def step(d, _):
            shifted = jnp.concatenate(
                [jnp.zeros((TR, 1), jnp.int32), rs[:, : Wbuf - 1]], axis=1
            )
            rs[:] = jnp.where(in_image, shifted, 0)
            body(d)
            return 0

        jax.lax.fori_loop(1, n_d, step, 0)

        outL[:] = bdL[:]
        outR[:] = bdR[:, max_disparity : max_disparity + Wout]
        if with_costs:
            outCl[:] = clL[:]
            outCc[:] = bcL[:]
            outCr[:] = crL[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "max_disparity", "row_tile",
                     "with_costs", "interpret"),
)
def disparity_pallas_lr(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    block_size: int,
    max_disparity: int,
    row_tile: int = 128,
    with_costs: bool = False,
    interpret: bool = False,
):
    """Fused left+right raw disparities in ONE kernel sweep (the TPU
    counterpart of ``sad_xla.disparity_raw_lr_xla``): the right-referenced
    argmin rides the cost-volume diagonal in drifting coordinates (static
    shifts only). Returns (dL, dR) int32 (H, W); with ``with_costs`` also
    the left map's (c_left, c_best, c_right) argmin-neighborhood costs for
    subpixel interpolation."""
    if left.shape != right.shape or left.ndim != 2:
        raise ValueError("left/right must be identical-shape (H, W) images")
    H, W = left.shape
    h = block_size // 2
    TH = _pick_row_tile(row_tile, H, W, h, max_disparity=max_disparity,
                        lr=True, with_costs=with_costs)
    n_tiles = -(-H // TH)
    Wout = _round_up(W, 128)
    Wbuf = _round_up(Wout + 2 * h, 128)
    TR = _round_up(TH + 2 * h, 32)
    Hp = n_tiles * TH + (TR - TH)
    n_d = max_disparity + 1

    Lbuf = jnp.zeros((Hp, Wbuf), jnp.uint8)
    Lbuf = jax.lax.dynamic_update_slice(Lbuf, left, (h, h))
    Rbuf = jnp.zeros((Hp, Wbuf), jnp.uint8)
    Rbuf = jax.lax.dynamic_update_slice(Rbuf, right, (h, h))

    Wacc = _round_up(Wout + max_disparity, 128)
    kernel = _make_lr_kernel(
        H, W, block_size, max_disparity, TH, Wout, Wbuf, TR, Wacc,
        with_costs=with_costs,
    )
    n_out = 5 if with_costs else 2
    out_spec = pl.BlockSpec((TH, Wout), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles * TH, Wout), jnp.int32)
    scratch = [
        pltpu.VMEM((TR, Wbuf), jnp.uint8),
        pltpu.VMEM((TR, Wbuf), jnp.uint8),
        pltpu.VMEM((TR, Wbuf), jnp.int32),
        pltpu.VMEM((TR, Wbuf), jnp.int32),
        pltpu.VMEM((TH, Wout), jnp.int32),  # bcL
        pltpu.VMEM((TH, Wout), jnp.int32),  # bdL
        pltpu.VMEM((TH, Wacc), jnp.int32),  # bcR (drifting coords)
        pltpu.VMEM((TH, Wacc), jnp.int32),  # bdR (drifting coords)
    ]
    if with_costs:
        scratch += [
            pltpu.VMEM((TH, Wout), jnp.int32),  # clL
            pltpu.VMEM((TH, Wout), jnp.int32),  # crL
            pltpu.VMEM((TH, Wout), jnp.int32),  # prevL
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(out_spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Lbuf, Rbuf)
    return tuple(o[:H, :W] for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "max_disparity", "row_tile", "interpret"),
)
def disparity_pallas_subpixel(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    block_size: int,
    max_disparity: int,
    row_tile: int = 128,
    interpret: bool = False,
):
    """Subpixel left disparity + raw right disparity on TPU: the fused LR
    kernel tracks the argmin's neighbor costs in-sweep, then a parabola fit
    refines the integer winner (same scheme as
    ``sad_xla.disparity_subpixel_xla``). Returns (dL float32, dR int32)."""
    from steroscopic_hardware_tpu.ops.sad_xla import parabola_refine

    dL, dR, c0, c1, c2 = disparity_pallas_lr(
        left, right, block_size=block_size, max_disparity=max_disparity,
        row_tile=row_tile, with_costs=True, interpret=interpret,
    )
    return parabola_refine(c0, c1, c2, dL), dR
