"""Census transform and SGM disparity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from steroscopic_hardware_tpu.ops.census import (
    census5x5,
    census_cost_volume,
    popcount32,
)
from steroscopic_hardware_tpu.ops.sgm import sgm_disparity


def test_popcount(rng):
    x = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    got = np.asarray(popcount32(jnp.asarray(x)))
    want = np.array([bin(int(v)).count("1") for v in x])
    assert np.array_equal(got, want)


def test_census_invariant_to_gain_offset(rng):
    img = rng.integers(10, 200, (32, 40), dtype=np.uint8)
    # census depends only on sign of neighbor differences -> monotone
    # transforms preserve codes (here: +20 offset, no saturation)
    brighter = (img + 20).astype(np.uint8)
    a = np.asarray(census5x5(jnp.asarray(img)))
    b = np.asarray(census5x5(jnp.asarray(brighter)))
    assert np.array_equal(a, b)


def test_cost_volume_zero_on_true_shift(rng):
    left = rng.integers(0, 256, (24, 64), dtype=np.uint8)
    shift = 5
    right = np.roll(left, -shift, axis=1)
    vol = np.asarray(
        census_cost_volume(jnp.asarray(left), jnp.asarray(right),
                           max_disparity=16)
    )
    # away from the wrap column and left border, cost at d=shift is 0
    assert (vol[shift, 4:-4, 24:56] == 0).mean() > 0.95
    # and other disparities are mostly nonzero for random texture
    assert (vol[0, 4:-4, 24:56] > 0).mean() > 0.9


def test_sgm_recovers_shift_including_textureless(rng):
    """SGM's smoothness term propagates disparity through a textureless
    hole where plain block matching is ambiguous."""
    left = rng.integers(0, 256, (48, 96), dtype=np.uint8)
    left[16:32, 30:60] = 120  # textureless block
    shift = 4
    right = np.roll(left, -shift, axis=1)
    disp = np.asarray(
        sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                      max_disparity=16)
    )
    inner = disp[8:-8, 20:80]
    assert np.abs(inner - shift).mean() < 0.5
    # inside the textureless hole specifically
    hole = disp[20:28, 36:54]
    assert np.abs(hole - shift).mean() < 0.75


def test_sgm_subpixel_within_half_pixel(rng):
    left = rng.integers(0, 256, (32, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    d = np.asarray(
        sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                      max_disparity=8, subpixel=True)
    )
    inner = d[4:-4, 16:70]
    assert np.abs(inner - 3).max() <= 0.5 + 1e-6


def test_sgm_on_real_pair_smoke(stereo_pair_small):
    left, right = stereo_pair_small
    lc = left[180:244, 200:360]
    rc = right[180:244, 200:360]
    disp = np.asarray(
        sgm_disparity(jnp.asarray(lc), jnp.asarray(rc), max_disparity=32)
    )
    assert disp.shape == lc.shape
    assert 0 <= disp.min() and disp.max() <= 32
    assert disp.std() > 0.1  # nontrivial structure


def test_sgm_matcher_in_pipeline_protocol(rng):
    from steroscopic_hardware_tpu.models.blockmatch import SGMMatcher
    from steroscopic_hardware_tpu.utils.params import Parameters

    m = SGMMatcher()
    m.set_params(Parameters(7, 16))
    left = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    right = np.roll(left, -4, axis=1)
    out = m.compute(left, right)
    assert out.dtype == np.uint8 and out.shape == left.shape
    raw = m.compute_raw(left, right)
    assert np.abs(raw[8:-8, 16:48] - 4).mean() < 0.5


def test_sgm_pallas_aggregation_matches_xla(rng):
    """The grid-stepped Pallas aggregation must match the lax.scan path
    exactly (same op order per element, integer costs in float32)."""
    import jax.numpy as jnp
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    cost = rng.integers(0, 25, (17, 40, 72)).astype(np.float32)
    c = jnp.asarray(cost)
    for axis in (1, 2):
        want = np.asarray(_aggregate_axis(c, 1.0, 8.0, axis=axis))
        got = np.asarray(
            _aggregate_axis_pallas(c, 1.0, 8.0, axis=axis, interpret=True)
        )
        assert np.array_equal(got, want), f"axis {axis} mismatch"


@pytest.mark.parametrize("epilogue", ["unfused", "fused", "s_unfused"])
def test_sgm_pallas_backend_end_to_end(rng, epilogue):
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, backend="xla"))
    b = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, backend="pallas",
                                 interpret=True, epilogue=epilogue))
    assert np.array_equal(a, b)


def test_census_cost_volume_transposed_frame(rng):
    """census_cost_volume_T must equal the transposed standard volume
    bit-for-bit (the Hamming cost is invariant under the shared bit
    permutation that image transposition applies to census codes)."""
    from steroscopic_hardware_tpu.ops.census import census_cost_volume_T

    left = rng.integers(0, 256, (37, 61), dtype=np.uint8)
    right = rng.integers(0, 256, (37, 61), dtype=np.uint8)
    want = np.asarray(
        census_cost_volume(jnp.asarray(left), jnp.asarray(right),
                           max_disparity=12)
    ).transpose(0, 2, 1)
    got = np.asarray(
        census_cost_volume_T(jnp.asarray(left), jnp.asarray(right),
                             max_disparity=12)
    )
    assert np.array_equal(got, want)

    # s_major emits the scan-major (W, D, H) layout of the same values,
    # and the aggregation consumes it transpose-free with identical output
    from steroscopic_hardware_tpu.ops.sgm import _aggregate_axis_pallas

    got_s = np.asarray(
        census_cost_volume_T(jnp.asarray(left), jnp.asarray(right),
                             max_disparity=12, s_major=True)
    )
    assert np.array_equal(got_s, got.transpose(1, 0, 2))
    a_ref = np.asarray(_aggregate_axis_pallas(
        jnp.asarray(got), 1.0, 8.0, axis=1, interpret=True))
    a_s = np.asarray(_aggregate_axis_pallas(
        jnp.asarray(got_s), 1.0, 8.0, axis=1, interpret=True,
        s_major=True))
    assert np.array_equal(a_ref, a_s)


def test_sgm_pallas_end_to_end_fractional_penalties(rng):
    """Fractional P1/P2 disable the bf16 volume optimization; the f32
    pallas pipeline must still match XLA bit-for-bit."""
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, P1=0.7, P2=5.3,
                                 backend="xla"))
    b = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, P1=0.7, P2=5.3,
                                 backend="pallas", interpret=True))
    assert np.array_equal(a, b)


def test_pick_col_tile_always_divides():
    """The lane tile must divide Kp exactly — the grid is Kp // TK wide,
    so a non-dividing tile silently drops trailing columns."""
    from steroscopic_hardware_tpu.ops.sgm import _pick_col_tile

    for m in range(1, 40):
        kp = 128 * m
        for dp in (8, 32, 96, 160, 264, 512):
            tk = _pick_col_tile(dp, kp)
            assert tk % 128 == 0 and kp % tk == 0, (dp, kp, tk)


def test_aggregation_bf16_exact_gate():
    from steroscopic_hardware_tpu.ops.sgm import _bf16_exact, _u8_exact

    assert _bf16_exact(1.0, 8.0)
    assert not _bf16_exact(0.7, 5.3)
    # the 2-way-sum bound: 2*(24+P2) <= 256 <=> P2 <= 104 (the 4-way sum
    # happens in f32 in the fused epilogue and does not constrain storage)
    assert _bf16_exact(1.0, 104.0)
    assert not _bf16_exact(1.0, 105.0)
    assert _u8_exact(1.0, 8.0)
    assert _u8_exact(1.0, 103.0)
    assert not _u8_exact(1.0, 104.0)
    assert not _u8_exact(0.7, 5.3)


def test_aggregation_uint8_output_matches_float(rng):
    """uint8 volume storage (the quarter-bandwidth tier selected for the
    default P1=1/P2=8) must round-trip the exact integer aggregates."""
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    cost = rng.integers(0, 25, (17, 40, 72), dtype=np.uint8)
    want = np.asarray(
        _aggregate_axis(jnp.asarray(cost, jnp.float32), 1.0, 8.0, axis=1)
    )
    got = np.asarray(
        _aggregate_axis_pallas(jnp.asarray(cost), 1.0, 8.0, axis=1,
                               interpret=True, out_dtype=jnp.uint8)
    ).astype(np.float32)
    assert np.array_equal(got, want)


def test_sgm_pallas_bf16_tier_end_to_end(rng):
    """P2=104 falls outside the uint8 gate but inside the relaxed bf16
    gate; the bf16-stored pallas path must still match XLA exactly."""
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, P2=104.0,
                                 backend="xla"))
    b = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, P2=104.0,
                                 backend="pallas", interpret=True))
    assert np.array_equal(a, b)


def test_aggregation_bf16_output_matches_float(rng):
    """bf16 volume storage must round-trip the exact integer aggregates."""
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    cost = rng.integers(0, 25, (17, 40, 72), dtype=np.uint8)
    want = np.asarray(
        _aggregate_axis(jnp.asarray(cost, jnp.float32), 1.0, 8.0, axis=1)
    )
    got = np.asarray(
        _aggregate_axis_pallas(jnp.asarray(cost), 1.0, 8.0, axis=1,
                               interpret=True, out_dtype=jnp.bfloat16)
    ).astype(np.float32)
    assert np.array_equal(got, want)


def test_aggregation_uint8_ingest_matches_float(rng):
    """The Pallas aggregation accepts raw uint8 census costs (the HBM
    bandwidth path) and must produce bit-identical float32 output."""
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    cost = rng.integers(0, 25, (17, 40, 72), dtype=np.uint8)
    want = np.asarray(
        _aggregate_axis(jnp.asarray(cost, jnp.float32), 1.0, 8.0, axis=1)
    )
    got = np.asarray(
        _aggregate_axis_pallas(jnp.asarray(cost), 1.0, 8.0, axis=1,
                               interpret=True)
    )
    assert np.array_equal(got, want)


def test_transpose_add_pallas_exact(rng):
    """The MXU transpose-add kernel is exact in float32 (x*1 + zeros)."""
    from steroscopic_hardware_tpu.ops.sgm import _transpose_add_pallas

    aT = rng.standard_normal((11, 72, 40)).astype(np.float32) * 100
    b = rng.standard_normal((11, 40, 72)).astype(np.float32) * 100
    want = aT.transpose(0, 2, 1) + b
    got = np.asarray(
        _transpose_add_pallas(jnp.asarray(aT), jnp.asarray(b),
                              interpret=True)
    )
    assert np.array_equal(got, want)


def test_transpose_add_pallas_s_major(rng):
    """The scan-major variant: aT (B, D, A) + b (A, D, B) -> (A, D, B)
    with out[a, d, b] = aT[b, d, a] + b[a, d, b], exact — and the u8
    ingest paths (via-int32 widening) for both operands."""
    from steroscopic_hardware_tpu.ops.sgm import _transpose_add_pallas

    aT = rng.standard_normal((72, 11, 40)).astype(np.float32) * 100
    b = rng.standard_normal((40, 11, 72)).astype(np.float32) * 100
    want = aT.transpose(2, 1, 0) + b
    got = np.asarray(
        _transpose_add_pallas(jnp.asarray(aT), jnp.asarray(b),
                              interpret=True, s_major=True)
    )
    assert np.array_equal(got, want)

    # u8 operands (the s_unfused chain's aggregate tier)
    a8 = rng.integers(0, 200, (72, 11, 40)).astype(np.uint8)
    b8 = rng.integers(0, 55, (40, 11, 72)).astype(np.uint8)
    want = a8.transpose(2, 1, 0).astype(np.float32) + b8
    got = np.asarray(
        _transpose_add_pallas(jnp.asarray(a8), jnp.asarray(b8),
                              interpret=True, s_major=True,
                              out_dtype=jnp.float32)
    )
    assert np.array_equal(got, want)


def test_sgm_s_unfused_all_tiers(rng):
    """The fully scan-major unfused chain (zero XLA volume relayouts)
    is bit-identical to the portable engine across the u8/bf16/f32
    aggregate tiers and both aggregate widths."""
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.clip(np.roll(left, -3, axis=1).astype(int)
                    + rng.integers(-2, 3, (40, 80)), 0, 255).astype(np.uint8)
    for (P1, P2, sub) in [(1.0, 8.0, True), (2.0, 104.0, False),
                          (1.5, 110.5, True)]:
        a = np.asarray(sgm_disparity(
            jnp.asarray(left), jnp.asarray(right), max_disparity=16,
            P1=P1, P2=P2, subpixel=sub, backend="xla"))
        b = np.asarray(sgm_disparity(
            jnp.asarray(left), jnp.asarray(right), max_disparity=16,
            P1=P1, P2=P2, subpixel=sub, backend="pallas",
            interpret=True, epilogue="s_unfused"))
        assert np.array_equal(a, b), (P1, P2, sub)


def test_sgm_pallas_fractional_penalties(rng):
    """Non-integer P1/P2 exercise the SMEM scalar path; results must agree
    to float tolerance."""
    import jax.numpy as jnp
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    cost = rng.integers(0, 25, (9, 24, 40)).astype(np.float32)
    c = jnp.asarray(cost)
    want = np.asarray(_aggregate_axis(c, 0.7, 5.3, axis=2))
    got = np.asarray(
        _aggregate_axis_pallas(c, 0.7, 5.3, axis=2, interpret=True)
    )
    assert np.allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("epilogue", ["unfused", "fused"])
def test_sgm_fused_epilogue_matches_xla_no_subpixel(rng, epilogue):
    """Both Pallas epilogues' raw-argmin paths (subpixel=False) must
    match the XLA backend exactly, including first-minimum tie-breaks."""
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, subpixel=False,
                                 backend="xla"))
    b = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, subpixel=False,
                                 backend="pallas", interpret=True,
                                 epilogue=epilogue))
    assert np.array_equal(a, b)


def test_sgm_fused_epilogue_winner_at_sweep_borders(rng):
    """Winners at d=0 and d=D-1 take the no-subpixel branch; the fused
    epilogue's in-sweep neighbor tracking must agree with the XLA
    masked-reduction epilogue there (c0/c2 are sentinel values at the
    borders and must never leak into the output)."""
    # zero shift -> winners concentrated at d=0; large roll -> d near D-1
    for shift in (0, -15):
        left = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        right = np.roll(left, shift, axis=1)
        a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                     max_disparity=16, backend="xla"))
        for epi in ("unfused", "fused"):
            b = np.asarray(sgm_disparity(
                jnp.asarray(left), jnp.asarray(right), max_disparity=16,
                backend="pallas", interpret=True, epilogue=epi))
            assert np.array_equal(a, b), (shift, epi)
            assert np.isfinite(b).all()


def test_sgm_lr_left_matches_plain(rng):
    """sgm_disparity_lr's left map must equal sgm_disparity exactly
    (same volume, same argmin/subpixel math)."""
    from steroscopic_hardware_tpu.ops.sgm import (
        sgm_disparity,
        sgm_disparity_lr,
    )

    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    a = np.asarray(sgm_disparity(jnp.asarray(left), jnp.asarray(right),
                                 max_disparity=16, backend="xla"))
    b, dR = sgm_disparity_lr(jnp.asarray(left), jnp.asarray(right),
                             max_disparity=16, backend="xla")
    assert np.array_equal(a, np.asarray(b))
    # the right map recovers the same shift over the interior
    assert np.abs(np.asarray(dR)[10:-10, 10:-30] - 3).mean() < 0.5


def test_sgm_lr_pallas_matches_xla(rng):
    from steroscopic_hardware_tpu.ops.sgm import sgm_disparity_lr

    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.roll(left, -3, axis=1)
    aL, aR = sgm_disparity_lr(jnp.asarray(left), jnp.asarray(right),
                              max_disparity=16, backend="xla")
    bL, bR = sgm_disparity_lr(jnp.asarray(left), jnp.asarray(right),
                              max_disparity=16, backend="pallas",
                              interpret=True)
    assert np.array_equal(np.asarray(aL), np.asarray(bL))
    assert np.array_equal(np.asarray(aR), np.asarray(bR))


def test_sgm_lr_checked_gates_mismatches(rng):
    """On a half-consistent scene the LR gate must keep consistent pixels
    and reject the uncorrelated half."""
    from steroscopic_hardware_tpu.ops.sgm import sgm_lr_checked

    left = rng.integers(0, 256, (48, 96), dtype=np.uint8)
    right = np.roll(left, -4, axis=1)
    # destroy correspondence in the right half of the right image
    right[:, 48:] = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    disp, valid = sgm_lr_checked(
        jnp.asarray(left), jnp.asarray(right), max_disparity=16,
        backend="xla")
    valid = np.asarray(valid)
    assert valid[8:-8, 8:40].mean() > 0.8      # consistent region survives
    assert valid[8:-8, 56:-8].mean() < 0.5     # uncorrelated region gated


def test_sgm_matcher_compute_checked(rng):
    from steroscopic_hardware_tpu.models.blockmatch import SGMMatcher
    from steroscopic_hardware_tpu.utils.params import Parameters

    m = SGMMatcher(params=Parameters(7, 16))
    left = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    right = np.roll(left, -4, axis=1)
    out, valid = m.compute_checked(left, right)
    assert out.dtype == np.uint8 and out.shape == left.shape
    assert valid.dtype == bool and valid[8:-8, 8:40].mean() > 0.7


@pytest.mark.parametrize("out_dtype", ["uint8", "float32"])
def test_aggregate_kernel_scan_pad_bitexact(rng, out_dtype):
    """S >= 256 and S % 32 != 0 triggers the absorbing scan-axis pad
    (TS=32 on e.g. 1080-row frames); the padded kernel must stay
    bit-exact vs the unpadded XLA scan — uniform pad rows reset the
    normalized recursion to its boundary init, so no real row can see
    them."""
    from steroscopic_hardware_tpu.ops.sgm import (
        _aggregate_axis,
        _aggregate_axis_pallas,
    )

    S, D, K = 296, 12, 128           # 296 % 32 == 8 -> pads to 320
    c = rng.integers(0, 25, (D, S, K)).astype(np.uint8)
    want = np.asarray(_aggregate_axis(
        jnp.asarray(c.astype(np.float32)), 1.0, 8.0, axis=1))
    dt = jnp.uint8 if out_dtype == "uint8" else jnp.float32
    cin = jnp.asarray(c if out_dtype == "uint8"
                      else c.astype(np.float32))
    got = np.asarray(_aggregate_axis_pallas(
        cin, 1.0, 8.0, axis=1, out_dtype=dt, interpret=True))
    assert got.shape == want.shape
    assert np.array_equal(got.astype(np.float32), want)


def test_sgm_bf16_summed_volume_boundary(rng):
    """The bf16 summed-volume gate (4*(24+P2) <= 256, P2 <= 40): both
    sides of the boundary must stay bit-identical to the portable
    engine (bf16 path at P2=40, f32 path at P2=48)."""
    left = rng.integers(0, 256, (40, 80), dtype=np.uint8)
    right = np.clip(np.roll(left, -3, axis=1).astype(int)
                    + rng.integers(-2, 3, (40, 80)), 0, 255).astype(np.uint8)
    for P2 in (40.0, 48.0):
        a = np.asarray(sgm_disparity(
            jnp.asarray(left), jnp.asarray(right), max_disparity=16,
            P1=2.0, P2=P2, backend="xla"))
        b = np.asarray(sgm_disparity(
            jnp.asarray(left), jnp.asarray(right), max_disparity=16,
            P1=2.0, P2=P2, backend="pallas", interpret=True))
        assert np.array_equal(a, b), P2
