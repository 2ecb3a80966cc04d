"""Pallas fused-kernel bit-exactness (interpret mode on the CPU mesh).

On real TPU hardware the same kernel is exercised by ``bench.py`` and
``__graft_entry__.py``; here the Mosaic interpreter validates both kernel
variants (HBM-DMA tiles and full-VMEM inputs) against the numpy
cost-volume reference, which is itself validated against the literal Go
semantics in ``test_sad_bitexact.py``.
"""

import numpy as np
import pytest

from steroscopic_hardware_tpu.ops.sad_golden import disparity_numpy
from steroscopic_hardware_tpu.ops.sad_pallas import disparity_pallas


def _pair(rng, h, w):
    left = rng.integers(0, 256, (h, w), dtype=np.uint8)
    right = np.clip(
        np.roll(left, -4, axis=1).astype(int) + rng.integers(-2, 3, (h, w)),
        0,
        255,
    ).astype(np.uint8)
    return left, right


@pytest.mark.parametrize("hbm", [True, False])
@pytest.mark.parametrize(
    "h,w,block,maxd,rt",
    [
        (20, 26, 3, 16, 128),   # tiny, single tile
        (40, 60, 7, 16, 128),
        (33, 31, 31, 16, 128),  # max block, heavy borders
        (64, 130, 9, 48, 32),   # multiple row tiles
        (100, 90, 16, 64, 32),  # even block size, multiple tiles
        (48, 64, 5, 256, 128),  # maxD >> W
    ],
)
def test_pallas_vs_numpy(rng, hbm, h, w, block, maxd, rt):
    left, right = _pair(rng, h, w)
    want = disparity_numpy(left, right, block, maxd)
    got = np.asarray(
        disparity_pallas(
            left,
            right,
            block_size=block,
            max_disparity=maxd,
            row_tile=rt,
            hbm_inputs=hbm,
            interpret=True,
        )
    )
    assert np.array_equal(want, got), np.argwhere(want != got)[:5]


def test_pallas_real_crop(stereo_pair_small):
    left, right = stereo_pair_small
    lc, rc = left[100:180, 100:260], right[100:180, 100:260]
    want = disparity_numpy(lc, rc, 7, 64)
    got = np.asarray(
        disparity_pallas(
            lc, rc, block_size=7, max_disparity=64, row_tile=32,
            interpret=True,
        )
    )
    assert np.array_equal(want, got)


@pytest.mark.parametrize(
    "h,w,block,maxd",
    [
        (40, 60, 7, 16),
        (20, 26, 3, 16),   # winners at d=0 for unshifted texture
        (33, 31, 31, 16),  # max block, heavy borders
        (8, 8, 7, 256),    # maxD >> W: most candidates invalid
        (48, 130, 9, 48),  # multiple tiles
    ],
)
def test_pallas_subpixel_matches_xla(rng, h, w, block, maxd):
    """TPU subpixel path (in-kernel neighbor-cost tracking) must agree
    with the XLA subpixel implementation, incl. winner-at-d=0 /
    winner-at-maxD / heavy-border edge cases."""
    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas_subpixel,
    )
    from steroscopic_hardware_tpu.ops.sad_xla import (
        disparity_raw_lr_xla,
        disparity_subpixel_xla,
    )

    for structured in (True, False):
        if structured:
            left, right = _pair(rng, h, w)
        else:
            left = rng.integers(0, 256, (h, w), dtype=np.uint8)
            right = rng.integers(0, 256, (h, w), dtype=np.uint8)
        sub_p, dR_p = disparity_pallas_subpixel(
            left, right, block_size=block, max_disparity=maxd,
            row_tile=32, interpret=True,
        )
        sub_x = disparity_subpixel_xla(left, right, block_size=block,
                                       max_disparity=maxd)
        _, dR_x = disparity_raw_lr_xla(left, right, block_size=block,
                                       max_disparity=maxd)
        assert np.allclose(np.asarray(sub_p), np.asarray(sub_x),
                           atol=1e-5)
        assert np.array_equal(np.asarray(dR_p), np.asarray(dR_x))


def test_pallas_lr_matches_xla(rng):
    from steroscopic_hardware_tpu.ops.sad_pallas import disparity_pallas_lr
    from steroscopic_hardware_tpu.ops.sad_xla import disparity_raw_lr_xla

    left, right = _pair(rng, 33, 31)
    a = disparity_raw_lr_xla(left, right, block_size=15, max_disparity=16)
    b = disparity_pallas_lr(left, right, block_size=15, max_disparity=16,
                            row_tile=32, interpret=True)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_d_unroll_bit_exact(rng):
    """d_unroll batches disparity steps per grid step; any unroll must be
    bit-identical to U=1 (same ops, same order, masked tail)."""
    left, right = _pair(rng, 37, 53)
    ref = disparity_numpy(left, right, 7, 20)
    for u in (1, 3, 8, 21, 64):
        got = disparity_pallas(
            left, right, block_size=7, max_disparity=20,
            row_tile=32, d_unroll=u, interpret=True,
        )
        assert np.array_equal(np.asarray(got), ref), u


def test_batch_matches_single(rng):
    """The native batched launch (frame x tile grid) must be bit-identical
    per frame to separate single-frame calls."""
    from steroscopic_hardware_tpu.ops.sad_pallas import (
        disparity_pallas_batch,
    )

    F, H, W = 3, 37, 53
    lefts = rng.integers(0, 256, (F, H, W), dtype=np.uint8)
    rights = np.clip(
        np.roll(lefts, -4, axis=2).astype(int)
        + rng.integers(-2, 3, (F, H, W)),
        0, 255,
    ).astype(np.uint8)
    got = np.asarray(disparity_pallas_batch(
        lefts, rights, block_size=7, max_disparity=20, row_tile=32,
        interpret=True,
    ))
    for f in range(F):
        want = disparity_numpy(lefts[f], rights[f], 7, 20)
        assert np.array_equal(got[f], want), f
