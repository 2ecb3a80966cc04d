"""Left-right consistency check (new capability named in the north star).

The reference computes left-referenced disparity only; occlusions and
mismatches survive as noise. The LR check computes the right-referenced
disparity too and invalidates pixels where the two disagree:

  dL(x, y) = disparity of left pixel x (right match at x - dL)
  dR(x, y) = disparity of right pixel x (left match at x + dR)
  valid    iff |dL(x) - dR(x - dL(x))| <= threshold

Invalid pixels are set to ``invalid_value`` (255 by convention — the
reference's disparity normalization never produces values above
255*maxD/maxD = 255 only at d = maxD, so callers who need a strict
sentinel can use the returned mask instead).

Both directions come from ONE cost-volume sweep
(``disparity_raw_lr_xla``): the right-referenced cost is the diagonal
``C(xr + d, d)`` of the left volume, so dR costs only a shifted second
argmin accumulator instead of a full second pass.

Raw (un-normalized) disparities are used for the comparison, matching
standard stereo practice; the returned map is normalized like the
reference (``d * 255 // maxD``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from steroscopic_hardware_tpu.ops.sad_xla import disparity_raw_lr_xla


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "max_disparity", "threshold", "invalid_value"),
)
def disparity_lr_checked(
    left,
    right,
    *,
    block_size: int,
    max_disparity: int,
    threshold: int = 1,
    invalid_value: int = 255,
):
    """Disparity with left-right consistency filtering.

    Returns ``(disparity_u8, valid_mask)`` where invalid pixels carry
    ``invalid_value`` in the map and ``False`` in the mask.
    """
    dL, dR = disparity_raw_lr_xla(
        left, right, block_size=block_size, max_disparity=max_disparity
    )
    return check_from_raw(
        dL, dR, left.shape[-1], max_disparity,
        threshold=threshold, invalid_value=invalid_value,
    )


def check_from_raw(dL, dR, W, max_disparity, *, threshold=1,
                   invalid_value=255):
    """LR consistency from precomputed raw maps (shared by the XLA and
    Pallas paths)."""
    xs = jax.lax.broadcasted_iota(jnp.int32, dL.shape, dL.ndim - 1)
    # Gather dR at x - dL(x) along the last axis.
    idx = jnp.clip(xs - dL, 0, W - 1)
    dR_at = jnp.take_along_axis(dR, idx, axis=-1)
    valid = jnp.abs(dL - dR_at) <= threshold

    disp = ((dL * 255) // max_disparity).astype(jnp.uint8)
    disp = jnp.where(valid, disp, jnp.uint8(invalid_value))
    return disp, valid
