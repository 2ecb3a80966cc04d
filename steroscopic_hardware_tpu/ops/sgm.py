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

from steroscopic_hardware_tpu.ops.census import census_cost_volume

_INF = jnp.float32(1e9)


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


@functools.partial(
    jax.jit,
    static_argnames=("max_disparity", "subpixel"),
)
def sgm_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    max_disparity: int,
    P1: float = 1.0,
    P2: float = 8.0,
    subpixel: bool = True,
):
    """SGM disparity from a rectified uint8 stereo pair.

    Returns (disp float32 (H, W) — subpixel when enabled, uniqueness
    handled by the caller; raw integer argmin otherwise).
    """
    cost = census_cost_volume(
        left, right, max_disparity=max_disparity
    ).astype(jnp.float32)

    agg = (
        _aggregate_axis(cost, P1, P2, axis=2)   # left<->right paths
        + _aggregate_axis(cost, P1, P2, axis=1) # up<->down paths
    )

    d_best = jnp.argmin(agg, axis=0)
    if not subpixel:
        return d_best.astype(jnp.float32)

    D = agg.shape[0]
    d_c = jnp.clip(d_best, 1, D - 2)
    H, W = left.shape[-2:]
    take = lambda d: jnp.take_along_axis(agg, d[None], axis=0)[0]
    c0 = take(d_c - 1)
    c1 = take(d_c)
    c2 = take(d_c + 1)
    denom = jnp.maximum(c0 - 2 * c1 + c2, 1e-6)
    delta = jnp.clip(0.5 * (c0 - c2) / denom, -0.5, 0.5)
    disp = jnp.where(
        (d_best >= 1) & (d_best <= D - 2),
        d_c.astype(jnp.float32) + delta,
        d_best.astype(jnp.float32),
    )
    return disp
