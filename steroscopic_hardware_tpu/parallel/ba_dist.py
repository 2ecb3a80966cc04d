"""Distributed bundle adjustment: landmarks sharded over the device mesh.

The Schur-complement structure makes BA naturally data-parallel over
landmarks: every term of the reduced camera system is a sum over
landmarks,

    S = Hpp - sum_j Hpl_j Hll_j^-1 Hpl_j^T      b = bp - sum_j (...)

so each device holds a landmark shard (map block), computes its partial
S/b, and one ``psum`` over the ``landmarks`` mesh axis yields the global
reduced system; every device solves the identical small (6M x 6M) pose
system redundantly (cheap) and back-substitutes its own landmarks locally
— zero communication beyond the two all-reduces per iteration. This is the
collective pattern called for in SURVEY.md section 2.3 ("distributed BA
Schur reduction via reduce-scatter/all-reduce").

``ba_solve`` already accepts ``axis_name``; this module provides the
``shard_map`` wrapper and the observation-partitioning helper.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from steroscopic_hardware_tpu.models.ba import BAProblem, ba_solve


@functools.partial(
    jax.jit,
    static_argnames=("intr", "iters", "mesh", "axis_name"),
)
def ba_solve_sharded(
    xi, points, uv, mask, *,
    intr: tuple,
    mesh: Mesh,
    iters: int = 10,
    axis_name: str = "rows",
):
    """Distributed windowed BA.

    Args match :class:`BAProblem` fields (xi (M,6) replicated; points
    (N,3), uv (M,N,2), mask (M,N) sharded over N). N must divide by the
    mesh axis size. Returns (xi (M,6), points (N,3), errs (iters,)).
    """
    N = points.shape[0]
    n = mesh.shape[axis_name]
    if N % n != 0:
        raise ValueError(f"N={N} not divisible by mesh axis {n}")

    lm_spec = P(axis_name)            # shard landmark axis
    uv_spec = P(None, axis_name, None)
    mask_spec = P(None, axis_name)
    rep = P()

    def local(xi_l, pts_l, uv_l, mask_l):
        prob = BAProblem(xi_l, pts_l, uv_l, mask_l, intr)
        solved, errs = ba_solve(prob, iters=iters, axis_name=axis_name)
        return solved.xi, solved.points, errs

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, lm_spec, uv_spec, mask_spec),
        out_specs=(rep, lm_spec, rep),
    )
    xi = jax.device_put(xi, NamedSharding(mesh, rep))
    points = jax.device_put(points, NamedSharding(mesh, lm_spec))
    uv = jax.device_put(uv, NamedSharding(mesh, uv_spec))
    mask = jax.device_put(mask, NamedSharding(mesh, mask_spec))
    return fn(xi, points, uv, mask)
