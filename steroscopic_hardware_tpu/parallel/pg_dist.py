"""Distributed pose-graph optimization: edges sharded over the mesh.

The pod-scale dimension of a pose graph is its EDGE set (every keyframe
adds a sequential edge, every loop closure another), while the node
state stays small (M x 6 twists). So the collective pattern mirrors the
distributed Schur BA (``parallel/ba_dist.py``): each device holds an
edge shard, computes its edges' residuals/Jacobians and their
scatter-added contributions to the gradient, the block-Jacobi
preconditioner and every CG H·v product, and one ``psum`` per quantity
yields the replicated global value; the CG iteration itself runs
redundantly on every device (cheap, deterministic — all devices see
identical psum results, so the while_loop stays in lockstep).

This is SURVEY §7 phase 5's "pose-graph optimization across the pod":
communication per GN step is O(M·6) floats x (2 + cg_iters) psums,
independent of the edge count — edges never move.

Padded edges carry weight 0 (inert by construction in
``pose_graph_optimize``), so E only needs to be divisible by the mesh
axis after padding, and the same power-of-two bucketing that stops
per-closure recompiles single-device works here unchanged.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from steroscopic_hardware_tpu.models.slam import pose_graph_optimize


@functools.partial(
    jax.jit,
    static_argnames=("iters", "fix_first", "cg_iters", "mesh",
                     "axis_name"),
)
def pose_graph_optimize_sharded(
    xi_nodes, edges_ij, xi_meas, weights, *,
    mesh: Mesh,
    iters: int = 15,
    damping: float = 1e-4,
    fix_first: bool = True,
    cg_iters: int = 100,
    axis_name: str = "rows",
):
    """Edge-sharded pose-graph Gauss-Newton over a device mesh.

    Args as :func:`models.slam.pose_graph_optimize` (nodes replicated;
    edges/measurements/weights sharded along E, which must divide by the
    mesh axis size — pad with weight-0 edges pointing at node 0).
    Returns (xi (M, 6) replicated, costs (iters,)).
    """
    E = edges_ij.shape[0]
    n = mesh.shape[axis_name]
    if E % n != 0:
        raise ValueError(f"E={E} not divisible by mesh axis {n}")

    e_spec = P(axis_name)
    rep = P()

    def local(xi, eij, meas, w):
        return pose_graph_optimize(
            xi, eij, meas, w, iters=iters, damping=damping,
            fix_first=fix_first, cg_iters=cg_iters,
            axis_name=axis_name,
        )

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, e_spec, e_spec, e_spec),
        out_specs=(rep, rep),
    )
    xi_nodes = jax.device_put(xi_nodes, NamedSharding(mesh, rep))
    edges_ij = jax.device_put(edges_ij, NamedSharding(mesh, e_spec))
    xi_meas = jax.device_put(xi_meas, NamedSharding(mesh, e_spec))
    weights = jax.device_put(weights, NamedSharding(mesh, e_spec))
    return fn(xi_nodes, edges_ij, xi_meas, weights)


def pad_edges(edges_ij, xi_meas, weights, n: int):
    """Pad an edge set with inert (weight-0, node-0) edges so E divides
    by the mesh axis size ``n``. Host-side helper (numpy in/out)."""
    E = len(edges_ij)
    Ep = -(-E // n) * n
    if Ep == E:
        return edges_ij, xi_meas, weights
    pad = Ep - E
    edges_ij = np.concatenate(
        [edges_ij, np.zeros((pad, 2), edges_ij.dtype)])
    xi_meas = np.concatenate([xi_meas, np.zeros((pad, 6), xi_meas.dtype)])
    weights = np.concatenate([weights, np.zeros(pad, weights.dtype)])
    return edges_ij, xi_meas, weights
