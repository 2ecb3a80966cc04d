"""Distributed BA on the 8-device CPU mesh: must match single-device BA."""

import jax.numpy as jnp
import numpy as np
import pytest

from steroscopic_hardware_tpu.models.ba import BAProblem, ba_solve
from steroscopic_hardware_tpu.parallel.ba_dist import ba_solve_sharded
from steroscopic_hardware_tpu.parallel.mesh import make_mesh
from steroscopic_hardware_tpu.ops import se3

INTR = (320.0, 320.0, 320.0, 240.0)


def _problem(rng, M=4, N=64):
    pts = np.stack(
        [rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
         rng.uniform(4, 12, N)], -1
    ).astype(np.float32)
    xi_true = np.zeros((M, 6), np.float32)
    for i in range(1, M):
        xi_true[i] = xi_true[i - 1] + np.concatenate(
            [rng.uniform(-0.1, 0.1, 3), rng.uniform(-0.02, 0.02, 3)]
        ).astype(np.float32)
    uv = np.zeros((M, N, 2), np.float32)
    for i in range(M):
        R, t = se3.se3_exp(jnp.asarray(xi_true[i]))
        cam = pts @ np.asarray(R).T + np.asarray(t)
        uv[i] = np.stack(
            [INTR[0] * cam[:, 0] / cam[:, 2] + INTR[2],
             INTR[1] * cam[:, 1] / cam[:, 2] + INTR[3]], -1)
    mask = np.ones((M, N), np.float32)
    xi0 = xi_true + np.concatenate(
        [np.zeros((1, 6)), rng.normal(0, 0.04, (M - 1, 6))], 0
    ).astype(np.float32)
    pts0 = pts + rng.normal(0, 0.08, pts.shape).astype(np.float32)
    return xi0, pts0, uv, mask, xi_true


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_ba_matches_single_device(rng, n_shards):
    xi0, pts0, uv, mask, xi_true = _problem(rng)
    mesh = make_mesh(n_rows=n_shards)

    single, errs_s = ba_solve(
        BAProblem(jnp.asarray(xi0), jnp.asarray(pts0), jnp.asarray(uv),
                  jnp.asarray(mask), INTR),
        iters=10,
    )
    xi_d, pts_d, errs_d = ba_solve_sharded(
        jnp.asarray(xi0), jnp.asarray(pts0), jnp.asarray(uv),
        jnp.asarray(mask), intr=INTR, mesh=mesh, iters=10,
    )
    errs_d, errs_s = np.asarray(errs_d), np.asarray(errs_s)
    # First GN iteration is computed from identical inputs -> identical up
    # to psum reduction order; later iterations drift in float32 ulps.
    assert np.allclose(errs_d[0], errs_s[0], rtol=1e-5)
    assert errs_d[-1] < 1e-3 and errs_s[-1] < 1e-3
    # LM step acceptance branches on the psum'd cost, so a reduction-order
    # ulp can flip one accept and take a slightly different (equally
    # converged) path to the minimum — hence the looser pose tolerance
    assert np.allclose(np.asarray(xi_d), np.asarray(single.xi), atol=5e-3)
    # landmark depth is weakly constrained (near-null gauge directions):
    # both solutions sit at the cost floor, and the LM accept branch can
    # diverge paths on a psum ulp, so compare loosely (~1% of depth)
    assert np.allclose(np.asarray(pts_d), np.asarray(single.points),
                       atol=1e-1)
    # and it must actually converge to the truth
    assert np.allclose(np.asarray(xi_d), xi_true, atol=5e-3)
