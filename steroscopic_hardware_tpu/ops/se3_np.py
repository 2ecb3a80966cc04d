"""Numpy twin of :mod:`ops.se3` for HOST-side pose bookkeeping.

The live SLAM engine does 6-vector se3 algebra on its frame path (pose
accumulation, sequential edges, trajectory positions, right-factor
propagation) — microseconds of math. Routing it through jax costs a
device dispatch per call (tens of ms of RTT on a remote transport) and,
worse, the FIRST host-CPU-backend initialization can deadlock against
an active accelerator stream in another thread (observed live in the
round-4 serving runs: the tracker froze at its second frame while the
depth pipeline streamed on). This module therefore re-executes the
se3 source with ``numpy`` bound in place of ``jax.numpy`` — the
formulas stay literally identical (equality asserted in
tests/test_slam.py::test_se3_np_matches_jax), and no jax machinery is
touched at call time.

Only the array-API subset both libraries share is used by se3.py
(stack/where/clip/norm/arccos/matmul/broadcast_to), which is what makes
the rebinding sound.
"""

from __future__ import annotations

import pathlib

import numpy as np

_SRC = pathlib.Path(__file__).with_name("se3.py").read_text()
_NS: dict = {"__name__": __name__ + "._twin"}
exec(compile(  # noqa: S102 — rebinding our own module source to numpy
    _SRC.replace("import jax.numpy as jnp", "import numpy as jnp"),
    str(pathlib.Path(__file__).with_name("se3.py")) + " [numpy twin]",
    "exec",
), _NS)

hat = _NS["hat"]
so3_exp = _NS["so3_exp"]
so3_log = _NS["so3_log"]
se3_exp = _NS["se3_exp"]
se3_log = _NS["se3_log"]
compose = _NS["compose"]
inverse = _NS["inverse"]
transform = _NS["transform"]
project = _NS["project"]


def accum(xi_rel: np.ndarray, xi_prev: np.ndarray) -> np.ndarray:
    """T_new = exp(xi_rel) * exp(xi_prev) as a twist, pure numpy."""
    Rr, tr = se3_exp(np.asarray(xi_rel, np.float32))
    Rp, tp = se3_exp(np.asarray(xi_prev, np.float32))
    return np.asarray(se3_log(*compose(Rr, tr, Rp, tp)), np.float32)


def relative(xi_i: np.ndarray, xi_j: np.ndarray) -> np.ndarray:
    """log(T_j * T_i^-1): measured relative motion i -> j, pure numpy."""
    Ri, ti = se3_exp(np.asarray(xi_i, np.float32))
    Rj, tj = se3_exp(np.asarray(xi_j, np.float32))
    Rii, tii = inverse(Ri, ti)
    return np.asarray(se3_log(*compose(Rj, tj, Rii, tii)), np.float32)


def positions(xis: np.ndarray) -> np.ndarray:
    """Camera centers (world frame) for a batch of world->camera twists."""
    R, t = se3_exp(np.asarray(xis, np.float32))
    _, ti = inverse(R, t)
    return np.asarray(ti)


def quaternions(xis: np.ndarray) -> np.ndarray:
    """(N, 4) [qx, qy, qz, qw] unit quaternions of the CAMERA-to-world
    rotations for a batch of world->camera twists — the orientation
    convention of the TUM trajectory format (``GET /slam/trajectory``).
    Shepperd's method (max-component selection) for numerical safety."""
    R, t = se3_exp(np.asarray(xis, np.float32))
    Rcw, _ = inverse(R, t)              # camera-to-world
    m = np.asarray(Rcw, np.float64)
    N = m.shape[0]
    q = np.empty((N, 4))
    tr = m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]
    for i in range(N):
        M = m[i]
        if tr[i] > 0:
            s = np.sqrt(tr[i] + 1.0) * 2
            q[i] = [(M[2, 1] - M[1, 2]) / s, (M[0, 2] - M[2, 0]) / s,
                    (M[1, 0] - M[0, 1]) / s, 0.25 * s]
        else:
            k = int(np.argmax([M[0, 0], M[1, 1], M[2, 2]]))
            a, b, c = k, (k + 1) % 3, (k + 2) % 3
            s = np.sqrt(M[a, a] - M[b, b] - M[c, c] + 1.0) * 2
            v = np.empty(4)
            v[a] = 0.25 * s
            v[b] = (M[b, a] + M[a, b]) / s
            v[c] = (M[c, a] + M[a, c]) / s
            v[3] = (M[c, b] - M[b, c]) / s
            q[i] = v
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(
        np.float32)
