"""SE(3) / SO(3) utilities (matrix representation, fully jittable).

Foundation for the stereo visual odometry and bundle adjustment models
(new scope over the reference, per the BASELINE north star). Conventions:
a pose ``T = (R, t)`` maps points from world to camera: ``x_cam = R @ x + t``.
Twists are ``[rho (3), phi (3)]`` (translation first, rotation last).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def hat(v):
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def so3_exp(phi):
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi / jnp.maximum(theta[..., 0], _EPS))
    s, c = jnp.sin(theta), jnp.cos(theta)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = I + s * K + (1 - c) * (K @ K)
    # small-angle: R ~ I + hat(phi)
    return jnp.where(theta > _EPS, R, I + hat(phi))


def so3_log(R):
    """(..., 3, 3) -> (..., 3) axis-angle."""
    trace = jnp.clip(R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2], -1.0, 3.0)
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1.0, 1.0))
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    s = jnp.sin(theta)[..., None]
    factor = jnp.where(
        jnp.abs(s) > 1e-6, theta[..., None] / (2 * jnp.maximum(s, _EPS)), 0.5
    )
    return factor * w


def se3_exp(xi):
    """Twist (..., 6) [rho, phi] -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi / jnp.maximum(theta[..., 0], _EPS))
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    V = (
        I
        + ((1 - c) / jnp.maximum(theta**2, _EPS)) * K * theta
        + ((theta - s) / jnp.maximum(theta**3, _EPS)) * (K @ K) * theta**2
    )
    V = jnp.where(theta > _EPS, V, I + 0.5 * hat(phi))
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp: -> twist (..., 6)."""
    phi = so3_log(R)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi / jnp.maximum(theta[..., 0], _EPS))
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    half = 0.5 * theta
    cot = jnp.where(
        theta > _EPS,
        half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS),
        jnp.ones_like(theta),
    )
    Vinv = I - 0.5 * K * theta + (1 - cot) * (K @ K)
    Vinv = jnp.where(theta > _EPS, Vinv, I - 0.5 * hat(phi))
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def compose(Ra, ta, Rb, tb):
    """T_a * T_b."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, pts):
    """Apply pose to points (..., N, 3)."""
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def project(pts_cam, fx, fy, cx, cy):
    """Pinhole projection of camera-frame points (..., N, 3) -> (..., N, 2)."""
    z = jnp.maximum(pts_cam[..., 2:3], 1e-6)
    return jnp.concatenate(
        [
            fx * pts_cam[..., 0:1] / z + cx,
            fy * pts_cam[..., 1:2] / z + cy,
        ],
        -1,
    )
