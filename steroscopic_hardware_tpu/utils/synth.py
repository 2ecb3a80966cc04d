"""Synthetic stereo scene generator.

The golden-vector strategy of the reference (``hardware/test.py``: known
inputs with computable expected outputs) extended to full SLAM: persistent
textured landmarks projected through known trajectories give rendered
stereo sequences with exact ground truth — usable by both tests and the
quality benchmark tools in this zero-egress (no-dataset) environment.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from steroscopic_hardware_tpu.ops import se3


class SyntheticScene:
    def __init__(self, camera, size=(240, 320), n_landmarks=60,
                 depth=(5.0, 11.0), spread=(3.5, 2.5), seed=0):
        self.cam = camera
        self.H, self.W = size
        rng = np.random.default_rng(seed)
        self.points = np.stack(
            [
                rng.uniform(-spread[0], spread[0], n_landmarks),
                rng.uniform(-spread[1], spread[1], n_landmarks),
                rng.uniform(*depth, n_landmarks),
            ],
            -1,
        ).astype(np.float32)
        self.patches = rng.integers(
            40, 250, (n_landmarks, 9, 9)
        ).astype(np.uint8)

    def render(self, xi, right=False, background=90):
        """Render the landmark field from pose xi (world->camera twist)."""
        R, t = se3.se3_exp(jnp.asarray(xi))
        cam = self.points @ np.asarray(R).T + np.asarray(t)
        if right:
            cam = cam - np.array([self.cam.baseline, 0, 0], np.float32)
        img = np.full((self.H, self.W), background, np.uint8)
        for j in np.argsort(-cam[:, 2]):  # far to near
            X, Y, Z = cam[j]
            if Z <= 0.5:
                continue
            u = int(round(self.cam.fx * X / Z + self.cam.cx))
            v = int(round(self.cam.fy * Y / Z + self.cam.cy))
            if 5 <= u < self.W - 5 and 5 <= v < self.H - 5:
                img[v - 4 : v + 5, u - 4 : u + 5] = self.patches[j]
        return img

    def render_pair(self, xi):
        return self.render(xi), self.render(xi, right=True)


def straight_trajectory(n_frames, step=(0.06, 0.0, -0.12), yaw=0.008):
    """Forward-drifting trajectory of world->camera twists."""
    xis = [np.zeros(6, np.float32)]
    for _ in range(1, n_frames):
        xi = xis[-1].copy()
        xi[:3] += np.array(step, np.float32)
        xi[4] += yaw
        xis.append(xi)
    return xis


def gt_positions(xis):
    out = []
    for xi in xis:
        R, t = se3.se3_exp(jnp.asarray(xi))
        _, ti = se3.inverse(R, t)
        out.append(np.asarray(ti))
    return np.stack(out)
