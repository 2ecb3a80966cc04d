#!/usr/bin/env python
"""SLAM quality benchmark on synthetic ground-truth sequences.

Measures trajectory ATE RMSE for pure VO vs. keyframed BA vs. BA + loop
closure on rendered sequences with exact ground truth — the quality
counterpart of bench.py (BASELINE configs #4/#5 stand-in while no KITTI
dataset is mounted).

  python tools/run_synth_slam.py --frames 10 --landmarks 80
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize force-registers the TPU platform; honor an
    # explicit JAX_PLATFORMS=cpu request (CLAUDE.md environment note)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--landmarks", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trajectory", default="straight",
                    choices=["straight", "loop"])
    ap.add_argument("--noise", type=float, default=0.0,
                    help="Gaussian pixel-noise sigma (sensor model)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from steroscopic_hardware_tpu.models.slam import (
        StereoCamera, StereoSLAM, StereoVO, ate_rmse,
    )
    from steroscopic_hardware_tpu.utils.synth import (
        SyntheticScene, gt_positions, loop_trajectory,
        straight_trajectory,
    )

    cam = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, baseline=0.4)
    scene = SyntheticScene(cam, n_landmarks=args.landmarks, seed=args.seed)
    traj_fn = (loop_trajectory if args.trajectory == "loop"
               else straight_trajectory)
    xis = traj_fn(args.frames)
    nrng = np.random.default_rng(args.seed + 7)
    frames = [scene.render_pair(xi, noise=args.noise, noise_rng=nrng)
              for xi in xis]
    gt = gt_positions(xis)

    kwargs = dict(block_size=7, max_disparity=32, max_keypoints=128,
                  fast_threshold=15)
    engines = {
        "vo": StereoVO(cam, **kwargs),
        "vo+ba": StereoSLAM(cam, window=3, kf_every=2, ba_iters=5,
                            **kwargs),
        "vo+ba+loop": StereoSLAM(cam, window=3, kf_every=2, ba_iters=5,
                                 loop_closure=True, loop_min_matches=15,
                                 loop_gap=10, **kwargs),
    }
    for name, eng in engines.items():
        t0 = time.time()
        for left, right in frames:
            eng.process(left, right)
        dt = time.time() - t0
        vo = eng.vo if hasattr(eng, "vo") else eng
        ate = ate_rmse(vo.positions(), gt)
        rec = {
            "engine": name,
            "ate_rmse_m": round(ate, 4),
            "fps": round(args.frames / dt, 2),
            "min_inliers": int(min(vo.n_inliers[1:])),
            "loops_closed": getattr(eng, "loops_closed", 0),
        }
        print(json.dumps(rec) if args.json else
              f"{name:12s} ATE {rec['ate_rmse_m']:.4f} m  "
              f"{rec['fps']:5.1f} fps  min_inliers {rec['min_inliers']}"
              f"  loops {rec['loops_closed']}")


if __name__ == "__main__":
    main()
