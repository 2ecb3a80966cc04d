#!/usr/bin/env python
"""A/B the dispatch-lock policy on a colocated backend (VERDICT r4
directive #7's measurement half): run the depth pipeline and an
UNFUSED live SLAM pipeline concurrently on the CPU backend — two
independent dispatch streams, the exact contention the process-wide
lock serializes — with serialization forced ON vs OFF, and report both
streams' throughput.

  SHTPU_DISPATCH_SERIALIZE={0,1} is resolved once per process, so each
  arm runs in a fresh subprocess.

  python tools/lock_ab.py [--secs 45]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ARM = r"""
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from steroscopic_hardware_tpu.models.blockmatch import BlockMatcher
from steroscopic_hardware_tpu.models.slam import StereoCamera
from steroscopic_hardware_tpu.runtime.bus import FrameBus
from steroscopic_hardware_tpu.runtime.pipeline import (
    DepthPipeline, SlamPipeline,
)
from steroscopic_hardware_tpu.runtime.sources import SyntheticSource
from steroscopic_hardware_tpu.utils.devlock import device_lock

secs = float(os.environ["AB_SECS"])
bus = FrameBus()
cam = StereoCamera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, baseline=0.4)
m = BlockMatcher()
m.set_params(type(m.get_params())(block_size=7, max_disparity=32))
# UNFUSED on purpose: two independent dispatch streams
slam = SlamPipeline(bus, cam, slam_kwargs=dict(
    block_size=7, max_disparity=32, max_keypoints=128,
    fast_threshold=15))
depth = DepthPipeline(bus, m, colorize=False)
left = SyntheticSource(bus, "left", shape=(240, 320), fps=120.0).start()
right = SyntheticSource(bus, "right", shape=(240, 320), fps=120.0,
                        shift=8).start()
depth.start(); slam.start()
# warm both streams before the window
t0 = time.time()
while time.time() - t0 < 60 and (depth.frames < 8 or slam.frames < 8):
    time.sleep(0.1)
d0, s0 = depth.frames, slam.frames
t0 = time.time()
time.sleep(secs)
dt = time.time() - t0
print(json.dumps({
    "serialize": device_lock.serialize,
    "depth_fps": round((depth.frames - d0) / dt, 2),
    "slam_fps": round((slam.frames - s0) / dt, 2),
    "errors": depth.errors + slam.errors,
}))
for src in (left, right):
    src.close()
depth.close(); slam.close()
"""


def run_arm(serialize: str, secs: float) -> dict:
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["SHTPU_DISPATCH_SERIALIZE"] = serialize
    env["AB_SECS"] = str(secs)
    out = subprocess.run([sys.executable, "-c", _ARM], env=env,
                         capture_output=True, text=True, timeout=600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return {"error": out.stderr[-400:]}
    return json.loads(line[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=45.0)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    rows = []
    for s in ("1", "0"):
        rec = {"arm": f"serialize={s}", **run_arm(s, args.secs)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
