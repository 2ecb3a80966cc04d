#!/usr/bin/env python
"""Headline benchmark: fused Pallas SAD disparity throughput on TPU.

Config #1 of BASELINE.json: 640x480 stereo pair (testdata/L_00001 +
R_00001), block=7, maxDisparity=64 — the reference's live compute loop
(pkg/camera/output.go:129-210) ran this on a 32-goroutine CPU pool; the
baseline target for the TPU engine is >30 fps sustained (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is fps / 30 (the north-star real-time target; the
reference publishes no numbers of its own — BASELINE.md "Reference facts").

Timing uses a chained dependency (each frame's output feeds the next
frame's input) so the measurement cannot be satisfied by dispatch
pipelining or caching; one host sync closes the chain.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steroscopic_hardware_tpu.ops.gray import load_gray  # noqa: E402

TESTDATA = "/root/reference/testdata"
BLOCK, MAXD = 7, 64
TARGET_FPS = 30.0


def main():
    left = load_gray(os.path.join(TESTDATA, "L_00001.png"))
    right = load_gray(os.path.join(TESTDATA, "R_00001.png"))

    platform = jax.devices()[0].platform
    if platform == "tpu":
        from steroscopic_hardware_tpu.ops.sad_pallas import disparity_pallas

        def step(l, r):
            return disparity_pallas(
                l, r, block_size=BLOCK, max_disparity=MAXD
            )
    else:
        from steroscopic_hardware_tpu.ops.sad_xla import disparity_xla

        def step(l, r):
            return disparity_xla(l, r, block_size=BLOCK, max_disparity=MAXD)

    # Positional re-jit: the kwarg/static-arg call path above costs ~2 ms
    # of PYTHON dispatch per frame (measured on the axon host), which
    # swamps the ~0.6 ms device time. A plain 2-positional-arg jit takes
    # the C++ fast path, so the chained loop below measures the device,
    # not the interpreter.
    f = jax.jit(step)

    L = jax.device_put(left)
    R = jax.device_put(right)

    # Warm up / compile.
    out = f(L, R)
    out.block_until_ready()

    # Correctness guard: bit-match the golden-model contract on a crop
    # (full golden is too slow here; full-frame equality is covered in
    # tests/).
    from steroscopic_hardware_tpu.ops.sad_golden import disparity_numpy

    crop = np.s_[200:264, 200:328]
    want = disparity_numpy(left[crop], right[crop], BLOCK, MAXD)
    got = np.asarray(f(jax.device_put(left[crop]),
                       jax.device_put(right[crop])))
    if not np.array_equal(want, got):
        print(json.dumps({
            "metric": "disparity_fps_640x480_b7_d64",
            "value": 0.0,
            "unit": "fps",
            "vs_baseline": 0.0,
            "error": "bit-exactness check failed",
        }))
        return

    # Chained timing: output feeds next input (uint8 HxW -> valid input).
    n = 50
    x = L
    t0 = time.time()
    for _ in range(n):
        x = f(x, R)
    np.asarray(x)  # host sync closes the dependency chain
    dt = (time.time() - t0) / n

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "disparity_fps_640x480_b7_d64",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / TARGET_FPS, 2),
        "detail": {
            "mpix_per_s": round(left.size / 1e6 / dt, 1),
            "ms_per_frame": round(dt * 1000, 3),
            "platform": platform,
            "block_size": BLOCK,
            "max_disparity": MAXD,
        },
    }))


if __name__ == "__main__":
    main()
