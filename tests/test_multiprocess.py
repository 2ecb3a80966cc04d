"""Two-process ``jax.distributed`` bring-up (VERDICT r2 directive #7).

Spawns two real OS processes with a localhost coordinator, 4 virtual CPU
devices each; the workers (``tests/mp_worker.py``) run
``disparity_sharded`` and ``ba_solve_sharded`` over the 8-device global
mesh and assert bit-identity with single-process results. This exercises
``jax.distributed.initialize`` + ``global_mesh`` + cross-process
collectives (Gloo) — the path ``parallel/multihost.py:49-80`` that the
single-process fallback test cannot reach.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    env = os.environ.copy()
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=360)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_WORKER_OK p{i}" in out, f"worker {i} output:\n{out}"
