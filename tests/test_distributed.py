"""Real two-process ``jax.distributed`` execution (VERDICT r3 item 7).

tests/test_ensemble.py::TestDistributedHooks covers the single-process
degradation paths; this file actually runs the multi-process path: two
subprocesses, 4 virtual CPU devices each, a localhost coordinator, one
8-device GLOBAL mesh, ``evolve_ensemble_sharded`` with a cross-process
``pmax`` collective, and shard-exact parity against a single-process run
(see tests/_distributed_worker.py for the worker's assertions).

Subprocesses are mandatory — ``jax.distributed`` fixes the global device
set at backend init, which the test-session process has already done.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_mesh():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items()}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        assert f"worker {pid}: OK" in out
