"""Driver entry points (`__graft_entry__.py`): compile-check + multichip dryrun.

The multichip dryrun is the driver's only multi-chip correctness signal
(MULTICHIP_r*.json); these tests cover both its in-process path (enough
devices already provisioned — the conftest environment) and the subprocess
re-exec path (jax initialized with too few devices — the driver environment).
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_traces_and_lowers():
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # The driver compile-checks AND executes entry() on the real chip, so
    # this CPU test only asserts the full graph traces and lowers (6 s in
    # the interpreter vs 300 s to *execute* the 20-link kernel op-by-op).
    # End-to-end execution of the same init→step→extract round-trip is
    # covered at small n by tests/test_pallas_step.py.
    with pltpu.force_tpu_interpret_mode():
        lowered = jax.jit(fn).lower(*args)
    out_q, out_p = lowered.out_info
    assert tuple(out_q.shape) == args[0].shape
    assert tuple(out_p.shape) == args[1].shape


def test_dryrun_multichip_in_process(devices8):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_reexec_path():
    """Simulate the driver environment: a process whose jax initialized with
    a single device must still pass dryrun_multichip(8) via subprocess
    re-exec."""
    env = dict(os.environ)
    # one-device parent: no virtual-device flag, cpu platform
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"
    child = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "print('REEXEC-TEST-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "REEXEC-TEST-OK" in proc.stdout
    assert "DRYRUN-CHILD-OK" in proc.stdout
