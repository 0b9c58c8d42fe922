"""Worker for tests/test_distributed.py: one of two cooperating processes.

Run as ``python _distributed_worker.py <process_id> <port>``.  Each process
owns 4 virtual CPU devices; together they form an 8-device global mesh.
Initializes the real ``jax.distributed`` runtime (localhost coordinator),
builds a globally-sharded ensemble via
``jax.make_array_from_process_local_data``, runs
``evolve_ensemble_sharded`` over the GLOBAL mesh with a cross-process
``reduce_stats="max"`` collective, and asserts its local output shards
match the single-process (unsharded) reference it computes independently
from the same deterministic seed.  Exits 0 on success.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
# exactly 4 local devices per process (strip any inherited count)
flags = " ".join(f for f in flags.split()
                 if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_ENABLE_X64"] = "true"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from hamilton_tpu.parallel.distributed import (  # noqa: E402
    global_ensemble_mesh,
    init_distributed,
    is_distributed,
    local_batch_slice,
)

ok = init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert ok, "init_distributed returned False with explicit coordinator"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert is_distributed()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from hamilton_tpu.ensemble import (  # noqa: E402
    evolve_ensemble_final,
    evolve_ensemble_sharded,
)
from hamilton_tpu.models import double_pendulum  # noqa: E402
from hamilton_tpu.state import Phase  # noqa: E402

B = 64
rng = np.random.default_rng(0)  # same seed in both processes
q = 0.5 + 0.01 * rng.standard_normal((B, 2))
p = 0.01 * rng.standard_normal((B, 2))

mesh = global_ensemble_mesh(param_axis=1)
assert mesh.devices.size == 8
sh = NamedSharding(mesh, P("ensemble"))
sl = local_batch_slice(B)
assert (sl.stop - sl.start) == B // 2

# assemble the global sharded ensemble from per-process local slices
ph_global = Phase(
    jax.make_array_from_process_local_data(sh, q[sl]),
    jax.make_array_from_process_local_data(sh, p[sl]),
)

ex = double_pendulum()
final, drift = evolve_ensemble_sharded(
    ex.system, ph_global, 1e-3, 200, mesh=mesh, method="gauss4", iters=6,
    drift_every=100, reduce_stats="max",
)
# reduce_stats="max" runs lax.pmax over the ensemble axis — with the mesh
# spanning both processes this is a REAL cross-process collective
drift_max = float(drift)

# independent single-process reference from the same seed
ref_final, ref_drift = evolve_ensemble_final(
    ex.system, Phase(jnp.asarray(q), jnp.asarray(p)), 1e-3, 200,
    method="gauss4", iters=6, drift_every=100,
)
ref_q = np.asarray(ref_final.q)
ref_p = np.asarray(ref_final.p)

# every locally-addressable shard must match its reference slice
for shard in final.q.addressable_shards:
    idx = shard.index[0]
    np.testing.assert_allclose(
        np.asarray(shard.data), ref_q[idx], rtol=0, atol=1e-12
    )
for shard in final.p.addressable_shards:
    idx = shard.index[0]
    np.testing.assert_allclose(
        np.asarray(shard.data), ref_p[idx], rtol=0, atol=1e-12
    )
ref_max = float(jnp.max(ref_drift))
assert abs(drift_max - ref_max) < 1e-12, (drift_max, ref_max)

print(f"worker {pid}: OK drift_max={drift_max:.3e}")
