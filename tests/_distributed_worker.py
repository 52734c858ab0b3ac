"""Worker for test_distributed_multiprocess: one of N CPU processes doing a
real cross-process collective through initialize_distributed (the rendezvous
path the reference drove with MASTER_ADDR + rank arithmetic,
src_distributed/utils.py:85-94).

Usage: python _distributed_worker.py <coordinator> <num_processes> <process_id>
"""
import sys

coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from paella_tpu.parallel import initialize_distributed

info = initialize_distributed(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)
assert info["process_count"] == num_processes, info
assert info["devices"] == num_processes * info["local_devices"], info

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(jax.devices(), ("dp",))

# every process contributes (process_index + 1); the global mean must be the
# same on all hosts — the moral equivalent of DDP's gradient allreduce
local = jnp.full((jax.local_device_count(), 4), float(process_id + 1))
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), local)


@jax.jit
def global_mean(x):
    return jnp.mean(x)


result = float(global_mean(arr))
expected = sum(range(1, num_processes + 1)) / num_processes
assert abs(result - expected) < 1e-6, (result, expected)
print(f"WORKER_OK process={process_id} mean={result}", flush=True)
