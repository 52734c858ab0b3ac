"""Worker for test_two_process_sampling: one of N CPU processes running the
REAL single-jit sampler (lax.scan, batched CFG) over a GLOBAL dp mesh that
spans process boundaries — the generation-side twin of _train_step_worker.py
(round-4 VERDICT item 7). The tokens each process holds locally must be
bitwise identical to a single-process run of the same global computation at
the same keys (GSPMD semantics are topology-independent); the parent test
checks the per-row hashes printed here.

Usage: python _sample_worker.py <coordinator> <num_processes> <process_id>
"""
import hashlib
import sys

coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from paella_tpu.parallel import batch_sharding, initialize_distributed

info = initialize_distributed(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)
n_global = info["devices"]
assert n_global == num_processes * info["local_devices"], info

from tests._train_step_common import build_sample_case

mesh, run, cond_np = build_sample_case(n_global)
bsh = batch_sharding(mesh)

# every process holds the identical global conditioning; contribute local rows
lo = jax.process_index() * info["local_devices"]
cond = {
    k: jax.make_array_from_process_local_data(
        bsh, a[lo : lo + info["local_devices"]]
    )
    for k, a in cond_np.items()
}

with mesh:
    tokens = run(cond)
    tokens.block_until_ready()

for shard in tokens.addressable_shards:
    start = shard.index[0].start or 0
    data = np.asarray(shard.data)
    assert data.min() >= 0, data.min()
    for j in range(data.shape[0]):
        digest = hashlib.md5(data[j].tobytes()).hexdigest()
        print(f"TOKROW idx={start + j} md5={digest}", flush=True)
print(f"WORKER_OK process={process_id}", flush=True)
