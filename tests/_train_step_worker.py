"""Worker for test_two_process_train_step: one of N CPU processes running the
REAL pjit train step (denoiser fwd/bwd + frozen codec encode + AdamW) over a
GLOBAL dp x fsdp mesh that spans process boundaries — the strongest multi-host
proof available without multi-chip hardware: the GSPMD gradient collectives
run through the gloo cross-process backend, exactly as they would over ICI on
a pod (reference equivalent: DDP allreduce, src_distributed/train.py:186-189).

GSPMD semantics are topology-independent, so the loss printed here must match
a single-process run on the same global batch (the parent test checks it).

Usage: python _train_step_worker.py <coordinator> <num_processes> <process_id>
"""
import sys

coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from paella_tpu.parallel import initialize_distributed

info = initialize_distributed(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)
n_global = info["devices"]
assert n_global == num_processes * info["local_devices"], info

from tests._train_step_common import build_case
from paella_tpu.parallel import batch_sharding

mesh, run, batch_np = build_case(n_global)
bsh = batch_sharding(mesh)

# every process holds the identical global batch; contribute the local rows
lo = jax.process_index() * info["local_devices"]
batch = jax.tree_util.tree_map(
    lambda a: jax.make_array_from_process_local_data(
        bsh, a[lo : lo + info["local_devices"]]
    ),
    batch_np,
)

with mesh:
    loss, step = run(batch)
assert np.isfinite(loss), loss
assert step == 1, step
print(f"WORKER_LOSS process={process_id} loss={loss:.6f}", flush=True)
