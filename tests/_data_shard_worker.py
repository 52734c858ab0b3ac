"""Worker for test_distributed's multi-host data-sharding test: after the
distributed rendezvous, iterate a WebDatasetLoader with DEFAULT shard
offset/stride (they must resolve to jax.process_index()/process_count()) and
print every caption seen — the parent asserts the two hosts' streams are
disjoint and jointly complete (reference equivalent: one webdataset per DDP
rank, src_distributed/utils.py:55-62).

Usage: python _data_shard_worker.py <coordinator> <num_processes> <process_id> <shard_dir>
"""
import glob
import sys

coordinator, num_processes, process_id, shard_dir = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from paella_tpu.parallel import initialize_distributed

initialize_distributed(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)
assert jax.process_index() == process_id
assert jax.process_count() == num_processes

from paella_tpu.data import WebDatasetLoader

shards = sorted(glob.glob(f"{shard_dir}/*.tar"))
loader = WebDatasetLoader(
    shards,
    batch_size=2,
    image_size=32,
    shuffle_buffer=1,
    filter=None,
    resample=False,
    # shard_offset / shard_stride intentionally NOT set: the defaults under
    # test are jax.process_index() / jax.process_count()
)
caps = []
for _, captions in loader:
    caps.extend(captions)
print(f"CAPS={';'.join(sorted(caps))}", flush=True)
print(f"WORKER_OK process={process_id} n={len(caps)}", flush=True)
