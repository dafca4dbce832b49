"""Worker for the true multi-process staging test (run via subprocess).

Two of these form a real 2-process jax.distributed CPU runtime — no
monkeypatched process_count — driving PrefetchIterator's
`jax.make_array_from_process_local_data` path (data/pipeline.py), the
TPU-native replacement for the reference's nn.DataParallel scatter
(train_gta2cityscapes_multi.py:224-225).

Usage: python _multiproc_worker.py <process_id> <coordinator_port>
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

pid = int(sys.argv[1])
port = sys.argv[2]

# 2 virtual CPU devices per process -> a 4-device global "data" mesh.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from adaptsegnet_tpu.data.pipeline import (  # noqa: E402
    PrefetchIterator,
    epoch_batches,
    stack_collate,
)

N_ITEMS, PER_HOST_BS = 8, 2


class ToySet:
    def __len__(self):
        return N_ITEMS

    def __getitem__(self, i):
        return (np.full((2, 3), float(i), np.float32),)


mesh = Mesh(np.asarray(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))

it = PrefetchIterator(
    ToySet(), batch_size=PER_HOST_BS, collate=stack_collate({0}),
    sharding=sharding, shuffle=True, seed=5, num_workers=1, prefetch=1,
    max_batches=1, shard_by_process=True,
)
(batch,) = next(it)

# The staged leaf is a GLOBAL array: per-host batch 2 x 2 hosts = 4 rows.
assert batch.shape == (2 * PER_HOST_BS, 2, 3), batch.shape
assert batch.sharding.is_equivalent_to(sharding, 3)

# This process's addressable shards must hold exactly ITS interleaved
# slice of the global shuffle, in order.
my_idxs = next(iter(epoch_batches(
    N_ITEMS, PER_HOST_BS, shuffle=True, seed=5,
    process_index=pid, process_count=2,
)))
local = np.concatenate([
    np.asarray(s.data)
    for s in sorted(batch.addressable_shards, key=lambda s: s.index)
])
np.testing.assert_array_equal(
    local, np.stack([np.full((2, 3), float(i), np.float32)
                     for i in my_idxs]),
)

# And the global array is usable by an SPMD computation: the jitted sum
# over all 4 rows must equal the sum of BOTH processes' index slices.
other = next(iter(epoch_batches(
    N_ITEMS, PER_HOST_BS, shuffle=True, seed=5,
    process_index=1 - pid, process_count=2,
)))
total = float(jax.jit(jnp.sum)(batch))
assert total == 6.0 * (sum(my_idxs) + sum(other)), total

it.close()
print("WORKER_OK", flush=True)
