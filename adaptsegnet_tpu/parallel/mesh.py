"""Data-parallel mesh utilities.

The reference's entire distribution story is single-process nn.DataParallel
(SURVEY.md §2.3 C20). TPU-native replacement: a 1-D `jax.sharding.Mesh` over
all chips with the global batch sharded on the 'data' axis and parameters
replicated. The train steps (train/steps.py) are ordinary jitted functions;
under GSPMD the batch sharding propagates through the forward/backward and
XLA inserts the gradient all-reduce (psum) over ICI. Multi-host runs use the
same mesh over `jax.devices()` with per-host data loading sharded by
`jax.process_index()` (data/pipeline.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over `num_devices` (0 = all local devices).

    Raises if fewer than `num_devices` devices exist — a silently smaller
    mesh would make every downstream sharding test vacuous.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh: requested {num_devices} devices but only "
                f"{len(devices)} available on platform "
                f"{devices[0].platform if devices else '?'}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def auto_mesh_size(batch_size: int, num_devices: int = 0) -> int:
    """Largest device count <= available that divides the global batch.

    The reference default is batch 1 (train_gta2cityscapes_multi.py:33) —
    data parallelism only engages once the batch is scaled up; a batch that
    doesn't divide the device count falls back to the largest divisor.
    """
    available = num_devices or len(jax.devices())
    d = min(available, batch_size)
    while batch_size % d:
        d -= 1
    d = max(d, 1)
    if d < available:
        import logging

        logging.getLogger(__name__).warning(
            "auto_mesh_size: batch %d uses only %d of %d devices "
            "(batch must be divisible by the mesh size; %d idle)",
            batch_size, d, available, available - d,
        )
    return d


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding splitting `batch_axis` of an ndim array over 'data'."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree: Any, batch_axis: int = 0) -> Any:
    """Place a host pytree with its batch axis sharded over the mesh.

    With an (iter_size, B, ...) layout the sharded axis is 1 (the true batch
    axis); scalars/strings pass through.
    """

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim > batch_axis:
            return jax.device_put(
                leaf, batch_sharding(mesh, leaf.ndim, batch_axis)
            )
        return leaf

    return jax.tree.map(put, tree)
