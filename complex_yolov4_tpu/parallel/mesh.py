"""Device mesh + SPMD sharding utilities.

Replaces the reference's whole DDP stack — mp.spawn, process groups, NCCL
rendezvous, DistributedSampler, DDP gradient hooks
(reference: src/train.py:29-71, src/models/model_utils.py:41-66,
src/utils/train_utils.py:107-119) — with the platform-native SPMD model:

- one 1-D `data` mesh over all local (or all global) devices;
- batches sharded along `data`, parameters/optimizer state replicated;
- the train step jitted with those shardings — XLA inserts the gradient
  all-reduce over ICI/DCN itself, no backend/rendezvous surface at all.

The same program runs on 1 chip, one host's chips, or a multi-host slice
(after `jax.distributed.initialize`); per-host input sharding comes from the
loader's `shard_id`/`num_shards` (data/loader.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op single-host). The JAX coordinator
    replaces the reference's tcp:// rendezvous (train.py:67-68)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def make_mesh_for_batch(global_batch: int,
                        devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Data mesh over the largest device prefix whose size divides the global
    batch (a 2-sample debug batch still runs on an 8-chip host)."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    while n > 1 and global_batch % n != 0:
        n -= 1
    return make_mesh(devs[:n])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch onto the mesh, batch axis sharded over `data`.

    The global batch size must divide the mesh size; the loader guarantees
    static shapes so this never re-shards.
    """
    sharding = data_sharding(mesh)
    return {
        k: jax.device_put(v, sharding)
        for k, v in batch.items()
        if hasattr(v, "shape") and v.ndim >= 1
    }


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def device_prefetch(iterator, mesh: Mesh, keys=("image", "targets", "target_mask"),
                    depth: int = 2, host_keys=()):
    """Wrap a host batch iterator: device_put each batch (batch axis sharded
    over `data`) `depth` steps ahead so H2D transfer overlaps the device
    step — the SPMD answer to DataLoader pin_memory/non_blocking
    (reference: train.py:203-204). Keys absent from a batch are skipped;
    `host_keys` pass through unconverted (e.g. the multiscale `size`)."""
    import collections

    sharding = data_sharding(mesh)
    multi_host = jax.process_count() > 1

    def put(arr):
        if multi_host:
            # Each host's loader yields its own shard (loader shard_id /
            # num_shards); the global batch is their concatenation. A plain
            # device_put with a global sharding would silently KEEP ONLY the
            # global slice of each host's local batch.
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    buf = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(buf) < depth:
                host = next(it)
                dev = {k: put(host[k]) for k in keys if k in host}
                dev.update({k: host[k] for k in host_keys if k in host})
                buf.append(dev)
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


def local_shard_info() -> Dict[str, int]:
    """This host's position for input-pipeline sharding."""
    return {
        "shard_id": jax.process_index(),
        "num_shards": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
