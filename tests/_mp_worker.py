"""Worker for the 2-process multi-host test (tests/test_multiprocess.py).

Runs under `jax.distributed.initialize` on a localhost coordinator with 2
virtual CPU devices per process (4 global) — the CPU stand-in for the
reference's multi-node DDP launch (reference: src/train.py:55-68).
Usage: python _mp_worker.py <port> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    from complex_yolov4_tpu.parallel import (
        device_prefetch, initialize_distributed, local_shard_info, make_mesh)

    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    info = local_shard_info()
    assert info["shard_id"] == pid, info
    assert info["num_shards"] == 2, info
    assert info["local_device_count"] == 2, info
    assert info["global_device_count"] == 4, info

    # --- loader shard: per-host epoch indices from the real sampler ---
    from complex_yolov4_tpu.data.loader import BatchIterator

    class _StubDataset:
        img_size = 608
        mosaic = False

        def __len__(self) -> int:
            return 11  # not divisible by 2: exercises the wrap padding

    it = BatchIterator(_StubDataset(), batch_size=2, shuffle=True,
                       shard_id=info["shard_id"], num_shards=info["num_shards"])
    it.set_epoch(3)
    shard = it._epoch_indices()
    print(f"SHARD {pid}: {sorted(int(i) for i in shard)}", flush=True)

    # --- global batch assembly through device_prefetch's multi-host path ---
    mesh = make_mesh()  # all 4 global devices
    local = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
             + 1000.0 * pid)  # this host's 4-sample shard of the global 8
    batches = [{"image": local + step} for step in range(2)]
    expect0 = float(np.arange(12).sum() * 2 + 1000.0 * 12)

    import jax.numpy as jnp

    @jax.jit
    def total(x):
        return jnp.sum(x)

    for step, dev_batch in enumerate(device_prefetch(iter(batches), mesh,
                                                     keys=("image",))):
        garr = dev_batch["image"]
        assert garr.shape == (8, 3), garr.shape  # global, not local, batch
        got = float(total(garr))
        want = expect0 + step * 24.0
        assert got == want, (got, want)
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
