"""Multi-process (multi-host) path: 2 real processes over a localhost
coordinator, CPU backend with 2 virtual devices each (4 global).

Covers the one parallelism surface the virtual-mesh tests cannot:
`jax.process_count() > 1` — global batch assembly via
`make_array_from_process_local_data` (parallel/mesh.py::device_prefetch)
and the per-host loader shards (data/loader.py::BatchIterator), the JAX
equivalents of the reference's DDP + DistributedSampler launch
(reference: src/train.py:55-68, src/data_process/kitti_dataloader.py:21-30).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def test_two_process_distributed():
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandboxed CI
        pytest.skip(f"cannot allocate a localhost port: {e}")

    env = dict(os.environ,
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(port), str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out (coordinator hang?)")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER {pid} OK" in out, out

    # Loader shards: equal-sized, disjoint except the DistributedSampler-style
    # wrap padding (11 samples over 2 shards -> 6+6 with exactly one repeat),
    # and exhaustive over the dataset.
    shards = []
    for pid, out in enumerate(outs):
        m = re.search(rf"SHARD {pid}: \[([0-9, ]+)\]", out)
        assert m, out
        shards.append([int(x) for x in m.group(1).split(",")])
    assert len(shards[0]) == len(shards[1]) == 6
    all_idx = shards[0] + shards[1]
    assert sorted(set(all_idx)) == list(range(11))
    assert len(all_idx) - len(set(all_idx)) == 1  # the single wrap duplicate
