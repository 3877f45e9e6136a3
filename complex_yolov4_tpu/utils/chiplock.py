"""Cross-process TPU chip lock (VERDICT r4 #1).

One real chip, reached through the axon tunnel; concurrent chip processes
don't fail — they silently collapse each other's timings (round 4's official
bench recorded 31 f/s against a real 620 because two batch scripts were
mid-arm at snapshot time). Every chip-touching process therefore takes an
exclusive flock on ``/tmp/tpu.lock`` before its first dispatch:

- Python entry points (bench.py, bench_train.py, measurement scripts) call
  :func:`acquire` right after importing jax.
- Shell batch scripts wrap each chip-touching command in
  ``flock -w <t> /tmp/tpu.lock env CHIP_LOCK_HELD=1 <cmd>``
  (scripts/chiplib.sh::chip_run). The env marker tells the child Python's
  :func:`acquire` that its ancestor already holds the lock, so it must not
  deadlock trying to re-take it on a fresh file descriptor.

The lock is advisory and /tmp-scoped — exactly the scope of the failure it
prevents (this container's own scripts). It is held until process exit (the
fd is kept open in a module global; flock releases on close/exit, so a
SIGKILL'd holder can never wedge the chip).
"""

from __future__ import annotations

import errno
import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/tpu.lock"
_HELD_FD: int | None = None


def acquire(timeout_s: float = 7200.0, lock_path: str = LOCK_PATH) -> bool:
    """Take the exclusive chip lock, blocking up to ``timeout_s``.

    Returns True when the lock is held (by this process or an ancestor),
    False when locking was skipped because the process is not using the
    real chip (CPU backend) or was explicitly disabled (CHIP_LOCK=0).
    Raises TimeoutError if the lock cannot be obtained in time — better a
    loud failure than a silently contended measurement.
    """
    global _HELD_FD
    if _HELD_FD is not None or os.environ.get("CHIP_LOCK_HELD") == "1":
        return True
    if os.environ.get("CHIP_LOCK", "1") == "0":
        return False
    # Only the real chip needs serializing. jax must already be importable;
    # default_backend() initializes the backend, which the caller is about
    # to do anyway.
    import jax

    if jax.default_backend() == "cpu":
        return False

    fd = os.open(lock_path, os.O_RDWR | os.O_CREAT, 0o666)
    deadline = time.monotonic() + timeout_s
    waited = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                raise
        if time.monotonic() >= deadline:
            os.close(fd)
            raise TimeoutError(
                f"chip lock {lock_path} not acquired in {timeout_s:.0f}s "
                f"(holder: {_read_holder(lock_path)!r}) — refusing to run "
                "a chip workload concurrently with another")
        if not waited or int(time.monotonic()) % 60 == 0:
            print(f"waiting for chip lock {lock_path} "
                  f"(holder: {_read_holder(lock_path)!r})", file=sys.stderr)
            waited = True
        time.sleep(2.0)
    os.ftruncate(fd, 0)
    os.write(fd, f"pid={os.getpid()} cmd={' '.join(sys.argv[:3])} "
                 f"t={time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n"
                 .encode())
    _HELD_FD = fd  # keep open: the flock lives exactly as long as we do
    os.environ["CHIP_LOCK_HELD"] = "1"  # children must not re-take it
    if waited:
        print("chip lock acquired", file=sys.stderr)
    return True


def release() -> None:
    """Drop a lock held by THIS process (tests; production holds to exit)."""
    global _HELD_FD
    if _HELD_FD is not None:
        fcntl.flock(_HELD_FD, fcntl.LOCK_UN)
        os.close(_HELD_FD)
        _HELD_FD = None
        os.environ.pop("CHIP_LOCK_HELD", None)


def _read_holder(lock_path: str) -> str:
    try:
        with open(lock_path) as f:
            return f.read().strip()
    except OSError:
        return "?"
