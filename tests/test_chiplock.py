"""Chip-lock mechanics (utils/chiplock.py — VERDICT r4 #1).

The real lock only engages on the TPU backend; these tests exercise the
flock mechanics by faking the backend so the CI (CPU) path stays covered:
skip-on-cpu, acquire/release, ancestor-held passthrough, and the timeout
that turns a silently contended measurement into a loud failure.
"""

import fcntl
import os
import subprocess
import sys
import time

import pytest

from complex_yolov4_tpu.utils import chiplock


@pytest.fixture
def clean_env(monkeypatch, tmp_path):
    monkeypatch.delenv("CHIP_LOCK_HELD", raising=False)
    monkeypatch.delenv("CHIP_LOCK", raising=False)
    yield str(tmp_path / "tpu.lock")
    chiplock.release()


def test_cpu_backend_skips(clean_env):
    # conftest forces the CPU platform, so the real backend check fires.
    assert chiplock.acquire(lock_path=clean_env) is False
    assert "CHIP_LOCK_HELD" not in os.environ


def test_ancestor_held_passthrough(clean_env, monkeypatch):
    monkeypatch.setenv("CHIP_LOCK_HELD", "1")
    assert chiplock.acquire(lock_path=clean_env) is True


def test_disable_env(clean_env, monkeypatch):
    monkeypatch.setenv("CHIP_LOCK", "0")
    assert chiplock.acquire(lock_path=clean_env) is False


def _fake_tpu(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_acquire_release_cycle(clean_env, monkeypatch):
    _fake_tpu(monkeypatch)
    assert chiplock.acquire(timeout_s=5, lock_path=clean_env) is True
    assert os.environ.get("CHIP_LOCK_HELD") == "1"
    holder = open(clean_env).read()
    assert f"pid={os.getpid()}" in holder
    # idempotent while held
    assert chiplock.acquire(timeout_s=5, lock_path=clean_env) is True
    chiplock.release()
    assert "CHIP_LOCK_HELD" not in os.environ


def test_contended_lock_times_out_loudly(clean_env, monkeypatch):
    _fake_tpu(monkeypatch)
    # A child process takes the flock and sleeps; acquire() must refuse to
    # run concurrently — TimeoutError, not a silent corrupted measurement.
    child = subprocess.Popen(
        [sys.executable, "-c", f"""
import fcntl, os, sys, time
fd = os.open({clean_env!r}, os.O_RDWR | os.O_CREAT)
fcntl.flock(fd, fcntl.LOCK_EX)
print("held", flush=True)
time.sleep(30)
"""],
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "held"
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            chiplock.acquire(timeout_s=3, lock_path=clean_env)
        assert time.monotonic() - t0 < 20
    finally:
        child.kill()
        child.wait()
    # holder gone -> acquire succeeds
    assert chiplock.acquire(timeout_s=5, lock_path=clean_env) is True
