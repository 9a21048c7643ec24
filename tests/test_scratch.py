"""scratch_root placement rules (rxlan_aws_lakehouse_spark/scratch.py).

Spark-free unit tests: the resolver is pure os/tempfile logic. Each
test resets the once-per-process memo so the rules are observable.
"""

from __future__ import annotations

import os
import tempfile

from rxlan_aws_lakehouse_spark import scratch


def _reset():
    scratch._ROOT = None


def test_env_override_wins(tmp_path, monkeypatch):
    _reset()
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    assert scratch.scratch_root() == str(tmp_path)
    _reset()


def test_tmpfs_requires_free_space(monkeypatch):
    # r17 (ADVICE #3 / r16 what's-wrong #4): /dev/shm is auto-picked
    # only when it has headroom; a tight tmpfs degrades to tempdir.
    _reset()
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    monkeypatch.setattr(scratch, "_free_bytes", lambda p: 0)
    assert scratch.scratch_root() == tempfile.gettempdir()
    _reset()


def test_tmpfs_picked_when_roomy(monkeypatch):
    _reset()
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        _reset()
        return  # host has no tmpfs: nothing to assert
    monkeypatch.setattr(
        scratch, "_free_bytes", lambda p: scratch._MIN_FREE_BYTES
    )
    assert scratch.scratch_root() == "/dev/shm"
    _reset()


def test_mkscratch_under_root(tmp_path, monkeypatch):
    _reset()
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    d = scratch.mkscratch("unit_")
    try:
        assert d.startswith(str(tmp_path))
        assert os.path.isdir(d)
    finally:
        os.rmdir(d)
        _reset()
