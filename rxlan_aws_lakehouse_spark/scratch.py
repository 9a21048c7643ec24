"""Ephemeral scratch-directory placement for query lanes.

Every protocol lane (txn tables, streaming checkpoints/sinks, sketch
stores, export mirrors) builds its state in a throwaway work directory
created at call time and removed in a ``finally`` — the state never
outlives one invocation. Placing that scratch on a RAM-backed
filesystem when one is available removes the fsync/writeback cost of
ephemeral files (guide §6: I/O and file layout): measured on this
host, streaming checkpoint ``walCommit``/``commitOffsets`` are ~90 ms
each on ext4 (fsync-bound) and ~free on tmpfs; interleaved A/B runs
read 13-23% lane-level wins on streaming/sketch/txn lanes.

Production posture (100 TB): ephemeral intra-job state belongs on
instance-local SSD/tmpfs exactly like shuffle and spill files do;
DURABLE tables and checkpoints belong on the durable store — callers
owning long-lived state pass their own paths and never come through
here. ``SPARK_GRAFT_SCRATCH_DIR`` overrides the choice (point it at a
fast local disk when RAM is tight or at a PVC in a container); the
fallback is the ordinary tempdir, so behavior without tmpfs is exactly
the old behavior.

The root is resolved once per process: scratch placement must not
flip between a lane's own mkdir and rmtree.
"""

from __future__ import annotations

import os
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    """Resolve (once) the directory under which lane scratch lives."""
    global _ROOT
    if _ROOT is None:
        env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
        if env:
            _ROOT = env
        elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            _ROOT = "/dev/shm"
        else:
            _ROOT = tempfile.gettempdir()
    return _ROOT


def mkscratch(prefix: str) -> str:
    """``tempfile.mkdtemp`` under :func:`scratch_root`."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
