"""Streaming checkpoint recovery across a PROCESS RESTART (r9 verdict
item 2) — the durability half of the A11 MRBG-Store analog that
in-session stream-batch equivalence cannot witness.

tools/ckpt_recovery_worker.py phase1 runs a stateful streaming query
(applyInPandasWithState per-user running totals) over the first 2 of 4
delta chunks, then SIGKILLs its own JVM and hard-exits (42) — a crash,
not a shutdown.  phase2 is a FRESH process resuming from the same
checkpoint directory: it must continue the micro-batch numbering (the
offset log survived) and, after the remaining chunks, hold per-user
state equal to the from-scratch batch recompute (the keyed state
survived).  Parametrized over both state-store providers: the default
HDFS-backed map and RocksDB (the 100 TB path — off-heap state,
changelog checkpointing).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tools", "ckpt_recovery_worker.py")


def _run(phase: str, workdir: str, provider: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, _WORKER, phase, workdir, provider],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_stateful_query_survives_jvm_kill(provider):
    with tempfile.TemporaryDirectory(prefix=f"i2mr-ckptrec-{provider}-") as wd:
        p1 = _run("phase1", wd, provider)
        assert p1.returncode == 42, (
            f"phase1 must crash-exit 42, got {p1.returncode}\n"
            f"stdout:\n{p1.stdout[-2000:]}\nstderr:\n{p1.stderr[-2000:]}"
        )
        # the crash must have left a live checkpoint + committed batches
        assert os.path.isdir(os.path.join(wd, "ckpt", "offsets"))
        p2 = _run("phase2", wd, provider)
        assert p2.returncode == 0, (
            f"phase2 (resume) failed rc={p2.returncode}\n"
            f"stdout:\n{p2.stdout[-2000:]}\nstderr:\n{p2.stderr[-2000:]}"
        )
        assert f"CKPT-RECOVERY PASS provider={provider}" in p2.stdout
