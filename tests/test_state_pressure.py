"""State-bigger-than-heap streaming gate (r10 verdict item 3).

The last untested claim of the A11/A12 MRBG-Store analog: RocksDB is
the declared 100 TB state backend BECAUSE its state lives off-heap —
yet every prior test ran keyed state that would also have fit in JVM
memory.  This gate runs tools/state_pressure_worker.py in a subprocess
whose JVM heap (600 MB) is smaller than the keyed state (~2 GB logical
across 120k keys x 16 KiB state rows), RocksDB provider + changelog
checkpointing, and requires:

(a) completion without OOM at that heap,
(b) final per-key state == a DuckDB batch recompute over all chunks
    (every key touched by every micro-batch — a full read-merge-write
    pass over more-than-a-heap of preserved state),
(c) the worker's in-JVM assertion that logical state > Runtime
    .maxMemory() held (else the fixture proves nothing), plus the
    graded operator (running_totals_transform) passing the same
    recompute check at the same constrained heap.

Opt-in (I2MR_STATE_PRESSURE=1): ~5-15 min of per-group Python calls —
same discipline as the sf1 recall gate.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("I2MR_STATE_PRESSURE") != "1",
    reason="state-pressure gate is opt-in: I2MR_STATE_PRESSURE=1 "
    "(minutes of per-group streaming state calls)",
)


def test_state_exceeding_heap_completes_and_matches_batch(tmp_path):
    env = dict(os.environ, I2MR_DRIVER_MEM="600m")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(_REPO, "tools", "state_pressure_worker.py"),
         str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    out = proc.stdout
    assert proc.returncode == 0, (
        f"worker failed\nstdout tail: {out[-3000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
    assert "STATE-PRESSURE PASS mode=padded" in out
    assert "STATE-PRESSURE PASS mode=real" in out
