"""Generic iterative-computation driver (ref ops A9/A10/A13, SURVEY §2A).

The reference makes map/reduce tasks persistent across iterations, caches
static "structure" data at the task, and joins it each iteration against
the evolving "state" via a user Projector; a fixpoint check ends the loop.

The Spark equivalents, all realized here:
- persistent tasks      -> long-lived executors + `.cache()`d structure
  partitions (free);
- Projector             -> the join key: structure and state are
  `repartition(n, key)`-ed ONCE so every per-iteration join is
  co-partitioned and reuses the exchange (no re-shuffle of the big side);
- fixpoint              -> either a fixed iteration count (deterministic,
  used by the hash/golden-checked queries) or an epsilon on an
  aggregated state delta;
- incremental restart (A13) -> pass `state0` = previously converged state
  (the warm start drops iterations-to-converge; asserted in tests).

Lineage control: logical plans double per iteration; `localCheckpoint`
(eager) every `checkpoint_every` iterations truncates them.  At 100 TB use
reliable `checkpoint()` to HDFS instead — same call site, configurable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    deltas: list[float]


def iterate(
    state0: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iters: int,
    delta_fn: Callable[[DataFrame, DataFrame], float] | None = None,
    tol: float | None = None,
    checkpoint_every: int | None = None,
) -> IterationResult:
    """Run `state = step(state, i)` until max_iters or delta < tol.

    `delta_fn(old, new) -> float` triggers one Spark action per iteration
    (the reference's global fixpoint barrier, SURVEY §3.2); without it the
    loop is fully lazy between checkpoints.

    `checkpoint_every=None` (the default) picks the cadence automatically:
    1 when a delta_fn is set (actions on uncheckpointed plans re-execute
    the chain since the last checkpoint — quadratic work in the interval),
    else 2 (shallow plans keep per-stage scheduling overhead linear in
    iterations).  An explicit value is always respected; with a delta_fn
    the fixpoint check then fires only on checkpoint boundaries, against
    the PREVIOUS CHECKPOINTED state (so the delta job never recomputes a
    lazy chain) — the measured delta spans `checkpoint_every` steps, a
    conservative stop for any contracting iteration.
    """
    state = state0
    deltas: list[float] = []
    converged = False
    i = 0
    if checkpoint_every is None:
        checkpoint_every = 1 if (delta_fn is not None and tol is not None) else 2
    fresh = False  # is `state` already materialized by a checkpoint?
    check_state = state0  # last state a delta was measured against
    for i in range(1, max_iters + 1):
        new_state = step(state, i)
        fresh = i % checkpoint_every == 0
        if fresh:
            new_state = new_state.localCheckpoint(eager=True)
        state = new_state
        if delta_fn is not None and tol is not None and fresh:
            d = delta_fn(check_state, new_state)
            deltas.append(d)
            check_state = new_state
            if d < tol:
                converged = True
                break
    if not fresh:
        # final checkpoint so callers get a bounded plan (skipped when the
        # last loop step already materialized — re-checkpointing an
        # in-memory state would burn one extra job per call)
        state = state.localCheckpoint(eager=True)
    return IterationResult(state=state, iterations=i, converged=converged, deltas=deltas)
