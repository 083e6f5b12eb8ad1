"""Shared fixed-point iteration kernel for iterative DataFrame
algorithms (connected components, PageRank, and any future label/
score-propagation operator).

Iterative algorithms are the one place the lazy-DataFrame model bites:
re-assigning ``state = step(state)`` in a Python loop builds a plan
whose depth grows linearly (and whose optimization cost grows
super-linearly) with the iteration count, and any downstream consumer
re-executes the entire unrolled chain. The standard cure — and the
one this kernel centralizes — is ``localCheckpoint`` per round:
materialize each round's output and truncate the lineage so round
N+1's plan references a materialized RDD, not rounds 1..N.

Two termination modes:

- **fixed** (``changed=None``): run exactly ``max_iter`` rounds —
  statically analyzable, oracle-unrollable (PageRank),
- **dynamic** (``changed=<Column>``): after each round, stop when no
  row of the new state satisfies the ``changed`` predicate. The step
  function is expected to carry whatever old-vs-new columns the
  predicate needs (e.g. ``old_label``), so convergence detection is a
  filter + ``limit(1).count()`` on the already-checkpointed frame —
  no second join and no extra shuffle per round (connected
  components).

At 100 TB each round is whatever the caller's ``step`` does (for CC:
one shuffle join + one partial-agg'd min; for PR: one join + one hash
agg); the kernel adds no shuffles of its own, keeps no driver-side
state beyond the loop counter, and bounds plan depth at O(1) per
round regardless of iteration count.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


def iterate_fixed_point(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int,
    changed: Column | None = None,
    require_convergence: bool = False,
) -> DataFrame:
    """Iterate ``state = step(state)`` with per-round lineage
    truncation.

    Parameters
    ----------
    state:
        Initial state frame. ``step`` must accept it and every one of
        its own outputs (i.e. the state schema is closed under
        ``step``, modulo extra convergence-scaffold columns that
        ``step`` itself strips/re-adds).
    step:
        One round of the algorithm: a pure function from state frame
        to next state frame.
    max_iter:
        Upper bound on rounds (exact count when ``changed`` is None).
    changed:
        Optional convergence predicate evaluated against the NEW
        state after each round; iteration stops as soon as no row
        satisfies it. The returned frame is the final (checkpointed)
        state, possibly still carrying scaffold columns — callers
        select the columns they publish.
    require_convergence:
        Dynamic mode only: when True, exhausting ``max_iter`` with the
        ``changed`` predicate still firing raises RuntimeError instead
        of silently returning a half-converged state — a
        label-propagation caller that returns early produces WRONG
        (split) components with no error, which is strictly worse
        than failing loudly.
    """
    # eager=False: the checkpoint materializes inside the FIRST job
    # that touches the round's output (the convergence count in
    # dynamic mode, the consumer's action in fixed mode) instead of
    # paying a dedicated materialization job per round — for
    # dimension-sized states (ER name graph: ~10² nodes) per-job
    # scheduling latency dominates, so halving the job count per
    # round is the measured win (er_resolved_rollup 2.4s → 1.2s).
    # Spark completes any partitions the first job skipped before
    # truncating lineage, so the truncation guarantee is unchanged.
    state = state.localCheckpoint(eager=False)
    converged = changed is None
    for _ in range(max_iter):
        new_state = step(state).localCheckpoint(eager=False)
        state = new_state
        if changed is not None:
            if new_state.filter(changed).limit(1).count() == 0:
                converged = True
                break
    if require_convergence and not converged:
        raise RuntimeError(
            f"fixed-point iteration did not converge within "
            f"{max_iter} rounds — refusing to return a partially "
            f"propagated state"
        )
    return state
