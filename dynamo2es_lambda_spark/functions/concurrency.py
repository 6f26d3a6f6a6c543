"""Concurrent independent Spark actions (optimization guide §2.6).

Spark's scheduler runs several jobs at once inside one application; actions
are only sequential because driver code calls them sequentially. When two
actions are INDEPENDENT — disjoint output directories, neither reads what
the other writes — submitting them from driver threads lets the second
job's tasks back-fill executors freed by the first job's straggler tail
instead of leaving the cluster idle. Default FIFO scheduling gives exactly
that back-fill behavior.

Only use this for provably independent work: same inputs or disjoint
inputs, disjoint outputs, no ordering contract (validation errors must
still be raised before any write starts — sequence those BEFORE the
overlap). Each thunk's writes must be idempotent under retry (overwrite
mode), because a failure in one thunk surfaces after the others finish.
"""

from __future__ import annotations

from typing import Any, Callable


def run_concurrent(*thunks: Callable[[], Any]) -> list[Any]:
    """Run the thunks as concurrent Spark actions; return their results in
    argument order. A single thunk runs inline (no thread overhead). If any
    thunk raises, the others still run to completion (their writes stay
    consistent for the caller's whole-batch retry) and the first failure —
    in argument order — is re-raised."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
