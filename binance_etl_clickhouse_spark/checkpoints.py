"""Explicit release for localCheckpoint storage blocks.

``Dataset.unpersist()`` only clears CacheManager entries, and the
ContextCleaner never reclaims a locally-checkpointed RDD either (verified
empirically: blocks survive del + GC + System.gc for minutes) — the
checkpointed RDD is strongly referenced by its own truncated-lineage
bookkeeping. Long-lived processes that checkpoint per iteration (BPE
training) or per micro-batch (the streaming dedup sinks) therefore leak
executor storage without an explicit release.

:func:`release` reaches the internal RDD through the LogicalRDD plan node
and unpersists it directly. After release the frame CANNOT be recomputed
(its lineage was truncated — Spark logs exactly that warning), so call it
only when every consumer of the frame has finished.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release(df: DataFrame | None) -> None:
    """Free a localCheckpoint'd DataFrame's storage blocks. Safe no-op on
    None or on frames that are not checkpoint-backed."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — release is best-effort cleanup
        pass
