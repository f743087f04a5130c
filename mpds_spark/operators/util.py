"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Scratch registry: intermediates persisted INSIDE an operator (shared
# shingle frames, signature aggs, capped intra pairs) outlive the operator
# call — the final consuming action happens in the caller, so the operator
# cannot unpersist them itself. Long-lived sessions running many catalog
# queries would accrue executor storage indefinitely; callers that own the
# action loop (bench.py, tools/check_correctness.py, pipeline runners) call
# release_scratch() after each consuming action.
_SCRATCH: list = []


def scratch_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """persist() + register for release_scratch(). eager=True materializes
    now (count) — within a single action, plan branches race ahead of a
    lazily-populated cache and each recomputes the upstream DAG."""
    df = df.persist()
    if eager:
        df.count()
    _SCRATCH.append(df)
    return df


def _persistent_ids(sc) -> set[int]:
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def tracked_local_checkpoint(df: DataFrame):
    """localCheckpoint(eager=True) + the ids of the RDD blocks it pinned.
    DataFrame.unpersist() does NOT cover localCheckpoint blocks (they are
    not cacheManager entries), so iterative algorithms track the ids and
    free the previous round via release_rdds once the next round's
    checkpoint is materialized."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    ck = df.localCheckpoint(eager=True)
    return ck, (sc, _persistent_ids(sc) - before)


def release_rdds(handle) -> None:
    """Free checkpoint blocks by id (handle = tracked_local_checkpoint's
    second return). The frame they backed becomes unusable — only release
    a round once nothing references it anymore."""
    sc, ids = handle
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


def defer_release(handle) -> None:
    """Register checkpoint blocks that must survive until the CALLER's final
    action (e.g. the last CC round backing the returned frame); freed by the
    next release_scratch()."""
    _SCRATCH.append(("rdds", handle))


def release_scratch() -> None:
    """Unpersist every registered scratch frame / checkpoint block. Call
    after the final action consuming an operator's result."""
    while _SCRATCH:
        item = _SCRATCH.pop()
        try:
            if isinstance(item, tuple):
                release_rdds(item[1])
            else:
                item.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def pin_group_parallelism(df: DataFrame, *keys) -> DataFrame:
    """User-specified repartition on the group keys before a grouped-map:
    grouped-map cost is per GROUP (pandas/Arrow round-trip), but AQE
    coalesces shuffle partitions by BYTES — a many-groups/small-bytes stage
    collapses onto a few tasks and executes groups serially (measured 6x on
    the salted as-of). AQE never coalesces user repartitions, and the
    groupBy reuses the partitioning without an extra exchange."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *keys)
