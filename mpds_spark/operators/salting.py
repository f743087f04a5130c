"""Skew handling for hot entities.

Two mechanisms, matching how each operator class scales:

1. The default as-of strategy ("window") and every pure window operator are
   sort-based and streaming: a hot entity is one WindowExec partition that
   SPILLS rather than OOMs, so they need no salting — AQE skew-join
   splitting covers the join legs. (Verified by the hot-entity smoke test.)

2. Grouped-map Arrow ops (cogroup as-of, interpolate strategy='pandas')
   materialize one pandas group per entity — a 10^8-row entity breaks
   that (the DEFAULT interpolate/as-of strategies are window-based and
   skew-safe without salting). salted_asof_join
   splits each entity's LEFT rows into time-range chunks of bounded size and
   replays the single latest RIGHT row before each chunk boundary into the
   chunk ("boundary-overlap replay"), so every chunk is self-contained for a
   backward as-of scan. Result is provably identical to the unsalted join
   (differential-tested), with per-group memory O(chunk) instead of
   O(entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds
from mpds_spark.operators.asof import asof_join


def salted_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "entity_id",
    chunk_span: float = 86400.0,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strategy: str = "cogroup",
) -> DataFrame:
    """Backward as-of join with (entity, time-chunk) salting.

    chunk = floor(on / chunk_span): left rows join only within their chunk;
    the right side contributes its own-chunk rows PLUS a carry row — the
    latest right row of any earlier chunk — so matches across chunk
    boundaries are preserved exactly.

    Sizing: each (entity, chunk) becomes ONE pandas group, and grouped-map
    overhead is per GROUP, not per row — pick chunk_span so groups hold
    ~10^5-10^6 left rows (the point of salting is splitting a 10^8-row
    entity into bounded groups, not splitting small entities into dust:
    measured 210 s for 600k rows in 24k groups vs seconds at sane spans).

    Tie caveat: "identical to the unsalted join" holds when the right side
    is UNIQUE on (by, on). With duplicate right timestamps the carry picks
    the max-by-struct row among the tied latest, while an unsalted as-of's
    winner among ties is engine/scan-order-dependent in ANY engine — a
    tied as-of match is not well-posed. Pre-aggregate duplicates (e.g.
    one row per (entity, ts)) when exact cross-engine parity matters; the
    asof_salted catalog query does exactly that and is driver-gate EXACT.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]

    lt = epoch_seconds(left, on)
    rt = epoch_seconds(right, on)
    chunk_l = F.floor(lt / F.lit(float(chunk_span)))
    chunk_r = F.floor(rt / F.lit(float(chunk_span)))

    l_tag = left.withColumn("__chunk", chunk_l)
    r_tag = right.withColumn("__chunk", chunk_r)

    # carry: for each (entity, chunk) that the right side has, its latest
    # row; then for every LATER chunk present on the left, replay the most
    # recent carry. Implemented as: latest right row per (entity, chunk)
    # -> running "latest so far" over the chunk sequence -> shift into the
    # next left chunk(s) via an as-of join on chunk index (small frames:
    # one row per entity-chunk, not per event).
    latest = r_tag.groupBy(by, "__chunk").agg(
        F.max(F.struct(F.col(on).alias("__o"), *right_cols)).alias("__row")
    )
    left_chunks = l_tag.select(by, "__chunk").distinct()
    carry = asof_join(
        left_chunks,
        latest.select(by, "__chunk", "__row"),
        on="__chunk",
        by=by,
        allow_exact_matches=False,  # carry = strictly earlier chunks
        suffix="_c",
    ).filter(F.col("__row").isNotNull())
    carry_rows = carry.select(
        F.col(by),
        F.col("__chunk"),
        F.col("__row.__o").alias(on),
        *[F.col(f"__row.{c}").alias(c) for c in right_cols],
    )
    r_all = r_tag.select(by, "__chunk", on, *right_cols).unionByName(carry_rows)

    # join within the salted key: (entity, chunk) stays a TWO-COLUMN
    # composite key (asof_join supports by=[...]), so there is no string
    # encoding that could collide (e.g. entity 'u1' chunk 2251 vs entity
    # 'u12' chunk 251 under concatenation).
    # strategy defaults to "cogroup": that's the path whose per-group pandas
    # memory the salting bounds (the "window" path never needed it).
    out = asof_join(
        l_tag,
        r_all,
        on=on,
        by=[by, "__chunk"],
        right_cols=right_cols,
        suffix=suffix,
        strategy=strategy,
    )
    return out.drop("__chunk")


def hot_entity_stats(df: DataFrame, entity: str = "entity_id", top: int = 5):
    """Observability helper: row share of the hottest entities (use before
    choosing chunk_span / enabling salting)."""
    total = df.count()
    rows = (
        df.groupBy(entity)
        .count()
        .orderBy(F.desc("count"))
        .limit(top)
        .collect()
    )
    return [(r[entity], r["count"], r["count"] / total) for r in rows]


def salted_expanding_sum(
    df: DataFrame,
    value: str,
    entity: str = "entity_id",
    ts: str = "ts",
    chunk_span: float = 86400.0,
    out_col: str = "cumsum",
) -> DataFrame:
    """Expanding (prefix) sum decomposed for hot entities: the classic
    two-pass scan.

    Pass 1 (parallel): within-(entity, time-chunk) expanding sum — each
    chunk is an independent window partition, so a 10^8-row entity becomes
    chunk_count parallel tasks instead of one giant sorted partition.
    Pass 2 (tiny): per-chunk totals → exclusive running total over the
    chunk sequence (one row per entity-chunk) joined back as the carry.

    result = within_chunk_cumsum + carry. Float caveat: the summation
    TREE differs from the single-pass window, so values agree to ~ulp
    (exact for integer-valued data).
    """
    t = epoch_seconds(df, ts)
    chunk = F.floor(t / F.lit(float(chunk_span)))
    d = df.withColumn("__chunk", chunk)

    w_in = (
        Window.partitionBy(entity, "__chunk")
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local", F.sum(value).over(w_in))

    totals = d.groupBy(entity, "__chunk").agg(F.sum(value).alias("__tot"))
    w_ch = (
        Window.partitionBy(entity)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.withColumn(
        "__carry", F.coalesce(F.sum("__tot").over(w_ch), F.lit(0.0))
    ).select(entity, "__chunk", "__carry")

    out = d.join(carry, [entity, "__chunk"], "left").withColumn(
        out_col, F.col("__local") + F.coalesce(F.col("__carry"), F.lit(0.0))
    )
    return out.drop("__chunk", "__local", "__carry")
