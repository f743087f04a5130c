"""Bucketed (co-located) storage: shuffle-free entity joins.

At 10^12-row scale the single biggest win is not shuffling at all: write
both sides bucketed + sorted by the entity key (Spark bucketBy ≙ Iceberg
bucket(N, entity) partition transform + sorted files), and every
entity-keyed equi/as-of join or window leg reads co-located buckets with
NO Exchange in the plan. The test asserts exactly that on the executed
plan.

Local mode uses the session-local Spark warehouse (saveAsTable); on a
cluster the same API writes to the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    entity: str = "entity_id",
    ts: str = "ts",
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, entity)
        .sortBy(entity, ts)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_shuffle_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan (0 for a
    fully co-located join; broadcast exchanges don't move the big side)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
