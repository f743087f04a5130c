"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_group_parallelism(df: DataFrame, *keys) -> DataFrame:
    """User-specified repartition on the group keys before a grouped-map:
    grouped-map cost is per GROUP (pandas/Arrow round-trip), but AQE
    coalesces shuffle partitions by BYTES — a many-groups/small-bytes stage
    collapses onto a few tasks and executes groups serially (measured 6x on
    the salted as-of). AQE never coalesces user repartitions, and the
    groupBy reuses the partitioning without an extra exchange."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *keys)
