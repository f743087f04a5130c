"""Time/number helpers shared by operators and the query catalog."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as double (micro precision), for any ts column type.

    TIMESTAMP_NTZ cannot cast straight to double in Spark 4 — route through
    TIMESTAMP (session tz is pinned to UTC, so NTZ == UTC instant).
    """
    t = df.schema[col].dataType.typeName()
    c = F.col(col)
    if t.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def duck_round(c: Column, digits: int = 6) -> Column:
    """Round exactly like DuckDB's ROUND on DOUBLE (std::round(x*p)/p, half
    away from zero) so driver value-hashes match the oracle bit-for-bit.
    Spark's F.round goes through BigDecimal and can disagree on ties."""
    p = F.lit(float(10**digits))
    return F.signum(c) * F.floor(F.abs(c) * p + F.lit(0.5)) / p
