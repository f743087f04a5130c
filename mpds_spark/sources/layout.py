"""Multi-dimensional data layout: Z-order (Morton) interleaved sort keys.

A table range-sorted on ONE key prunes scans only on that key's
predicates; a 100-TB fact table queried by BOTH entity and time wants
file-level min/max bounds that are tight in both dimensions at once.
Z-ordering interleaves the bits of the two dimensions so that
lexicographic key ranges map to small axis-aligned rectangles — each
written file covers a bounded (entity-range x time-range) box and the
parquet footer min/max stats prune on either predicate (the technique
behind Delta/Iceberg OPTIMIZE ZORDER; public algorithm, Morton 1966).

Everything is exact integer bit arithmetic — JVM-side shift/and/or
column expressions, zero shuffles for key computation, one range
exchange for the layout write (that exchange IS the product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns: bit i of c1 lands at position 2i, bit i of c2 at 2i+1.
    Callers pre-bin raw values into [0, 2^bits) (e.g. key % 2^bits, or
    epoch-day); out-of-range high bits are deliberately masked off so the
    key stays within 2*bits bits."""
    if not 1 <= int(bits) <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = F.col(c1) if isinstance(c1, str) else c1
    y = F.col(c2) if isinstance(c2, str) else c2
    x, y = x.cast("long"), y.cast("long")
    acc = F.lit(0).cast("long")
    for i in range(int(bits)):
        acc = (
            acc.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
        )
    return acc


def zorder_write(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write `df` range-partitioned and sorted by the Morton key of
    (c1, c2): every output file covers a small axis-aligned box in the
    (c1, c2) plane, so parquet min/max footer stats prune scans on
    EITHER column's predicates. The range exchange is the entire cost —
    the same one a single-key sort-write would pay."""
    spark = df.sparkSession
    if n_files is None:
        n_files = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = df.withColumn("__z", zorder_key(c1, c2, bits))
    out = out.repartitionByRange(int(n_files), "__z").sortWithinPartitions(
        "__z"
    )
    out.drop("__z").write.mode("overwrite").parquet(path)
