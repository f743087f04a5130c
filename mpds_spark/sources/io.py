"""Source/sink shim: Iceberg when a catalog is available, parquet otherwise.

The engine's canonical storage is an Iceberg table of tokenized sequences
(BASELINE.json input_hint), partitioned by bucket(entity_id) so the one
range exchange per pipeline leg can be eliminated by storage layout at
cluster scale. The sandbox has no Iceberg runtime jar, so the shim falls
back to parquet with the IDENTICAL partition layout (bucket=<k> dirs via
the same pmod(crc32(entity)) transform the lineage runner uses) — tests and
the driver never depend on the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def write_sequences(
    df: DataFrame,
    target: str,
    spark: SparkSession | None = None,
    entity: str = "entity_id",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> str:
    """Write the sequence table. `target` is an Iceberg table name when a
    catalog is configured, else a parquet path. Returns the format used."""
    spark = spark or df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        (
            df.writeTo(target)
            .partitionedBy(F.bucket(n_buckets, entity))
            .createOrReplace()
        )
        return "iceberg"
    bucket = F.pmod(F.crc32(F.col(entity).cast("string")), F.lit(n_buckets))
    (
        df.withColumn("bucket", bucket)
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(target)
    )
    return "parquet"


def read_sequences(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark) and "/" not in target:
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-testdata loader (TESTDATA.md layout)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_training_shards(
    df,
    path: str,
    order_col: str | list[str] = "bin_id",
    rows_per_shard: int = 100_000,
    n_partitions: int | None = None,
    shuffle_seed: str | None = None,
) -> dict:
    """Write packed training rows as size-bounded parquet shards plus a
    JSON manifest — the artifact a dataloader consumes.

    Rows are range-partitioned and sorted by `order_col` so shard k holds
    a contiguous, ordered slice of the training stream (sequential
    readers stream shards in manifest order and see the exact packed
    order), and `maxRecordsPerFile` caps rows per file so shard size is
    bounded regardless of partition skew. The manifest records per-file
    row counts and the total, written AFTER the data (atomic rename) so a
    partial write is never mistaken for a finished dataset.

    shuffle_seed: when set, rows are instead ordered by
    md5(seed|order_cols...) — a DETERMINISTIC global shuffle of the
    training order (packing preserves doc-stream adjacency, which a
    dataloader reading shards sequentially would replay; training wants
    decorrelated batches). Same range-partition + sort machinery, same
    reproducibility guarantee: the order is a pure function of row
    content and the seed. order_col must be a GLOBALLY unique key (or a
    list of columns that is unique together — e.g. ["source", "bin_id"]
    when bin_id is only unique per source): rows colliding on the hashed
    key would stay adjacent with partition-dependent relative order
    (r4 ADVICE).
    """
    import glob as _glob
    import json as _json
    import os as _os

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if shuffle_seed is not None:
        df = df.withColumn(
            "__ord",
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(shuffle_seed),
                    *[F.col(c).cast("string") for c in order_cols],
                )
            ),
        )
        order_cols = ["__ord"]
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(int(rows_per_shard)))
    try:
        out = df.repartitionByRange(
            n_partitions, *order_cols
        ).sortWithinPartitions(*order_cols)
        if order_cols == ["__ord"]:
            # projection after the sort keeps row order; the shuffle key
            # itself stays out of the shard schema
            out = out.drop("__ord")
        out.write.mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    files = sorted(_glob.glob(_os.path.join(path, "part-*")))
    shards = []
    total = 0
    # per-file row counts come from the parquet FOOTER metadata (pyarrow,
    # driver-side, no Spark jobs) — the previous per-file
    # spark.read.parquet(f).count() launched O(n_shards) jobs on an
    # artifact sized for 100-TB runs (ADVICE r3)
    import pyarrow.parquet as _pq

    for f in files:
        n = _pq.ParquetFile(f).metadata.num_rows
        total += n
        shards.append({"file": _os.path.basename(f), "rows": n})
    manifest = {"total_rows": total, "n_shards": len(shards), "shards": shards}
    tmp = _os.path.join(path, "_SHARDS.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(path, "_SHARDS.json"))
    return manifest
