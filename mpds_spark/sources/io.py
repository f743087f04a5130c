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
