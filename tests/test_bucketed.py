import shutil

import numpy as np

from conftest import make_entity_series

from mpds_spark.sources.bucketed import (
    plan_shuffle_exchanges,
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark):
    pdf = make_entity_series(n_entities=8, rows_per=30, seed=97)
    df = spark.createDataFrame(pdf)
    left = df.select("entity_id", "ts", "value")
    right = df.select("entity_id", "ts", "event")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # un-bucketed baseline: sort-merge join shuffles both sides
        base = left.join(right.drop("ts"), "entity_id")
        assert plan_shuffle_exchanges(base) >= 2

        for t in ("b_left", "b_right"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        write_bucketed(left, "b_left", n_buckets=4)
        write_bucketed(right, "b_right", n_buckets=4)
        bl = read_bucketed(spark, "b_left")
        br = read_bucketed(spark, "b_right")
        joined = bl.join(br.drop("ts"), "entity_id")
        # co-located buckets: ZERO shuffle exchanges in the executed plan
        assert plan_shuffle_exchanges(joined) == 0
        assert joined.count() == base.count()
        np.testing.assert_allclose(
            joined.agg({"value": "sum"}).collect()[0][0],
            base.agg({"value": "sum"}).collect()[0][0],
            rtol=1e-9,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_iceberg_shim_layout_contract(spark, tmp_path):
    """The parquet fallback must honor the Iceberg layout contract:
    bucket=<k> dirs from the same pmod(crc32(entity), n) transform the
    lineage runner uses, every entity in exactly ONE bucket, and a bucket
    filter pruned to that directory's files at scan time."""
    import os
    import zlib

    import pandas as pd
    from pyspark.sql import functions as F

    from mpds_spark.sources.io import read_sequences, write_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(200)],
            "entity_id": [f"e{i % 23}" for i in range(200)],
            "tokens": [[i, i + 1] for i in range(200)],
        }
    )
    target = str(tmp_path / "seq_table")
    fmt = write_sequences(
        spark.createDataFrame(pdf), target, n_buckets=8
    )
    assert fmt == "parquet"  # no Iceberg jar in this container
    dirs = sorted(d for d in os.listdir(target) if d.startswith("bucket="))
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)

    back = read_sequences(spark, target)
    got = back.select("entity_id", "bucket").distinct().collect()
    # one bucket per entity, and it is the documented transform
    seen = {}
    for r in got:
        assert seen.setdefault(r.entity_id, r.bucket) == r.bucket
        assert r.bucket == zlib.crc32(r.entity_id.encode()) % 8

    # partition pruning: a bucket predicate must reach the scan as a
    # partition filter, not a post-scan filter
    one = back.filter(F.col("bucket") == got[0].bucket)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters"
    )[1][:120]


def test_iceberg_runtime_or_skip_with_reason(spark, tmp_path):
    """VERDICT r2 #10: the real Iceberg runtime path has never executed in
    this sandbox (no iceberg-spark-runtime jar on the box — verified by
    filesystem search — and no network to fetch one). Make the gap VISIBLE
    instead of silent: exercise a REAL Iceberg write/read round-trip when
    the class is present; otherwise SKIP with the probe error recorded.
    The parquet shim's layout contract is covered separately by
    test_iceberg_shim_layout_contract."""
    import pytest
    from pyspark.sql import functions as F

    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception as e:  # noqa: BLE001
        pytest.skip(
            "Iceberg runtime unavailable in sandbox; probe error: "
            f"{str(e)[:160]}"
        )
    from mpds_spark.sources.io import read_sequences, write_sequences

    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    df = spark.range(100).select(
        F.col("id").cast("string").alias("entity_id"), F.col("id").alias("v")
    )
    assert write_sequences(df, "it.db.seq", spark) == "iceberg"
    assert read_sequences(spark, "it.db.seq").count() == 100


def test_write_training_shards_bounded_and_ordered(spark, tmp_path):
    """Shards are row-bounded, manifest totals match, and reading shards
    in manifest order reproduces the bin_id order exactly."""
    import json
    import os

    from mpds_spark.operators.sampling import pack_sequences
    from mpds_spark.sources.io import write_training_shards

    rows = [(i, list(range(i, i + 7))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    packed = pack_sequences(df, 32)
    path = str(tmp_path / "shards")
    man = write_training_shards(packed, path, rows_per_shard=10, n_partitions=4)
    assert man["total_rows"] == packed.count()
    assert all(s["rows"] <= 10 for s in man["shards"])
    with open(os.path.join(path, "_SHARDS.json")) as fh:
        assert json.load(fh) == man
    seen = []
    for s in man["shards"]:
        part = spark.read.parquet(os.path.join(path, s["file"]))
        seen += [r["bin_id"] for r in part.orderBy("bin_id").collect()]
    assert seen == sorted(seen) == [r["bin_id"] for r in packed.orderBy("bin_id").collect()]


def test_write_training_shards_deterministic_shuffle(spark, tmp_path):
    """shuffle_seed reorders the training stream by md5(seed|bin_id):
    same rows, shard schema unchanged, order decorrelated from bin_id but
    identical across reruns with the same seed and different for another
    seed."""
    import hashlib
    import os

    from mpds_spark.operators.sampling import pack_sequences
    from mpds_spark.sources.io import write_training_shards

    rows = [(i, list(range(i, i + 7))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    packed = pack_sequences(df, 32)

    def stream(seed, sub):
        path = str(tmp_path / sub)
        man = write_training_shards(
            packed, path, rows_per_shard=10, n_partitions=4,
            shuffle_seed=seed,
        )
        out = []
        for s in man["shards"]:
            part = spark.read.parquet(os.path.join(path, s["file"]))
            # within a shard rows are sorted by the (dropped) hash — read
            # back in file order
            out += [r["bin_id"] for r in part.collect()]
        assert "__ord" not in part.columns
        return out

    a1 = stream("s1", "a1")
    a2 = stream("s1", "a2")
    b = stream("s2", "b")
    ordered = [r["bin_id"] for r in packed.orderBy("bin_id").collect()]
    assert sorted(a1) == sorted(ordered)  # same rows
    assert a1 == a2  # reproducible
    assert a1 != ordered and a1 != b  # actually shuffled, seed-dependent
    # matches the explicit md5 order computed in python
    exp = sorted(
        ordered,
        key=lambda x: hashlib.md5(f"s1|{x}".encode()).hexdigest(),
    )
    assert a1 == exp


def test_write_training_shards_shuffle_composite_key(spark, tmp_path):
    """When bin_id is only unique per source (packed-per-split output),
    order_col=["source","bin_id"] hashes a globally unique key: same-bin
    rows from different sources decorrelate instead of staying adjacent
    with partition-dependent order (r4 ADVICE). Single-col hashing left
    EVERY same-bin pair adjacent; the composite key must not."""
    import os

    from mpds_spark.sources.io import write_training_shards

    rows = [(s, b, b * 10) for s in ("web", "code") for b in range(120)]
    df = spark.createDataFrame(rows, "source string, bin_id int, x int")

    def stream(sub, order_col):
        path = str(tmp_path / sub)
        man = write_training_shards(
            df, path, order_col=order_col, rows_per_shard=25,
            n_partitions=4, shuffle_seed="s1",
        )
        out = []
        for s in man["shards"]:
            part = spark.read.parquet(os.path.join(path, s["file"]))
            out += [(r["source"], r["bin_id"]) for r in part.collect()]
        return out

    a1 = stream("a1", ["source", "bin_id"])
    a2 = stream("a2", ["source", "bin_id"])
    assert a1 == a2  # deterministic
    assert sorted(a1) == sorted((s, b) for s, b, _ in rows)  # same rows
    adjacent_same_bin = sum(
        1 for i in range(len(a1) - 1) if a1[i][1] == a1[i + 1][1]
    )
    # single-col hashing would make all 120 same-bin pairs adjacent
    assert adjacent_same_bin < 24
