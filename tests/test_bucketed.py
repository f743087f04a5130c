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
