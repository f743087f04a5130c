"""Deterministic corpus sampling operators for training-data pipelines.

`sample_token_budget` fills a per-group (per-source / per-language) token
budget with a deterministic, layout-independent document sample — the
"mix N billion tokens of web + M of code" step of assembling a training
mixture. Documents are consumed in content-hash order (md5 of
group|doc_id), so the selected set is a pure function of row content:
identical under any partitioning, any engine, any run.

Two bit-identical strategies:
- "window": one running-sum window per group — the direct expression.
  A single group is one window partition, so per-group parallelism is 1;
  right up to ~memory-sized groups.
- "bucketed": the 100-TB shape. The hash order is split into 16^nibbles
  ordered buckets by md5 prefix; pass 1 aggregates per-(group, bucket)
  token totals (tiny: |groups| * 16^nibbles rows, collected and turned
  into exclusive prefix carries on the driver — the same fit->broadcast
  idiom as scale.py), pass 2 runs the running sum WITHIN each
  (group, bucket) partition and adds the broadcast carry. Per-group
  parallelism becomes 16^nibbles and no window partition exceeds
  ~group_size/16^nibbles rows. Because md5 is lowercase hex, bucket-id
  order == hash-prefix lexical order, so carry + intra-bucket cumsum
  equals the global cumsum bit-for-bit (pytest-pinned vs "window").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.operators.dedup import words_col


def sample_token_budget(
    df: DataFrame,
    budget: int,
    group: str = "source",
    key: str = "doc_id",
    text: str = "text",
    strategy: str = "window",
    nibbles: int = 1,
) -> DataFrame:
    """Keep documents per `group`, in md5(group|key) order, while the
    running token total (whitespace word count, matching token_count's
    n_words) stays <= budget. Returns (key, group, n_tok, cum_tok).

    A doc is kept iff the budget is not yet exhausted INCLUDING itself
    (cum_tok <= budget): the greedy prefix of the hash-shuffled stream.
    """
    h = F.md5(F.concat_ws("|", F.col(group), F.col(key).cast("string")))
    t = df.select(
        F.col(key),
        F.col(group),
        F.size(words_col(text)).cast("long").alias("n_tok"),
        h.alias("__h"),
    )
    if strategy == "window":
        w = (
            Window.partitionBy(group)
            .orderBy("__h", key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = t.withColumn("cum_tok", F.sum("n_tok").over(w))
    elif strategy == "bucketed":
        n_buckets = 16**nibbles
        b = t.withColumn(
            "__b", F.conv(F.substring("__h", 1, nibbles), 16, 10).cast("int")
        )
        totals = (
            b.groupBy(group, "__b")
            .agg(F.sum("n_tok").alias("__tot"))
            .collect()
        )
        per_group: dict = {}
        for row in totals:
            per_group.setdefault(row[group], {})[row["__b"]] = row["__tot"]
        carries = []
        for g, buckets in per_group.items():
            run = 0
            for bi in range(n_buckets):
                if bi in buckets:
                    carries.append((g, bi, run))
                    run += buckets[bi]
        carry_df = b.sparkSession.createDataFrame(
            carries, schema=f"{group} string, __b int, __carry long"
        )
        w = (
            Window.partitionBy(group, "__b")
            .orderBy("__h", key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = (
            b.join(F.broadcast(carry_df), [group, "__b"])
            .withColumn(
                "cum_tok", F.sum("n_tok").over(w) + F.col("__carry")
            )
            .drop("__b", "__carry")
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return (
        c.filter(F.col("cum_tok") <= F.lit(int(budget)))
        .select(key, group, "n_tok", "cum_tok")
    )
