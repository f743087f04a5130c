"""Single-pass data-validation operator (the expectations/constraints
pattern of Amazon Deequ, Schelter et al. VLDB'18): declare per-column
rules, get one row per rule with violation counts and a pass verdict —
the quality gate a pipeline runs before committing an expensive stage.

Every rule is a Column predicate, so the whole suite compiles to ONE
aggregation over a single scan (conditional sums — no per-rule jobs, no
shuffle beyond the final single-row agg). Rule results are data, not
exceptions: persist them next to the stage manifest and alert on deltas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNotNull()


def unique(col: str) -> tuple[str, Column]:
    """Uniqueness is not row-local — handled specially in validate()."""
    return f"unique({col})", F.col(col)


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return f"in_range({col},{lo},{hi})", F.col(col).between(lo, hi)


def matches(col: str, regex: str) -> tuple[str, Column]:
    return f"matches({col})", F.col(col).rlike(regex)


def is_in(col: str, values: list) -> tuple[str, Column]:
    return f"is_in({col})", F.col(col).isin(values)


def validate(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate `rules` (list of (name, predicate Column) pairs, e.g. from
    the not_null/in_range/matches/is_in/unique helpers) in one aggregation
    pass. Returns one row per rule: (rule, n_rows, n_violations, passes).

    `unique(col)` rules need a distinct count, which cannot ride the
    row-local conditional sums — they are computed in the SAME jobs via
    count_distinct in the single agg (exact; swap for approx_count_distinct
    at extreme cardinality). NULL predicate results count as violations
    (a rule that cannot evaluate did not pass).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = []
    for i, (name, pred) in enumerate(rules):
        names.append(name)
        if name.startswith("unique("):
            aggs.append(
                (F.count(pred) - F.count_distinct(pred)).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
                ).alias(f"__v{i}")
            )
    row = df.agg(*aggs)
    out = None
    for i, name in enumerate(names):
        one = row.select(
            F.lit(name).alias("rule"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__v{i}").cast("long").alias("n_violations"),
            (F.col(f"__v{i}") == 0).alias("passes"),
        )
        out = one if out is None else out.unionByName(one)
    return out
