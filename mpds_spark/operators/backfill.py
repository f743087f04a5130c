"""Backfill operators: LOCF (sample-and-hold) with expiration, and
per-entity linear interpolation.

Parity:
- locf ← dssl/mimicUsefulFunction.R:301-332
  (mimic.SampleAndHoldPropagation.WithExpiration): emits the carried value,
  the time since the last observed sample, and the carried value nulled
  again once ts - last_sample_ts > valid_time. Strictly backward-looking.
- locf with default ← mimicUsefulFunction.R:711-718
  (singlePatientSampleAndHoldInterpolation): leading nulls get defVal.
- interpolate ← mimicUsefulFunction.R:631-708
  (mimic.singlePatientLinearInterpolation + aux.linear_approx): linear
  interpolation between non-null neighbors; a null FIRST element becomes
  defVal; a null LAST element becomes the last non-null value; an all-null
  entity becomes defVal everywhere. Needs the *next* non-null value, so it
  is forward-looking: gated by leakage_ok (train-prep only, never features).

Scale: locf is pure window expressions (one entity exchange, WindowExec,
whole-stage codegen). interpolate is a grouped-map Arrow UDF with a fully
vectorized pandas body (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds

from mpds_spark.operators.asof import LeakageError


def locf(
    df: DataFrame,
    value: str = "value",
    entity: str = "entity_id",
    ts: str = "ts",
    valid_time: float | None = None,
    default: float | None = None,
    out_prefix: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward per entity, with optional expiration
    and optional default for leading nulls.

    Adds columns:
      {p}_locf                — carried value (current row's own value wins)
      {p}_time_since_sample   — ts - ts(last non-null), null if never seen
      {p}_locf_expir          — carried value, nulled when
                                time_since_sample > valid_time
                                (only when valid_time is not None)
    """
    p = out_prefix or value
    w = (
        Window.partitionBy(entity)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = epoch_seconds(df, ts)
    carried = F.last(F.col(value), ignorenulls=True).over(w)
    last_sample_t = F.last(
        F.when(F.col(value).isNotNull(), t), ignorenulls=True
    ).over(w)
    tsls = t - last_sample_t

    out = df.withColumn(f"{p}_locf", carried).withColumn(
        f"{p}_time_since_sample", tsls
    )
    if valid_time is not None:
        out = out.withColumn(
            f"{p}_locf_expir",
            F.when(tsls > F.lit(float(valid_time)), F.lit(None)).otherwise(carried),
        )
    if default is not None:
        out = out.withColumn(
            f"{p}_locf", F.coalesce(F.col(f"{p}_locf"), F.lit(default))
        )
    return out


def interpolate(
    df: DataFrame,
    value: str = "value",
    entity: str = "entity_id",
    ts: str = "ts",
    default: float = 0.0,
    out_col: str | None = None,
    leakage_ok: bool = False,
    strategy: str = "window",
) -> DataFrame:
    """Per-entity linear interpolation of nulls (reference semantics above).

    Forward-looking (uses the next non-null sample): requires leakage_ok.

    strategy="window" (default): pure window expressions — JVM-only, one
    entity exchange, no pandas group materialization (scale path).
    strategy="pandas": grouped-map Arrow numpy kernel (the original
    transcription; differential-tested equal to the window plan).
    """
    if not leakage_ok:
        raise LeakageError(
            "interpolate() uses future samples (forward-looking); pass "
            "leakage_ok=True — train-prep only, never feature columns."
        )
    oc = out_col or f"{value}_interp"
    if strategy == "window":
        return _interpolate_window(df, value, entity, ts, default, oc)
    if strategy != "pandas":
        raise ValueError(f"unknown strategy {strategy!r}")
    schema = df.withColumn(oc, F.col(value).cast("double")).schema
    cols = [f.name for f in schema.fields]

    # timestamps → float seconds for the kernel
    work = df
    if str(df.schema[ts].dataType).lower().startswith("timestamp"):
        work = df.withColumn("__ts_d", epoch_seconds(df, ts))
        ts_num = "__ts_d"
    else:
        ts_num = ts

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_num, kind="mergesort").reset_index(drop=True)
        x = pdf[ts_num].to_numpy(dtype="float64")
        y = pdf[value].to_numpy(dtype="float64", na_value=np.nan)
        pdf[oc] = _interp_reference(x, y, default)
        return pdf[cols]

    from mpds_spark.operators.util import pin_group_parallelism

    return (
        pin_group_parallelism(work, entity)
        .groupBy(entity)
        .applyInPandas(fn, schema)
    )


def _interpolate_window(
    df: DataFrame, value: str, entity: str, ts: str, default: float, oc: str
) -> DataFrame:
    """Reference interpolation as pure window expressions (same formula and
    padding rules as _interp_reference; one exchange, WindowExec only):
    1. pad: last row's null <- last non-null; first row's null <- default;
       all-null entity <- default everywhere
    2. interior nulls: (yn*(x-xp) + yp*(xn-x)) / (xn-xp) between the padded
       previous/next non-null neighbors.
    """
    t = epoch_seconds(df, ts)
    w = Window.partitionBy(entity).orderBy(t)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    v = F.col(value).cast("double")
    n_val = F.count(v).over(full)
    last_val = F.last(v, ignorenulls=True).over(full)
    rn = F.row_number().over(w)
    n_rows = F.count(F.lit(1)).over(full)

    v2 = (
        F.when(v.isNotNull(), v)
        .when(n_val == 0, F.lit(float(default)))
        .when(rn == n_rows, last_val)  # pad last (before first: R order)
        .when(rn == 1, F.lit(float(default)))  # pad first with default
    )
    d = df.withColumn("__v2", v2).withColumn("__t", t)
    wb = Window.partitionBy(entity).orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy(entity).orderBy("__t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    yp = F.last("__v2", ignorenulls=True).over(wb)
    xp = F.last(
        F.when(F.col("__v2").isNotNull(), F.col("__t")), ignorenulls=True
    ).over(wb)
    yn = F.first("__v2", ignorenulls=True).over(wf)
    xn = F.first(
        F.when(F.col("__v2").isNotNull(), F.col("__t")), ignorenulls=True
    ).over(wf)
    interp = (yn * (F.col("__t") - xp) + yp * (xn - F.col("__t"))) / (xn - xp)
    out = d.withColumn(
        oc, F.when(F.col("__v2").isNotNull(), F.col("__v2")).otherwise(interp)
    )
    return out.drop("__v2", "__t")


def _interp_reference(x: np.ndarray, y: np.ndarray, def_val: float) -> np.ndarray:
    """Pure-numpy transcription of mimic.singlePatientLinearInterpolation
    (mimicUsefulFunction.R:669-708) + mimic.aux.linear_approx (:631-667)."""
    y = y.copy()
    non_na = ~np.isnan(y)
    if non_na.all():
        return y
    if not non_na.any():
        return np.full_like(y, def_val, dtype="float64")
    # pad last with last non-null, first with default (reference order)
    if np.isnan(y[-1]):
        y[-1] = y[non_na][-1]
    if np.isnan(y[0]):
        y[0] = def_val
    # linear_approx: interpolate remaining interior nulls between neighbors
    non_na = ~np.isnan(y)
    xi = x[non_na]
    yi = y[non_na]
    nan_idx = np.where(~non_na)[0]
    if len(nan_idx):
        # position of each nan between its non-null neighbors
        pos = np.searchsorted(xi, x[nan_idx], side="right")
        xp, yp = xi[pos - 1], yi[pos - 1]
        xn, yn = xi[pos], yi[pos]
        y[nan_idx] = (yn * (x[nan_idx] - xp) + yp * (xn - x[nan_idx])) / (xn - xp)
    return y


def densify_daily(
    df: DataFrame,
    ts: str = "ts",
    entity: str = "entity_id",
    value: str | None = None,
    bucket_s: int = 86400,
) -> DataFrame:
    """Dense per-entity time grid with zero-fill: one row for EVERY
    bucket between an entity's first and last event (inclusive), with
    n_events = 0 (and sum_value = 0) on the silent days — the densify
    step a fixed-stride windowed model needs before convolution/lag
    features, and the natural companion to locf (which assumes the grid
    already exists). Reference analogue: the dense per-day scoring grid
    behind the MPDS scoring windows (dssl/dssFunctionLibrary.R:876-917
    aggregates per scoring day, not per raw event).

    Grid generation is sequence(first_bucket, last_bucket) EXPLODED from
    the per-entity span row — the generated-dimension idiom: the grid
    never materializes on the driver and its size is data-bounded
    (span/bucket per entity). `value` must be an exact integer column
    (e.g. cents) when given; all outputs are exact.

    Shape at scale: per-(entity,bucket) partial agg (raw volume
    collapses here), tiny span agg, explode, and one (entity,bucket)
    join back. Returns (entity, bucket_start_s, n_events[, sum_value])."""
    bucket_us = int(bucket_s) * 1_000_000
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    cols = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value is not None:
        cols.append(
            F.sum(F.col(value).cast("decimal(38,0)")).alias("__s")
        )
    per = (
        df.select(F.col(entity), us.alias("__us"),
                  *([F.col(value)] if value else []))
        .withColumn(
            "__b", F.floor(F.col("__us") / F.lit(bucket_us)).cast("long")
        )
        .groupBy(entity, "__b")
        .agg(*cols)
    )
    span = per.groupBy(entity).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    grid = span.select(
        entity, F.explode(F.sequence("__b0", "__b1")).alias("__b")
    )
    out = grid.join(per, [entity, "__b"], "left")
    sel = [
        F.col(entity),
        (F.col("__b") * F.lit(float(bucket_s))).alias("bucket_start_s"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
        .alias("n_events"),
    ]
    if value is not None:
        sel.append(
            F.coalesce(F.col("__s"), F.lit(0).cast("decimal(38,0)"))
            .alias("sum_value"),
        )
    return out.select(*sel)
