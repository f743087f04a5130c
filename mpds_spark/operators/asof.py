"""Point-in-time (as-of) join and same-table event-distance scans.

Two operators:

- time_since_event: same-table as-of scan. Pure window expressions, JVM-side.
  Parity: dssl/mimicUsefulFunction.R:23-94
  (dss.Auxiliary.CalculateTimeSinceAndToEvent). The reference semantics are
  *strict*: a row's "last event" excludes the current row (the forward pass
  emits before updating lastEventHT), and "next event" excludes it too.

- asof_join: two-table point-in-time join (Spark has no native ASOF JOIN).
  Physical plan: both sides are shuffled once on the entity key
  (FlatMapCoGroupsInPandas), each co-group is sorted and merged with a
  vectorized numpy searchsorted two-pointer — no per-row Python. Backward
  direction is the default and the only one allowed for feature columns;
  forward/nearest require leakage_ok=True (zero-temporal-leakage rule,
  BASELINE.json north_rule).

Scale notes:
- The cogroup shuffle is the single exchange of the pipeline leg; AQE skew
  splitting does not apply to grouped-map Python, so genuinely hot entities
  should be pre-split with operators.salting (boundary-replay) — the engine
  keeps groups bounded via spark.sql.execution.arrow.maxRecordsPerBatch for
  transfer and relies on sort-spill inside the JVM before the Python stage.
- searchsorted is O((n+m) log m) per group, memory O(n+m) in Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds
from pyspark.sql.types import StructField, StructType


class LeakageError(ValueError):
    """Raised when a forward-looking window is requested without opt-in."""


def time_since_event(
    df: DataFrame,
    event: str = "event",
    entity: str = "entity_id",
    ts: str = "ts",
    include_forward: bool = False,
    leakage_ok: bool = False,
) -> DataFrame:
    """Add time_since_last_event / time_since_first_event (backward, strict)
    and optionally time_to_next_event / time_to_first_event (forward —
    label/eval columns only, gated by leakage_ok).

    Parity: mimicUsefulFunction.R:23-94. All distances are ts deltas in the
    ts column's own unit (seconds if numeric epoch, or cast from timestamp).
    """
    if include_forward and not leakage_ok:
        raise LeakageError(
            "time_to_next_event / time_to_first_event are forward-looking; "
            "pass leakage_ok=True to compute them for label/eval columns."
        )
    w = Window.partitionBy(entity).orderBy(ts)
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    t = epoch_seconds(df, ts)
    ev_ts = F.when(F.col(event) == 1, t)

    out = df.withColumn(
        "time_since_last_event", t - F.max(ev_ts).over(prev)
    ).withColumn("time_since_first_event", t - F.min(ev_ts).over(prev))
    if include_forward:
        nxt = w.rowsBetween(1, Window.unboundedFollowing)
        out = out.withColumn("time_to_next_event", F.min(ev_ts).over(nxt) - t)
        # R parity (mimicUsefulFunction.R:86-88): timeToFirstEvent is defined
        # ONLY on rows before any event was seen, where it equals
        # timeToNextEvent; after the first event it stays NULL.
        out = out.withColumn(
            "time_to_first_event",
            F.when(
                F.col("time_since_first_event").isNull(),
                F.col("time_to_next_event"),
            ),
        )
    return out


def _merge_asof_arrays(
    l_on: np.ndarray,
    r_on: np.ndarray,
    direction: str,
    allow_exact_matches: bool,
) -> np.ndarray:
    """Vectorized as-of index lookup: for each left on-value, the index of the
    matching right row, or -1. Right side must be sorted ascending."""
    if direction == "backward":
        side = "right" if allow_exact_matches else "left"
        idx = np.searchsorted(r_on, l_on, side=side) - 1
    elif direction == "forward":
        side = "left" if allow_exact_matches else "right"
        idx = np.searchsorted(r_on, l_on, side=side)
        idx[idx >= len(r_on)] = -1
    elif direction == "nearest":
        b = _merge_asof_arrays(l_on, r_on, "backward", allow_exact_matches)
        f = _merge_asof_arrays(l_on, r_on, "forward", allow_exact_matches)
        db = np.where(b >= 0, np.abs(l_on - r_on[np.clip(b, 0, None)]), np.inf)
        df_ = np.where(f >= 0, np.abs(r_on[np.clip(f, 0, None)] - l_on), np.inf)
        idx = np.where(db <= df_, b, f)
        idx = np.where(np.isinf(db) & np.isinf(df_), -1, idx)
    else:
        raise ValueError(f"unknown direction {direction!r}")
    return idx


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "entity_id",
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    leakage_ok: bool = False,
) -> DataFrame:
    """Point-in-time as-of join: for each left row, the latest right row of
    the same `by` key with right.on <= left.on (backward; >= for forward).

    Matches pandas.merge_asof semantics (differentially tested against it).
    tolerance is in the on-column's unit (seconds for numeric/timestamp).
    """
    if direction != "backward" and not leakage_ok:
        raise LeakageError(
            f"asof_join(direction={direction!r}) looks forward in time; "
            "pass leakage_ok=True (labels/eval only, never features)."
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    # disambiguate collisions with left columns
    out_names = {}
    for c in right_cols:
        out_names[c] = c + suffix if c in left.columns else c
    right_on_out = f"{on}{suffix}"

    # Alias every right column to a fresh name: when left and right share
    # lineage (self-as-of over one table), identical attribute ids make the
    # analyzer dedupe/prune right-side columns out of the cogroup silently.
    r = right.select(
        F.col(by).alias("__asof_by"),
        F.col(on).alias("__asof_on"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )

    left_fields = list(left.schema.fields)
    right_fields = [StructField(right_on_out, right.schema[on].dataType, True)] + [
        StructField(out_names[c], right.schema[c].dataType, True) for c in right_cols
    ]
    out_schema = StructType(left_fields + right_fields)

    is_ts = str(left.schema[on].dataType).lower().startswith("timestamp")
    tol = tolerance
    if tol is not None and is_ts:
        tol = np.timedelta64(int(tolerance * 1_000_000), "us")

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort").reset_index(drop=True)
        out = lpdf.copy()
        if len(rpdf) == 0:
            out[right_on_out] = pd.Series([pd.NA] * len(lpdf), dtype=object)
            for c in right_cols:
                out[out_names[c]] = pd.Series([pd.NA] * len(lpdf), dtype=object)
            return out
        rpdf = rpdf.sort_values("__asof_on", kind="mergesort").reset_index(
            drop=True
        )
        l_on = lpdf[on].to_numpy()
        r_on = rpdf["__asof_on"].to_numpy()
        idx = _merge_asof_arrays(l_on, r_on, direction, allow_exact_matches)
        valid = idx >= 0
        take = np.clip(idx, 0, len(rpdf) - 1)
        matched_on = r_on[take]
        if tol is not None:
            dist = np.abs(l_on - matched_on)
            valid = valid & (dist <= tol)
        picked = rpdf.iloc[take].reset_index(drop=True)
        out[right_on_out] = pd.Series(matched_on).mask(~valid)
        for c in right_cols:
            out[out_names[c]] = picked[out_names[c]].mask(~valid)
        return out

    return (
        left.groupBy(by)
        .cogroup(r.groupBy("__asof_by"))
        .applyInPandas(merge, out_schema)
    )
