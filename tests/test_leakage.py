"""Zero-temporal-leakage property tests (BASELINE.json north_rule): mutate
every row with ts > t0; every backward-looking feature at ts <= t0 must be
bit-identical. Forward-gated ops must change (sanity that the test bites).
"""

import numpy as np
import pandas as pd

from conftest import make_entity_series

from mpds_spark.operators.asof import asof_join, time_since_event
from mpds_spark.operators.backfill import locf
from mpds_spark.operators.sessionize import sessionize
from mpds_spark.operators.windows import derived_features


def _mutate_future(pdf: pd.DataFrame, t0: float) -> pd.DataFrame:
    out = pdf.copy()
    fut = out["ts"] > t0
    out.loc[fut, "value"] = out.loc[fut, "value"] * -7.5 + 1000.0
    out.loc[fut, "event"] = 1 - out.loc[fut, "event"]
    return out


def _feature_pipeline(spark, pdf):
    df = spark.createDataFrame(pdf).fillna(0.0, subset=["value"])
    df = locf(df, value="value", valid_time=25.0, out_prefix="v")
    df = sessionize(df, gap=40.0)
    df = time_since_event(df, event="event")  # backward-only (no opt-in)
    df = derived_features(df, value="value")
    return df


FEATURE_COLS = [
    "v_locf",
    "v_time_since_sample",
    "v_locf_expir",
    "session_id",
    "time_since_last_event",
    "time_since_first_event",
    "dss_avg",
    "dss_ht_avg",
    "dss_max",
    "dss_abs_rate_avg",
]


def test_backward_features_invariant_under_future_mutation(spark):
    pdf = make_entity_series(n_entities=5, rows_per=40, seed=23)
    t0 = float(pdf["ts"].median())

    base = (
        _feature_pipeline(spark, pdf)
        .filter(f"ts <= {t0}")
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    mut = (
        _feature_pipeline(spark, _mutate_future(pdf, t0))
        .filter(f"ts <= {t0}")
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert len(base) == len(mut) and len(base) > 50
    for c in FEATURE_COLS:
        a = base[c].to_numpy(dtype=float)
        b = mut[c].to_numpy(dtype=float)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), f"leakage in {c}: {np.where(~same)[0][:5]}"


def test_backward_asof_join_invariant_under_future_mutation(spark):
    pdf = make_entity_series(n_entities=4, rows_per=40, seed=29)
    t0 = float(pdf["ts"].median())
    right = pdf[pdf["event"] == 1][["entity_id", "ts", "value"]].rename(
        columns={"value": "ev_val"}
    )
    right_mut = _mutate_future(
        pdf, t0
    )  # mutate then rebuild the right side from it
    right_mut = right_mut[right_mut["event"] == 1][
        ["entity_id", "ts", "value"]
    ].rename(columns={"value": "ev_val"})

    left = pdf[["entity_id", "ts"]]

    def run(r):
        return (
            asof_join(spark.createDataFrame(left), spark.createDataFrame(r))
            .filter(f"ts <= {t0}")
            .orderBy("entity_id", "ts")
            .toPandas()
        )

    a = run(right)["ev_val"].to_numpy(dtype=float)
    b = run(right_mut)["ev_val"].to_numpy(dtype=float)
    same = (a == b) | (np.isnan(a) & np.isnan(b))
    assert same.all()


def test_forward_op_changes_under_future_mutation(spark):
    """Sanity: a forward-looking column MUST differ — proves the harness
    would catch leakage if a backward op regressed."""
    pdf = make_entity_series(n_entities=4, rows_per=40, seed=31)
    t0 = float(pdf["ts"].median())

    def run(p):
        return (
            time_since_event(
                spark.createDataFrame(p).fillna(0.0, subset=["value"]),
                event="event",
                include_forward=True,
                leakage_ok=True,
            )
            .filter(f"ts <= {t0}")
            .orderBy("entity_id", "ts")
            .toPandas()["time_to_next_event"]
            .to_numpy(dtype=float)
        )

    a = run(pdf)
    b = run(_mutate_future(pdf, t0))
    differ = ~((a == b) | (np.isnan(a) & np.isnan(b)))
    assert differ.any()
