import numpy as np
import pytest

from conftest import make_entity_series

from mpds_spark.operators.asof import LeakageError
from mpds_spark.plans.leakage import FeaturePlan, FeatureSpec


def test_compile_backward_features(spark):
    pdf = make_entity_series(null_frac=0.0, seed=91)
    df = spark.createDataFrame(pdf)
    plan = (
        FeaturePlan()
        .add(FeatureSpec("v_cumsum", "sum", "value", "expanding"))
        .add(FeatureSpec("v_max5", "max", "value", "rows:-4"))
        .add(FeatureSpec("v_avg_60s", "avg", "value", "range:-60"))
        .add(FeatureSpec("v_now", "last", "value", "current"))
    )
    assert plan.names() == ["v_cumsum", "v_max5", "v_avg_60s", "v_now"]
    out = plan.compile(df).orderBy("entity_id", "ts").toPandas()

    g = pdf.sort_values(["entity_id", "ts"]).groupby("entity_id")
    exp_cumsum = g["value"].cumsum().to_numpy()
    np.testing.assert_allclose(
        out["v_cumsum"].to_numpy(dtype=float), exp_cumsum, rtol=1e-12
    )
    exp_max5 = (
        g["value"].rolling(5, min_periods=1).max().reset_index(drop=True).to_numpy()
    )
    np.testing.assert_allclose(out["v_max5"].to_numpy(dtype=float), exp_max5)
    # range frame sanity: window avg includes current row
    assert np.isfinite(out["v_avg_60s"].to_numpy(dtype=float)).all()


def test_lint_rejects_forward_feature(spark):
    plan = FeaturePlan().add(
        FeatureSpec("peek", "min", "value", "future", role="feature")
    )
    with pytest.raises(LeakageError, match="peek"):
        plan.lint()


def test_forward_allowed_for_labels(spark):
    pdf = make_entity_series(null_frac=0.0, seed=93)
    df = spark.createDataFrame(pdf)
    plan = (
        FeaturePlan()
        .add(FeatureSpec("x_cum", "sum", "value", "expanding"))
        .add(FeatureSpec("y_next_min", "min", "value", "future", role="label"))
    )
    out = plan.compile(df)
    assert "y_next_min" in out.columns
    assert out.count() == len(pdf)
