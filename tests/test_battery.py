import numpy as np
import pandas as pd
import pytest

from mpds_spark.functions.battery import extract_accel_features, token_features
from mpds_spark.operators.battery import (
    extract_accel_battery,
    extract_token_battery,
    score_dot,
    slice_modality,
    token_battery_names,
)
from mpds_spark.sources.synth import synth_sequences


def test_token_battery_passthrough_and_allclose(spark):
    """BASELINE.json gates: token arrays exactly equal through the pipeline;
    feature vectors numpy-allclose to the direct numpy extraction."""
    df = synth_sequences(spark, 300, seed=42, n_entities=20)
    out = extract_token_battery(df).orderBy("doc_id").toPandas()
    src = df.orderBy("doc_id").toPandas()
    assert len(out) == 300
    for i in range(0, 300, 37):
        # exact token equality (pass-through invariant)
        np.testing.assert_array_equal(
            np.asarray(out["tokens"].iloc[i]), np.asarray(src["tokens"].iloc[i])
        )
        expected = token_features(np.asarray(src["tokens"].iloc[i]))
        got = np.asarray(out["features"].iloc[i], dtype=float)
        np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)
    assert len(out["features"].iloc[0]) == len(token_battery_names())


def test_accel_battery_spark_matches_numpy(spark):
    rng = np.random.default_rng(21)
    frames = []
    for e in range(3):
        for ts in (100.0, 200.0):
            n = 400
            t = np.cumsum(rng.uniform(0.004, 0.008, n))
            frames.append(
                pd.DataFrame(
                    {
                        "entity_id": f"e{e}",
                        "ts": ts,
                        "t": t,
                        "x": np.sin(2 * np.pi * 2 * t) + 0.05 * rng.normal(size=n),
                        "y": 0.3 * rng.normal(size=n),
                        "z": 9.8 + 0.05 * rng.normal(size=n),
                    }
                )
            )
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = extract_accel_battery(df).orderBy("entity_id", "ts").toPandas()
    assert len(out) == 6
    for _, row in out.iterrows():
        g = pdf[(pdf.entity_id == row.entity_id) & (pdf.ts == row.ts)]
        expected = extract_accel_features(
            g["t"].to_numpy(), g["x"].to_numpy(), g["y"].to_numpy(), g["z"].to_numpy()
        )
        np.testing.assert_allclose(
            np.asarray(row["features"], dtype=float),
            expected,
            rtol=1e-12,
            equal_nan=True,
        )


def test_slice_and_score(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "features": [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]})
    )
    sliced = slice_modality(df, "features", 1, 2, "mod").orderBy("k").toPandas()
    assert [list(v) for v in sliced["mod"]] == [[2.0, 3.0], [5.0, 6.0]]
    scored = score_dot(df, "features", [1.0, 0.5, -1.0]).orderBy("k").toPandas()
    assert scored["score"].tolist() == [
        pytest.approx(1 + 1 - 3),
        pytest.approx(4 + 2.5 - 6),
    ]
