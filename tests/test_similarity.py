"""ANN similarity tests: exactness of the brute-force baseline, and
recall@k of the random-hyperplane LSH path (+multiprobe) against it.

The catalog queries (ann_cosine_topk / ann_lsh_topk) are the DuckDB-twin
value checks; these tests cover what SQL can't — the recall/quality of the
production (seeded-random-hyperplane) hash, which is deliberately NOT the
oracle variant (axis-aligned sign_code stays portable for the twin).
"""

import numpy as np
import pandas as pd
import pytest

from mpds_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
    random_hyperplane_code,
)

DIM = 16


@pytest.fixture(scope="module")
def emb_df(spark):
    """Clustered embeddings: 8 cluster centers, 25 points each + noise —
    the regime where bucketing must keep same-cluster points together."""
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((8, DIM)) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(25):
            rows.append((vid, (c + rng.standard_normal(DIM) * 0.4).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_random_hyperplane_lsh_recall(spark, emb_df):
    queries = emb_df.filter("vec_id % 25 = 0")  # one query per cluster
    truth = _topk_sets(cosine_topk(emb_df, queries, k=5))

    def recall(bits, n_probes):
        approx = _topk_sets(
            lsh_cosine_topk(
                emb_df,
                queries,
                k=5,
                bits=bits,
                code_fn=lambda c, b: random_hyperplane_code(c, b, DIM, seed=7),
                n_probes=n_probes,
            )
        )
        hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
        return hits / sum(len(truth[q]) for q in truth)

    r0 = recall(6, 0)
    r3 = recall(6, 3)
    # same-cluster points mostly share all 6 signs; multiprobe recovers
    # boundary-straddlers — monotone and high
    assert r3 >= r0
    assert r3 >= 0.9


def test_random_hyperplane_code_deterministic(spark, emb_df):
    import pyspark.sql.functions as F

    a = (
        emb_df.repartition(1)
        .select("vec_id", random_hyperplane_code("embedding", 8, DIM, 7).alias("c"))
        .collect()
    )
    b = (
        emb_df.repartition(16)
        .select("vec_id", random_hyperplane_code("embedding", 8, DIM, 7).alias("c"))
        .collect()
    )
    assert {(r.vec_id, r.c) for r in a} == {(r.vec_id, r.c) for r in b}
    # different seed -> (almost surely) different bucketing
    c = (
        emb_df.select(
            "vec_id", random_hyperplane_code("embedding", 8, DIM, 8).alias("c")
        ).collect()
    )
    assert {(r.vec_id, r.c) for r in a} != {(r.vec_id, r.c) for r in c}
