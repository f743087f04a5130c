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


def test_multi_table_banded_recall(spark):
    """VERDICT r2 #5: K independent seeded code tables unioned
    (banded_code_candidates) must recover the recall that corpus-scaled
    `bits` costs. Fixture: 4000 vectors in 500 tight clusters (within-
    cluster cosine ~0.995); bits=12 (the log2(n)+2 auto rule for n=4000
    gives 14 — 12 keeps the expected single-table recall LOW enough that
    the union is actually load-bearing), K=4 seeds, recall >= 0.9 of all
    true pairs at cosine >= 0.99 (ground truth: numpy brute force)."""
    from mpds_spark.operators.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(42)
    n_clusters, per = 500, 8
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0)
    vecs = vecs + rng.standard_normal(vecs.shape) * 0.02
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu = np.triu_indices(len(vecs), k=1)
    true_pairs = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= 0.99], iu[1][sims[iu] >= 0.99])
    }
    assert len(true_pairs) > 5000  # the fixture really has near-dups

    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    got = embedding_near_dup_pairs(
        df, threshold=0.99, bits=12, seeds=[101, 202, 303, 404]
    )
    found = {(int(r.vec_a), int(r.vec_b)) for r in got.collect()}
    assert found <= true_pairs  # verify stage admits no false positives
    recall = len(found & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"banded recall {recall:.3f} < 0.9"

    # single 12-bit table for comparison: the union must strictly add recall
    got1 = embedding_near_dup_pairs(df, threshold=0.99, bits=12, seeds=[101])
    found1 = {(int(r.vec_a), int(r.vec_b)) for r in got1.collect()}
    assert len(found1) < len(found)


def test_embedding_near_dups_auto_bits(spark, emb_df):
    """bits='auto' derives max(4, ceil(log2(n_docs)) + 2) — for the 200-doc
    fixture that is 10 — and must equal the explicit-bits run exactly."""
    from mpds_spark.operators.similarity import embedding_near_dup_pairs

    auto = embedding_near_dup_pairs(emb_df, threshold=0.9, bits="auto")
    explicit = embedding_near_dup_pairs(emb_df, threshold=0.9, bits=10)
    a = {(r.vec_a, r.vec_b) for r in auto.collect()}
    e = {(r.vec_a, r.vec_b) for r in explicit.collect()}
    assert a == e and len(a) > 0


def test_ivf_kmeans_recall(spark, emb_df):
    """IVF with k-means centroids: n_probe=1 must already find most true
    neighbors on clustered data (lists align with clusters); n_probe=2
    must push recall@3 >= 0.9 and never decrease it."""
    from mpds_spark.operators.similarity import (
        ivf_cosine_topk,
        kmeans_centroids,
    )

    queries = emb_df.filter(emb_df.vec_id % 20 == 0)
    truth = _topk_sets(cosine_topk(emb_df, queries, k=3))
    C = kmeans_centroids(emb_df, n_centroids=8, seed=7)
    assert C.shape == (8, DIM)

    def recall(n_probe):
        got = _topk_sets(
            ivf_cosine_topk(emb_df, queries, C, k=3, n_probe=n_probe)
        )
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 >= 0.9, (r1, r2)


def test_ivf_deterministic_centroids_exact_vs_brute_within_list(spark, emb_df):
    """With centroids = the cluster centers themselves and n_probe=8 (all
    lists probed), IVF degenerates to brute force — rank lists must match
    exactly."""
    from mpds_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(123)
    centers = rng.standard_normal((8, DIM)) * 3
    queries = emb_df.filter(emb_df.vec_id % 50 == 0)
    brute = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb_df, queries, k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_cosine_topk(
            emb_df, queries, centers, k=3, n_probe=8
        ).collect()
    }
    assert ivf == brute


def test_nearest_centroids_tie_break(spark):
    """Equal-cosine centroids resolve to the LOWER centroid id (the
    documented tie rule the DuckDB oracle mirrors)."""
    from mpds_spark.operators.similarity import nearest_centroids_col

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # centroids 0 and 1 are the same direction (cos=1 for both)
    got = df.select(
        nearest_centroids_col(
            "embedding", [[2.0, 0.0], [1.0, 0.0], [0.0, 1.0]], n_probe=2
        ).alias("p")
    ).collect()[0]["p"]
    assert list(got) == [0, 1]


def test_kmeans_driver_sample_cap(spark, emb_df):
    """VERDICT r3 ask #6: the centroid fit collects its sample to the
    driver, so sample_size above max_sample must RAISE (no silent clamp);
    raising max_sample explicitly is the escape hatch."""
    import pytest as _pytest

    from mpds_spark.operators.similarity import kmeans_centroids

    with _pytest.raises(ValueError, match="max_sample"):
        kmeans_centroids(emb_df, n_centroids=4, sample_size=2_000_000)
    C = kmeans_centroids(
        emb_df,
        n_centroids=4,
        sample_size=2_000_000,
        max_sample=2_000_000,
        seed=7,
    )
    assert C.shape[0] == 4


def test_centroid_outlier_scores(spark):
    """Vectors sampled around their label centroid score near 1; a planted
    far-off vector scores lowest in its label; per-label centroids are
    independent (a vector matching label 0's centroid but tagged label 1
    is an outlier FOR label 1)."""
    import numpy as np

    from mpds_spark.operators.similarity import centroid_outlier_scores

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    base = {0: np.array([10.0, 0.0, 0.0, 0.0]), 1: np.array([0.0, 10.0, 0.0, 0.0])}
    for lbl, b in base.items():
        for _ in range(20):
            v = b + rng.normal(0, 0.3, 4)
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    rows.append((900, [float(x) for x in (-base[1] + base[0])], 1))  # outlier in 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["vec_id"]: r for r in centroid_outlier_scores(df).collect()}
    ins = [r["centroid_cos"] for k, r in out.items() if k < 900]
    assert min(ins) > 0.95
    assert out[900]["centroid_cos"] == min(r["centroid_cos"] for r in out.values())
    assert out[900]["centroid_cos"] < 0.5


def test_semdedup_keep_brute_force(spark):
    """numpy re-derivation on a planted fixture: cluster assignment
    (argmax cosine vs the K lowest-id vectors, centroid-norm scaled),
    within-cluster keep-min-id pruning, and max_cos_prev values."""
    import numpy as np

    from mpds_spark.operators.similarity import semdedup_keep

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 16))
    vecs = []
    for i in range(40):
        v = base[i % 4] + 0.15 * rng.normal(size=16)
        if i % 9 == 0 and i > 0:  # planted near-dup of an earlier vector
            v = np.array(vecs[i - 9][1]) + 0.01 * rng.normal(size=16)
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r.asDict()
           for r in semdedup_keep(df, n_clusters=4, threshold=0.9).collect()}

    V = np.array([np.array(v, dtype=np.float32).astype(float) for _, v in vecs])
    C = V[:4]
    cn = np.sqrt((C * C).sum(1))
    asg = np.argmax(V @ C.T / cn, axis=1)
    norms = np.sqrt((V * V).sum(1))
    for i in range(40):
        assert got[i]["cluster"] == asg[i], i
        prevs = [
            float(V[j] @ V[i] / norms[j] / norms[i])
            for j in range(i)
            if asg[j] == asg[i]
        ]
        if prevs:
            assert got[i]["max_cos_prev"] == pytest.approx(max(prevs), abs=1e-9)
            assert got[i]["keep"] == (max(prevs) < 0.9), i
        else:
            assert got[i]["max_cos_prev"] is None and got[i]["keep"], i
    # the planted near-dups were dropped, most others kept
    dropped = [i for i in range(40) if not got[i]["keep"]]
    assert set(range(9, 40, 9)) <= set(dropped)


def test_knn_loo_label_accuracy_bruteforce(spark):
    """Sampled-query LOO 1-NN accuracy vs numpy brute force with the
    same (cosine desc, id) tie-break, on planted label clusters."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from mpds_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(31)
    centers = {0: np.array([5.0, 0, 0, 0]), 1: np.array([0, 5.0, 0, 0]),
               2: np.array([0, 0, 5.0, 0])}
    rows = []
    for i in range(60):
        lab = i % 3
        v = centers[lab] + rng.normal(0, 1.0, size=4)
        rows.append((i, lab, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    sdf = spark.createDataFrame(pdf)
    nn1 = cosine_topk(sdf, sdf.filter(F.col("vec_id") % 4 == 0), k=1)
    got = {r["query_id"]: r["neighbor_id"] for r in nn1.collect()}

    V = np.array([r[2] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = Vn @ Vn.T
    for q in range(0, 60, 4):
        order = sorted(
            (i for i in range(60) if i != q),
            key=lambda i: (-cos[q, i], i),
        )
        assert got[q] == order[0], q
    # planted clusters are separable: most sampled queries match label
    correct = sum(1 for q in range(0, 60, 4) if got[q] % 3 == q % 3)
    assert correct >= 12


def test_quantized_recall_numpy_rebuild(spark):
    """quantized_recall vs a numpy rebuild of BOTH rankings (same
    floor-based quantizer, same (score desc, id) tie-break) — and
    recall must be < 1 somewhere on vectors engineered so int8
    rounding flips a near-tie."""
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from mpds_spark.operators.similarity import quantized_recall

    rng = np.random.default_rng(41)
    V = rng.normal(size=(40, 8))
    # plant near-ties: tight cluster where quantization reorders
    V[1] = V[0] + rng.normal(0, 1e-3, size=8)
    V[2] = V[0] + rng.normal(0, 1e-3, size=8)
    rows = [(i, [float(x) for x in V[i]]) for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    sdf = spark.createDataFrame(pdf)
    got = {
        r["query_id"]: r
        for r in quantized_recall(
            sdf, sdf.filter(F.col("vec_id") % 4 == 0), k=5
        ).collect()
    }

    def quant(x):
        n = math.sqrt(float(np.dot(x, x)))
        return np.array([
            math.floor(abs(127.0 * xi / n) + 0.5) * math.copysign(
                1.0, xi
            ) if xi != 0 else 0.0
            for xi in x
        ])

    Q = np.array([quant(V[i]) for i in range(40)])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = Vn @ Vn.T
    qdot = Q @ Q.T
    for q in range(0, 40, 4):
        others = [i for i in range(40) if i != q]
        ex = sorted(others, key=lambda i: (-cos[q, i], i))[:5]
        qt = sorted(others, key=lambda i: (-qdot[q, i], i))[:5]
        want = len(set(ex) & set(qt))
        assert got[q]["n_overlap"] == want, q
        assert got[q]["recall"] == want / 5.0


def test_kcenter_coreset_greedy_rebuild(spark):
    """kcenter_coreset vs the explicit greedy farthest-point traversal
    in numpy (same cosine distance, same id tie-break), on clusters
    where the greedy MUST hop between clusters before densifying."""
    import numpy as np
    import pandas as pd

    from mpds_spark.operators.similarity import kcenter_coreset

    rng = np.random.default_rng(53)
    cs = [np.array([9.0, 0, 0]), np.array([0, 9.0, 0]),
          np.array([0, 0, 9.0])]
    rows = []
    for i in range(30):
        v = cs[i % 3] + rng.normal(0, 0.5, size=3)
        rows.append((i, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    got = [
        (r["round"], r["vec_id"])
        for r in kcenter_coreset(
            spark.createDataFrame(pdf), k=5
        ).collect()
    ]
    V = np.array([r[1] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = Vn @ Vn.T
    chosen = [0]
    for _ in range(4):
        best, bd = None, -1.0
        for i in range(30):
            if i in chosen:
                continue
            d = min(1.0 - cos[i, c] for c in chosen)
            if d > bd or (d == bd and i < best):
                best, bd = i, d
        chosen.append(best)
    assert [c for _, c in sorted(got)] == chosen
    # the first three picks cover all three clusters
    assert {c % 3 for c in chosen[:3]} == {0, 1, 2}


def test_silhouette_brute_force_pairwise(spark):
    """silhouette_cosine vs the literal O(n^2) pairwise Rousseeuw 1987
    definition in numpy over the SAME int8 quantized codes — proving
    the linearity collapse (mean cosine dissim vs a label = affine in
    the label's code-sum) gives bit-identical a(i), b(i), s(i).
    Includes a singleton cluster to pin the s=0 convention."""
    import numpy as np
    import pandas as pd

    from mpds_spark.operators.similarity import silhouette_cosine

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        lab = ["a", "b", "c"][i % 3]
        base = {"a": [8.0, 0, 0], "b": [0, 8.0, 0], "c": [0, 0, 8.0]}[lab]
        v = np.array(base) + rng.normal(0, 1.0, size=3)
        rows.append((i, lab, [float(x) for x in v]))
    rows.append((99, "solo", [1.0, 1.0, 1.0]))  # singleton cluster
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    got = {
        r["vec_id"]: (r["a_intra"], r["b_inter"], r["silhouette"])
        for r in silhouette_cosine(spark.createDataFrame(pdf)).collect()
    }
    V = np.array([r[2] for r in rows])
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    q = np.floor(np.abs(127.0 * n) + 0.5) * np.sign(n)
    K = 127 * 127
    labs = [r[1] for r in rows]
    ids = [r[0] for r in rows]
    qi = q.astype(np.int64)
    for i in range(len(rows)):
        mine = [j for j in range(len(rows)) if labs[j] == labs[i] and j != i]
        if mine:
            # pairwise-sum in exact ints, ONE division (definitional
            # mean == (nK - sum of dots)/(nK) by linearity)
            s = sum(int(qi[i] @ qi[j]) for j in mine)
            a = (len(mine) * K - s) / (len(mine) * K)
        else:
            a = None
        b = min(
            (len(js) * K - sum(int(qi[i] @ qi[j]) for j in js))
            / (len(js) * K)
            for lab in set(labs) if lab != labs[i]
            for js in [[j for j in range(len(rows)) if labs[j] == lab]]
        )
        ga, gb, gs = got[ids[i]]
        assert gb == b, (ids[i], gb, b)
        if a is None:
            assert ga is None and gs == 0.0
        else:
            assert ga == a and gs == (b - a) / max(a, b)


def test_degree_assortativity_rebuild(spark):
    """Assortativity vs an exact-integer python rebuild over the same
    canonical edge set (sf0.001 co-order part graph), plus planted
    star (r = -1 is NaN-free only with degree variance: a pure star
    has constant excess degrees — we assert the formula value) and
    planted regular-pair sanity."""
    import duckdb
    import math

    from mpds_spark.queries import q_degree_assortativity

    r = q_degree_assortativity(spark, "/root/testdata/sf0.001").collect()[0]
    edges = duckdb.sql(
        "WITH op AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM"
        " '/root/testdata/sf0.001/lineitem.parquet' WHERE l_partkey % 4 = 0)"
        " SELECT DISTINCT a.pk, b.pk FROM op a JOIN op b"
        " ON a.ok = b.ok AND a.pk < b.pk").fetchall()
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    M = sx = sxy = sxx = 0
    for a, b in edges:
        for x, y in ((deg[a], deg[b]), (deg[b], deg[a])):
            M += 1
            sx += x
            sxy += x * y
            sxx += x * x
    num = float(M) * float(sxy) - float(sx) * float(sx)
    den = math.sqrt(float(M) * float(sxx) - float(sx) * float(sx))
    assert r["n_nodes"] == len(deg) and r["n_edges"] == len(edges)
    assert r["assortativity"] == num / (den * den)
