"""End-to-end corpus dedup: exact dedup → near-dup pairs → star connected
components → keep list, as ONE composable, RESUMABLE pipeline — the
operator a 100-TB user actually calls (VERDICT r2 #7).

Reference scope: the reference has no corpus-dedup stage (it is a
feature-engineering library); this is part of the beyond-reference
training-data tier mandated by the build brief, composed from the dedup
operators whose semantics are individually driver-gated
(dedup_exact / near_dup_verified / near_dup_components catalog queries).

Stage layout under out_dir (each stage = parquet + manifest, committed
atomically AFTER the data is fully written — a kill between stages leaves
a resumable prefix):

  01_exact/       exact-dedup groups, bucket-at-a-time via
                  runner.checkpoint.run_partitioned with bucket =
                  pmod(crc32(md5(text)), n_buckets): identical texts land
                  in ONE bucket, so within-bucket groupBy(md5(text)) is
                  globally correct, and each bucket resumes independently
                  (per-PARTITION lineage).
  02_pairs/       near-dup pairs over the exact REPRESENTATIVES (MinHash
                  LSH candidates → exact-Jaccard verify — the two-tier
                  scale shape; exact dups are already collapsed, which is
                  what keeps LSH buckets bounded).
  03_components/  diameter-free star CC over the pair edges.
  04_keep/        per-doc verdict: (doc_id, text_hash, exact_rep,
                  component, keep). keep-smallest everywhere: a doc
                  survives iff it IS its exact group's min doc_id AND that
                  representative IS its near-dup component's min.

Resume: every manifest records (input_fingerprint, spec_hash); a completed
stage with matching fingerprints is READ BACK instead of recomputed.
Changing the input invalidates everything; changing a stage parameter
invalidates that stage and everything downstream (each stage's spec string
embeds its own params plus the upstream spec).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpds_spark.operators.util import release_scratch
from mpds_spark.runner.checkpoint import (
    _spec_hash,
    read_output,
    run_partitioned,
)


def _manifest(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage, "_STAGE_MANIFEST.json")


def _stage_done(out_dir: str, stage: str, fingerprint: str, spec_hash: str) -> bool:
    m = _manifest(out_dir, stage)
    if not os.path.exists(m):
        return False
    with open(m) as fh:
        row = json.load(fh)
    return (
        row.get("status") == "done"
        and row.get("input_fingerprint") == fingerprint
        and row.get("spec_hash") == spec_hash
    )


def _commit_stage(
    out_dir: str, stage: str, fingerprint: str, spec_hash: str, rows: int, t0: float
) -> None:
    manifest = {
        "stage": stage,
        "status": "done",
        "rows_out": rows,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "input_fingerprint": fingerprint,
        "spec_hash": spec_hash,
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    tmp = _manifest(out_dir, stage) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest(out_dir, stage))  # atomic commit


def _run_stage(
    spark: SparkSession,
    out_dir: str,
    stage: str,
    fingerprint: str,
    spec: str,
    build,
    stages: dict,
) -> DataFrame:
    """Build-or-read-back one stage; parquet is the stage boundary (also the
    lineage truncation point — downstream plans start from the scan, so no
    stage's plan grows with upstream complexity)."""
    sh = _spec_hash(spec)
    data = os.path.join(out_dir, stage, "data")
    if _stage_done(out_dir, stage, fingerprint, sh):
        stages[stage] = "skipped"
        return spark.read.parquet(data)
    t0 = time.perf_counter()
    os.makedirs(os.path.join(out_dir, stage), exist_ok=True)
    df = build()
    df.write.mode("overwrite").parquet(data)
    release_scratch()  # free operator-internal persisted/checkpointed frames
    rows = spark.read.parquet(data).count()
    _commit_stage(out_dir, stage, fingerprint, sh, rows, t0)
    stages[stage] = "ran"
    return spark.read.parquet(data)


def dedup_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    text: str = "text",
    key: str = "doc_id",
    n_buckets: int = 8,
    minhash_k: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    pair_method: str = "minhash",
    max_hamming: int = 3,
    winnow_w: int = 4,
    min_shared: int = 2,
    stop_after: int | None = None,
) -> dict:
    """Run (or resume) the 4-stage corpus dedup under out_dir.

    pair_method: "minhash" (MinHash+LSH bands -> exact-Jaccard verify,
    threshold/k/band_size/shingle_n apply), "simhash" (64-bit SimHash,
    pigeonhole Hamming bands -> popcount verify, max_hamming applies), or
    "winnow" (passage-level shared winnowing fingerprints — Schleimer et
    al. 2003; shingle_n/winnow_w/min_shared/max_df apply) — the three
    near-dup backends the engine ships; the spec string embeds the choice
    so switching invalidates exactly stages 2-4.

    stop_after: finish stage k then return (test hook for kill/resume —
    the same partial state a real failure leaves behind).

    Returns {"keep": DataFrame | None, "stages": {stage: "ran"|"skipped"}}
    — keep is None when stop_after cut the run short.
    """
    from mpds_spark.operators.dedup import (
        connected_components_star,
        near_dup_pairs,
        simhash_near_dups,
    )

    stages: dict = {}
    # input fingerprint: count + content hash-sum over (key, text) — cheap,
    # deterministic, order-independent
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws("|", F.col(key).cast("string"), F.md5(text)))).alias("h"),
    ).collect()[0]
    fingerprint = f"{agg['n']}_{agg['h']}"

    # ---- stage 1: exact dedup, per-bucket lineage (resumes per PARTITION)
    spec1 = f"exact|{n_buckets}"
    d1 = os.path.join(out_dir, "01_exact")
    tagged = docs.withColumn("__th", F.md5(text))
    res1 = run_partitioned(
        spark,
        tagged,
        lambda part: part.groupBy(F.col("__th").alias("text_hash")).agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(key).alias("keep_doc_id"),
        ),
        d1,
        entity="__th",
        n_buckets=n_buckets,
        spec=spec1,
        input_fingerprint=fingerprint,
    )
    if res1["failed"]:
        raise RuntimeError(f"exact-dedup buckets failed: {res1['failed']}")
    stages["01_exact"] = (
        "skipped" if not res1["processed"] else f"ran {len(res1['processed'])}/{n_buckets} buckets"
    )
    exact = read_output(spark, d1).drop("bucket")
    if stop_after == 1:
        return {"keep": None, "stages": stages}

    # ---- stage 2: near-dup pairs over representatives (two-tier
    # candidates -> verify; backend per pair_method)
    rep_docs = docs.join(
        exact.select(F.col("keep_doc_id").alias(key)), key, "left_semi"
    )
    if pair_method == "minhash":
        spec2 = (
            f"{spec1}>pairs|k={minhash_k}|b={band_size}"
            f"|n={shingle_n}|t={threshold}|df={max_df}"
        )
        build_pairs = lambda: near_dup_pairs(  # noqa: E731
            rep_docs,
            text=text,
            key=key,
            k=minhash_k,
            band_size=band_size,
            n=shingle_n,
            threshold=threshold,
            max_df=max_df,
        )
    elif pair_method == "simhash":
        spec2 = f"{spec1}>pairs|simhash|h={max_hamming}"
        build_pairs = lambda: simhash_near_dups(  # noqa: E731
            rep_docs, text=text, key=key, max_hamming=max_hamming
        ).select("doc_a", "doc_b")
    elif pair_method == "winnow":
        # passage-level backend (VERDICT r4 ask #7): winnowing
        # fingerprints catch a copied >=winnow_w+shingle_n-1-word block
        # inside otherwise distinct documents — the case whole-doc
        # MinHash dilutes away. max_df guards boilerplate fingerprints
        # exactly like the shingle guard.
        from mpds_spark.operators.text import winnow_near_dups

        spec2 = (
            f"{spec1}>pairs|winnow|n={shingle_n}|w={winnow_w}"
            f"|s={min_shared}|df={max_df}"
        )
        build_pairs = lambda: winnow_near_dups(  # noqa: E731
            rep_docs,
            text=text,
            key=key,
            n=shingle_n,
            w=winnow_w,
            min_shared=min_shared,
            max_df=max_df,
        ).select("doc_a", "doc_b")
    else:
        raise ValueError(f"unknown pair_method {pair_method!r}")
    pairs = _run_stage(
        spark, out_dir, "02_pairs", fingerprint, spec2, build_pairs, stages
    )
    if stop_after == 2:
        return {"keep": None, "stages": stages}

    # ---- stage 3: star CC (diameter-free) over the pair edges
    spec3 = f"{spec2}>starcc"
    comps = _run_stage(
        spark,
        out_dir,
        "03_components",
        fingerprint,
        spec3,
        lambda: connected_components_star(pairs, "doc_a", "doc_b"),
        stages,
    )
    if stop_after == 3:
        return {"keep": None, "stages": stages}

    # ---- stage 4: per-doc verdict
    spec4 = f"{spec3}>keep"

    def build_keep():
        d = docs.select(F.col(key), F.md5(text).alias("text_hash"))
        ex = exact.select(
            "text_hash", F.col("keep_doc_id").alias("exact_rep")
        )
        cp = comps.select(
            F.col("doc_id").alias("exact_rep"), "component"
        )
        out = (
            d.join(ex, "text_hash")
            .join(cp, "exact_rep", "left")
            .withColumn("component", F.coalesce("component", F.col("exact_rep")))
        )
        return out.select(
            F.col(key),
            "text_hash",
            "exact_rep",
            "component",
            (
                (F.col(key) == F.col("exact_rep"))
                & (F.col("exact_rep") == F.col("component"))
            ).alias("keep"),
        )

    keep = _run_stage(
        spark, out_dir, "04_keep", fingerprint, spec4, build_keep, stages
    )
    return {"keep": keep, "stages": stages}
