"""End-to-end training-corpus preparation: quality filter → corpus dedup
→ benchmark decontamination → per-source token budget, as ONE resumable
pipeline over the stage-manifest machinery of pipelines/dedup_corpus.

This is the assembly line a 100-TB pre-training run actually executes,
composed exclusively from operators whose semantics are individually
driver-gated (gopher_quality / dedup_exact / near_dup_verified /
near_dup_components / decontaminate / sample_token_budget catalog
queries). Reference scope: beyond-reference training-data tier mandated
by the build brief — the reference itself has no corpus stage.

Stage layout under out_dir (parquet + atomic manifest per stage; a kill
between stages leaves a resumable prefix; every spec string embeds its
own params plus the upstream spec, so changing a knob invalidates exactly
that stage and downstream):

  01_quality/   Gopher-rule verdicts; only `passes` docs continue.
  02_dedup/     the 4-stage dedup_corpus pipeline (its own per-stage —
                and, for exact dedup, per-BUCKET — manifests nest here).
  03_decontam/  n-gram overlap vs the eval/benchmark set; docs with
                >= min_hits shared shingles are dropped.
  04_budget/    deterministic per-source token-budget sample of the
                survivors (bucketed two-pass running sum).
  05_pack/      (optional, pack_length=L) concat-and-chunk the selected
                docs' whitespace tokens into length-L training rows with
                segment maps — the pipeline then ends in actual training
                rows, not just a doc list.
  06_shards/    (optional, shard_rows=N with pack_length) export the
                packed rows as range-ordered, row-bounded shards with the
                _SHARDS.json manifest (sources/io.write_training_shards)
                — the artifact a dataloader consumes.

The returned funnel (rows surviving each stage) is the audit trail:
at 100 TB you read the funnel before you trust the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpds_spark.pipelines.dedup_corpus import _run_stage, dedup_corpus


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_df: DataFrame,
    out_dir: str,
    text: str = "text",
    key: str = "doc_id",
    budget: int = 10**6,
    group: str = "source",
    pack_length: int | None = None,
    shard_rows: int | None = None,
    min_words: int = 8,
    decontam_n: int = 3,
    min_hits: int = 1,
    dedup_threshold: float = 0.5,
    stop_after: int | None = None,
) -> dict:
    """Run (or resume) the 4-stage corpus preparation under out_dir.

    stop_after: finish stage k then return (kill/resume test hook).
    Returns {"selected": DataFrame | None, "stages": {...},
    "funnel": {stage: surviving rows}} — selected carries
    (key, group, n_tok, cum_tok) for the final mixture.
    """
    import os

    from mpds_spark.operators.sampling import sample_token_budget
    from mpds_spark.operators.text import decontaminate, gopher_quality_filter

    stages: dict = {}
    funnel: dict = {"00_input": docs.count()}
    agg = docs.agg(
        F.sum(
            F.crc32(F.concat_ws("|", F.col(key).cast("string"), F.md5(text)))
        ).alias("h")
    ).collect()[0]
    eagg = eval_df.agg(F.sum(F.crc32(F.md5(text))).alias("h")).collect()[0]
    fingerprint = f"{funnel['00_input']}_{agg['h']}_{eagg['h']}"

    # ---- stage 1: quality verdicts (pure map stage; materialized so the
    # funnel is auditable and downstream lineage starts at a scan)
    spec1 = f"quality|min_words={min_words}"
    quality = _run_stage(
        spark,
        out_dir,
        "01_quality",
        fingerprint,
        spec1,
        lambda: gopher_quality_filter(docs, text=text, key=key, min_words=min_words),
        stages,
    )
    passing = docs.join(
        quality.filter(F.col("passes")).select(key), key, "left_semi"
    )
    funnel["01_quality"] = passing.count()
    if stop_after == 1:
        return {"selected": None, "stages": stages, "funnel": funnel}

    # ---- stage 2: nested resumable dedup (exact + near-dup + CC)
    res2 = dedup_corpus(
        spark,
        passing,
        os.path.join(out_dir, "02_dedup"),
        text=text,
        key=key,
        threshold=dedup_threshold,
    )
    stages["02_dedup"] = res2["stages"]
    kept = passing.join(
        res2["keep"].filter(F.col("keep")).select(key), key, "left_semi"
    )
    funnel["02_dedup"] = kept.count()
    if stop_after == 2:
        return {"selected": None, "stages": stages, "funnel": funnel}

    # ---- stage 3: decontamination vs the eval set
    spec3 = f"{spec1}>dedup|t={dedup_threshold}>decontam|n={decontam_n}|h={min_hits}"
    verdicts = _run_stage(
        spark,
        out_dir,
        "03_decontam",
        fingerprint,
        spec3,
        lambda: decontaminate(
            kept, eval_df, text=text, key=key, n=decontam_n, min_hits=min_hits
        ),
        stages,
    )
    clean = kept.join(
        verdicts.filter(~F.col("contaminated")).select(key), key, "left_semi"
    )
    funnel["03_decontam"] = clean.count()
    if stop_after == 3:
        return {"selected": None, "stages": stages, "funnel": funnel}

    # ---- stage 4: per-source token budget over the survivors
    spec4 = f"{spec3}>budget|{budget}|{group}"
    selected = _run_stage(
        spark,
        out_dir,
        "04_budget",
        fingerprint,
        spec4,
        lambda: sample_token_budget(
            clean,
            budget=budget,
            group=group,
            key=key,
            text=text,
            strategy="bucketed",
        ),
        stages,
    )
    funnel["04_budget"] = selected.count()
    if pack_length is None or stop_after == 4:
        return {"selected": selected, "stages": stages, "funnel": funnel}

    # ---- stage 5 (optional): pack the selection into training rows
    from pyspark.sql import functions as _F

    from mpds_spark.operators.sampling import pack_sequences

    spec5 = f"{spec4}>pack|{pack_length}"
    sel_docs = docs.join(selected.select(key), key, "left_semi").select(
        F.col(key), _F.split(_F.trim(text), r"\s+").alias("tokens")
    )
    packed = _run_stage(
        spark,
        out_dir,
        "05_pack",
        fingerprint,
        spec5,
        lambda: pack_sequences(sel_docs, length=pack_length, strategy="bucketed"),
        stages,
    )
    funnel["05_pack"] = packed.count()
    result = {
        "selected": selected,
        "packed": packed,
        "stages": stages,
        "funnel": funnel,
    }
    if shard_rows is None:
        return result

    # ---- stage 6 (optional): ordered shard export; the shard manifest
    # itself is the completion marker
    import json as _json

    from mpds_spark.sources.io import write_training_shards

    shard_dir = os.path.join(out_dir, "06_shards")
    mpath = os.path.join(shard_dir, "_SHARDS.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = _json.load(fh)
        stages["06_shards"] = "skipped"
    else:
        manifest = write_training_shards(
            packed, shard_dir, rows_per_shard=shard_rows
        )
        stages["06_shards"] = "ran"
    funnel["06_shards"] = manifest["total_rows"]
    result["shards"] = manifest
    return result
