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

  00_redact/    (optional, redact_patterns={kind: regex}) PII scrub of
                the text column (text.redact_pii) — every later stage,
                including packing, sees only redacted text.
  00b_boilerplate/
                (optional, boilerplate_seg_words=W) CCNet/RefinedWeb-style
                corpus-frequent segment removal (text.
                remove_boilerplate_segments): segments repeated across
                >= boilerplate_min_docs docs of a source are stripped
                BEFORE quality/dedup/budget see the text — so nav bars
                can't carry a junk page past the quality rules or anchor
                spurious near-dup candidates.
  01_quality/   Gopher-rule verdicts; only `passes` docs continue.
  02_dedup/     the 4-stage dedup_corpus pipeline (its own per-stage —
                and, for exact dedup, per-BUCKET — manifests nest here).
  03_decontam/  n-gram overlap vs the eval/benchmark set; docs with
                >= min_hits shared shingles are dropped.
  04_budget/    deterministic per-source token-budget sample of the
                survivors (bucketed two-pass running sum) — or, with
                temperature_alpha=a, the temperature-rebalanced mixture
                (budget_g ∝ tokens_g^a, Conneau & Lample 2019) filling
                `budget` TOTAL tokens across groups.
  05_split/     (optional, split_fractions={"train":.98,...}) deterministic
                train/val/test assignment by content hash (hash_split) —
                materialized so the per-split funnel is auditable.
  05_pack/ or 06_pack/<split>/
                (optional, pack_length=L) concat-and-chunk the selected
                docs' whitespace tokens into length-L training rows with
                segment maps — per SPLIT when splits are requested, so a
                val doc's tokens can never share a packed row with train
                tokens (the leakage-relevant property).
  06_shards/ or 07_shards/<split>/
                (optional, shard_rows=N with pack_length) export the
                packed rows as range-ordered, row-bounded shards with the
                _SHARDS.json manifest (sources/io.write_training_shards)
                — the artifact a dataloader consumes, one dir per split.

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
    dedup_pair_method: str = "minhash",
    temperature_alpha: float | None = None,
    split_fractions: dict | None = None,
    split_seed: str = "split",
    redact_patterns: dict | None = None,
    boilerplate_seg_words: int | None = None,
    boilerplate_min_docs: int = 2,
    stop_after: int | None = None,
) -> dict:
    """Run (or resume) the corpus preparation under out_dir.

    temperature_alpha: rebalance the mixture by group-size^alpha with
    `budget` as the TOTAL token budget (None = flat per-group budget).
    dedup_pair_method: near-dup backend for the nested dedup pipeline
    ("minhash" | "simhash"); embedded in the downstream spec so switching
    invalidates decontamination onward.
    split_fractions: {"train": 0.98, "val": 0.01, "test": 0.01} —
    deterministic hash split of the selection; packing and shards then run
    per split. stop_after: finish stage k then return (kill/resume test
    hook; 5 = after the split stage).
    Returns {"selected": DataFrame | None, "stages": {...},
    "funnel": {stage: surviving rows}} — selected carries
    (key, group, n_tok, cum_tok) for the final mixture; with splits also
    "splits" (key, split), and "packed"/"shards" become per-split dicts.
    """
    import os

    from mpds_spark.operators.sampling import (
        sample_token_budget,
        sample_tokens_temperature,
    )
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

    # ---- stage 0 (optional): PII redaction — every later stage, incl.
    # packing, sees only redacted text
    spec0 = "noredact"
    if redact_patterns is not None:
        import hashlib

        from mpds_spark.operators.text import redact_pii

        # spec embeds a digest of the FULL pattern dict (kinds AND regex
        # values) and chains into every downstream spec via spec1, so
        # enabling/disabling redaction or editing a regex under the same
        # kind invalidates 01_quality onward (r4 ADVICE: the old spec
        # keyed on pattern names only and did not chain, silently reusing
        # unredacted downstream outputs on resume).
        pat_digest = hashlib.sha256(
            "|".join(f"{k}={redact_patterns[k]}" for k in sorted(redact_patterns))
            .encode()
        ).hexdigest()[:16]
        spec0 = f"redact|{pat_digest}"
        other = [c for c in docs.columns if c != text]
        docs = _run_stage(
            spark,
            out_dir,
            "00_redact",
            fingerprint,
            spec0,
            lambda: docs.select(*other).join(
                redact_pii(docs, text=text, key=key, patterns=redact_patterns)
                .select(F.col(key), F.col(f"{text}_redacted").alias(text)),
                key,
            ),
            stages,
        )
        funnel["00_redact"] = docs.count()

    # ---- stage 0b (optional): corpus-frequent segment removal — quality,
    # dedup, decontamination and the budget all see boilerplate-free text
    specB = spec0
    if boilerplate_seg_words is not None:
        from mpds_spark.operators.text import remove_boilerplate_segments

        specB = (
            f"{spec0}>boilerplate|w={boilerplate_seg_words}"
            f"|d={boilerplate_min_docs}"
        )
        otherB = [c for c in docs.columns if c != text]
        _docsB = docs
        docs = _run_stage(
            spark,
            out_dir,
            "00b_boilerplate",
            fingerprint,
            specB,
            lambda: _docsB.select(*otherB).join(
                remove_boilerplate_segments(
                    _docsB,
                    text=text,
                    key=key,
                    group=group,
                    seg_words=boilerplate_seg_words,
                    min_docs=boilerplate_min_docs,
                ).select(F.col(key), F.col("text_clean").alias(text)),
                key,
            ),
            stages,
        )
        funnel["00b_boilerplate"] = docs.count()

    # ---- stage 1: quality verdicts (pure map stage; materialized so the
    # funnel is auditable and downstream lineage starts at a scan)
    spec1 = f"{specB}>quality|min_words={min_words}"
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
        pair_method=dedup_pair_method,
    )
    stages["02_dedup"] = res2["stages"]
    kept = passing.join(
        res2["keep"].filter(F.col("keep")).select(key), key, "left_semi"
    )
    funnel["02_dedup"] = kept.count()
    if stop_after == 2:
        return {"selected": None, "stages": stages, "funnel": funnel}

    # ---- stage 3: decontamination vs the eval set
    spec3 = (
        f"{spec1}>dedup|t={dedup_threshold}|m={dedup_pair_method}"
        f">decontam|n={decontam_n}|h={min_hits}"
    )
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

    # ---- stage 4: per-source token budget over the survivors (flat, or
    # temperature-rebalanced when alpha is given)
    if temperature_alpha is None:
        spec4 = f"{spec3}>budget|{budget}|{group}"
        build4 = lambda: sample_token_budget(  # noqa: E731
            clean,
            budget=budget,
            group=group,
            key=key,
            text=text,
            strategy="bucketed",
        )
    else:
        spec4 = f"{spec3}>tbudget|{budget}|a={temperature_alpha}|{group}"
        build4 = lambda: sample_tokens_temperature(  # noqa: E731
            clean,
            total_budget=budget,
            group=group,
            key=key,
            text=text,
            alpha=temperature_alpha,
            strategy="bucketed",
        )
    selected = _run_stage(
        spark, out_dir, "04_budget", fingerprint, spec4, build4, stages
    )
    funnel["04_budget"] = selected.count()
    if stop_after == 4:
        return {"selected": selected, "stages": stages, "funnel": funnel}

    result = {"selected": selected, "stages": stages, "funnel": funnel}

    # ---- stage 5 (optional): deterministic hash split of the selection
    splits = None
    if split_fractions is not None:
        from mpds_spark.operators.sampling import hash_split

        frac_spec = ",".join(
            f"{k}={split_fractions[k]}" for k in split_fractions
        )
        spec5s = f"{spec4}>split|{frac_spec}|seed={split_seed}"
        splits = _run_stage(
            spark,
            out_dir,
            "05_split",
            fingerprint,
            spec5s,
            lambda: hash_split(
                selected.select(key), split_fractions, key=key, seed=split_seed
            ),
            stages,
        )
        for sname in split_fractions:
            funnel[f"05_split/{sname}"] = splits.filter(
                F.col("split") == sname
            ).count()
        result["splits"] = splits
        if stop_after == 5:
            return result
    if pack_length is None:
        return result

    # ---- pack stage: concat-and-chunk into training rows — per split
    # when splits exist (tokens never cross a split boundary), else one
    # global stream
    from pyspark.sql import functions as _F

    from mpds_spark.operators.sampling import pack_sequences

    def _pack_one(keys_df, stage_name, spec):
        sel_docs = docs.join(keys_df, key, "left_semi").select(
            F.col(key), _F.split(_F.trim(text), r"\s+").alias("tokens")
        )
        return _run_stage(
            spark,
            out_dir,
            stage_name,
            fingerprint,
            spec,
            lambda: pack_sequences(
                sel_docs, length=pack_length, strategy="bucketed"
            ),
            stages,
        )

    import json as _json

    from mpds_spark.sources.io import write_training_shards

    def _shards_one(packed_df, shard_dir, stage_name):
        mpath = os.path.join(shard_dir, "_SHARDS.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                manifest = _json.load(fh)
            stages[stage_name] = "skipped"
        else:
            manifest = write_training_shards(
                packed_df, shard_dir, rows_per_shard=shard_rows
            )
            stages[stage_name] = "ran"
        return manifest

    if splits is None:
        packed = _pack_one(
            selected.select(key), "05_pack", f"{spec4}>pack|{pack_length}"
        )
        funnel["05_pack"] = packed.count()
        result["packed"] = packed
        if shard_rows is None:
            return result
        manifest = _shards_one(
            packed, os.path.join(out_dir, "06_shards"), "06_shards"
        )
        funnel["06_shards"] = manifest["total_rows"]
        result["shards"] = manifest
        return result

    packed_by_split: dict = {}
    shards_by_split: dict = {}
    for sname in split_fractions:
        keys_s = splits.filter(F.col("split") == sname).select(key)
        packed_s = _pack_one(
            keys_s,
            f"06_pack/{sname}",
            f"{spec5s}>pack|{pack_length}|{sname}",
        )
        funnel[f"06_pack/{sname}"] = packed_s.count()
        packed_by_split[sname] = packed_s
        if shard_rows is not None:
            manifest = _shards_one(
                packed_s,
                os.path.join(out_dir, "07_shards", sname),
                f"07_shards/{sname}",
            )
            funnel[f"07_shards/{sname}"] = manifest["total_rows"]
            shards_by_split[sname] = manifest
    result["packed"] = packed_by_split
    if shard_rows is not None:
        result["shards"] = shards_by_split
    return result
