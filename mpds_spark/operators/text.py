"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting. All JVM-side
column expressions (no Python), each with a DuckDB oracle twin in
mpds_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpds_spark.operators.dedup import shingles, words_col

# tiny deterministic marker lists (function-word heuristic). The synthetic
# corpus is English-ish for every lang label, so this measures the OPERATOR
# (deterministic scoring + argmax), not linguistic accuracy.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "una"],
}


def lang_id(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic: argmax of per-lang marker counts,
    ties and zero-hits -> 'und' (undetermined)."""
    w = words_col(text)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.size(
                F.expr(f"filter(split(trim(text), '\\\\s+'), x -> x in ({lst}))")
            ).alias(f"n_{lang}")
        )
    d = df.select(F.col(key), F.size(w).alias("n_words"), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"n_{lg}") for lg in langs])
    pred = F.lit("und")
    # reverse order => earlier langs win ties (deterministic argmax)
    for lg in reversed(langs):
        pred = F.when((F.col(f"n_{lg}") == best) & (best > 0), lg).otherwise(pred)
    return d.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / repetition heuristics."""
    w = words_col(text)
    n_words = F.size(w)
    n_chars = F.length(text)
    n_distinct = F.size(F.array_distinct(w))
    stop = F.size(
        F.expr(
            r"filter(split(trim(text), '\\s+'), "
            "x -> x in ('the','a','of','and','to','in','is','for'))"
        )
    )
    return df.select(
        F.col(key),
        n_words.alias("n_words"),
        (n_chars / n_words).alias("avg_word_len"),
        (stop / n_words).alias("stopword_ratio"),
        (n_distinct / n_words).alias("distinct_ratio"),
    )


def token_count(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Whitespace word count + a BPE-ish subword estimate (ceil(chars/4) —
    the usual ~4-chars-per-token rule of thumb, deterministic)."""
    return df.select(
        F.col(key),
        F.size(words_col(text)).alias("n_words"),
        F.ceil(F.length(text) / 4.0).cast("long").alias("n_tokens_est"),
    )


def doc_fingerprint(
    df: DataFrame, text: str = "text", key: str = "doc_id", n: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: min/max md5 over word n-gram shingles +
    shingle count. Two docs sharing fp_min very likely share a passage."""
    sh = shingles(df, text, n)
    return sh.groupBy(key).agg(
        F.min(F.md5("shingle")).alias("fp_min"),
        F.max(F.md5("shingle")).alias("fp_max"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
