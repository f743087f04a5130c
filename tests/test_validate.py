"""validate(): one-pass expectation suite — violation counts, NULL
predicates counting as violations, uniqueness via distinct counting."""

from mpds_spark.operators.validate import (
    in_range,
    is_in,
    matches,
    not_null,
    unique,
    validate,
)


def test_validate_counts_and_verdicts(spark):
    rows = [
        (1, "ok", 10, "en"),
        (2, None, 5, "en"),        # null text
        (3, "ok", -1, "xx"),       # range + lang violations
        (3, "dup", 7, "de"),       # duplicate doc_id
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n", "lang"])
    out = {
        r["rule"]: r
        for r in validate(
            df,
            [
                not_null("text"),
                unique("doc_id"),
                in_range("n", 0, 100),
                is_in("lang", ["en", "de"]),
                matches("text", "^o"),
            ],
        ).collect()
    }
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["not_null(text)"]["n_violations"] == 1
    assert out["unique(doc_id)"]["n_violations"] == 1
    assert out["in_range(n,0,100)"]["n_violations"] == 1
    assert out["is_in(lang)"]["n_violations"] == 1
    # NULL text -> matches() is NULL -> counted as violation; 'dup' fails too
    assert out["matches(text)"]["n_violations"] == 2
    assert not out["not_null(text)"]["passes"]
    clean = validate(
        df.filter("doc_id = 1"), [not_null("text"), unique("doc_id")]
    ).collect()
    assert all(r["passes"] for r in clean)


def test_unique_prefix_named_predicate_stays_predicate(spark):
    """ADVICE r3: rule dispatch is structural (Rule.kind), not display-name
    prefix — a caller-supplied predicate whose name starts with 'unique('
    must be counted as a predicate, not fed to count_distinct."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    rows = {
        r["rule"]: r
        for r in validate(
            df, [("unique(k) lookalike", F.col("k") == 1), unique("k")]
        ).collect()
    }
    look = rows["unique(k) lookalike"]
    assert look["n_violations"] == 0 and look["passes"]  # both rows satisfy k==1
    real = rows["unique(k)"]
    assert real["n_violations"] == 1 and not real["passes"]  # k=1 twice
