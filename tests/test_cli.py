"""CLI flag-wiring smoke: every documented subcommand flag must parse and
land on the expected namespace attribute — the class of regression where
a pipeline grows a knob the CLI silently cannot set (ADVICE r3:
--min-hits was missing from `prepare`)."""

from mpds_spark.runner.submit import _parse_splits, build_parser


def test_prepare_flags_reach_namespace():
    p = build_parser()
    a = p.parse_args(
        [
            "prepare", "--input", "documents", "--eval-input", "documents",
            "--output", "/tmp/x", "--budget", "123", "--min-words", "5",
            "--decontam-n", "4", "--min-hits", "2", "--threshold", "0.6",
            "--pack-length", "64", "--shard-rows", "1000",
            "--temperature-alpha", "0.5",
            "--splits", "train=0.9,val=0.1", "--redact",
        ]
    )
    assert (a.budget, a.min_words, a.decontam_n, a.min_hits) == (123, 5, 4, 2)
    assert (a.pack_length, a.shard_rows, a.temperature_alpha) == (64, 1000, 0.5)
    assert a.redact and a.splits == "train=0.9,val=0.1"
    assert _parse_splits(a.splits) == {"train": 0.9, "val": 0.1}
    assert _parse_splits(None) is None


def test_dedup_flags_reach_namespace():
    a = build_parser().parse_args(
        [
            "dedup", "--input", "documents", "--output", "/tmp/y",
            "--pair-method", "simhash", "--max-hamming", "2",
            "--threshold", "0.7", "--max-df", "500",
        ]
    )
    assert a.pair_method == "simhash" and a.max_hamming == 2
    assert a.threshold == 0.7 and a.max_df == 500


def test_unknown_pair_method_rejected():
    import pytest

    with pytest.raises(SystemExit):
        build_parser().parse_args(
            ["dedup", "--input", "x", "--output", "y", "--pair-method", "nope"]
        )
