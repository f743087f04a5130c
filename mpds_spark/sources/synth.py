"""Deterministic synthesizer for the engine's primary input table.

Schema (BASELINE.json input_hint / FIXTURES.md F1):
    doc_id: string, tokens: array<int32>, n_tok: int32, source: string
plus the deterministically *derived* keys the temporal operators use:
    entity_id: string  — hash bucket of the doc counter (≈ patient id)
    ts:        double  — per-entity monotone event time, irregular gaps (secs)

Every field is a closed-form function of the doc counter `i` and the seed, so
test oracles can recompute any row without seeing the engine's output, and
the table is identical no matter how Spark partitions the generation range.

Skew fixture: entity 0 is "hot" — a configurable fraction of all docs lands
on it (default ~20x a normal entity) to exercise AQE skew handling and the
salted group path.

Scale note: generation is `spark.range(n) → mapInPandas`, i.e. fully
distributed and O(n/partitions) memory; nothing is collected on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257
SOURCES = np.array(["web", "clinic", "sensor", "synthetic"])

SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "entity_id string, ts double"
)


def _mix(i: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """splitmix64-style deterministic hash of the doc counter (vectorized)."""
    key = (seed * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = (i.astype(np.uint64) + np.uint64(key)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def derive_fields(i: np.ndarray, seed: int, n_entities: int, hot_frac: float):
    """Closed-form (entity_bucket, seq_no, ts, n_tok, source) for doc counters i.

    Used by both the Spark generator and the pure-numpy test oracles.
    """
    h_ent = _mix(i, seed, 1)
    h_len = _mix(i, seed, 2)
    h_gap = _mix(i, seed, 3)
    h_src = _mix(i, seed, 4)

    # entity: hot_frac of docs → entity 0, rest uniform over [0, n_entities)
    is_hot = (h_ent % np.uint64(10_000)).astype(np.int64) < int(hot_frac * 10_000)
    bucket = (h_ent % np.uint64(n_entities)).astype(np.int64)
    bucket = np.where(is_hot, 0, bucket)

    # event time grows with the doc counter with per-doc jitter < step, so
    # within any entity ts is strictly monotone in i and globally unique.
    base = i.astype(np.float64) * 7.0
    jitter = (h_gap % np.uint64(6_000)).astype(np.float64) / 1_000.0  # [0, 6)
    ts = base + jitter

    # lengths: log-uniform-ish 8..4096
    u = (h_len % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
    n_tok = np.floor(8.0 * np.exp(u * np.log(4096.0 / 8.0))).astype(np.int32)

    src_idx = (h_src % np.uint64(len(SOURCES))).astype(np.int64)
    return bucket, ts, n_tok, src_idx


def tokens_for(i: int, n_tok: int, seed: int) -> np.ndarray:
    """Deterministic token payload for doc counter i (oracle-recomputable)."""
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    return rng.integers(0, VOCAB, size=int(n_tok), dtype=np.int32)


def synth_sequences(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_entities: int = 200,
    hot_frac: float = 0.02,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of the tokenized-sequence table."""
    if num_partitions is None:
        num_partitions = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)

    def gen(batches):
        # Arrow-native: the token payload is emitted as ONE flat int32
        # buffer + offsets (ListArray) instead of a pandas object column —
        # the per-element list->Arrow conversion was most of the stage.
        import pyarrow as pa

        for batch in batches:
            i = batch.column(0).to_numpy(zero_copy_only=False)
            bucket, ts, n_tok, src_idx = derive_fields(i, seed, n_entities, hot_frac)
            toks = [tokens_for(int(ii), int(nt), seed) for ii, nt in zip(i, n_tok)]
            offsets = np.zeros(len(toks) + 1, dtype=np.int64)
            np.cumsum(n_tok.astype(np.int64), out=offsets[1:])
            tokens_arr = pa.LargeListArray.from_arrays(
                pa.array(offsets),
                pa.array(
                    np.concatenate(toks) if toks else np.empty(0, np.int32)
                ),
            ).cast(pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.char.add("doc_", np.char.zfill(i.astype("U12"), 10))
                    ),
                    tokens_arr,
                    pa.array(n_tok),
                    pa.array(SOURCES[src_idx]),
                    pa.array(
                        np.char.add("ent_", np.char.zfill(bucket.astype("U8"), 5))
                    ),
                    pa.array(ts),
                ],
                names=["doc_id", "tokens", "n_tok", "source", "entity_id", "ts"],
            )

    df = spark.range(0, n_docs, numPartitions=num_partitions).mapInArrow(gen, SCHEMA)
    return df
