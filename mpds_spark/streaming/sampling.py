"""Streaming token-budget admission: the stream twin of
operators/sampling.sample_token_budget.

State = ONE long per group (running token total of every doc seen so far,
admitted or not). Each micro-batch is processed in the same deterministic
md5(group|doc_id) content-hash order as the batch operator, so the admitted
set over the whole stream equals the batch operator applied to the
concatenation of the micro-batches (per-batch hash order, batches in
arrival order) — for a single micro-batch the two are identical, which the
equivalence test pins.

Budget semantics are the batch twin's greedy PREFIX rule: a doc is admitted
iff the running total of ALL preceding docs plus itself is <= budget; once
the total crosses the budget the group's stream is closed (skipped docs
still advance the total). That makes admission a pure function of the
arrival history — replaying the stream yields byte-identical decisions,
which is what a resumable ingestion job needs.

Scale: one 8-byte state value per group (RocksDB-safe at any group
cardinality); per-batch work is a vectorized pandas sort + cumsum, no
per-row Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

IN_SCHEMA = "doc_id long, source string, n_tok long"

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tok", LongType()),
        StructField("cum_tok", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen_tok", LongType())])


def _admit_core(source: str, batch: pd.DataFrame, seen: int, budget: int):
    """Vectorized admission kernel. Returns (admitted_pdf, new_seen).
    Uses a precomputed "__h" hash column when present (the operator adds
    it JVM-side — no per-row Python hashing); falls back to hashlib for
    direct kernel calls in tests."""
    if "__h" not in batch.columns:
        batch = batch.assign(
            __h=[
                hashlib.md5(f"{source}|{d}".encode()).hexdigest()
                for d in batch["doc_id"]
            ]
        )
    b = batch.sort_values(["__h", "doc_id"], kind="mergesort")
    cum = seen + b["n_tok"].cumsum()
    out = pd.DataFrame(
        {
            "doc_id": b.loc[cum <= budget, "doc_id"].to_numpy(),
            "source": source,
            "n_tok": b.loc[cum <= budget, "n_tok"].to_numpy(),
            "cum_tok": cum[cum <= budget].to_numpy(),
        }
    )
    return out, seen + int(b["n_tok"].sum())


def streaming_token_budget(docs, budget: int):
    """Admit (doc_id, source, n_tok) rows per source until the source's
    running token total exceeds `budget` (IN_SCHEMA in, OUT_SCHEMA out;
    compute n_tok upstream JVM-side, e.g. F.size(words_col(text))).
    Streaming-only (applyInPandasWithState); the batch twin is
    operators/sampling.sample_token_budget."""

    from pyspark.sql import functions as F

    def admit(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        seen = state.get[0] if state.exists else 0
        out, new_seen = _admit_core(source, batch, seen, budget)
        state.update((new_seen,))
        yield out

    docs = docs.withColumn(
        "__h", F.md5(F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string")))
    )
    return docs.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
