"""Streaming sequence packing: the stream twin of
operators/sampling.pack_sequences, per source shard.

State per source = the partial trailing bin (carry tokens + their segment
map) and the next bin counter. Each micro-batch is processed in the same
md5(doc_id) content-hash order as the batch packer, appended to the
carry, and every FULL length-L bin is emitted; the remainder waits in
state for the next batch (the standard streaming-packing property — the
tail bin ships only when later arrivals fill it; flush by stopping the
stream and packing the final carry in batch).

For a single micro-batch of one source, the emitted bins are exactly the
batch pack_sequences' full bins (equivalence-tested); across batches the
carry gives sequential concat-and-chunk semantics over the arrival order
of batches.

Scale: state is <= L tokens + one segment entry per carried doc, bounded
by construction; per-batch token work is numpy concatenation + slicing,
no per-token Python (segment bookkeeping is O(#docs per batch)).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IN_SCHEMA = "doc_id long, source string, tokens array<int>"

SEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("off", LongType()),
        StructField("len", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("bin_id", LongType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_segments", IntegerType()),
        StructField("segments", ArrayType(SEG_SCHEMA)),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("bin_next", LongType()),
        StructField("carry_tokens", ArrayType(IntegerType())),
        StructField("carry_docs", ArrayType(LongType())),
        StructField("carry_lens", ArrayType(LongType())),
    ]
)


def _pack_core(source: str, batch: pd.DataFrame, state, length: int):
    """Shared packing kernel. state = (bin_next, carry_tokens, carry_docs,
    carry_lens) or None. Returns (out_pdf, new_state)."""
    bin_next, c_toks, c_docs, c_lens = (
        state if state is not None else (0, [], [], [])
    )
    if "__h" not in batch.columns:
        # operator adds __h JVM-side; hashlib fallback for direct test use
        batch = batch.assign(
            __h=[hashlib.md5(str(d).encode()).hexdigest() for d in batch["doc_id"]]
        )
    b = batch.sort_values(["__h", "doc_id"], kind="mergesort")
    b = b[b["tokens"].map(len) > 0]
    toks = [np.asarray(c_toks, dtype=np.int32)] + [
        np.asarray(t, dtype=np.int32) for t in b["tokens"]
    ]
    stream = np.concatenate(toks) if toks else np.empty(0, np.int32)
    docs = list(c_docs) + list(b["doc_id"])
    lens = list(c_lens) + [len(t) for t in b["tokens"]]
    n_full = len(stream) // length
    rows = []
    # walk segments across bin boundaries (O(#docs + #bins), token copies
    # are numpy slices)
    seg_ends = np.cumsum([0] + lens)
    for i in range(n_full):
        lo, hi = i * length, (i + 1) * length
        first = int(np.searchsorted(seg_ends, lo, side="right")) - 1
        last = int(np.searchsorted(seg_ends, hi, side="left")) - 1
        segs = []
        for j in range(first, last + 1):
            s_lo, s_hi = max(int(seg_ends[j]), lo), min(int(seg_ends[j + 1]), hi)
            if s_hi > s_lo:
                segs.append((int(docs[j]), s_lo - lo, s_hi - s_lo))
        rows.append(
            {
                "source": source,
                "bin_id": int(bin_next + i),
                "tokens": stream[lo:hi].tolist(),
                "n_segments": len(segs),
                "segments": segs,
            }
        )
    rem_lo = n_full * length
    carry = stream[rem_lo:]
    first = int(np.searchsorted(seg_ends, rem_lo, side="right")) - 1
    nc_docs, nc_lens = [], []
    for j in range(max(first, 0), len(docs)):
        s_lo, s_hi = max(int(seg_ends[j]), rem_lo), int(seg_ends[j + 1])
        if s_hi > s_lo:
            nc_docs.append(int(docs[j]))
            nc_lens.append(s_hi - s_lo)
    out = pd.DataFrame(
        rows, columns=["source", "bin_id", "tokens", "n_segments", "segments"]
    )
    return out, (int(bin_next + n_full), carry.tolist(), nc_docs, nc_lens)


def streaming_pack(docs, length: int):
    """Pack (doc_id, source, tokens) rows into length-L training rows per
    source, carrying the partial trailing bin across micro-batches
    (IN_SCHEMA in, OUT_SCHEMA out; streaming-only — the batch twin is
    operators/sampling.pack_sequences)."""

    from pyspark.sql import functions as F

    def pack(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        carried = tuple(state.get) if state.exists else None
        out, new_state = _pack_core(source, batch, carried, length)
        state.update(new_state)
        yield out

    docs = docs.withColumn("__h", F.md5(F.col("doc_id").cast("string")))
    return docs.groupBy("source").applyInPandasWithState(
        pack,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
