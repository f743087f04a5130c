"""Custom stateful streaming operator: as-of enrichment via
applyInPandasWithState.

The engine's batch as-of join (operators/asof.py) answers "latest reference
row at or before each observation". The streaming analogue keeps ONE state
row per entity — the latest reference seen so far — and enriches each
observation micro-batch against it: a streaming point-in-time join with
O(1) state per entity (vs buffering either stream).

Semantics contract: within a micro-batch, rows are processed in event-time
order (references visible to same-timestamp observations, matching the
batch join's allow_exact_matches=True). ACROSS micro-batches the state only
moves forward, so exact batch equivalence holds when per-entity arrival
order respects event time (the usual log-shipping case). Late references
are applied from their arrival point onward — the standard streaming
trade-off; bound it upstream with a watermark + reorder buffer if needed.

Scale: state is one (ts, value) pair per entity (tiny, RocksDB/HDFS state
store safe at 10^8 entities); the per-batch work is a vectorized pandas
ffill, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# input rows: interleaved reference + observation events of one entity
EVENT_SCHEMA = "entity_id string, ts double, kind string, value double"

OUT_SCHEMA = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("ts", DoubleType()),
        StructField("value", DoubleType()),
        StructField("ref_val", DoubleType()),
        StructField("ref_ts", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("ref_ts", DoubleType()), StructField("ref_val", DoubleType())]
)


def _enrich_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (entity,) = key
    ref_ts, ref_val = state.get if state.exists else (None, None)
    batch = pd.concat(list(pdfs), ignore_index=True)
    # event-time order; references sort BEFORE observations at equal ts so
    # an obs at t sees a ref at t (allow_exact_matches=True parity)
    batch = batch.sort_values(
        ["ts", "kind"],
        key=lambda s: s.map({"ref": 0, "obs": 1}) if s.name == "kind" else s,
        kind="mergesort",
    )
    is_ref = (batch["kind"] == "ref").to_numpy()
    # carried-state ffill: reference columns, forward-filled from the prior
    # micro-batches' state
    r_ts = batch["ts"].where(is_ref).ffill()
    r_val = batch["value"].where(is_ref).ffill()
    if ref_ts is not None:
        r_ts = r_ts.fillna(ref_ts)
        r_val = r_val.fillna(ref_val)
    obs = ~is_ref
    out = pd.DataFrame(
        {
            "entity_id": entity,
            "ts": batch.loc[obs, "ts"].to_numpy(),
            "value": batch.loc[obs, "value"].to_numpy(),
            "ref_val": r_val[obs].to_numpy(),
            "ref_ts": r_ts[obs].to_numpy(),
        }
    )
    if is_ref.any():
        last = batch[is_ref].iloc[-1]
        state.update((float(last["ts"]), float(last["value"])))
    elif state.exists:
        state.update((ref_ts, ref_val))
    yield out


def streaming_asof_enrich(events):
    """Streaming point-in-time enrichment: for every kind='obs' row emit
    (entity_id, ts, value, ref_val, ref_ts) where (ref_ts, ref_val) is the
    latest kind='ref' row of the same entity at or before ts (seen so far).
    Input: a STREAMING DataFrame of EVENT_SCHEMA (applyInPandasWithState is
    streaming-only; the batch twin is operators/asof.asof_join, which the
    equivalence test pins this operator against)."""
    return events.groupBy("entity_id").applyInPandasWithState(
        _enrich_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
