"""Custom stateful streaming operator: as-of enrichment via
applyInPandasWithState.

The engine's batch as-of join (operators/asof.py) answers "latest reference
row at or before each observation". The streaming analogue keeps ONE state
row per entity — the latest reference seen so far — and enriches each
observation micro-batch against it: a streaming point-in-time join with
O(1) state per entity (vs buffering either stream).

Semantics contract: within a micro-batch, rows are processed in event-time
order (references visible to same-timestamp observations, matching the
batch join's allow_exact_matches=True), and the carried state participates
in that order as a synthetic reference row at its own event time — so a
LATE reference (event time older than the state) enriches only the
observations that precede the state in event time, and the state itself is
monotone in event time by construction. Exact batch equivalence holds when
per-entity arrival order respects event time (the usual log-shipping
case); under late data the standard streaming trade-off applies — a late
reference is visible only from its arrival batch onward, never
retroactively; bound it upstream with a watermark + reorder buffer.

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


def _enrich_core(entity, batch: pd.DataFrame, carried):
    """Shared event-time merge kernel (both stateful APIs delegate here).

    carried: (ref_ts, ref_val) or None. Returns (out_pdf, new_state) where
    new_state is (ts, val) to persist, or None when no ref was seen."""
    if carried is not None:
        # inject the carried state as a synthetic ref row AT ITS OWN ts, so
        # the event-time merge below treats it like any other reference:
        # a late batch ref (ts < state.ts) fills only observations before
        # the state ref, and the state itself only ever moves FORWARD in
        # event time (a plain "fill unmatched from state" would let a late
        # ref overwrite newer carried state)
        ref_ts, ref_val = carried
        batch = pd.concat(
            [
                pd.DataFrame(
                    {
                        "entity_id": [entity],
                        "ts": [ref_ts],
                        "kind": ["ref"],
                        "value": [ref_val],
                    }
                ),
                batch,
            ],
            ignore_index=True,
        )
    # event-time order; references sort BEFORE observations at equal ts so
    # an obs at t sees a ref at t (allow_exact_matches=True parity). The
    # mergesort is stable, so the injected state row precedes a batch ref
    # at the same ts and the newer (batch) one wins the ffill tie.
    batch = batch.sort_values(
        ["ts", "kind"],
        key=lambda s: s.map({"ref": 0, "obs": 1}) if s.name == "kind" else s,
        kind="mergesort",
    )
    is_ref = (batch["kind"] == "ref").to_numpy()
    r_ts = batch["ts"].where(is_ref).ffill()
    r_val = batch["value"].where(is_ref).ffill()
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
    new_state = None
    if is_ref.any():
        # max-event-time ref (sorted ascending -> the last ref row); with
        # the injected state row included this is monotone by construction
        last = batch[is_ref].iloc[-1]
        new_state = (float(last["ts"]), float(last["value"]))
    return out, new_state


def _enrich_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (entity,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    carried = tuple(state.get) if state.exists else None
    out, new_state = _enrich_core(entity, batch, carried)
    if new_state is not None:
        state.update(new_state)
    yield out


def streaming_asof_enrich(events, state_ttl_ms: int | None = None):
    """Streaming point-in-time enrichment: for every kind='obs' row emit
    (entity_id, ts, value, ref_val, ref_ts) where (ref_ts, ref_val) is the
    latest kind='ref' row of the same entity at or before ts (seen so far).
    Input: a STREAMING DataFrame of EVENT_SCHEMA (applyInPandasWithState is
    streaming-only; the batch twin is operators/asof.asof_join, which the
    equivalence test pins this operator against).

    state_ttl_ms: optional per-entity state TTL (processing time). An
    entity with no traffic for TTL has its carried reference REMOVED —
    the engine fires expired timers on background cleanup triggers (note
    these run CONTINUOUSLY once any timer exists; give the query a
    processingTime trigger in production, and poll the sink rather than
    processAllAvailable in tests). The state-bounding knob for long-tail
    entity universes (10^8 entities whose majority go quiet; without
    expiry the state store only ever grows). Semantics change under TTL, by design:
    an observation arriving after its entity's state expired sees ref_val
    NULL until a fresh reference arrives. Default None = exact batch-twin
    semantics."""
    if state_ttl_ms is None:
        return events.groupBy("entity_id").applyInPandasWithState(
            _enrich_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def enrich_ttl(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # expiry trigger: drop the carried reference, emit nothing
            state.remove()
            return
        for out in _enrich_group(key, pdfs, state):
            if state.exists:
                # (re)arm the expiry clock on every batch that touches the
                # key (setTimeoutDuration requires defined state; a key
                # with no reference yet has nothing to expire)
                state.setTimeoutDuration(state_ttl_ms)
            yield out

    return events.groupBy("entity_id").applyInPandasWithState(
        enrich_ttl,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_asof_enrich_tws(events):
    """The same operator on the Spark 4.x transformWithStateInPandas API
    (the successor to applyInPandasWithState: typed per-state-variable
    handles, RocksDB-backed, timers/TTL available). Identical semantics —
    both delegate to _enrich_core — and pinned against the same batch twin.

    Requires the RocksDB state store provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    and the `protobuf` python package (the transformWithState driver worker
    speaks protobuf to the JVM state server) — absent in this sandbox, so
    the equivalence test SKIPs with the probe recorded there; semantics are
    covered by the applyInPandasWithState twin via the shared _enrich_core.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AsofEnrichProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ref", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (entity,) = key
            batch = pd.concat(list(rows), ignore_index=True)
            carried = tuple(self._state.get()) if self._state.exists() else None
            out, new_state = _enrich_core(entity, batch, carried)
            if new_state is not None:
                self._state.update(new_state)
            yield out

        def close(self) -> None:
            pass

    return events.groupBy("entity_id").transformWithStateInPandas(
        statefulProcessor=AsofEnrichProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
