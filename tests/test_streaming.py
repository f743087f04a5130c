"""Streaming sessionization: the session_window aggregate must agree with
the batch gap-sessionize operator, and the same query must run as an actual
Structured Streaming job (file source -> memory sink)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from mpds_spark.operators.sessionize import sessionize
from mpds_spark.streaming.sessions import (
    session_agg,
    stream_sessions_from_files,
)

SCHEMA = "user_id long, ts timestamp, value double"


def _events_pdf(seed=83, n_users=5, n=400):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(n_users):
        t = base
        for _ in range(n // n_users):
            # gaps: mostly minutes, sometimes > 30 min (session break)
            gap_s = float(rng.choice([60, 300, 2400, 4000], p=[0.5, 0.3, 0.1, 0.1]))
            t = t + pd.Timedelta(seconds=gap_s * (1 + rng.uniform(0, 0.2)))
            rows.append((u, t, round(float(rng.normal()), 3)))
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"])


def test_session_window_agrees_with_batch_sessionize(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf, SCHEMA)

    native = session_agg(df, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )
    npdf = native.toPandas()

    # batch operator: same gap, then per-session min/max/count/sum
    s = sessionize(df, entity="user_id", gap=1800.0)
    ours = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("t_min"),
        )
        .orderBy("user_id", "t_min")
        .toPandas()
    )
    assert len(npdf) == len(ours)
    np.testing.assert_array_equal(
        npdf["n_events"].to_numpy(), ours["n_events"].to_numpy()
    )
    np.testing.assert_allclose(
        npdf["sum_value"].to_numpy(dtype=float),
        ours["sum_value"].to_numpy(dtype=float),
        rtol=1e-9,
    )
    # session_window start == first event ts of the session
    np.testing.assert_array_equal(
        npdf["session_start"].to_numpy(), ours["t_min"].to_numpy()
    )


def test_streaming_job_runs_end_to_end(spark, tmp_path):
    pdf = _events_pdf(n=150)
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.parquet(src)

    q = (
        stream_sessions_from_files(spark, src, SCHEMA, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select count(*) as n from sess_test").collect()[0]["n"]
    finally:
        q.stop()
    batch_n = session_agg(
        spark.createDataFrame(pdf, SCHEMA), gap="30 minutes"
    ).count()
    assert got == batch_n > 0


def test_stateful_asof_enrich_matches_batch_asof(spark, tmp_path):
    """Streaming as-of enrichment (applyInPandasWithState) pinned against
    the batch asof_join: same (obs -> latest ref at-or-before) matches when
    arrival order respects event time (files fed in ts order, one file per
    micro-batch so state must carry across batches)."""
    import numpy as np
    import pandas as pd

    from mpds_spark.operators.asof import asof_join
    from mpds_spark.streaming.stateful import (
        EVENT_SCHEMA,
        streaming_asof_enrich,
    )

    rng = np.random.default_rng(31)
    rows = []
    for e in ["a", "b", "c"]:
        n = 60
        ts = np.sort(rng.uniform(0, 1000, n)).round(3)
        kinds = np.where(rng.uniform(size=n) < 0.3, "ref", "obs")
        vals = rng.normal(size=n).round(4)
        rows.append(
            pd.DataFrame(
                {"entity_id": e, "ts": ts, "kind": kinds, "value": vals}
            )
        )
    pdf = pd.concat(rows, ignore_index=True).sort_values("ts")

    # 3 files in event-time order -> 3 micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "asof_src")
    chunks = np.array_split(pdf, 3)
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("asof_enrich_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("select * from asof_enrich_test")
            .orderBy("entity_id", "ts")
            .toPandas()
        )
    finally:
        q.stop()

    df = spark.createDataFrame(pdf, EVENT_SCHEMA)
    obs = df.filter("kind = 'obs'").select("entity_id", "ts", "value")
    ref = df.filter("kind = 'ref'").select(
        "entity_id", "ts", F.col("value").alias("ref_val")
    )
    exp = (
        asof_join(obs, ref, on="ts", by="entity_id")
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(
        got["entity_id"].to_numpy(), exp["entity_id"].to_numpy()
    )
    for s_col, b_col in [("ref_val", "ref_val"), ("ref_ts", "ts_r")]:
        a = got[s_col].to_numpy(dtype=float)
        b = exp[b_col].to_numpy(dtype=float)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), f"mismatch in {s_col}"


def test_stateful_asof_enrich_late_reference(spark, tmp_path):
    """A late reference (event time older than the carried state) must only
    enrich observations BEFORE the state in event time; the state stays
    monotone (obs after the state still see the newer reference)."""
    import pandas as pd

    from mpds_spark.streaming.stateful import (
        EVENT_SCHEMA,
        streaming_asof_enrich,
    )

    src = str(tmp_path / "late_src")
    b1 = pd.DataFrame(
        {"entity_id": ["a"], "ts": [100.0], "kind": ["ref"], "value": [1.0]}
    )
    b2 = pd.DataFrame(
        {
            "entity_id": ["a", "a", "a"],
            "ts": [50.0, 70.0, 200.0],
            "kind": ["ref", "obs", "obs"],
            "value": [2.0, 0.0, 0.0],
        }
    )
    for ch in (b1, b2):
        spark.createDataFrame(ch, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("late_ref_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("select * from late_ref_test").orderBy("ts").toPandas()
        )
    finally:
        q.stop()
    # obs@70: latest at-or-before among seen = late ref@50 (value 2.0)
    # obs@200: the carried state ref@100 (value 1.0), NOT the late one
    assert got["ts"].tolist() == [70.0, 200.0]
    assert got["ref_val"].tolist() == [2.0, 1.0]
    assert got["ref_ts"].tolist() == [50.0, 100.0]


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicates-on-hash keeps exactly one row per distinct
    text across micro-batches, matching the batch exact_dedup group set."""
    import pandas as pd

    from mpds_spark.operators.dedup import exact_dedup
    from mpds_spark.streaming.dedup import stream_exact_dedup

    texts = [f"document body {i % 7}" for i in range(40)]  # 7 distinct
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(40)], "text": texts}
    )
    src = str(tmp_path / "dedup_src")
    for lo in (0, 20):  # two micro-batches; dups span the boundary
        spark.createDataFrame(pdf.iloc[lo : lo + 20]).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select text_hash, count(*) as n from dedup_stream_test group by 1"
        ).toPandas()
    finally:
        q.stop()
    batch = exact_dedup(spark.createDataFrame(pdf)).toPandas()
    assert set(got.text_hash) == set(batch.text_hash)
    assert (got.n == 1).all()  # exactly one survivor per hash, ever


def test_tws_asof_enrich_matches_batch_asof(spark, tmp_path):
    """streaming_asof_enrich_tws (the Spark 4.x transformWithStateInPandas
    API, RocksDB state store) pinned against the batch asof_join with the
    same harness as the applyInPandasWithState test — both stateful APIs
    share _enrich_core, so this certifies the new-API plumbing.

    transformWithState's python driver worker speaks protobuf to the JVM
    state server; the sandbox has no `protobuf` package (and no installs),
    so this SKIPs with the probe recorded when the dependency is missing —
    the semantics stay covered by the applyInPandasWithState twin."""
    import importlib.util

    try:
        # find_spec on a submodule raises when the parent package is absent
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        import pytest

        pytest.skip(
            "transformWithStateInPandas requires the protobuf package "
            "(StateMessage_pb2), absent in this sandbox; semantics covered "
            "by the applyInPandasWithState twin via shared _enrich_core"
        )
    import numpy as np
    import pandas as pd

    from mpds_spark.operators.asof import asof_join
    from mpds_spark.streaming.stateful import (
        EVENT_SCHEMA,
        streaming_asof_enrich_tws,
    )

    rng = np.random.default_rng(57)
    rows = []
    for e in ["a", "b"]:
        n = 40
        ts = np.sort(rng.uniform(0, 1000, n)).round(3)
        kinds = np.where(rng.uniform(size=n) < 0.3, "ref", "obs")
        vals = rng.normal(size=n).round(4)
        rows.append(
            pd.DataFrame({"entity_id": e, "ts": ts, "kind": kinds, "value": vals})
        )
    pdf = pd.concat(rows, ignore_index=True).sort_values("ts")

    src = str(tmp_path / "tws_src")
    for ch in np.array_split(pdf, 3):
        spark.createDataFrame(ch, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_asof_enrich_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_asof_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("select * from tws_asof_test")
            .orderBy("entity_id", "ts")
            .toPandas()
        )
    finally:
        q.stop()
        if old is not None:
            spark.conf.set(provider_key, old)
        else:
            spark.conf.unset(provider_key)

    df = spark.createDataFrame(pdf, EVENT_SCHEMA)
    obs = df.filter("kind = 'obs'").select("entity_id", "ts", "value")
    ref = df.filter("kind = 'ref'").select(
        "entity_id", "ts", F.col("value").alias("ref_val")
    )
    exp = (
        asof_join(obs, ref, on="ts", by="entity_id")
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert len(got) == len(exp) > 0
    for s_col, b_col in [("ref_val", "ref_val"), ("ref_ts", "ts_r")]:
        a = got[s_col].to_numpy(dtype=float)
        b = exp[b_col].to_numpy(dtype=float)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), f"mismatch in {s_col}"


def test_stateful_asof_enrich_state_ttl(spark, tmp_path):
    """state_ttl_ms: an entity idle for longer than the TTL has its carried
    reference dropped (the engine fires expired timers on background
    cleanup triggers) — later observations see a NULL ref until a fresh
    reference arrives, which re-populates state within its batch."""
    import time

    import pandas as pd

    from mpds_spark.streaming.stateful import (
        EVENT_SCHEMA,
        streaming_asof_enrich,
    )

    src = str(tmp_path / "ttl_src")

    def feed(rows):
        pdf = pd.DataFrame(
            rows, columns=["entity_id", "ts", "kind", "value"]
        )
        spark.createDataFrame(pdf, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    feed([("a", 1.0, "ref", 10.0), ("a", 2.0, "obs", 0.1),
          ("b", 1.0, "ref", 20.0)])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_asof_enrich(stream, state_ttl_ms=500)
        .writeStream.format("memory")
        .queryName("asof_ttl_test")
        .outputMode("append")
        .start()
    )
    def wait_rows(n, deadline=60.0):
        # processAllAvailable cannot settle here: with ProcessingTimeTimeout
        # the engine keeps running empty "cleaning up state" trigger batches
        # (it cannot prove no timer is pending), so poll the sink instead
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline:
            if spark.sql("select * from asof_ttl_test").count() >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"sink never reached {n} rows")

    try:
        wait_rows(1)
        time.sleep(2.0)  # > TTL: both entities idle past expiry
        # a: expired -> NULL; b: a FRESH ref in the same batch re-populates
        # state before the (event-time later) observation
        feed([("a", 4.0, "obs", 0.3), ("b", 5.0, "ref", 30.0),
              ("b", 6.0, "obs", 0.4)])
        wait_rows(3)
        got = {
            (r["entity_id"], r["ts"]): r["ref_val"]
            for r in spark.sql("select * from asof_ttl_test").collect()
        }
    finally:
        q.stop()
    assert got[("a", 2.0)] == 10.0      # pre-expiry: enriched
    assert got[("a", 4.0)] is None      # expired: NULL until a new ref
    assert got[("b", 6.0)] == 30.0      # fresh ref re-populates state


def test_session_watermark_drops_late_event(spark, tmp_path):
    """Watermarked session agg (append mode): an event arriving LATER than
    the watermark bound is dropped — it neither reopens its (already
    emitted) session nor appears in a new one. The §2.10 late-data
    contract: state is bounded because anything older than
    max_event_time - watermark can be ignored."""
    import pandas as pd

    from mpds_spark.streaming.sessions import session_agg

    schema = "user_id string, ts timestamp, value double"
    src = str(tmp_path / "wm_src")

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # session A (10:00-10:05) then an 11:00 event: watermark -> 10:30,
    # so session A (ends 10:15 < 10:30) is emitted and finalized
    feed(
        [
            ("u1", "2024-01-01 10:00:00", 1.0),
            ("u1", "2024-01-01 10:05:00", 1.0),
            ("u1", "2024-01-01 11:00:00", 1.0),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        session_agg(stream, gap="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("wm_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # 09:00 is far behind the 10:30 watermark -> must be DROPPED;
        # 12:30 advances the watermark so the 11:00 session flushes too
        feed(
            [
                ("u1", "2024-01-01 09:00:00", 99.0),
                ("u1", "2024-01-01 12:30:00", 1.0),
            ]
        )
        q.processAllAvailable()
        feed([("u1", "2024-01-01 14:00:00", 1.0)])  # flush the 12:30 one
        q.processAllAvailable()
        rows = spark.sql(
            "select * from wm_sessions order by session_start"
        ).collect()
    finally:
        q.stop()
    starts = [r["session_start"].strftime("%H:%M") for r in rows]
    # emitted: 10:00 (2 events), 11:00, 12:30 — the 14:00 flusher is still
    # in state (nothing advanced the watermark past it), and the late
    # 09:00 event appears NOWHERE
    assert starts == ["10:00", "11:00", "12:30"]
    assert [r["n_events"] for r in rows] == [2, 1, 1]
    assert all(r["sum_value"] == r["n_events"] * 1.0 for r in rows)  # no 99.0


def test_streaming_token_budget_matches_batch(spark, tmp_path):
    """Single micro-batch: the streaming admission equals the batch
    sample_token_budget keep set (same hash order, same prefix rule).
    Second micro-batch: admission continues from carried per-source totals
    — the sequential-greedy semantics — and never exceeds the budget."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mpds_spark.operators.dedup import words_col
    from mpds_spark.operators.sampling import sample_token_budget
    from mpds_spark.streaming.sampling import (
        IN_SCHEMA,
        _admit_core,
        streaming_token_budget,
    )

    rows = [
        (i, f"s{i % 3}", " ".join(f"w{i}_{j}" for j in range(2 + (i * 5) % 17)))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    toks = docs.select(
        "doc_id", "source", F.size(words_col("text")).cast("long").alias("n_tok")
    )
    budget = 150

    src = str(tmp_path / "budget_src")
    toks.filter(F.col("doc_id") < 60).coalesce(1).write.mode("append").parquet(src)
    q = (
        streaming_token_budget(
            spark.readStream.schema(IN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            budget=budget,
        )
        .writeStream.format("memory")
        .queryName("budget_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("select * from budget_stream_test").toPandas()
        # batch equivalence on the first (single) micro-batch
        want1 = (
            sample_token_budget(
                docs.filter(F.col("doc_id") < 60), budget=budget
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got1.sort_values("doc_id").reset_index(drop=True)[want1.columns],
            want1,
        )
        # second micro-batch: carried state continues the greedy scan
        toks.filter(F.col("doc_id") >= 60).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got2 = spark.sql("select * from budget_stream_test").toPandas()
    finally:
        q.stop()

    pdf = toks.toPandas()
    expect = []
    for s, grp in pdf.groupby("source"):
        seen = 0
        for lo, hi in ((0, 60), (60, 120)):
            part = grp[(grp.doc_id >= lo) & (grp.doc_id < hi)]
            out, seen = _admit_core(s, part, seen, budget)
            expect.append(out)
    want2 = (
        pd.concat(expect, ignore_index=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got2 = got2.sort_values("doc_id").reset_index(drop=True)[want2.columns]
    pd.testing.assert_frame_equal(
        got2.astype(want2.dtypes.to_dict()), want2
    )
    assert (got2.cum_tok <= budget).all()


def test_streaming_pack_matches_batch_and_carries(spark, tmp_path):
    """Single micro-batch, one source: emitted bins equal the batch
    pack_sequences full bins (same hash order, same segment maps). Second
    micro-batch: the carried partial bin completes first, bin ids continue,
    every emitted bin is exactly L."""
    import pandas as pd

    from mpds_spark.operators.sampling import pack_sequences
    from mpds_spark.streaming.packing import (
        IN_SCHEMA,
        _pack_core,
        streaming_pack,
    )

    rows = [
        (i, "s0", list(range(i * 50, i * 50 + 2 + (i * 5) % 9)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, IN_SCHEMA)
    L = 16
    src = str(tmp_path / "pack_src")
    docs.filter("doc_id < 20").coalesce(1).write.mode("append").parquet(src)
    q = (
        streaming_pack(
            spark.readStream.schema(IN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            length=L,
        )
        .writeStream.format("memory")
        .queryName("pack_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = (
            spark.sql("select * from pack_stream_test")
            .toPandas()
            .sort_values("bin_id")
            .reset_index(drop=True)
        )
        want1 = (
            pack_sequences(docs.filter("doc_id < 20"), L)
            .filter(f"n_tok_packed = {L}")
            .toPandas()
            .sort_values("bin_id")
            .reset_index(drop=True)
        )
        assert list(got1["bin_id"]) == list(want1["bin_id"])
        assert [list(t) for t in got1["tokens"]] == [
            list(t) for t in want1["tokens"]
        ]
        assert [
            [tuple(s) for s in segs] for segs in got1["segments"]
        ] == [[tuple(s) for s in segs] for segs in want1["segments"]]
        docs.filter("doc_id >= 20").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = (
            spark.sql("select * from pack_stream_test")
            .toPandas()
            .sort_values("bin_id")
            .reset_index(drop=True)
        )
    finally:
        q.stop()

    # sequential-greedy expectation via the shared kernel
    pdf = docs.toPandas()
    state, expect = None, []
    for lo, hi in ((0, 20), (20, 40)):
        part = pdf[(pdf.doc_id >= lo) & (pdf.doc_id < hi)]
        out, state = _pack_core("s0", part, state, L)
        expect.append(out)
    want2 = pd.concat(expect, ignore_index=True).sort_values("bin_id")
    assert list(got2["bin_id"]) == list(want2["bin_id"])
    assert [list(t) for t in got2["tokens"]] == [list(t) for t in want2["tokens"]]
    # every emitted bin is full; bin ids are contiguous from 0
    assert all(len(t) == L for t in got2["tokens"])
    assert list(got2["bin_id"]) == list(range(len(got2)))


def test_tumbling_watermark_drops_late_event(spark, tmp_path):
    """Watermarked tumbling-window agg (append mode): a window is emitted
    once the watermark passes its end, and a row arriving behind the
    watermark is dropped — it must not reopen the finalized window. The
    tumbling twin of the session-window late-data contract."""
    import pandas as pd

    from mpds_spark.streaming.sessions import tumbling_counts

    schema = "user_id string, ts timestamp, value double"
    src = str(tmp_path / "wm_tumble_src")

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # hour 10 gets two events; the 12:00 event pushes the watermark to
    # 11:30 > 11:00, so window [10:00,11:00) is emitted and finalized
    feed(
        [
            ("u1", "2024-01-01 10:10:00", 2.0),
            ("u1", "2024-01-01 10:40:00", 3.0),
            ("u1", "2024-01-01 12:00:00", 5.0),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        tumbling_counts(
            stream, window="1 hour", entity="user_id", watermark="30 minutes"
        )
        .writeStream.format("memory")
        .queryName("wm_tumbling")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # 10:50 is behind the 11:30 watermark -> dropped, NOT re-emitted
        # into the closed hour-10 window; 14:00 advances the watermark so
        # the hour-12 window flushes
        feed(
            [
                ("u1", "2024-01-01 10:50:00", 99.0),
                ("u1", "2024-01-01 14:00:00", 7.0),
            ]
        )
        q.processAllAvailable()
        rows = spark.sql(
            "select * from wm_tumbling order by window_start"
        ).collect()
    finally:
        q.stop()
    got = [
        (r["window_start"].strftime("%H:%M"), r["n_events"], r["sum_value"])
        for r in rows
    ]
    # hour 10: both on-time events, never the late 99.0; hour 12: the
    # 12:00 event; the 14:00 flusher is still in state
    assert got == [("10:00", 2, 5.0), ("12:00", 1, 5.0)]
