"""Driver-facing query catalog: one entry per implemented operator, each with
a DuckDB oracle-SQL twin (same column names, same semantics).

Conventions shared by Spark and SQL sides (so the driver's order-insensitive
value-hash matches):
- entity key = events.user_id, event time = events.ts (unique per user —
  verified at all SFs), deterministic window order = (ts).
- every float column that passes through an order-sensitive float reduction
  (group-by avg/sum, range-frame sums) is rounded to 6 decimals on BOTH
  sides; integer-exact or order-deterministic values are left exact.
- time distances are epoch-second doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import duck_round
from mpds_spark.operators.asof import asof_join, time_since_event
from mpds_spark.operators.backfill import locf
from mpds_spark.operators.pairs import smoothness_pairs
from mpds_spark.operators.scale import fit_robust_scaler, rescale_scores
from mpds_spark.operators.sessionize import (
    event_response,
    interval_join,
    remove_short_on_intervals,
    sessionize,
    unite_adjacent_on_intervals,
)
from mpds_spark.operators.windows import (
    derived_features,
    interleave_split,
    lag_lead_diff,
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the oracle compares epoch seconds against DuckDB's naive-UTC epoch():
    # pin the session tz so TIMESTAMP_NTZ -> TIMESTAMP casts are UTC even on
    # a driver-created session that didn't set it
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def _r6(c):
    return duck_round(c, 6)


# ---------------------------------------------------------------- queries

def q_derived_features(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.col("value").alias("dss"),
    )
    out = derived_features(ev, value="dss")
    # dss_avg recomputed from exact integer cents: the data is 2-decimal, so
    # float cumsums divided by power-of-two row counts land exactly on
    # 6-decimal rounding boundaries where 1-ulp engine differences flip the
    # rounded digit. Integer sums are exact in both engines.
    w = Window.partitionBy("entity_id").orderBy("ts")
    cents = (
        F.signum("dss") * F.floor(F.abs(F.col("dss")) * 100 + F.lit(0.5))
    ).cast("long")
    cs_c = F.sum(cents).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        "dss_avg", (cs_c / F.lit(100.0)) / F.row_number().over(w)
    )
    return out.select(
        "event_id",
        *[
            _r6(c).alias(c)
            for c in (
                "dss_avg",
                "dss_ht_avg",
                "dss_ht_sq_avg",
                "dss_max",
                "dss_min",
                "dss_rate_avg",
                "dss_abs_rate_avg",
            )
        ],
    )


SQL_DERIVED = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, value AS dss FROM events
), d AS (
  SELECT event_id, user_id, t, dss,
    row_number() OVER w AS rn,
    sum(CAST(floor(abs(dss)*100 + 0.5)*sign(dss) AS BIGINT)) OVER we AS cs_c,
    sum(t) OVER we AS cs_t,
    sum(t*t) OVER we AS cs_t2,
    sum(dss) OVER we AS cs_d,
    sum(dss*t) OVER we AS cs_dt,
    sum(dss*t*t) OVER we AS cs_dt2,
    max(dss) OVER we AS cmax,
    min(dss) OVER we AS cmin,
    coalesce(abs(dss - lag(dss) OVER w), 0) AS adiff,
    coalesce(dss - lag(dss) OVER w, 0) AS sdiff,
    coalesce(abs(t - lag(t) OVER w), 1) AS dt
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t),
         we AS (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), f AS (
  SELECT event_id, rn, cs_c, cs_t, cs_t2, cs_d, cs_dt, cs_dt2, cmax, cmin,
    sum(sdiff/dt) OVER we AS cs_rate,
    sum(adiff/dt) OVER we AS cs_arate
  FROM d
  WINDOW we AS (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id,
  round((cs_c / 100.0) / rn, 6) AS dss_avg,
  round(cs_dt / cs_t, 6)   AS dss_ht_avg,
  round(cs_dt2 / cs_t2, 6) AS dss_ht_sq_avg,
  round(cmax, 6)           AS dss_max,
  round(cmin, 6)           AS dss_min,
  round(cs_rate / rn, 6)   AS dss_rate_avg,
  round(cs_arate / rn, 6)  AS dss_abs_rate_avg
FROM f
"""


def q_locf(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    out = locf(ev, value="v", valid_time=3600.0)
    return out.select(
        "event_id",
        F.col("v_locf").alias("locf"),
        _r6("v_time_since_sample").alias("time_since_sample"),
        F.col("v_locf_expir").alias("locf_expir"),
    )


SQL_LOCF = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         CASE WHEN event_type <> 'error' THEN value END AS v
  FROM events
), d AS (
  SELECT event_id, t,
    last_value(v IGNORE NULLS) OVER we AS locf,
    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER we AS last_t
  FROM e
  WINDOW we AS (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, locf,
  round(t - last_t, 6) AS time_since_sample,
  CASE WHEN t - last_t > 3600 THEN NULL ELSE locf END AS locf_expir
FROM d
"""


def q_locf_salted(spark, sf_dir):
    """The SALTED LOCF path through the driver gate (VERDICT r2 #3): locf
    semantics executed via salted_locf with a 90-day chunk span (several
    chunks per entity, chunk-prefix carry exercised at sf scale). The
    oracle is the PLAIN LOCF SQL — the driver gate certifies
    salted == unsalted == oracle, like asof_salted does for the as-of."""
    from mpds_spark.operators.salting import salted_locf

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    out = salted_locf(ev, value="v", valid_time=3600.0, chunk_span=90 * 86400.0)
    return out.select(
        "event_id",
        F.col("v_locf").alias("locf"),
        _r6("v_time_since_sample").alias("time_since_sample"),
        F.col("v_locf_expir").alias("locf_expir"),
    )


def q_time_since_purchase(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        (F.col("event_type") == "purchase").cast("int").alias("event"),
    )
    out = time_since_event(ev, include_forward=True, leakage_ok=True)
    return out.select(
        "event_id",
        _r6("time_since_last_event").alias("t_since_last"),
        _r6("time_since_first_event").alias("t_since_first"),
        _r6("time_to_next_event").alias("t_to_next"),
    )


SQL_TIME_SINCE = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ev
  FROM events
)
SELECT event_id,
  round(t - max(CASE WHEN ev = 1 THEN t END) OVER
    (PARTITION BY user_id ORDER BY t
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6) AS t_since_last,
  round(t - min(CASE WHEN ev = 1 THEN t END) OVER
    (PARTITION BY user_id ORDER BY t
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6) AS t_since_first,
  round(min(CASE WHEN ev = 1 THEN t END) OVER
    (PARTITION BY user_id ORDER BY t
     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) - t, 6) AS t_to_next
FROM e
"""


def q_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    s = sessionize(ev, gap=1800.0)
    return s.groupBy(
        F.col("entity_id").alias("user_id"), F.col("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _r6(F.min("ts")).alias("t_start"),
        _r6(F.max("ts")).alias("t_end"),
        _r6(F.sum("value")).alias("sum_value"),
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
), g AS (
  SELECT user_id, t, value,
    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM e
), d AS (
  SELECT user_id, t, value,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
  round(min(t), 6) AS t_start, round(max(t), 6) AS t_end,
  round(sum(value), 6) AS sum_value
FROM d GROUP BY user_id, session_id
"""


def q_asof_purchase(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.col("value").alias("purchase_value"),
    )
    out = asof_join(clicks, purchases, on="ts", by="entity_id")
    return out.select(
        "event_id",
        F.col("purchase_value"),
        _r6("ts_r").alias("purchase_ts"),
    )


SQL_ASOF_PURCHASE = """
WITH c AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
  WHERE event_type = 'purchase'
)
SELECT c.event_id, p.value AS purchase_value, round(p.t, 6) AS purchase_ts
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t >= p.t
"""


def q_asof_orders(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").cast("timestamp").cast("double").alias("ts"),
        "o_totalprice",
    )
    out = asof_join(ev, orders, on="ts", by="entity_id")
    return out.select(
        "event_id",
        F.col("o_totalprice").alias("last_order_price"),
        _r6("ts_r").alias("last_order_ts"),
    )


SQL_ASOF_ORDERS = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
), o AS (
  SELECT o_custkey, epoch(o_orderdate) AS t, o_totalprice FROM orders
)
SELECT e.event_id, o.o_totalprice AS last_order_price,
       round(o.t, 6) AS last_order_ts
FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.t >= o.t
"""


def q_lag_lead(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    out = lag_lead_diff(ev, "value")
    return out.select(
        "event_id",
        _r6("value_diff").alias("value_diff"),
        _r6("value_abs_diff").alias("value_abs_diff"),
        _r6("diff_ts").alias("diff_ts"),
    )


SQL_LAG_LEAD = """
WITH e AS (SELECT event_id, user_id, epoch(ts) AS t, value FROM events)
SELECT event_id,
  round(coalesce(value - lag(value) OVER w, 0), 6) AS value_diff,
  round(coalesce(abs(value - lag(value) OVER w), 0), 6) AS value_abs_diff,
  round(coalesce(abs(t - lag(t) OVER w), 1), 6) AS diff_ts
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
"""


def q_interval_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    obs = ev.select(F.col("user_id").alias("entity_id"), "ts", "value")
    # purchases are a small filtered trigger set (~2% of events) -> broadcast
    out = interval_join(purchases, obs, wind=3600.0, broadcast_events=True)
    return out.select(
        F.col("entity_id").alias("user_id"),
        F.col("event_ts").cast("timestamp").cast("double").alias("event_ts"),
        "n_obs",
        _r6("avg_value").alias("avg_value"),
    )


SQL_INTERVAL_JOIN = """
WITH p AS (
  SELECT user_id, epoch(ts) AS et FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
)
SELECT p.user_id, p.et AS event_ts, count(*) AS n_obs,
       round(avg(e.value), 6) AS avg_value
FROM p JOIN e ON e.user_id = p.user_id AND e.t > p.et AND e.t <= p.et + 3600
GROUP BY p.user_id, p.et
"""


def q_smoothness_pairs(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    out = smoothness_pairs(ev, ["value"])
    return out.select(
        "event_id",
        _r6("value_pair_diff").alias("value_pair_diff"),
        _r6("pair_diff_ts").alias("pair_diff_ts"),
    )


SQL_SMOOTHNESS = """
WITH e AS (SELECT event_id, user_id, epoch(ts) AS t, value FROM events)
SELECT event_id,
  round(lead(value) OVER w - value, 6) AS value_pair_diff,
  round(lead(t) OVER w - t, 6) AS pair_diff_ts
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
QUALIFY lead(t) OVER w IS NOT NULL
"""


def q_interleave(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    out = interleave_split(ev)
    return out.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n"),
        _r6(F.sum("value")).alias("sum_value"),
    )


SQL_INTERLEAVE = """
WITH e AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY epoch(ts)) AS rn
  FROM events
)
SELECT (rn + 1) % 2 AS phase, count(*) AS n, round(sum(value), 6) AS sum_value
FROM e GROUP BY 1
"""


def q_per_user_max(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_PER_USER_MAX = """
SELECT user_id, max(value) AS max_value, count(*) AS n_events
FROM events GROUP BY user_id
"""


def q_remove_short(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        (F.col("value") > 15).cast("int").alias("signal"),
    )
    out = remove_short_on_intervals(ev, time_th=1200.0)
    return out.select("event_id", "signal", "signal_clean")


SQL_REMOVE_SHORT = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         CASE WHEN value > 15 THEN 1 ELSE 0 END AS sig
  FROM events
), x AS (
  SELECT *, CASE WHEN sig = 1 AND coalesce(lag(sig)
      OVER (PARTITION BY user_id ORDER BY t), 0) = 0
      THEN 1 ELSE 0 END AS rising
  FROM e
), r AS (
  SELECT *, sum(rising)
      OVER (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM x
), g AS (
  SELECT *, CASE WHEN sig = 1 THEN rid END AS run_key FROM r
), d AS (
  SELECT *, max(t) OVER wr - min(t) OVER wr AS dur
  FROM g WINDOW wr AS (PARTITION BY user_id, run_key)
)
SELECT event_id, sig AS signal,
  CASE WHEN run_key IS NOT NULL AND dur >= 1200 THEN 1 ELSE 0 END AS signal_clean
FROM d
"""


def q_unite_adjacent(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        (F.col("value") > 15).cast("int").alias("signal"),
    )
    out = unite_adjacent_on_intervals(ev, union_th=1200.0)
    return out.select("event_id", "signal", "signal_united")


SQL_UNITE_ADJACENT = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         CASE WHEN value > 15 THEN 1 ELSE 0 END AS sig
  FROM events
), d AS (
  SELECT *,
    max(CASE WHEN sig = 1 THEN t END) OVER
      (PARTITION BY user_id ORDER BY t
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_on,
    min(CASE WHEN sig = 1 THEN t END) OVER
      (PARTITION BY user_id ORDER BY t
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_on
  FROM e
)
SELECT event_id, sig AS signal,
  CASE WHEN sig = 1 OR (prev_on IS NOT NULL AND next_on IS NOT NULL
                        AND next_on - prev_on <= 1200)
       THEN 1 ELSE 0 END AS signal_united
FROM d
"""


def q_event_response(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("event"),
    )
    out = event_response(
        ev, value="value", event="event", wind=3600.0, leakage_ok=True
    )
    return out.select(
        "event_id",
        "num_before",
        "num_after",
        _r6("avg_before").alias("avg_before"),
        _r6("avg_after").alias("avg_after"),
    )


SQL_EVENT_RESPONSE = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ev
  FROM events
), s AS (
  SELECT *,
    (lag(value) OVER w + value) / 2 * (t - lag(t) OVER w) AS seg,
    t - lag(t) OVER w AS dt
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
), d AS (
  SELECT *,
    count(t) OVER wp - 1 AS n_post,
    sum(seg) OVER wp - coalesce(seg, 0) AS num_post,
    sum(dt) OVER wp - coalesce(dt, 0) AS den_post
  FROM s WINDOW wp AS (PARTITION BY user_id ORDER BY t
                       RANGE BETWEEN CURRENT ROW AND 3600 FOLLOWING)
)
SELECT event_id,
  CASE WHEN n_post >= 1 THEN 1 END AS num_before,
  CASE WHEN n_post >= 1 THEN n_post + 1 END AS num_after,
  CASE WHEN n_post >= 1 THEN round(value, 6) END AS avg_before,
  CASE WHEN n_post >= 1 THEN round(num_post / den_post, 6) END AS avg_after
FROM d WHERE ev = 1
"""


def q_robust_scale(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "value")
    params = fit_robust_scaler(ev, ["value"])
    med, iqr = params["value"]
    return ev.select(
        "event_id",
        _r6((F.col("value") - F.lit(med)) / F.lit(iqr)).alias("value_scaled"),
    )


SQL_ROBUST_SCALE = """
WITH p AS (
  SELECT quantile_cont(value, 0.5) AS med,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events
)
SELECT event_id, round((value - med) / iqr, 6) AS value_scaled
FROM events, p
"""


def q_rescale_scores(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", F.col("value").alias("score"))
    out, _ = rescale_scores(ev, score="score")
    return out.select("event_id", _r6("mpds").alias("mpds"))


SQL_RESCALE = """
WITH p AS (
  SELECT quantile_cont(value, 0.5) AS med,
         quantile_cont(value, 0.85) - quantile_cont(value, 0.15) AS iqr
  FROM events
)
SELECT event_id,
  round(least(greatest(50 * (value - med) / iqr + 50, 0), 100), 6) AS mpds
FROM events, p
"""


def q_dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_doc_id"),
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


def q_token_count(spark, sf_dir):
    return token_count(load(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = """
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_est
FROM documents
"""


def q_quality_score(spark, sf_dir):
    q = quality_score(load(spark, sf_dir, "documents"))
    return q.select(
        "doc_id",
        "n_words",
        _r6("avg_word_len").alias("avg_word_len"),
        _r6("stopword_ratio").alias("stopword_ratio"),
        _r6("distinct_ratio").alias("distinct_ratio"),
    )


SQL_QUALITY = """
WITH t AS (
  SELECT doc_id,
    regexp_split_to_array(trim(text), '\\s+') AS words,
    length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
  len(words) AS n_words,
  round(n_chars / len(words), 6) AS avg_word_len,
  round(len(list_filter(words,
    w -> w IN ('the','a','of','and','to','in','is','for'))) * 1.0
    / len(words), 6) AS stopword_ratio,
  round(len(list_distinct(words)) * 1.0 / len(words), 6) AS distinct_ratio
FROM t
"""




def _rewrite_rounds(sql: str) -> str:
    """Replace round(expr, 6) in oracle SQL with the exact floor-based
    half-away-from-zero formula the Spark side uses (duck_round), so both
    engines perform the identical IEEE double ops — no round-tie drift."""
    out = []
    i = 0
    token = "round("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 1
        k = j + len(token)
        while depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[j + len(token) : k - 1]
        body, _, digits = inner.rpartition(",")
        assert digits.strip() == "6", inner
        out.append(
            f"(floor(abs({body})*1000000.0 + 0.5)/1000000.0*sign({body}))"
        )
        i = k
    return "".join(out)

QUERIES = {
    "derived_features": q_derived_features,
    "locf": q_locf,
    "locf_salted": q_locf_salted,
    "time_since_purchase": q_time_since_purchase,
    "sessionize": q_sessionize,
    "asof_purchase": q_asof_purchase,
    "asof_orders": q_asof_orders,
    "lag_lead": q_lag_lead,
    "interval_join": q_interval_join,
    "smoothness_pairs": q_smoothness_pairs,
    "interleave": q_interleave,
    "per_user_max": q_per_user_max,
    "remove_short": q_remove_short,
    "unite_adjacent": q_unite_adjacent,
    "event_response": q_event_response,
    "robust_scale": q_robust_scale,
    "rescale_scores": q_rescale_scores,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
}

_RAW_ORACLES = {
    "derived_features": SQL_DERIVED,
    "locf": SQL_LOCF,
    "locf_salted": SQL_LOCF,  # salted == unsalted == oracle (the gate point)
    "time_since_purchase": SQL_TIME_SINCE,
    "sessionize": SQL_SESSIONIZE,
    "asof_purchase": SQL_ASOF_PURCHASE,
    "asof_orders": SQL_ASOF_ORDERS,
    "lag_lead": SQL_LAG_LEAD,
    "interval_join": SQL_INTERVAL_JOIN,
    "smoothness_pairs": SQL_SMOOTHNESS,
    "interleave": SQL_INTERLEAVE,
    "per_user_max": SQL_PER_USER_MAX,
    "remove_short": SQL_REMOVE_SHORT,
    "unite_adjacent": SQL_UNITE_ADJACENT,
    "event_response": SQL_EVENT_RESPONSE,
    "robust_scale": SQL_ROBUST_SCALE,
    "rescale_scores": SQL_RESCALE,
    "dedup_exact": SQL_DEDUP_EXACT,
    "token_count": SQL_TOKEN_COUNT,
    "quality_score": SQL_QUALITY,
}


ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


# ------------------------------------------------- training-pipeline ops

from mpds_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash16,
)
from mpds_spark.operators.pairs import ordering_pairs  # noqa: E402
from mpds_spark.operators.similarity import cosine_topk, lsh_cosine_topk  # noqa: E402
from mpds_spark.operators.text import (  # noqa: E402
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from mpds_spark.operators.backfill import interpolate  # noqa: E402

_SHINGLE_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(words) - 1),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents)
  WHERE len(words) >= 3
"""


def q_ngram_jaccard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=0.05)
    return out.select("doc_a", "doc_b", "n_common", _r6("jaccard").alias("jaccard"))


SQL_NGRAM_JACCARD = f"""
WITH e AS ({_SHINGLE_SQL}),
sz AS (SELECT doc_id, count(*) AS n_sh FROM e GROUP BY doc_id),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM e a JOIN e b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
  round(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
FROM c
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.05
"""


def q_minhash_signature(spark, sf_dir):
    return minhash_signature(load(spark, sf_dir, "documents"), k=8)


SQL_MINHASH = f"""
WITH e AS ({_SHINGLE_SQL})
SELECT doc_id,
  {", ".join(f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(8))}
FROM e GROUP BY doc_id
"""


def q_lsh_candidates(spark, sf_dir):
    return lsh_candidate_pairs(load(spark, sf_dir, "documents"), k=8, band_size=2)


SQL_LSH_CANDIDATES = f"""
WITH e AS ({_SHINGLE_SQL}),
sig AS (
  SELECT doc_id,
    {", ".join(f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(8))}
  FROM e GROUP BY doc_id
),
b AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {bi} AS band, h{2*bi} || '|' || h{2*bi+1} AS bh FROM sig"
      for bi in range(4))}
)
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM b a JOIN b c USING (band, bh) WHERE a.doc_id < c.doc_id
"""


def q_simhash(spark, sf_dir):
    return simhash16(load(spark, sf_dir, "documents"))


_SIMHASH_SUMS = ",\n    ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(16)
)
_SIMHASH_BITS = " + ".join(
    f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16)
)
SQL_SIMHASH = f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substring(md5(word), 1, 4))::UBIGINT AS h FROM w
), s AS (
  SELECT doc_id,
    {_SIMHASH_SUMS}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM s
"""


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(load(spark, sf_dir, "documents"), n=5)


SQL_FINGERPRINT = """
WITH e AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(words) - 3),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                || ' ' || words[i+3] || ' ' || words[i+4]))) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents)
  WHERE len(words) >= 5
)
SELECT doc_id, min(md5(shingle)) AS fp_min, max(md5(shingle)) AS fp_max,
       count(*) AS n_shingles
FROM e GROUP BY doc_id
"""


def q_lang_id(spark, sf_dir):
    return lang_id(load(spark, sf_dir, "documents"))


SQL_LANG_ID = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
), s AS (
  SELECT doc_id, len(words) AS n_words,
    len(list_filter(words, x -> x IN ('the','and','of','to','is'))) AS n_en,
    len(list_filter(words, x -> x IN ('der','die','und','ist','das'))) AS n_de,
    len(list_filter(words, x -> x IN ('le','la','et','est','les'))) AS n_fr,
    len(list_filter(words, x -> x IN ('el','la','los','es','una'))) AS n_es
  FROM w
)
SELECT doc_id, n_words, n_en, n_de, n_fr, n_es,
  CASE WHEN n_en = g AND g > 0 THEN 'en'
       WHEN n_de = g AND g > 0 THEN 'de'
       WHEN n_fr = g AND g > 0 THEN 'fr'
       WHEN n_es = g AND g > 0 THEN 'es'
       ELSE 'und' END AS lang_pred
FROM (SELECT *, greatest(n_en, n_de, n_fr, n_es) AS g FROM s)
"""


def q_ann_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return out.select(
        "query_id", "neighbor_id", _r6("cosine").alias("cosine"), "rank"
    )


SQL_ANN_COSINE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < 5
), v AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS vv FROM embeddings
), s AS (
  SELECT query_id, neighbor_id,
    list_dot_product(qv, vv) / sqrt(list_dot_product(qv, qv))
      / sqrt(list_dot_product(vv, vv)) AS cosine
  FROM q, v WHERE query_id <> neighbor_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM r WHERE rank <= 3
"""


def q_ann_lsh_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, bits=4)
    return out.select(
        "query_id", "neighbor_id", _r6("cosine").alias("cosine"), "rank"
    )


SQL_ANN_LSH = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS code
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, code FROM base WHERE vec_id < 5
), s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
    list_dot_product(qv, b.v) / sqrt(list_dot_product(qv, qv))
      / sqrt(list_dot_product(b.v, b.v)) AS cosine
  FROM q JOIN base b USING (code) WHERE query_id <> b.vec_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM r WHERE rank <= 3
"""


def q_interpolate(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    out = interpolate(ev, value="v", default=0.0, leakage_ok=True)
    return out.select("event_id", _r6("v_interp").alias("v_interp"))


SQL_INTERPOLATE = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         CASE WHEN event_type <> 'error' THEN value END AS v
  FROM events
), m AS (
  SELECT *,
    min(t) OVER pw AS t_first, max(t) OVER pw AS t_last,
    count(v) OVER pw AS n_val,
    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
  FROM e WINDOW pw AS (PARTITION BY user_id)
), p AS (
  SELECT *, CASE WHEN v IS NOT NULL THEN v
                 WHEN n_val = 0 THEN 0.0
                 WHEN t = t_last THEN last_val
                 WHEN t = t_first THEN 0.0
            END AS v2
  FROM m
), d AS (
  SELECT *,
    last_value(v2 IGNORE NULLS) OVER wp AS yp,
    last_value(CASE WHEN v2 IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS xp,
    first_value(v2 IGNORE NULLS) OVER wf AS yn,
    first_value(CASE WHEN v2 IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS xn
  FROM p
  WINDOW wp AS (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id,
  round(CASE WHEN v2 IS NOT NULL THEN v2
             ELSE (yn * (t - xp) + yp * (xn - t)) / (xn - xp) END, 6) AS v_interp
FROM d
"""


def q_ordering_pairs(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    out = ordering_pairs(ev, ["value"])
    return out.select(
        "event_id",
        _r6("value_pair_diff").alias("value_pair_diff"),
        _r6("pair_diff_ts").alias("pair_diff_ts"),
    )


SQL_ORDERING_PAIRS = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, value,
    row_number() OVER w AS rn,
    lead(value) OVER w AS next_v,
    lead(t) OVER w AS next_t
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts))
)
SELECT event_id,
  round(next_v - value, 6) AS value_pair_diff,
  round(next_t - t, 6) AS pair_diff_ts
FROM e WHERE rn % 2 = 1 AND next_t IS NOT NULL
"""


QUERIES.update(
    {
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_signature": q_minhash_signature,
        "lsh_candidates": q_lsh_candidates,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_id": q_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "interpolate": q_interpolate,
        "ordering_pairs": q_ordering_pairs,
    }
)
_RAW_ORACLES.update(
    {
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "minhash_signature": SQL_MINHASH,
        "lsh_candidates": SQL_LSH_CANDIDATES,
        "simhash": SQL_SIMHASH,
        "doc_fingerprint": SQL_FINGERPRINT,
        "lang_id": SQL_LANG_ID,
        "ann_cosine_topk": SQL_ANN_COSINE,
        "ann_lsh_topk": SQL_ANN_LSH,
        "interpolate": SQL_INTERPOLATE,
        "ordering_pairs": SQL_ORDERING_PAIRS,
    }
)
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


# ------------------------------------------------- SURVEY §2 long tail

from mpds_spark.operators.pairs import cross_stage_pairs, pair_diff  # noqa: E402
from mpds_spark.operators.scale import (  # noqa: E402
    apply_center_rescale,
    fit_center_rescale,
)


def q_pair_diff(spark, sf_dir):
    """Pair-table materialized diff (calculateDiffMatrix parity): the k-th
    purchase of each user paired with their k-th click."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").cast("timestamp").cast("double"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("k", F.row_number().over(w))
        .select("user_id", "k", F.col("event_id").alias("on_key"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("k", F.row_number().over(w))
        .select("user_id", "k", F.col("event_id").alias("off_key"))
    )
    pairs = purchases.join(clicks, ["user_id", "k"]).select("on_key", "off_key")
    data = ev.select("event_id", "value")
    out = pair_diff(pairs, data, key="event_id", cols=["value"])
    return out.select("on_key", "off_key", _r6("value_diff").alias("value_diff"))


SQL_PAIR_DIFF = """
WITH p AS (
  SELECT user_id, event_id AS on_key, value AS v_on,
    row_number() OVER (PARTITION BY user_id ORDER BY epoch(ts)) AS k
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS off_key, value AS v_off,
    row_number() OVER (PARTITION BY user_id ORDER BY epoch(ts)) AS k
  FROM events WHERE event_type = 'click'
)
SELECT on_key, off_key, round(v_on - v_off, 6) AS value_diff
FROM p JOIN c USING (user_id, k)
"""


def q_cross_stage_pairs(spark, sf_dir):
    """Theta pairs (generateBalancedPairs parity): stage = event_id % 4 over
    purchase rows, same-user pairs with stage_on > stage_off and time gap
    >= 1h, aggregated."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    d = ev.select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        (F.col("event_id") % 4).alias("stage"),
    )
    pairs = cross_stage_pairs(d, key="event_id", min_ht_gap=3600.0)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        _r6(F.avg(F.col("on_stage") - F.col("off_stage"))).alias("avg_stage_gap"),
    )


SQL_CROSS_STAGE = """
WITH p AS (
  SELECT event_id, user_id, epoch(ts) AS t, event_id % 4 AS stage
  FROM events WHERE event_type = 'purchase'
)
SELECT count(*) AS n_pairs,
  round(avg(a.stage - b.stage), 6) AS avg_stage_gap
FROM p a JOIN p b
  ON a.user_id = b.user_id AND a.stage > b.stage AND abs(a.t - b.t) >= 3600
"""


def q_event_response_prepost(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("event"),
    )
    out = event_response(
        ev, value="value", event="event", wind=3600.0, pre_post=True,
        leakage_ok=True,
    )
    return out.select(
        "event_id",
        "num_before",
        "num_after",
        _r6("avg_before").alias("avg_before"),
        _r6("avg_after").alias("avg_after"),
        _r6("avg_now").alias("avg_now"),
        _r6("trend_before").alias("trend_before"),
        _r6("trend_after").alias("trend_after"),
    )


SQL_EVENT_RESPONSE_PREPOST = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ev
  FROM events
), s AS (
  SELECT *,
    (lag(value) OVER w + value) / 2 * (t - lag(t) OVER w) AS seg,
    t - lag(t) OVER w AS dt
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
), d AS (
  SELECT *,
    count(t) OVER wp - 1 AS n_post,
    sum(seg) OVER wp - coalesce(seg, 0) AS num_post,
    sum(dt) OVER wp - coalesce(dt, 0) AS den_post,
    count(t) OVER wb - 1 AS n_pre,
    sum(seg) OVER wb - coalesce(first_value(seg) OVER wb, 0) AS num_pre,
    sum(dt) OVER wb - coalesce(first_value(dt) OVER wb, 0) AS den_pre
  FROM s
  WINDOW wp AS (PARTITION BY user_id ORDER BY t
                RANGE BETWEEN CURRENT ROW AND 3600 FOLLOWING),
         wb AS (PARTITION BY user_id ORDER BY t
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
)
SELECT event_id,
  CASE WHEN ok THEN n_pre + 1 END AS num_before,
  CASE WHEN ok THEN n_post END AS num_after,
  CASE WHEN ok THEN round(num_pre / den_pre, 6) END AS avg_before,
  CASE WHEN ok THEN round(num_post / den_post, 6) END AS avg_after,
  CASE WHEN ok THEN round(value, 6) END AS avg_now,
  CASE WHEN ok THEN round(value - num_pre / den_pre, 6) END AS trend_before,
  CASE WHEN ok THEN round(num_post / den_post - value, 6) END AS trend_after
FROM (SELECT *, n_pre >= 1 AND n_post >= 1 AS ok FROM d) WHERE ev = 1
"""


def q_topk_users(spark, sf_dir):
    """Per-user max + global top-10 (dssPerformanceEvaluation.R:49-58,
    NB cell 20 head(30) parity).

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject (per-
    partition heap + driver merge of 10-row heads) instead of a single-
    partition global window over every user; the rank window then runs on
    the surviving <=10 rows only. Plan pinned in test_plan_budgets."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.max("value").alias("max_value"))
    top = agg.orderBy(F.col("max_value").desc(), F.col("user_id")).limit(10)
    w = Window.orderBy(F.col("max_value").desc(), F.col("user_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "user_id", "max_value")
    )


SQL_TOPK = """
WITH a AS (SELECT user_id, max(value) AS max_value FROM events GROUP BY 1)
SELECT rank, user_id, max_value FROM (
  SELECT *, row_number() OVER (ORDER BY max_value DESC, user_id) AS rank
  FROM a
) WHERE rank <= 10
"""


def q_histogram_lift(spark, sf_dir):
    """20-bucket histogram of value + cumulative lift (dssFunctionLibrary
    1779-1796 parity: hist + cumsum ratios).

    One ACTION (was 3): the (min, max) fit is a broadcast-joined 1-row
    subquery instead of a driver collect, and the total comes from a window
    sum over the tiny 20-row counts frame instead of a third scan."""
    ev = _events(spark, sf_dir)
    mm = ev.agg(
        F.min("value").alias("__lo"), F.max("value").alias("__hi")
    )
    b = F.least(
        F.floor(
            (F.col("value") - F.col("__lo"))
            / (F.col("__hi") - F.col("__lo"))
            * 20
        ).cast("int"),
        F.lit(19),
    )
    counts = (
        ev.join(F.broadcast(mm))
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.withColumn(
        "cum_ratio",
        _r6(F.sum("n").over(w) / F.sum("n").over(w_all).cast("double")),
    ).select("bucket", "n", "cum_ratio")


SQL_HISTOGRAM = """
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
b AS (
  SELECT least(CAST(floor((value - lo) / (hi - lo) * 20) AS INT), 19) AS bucket
  FROM events, mm
), c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1)
SELECT bucket, n,
  round(sum(n) OVER (ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    / CAST((SELECT count(*) FROM events) AS DOUBLE), 6) AS cum_ratio
FROM c
"""


def q_value_counts(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_VALUE_COUNTS = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


def q_set_ops(spark, sf_dir):
    """Distinct-set union/intersect/except cardinalities in ONE job:
    one scan of events, one shuffle on user_id (bool_or per side), one
    conditional-count agg — replaces the naive 3-actions/3-scans plan
    (was the only reason a trivial query cost 3.7 s in the r1 bench)."""
    ev = _events(spark, sf_dir)
    sides = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "purchase").alias("__p"),
            F.max(F.col("event_type") == "click").alias("__c"),
        )
    )
    return sides.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count(F.when(F.col("__p") & F.col("__c"), 1)).alias("n_intersect"),
        F.count(F.when(F.col("__p") & ~F.col("__c"), 1)).alias("n_except"),
    )


SQL_SET_OPS = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT
  (SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM c)) AS n_union,
  (SELECT count(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM c)) AS n_intersect,
  (SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM c)) AS n_except
"""


def q_discrete_entropy_mi(spark, sf_dir):
    """Table-level discrete entropy + MI (InfoTheory parity at table scale):
    x = event_type, y = (value > 15). H from value counts; MI = Hx+Hy-Hxy.

    ONE grouped job (was 4 actions / 4 scans): a single groupBy(x, y) pass
    produces the joint cell counts; marginals and the total are window sums
    over the TINY |X|x|Y| cell frame, and each marginal entropy folds back
    to a sum over cells: H(X) = -sum_cells (c/n)*log2(cx/n), because the
    cells of one x group to (cx/n)*log2(cx/n)."""
    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("x"),
        (F.col("value") > 15).cast("int").alias("y"),
    )
    cells = ev.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    cells = (
        cells.withColumn("n", F.sum("c").over(Window.partitionBy()))
        .withColumn("cx", F.sum("c").over(Window.partitionBy("x")))
        .withColumn("cy", F.sum("c").over(Window.partitionBy("y")))
    )
    p = F.col("c") / F.col("n").cast("double")
    raw = cells.agg(
        F.sum(-p * F.log2(F.col("cx") / F.col("n").cast("double"))).alias("hx"),
        F.sum(-p * F.log2(F.col("cy") / F.col("n").cast("double"))).alias("hy"),
        F.sum(-p * F.log2(p)).alias("hxy"),
    )
    return raw.select(
        _r6(F.col("hx")).alias("h_x"),
        _r6(F.col("hy")).alias("h_y"),
        _r6(F.col("hx") + F.col("hy") - F.col("hxy")).alias("mi_xy"),
    )


SQL_ENTROPY_MI = """
WITH e AS (
  SELECT event_type AS x, CASE WHEN value > 15 THEN 1 ELSE 0 END AS y
  FROM events
), n AS (SELECT count(*)::DOUBLE AS n FROM e),
hx AS (SELECT sum(-(c/n)*log2(c/n)) AS h
       FROM (SELECT x, count(*)::DOUBLE AS c FROM e GROUP BY 1), n),
hy AS (SELECT sum(-(c/n)*log2(c/n)) AS h
       FROM (SELECT y, count(*)::DOUBLE AS c FROM e GROUP BY 1), n),
hxy AS (SELECT sum(-(c/n)*log2(c/n)) AS h
        FROM (SELECT x, y, count(*)::DOUBLE AS c FROM e GROUP BY 1, 2), n)
SELECT round(hx.h, 6) AS h_x, round(hy.h, 6) AS h_y,
       round(hx.h + hy.h - hxy.h, 6) AS mi_xy
FROM hx, hy, hxy
"""


def q_column_medians(spark, sf_dir):
    """Per-column medians with manual overrides (mimicUsefulFunction.R
    583-628 parity: apply(dataMat,2,medianNA) + override dict)."""
    from mpds_spark.operators.scale import exact_quantiles_bracketed

    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    overrides = {"l_tax": 0.04}
    # exact medians via bracketed selection (approx bracket + exact ranks):
    # high-cardinality columns make the one-reducer `percentile` map merge
    # the bottleneck (and a non-starter at 10^12 rows)
    med = exact_quantiles_bracketed(li, cols, p=0.5)
    vals = [
        (c, float(overrides.get(c, med[c])))
        for c in cols
    ]
    return spark.createDataFrame(vals, "col_name string, median_val double").select(
        "col_name", _r6("median_val").alias("median_val")
    )


SQL_COLUMN_MEDIANS = """
SELECT col_name, round(median_val, 6) AS median_val FROM (
  SELECT 'l_quantity' AS col_name, quantile_cont(l_quantity, 0.5) AS median_val FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', quantile_cont(l_extendedprice, 0.5) FROM lineitem
  UNION ALL
  SELECT 'l_discount', quantile_cont(l_discount, 0.5) FROM lineitem
  UNION ALL
  SELECT 'l_tax', 0.04 FROM lineitem LIMIT 4
)
"""


def q_center_rescale(spark, sf_dir):
    """calculateCenteringAndRescalingDataForMatrix parity on lineitem."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    params = fit_center_rescale(li, ["l_quantity"])
    out = apply_center_rescale(li, params)
    return out.select(
        "l_orderkey", "l_linenumber", _r6("l_quantity").alias("q_scaled")
    )


SQL_CENTER_RESCALE = """
WITH p AS (
  SELECT avg(l_quantity) AS m, min(l_quantity) AS lo, max(l_quantity) AS hi
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
  round((l_quantity - m) / (hi - lo), 6) AS q_scaled
FROM lineitem, p
"""


def q_sampled_pairs_det(spark, sf_dir):
    """Deterministic pseudo-sampled user pairs (subsampleSetOfPossiblePairs
    parity — true seeded sampling is engine-specific, so the catalog variant
    selects ~1/37 of ordered pairs by a portable hash predicate).

    The predicate is SPLITTABLE by design: pair (u1, u2) is sampled iff
    (h(u1) + h(u2)) % 37 == 0 with h(u) = md5-derived per-user hash mod 37.
    Each side then carries its own bucket h(u) and the pair condition
    becomes the EQUI-join h(u2) == (37 - h(u1)) % 37 — a hash/sort-merge
    join, not the O(U^2)-compute BroadcastNestedLoopJoin that a pair-hash
    predicate (md5(u1||u2)) forces. Same sampling semantics (uniform
    deterministic 1/37 of pairs), scale-safe plan shape; the operator-level
    API keeps sampled_pairs' max_exact guard for the true-random variant."""
    ev = _events(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
    ).cast("long") % 37
    users = ev.select("user_id").distinct().withColumn("__h", h)
    a = users.select(
        F.col("user_id").alias("u1"),
        ((F.lit(37) - F.col("__h")) % 37).alias("__want"),
    )
    b = users.select(F.col("user_id").alias("u2"), F.col("__h").alias("__want"))
    return (
        a.join(b, "__want")
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
    )


SQL_SAMPLED_PAIRS = """
WITH u AS (
  SELECT user_id,
    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))::UBIGINT % 37 AS h
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT a.user_id AS u1, b.user_id AS u2
FROM u a JOIN u b ON b.h = (37 - a.h) % 37
WHERE a.user_id < b.user_id
"""


QUERIES.update(
    {
        "pair_diff": q_pair_diff,
        "cross_stage_pairs": q_cross_stage_pairs,
        "event_response_prepost": q_event_response_prepost,
        "topk_users": q_topk_users,
        "histogram_lift": q_histogram_lift,
        "value_counts": q_value_counts,
        "set_ops": q_set_ops,
        "discrete_entropy_mi": q_discrete_entropy_mi,
        "column_medians": q_column_medians,
        "center_rescale": q_center_rescale,
        "sampled_pairs_det": q_sampled_pairs_det,
    }
)
_RAW_ORACLES.update(
    {
        "pair_diff": SQL_PAIR_DIFF,
        "cross_stage_pairs": SQL_CROSS_STAGE,
        "event_response_prepost": SQL_EVENT_RESPONSE_PREPOST,
        "topk_users": SQL_TOPK,
        "histogram_lift": SQL_HISTOGRAM,
        "value_counts": SQL_VALUE_COUNTS,
        "set_ops": SQL_SET_OPS,
        "discrete_entropy_mi": SQL_ENTROPY_MI,
        "column_medians": SQL_COLUMN_MEDIANS,
        "center_rescale": SQL_CENTER_RESCALE,
        "sampled_pairs_det": SQL_SAMPLED_PAIRS,
    }
)
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_sliced_score(spark, sf_dir):
    """Sliced-model scoring over embeddings: 64 weights in 4 shards,
    partial scores merged by sum (CollectSlices parity)."""
    from mpds_spark.operators.battery import score_dot_sliced

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    weights = [((i * 7) % 13 - 6) / 10.0 for i in range(64)]  # deterministic
    out = score_dot_sliced(emb, "e", weights, n_slices=4, key="vec_id")
    return out.select("vec_id", _r6("score").alias("score"))


def _w64():
    return [((i * 7) % 13 - 6) / 10.0 for i in range(64)]


SQL_SLICED_SCORE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
parts AS (
  {" UNION ALL ".join(
      "SELECT vec_id, list_dot_product(v[%d:%d], [%s]) AS p FROM e"
      % (s*16+1, s*16+16,
         ", ".join(repr(((i*7)%13-6)/10.0) for i in range(s*16, s*16+16)))
      for s in range(4))}
)
SELECT vec_id, round(sum(p), 6) AS score FROM parts GROUP BY vec_id
"""

QUERIES["sliced_score"] = q_sliced_score
_RAW_ORACLES["sliced_score"] = SQL_SLICED_SCORE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


# ------------------------------------------------- round-2 ops

from mpds_spark.operators.dedup import (  # noqa: E402
    near_dup_pairs,
    simhash64,
    simhash_near_dups,
)


def q_near_dup_verified(spark, sf_dir):
    """Scale-safe near-dup: LSH candidates -> exact-Jaccard verify (the
    100-TB default plan; ngram_jaccard is the quadratic baseline)."""
    docs = load(spark, sf_dir, "documents")
    out = near_dup_pairs(docs, k=8, band_size=2, threshold=0.05)
    return out.select(
        "doc_a", "doc_b", "n_common", _r6("jaccard").alias("jaccard")
    )


_LSH_BAND_SQL = f"""
sig AS (
  SELECT doc_id,
    {", ".join(f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(8))}
  FROM e GROUP BY doc_id
),
b AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {bi} AS band, h{2*bi} || '|' || h{2*bi+1} AS bh FROM sig"
      for bi in range(4))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM b a JOIN b c USING (band, bh) WHERE a.doc_id < c.doc_id
)
"""

SQL_NEAR_DUP_VERIFIED = f"""
WITH e AS ({_SHINGLE_SQL}),
{_LSH_BAND_SQL},
sz AS (SELECT doc_id, count(*) AS n_sh FROM e GROUP BY doc_id),
common AS (
  SELECT cand.doc_a, cand.doc_b, count(*) AS n_common
  FROM cand
  JOIN e ea ON ea.doc_id = cand.doc_a
  JOIN e eb ON eb.doc_id = cand.doc_b AND eb.shingle = ea.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
  round(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
FROM common
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.05
"""


def q_simhash64(spark, sf_dir):
    return simhash64(load(spark, sf_dir, "documents"))


_S64_SUMS = ",\n    ".join(
    f"sum(CASE WHEN ({col} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{half}_{b}"
    for half, col in (("hi", "hh"), ("lo", "hl"))
    for b in range(32)
)
_S64_HI = " + ".join(
    f"CASE WHEN s_hi_{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
)
_S64_LO = " + ".join(
    f"CASE WHEN s_lo_{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
)
_S64_SIG_SQL = f"""
w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), h AS (
  SELECT doc_id,
    ('0x' || substring(md5(word), 1, 8))::UBIGINT AS hh,
    ('0x' || substring(md5(word), 9, 8))::UBIGINT AS hl
  FROM w
), s AS (
  SELECT doc_id,
    {_S64_SUMS}
  FROM h GROUP BY doc_id
), sig AS (
  SELECT doc_id,
    CAST({_S64_HI} AS BIGINT) AS sim_hi,
    CAST({_S64_LO} AS BIGINT) AS sim_lo
  FROM s
)
"""

SQL_SIMHASH64 = f"""
WITH {_S64_SIG_SQL}
SELECT doc_id, sim_hi, sim_lo FROM sig
"""


def q_simhash_near_dups(spark, sf_dir):
    out = simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3)
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_SIMHASH_NEAR_DUPS = f"""
WITH {_S64_SIG_SQL},
bands AS (
  SELECT doc_id, sim_hi, sim_lo, 0 AS band, sim_lo & 65535 AS bv FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 1, (sim_lo >> 16) & 65535 FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 2, sim_hi & 65535 FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 3, (sim_hi >> 16) & 65535 FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
    a.sim_hi AS hi_a, a.sim_lo AS lo_a, c.sim_hi AS hi_b, c.sim_lo AS lo_b
  FROM bands a JOIN bands c USING (band, bv) WHERE a.doc_id < c.doc_id
)
SELECT doc_a, doc_b,
  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT)
    AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3
"""

QUERIES.update(
    {
        "near_dup_verified": q_near_dup_verified,
        "simhash64": q_simhash64,
        "simhash_near_dups": q_simhash_near_dups,
    }
)
_RAW_ORACLES.update(
    {
        "near_dup_verified": SQL_NEAR_DUP_VERIFIED,
        "simhash64": SQL_SIMHASH64,
        "simhash_near_dups": SQL_SIMHASH_NEAR_DUPS,
    }
)
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_clinical_pairs(spark, sf_dir):
    """Intra+inter clinical comparisons (dssGenerateClinicalComparisons
    parity, dssFunctionLibrary.R:119-171): purchase rows, stage =
    event_id % 4, considered entities = user_id % 5 == 0; per-entity pairs
    capped at 3 per (entity, stage-combo), then a global inter-entity pass
    over used rows (40 rows/stage) capped at 50 per stage-combo. All caps
    are content-hash-rank (deterministic), mirrored exactly in the oracle."""
    from mpds_spark.operators.pairs import clinical_pairs

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    d = ev.select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        (F.col("event_id") % 4).alias("stage"),
    )
    considered = (
        d.filter(F.col("entity_id") % 5 == 0).select("entity_id").distinct()
    )
    return clinical_pairs(
        d,
        key="event_id",
        min_ht_gap=3600.0,
        considered=considered,
        intra_cap=3,
        inter_rows_per_stage=40,
        inter_cap=50,
    )


SQL_CLINICAL_PAIRS = """
WITH p AS (
  SELECT event_id, user_id, epoch(ts) AS t, event_id % 4 AS stage
  FROM events
  WHERE event_type = 'purchase' AND user_id % 5 = 0 AND event_id % 4 >= 0
),
intra0 AS (
  SELECT a.event_id AS on_key, b.event_id AS off_key,
         a.stage AS on_stage, b.stage AS off_stage, a.user_id AS on_entity
  FROM p a JOIN p b
    ON a.user_id = b.user_id AND a.stage > b.stage AND abs(a.t - b.t) >= 3600
),
intra AS (
  SELECT on_key, off_key, on_stage, off_stage FROM (
    SELECT *, row_number() OVER (
      PARTITION BY on_entity, on_stage, off_stage
      ORDER BY md5(on_key || '|' || off_key)) AS rn
    FROM intra0) WHERE rn <= 3
),
used AS (
  SELECT on_key AS event_id FROM intra
  UNION
  SELECT off_key FROM intra
),
ur AS (
  SELECT * FROM (
    SELECT p.*, row_number() OVER (
      PARTITION BY stage ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
    FROM p WHERE event_id IN (SELECT event_id FROM used)
  ) WHERE rn <= 40
),
inter0 AS (
  SELECT a.event_id AS on_key, b.event_id AS off_key,
         a.stage AS on_stage, b.stage AS off_stage
  FROM ur a JOIN ur b
    ON a.stage > b.stage AND abs(a.t - b.t) >= 3600
),
inter AS (
  SELECT on_key, off_key, on_stage, off_stage FROM (
    SELECT *, row_number() OVER (
      PARTITION BY on_stage, off_stage
      ORDER BY md5(on_key || '|' || off_key)) AS rn
    FROM inter0) WHERE rn <= 50
)
SELECT on_key, off_key, min(on_stage) AS on_stage,
  min(off_stage) AS off_stage,
  CASE WHEN min(prio) = 0 THEN 'intra' ELSE 'inter' END AS pair_type
FROM (
  SELECT *, 0 AS prio FROM intra
  UNION ALL
  SELECT *, 1 AS prio FROM inter
)
GROUP BY on_key, off_key
"""

QUERIES["clinical_pairs"] = q_clinical_pairs
_RAW_ORACLES["clinical_pairs"] = SQL_CLINICAL_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (driver-mandated dedup family):
    sign-code bucket candidates -> exact cosine >= 0.35 verify."""
    from mpds_spark.operators.similarity import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    out = embedding_near_dup_pairs(emb, threshold=0.35, bits=4)
    return out.select("vec_a", "vec_b", _r6("cosine").alias("cosine"))


SQL_EMBEDDING_NEAR_DUPS = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS code
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v))
    / sqrt(list_dot_product(b.v, b.v)), 6) AS cosine
FROM base a JOIN base b USING (code)
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v))
    / sqrt(list_dot_product(b.v, b.v)) >= 0.35
"""

QUERIES["embedding_near_dups"] = q_embedding_near_dups
_RAW_ORACLES["embedding_near_dups"] = SQL_EMBEDDING_NEAR_DUPS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_embedding_near_dups_multi(spark, sf_dir):
    """Multi-table banded candidate union (VERDICT r2 #5): K=2 independent
    4-bit code tables (axis-aligned sign codes over DISJOINT component
    windows — the oracle-portable twin of K seeded random-hyperplane
    tables), one (table, code) equi-join + dedupe, cosine verify. The
    seeded-random production variant (seeds=[...]) shares this exact plan
    and is recall-gated in pytest vs brute force."""
    from mpds_spark.operators.similarity import (
        embedding_near_dup_pairs,
        sign_code,
    )

    emb = load(spark, sf_dir, "embeddings")
    out = embedding_near_dup_pairs(
        emb,
        threshold=0.35,
        code_cols=[sign_code("embedding", 4, 0), sign_code("embedding", 4, 4)],
    )
    return out.select("vec_a", "vec_b", _r6("cosine").alias("cosine"))


def _dd_sign_code(offset: int) -> str:
    return " + ".join(
        f"CASE WHEN embedding[{offset + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(4)
    )


SQL_EMBEDDING_NEAR_DUPS_MULTI = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    ({_dd_sign_code(0)}) AS c0,
    ({_dd_sign_code(4)}) AS c1
  FROM embeddings
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM base a JOIN base b ON (a.c0 = b.c0 OR a.c1 = b.c1)
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
  round(list_dot_product(x.v, y.v) / sqrt(list_dot_product(x.v, x.v))
    / sqrt(list_dot_product(y.v, y.v)), 6) AS cosine
FROM cand c
JOIN base x ON x.vec_id = c.vec_a
JOIN base y ON y.vec_id = c.vec_b
WHERE list_dot_product(x.v, y.v) / sqrt(list_dot_product(x.v, x.v))
    / sqrt(list_dot_product(y.v, y.v)) >= 0.35
"""

QUERIES["embedding_near_dups_multi"] = q_embedding_near_dups_multi
_RAW_ORACLES["embedding_near_dups_multi"] = SQL_EMBEDDING_NEAR_DUPS_MULTI
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_random_ordered_pairs(spark, sf_dir):
    """Seeded random rank-ordered pairs (createRandomPairsOrderedByRank
    parity) over purchase events, rank = value. The operator is a pure
    function of row content (hash-threshold sampling, hash-rank zip,
    hash-rank cap), so the DuckDB oracle mirrors it exactly."""
    from mpds_spark.operators.pairs import random_ordered_pairs

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    d = ev.select("event_id", "value")
    return random_ordered_pairs(
        d, key="event_id", rank="value", n_pairs=200, seed=42
    )


# canonical rank encoding for hash inputs: floor(r*1e6 + 0.5) as BIGINT —
# NEVER the raw double's string form, which renders differently across
# engines outside the plain-decimal range (Spark '1.0E7' vs DuckDB
# '10000000.0'). Mirrors pairs.random_ordered_pairs exactly.
_ROP_RK = "CAST(CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS VARCHAR)"


def _rop_u(salt: str) -> str:
    """uniform-[0,1) hash of (salt, k, rkey) — DuckDB twin of the operator's
    conv(substring(md5(concat_ws('|', salt, k, rkey)), 1, 8), 16, 10)/2^32."""
    key = f"'{salt}' || '|' || CAST(k AS VARCHAR) || '|' || {_ROP_RK}"
    return f"('0x' || substring(md5({key}), 1, 8))::UBIGINT / 4294967296.0"


def _rop_h(salt: str) -> str:
    key = f"'{salt}' || '|' || CAST(k AS VARCHAR) || '|' || {_ROP_RK}"
    return f"md5({key})"


SQL_RANDOM_ORDERED_PAIRS = f"""
WITH k0 AS (
  SELECT event_id AS k, value AS r FROM events WHERE event_type = 'purchase'
),
n AS (SELECT count(*)::DOUBLE AS n FROM k0),
pa AS (
  SELECT k, r FROM k0, n WHERE {_rop_u("42a")} < least(1.0, 2.0 * 200 / n)
),
pb AS (
  SELECT k, r FROM k0, n WHERE {_rop_u("42b")} < least(1.0, 2.0 * 200 / n)
),
ia AS (SELECT k, r, row_number() OVER (ORDER BY {_rop_h("42oa")}) AS i FROM pa),
ib AS (SELECT k, r, row_number() OVER (ORDER BY {_rop_h("42ob")}) AS i FROM pb),
cand AS (
  SELECT a.k AS k1, a.r AS r1, b.k AS k2, b.r AS r2
  FROM ia a JOIN ib b USING (i)
  WHERE a.k <> b.k AND a.r <> b.r
),
o AS (
  SELECT DISTINCT
    CASE WHEN r1 >= r2 THEN k1 ELSE k2 END AS on_key,
    CASE WHEN r1 >= r2 THEN k2 ELSE k1 END AS off_key
  FROM cand
)
SELECT on_key, off_key FROM (
  SELECT *, row_number() OVER (ORDER BY
    md5('42' || '|' || CAST(on_key AS VARCHAR)
        || '|' || CAST(off_key AS VARCHAR))) AS rn
  FROM o
) WHERE rn <= 200
"""

QUERIES["random_ordered_pairs"] = q_random_ordered_pairs
_RAW_ORACLES["random_ordered_pairs"] = SQL_RANDOM_ORDERED_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_asof_salted(spark, sf_dir):
    """The SALTED as-of path through the driver gate: asof_orders semantics
    executed via salted_asof_join with a 90-day chunk span (several chunks per
    entity + boundary-carry replay exercised at sf scale). The oracle is a
    PLAIN ASOF JOIN — the gate thus certifies the documented salted ==
    unsalted equivalence on real data, not just a pytest fixture.

    Orders are pre-aggregated to one row per (entity, ts) (max price):
    ~32 customers place 2 orders on the same date at sf0.01, and an as-of
    match against duplicate timestamps has no defined winner in EITHER
    engine — the dedupe makes the query well-posed without weakening the
    chunk/carry coverage."""
    from mpds_spark.operators.salting import salted_asof_join

    # left = purchase events only: the salted path is the grouped-map
    # (memory-bounded) branch, whose per-(entity, chunk) pandas-group
    # overhead is the price of bounded memory — the catalog query keeps it
    # representative (chunks + carries exercised on real data) without
    # letting that overhead dominate the whole bench (an all-events left at
    # 30-day chunks cost 210 s at sf0.1 purely in group count)
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.col("user_id").alias("entity_id"),
            F.col("ts").cast("timestamp").cast("double").alias("ts"),
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("entity_id"),
            F.col("o_orderdate").cast("timestamp").cast("double").alias("ts"),
        )
        .agg(F.max("o_totalprice").alias("o_totalprice"))
    )
    # strategy="window": the chunk+carry salting logic is exercised
    # identically, with the as-of scan itself staying JVM-side (one
    # exchange on the SALTED key - at scale this is exactly how a giant
    # entity's sort partition is split). The cogroup variant is covered by
    # the pytest differential; its ~25 ms/group machinery overhead (group-
    # count-bound, not row-bound) makes it a poor fit for a timed catalog
    # query at sf0.1 (7k groups = 190 s of pure overhead, measured).
    out = salted_asof_join(
        ev,
        orders,
        on="ts",
        by="entity_id",
        chunk_span=90 * 86400.0,
        strategy="window",
    )
    return out.select(
        "event_id",
        F.col("o_totalprice").alias("last_order_price"),
        _r6("ts_r").alias("last_order_ts"),
    )


SQL_ASOF_SALTED = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
  WHERE event_type = 'purchase'
), o AS (
  SELECT o_custkey, epoch(o_orderdate) AS t, max(o_totalprice) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, o.o_totalprice AS last_order_price,
       round(o.t, 6) AS last_order_ts
FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.t >= o.t
"""

QUERIES["asof_salted"] = q_asof_salted
_RAW_ORACLES["asof_salted"] = SQL_ASOF_SALTED
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_gopher_quality(spark, sf_dir):
    """Gopher-rule quality signals (Rae et al. 2021 A1.1) over documents —
    thresholds tuned so the synthetic corpus splits non-trivially
    (min_words=8; the corpus has no 50-word floor)."""
    from mpds_spark.operators.text import gopher_quality_filter

    docs = load(spark, sf_dir, "documents")
    out = gopher_quality_filter(docs, min_words=8, min_mean_word_len=3.0)
    return out.select(
        "doc_id",
        "n_words",
        _r6("mean_word_len").alias("mean_word_len"),
        _r6("alpha_word_ratio").alias("alpha_word_ratio"),
        "n_distinct_stopwords",
        _r6("symbol_word_ratio").alias("symbol_word_ratio"),
        "ok_n_words",
        "ok_mean_word_len",
        "ok_alpha_ratio",
        "ok_stopwords",
        "ok_symbol_ratio",
        "passes",
    )


SQL_GOPHER_QUALITY = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), s AS (
  SELECT doc_id,
    len(ws) AS n_words,
    list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
      AS mean_word_len,
    len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
      / len(ws) AS alpha_word_ratio,
    len(list_intersect(list_distinct(ws),
        ['the','a','of','and','to','in','is','for','that','with']))
      AS n_distinct_stopwords,
    len(list_filter(ws, x -> x IN ('#', '...', '…')))::DOUBLE / len(ws)
      AS symbol_word_ratio
  FROM w
)
SELECT doc_id, n_words,
  round(mean_word_len, 6) AS mean_word_len,
  round(alpha_word_ratio, 6) AS alpha_word_ratio,
  n_distinct_stopwords,
  round(symbol_word_ratio, 6) AS symbol_word_ratio,
  (n_words >= 8 AND n_words <= 100000) AS ok_n_words,
  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_mean_word_len,
  (alpha_word_ratio >= 0.8) AS ok_alpha_ratio,
  (n_distinct_stopwords >= 2) AS ok_stopwords,
  (symbol_word_ratio <= 0.1) AS ok_symbol_ratio,
  ((n_words >= 8 AND n_words <= 100000)
   AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
   AND (alpha_word_ratio >= 0.8)
   AND (n_distinct_stopwords >= 2)
   AND (symbol_word_ratio <= 0.1)) AS passes
FROM s
"""

QUERIES["gopher_quality"] = q_gopher_quality
_RAW_ORACLES["gopher_quality"] = SQL_GOPHER_QUALITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_near_dup_components(spark, sf_dir):
    """Dedup GROUPS from near-dup PAIRS: connected components by iterative
    min-label propagation (join + min-agg per round, fixpoint-terminated) +
    keep = component representative (min id). The oracle computes the same
    components with a DuckDB RECURSIVE CTE — an iterative Spark algorithm
    checked against a recursive SQL one."""
    from mpds_spark.operators.dedup import dedup_keep_list, simhash_near_dups

    docs = load(spark, sf_dir, "documents")
    # simhash pairs as the edge source: same dedup-groups semantics as the
    # MinHash pipeline (which near_dup_verified already times separately)
    # at a third of the pipeline cost — the query's subject is the
    # components algorithm, not a second run of the pair generator.
    # algorithm="auto": a verified near-dup edge set is orders of magnitude
    # smaller than the corpus, so the adaptive path measures the edge count
    # and runs driver union-find below 5M edges (identical labels), keeping
    # the diameter-free large-/small-star loop (log rounds — the 10^12-edge
    # choice) for larger graphs; all three variants are differential-tested
    # equal in tests/test_dedup_groups.py.
    pairs = simhash_near_dups(docs, max_hamming=3)
    return dedup_keep_list(docs, pairs, algorithm="auto")


SQL_NEAR_DUP_COMPONENTS = f"""
WITH RECURSIVE {_S64_SIG_SQL.strip().rstrip()},
bands AS (
  SELECT doc_id, sim_hi, sim_lo, 0 AS band, sim_lo & 65535 AS bv FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 1, (sim_lo >> 16) & 65535 FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 2, sim_hi & 65535 FROM sig
  UNION ALL
  SELECT doc_id, sim_hi, sim_lo, 3, (sim_hi >> 16) & 65535 FROM sig
),
verified AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c USING (band, bv)
  WHERE a.doc_id < c.doc_id
    AND bit_count(xor(a.sim_hi, c.sim_hi))
      + bit_count(xor(a.sim_lo, c.sim_lo)) <= 3
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION ALL
  SELECT doc_b, doc_a FROM verified
),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(v, label) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.v
),
comp AS (SELECT v AS doc_id, min(label) AS component FROM reach GROUP BY v)
SELECT d.doc_id,
  coalesce(c.component, d.doc_id) AS component,
  (coalesce(c.component, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN comp c USING (doc_id)
"""

QUERIES["near_dup_components"] = q_near_dup_components
_RAW_ORACLES["near_dup_components"] = SQL_NEAR_DUP_COMPONENTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_near_dup_components_star(spark, sf_dir):
    """FORCES the large-/small-star component algorithm (Kiveris et al.
    SOCC'14) — the diameter-free log-round path a 10^12-edge graph must
    take — on a purpose-built component fixture: 5 chains of 40 (diameter
    39 — min-label propagation would need 39 rounds; star needs ~log),
    10 stars of 9 spokes, 50 singletons. The auto router picks driver
    union-find at toy edge counts, so without this query the at-scale
    algorithm would only ever run under pytest; the fixture keeps a
    standing driver-gated row against a RECURSIVE-CTE oracle while
    exercising MORE star rounds than the sf0.01 simhash edges did at a
    fraction of the cost (VERDICT r3 ask #7, re-gated per r4 ask #8 —
    the simhash edge path stays gated via near_dup_components's auto
    route and the 3-way differential in tests/test_dedup_groups.py)."""
    from mpds_spark.operators.dedup import dedup_keep_list

    verts = spark.range(350).select(F.col("id").alias("doc_id"))
    chain = (
        spark.range(200)
        .filter((F.col("id") + 1) % 40 != 0)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    star = spark.range(210, 300).select(
        (F.lit(200) + F.floor((F.col("id") - 210) / 9)).alias("doc_a"),
        F.col("id").alias("doc_b"),
    )
    # the star loop's construction is EAGER (per-round localCheckpoint);
    # at 350 vertices each round's cost is pure task-scheduling latency,
    # so scope the shuffle width down for the loop and restore after —
    # at real scale the width stays at the session setting (this is the
    # same runtime right-sizing AQE applies to small post-shuffle stages).
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        return dedup_keep_list(verts, chain.unionAll(star), algorithm="star")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


SQL_NEAR_DUP_COMPONENTS_STAR = """
WITH RECURSIVE
verts AS (SELECT unnest(range(350)) AS v),
chain AS (
  SELECT v AS a, v + 1 AS b FROM (SELECT unnest(range(200)) AS v)
  WHERE (v + 1) % 40 <> 0
),
star AS (
  SELECT 200 + (s - 210) // 9 AS a, s AS b
  FROM (SELECT unnest(range(210, 300)) AS s)
),
edges AS (SELECT a, b FROM chain UNION ALL SELECT a, b FROM star),
und AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
ev AS (SELECT DISTINCT a AS v FROM und),
reach(v, label) AS (
  SELECT v, v FROM ev
  UNION
  SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.v
),
comp AS (SELECT v AS doc_id, min(label) AS component FROM reach GROUP BY v)
SELECT t.v AS doc_id,
  coalesce(c.component, t.v) AS component,
  (coalesce(c.component, t.v) = t.v) AS keep
FROM verts t LEFT JOIN comp c ON c.doc_id = t.v
"""

QUERIES["near_dup_components_star"] = q_near_dup_components_star
_RAW_ORACLES["near_dup_components_star"] = SQL_NEAR_DUP_COMPONENTS_STAR
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_repetition_signals(spark, sf_dir):
    """Gopher repetition-removal signals over documents: most-common
    2-/3-gram character fractions (with-multiplicity counting) and
    duplicate-word fraction, with the A1.1 thresholds as flags."""
    from mpds_spark.operators.text import repetition_signals

    docs = load(spark, sf_dir, "documents")
    out = repetition_signals(docs)
    return out.select(
        "doc_id",
        "n_words",
        _r6("dup_word_frac").alias("dup_word_frac"),
        _r6("top2_char_frac").alias("top2_char_frac"),
        _r6("top3_char_frac").alias("top3_char_frac"),
        "ok_top2",
        "ok_top3",
    )


SQL_REPETITION = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), base AS (
  SELECT doc_id, len(ws) AS n_words,
    list_sum(list_transform(ws, x -> length(x))) AS chars,
    1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup_word_frac,
    ws
  FROM w
), g2 AS (
  SELECT doc_id, chars, unnest(
    CASE WHEN len(ws) >= 2
      THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
      ELSE []::VARCHAR[] END) AS gram
  FROM base
), c2 AS (
  SELECT doc_id, gram, any_value(chars) AS chars, count(*) AS c
  FROM g2 GROUP BY 1, 2
), t2 AS (
  -- most-frequent gram (rank by count, ties: longer gram then greater
  -- gram), take ITS count * length — mirrors the Spark struct arg-max
  SELECT doc_id, c * length(gram) / chars::DOUBLE AS top2_char_frac
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY c DESC, length(gram) DESC, gram DESC) AS rn FROM c2)
  WHERE rn = 1
), g3 AS (
  SELECT doc_id, chars, unnest(
    CASE WHEN len(ws) >= 3
      THEN list_transform(range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      ELSE []::VARCHAR[] END) AS gram
  FROM base
), c3 AS (
  SELECT doc_id, gram, any_value(chars) AS chars, count(*) AS c
  FROM g3 GROUP BY 1, 2
), t3 AS (
  SELECT doc_id, c * length(gram) / chars::DOUBLE AS top3_char_frac
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY c DESC, length(gram) DESC, gram DESC) AS rn FROM c3)
  WHERE rn = 1
)
SELECT b.doc_id, b.n_words,
  round(b.dup_word_frac, 6) AS dup_word_frac,
  round(coalesce(t2.top2_char_frac, 0.0), 6) AS top2_char_frac,
  round(coalesce(t3.top3_char_frac, 0.0), 6) AS top3_char_frac,
  (coalesce(t2.top2_char_frac, 0.0) <= 0.20) AS ok_top2,
  (coalesce(t3.top3_char_frac, 0.0) <= 0.18) AS ok_top3
FROM base b
LEFT JOIN t2 ON t2.doc_id = b.doc_id
LEFT JOIN t3 ON t3.doc_id = b.doc_id
"""

QUERIES["repetition_signals"] = q_repetition_signals
_RAW_ORACLES["repetition_signals"] = SQL_REPETITION
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ann_lsh_multiprobe(spark, sf_dir):
    """lsh_cosine_topk with 2 Hamming-1 probes on the query side: recall
    recovered from neighbor buckets without rescanning the corpus (the
    vectors stay single-bucket)."""
    emb = load(spark, sf_dir, "embeddings")
    out = lsh_cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, bits=4, n_probes=2
    )
    return out.select(
        "query_id", "neighbor_id", _r6("cosine").alias("cosine"), "rank"
    )


SQL_ANN_LSH_MULTIPROBE = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS code
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv,
    unnest([code, xor(code, 1), xor(code, 2)]) AS code
  FROM base WHERE vec_id < 5
), s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
    list_dot_product(qv, b.v) / sqrt(list_dot_product(qv, qv))
      / sqrt(list_dot_product(b.v, b.v)) AS cosine
  FROM q JOIN base b USING (code) WHERE query_id <> b.vec_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM r WHERE rank <= 3
"""

QUERIES["ann_lsh_multiprobe"] = q_ann_lsh_multiprobe
_RAW_ORACLES["ann_lsh_multiprobe"] = SQL_ANN_LSH_MULTIPROBE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: the corpus is partitioned into inverted
    lists by nearest centroid (cosine, ties to the lower centroid id);
    each query probes its 2 nearest lists via an equi-join on list id —
    the corpus shuffles once regardless of query count. The catalog
    variant uses a DETERMINISTIC centroid set (the embeddings of
    vec_id < 8) so DuckDB can replay the assignment; the production
    k-means path (kmeans_centroids) shares the exact plan and is
    recall-gated in pytest vs brute force."""
    from mpds_spark.operators.similarity import ivf_cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    cent = [
        row["v"]
        for row in emb.filter(F.col("vec_id") < 8)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .orderBy("vec_id")
        .collect()
    ]
    out = ivf_cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), centroids=cent, k=3, n_probe=2
    )
    return out.select(
        "query_id", "neighbor_id", _r6("cosine").alias("cosine"), "rank"
    )


SQL_ANN_IVF = """
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
  WHERE vec_id < 8
), v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
), vassign AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid, row_number() OVER (
      PARTITION BY v.vec_id
      ORDER BY list_dot_product(vv, cv) / sqrt(list_dot_product(cv, cv))
        DESC, c.cid) AS rn
    FROM v, c) WHERE rn = 1
), qassign AS (
  SELECT query_id, cid FROM (
    SELECT v.vec_id AS query_id, c.cid, row_number() OVER (
      PARTITION BY v.vec_id
      ORDER BY list_dot_product(vv, cv) / sqrt(list_dot_product(cv, cv))
        DESC, c.cid) AS rn
    FROM v, c WHERE v.vec_id < 5) WHERE rn <= 2
), s AS (
  SELECT qa.query_id, va.vec_id AS neighbor_id,
    list_dot_product(x.vv, y.vv) / sqrt(list_dot_product(x.vv, x.vv))
      / sqrt(list_dot_product(y.vv, y.vv)) AS cosine
  FROM qassign qa
  JOIN vassign va ON va.cid = qa.cid
  JOIN v x ON x.vec_id = qa.query_id
  JOIN v y ON y.vec_id = va.vec_id
  WHERE qa.query_id <> va.vec_id
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM r WHERE rank <= 3
"""

QUERIES["ann_ivf_topk"] = q_ann_ivf_topk
_RAW_ORACLES["ann_ivf_topk"] = SQL_ANN_IVF
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_grouped_medians(spark, sf_dir):
    """Per-group EXACT median via distributed bracketed selection (the
    grouped twin of column_medians' algorithm): per-key approx bracket ->
    per-key below-count -> window over only the in-bracket slices. No
    value->count map concentrates on a reducer and nothing is collected
    on the driver, so both group count and group size are unbounded —
    Spark's exact `percentile` aggregate cannot say either at 10^12
    rows."""
    from mpds_spark.operators.scale import exact_grouped_quantiles

    li = load(spark, sf_dir, "lineitem")
    out = exact_grouped_quantiles(li, "l_returnflag", "l_extendedprice", p=0.5)
    return out.select(
        "l_returnflag", _r6("q_l_extendedprice").alias("median_price")
    )


SQL_GROUPED_MEDIANS = """
SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["grouped_medians"] = q_grouped_medians
_RAW_ORACLES["grouped_medians"] = SQL_GROUPED_MEDIANS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (Brown et al. 2020 App. C): corpus docs
    (doc_id % 13 != 0) flagged when they share any distinct 3-gram with
    the held-out eval slice (doc_id % 13 == 0). Eval shingles broadcast;
    one doc-keyed shuffle."""
    from mpds_spark.operators.text import decontaminate

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 13 != 0)
    ev = docs.filter(F.col("doc_id") % 13 == 0)
    out = decontaminate(corpus, ev, n=3, min_hits=1)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        _r6("hit_frac").alias("hit_frac"),
        "contaminated",
    )


SQL_DECONTAMINATE = """
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
ce AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(words) - 1),
           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
         AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM corpus)
  WHERE len(words) >= 3
),
ee AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(list_distinct(list_transform(
             range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
           AS shingle
    FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS words
          FROM documents WHERE doc_id % 13 = 0)
    WHERE len(words) >= 3)
),
agg AS (
  SELECT ce.doc_id, count(*) AS n_shingles, count(ee.shingle) AS n_hits
  FROM ce LEFT JOIN ee ON ce.shingle = ee.shingle
  GROUP BY ce.doc_id
)
SELECT c.doc_id,
  coalesce(n_shingles, 0) AS n_shingles,
  coalesce(n_hits, 0) AS n_hits,
  round(CASE WHEN coalesce(n_shingles, 0) > 0
        THEN coalesce(n_hits, 0) / CAST(n_shingles AS DOUBLE)
        ELSE 0.0 END, 6) AS hit_frac,
  coalesce(n_hits, 0) >= 1 AS contaminated
FROM corpus c LEFT JOIN agg ON c.doc_id = agg.doc_id
"""

QUERIES["decontaminate"] = q_decontaminate
_RAW_ORACLES["decontaminate"] = SQL_DECONTAMINATE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_sample_token_budget(spark, sf_dir):
    """Deterministic per-source token-budget sample in content-hash order,
    via the BUCKETED two-pass strategy (per-(source, md5-nibble) totals ->
    driver prefix carries -> intra-bucket running sum) — the 100-TB path;
    bit-equal to the single-window strategy (pytest-pinned), and the
    oracle is the plain global window."""
    from mpds_spark.operators.sampling import sample_token_budget

    docs = load(spark, sf_dir, "documents")
    return sample_token_budget(
        docs, budget=700, group="source", strategy="bucketed"
    )


SQL_SAMPLE_TOKEN_BUDGET = """
WITH t AS (
  SELECT doc_id, source,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
    md5(source || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tok,
    sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM t
)
SELECT doc_id, source, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM c WHERE cum_tok <= 700
"""

QUERIES["sample_token_budget"] = q_sample_token_budget
_RAW_ORACLES["sample_token_budget"] = SQL_SAMPLE_TOKEN_BUDGET
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_duplicate_spans(spark, sf_dir):
    """Substring-level dup signals (Lee et al. 2021): per-doc count of
    8-gram positions whose gram occurs >= 2 times corpus-wide, plus the
    token fraction covered by the union of those spans (closed-form
    interval union via lead())."""
    from mpds_spark.operators.dedup import duplicate_spans

    docs = load(spark, sf_dir, "documents")
    out = duplicate_spans(docs, k=8, min_df=2)
    return out.select(
        "doc_id",
        "n_tok",
        "n_dup_positions",
        "covered_tok",
        _r6("dup_tok_frac").alias("dup_tok_frac"),
    )


SQL_DUPLICATE_SPANS = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 8 + 2),
      i -> {'pos': i, 'gram': md5(array_to_string(ws[i:i+7], ' '))})) AS s
  FROM t WHERE len(ws) >= 8
), occ AS (SELECT doc_id, s.pos AS pos, s.gram AS gram FROM g),
dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
d AS (
  SELECT o.doc_id, o.pos,
    least(coalesce(lead(o.pos) OVER (PARTITION BY o.doc_id ORDER BY o.pos)
                   - o.pos, 8), 8) AS cspan
  FROM occ o JOIN dup USING (gram)
),
cov AS (
  SELECT doc_id, count(*) AS n_dup_positions,
         CAST(sum(cspan) AS BIGINT) AS covered_tok
  FROM d GROUP BY doc_id
)
SELECT t.doc_id,
  len(ws) AS n_tok,
  coalesce(n_dup_positions, 0) AS n_dup_positions,
  coalesce(covered_tok, 0) AS covered_tok,
  round(CASE WHEN len(ws) > 0
        THEN coalesce(covered_tok, 0) / CAST(len(ws) AS DOUBLE)
        ELSE 0.0 END, 6) AS dup_tok_frac
FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
"""

QUERIES["duplicate_spans"] = q_duplicate_spans
_RAW_ORACLES["duplicate_spans"] = SQL_DUPLICATE_SPANS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_remove_dup_spans(spark, sf_dir):
    """Apply step of substring dedup: strip every token covered by a
    corpus-duplicated 8-gram and return a content hash of the cleaned
    word array — value-exact proof the rewritten arrays match the
    oracle's, not just their lengths."""
    from mpds_spark.operators.dedup import remove_duplicate_spans

    docs = load(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs, k=8, min_df=2)
    return out.select(
        "doc_id",
        "n_tok",
        "n_tok_clean",
        F.md5(F.concat_ws(" ", "tokens_clean")).alias("clean_hash"),
    )


SQL_REMOVE_DUP_SPANS = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 8 + 2),
      i -> {'pos': i, 'gram': md5(array_to_string(ws[i:i+7], ' '))})) AS s
  FROM t WHERE len(ws) >= 8
), occ AS (SELECT doc_id, s.pos AS pos, s.gram AS gram FROM g),
dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT o.doc_id, unnest(range(o.pos, o.pos + 8)) AS cp
  FROM occ o JOIN dup USING (gram)
), cl AS (
  SELECT doc_id, list(cp) AS cps FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
  len(ws) AS n_tok,
  len(list_filter(ws, (x, i) -> NOT list_contains(coalesce(cps, []), i)))
    AS n_tok_clean,
  md5(coalesce(array_to_string(
    list_filter(ws, (x, i) -> NOT list_contains(coalesce(cps, []), i)),
    ' '), '')) AS clean_hash
FROM t LEFT JOIN cl ON t.doc_id = cl.doc_id
"""

QUERIES["remove_dup_spans"] = q_remove_dup_spans
_RAW_ORACLES["remove_dup_spans"] = SQL_REMOVE_DUP_SPANS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_unigram_nll(spark, sf_dir):
    """CCNet-style LM quality score: corpus add-1-smoothed unigram NLL per
    doc (mean -ln p(word)); high = gibberish, low = boilerplate."""
    from mpds_spark.operators.text import unigram_logprob_score

    docs = load(spark, sf_dir, "documents")
    out = unigram_logprob_score(docs, alpha=1.0)
    return out.select(
        "doc_id", "n_words", _r6("unigram_nll").alias("unigram_nll")
    )


SQL_UNIGRAM_NLL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT sum(c) AS n, count(*) AS v FROM c)
SELECT w.doc_id,
  count(*) AS n_words,
  round(avg(-ln((c.c + 1.0) / (t.n + 1.0 * t.v))), 6) AS unigram_nll
FROM w JOIN c USING (word) CROSS JOIN t
GROUP BY w.doc_id
"""

QUERIES["unigram_nll"] = q_unigram_nll
_RAW_ORACLES["unigram_nll"] = SQL_UNIGRAM_NLL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_lm_quality_buckets(spark, sf_dir):
    """CCNet head/middle/tail split: per-source terciles of the unigram-LM
    NLL (exact grouped quantile_cont via distributed bracketed selection);
    boundary docs tie into the lower bucket."""
    from mpds_spark.operators.text import lm_quality_buckets

    docs = load(spark, sf_dir, "documents")
    out = lm_quality_buckets(docs, group="source")
    return out.select(
        "doc_id",
        "source",
        "n_words",
        _r6("unigram_nll").alias("unigram_nll"),
        "bucket",
    )


SQL_LM_QUALITY_BUCKETS = """
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT sum(c) AS n, count(*) AS v FROM c),
nll AS (
  SELECT w.doc_id, count(*) AS n_words,
    avg(-ln((c.c + 1.0) / (t.n + 1.0 * t.v))) AS s
  FROM w JOIN c USING (word) CROSS JOIN t GROUP BY w.doc_id
),
j AS (
  SELECT n.doc_id, d.source, n.n_words, n.s
  FROM nll n JOIN documents d USING (doc_id)
),
q AS (
  SELECT source, quantile_cont(s, 1.0/3) AS q1, quantile_cont(s, 2.0/3) AS q2
  FROM j GROUP BY source
)
SELECT j.doc_id, j.source, j.n_words, round(j.s, 6) AS unigram_nll,
  CASE WHEN j.s <= q.q1 THEN 'head'
       WHEN j.s <= q.q2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM j JOIN q USING (source)
"""

QUERIES["lm_quality_buckets"] = q_lm_quality_buckets
_RAW_ORACLES["lm_quality_buckets"] = SQL_LM_QUALITY_BUCKETS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_chunk_tokens(spark, sf_dir):
    """Training-length chunking of the documents' word arrays (length 32,
    disjoint, remainder kept): per-chunk id, size, and a content hash of
    the chunk — value-exact proof of the split points and passthrough."""
    from mpds_spark.operators.battery import chunk_tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    )
    out = chunk_tokens(docs, length=32)
    return out.select(
        "doc_id",
        "chunk_id",
        "n_tok_chunk",
        F.md5(F.concat_ws(" ", "tokens")).alias("chunk_hash"),
    )


SQL_CHUNK_TOKENS = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, unnest(list_transform(
      range(0, CAST(floor((len(ws) - 1) / 32.0) AS BIGINT) + 1),
      i -> {'cid': i, 'chunk': ws[1 + i*32 : (i+1)*32]})) AS s
  FROM t WHERE len(ws) >= 1
)
SELECT doc_id,
  CAST(s.cid AS INT) AS chunk_id,
  CAST(len(s.chunk) AS INT) AS n_tok_chunk,
  md5(coalesce(array_to_string(s.chunk, ' '), '')) AS chunk_hash
FROM g
"""

QUERIES["chunk_tokens"] = q_chunk_tokens
_RAW_ORACLES["chunk_tokens"] = SQL_CHUNK_TOKENS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the documents' word arrays into
    64-token training rows (hash-order stream, docs cross boundaries):
    per-bin segment count + content hash of the packed row."""
    from mpds_spark.operators.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    )
    out = pack_sequences(docs, length=64)
    return out.select(
        "bin_id",
        "n_tok_packed",
        "n_segments",
        F.md5(F.concat_ws(" ", "tokens")).alias("packed_hash"),
    )


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, ws, len(ws) AS n, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
        FROM documents)
  WHERE len(ws) > 0
), c AS (
  SELECT doc_id, ws, n,
    CAST(sum(n) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - n
         AS BIGINT) AS s
  FROM t
), p AS (
  SELECT doc_id, ws, n, s,
    unnest(range(s // 64, (s + n - 1) // 64 + 1)) AS bin
  FROM c
), pieces AS (
  SELECT bin, s,
    list_slice(ws, CAST(greatest(bin * 64 - s, 0) AS BIGINT) + 1,
               CAST(least(n, (bin + 1) * 64 - s) AS BIGINT)) AS piece
  FROM p
), packed AS (
  SELECT bin, list(piece ORDER BY s) AS pl, count(*) AS n_segments
  FROM pieces GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin_id,
  CAST(len(flatten(pl)) AS BIGINT) AS n_tok_packed,
  CAST(n_segments AS INT) AS n_segments,
  md5(coalesce(array_to_string(flatten(pl), ' '), '')) AS packed_hash
FROM packed
"""

QUERIES["pack_sequences"] = q_pack_sequences
_RAW_ORACLES["pack_sequences"] = SQL_PACK_SEQUENCES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_matlab_moments(spark, sf_dir):
    """MATLAB-convention moment battery per l_returnflag over
    l_extendedprice (mlstats conventions: prctile midpoint grid, std n-1,
    biased skew/kurt, smallest-tie mode), fully distributed."""
    from mpds_spark.operators.scale import grouped_matlab_moments

    li = load(spark, sf_dir, "lineitem")
    out = grouped_matlab_moments(li, "l_returnflag", "l_extendedprice")
    return out.select(
        "l_returnflag",
        "n",
        _r6("mean").alias("mean"),
        _r6("std").alias("std"),
        _r6("skew").alias("skew"),
        _r6("kurt").alias("kurt"),
        _r6("p25").alias("p25"),
        _r6("median").alias("median"),
        _r6("p75").alias("p75"),
        _r6("mode").alias("mode"),
    )


SQL_MATLAB_MOMENTS = """
WITH d AS (
  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), base AS (
  SELECT g, count(*) AS n, avg(x) AS mu FROM d GROUP BY g
), c AS (
  SELECT d.g, d.x, base.n, base.mu,
    row_number() OVER (PARTITION BY d.g ORDER BY d.x) AS rn
  FROM d JOIN base USING (g)
), mom AS (
  SELECT g, any_value(n) AS n, any_value(mu) AS mean,
    avg((x - mu) * (x - mu)) AS m2,
    avg((x - mu) * (x - mu) * (x - mu)) AS m3,
    avg((x - mu) * (x - mu) * (x - mu) * (x - mu)) AS m4,
    sum(CASE WHEN rn = floor(least(greatest(0.25 * n + 0.5, 1), n))
          THEN x * (1 - (least(greatest(0.25 * n + 0.5, 1), n)
                         - floor(least(greatest(0.25 * n + 0.5, 1), n))))
        WHEN rn = floor(least(greatest(0.25 * n + 0.5, 1), n)) + 1
          THEN x * (least(greatest(0.25 * n + 0.5, 1), n)
                    - floor(least(greatest(0.25 * n + 0.5, 1), n)))
        ELSE 0 END) AS p25,
    sum(CASE WHEN rn = floor(least(greatest(0.50 * n + 0.5, 1), n))
          THEN x * (1 - (least(greatest(0.50 * n + 0.5, 1), n)
                         - floor(least(greatest(0.50 * n + 0.5, 1), n))))
        WHEN rn = floor(least(greatest(0.50 * n + 0.5, 1), n)) + 1
          THEN x * (least(greatest(0.50 * n + 0.5, 1), n)
                    - floor(least(greatest(0.50 * n + 0.5, 1), n)))
        ELSE 0 END) AS median,
    sum(CASE WHEN rn = floor(least(greatest(0.75 * n + 0.5, 1), n))
          THEN x * (1 - (least(greatest(0.75 * n + 0.5, 1), n)
                         - floor(least(greatest(0.75 * n + 0.5, 1), n))))
        WHEN rn = floor(least(greatest(0.75 * n + 0.5, 1), n)) + 1
          THEN x * (least(greatest(0.75 * n + 0.5, 1), n)
                    - floor(least(greatest(0.75 * n + 0.5, 1), n)))
        ELSE 0 END) AS p75
  FROM c GROUP BY g
), md AS (
  SELECT g, x AS mode FROM (
    SELECT g, x, row_number() OVER (
      PARTITION BY g ORDER BY count(*) DESC, x) AS r
    FROM d GROUP BY g, x) WHERE r = 1
)
SELECT mom.g AS l_returnflag,
  CAST(n AS BIGINT) AS n,
  round(mean, 6) AS mean,
  round(CASE WHEN n > 1 THEN sqrt(m2 * n / (n - 1)) ELSE 0.0 END, 6) AS std,
  round(CASE WHEN m2 > 0 THEN m3 / pow(m2, 1.5) END, 6) AS skew,
  round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END, 6) AS kurt,
  round(p25, 6) AS p25,
  round(median, 6) AS median,
  round(p75, 6) AS p75,
  round(md.mode, 6) AS mode
FROM mom JOIN md USING (g)
"""

QUERIES["matlab_moments"] = q_matlab_moments
_RAW_ORACLES["matlab_moments"] = SQL_MATLAB_MOMENTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_series_stats(spark, sf_dir):
    """Window-expressible sequence kernels (ZCR / mean TKEO / AR1,
    kernels.py conventions) per user over the ts-ordered event values."""
    from mpds_spark.operators.windows import series_stats

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    out = series_stats(ev)
    return out.select(
        "entity_id",
        "n",
        _r6("zcr").alias("zcr"),
        _r6("tkeo_mean").alias("tkeo_mean"),
        _r6("ar1").alias("ar1"),
    )


SQL_SERIES_STATS = """
WITH d AS (
  SELECT user_id AS entity_id, epoch(ts) AS t, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
), c AS (
  SELECT entity_id, x,
    lag(x) OVER (PARTITION BY entity_id ORDER BY t) AS p,
    lead(x) OVER (PARTITION BY entity_id ORDER BY t) AS nx
  FROM d
)
SELECT entity_id,
  count(*) AS n,
  round(coalesce(sum(CASE WHEN p IS NOT NULL
      THEN abs(CAST(x > 0 AS INT) - CAST(p > 0 AS INT)) END), 0)
    / CAST(count(*) AS DOUBLE), 6) AS zcr,
  round(avg(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
      THEN x * x - nx * p END), 6) AS tkeo_mean,
  round(CASE WHEN sum(CASE WHEN p IS NOT NULL THEN p * p END) <> 0
      THEN sum(CASE WHEN p IS NOT NULL THEN p * x END)
           / sum(CASE WHEN p IS NOT NULL THEN p * p END) END, 6) AS ar1
FROM c GROUP BY entity_id
"""

QUERIES["series_stats"] = q_series_stats
_RAW_ORACLES["series_stats"] = SQL_SERIES_STATS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_validate_docs(spark, sf_dir):
    """Deequ-style expectation suite over documents in ONE aggregation
    pass: per-rule violation counts + verdicts."""
    from mpds_spark.operators.validate import (
        in_range,
        is_in,
        matches,
        not_null,
        unique,
        validate,
    )

    docs = load(spark, sf_dir, "documents")
    rules = [
        not_null("text"),
        unique("doc_id"),
        in_range("n_chars", 1, 100_000),
        matches("source", "^src[0-9]+$"),
        is_in("lang", ["en", "de", "fr", "es"]),
    ]
    return validate(docs, rules)


SQL_VALIDATE_DOCS = """
WITH a AS (
  SELECT count(*) AS n,
    sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS v0,
    count(doc_id) - count(DISTINCT doc_id) AS v1,
    sum(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 0 ELSE 1 END) AS v2,
    sum(CASE WHEN coalesce(regexp_matches(source, '^src[0-9]+$'), FALSE)
        THEN 0 ELSE 1 END) AS v3,
    sum(CASE WHEN coalesce(lang IN ('en','de','fr','es'), FALSE)
        THEN 0 ELSE 1 END) AS v4
  FROM documents
)
SELECT 'not_null(text)' AS rule, n AS n_rows,
  CAST(v0 AS BIGINT) AS n_violations, v0 = 0 AS passes FROM a
UNION ALL SELECT 'unique(doc_id)', n, CAST(v1 AS BIGINT), v1 = 0 FROM a
UNION ALL SELECT 'in_range(n_chars,1,100000)', n, CAST(v2 AS BIGINT),
  v2 = 0 FROM a
UNION ALL SELECT 'matches(source)', n, CAST(v3 AS BIGINT), v3 = 0 FROM a
UNION ALL SELECT 'is_in(lang)', n, CAST(v4 AS BIGINT), v4 = 0 FROM a
"""

QUERIES["validate_docs"] = q_validate_docs
_RAW_ORACLES["validate_docs"] = SQL_VALIDATE_DOCS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_temperature_mix(spark, sf_dir):
    """Temperature-rebalanced mixture (alpha=0.5): per-source budgets
    proportional to sqrt(source token total), filled with the hash-order
    prefix."""
    from mpds_spark.operators.sampling import sample_tokens_temperature

    docs = load(spark, sf_dir, "documents")
    return sample_tokens_temperature(docs, total_budget=8000, alpha=0.5)


SQL_TEMPERATURE_MIX = """
WITH t AS (
  SELECT doc_id, source,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
    md5(source || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), tot AS (
  SELECT source, CAST(sum(n_tok) AS DOUBLE) AS tg FROM t GROUP BY source
), sw AS (SELECT sum(sqrt(tg)) AS s FROM tot),
b AS (
  SELECT source, CAST(floor(8000.0 * sqrt(tg) / s) AS BIGINT) AS budget
  FROM tot, sw
), c AS (
  SELECT doc_id, source, n_tok,
    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tok
  FROM t
)
SELECT c.doc_id, c.source, c.n_tok, c.cum_tok, b.budget
FROM c JOIN b USING (source) WHERE c.cum_tok <= b.budget
"""

QUERIES["temperature_mix"] = q_temperature_mix
_RAW_ORACLES["temperature_mix"] = SQL_TEMPERATURE_MIX
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by content hash (90/5/5):
    per-split document and token counts."""
    from mpds_spark.operators.sampling import hash_split
    from mpds_spark.operators.dedup import words_col

    docs = load(spark, sf_dir, "documents")
    out = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words_col("text")).cast("long")).alias("n_tokens"),
        )
    )


SQL_HASH_SPLIT = """
WITH d AS (
  SELECT doc_id, text,
    CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) / 4294967296.0 AS u
  FROM documents
), s AS (
  SELECT CASE WHEN u < 0.9 THEN 'train'
              WHEN u < 0.95 THEN 'val'
              ELSE 'test' END AS split,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM d
)
SELECT split, count(*) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM s GROUP BY split
"""

QUERIES["hash_split"] = q_hash_split
_RAW_ORACLES["hash_split"] = SQL_HASH_SPLIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_redact_pii(spark, sf_dir):
    """PII redaction (emails / phones / IPv4) over a deterministic
    planted-PII text built from the customer table (the synthetic
    documents corpus contains no PII, so the fixture is constructed
    identically in both engines): per-row match counts + the md5 of the
    redacted text prove match-and-replace parity byte-for-byte."""
    from mpds_spark.operators.text import redact_pii

    c = load(spark, sf_dir, "customer")
    planted = c.select(
        F.col("c_custkey").alias("doc_id"),
        F.concat(
            F.lit("contact "),
            F.col("c_name"),
            F.lit(" at user"),
            F.col("c_custkey").cast("string"),
            F.lit("@example.com or 415-555-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("c_custkey") % 256).cast("string"),
            F.lit("."),
            F.col("c_nationkey").cast("string"),
            F.lit(" end"),
        ).alias("text"),
    )
    out = redact_pii(planted)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5("text_redacted").alias("redacted_hash"),
    )


SQL_REDACT_PII = r"""
WITH planted AS (
  SELECT c_custkey AS doc_id,
    'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
      || '@example.com or 415-555-'
      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      || ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.'
      || CAST(c_nationkey AS VARCHAR) || ' end' AS text
  FROM customer
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_email,
  CAST(len(regexp_extract_all(text, '\d{3}[-.]\d{3}[-.]\d{4}')) AS BIGINT)
    AS n_phone,
  CAST(len(regexp_extract_all(text,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g')
  ) AS redacted_hash
FROM planted
"""

QUERIES["redact_pii"] = q_redact_pii
_RAW_ORACLES["redact_pii"] = SQL_REDACT_PII
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (Xie et al. 2023, unigram features):
    target domain = the 'src0' slice of the corpus, source = the full
    corpus; per-doc sum/mean of ln p_t(w) - ln p_s(w), add-1 smoothed
    over the union vocabulary."""
    from mpds_spark.operators.text import dsir_logratio

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    out = dsir_logratio(docs, target, alpha=1.0)
    return out.select(
        "doc_id",
        "n_words",
        _r6("dsir_logweight").alias("dsir_logweight"),
        _r6("dsir_logweight_mean").alias("dsir_logweight_mean"),
    )


SQL_DSIR_WEIGHTS = """
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), tw AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE source = 'src0'
), cs AS (SELECT word, count(*) AS cs FROM w GROUP BY word),
ct AS (SELECT word, count(*) AS ct FROM tw GROUP BY word),
vocab AS (
  SELECT coalesce(cs.word, ct.word) AS word,
    coalesce(cs.cs, 0) AS cs, coalesce(ct.ct, 0) AS ct
  FROM cs FULL OUTER JOIN ct ON cs.word = ct.word
), t AS (
  SELECT sum(cs) AS ns, sum(ct) AS nt, count(*) AS v FROM vocab
), lr AS (
  SELECT word,
    ln((ct + 1.0) / (t.nt + 1.0 * t.v)) - ln((cs + 1.0) / (t.ns + 1.0 * t.v))
      AS lr
  FROM vocab CROSS JOIN t
)
SELECT w.doc_id, count(*) AS n_words,
  round(sum(lr.lr), 6) AS dsir_logweight,
  round(avg(lr.lr), 6) AS dsir_logweight_mean
FROM w JOIN lr USING (word)
GROUP BY w.doc_id
"""

QUERIES["dsir_weights"] = q_dsir_weights
_RAW_ORACLES["dsir_weights"] = SQL_DSIR_WEIGHTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-group Bernoulli sample of documents (content-hash
    threshold, layout/engine-independent) with a per-source rate dict that
    also acts as a whitelist; per-group kept counts prove the selection."""
    from mpds_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 1.0}, group="source"
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
    )


SQL_STRATIFIED_SAMPLE = """
WITH f(source, frac) AS (
  VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 1.0)
), d AS (
  SELECT d.source, d.n_chars,
    CAST(('0x' || substr(md5('strat|' || d.source || '|'
        || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u,
    f.frac
  FROM documents d JOIN f USING (source)
)
SELECT source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM d WHERE u < frac GROUP BY source
"""

QUERIES["stratified_sample"] = q_stratified_sample
_RAW_ORACLES["stratified_sample"] = SQL_STRATIFIED_SAMPLE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_centroid_outliers(spark, sf_dir):
    """Embedding outlier scoring vs per-label centroids (SemDeDup-style
    semantic-pruning signal): cosine of each vector to its label's mean
    vector; fit is the only exploded pass, scoring is an explosion-free
    broadcast join + JVM zip_with."""
    from mpds_spark.operators.similarity import centroid_outlier_scores

    emb = load(spark, sf_dir, "embeddings")
    out = centroid_outlier_scores(emb, group="label")
    return out.select(
        "vec_id", "label", _r6("centroid_cos").alias("centroid_cos")
    )


SQL_CENTROID_OUTLIERS = """
WITH e AS (
  SELECT vec_id, label,
    generate_subscripts(embedding, 1) AS pos,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), c AS (
  SELECT label, pos, avg(x) AS cx FROM e GROUP BY label, pos
), d AS (
  SELECT e.vec_id, e.label,
    sum(e.x * c.cx) AS dot,
    sum(e.x * e.x) AS nx,
    sum(c.cx * c.cx) AS nc
  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
  GROUP BY e.vec_id, e.label
)
SELECT vec_id, label,
  round(dot / (sqrt(nx) * sqrt(nc)), 6) AS centroid_cos
FROM d
"""

QUERIES["centroid_outliers"] = q_centroid_outliers
_RAW_ORACLES["centroid_outliers"] = SQL_CENTROID_OUTLIERS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_source_stats(spark, sf_dir):
    """Mixture audit: per-source document/token totals, mean and EXACT
    median doc length (distributed bracketed grouped quantile), and
    per-source vocabulary size — the report a curator reads before
    setting mixture budgets."""
    from mpds_spark.operators.dedup import words_col

    docs = load(spark, sf_dir, "documents")
    lens = docs.select(
        "source", F.size(words_col("text")).cast("long").alias("n_tok")
    )
    # n_tok is a low-cardinality integer per source, so the EXACT median
    # comes from a (source, n_tok) count frame + one cumulative window —
    # not the bracketed-quantile machinery (r4 plan was 8 exchanges +
    # 6 broadcast joins; this shape is 4 exchanges total). n_docs/
    # n_tokens/mean fold into the same frame, so the stats leg is
    # exchange(source,n_tok) -> exchange(source) [window, and the final
    # groupBy reuses that partitioning], and the vocab leg is 2 more.
    cnts = lens.groupBy("source", "n_tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = cnts.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("source"))
    )
    # quantile_cont(0.5): zero-based rank h = (n-1)/2; linear interpolation
    # between the values at floor(h) and ceil(h).
    i0 = F.floor((F.col("n") - 1) / 2)
    stats = c.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum(F.col("n_tok") * F.col("cnt")).alias("n_tokens"),
        _r6(F.sum(F.col("n_tok") * F.col("cnt")) / F.sum("cnt")).alias(
            "mean_tok"
        ),
        F.min(F.when(F.col("cum") >= i0 + 1, F.col("n_tok"))).alias("__v0"),
        F.min(F.when(F.col("cum") >= i0 + 2, F.col("n_tok"))).alias("__v1"),
    )
    h = (F.col("n_docs") - 1) / F.lit(2.0)
    frac = h - F.floor(h)
    median = F.col("__v0").cast("double") + frac * (
        F.coalesce("__v1", "__v0") - F.col("__v0")
    )
    vocab = (
        docs.select("source", F.explode(words_col("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.lit(1))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    return stats.join(vocab, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "mean_tok",
        median.alias("median_tok"),
        "vocab_size",
    )


SQL_SOURCE_STATS = """
WITH l AS (
  SELECT source, doc_id,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents
), a AS (
  SELECT source, count(*) AS n_docs,
    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
    round(avg(n_tok), 6) AS mean_tok,
    quantile_cont(n_tok, 0.5) AS median_tok
  FROM l GROUP BY source
), v AS (
  SELECT source, count(DISTINCT word) AS vocab_size
  FROM (
    SELECT source,
      unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents
  ) GROUP BY source
)
SELECT a.source, a.n_docs, a.n_tokens, a.mean_tok, a.median_tok,
  v.vocab_size
FROM a JOIN v ON a.source = v.source
"""

QUERIES["source_stats"] = q_source_stats
_RAW_ORACLES["source_stats"] = SQL_SOURCE_STATS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def _stream_dir(sf_dir, name):
    """File-source streaming needs a DIRECTORY; the testdata tables are
    single parquet files — symlink one into a per-(sf,table) temp dir.

    The dir name hashes the FULL absolute sf_dir so two datasets whose
    paths share a basename (/a/sf0.01 vs /b/sf0.01) never reuse each
    other's symlink, and an existing link is verified to point at the
    requested target before reuse (r4 ADVICE)."""
    import hashlib
    import os
    import tempfile

    target = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    tag = hashlib.sha256(target.encode()).hexdigest()[:12]
    d = os.path.join(
        tempfile.gettempdir(),
        f"mpds_stream_{os.path.basename(sf_dir.rstrip('/'))}_{name}_{tag}",
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    if os.path.islink(link) and os.readlink(link) != target:
        os.unlink(link)
    if not os.path.exists(link):
        try:
            os.symlink(target, link)
        except FileExistsError:
            pass  # concurrent process won the race — same target
    return d


def q_streaming_sessions(spark, sf_dir):
    """Structured Streaming gap sessionization run THROUGH the streaming
    engine (file source -> session_window agg -> memory sink, complete
    mode, availableNow): one row per (user, session) with bounds and
    aggregates. Deterministic over a finite input, so the batch gap-rule
    SQL is an exact oracle — the driver row that pins the streaming tier,
    not just its pytest batch-equivalence twin."""
    from mpds_spark.streaming.sessions import session_agg

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "events")
    )
    agg = session_agg(
        stream, gap="30 minutes", entity="user_id", ts="ts", value="value"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mpds_q_streaming_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("mpds_q_streaming_sessions")
    # epoch-second doubles, not raw timestamps: pandas materializes Spark
    # NTZ as datetime64[ns] but DuckDB as [us], so the gate's int64 canon
    # would compare mismatched units (same convention as every ts query)
    return out.select(
        "user_id",
        F.col("session_start")
        .cast("timestamp")
        .cast("double")
        .alias("session_start"),
        F.col("session_end")
        .cast("timestamp")
        .cast("double")
        .alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
        _r6("sum_value").alias("sum_value"),
    )


SQL_STREAMING_SESSIONS = """
WITH m AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, value,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
  epoch(min(ts)) AS session_start,
  epoch(max(ts) + INTERVAL 30 MINUTE) AS session_end,
  count(*) AS n_events,
  round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
"""

QUERIES["streaming_sessions"] = q_streaming_sessions
_RAW_ORACLES["streaming_sessions"] = SQL_STREAMING_SESSIONS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup run THROUGH the streaming engine (stateful
    dropDuplicates on md5(text), availableNow): which row arrives first
    per hash is scheduling-dependent, but the SET of surviving hashes is
    not — project to (text_hash, n_chars-of-survivor? no: hash only) plus
    a count row-invariant: one output row per distinct content."""
    from mpds_spark.streaming.dedup import stream_exact_dedup

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "documents")
    )
    ded = stream_exact_dedup(stream)
    q = (
        ded.select("text_hash")
        .writeStream.format("memory")
        .queryName("mpds_q_streaming_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("mpds_q_streaming_dedup").select("text_hash")


SQL_STREAMING_DEDUP = """
SELECT DISTINCT md5(text) AS text_hash FROM documents
"""

QUERIES["streaming_dedup"] = q_streaming_dedup
_RAW_ORACLES["streaming_dedup"] = SQL_STREAMING_DEDUP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_streaming_asof_enrich(spark, sf_dir):
    """The engine's streaming crown piece run THROUGH the streaming engine
    and value-gated: stateful point-in-time enrichment
    (applyInPandasWithState, one (ts, value) state row per entity) of
    observation events against the latest purchase reference at-or-before
    each observation. Over a finite file source the result equals the
    batch as-of join, so DuckDB's native ASOF JOIN is an exact oracle."""
    from mpds_spark.streaming.stateful import streaming_asof_enrich

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, "events"))
    ev = raw.select(
        F.col("user_id").cast("string").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.when(F.col("event_type") == "purchase", F.lit("ref"))
        .otherwise(F.lit("obs"))
        .alias("kind"),
        F.col("value").cast("double").alias("value"),
    )
    q = (
        streaming_asof_enrich(ev)
        .writeStream.format("memory")
        .queryName("mpds_q_streaming_asof")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("mpds_q_streaming_asof").select(
        "entity_id", "ts", "value", "ref_val", "ref_ts"
    )


SQL_STREAMING_ASOF_ENRICH = """
WITH e AS (
  SELECT CAST(user_id AS VARCHAR) AS entity_id, epoch(ts) AS ts,
    CASE WHEN event_type = 'purchase' THEN 'ref' ELSE 'obs' END AS kind,
    value
  FROM events
), obs AS (SELECT entity_id, ts, value FROM e WHERE kind = 'obs'),
ref AS (SELECT entity_id, ts AS ref_ts, value AS ref_val FROM e
        WHERE kind = 'ref')
SELECT o.entity_id, o.ts, o.value, r.ref_val, r.ref_ts
FROM obs o ASOF LEFT JOIN ref r
  ON o.entity_id = r.entity_id AND o.ts >= r.ref_ts
"""

QUERIES["streaming_asof_enrich"] = q_streaming_asof_enrich
_RAW_ORACLES["streaming_asof_enrich"] = SQL_STREAMING_ASOF_ENRICH
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_streaming_token_budget(spark, sf_dir):
    """Streaming per-source token-budget admission run THROUGH the
    streaming engine (applyInPandasWithState, one running-total state row
    per source): over a finite single-batch source the admitted set is
    exactly the batch sample_token_budget greedy hash-order prefix, so
    the same window SQL is an exact oracle (budget 700, matching the
    batch catalog query)."""
    from mpds_spark.operators.dedup import words_col
    from mpds_spark.streaming.sampling import streaming_token_budget

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "documents")
    )
    docs = raw.select(
        "doc_id",
        "source",
        F.size(words_col("text")).cast("long").alias("n_tok"),
    )
    q = (
        streaming_token_budget(docs, budget=700)
        .writeStream.format("memory")
        .queryName("mpds_q_streaming_budget")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("mpds_q_streaming_budget").select(
        "doc_id", "source", "n_tok", "cum_tok"
    )


QUERIES["streaming_token_budget"] = q_streaming_token_budget
_RAW_ORACLES["streaming_token_budget"] = SQL_SAMPLE_TOKEN_BUDGET
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_streaming_pack(spark, sf_dir):
    """Streaming per-source sequence packing run THROUGH the streaming
    engine (applyInPandasWithState; state = the partial trailing bin per
    source). Over a finite single-batch source the emitted rows are
    exactly the batch concat-and-chunk's FULL bins per source, so the
    windowed SQL packer restricted to full bins is an exact oracle.
    Tokens = per-word lengths (engine-portable int tokenization)."""
    from mpds_spark.streaming.packing import streaming_pack

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "documents")
    )
    docs = raw.select(
        "doc_id",
        "source",
        F.expr(
            "transform(split(trim(text), '\\\\s+'), x -> int(length(x)))"
        ).alias("tokens"),
    )
    q = (
        streaming_pack(docs, length=64)
        .writeStream.format("memory")
        .queryName("mpds_q_streaming_pack")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("mpds_q_streaming_pack")
    return out.select(
        "source",
        "bin_id",
        F.expr("cast(size(tokens) as long)").alias("n_tok_packed"),
        F.col("n_segments").cast("int").alias("n_segments"),
        F.md5(F.concat_ws(" ", F.col("tokens"))).alias("packed_hash"),
    )


SQL_STREAMING_PACK = """
WITH t AS (
  SELECT doc_id, source,
    list_transform(regexp_split_to_array(trim(text), '\\s+'),
                   x -> CAST(length(x) AS INT)) AS ws,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n,
    md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) > 0
), c AS (
  SELECT doc_id, source, ws, n,
    CAST(sum(n) OVER (PARTITION BY source ORDER BY h, doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS s
  FROM t
), p AS (
  SELECT source, ws, n, s,
    unnest(range(s // 64, (s + n - 1) // 64 + 1)) AS bin
  FROM c
), pieces AS (
  SELECT source, bin, s,
    list_slice(ws, CAST(greatest(bin * 64 - s, 0) AS BIGINT) + 1,
               CAST(least(n, (bin + 1) * 64 - s) AS BIGINT)) AS piece
  FROM p
), packed AS (
  SELECT source, bin, list(piece ORDER BY s) AS pl, count(*) AS n_segments
  FROM pieces GROUP BY source, bin
)
SELECT source,
  CAST(bin AS BIGINT) AS bin_id,
  CAST(len(flatten(pl)) AS BIGINT) AS n_tok_packed,
  CAST(n_segments AS INT) AS n_segments,
  md5(coalesce(array_to_string(flatten(pl), ' '), '')) AS packed_hash
FROM packed
WHERE len(flatten(pl)) = 64
"""

QUERIES["streaming_pack"] = q_streaming_pack
_RAW_ORACLES["streaming_pack"] = SQL_STREAMING_PACK
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join on the JVM-only window strategy (r4:
    dual-visibility payload, one sort — previously cogroup-only): every
    event matched to the CLOSEST purchase of its user in either time
    direction, ties to the backward match, exact matches allowed.
    leakage_ok: nearest looks forward — label/eval use only."""
    from mpds_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    purchases = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        F.col("value").alias("pval"),
    )
    out = asof_join(
        ev,
        purchases,
        on="ts",
        by="entity_id",
        direction="nearest",
        leakage_ok=True,
        strategy="window",
    )
    return out.select("event_id", "entity_id", "ts", "pval", "ts_r")


SQL_ASOF_NEAREST = """
WITH e AS (
  SELECT event_id, user_id AS entity_id, epoch(ts) AS ts FROM events
), p AS (
  SELECT user_id AS entity_id, epoch(ts) AS ts, value AS pval FROM events
  WHERE event_type = 'purchase'
)
SELECT e.event_id, e.entity_id, e.ts, r.pval, r.ts AS ts_r
FROM e LEFT JOIN LATERAL (
  SELECT p.pval, p.ts FROM p
  WHERE p.entity_id = e.entity_id
  ORDER BY abs(e.ts - p.ts), p.ts LIMIT 1
) r ON TRUE
"""

QUERIES["asof_nearest"] = q_asof_nearest
_RAW_ORACLES["asof_nearest"] = SQL_ASOF_NEAREST
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_dsir_resample(spark, sf_dir):
    """DSIR end-to-end: importance log-weights vs the src0 target domain,
    then Gumbel top-k importance resampling (the paper's selection step,
    = sampling w/o replacement proportional to the importance weight) —
    the 100 selected docs with their perturbed scores."""
    from mpds_spark.operators.sampling import importance_resample
    from mpds_spark.operators.text import dsir_logratio

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    w = dsir_logratio(docs, target, alpha=1.0).select(
        "doc_id", F.col("dsir_logweight_mean").alias("lw")
    )
    out = importance_resample(w, "lw", n=100)
    return out.select(
        "doc_id", _r6("lw").alias("lw"), _r6("gumbel_score").alias("gumbel_score")
    )


SQL_DSIR_RESAMPLE = """
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), tw AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE source = 'src0'
), cs AS (SELECT word, count(*) AS cs FROM w GROUP BY word),
ct AS (SELECT word, count(*) AS ct FROM tw GROUP BY word),
vocab AS (
  SELECT coalesce(cs.word, ct.word) AS word,
    coalesce(cs.cs, 0) AS cs, coalesce(ct.ct, 0) AS ct
  FROM cs FULL OUTER JOIN ct ON cs.word = ct.word
), t AS (
  SELECT sum(cs) AS ns, sum(ct) AS nt, count(*) AS v FROM vocab
), lr AS (
  SELECT word,
    ln((ct + 1.0) / (t.nt + 1.0 * t.v)) - ln((cs + 1.0) / (t.ns + 1.0 * t.v))
      AS lr
  FROM vocab CROSS JOIN t
), lw AS (
  SELECT w.doc_id, avg(lr.lr) AS lw
  FROM w JOIN lr USING (word) GROUP BY w.doc_id
), g AS (
  SELECT doc_id, lw,
    lw + (-ln(-ln(
      (CAST(('0x' || substr(md5('resample|' || CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) + 0.5) / 4294967296.0
    ))) AS gumbel_score
  FROM lw
)
SELECT doc_id, round(lw, 6) AS lw, round(gumbel_score, 6) AS gumbel_score
FROM g ORDER BY gumbel_score DESC, doc_id LIMIT 100
"""

QUERIES["dsir_resample"] = q_dsir_resample
_RAW_ORACLES["dsir_resample"] = SQL_DSIR_RESAMPLE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. SIGMOD'03, the MOSS
    algorithm) over documents: min 5-gram hash per 4-window, rightmost
    tie-break, full windows, deduped — every selected (position,
    fingerprint) pair value-checked."""
    from mpds_spark.operators.text import winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, n=5, w=4)


SQL_WINNOW_FINGERPRINTS = """
WITH wds AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, ws,
    unnest(range(1, greatest(len(ws) - 5 + 1, 0) + 1)) AS i
  FROM wds WHERE len(ws) >= 5
), h AS (
  SELECT doc_id, i - 1 AS pos,
    md5(array_to_string(list_slice(ws, i, i + 4), ' ')) AS hh
  FROM g
), e AS (
  SELECT doc_id, pos,
    min(hh || lpad(CAST(999999 - pos AS VARCHAR), 6, '0'))
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc,
    count(*) OVER (PARTITION BY doc_id) AS n
  FROM h
)
SELECT DISTINCT doc_id,
  999999 - CAST(substr(enc, 33, 6) AS INT) AS pos,
  substr(enc, 1, 32) AS fingerprint
FROM e WHERE pos <= n - 4 OR pos = 0
"""

QUERIES["winnow_fingerprints"] = q_winnow_fingerprints
_RAW_ORACLES["winnow_fingerprints"] = SQL_WINNOW_FINGERPRINTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_winnow_near_dups(spark, sf_dir):
    """MOSS-style near-dup pairs: docs sharing >= 2 winnowing
    fingerprints (guaranteed for any shared >= w+n-1-word passage),
    frequent-fingerprint guard before the pair join."""
    from mpds_spark.operators.text import winnow_near_dups

    docs = load(spark, sf_dir, "documents")
    return winnow_near_dups(docs, n=5, w=4, min_shared=2)


SQL_WINNOW_NEAR_DUPS = """
WITH wds AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT doc_id, ws,
    unnest(range(1, greatest(len(ws) - 5 + 1, 0) + 1)) AS i
  FROM wds WHERE len(ws) >= 5
), h AS (
  SELECT doc_id, i - 1 AS pos,
    md5(array_to_string(list_slice(ws, i, i + 4), ' ')) AS hh
  FROM g
), e AS (
  SELECT doc_id, pos,
    min(hh || lpad(CAST(999999 - pos AS VARCHAR), 6, '0'))
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc,
    count(*) OVER (PARTITION BY doc_id) AS n
  FROM h
), fp AS (
  SELECT DISTINCT doc_id, substr(enc, 1, 32) AS fingerprint
  FROM e WHERE pos <= n - 4 OR pos = 0
), ok AS (
  SELECT fingerprint FROM fp GROUP BY fingerprint HAVING count(*) <= 1000
), fpo AS (
  SELECT fp.doc_id, fp.fingerprint FROM fp JOIN ok USING (fingerprint)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM fpo a JOIN fpo b USING (fingerprint)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""

QUERIES["winnow_near_dups"] = q_winnow_near_dups
_RAW_ORACLES["winnow_near_dups"] = SQL_WINNOW_NEAR_DUPS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_multimodal_stats(spark, sf_dir):
    """Driver-gated multimodal decode (VERDICT r4 ask #6): 8 PCM-WAV + 8
    24-bit-BMP payloads built from integer (LCG / affine-mod) formulas via
    the real encoders (multimodal.py encode_wav_pcm16/encode_bmp24),
    decoded FOR REAL by the magic-sniffing default_decoder
    (multimodal.py:142), stats extracted through the Arrow mapInPandas map
    stage (decode_features:191). The oracle recomputes the identical stats
    from the generating formulas directly — a true encode -> decode ->
    extract differential. Integer-arithmetic signals keep the audio leg
    bit-exact (samples are dyadic rationals); the image gray divisions
    (/3.0, /255.0) are mirrored op-for-op in the SQL.

    Scale shape: payload decode is a pure map stage pipelined onto the
    scan — payloads never ride a shuffle; only (media_id, kind, stats)
    continue downstream."""
    import numpy as np

    from mpds_spark.operators.multimodal import (
        decode_features,
        encode_bmp24,
        encode_wav_pcm16,
    )

    rows = []
    for mid in range(8):
        n = 2000 + 50 * mid
        t = np.arange(n, dtype=np.int64)
        s = (1103515245 * t + 12345 + mid * 997) % 65536 - 32768
        rows.append(
            (mid, "audio", encode_wav_pcm16(s, 8000), (None, None, 8000, None, None))
        )
    for k in range(8):
        mid, h, w = 8 + k, 16 + k, 24 + k
        r = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(w, dtype=np.int64)[None, :, None]
        ch = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((r * 31 + c * 7 + ch * 5 + mid * 13) % 256).astype(np.uint8)
        rows.append(
            (mid, "image", encode_bmp24(px), (w, h, None, None, None))
        )
    from mpds_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def _extract(arr):
        v = np.asarray(arr, dtype=np.float64).ravel()
        m = v.mean()
        var = v @ v / v.size - m * m
        return np.array([v.size, m, np.sqrt(max(var, 0.0)), v.min(), v.max()])

    out = decode_features(media, _extract)
    f = lambda i: F.element_at("features", i)  # noqa: E731
    return out.select(
        "media_id",
        "kind",
        f(1).cast("long").alias("n"),
        _r6(f(2)).alias("mean_v"),
        _r6(f(3)).alias("std_v"),
        _r6(f(4)).alias("min_v"),
        _r6(f(5)).alias("max_v"),
    )


SQL_MULTIMODAL_STATS = """
WITH am AS (SELECT unnest(range(8)) AS mid),
audio AS (
  SELECT mid AS media_id,
         ((1103515245*t + 12345 + mid*997) % 65536 - 32768)/32768.0 AS v
  FROM (SELECT mid, unnest(range(2000 + 50*mid)) AS t FROM am)
),
im AS (SELECT unnest(range(8)) AS k),
imrc AS (
  SELECT k, rr // (24 + k) AS r, rr % (24 + k) AS c
  FROM (SELECT k, unnest(range((16 + k) * (24 + k))) AS rr FROM im)
),
img AS (
  SELECT 8 + k AS media_id,
         (((r*31 + c*7 + 0*5 + (8+k)*13) % 256)
        + ((r*31 + c*7 + 1*5 + (8+k)*13) % 256)
        + ((r*31 + c*7 + 2*5 + (8+k)*13) % 256))/3.0/255.0 AS v
  FROM imrc
),
allv AS (
  SELECT media_id, 'audio' AS kind, v FROM audio
  UNION ALL SELECT media_id, 'image' AS kind, v FROM img
)
SELECT media_id, kind, count(*) AS n,
       round(avg(v), 6) AS mean_v,
       round(sqrt(avg(v*v) - avg(v)*avg(v)), 6) AS std_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM allv GROUP BY media_id, kind
"""

QUERIES["multimodal_stats"] = q_multimodal_stats
_RAW_ORACLES["multimodal_stats"] = SQL_MULTIMODAL_STATS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_tokenized_asof_features(spark, sf_dir):
    """The north-rule composition as ONE driver-gated row: a tokenized-
    sequence table (doc_id, tokens, n_tok, source — the BASELINE.json
    input_hint shape, derived deterministically from documents), per-
    sequence token-mass features computed JVM-side (F.aggregate — no
    Python), expanding per-entity derived features (windows.py:64, one
    entity exchange), then a backward point-in-time as-of join
    (asof.py:121, window strategy) against the entity event stream.
    Token arrays pass through byte-identical (md5 proof column).

    Oracle: the same pipeline in ANSI SQL — windows in identical ts order
    (bit-equal float accumulation) + DuckDB native ASOF JOIN."""
    docs = load(spark, sf_dir, "documents")
    seq = (
        docs.select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens"))
        .withColumn("entity_id", F.col("doc_id") % 16)
        .withColumn("ts", F.col("doc_id").cast("double"))
        .withColumn(
            "tok_mass",
            F.aggregate(
                "tokens", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ),
        )
    )
    der = derived_features(
        seq.withColumn("dss", F.col("n_tok").cast("double")), value="dss"
    )
    events = seq.filter(F.col("doc_id") % 10 == 0).select(
        "entity_id", "ts", F.col("tok_mass").alias("event_mass")
    )
    out = asof_join(der, events, on="ts", by="entity_id")
    return out.select(
        "doc_id",
        "entity_id",
        "n_tok",
        "tok_mass",
        _r6("dss_avg").alias("avg_n_tok"),
        F.col("dss_max").alias("max_n_tok"),
        _r6("dss_rate_avg").alias("rate_avg"),
        "event_mass",
        F.col("ts_r").alias("event_ts"),
        F.md5(F.concat_ws(" ", "tokens")).alias("tok_hash"),
    )


SQL_TOKENIZED_ASOF_FEATURES = """
WITH s AS (
  SELECT doc_id, doc_id % 16 AS entity_id, CAST(doc_id AS DOUBLE) AS ts,
         ws, len(ws) AS n_tok,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT)
           AS tok_mass
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
        FROM documents)
), f AS (
  SELECT *, CAST(n_tok AS DOUBLE) AS dss,
    CAST(row_number() OVER w AS DOUBLE) AS rn,
    sum(CAST(n_tok AS DOUBLE)) OVER we AS cs,
    max(CAST(n_tok AS DOUBLE)) OVER we AS dss_max,
    coalesce(CAST(n_tok AS DOUBLE) - lag(CAST(n_tok AS DOUBLE)) OVER w, 0.0)
      AS sd,
    coalesce(abs(ts - lag(ts) OVER w), 1.0) AS dt
  FROM s
  WINDOW w AS (PARTITION BY entity_id ORDER BY ts),
         we AS (PARTITION BY entity_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
), g AS (
  SELECT *, sum(sd/dt)
    OVER (PARTITION BY entity_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
    AS cs_rate
  FROM f
)
SELECT g.doc_id, g.entity_id, g.n_tok, g.tok_mass,
  round(cs/rn, 6) AS avg_n_tok,
  dss_max AS max_n_tok,
  round(cs_rate/rn, 6) AS rate_avg,
  e.event_mass, e.ts AS event_ts,
  md5(coalesce(array_to_string(g.ws, ' '), '')) AS tok_hash
FROM g ASOF LEFT JOIN
  (SELECT entity_id, ts, tok_mass AS event_mass FROM s
   WHERE doc_id % 10 = 0) e
  ON g.entity_id = e.entity_id AND g.ts >= e.ts
"""

QUERIES["tokenized_asof_features"] = q_tokenized_asof_features
_RAW_ORACLES["tokenized_asof_features"] = SQL_TOKENIZED_ASOF_FEATURES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_token_ngram_novelty(spark, sf_dir):
    """Novel-bigram rate per document vs all earlier documents
    (operators/text.py ngram_novelty): occurrence-linear min-owner
    aggregation — no doc-pair join, no window over the (skew-prone)
    n-gram key."""
    from mpds_spark.operators.text import ngram_novelty

    docs = load(spark, sf_dir, "documents")
    out = ngram_novelty(docs, text="text", id_col="doc_id", n=2)
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_novel",
        _r6("novelty").alias("novelty"),
    )


SQL_TOKEN_NGRAM_NOVELTY = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), b AS (
  SELECT DISTINCT doc_id, bg FROM (
    SELECT doc_id,
      unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
        AS bg
    FROM t WHERE len(ws) >= 2)
), nb AS (SELECT doc_id, count(*) AS n_ngrams FROM b GROUP BY doc_id),
fo AS (SELECT bg, min(doc_id) AS doc_id FROM b GROUP BY bg),
nn AS (SELECT doc_id, count(*) AS n_novel FROM fo GROUP BY doc_id)
SELECT nb.doc_id, nb.n_ngrams,
  coalesce(nn.n_novel, 0) AS n_novel,
  round(coalesce(nn.n_novel, 0)/CAST(nb.n_ngrams AS DOUBLE), 6) AS novelty
FROM nb LEFT JOIN nn USING (doc_id)
"""

QUERIES["token_ngram_novelty"] = q_token_ngram_novelty
_RAW_ORACLES["token_ngram_novelty"] = SQL_TOKEN_NGRAM_NOVELTY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_suffix_prefix_overlap(spark, sf_dir):
    """Packing-boundary suffix/prefix overlap between consecutive docs in
    the per-source packing stream order (operators/pairs.py
    suffix_prefix_overlap): per-source window + JVM higher-order compare,
    k <= 8."""
    from mpds_spark.operators.pairs import suffix_prefix_overlap

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.trim("text"), r"\s+").alias("tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    out = suffix_prefix_overlap(
        docs, tokens="tokens", part="source", order_cols=["h", "doc_id"]
    )
    return out.select(
        "source",
        "doc_id",
        F.size("tokens").cast("int").alias("n_tok"),
        F.col("n_tok_next").cast("int").alias("n_tok_next"),
        F.col("overlap").cast("int").alias("overlap"),
    )


SQL_SUFFIX_PREFIX_OVERLAP = """
WITH t AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS ws,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), p AS (
  SELECT source, doc_id, ws, len(ws) AS n1,
    lead(doc_id) OVER w AS next_doc_id,
    lead(ws) OVER w AS ws2
  FROM t WINDOW w AS (PARTITION BY source ORDER BY h, doc_id)
)
SELECT source, doc_id,
  CAST(n1 AS INT) AS n_tok,
  CAST(len(ws2) AS INT) AS n_tok_next,
  CAST(list_max(list_transform(range(1, 9), k ->
    CASE WHEN n1 >= k AND len(ws2) >= k
          AND ws[n1 - k + 1 : n1] = ws2[1 : k]
    THEN k ELSE 0 END)) AS INT) AS overlap
FROM p WHERE next_doc_id IS NOT NULL
"""

QUERIES["suffix_prefix_overlap"] = q_suffix_prefix_overlap
_RAW_ORACLES["suffix_prefix_overlap"] = SQL_SUFFIX_PREFIX_OVERLAP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_vocab_coverage(spark, sf_dir):
    """Per-source OOV rate against the global top-200 word vocabulary
    (operators/text.py vocab_coverage): TakeOrdered top-k + broadcast
    membership — never a global sort, never a shuffled join on the token
    stream."""
    from mpds_spark.operators.text import vocab_coverage

    docs = load(spark, sf_dir, "documents")
    out = vocab_coverage(docs, text="text", group="source", vocab_size=200)
    return out.select(
        "source",
        "n_tokens",
        "oov_tokens",
        _r6("oov_rate").alias("oov_rate"),
    )


SQL_VOCAB_COVERAGE = """
WITH w AS (
  SELECT source,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), v AS (
  SELECT word FROM (SELECT word, count(*) AS c FROM w GROUP BY word)
  ORDER BY c DESC, word LIMIT 200
)
SELECT w.source,
  count(*) AS n_tokens,
  sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS oov_tokens,
  round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM w LEFT JOIN v USING (word) GROUP BY w.source
"""

QUERIES["vocab_coverage"] = q_vocab_coverage
_RAW_ORACLES["vocab_coverage"] = SQL_VOCAB_COVERAGE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_bigram_nll(spark, sf_dir):
    """Per-doc add-1 bigram LM negative log-likelihood, trained on the
    corpus itself (operators/text.py bigram_logprob_score): the
    local-coherence upgrade of unigram_nll. Occurrence-linear; context
    counts derived FROM the bigram counts (one corpus pass)."""
    from mpds_spark.operators.text import bigram_logprob_score

    docs = load(spark, sf_dir, "documents")
    out = bigram_logprob_score(docs, text="text", key="doc_id", alpha=1.0)
    return out.select(
        "doc_id", "n_bigrams", _r6("bigram_nll").alias("bigram_nll")
    )


SQL_BIGRAM_NLL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), occ AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ws)), i ->
      struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b
  FROM t WHERE len(ws) >= 2
), o2 AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM occ),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM o2 GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS v FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents)
)
SELECT doc_id, count(*) AS n_bigrams,
  round(avg(-ln((c12 + 1.0) / (c1 + 1.0 * v))), 6) AS bigram_nll
FROM o2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY doc_id
"""

QUERIES["bigram_nll"] = q_bigram_nll
_RAW_ORACLES["bigram_nll"] = SQL_BIGRAM_NLL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_tfidf_top_terms(spark, sf_dir):
    """Per-source top-5 salient terms by tf-idf (operators/text.py
    tfidf_top_terms): the mixture-audit complement of vocab_coverage.
    Ranked on the ROUNDED score (duck_round, 6 digits) so near-ties break
    on the term, stably across engines."""
    from mpds_spark.operators.text import tfidf_top_terms

    docs = load(spark, sf_dir, "documents")
    out = tfidf_top_terms(
        docs, text="text", group="source", id_col="doc_id", k=5,
        rank_round=6,
    )
    return out.select(
        "source",
        F.col("rank").cast("int").alias("rank"),
        "term",
        "tf",
        "df",
        _r6("tfidf").alias("tfidf"),
    )


SQL_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT source, doc_id,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), tf AS (SELECT source, w, count(*) AS tf FROM toks GROUP BY source, w),
dfq AS (
  SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM toks)
  GROUP BY w
), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
s AS (
  SELECT source, w, tf, df,
    tf * (ln((1.0 + n) / (1.0 + df)) + 1.0) AS tfidf
  FROM tf JOIN dfq USING (w) CROSS JOIN nd
), r AS (
  SELECT source, w, tf, df, tfidf,
    row_number() OVER (
      PARTITION BY source ORDER BY round(tfidf, 6) DESC, w ASC) AS rank
  FROM s
)
SELECT source, CAST(rank AS INT) AS rank, w AS term, tf, df,
  round(tfidf, 6) AS tfidf
FROM r WHERE rank <= 5
"""

QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
_RAW_ORACLES["tfidf_top_terms"] = SQL_TFIDF_TOP_TERMS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_domain_cap(spark, sf_dir):
    """Per-source frequency cap at 10 docs (operators/sampling.py
    cap_per_group): C4/RefinedWeb-style per-domain cap with a
    deterministic md5 priority; the naive global window is replaced by a
    verified hash prefilter so the hottest domain's sort is bounded by
    ~guard*n rows, not the domain size."""
    from mpds_spark.operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents").select("source", "doc_id")
    return cap_per_group(
        docs, group="source", key="doc_id", n=10, seed="cap"
    ).select("source", "doc_id")


SQL_DOMAIN_CAP = """
WITH d AS (
  SELECT source, doc_id,
    md5(concat('cap', '|', source, '|', CAST(doc_id AS VARCHAR))) AS u
  FROM documents
), r AS (
  SELECT source, doc_id,
    row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rk
  FROM d
)
SELECT source, doc_id FROM r WHERE rk <= 10
"""

QUERIES["domain_cap"] = q_domain_cap
_RAW_ORACLES["domain_cap"] = SQL_DOMAIN_CAP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_cross_source_overlap(spark, sf_dir):
    """Pairwise 8-gram contamination matrix between sources
    (operators/text.py cross_group_ngram_overlap): distinct-first, so the
    n-gram self-join is bounded at |sources| rows per key and cannot
    skew. Output is |sources|^2-bounded."""
    from mpds_spark.operators.text import cross_group_ngram_overlap

    docs = load(spark, sf_dir, "documents")
    out = cross_group_ngram_overlap(docs, text="text", group="source", n=8)
    return out.select(
        "g1",
        "g2",
        "shared",
        "n1",
        "n2",
        _r6("jaccard").alias("jaccard"),
        _r6("containment").alias("containment"),
    )


SQL_CROSS_SOURCE_OVERLAP = """
WITH t AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), g AS (
  SELECT DISTINCT source AS g,
    unnest(list_transform(range(1, len(ws) - 6), i ->
      array_to_string(ws[i:i+7], ' '))) AS gm
  FROM t WHERE len(ws) >= 8
), sizes AS (SELECT g, count(*) AS n FROM g GROUP BY g),
inter AS (
  SELECT a.g AS g1, b.g AS g2, count(*) AS shared
  FROM g a JOIN g b USING (gm) WHERE a.g < b.g GROUP BY a.g, b.g
)
SELECT g1, g2, shared, s1.n AS n1, s2.n AS n2,
  round(shared / CAST(s1.n + s2.n - shared AS DOUBLE), 6) AS jaccard,
  round(shared / CAST(least(s1.n, s2.n) AS DOUBLE), 6) AS containment
FROM inter
JOIN sizes s1 ON s1.g = inter.g1
JOIN sizes s2 ON s2.g = inter.g2
"""

QUERIES["cross_source_overlap"] = q_cross_source_overlap
_RAW_ORACLES["cross_source_overlap"] = SQL_CROSS_SOURCE_OVERLAP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_incremental_dedup(spark, sf_dir):
    """Incremental batch admission vs an existing corpus
    (operators/dedup.py incremental_keep): documents split at
    max(doc_id)//2 into corpus (old half) and batch (new half); every
    batch doc flagged batch_dup / exact_dup / near_dup (LSH candidates ->
    exact-Jaccard verify, batch-vs-corpus joins only) / keep."""
    from mpds_spark.operators.dedup import incremental_keep

    docs = load(spark, sf_dir, "documents")
    half = docs.agg((F.max("doc_id") / 2).cast("long")).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") <= half)
    batch = docs.filter(F.col("doc_id") > half)
    return incremental_keep(
        batch, corpus, text="text", key="doc_id", k=8, band_size=2, n=3,
        threshold=0.5,
    ).select("doc_id", "batch_dup", "exact_dup", "near_dup", "keep")


SQL_INCREMENTAL_DEDUP = f"""
WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
sh AS ({{shingle}}),
newd AS (
  SELECT doc_id, md5(text) AS th FROM documents, half WHERE doc_id > h
),
oldh AS (
  SELECT DISTINCT md5(text) AS th FROM documents, half WHERE doc_id <= h
),
first AS (SELECT th, min(doc_id) AS f FROM newd GROUP BY th),
sig AS (
  SELECT doc_id,
    {", ".join(f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(8))}
  FROM sh GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {bi} AS band, h{2*bi} || '|' || h{2*bi+1} AS bh FROM sig"
      for bi in range(4))}
),
cand AS (
  SELECT DISTINCT n.doc_id AS nb, o.doc_id AS ob
  FROM bands n JOIN bands o ON n.band = o.band AND n.bh = o.bh, half
  WHERE n.doc_id > h AND o.doc_id <= h
),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
common AS (
  SELECT c.nb, c.ob, count(*) AS nc
  FROM cand c
  JOIN sh a ON a.doc_id = c.nb
  JOIN sh b ON b.doc_id = c.ob AND b.shingle = a.shingle
  GROUP BY c.nb, c.ob
),
near AS (
  SELECT DISTINCT c.nb AS doc_id
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.nb
  JOIN sizes sb ON sb.doc_id = c.ob
  WHERE c.nc / CAST(sa.ns + sb.ns - c.nc AS DOUBLE) >= 0.5
)
SELECT d.doc_id,
  (d.doc_id <> f.f) AS batch_dup,
  (o.th IS NOT NULL) AS exact_dup,
  (nr.doc_id IS NOT NULL) AS near_dup,
  (d.doc_id = f.f AND o.th IS NULL AND nr.doc_id IS NULL) AS keep
FROM newd d
JOIN first f USING (th)
LEFT JOIN oldh o ON o.th = d.th
LEFT JOIN near nr ON nr.doc_id = d.doc_id
""".format(shingle=_SHINGLE_SQL)

QUERIES["incremental_dedup"] = q_incremental_dedup
_RAW_ORACLES["incremental_dedup"] = SQL_INCREMENTAL_DEDUP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_boilerplate_segments(spark, sf_dir):
    """Corpus-frequent segment removal, the line-dedup stage of CCNet /
    RefinedWeb (operators/text.py remove_boilerplate_segments): docs split
    into 5-word segments; a segment occurring in >= 2 distinct docs of the
    same source is boilerplate and removed from every doc."""
    from mpds_spark.operators.text import remove_boilerplate_segments

    docs = load(spark, sf_dir, "documents")
    return remove_boilerplate_segments(docs, seg_words=5, min_docs=2)


SQL_BOILERPLATE_SEGMENTS = """
WITH w AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
),
seg AS (
  SELECT doc_id, source, i AS pos,
         array_to_string(words[(i*5+1):(i*5+5)], ' ') AS seg
  FROM w, LATERAL (SELECT unnest(range((len(words)+4)//5)) AS i) t
),
bp AS (
  SELECT source, seg FROM seg GROUP BY source, seg
  HAVING count(DISTINCT doc_id) >= 2
),
fl AS (
  SELECT s.doc_id, s.pos, s.seg, (b.seg IS NOT NULL) AS bp
  FROM seg s LEFT JOIN bp b ON b.source = s.source AND b.seg = s.seg
)
SELECT doc_id,
  count(*) AS n_seg,
  CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(sum(CASE WHEN NOT bp THEN len(regexp_split_to_array(seg, '\\s+'))
           ELSE 0 END) AS BIGINT) AS n_words_clean,
  coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT bp), '')
    AS text_clean
FROM fl GROUP BY doc_id
"""

QUERIES["boilerplate_segments"] = q_boilerplate_segments
_RAW_ORACLES["boilerplate_segments"] = SQL_BOILERPLATE_SEGMENTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_quality_classifier(spark, sf_dir):
    """Hashed linear quality classifier with frozen deterministic weights
    (operators/text.py classifier_quality_score): per-word bucket hash ->
    integer weight sum -> mean-weight score -> rational fast-sigmoid
    keep-probability. Zero-shuffle map plan."""
    from mpds_spark.operators.text import classifier_quality_score

    docs = load(spark, sf_dir, "documents")
    out = classifier_quality_score(docs, n_buckets=4096)
    return out.select(
        "doc_id", "n_words", "sum_w",
        _r6("score").alias("score"), _r6("prob").alias("prob"), "label",
    )


SQL_QUALITY_CLASSIFIER = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
),
s AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
    CAST(list_sum(list_transform(words, x ->
      CAST((('0x' || substring(md5(x), 1, 8))::UBIGINT % 4096) % 1001
           AS BIGINT) - 500)) AS BIGINT) AS sum_w
  FROM w
),
sc AS (SELECT *, sum_w / (500.0 * n_words) AS s0 FROM s)
SELECT doc_id, n_words, sum_w,
  round(s0, 6) AS score,
  round(0.5 + 0.5 * s0 / (1.0 + abs(s0)), 6) AS prob,
  (sum_w >= 0) AS label
FROM sc
"""

QUERIES["quality_classifier"] = q_quality_classifier
_RAW_ORACLES["quality_classifier"] = SQL_QUALITY_CLASSIFIER
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_semdedup_keep(spark, sf_dir):
    """SemDeDup semantic-pruning keep-list (operators/similarity.py
    semdedup_keep): nearest-centroid assignment over the 8 lowest-id
    vectors as deterministic stand-in centroids, then within-cluster
    keep-min-id pruning at cosine >= 0.35."""
    from mpds_spark.operators.similarity import semdedup_keep

    emb = load(spark, sf_dir, "embeddings")
    out = semdedup_keep(emb, n_clusters=8, threshold=0.35)
    return out.select(
        "vec_id", "cluster", _r6("max_cos_prev").alias("max_cos_prev"), "keep"
    )


SQL_SEMDEDUP_KEEP = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
         FROM e ORDER BY vec_id LIMIT 8),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.cv) / sqrt(list_dot_product(c.cv, c.cv))
        DESC, c.cid) AS rk
    FROM e CROSS JOIN cent c) WHERE rk = 1
),
prev AS (
  SELECT b.vec_id AS ib,
    max(list_dot_product(ea.v, eb.v)
        / sqrt(list_dot_product(ea.v, ea.v))
        / sqrt(list_dot_product(eb.v, eb.v))) AS m
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  GROUP BY b.vec_id
)
SELECT g.vec_id, g.cid AS cluster,
  round(p.m, 6) AS max_cos_prev,
  coalesce(p.m < 0.35, TRUE) AS keep
FROM asg g LEFT JOIN prev p ON p.ib = g.vec_id
"""

QUERIES["semdedup_keep"] = q_semdedup_keep
_RAW_ORACLES["semdedup_keep"] = SQL_SEMDEDUP_KEEP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ann_recall_audit(spark, sf_dir):
    """Per-query recall@3 of the LSH ANN path vs exact brute-force top-3
    (operators/similarity.py ann_recall_audit) over the 5 lowest-id
    query vectors — the self-audit that gates trusting the approximate
    index on a new corpus."""
    from mpds_spark.operators.similarity import ann_recall_audit

    emb = load(spark, sf_dir, "embeddings")
    out = ann_recall_audit(emb, emb.filter(F.col("vec_id") < 5), k=3, bits=4)
    return out.select(
        "query_id", "n_exact", "n_lsh", "n_hit", _r6("recall").alias("recall")
    )


SQL_ANN_RECALL_AUDIT = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS code
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, code FROM base WHERE vec_id < 5
), ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY
        list_dot_product(qv, b.v) / sqrt(list_dot_product(qv, qv))
          / sqrt(list_dot_product(b.v, b.v)) DESC, b.vec_id) AS rank
    FROM q, base b WHERE query_id <> b.vec_id
  ) WHERE rank <= 3
), ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY
        list_dot_product(qv, b.v) / sqrt(list_dot_product(qv, qv))
          / sqrt(list_dot_product(b.v, b.v)) DESC, b.vec_id) AS rank
    FROM q JOIN base b USING (code) WHERE query_id <> b.vec_id
  ) WHERE rank <= 3
), perq AS (
  SELECT e.query_id,
    CAST(count(*) AS BIGINT) AS n_exact,
    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_hit
  FROM ex e LEFT JOIN ap a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
), nl AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_lsh FROM ap GROUP BY query_id
)
SELECT p.query_id, p.n_exact, coalesce(nl.n_lsh, 0) AS n_lsh, p.n_hit,
  round(p.n_hit / 3.0, 6) AS recall
FROM perq p LEFT JOIN nl USING (query_id)
"""

QUERIES["ann_recall_audit"] = q_ann_recall_audit
_RAW_ORACLES["ann_recall_audit"] = SQL_ANN_RECALL_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_zipf_fit(spark, sf_dir):
    """Per-source Zipf rank-frequency fit (operators/text.py zipf_fit):
    ln-ln least squares over each source's top-64 words; slope drift from
    ~-1 flags templated/machine text before mixing a dump."""
    from mpds_spark.operators.text import zipf_fit

    docs = load(spark, sf_dir, "documents")
    out = zipf_fit(docs, top_v=64)
    return out.select(
        "source",
        "n_vocab",
        _r6("zipf_slope").alias("zipf_slope"),
        _r6("zipf_intercept").alias("zipf_intercept"),
    )


SQL_ZIPF_FIT = """
WITH w AS (
  SELECT source AS g, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
),
c AS (SELECT g, word, count(*) AS c FROM w GROUP BY g, word),
t AS (
  SELECT g, word, c,
    row_number() OVER (PARTITION BY g ORDER BY c DESC, word) AS r
  FROM c
),
top AS (SELECT * FROM t WHERE r <= 64),
a AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_vocab,
    list_sum(list(ln(r::DOUBLE) ORDER BY r)) AS sx,
    list_sum(list(ln(c::DOUBLE) ORDER BY r)) AS sy,
    list_sum(list(ln(r::DOUBLE) * ln(r::DOUBLE) ORDER BY r)) AS sxx,
    list_sum(list(ln(r::DOUBLE) * ln(c::DOUBLE) ORDER BY r)) AS sxy
  FROM top GROUP BY g
)
SELECT g AS source, n_vocab,
  round(CASE WHEN n_vocab * sxx - sx * sx <> 0 THEN
    (n_vocab * sxy - sx * sy) / (n_vocab * sxx - sx * sx) END, 6)
    AS zipf_slope,
  round(CASE WHEN n_vocab * sxx - sx * sx <> 0 THEN
    (sy - ((n_vocab * sxy - sx * sy) / (n_vocab * sxx - sx * sx)) * sx)
      / n_vocab END, 6) AS zipf_intercept
FROM a
"""

QUERIES["zipf_fit"] = q_zipf_fit
_RAW_ORACLES["zipf_fit"] = SQL_ZIPF_FIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_length_ks_drift(spark, sf_dir):
    """Per-source two-sample KS drift of the word-length distribution vs
    the rest of the corpus (operators/validate.py length_ks_drift) — the
    mixture-shift alarm run per ingested dump."""
    from mpds_spark.operators.validate import length_ks_drift

    docs = load(spark, sf_dir, "documents")
    out = length_ks_drift(docs)
    return out.select("source", "n_docs", _r6("ks_stat").alias("ks_stat"))


SQL_LENGTH_KS_DRIFT = """
WITH d AS (
  SELECT source AS g,
    len(regexp_split_to_array(trim(text), '\\s+')) AS l
  FROM documents
),
cg AS (SELECT g, l, count(*) AS c FROM d GROUP BY g, l),
lens AS (SELECT DISTINCT l FROM cg),
grp AS (SELECT g, sum(c) AS n_g FROM cg GROUP BY g),
tot AS (SELECT count(*) AS n_all FROM d),
grid AS (SELECT grp.g, grp.n_g, lens.l FROM grp CROSS JOIN lens),
filled AS (
  SELECT grid.g, grid.l, grid.n_g, coalesce(cg.c, 0) AS c
  FROM grid LEFT JOIN cg ON cg.g = grid.g AND cg.l = grid.l
),
ca AS (
  SELECT l, sum(sum(c)) OVER (ORDER BY l) AS cum_all
  FROM cg GROUP BY l
),
cum AS (
  SELECT f.g, f.n_g, f.l,
    sum(f.c) OVER (PARTITION BY f.g ORDER BY f.l) AS cum_g,
    ca.cum_all
  FROM filled f JOIN ca USING (l)
)
SELECT g AS source, CAST(n_g AS BIGINT) AS n_docs,
  round(max(abs(cum_g / CAST(n_g AS DOUBLE)
    - (cum_all - cum_g) / CAST(n_all - n_g AS DOUBLE))), 6) AS ks_stat
FROM cum CROSS JOIN tot
GROUP BY g, n_g
"""

QUERIES["length_ks_drift"] = q_length_ks_drift
_RAW_ORACLES["length_ks_drift"] = SQL_LENGTH_KS_DRIFT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_heaps_fit(spark, sf_dir):
    """Per-source Heaps'-law vocabulary-growth fit (operators/text.py
    heaps_fit): ln V vs ln N least squares at power-of-two doc ranks;
    saturated (templated) or inflated (OCR/spam) vocabulary growth flags
    a dump before mixing — the companion check to zipf_fit."""
    from mpds_spark.operators.text import heaps_fit

    docs = load(spark, sf_dir, "documents")
    out = heaps_fit(docs)
    return out.select(
        "source",
        "n_docs",
        "n_points",
        _r6("heaps_beta").alias("heaps_beta"),
        _r6("heaps_ln_k").alias("heaps_ln_k"),
    )


SQL_HEAPS_FIT = """
WITH d AS (
  SELECT source AS g, doc_id AS k,
    regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
),
tok AS (SELECT g, k, CAST(len(ws) AS BIGINT) AS n_tok FROM d),
firsts AS (
  SELECT g, k, CAST(count(*) AS BIGINT) AS new_v FROM (
    SELECT g, word, min(k) AS k FROM (
      SELECT g, k, unnest(ws) AS word FROM d
    ) GROUP BY g, word
  ) GROUP BY g, k
),
per_doc AS (
  SELECT tok.g, tok.k, tok.n_tok, coalesce(firsts.new_v, 0) AS new_v
  FROM tok LEFT JOIN firsts ON firsts.g = tok.g AND firsts.k = tok.k
),
cum AS (
  SELECT g, k, row_number() OVER (PARTITION BY g ORDER BY k) AS r,
    sum(n_tok) OVER (PARTITION BY g ORDER BY k) AS cum_n,
    sum(new_v) OVER (PARTITION BY g ORDER BY k) AS cum_v
  FROM per_doc
),
ranked AS (
  SELECT g, r, cum_n, cum_v, max(r) OVER (PARTITION BY g) AS n_docs
  FROM cum
),
pts AS (
  SELECT * FROM ranked
  WHERE ((r & (r - 1)) = 0 OR r = n_docs) AND cum_n > 0 AND cum_v > 0
),
a AS (
  SELECT g, n_docs, CAST(count(*) AS BIGINT) AS n_points,
    list_sum(list(ln(cum_n::DOUBLE) ORDER BY r)) AS sx,
    list_sum(list(ln(cum_v::DOUBLE) ORDER BY r)) AS sy,
    list_sum(list(ln(cum_n::DOUBLE) * ln(cum_n::DOUBLE) ORDER BY r)) AS sxx,
    list_sum(list(ln(cum_n::DOUBLE) * ln(cum_v::DOUBLE) ORDER BY r)) AS sxy
  FROM pts GROUP BY g, n_docs
)
SELECT g AS source, CAST(n_docs AS BIGINT) AS n_docs, n_points,
  round(CASE WHEN n_points * sxx - sx * sx <> 0 THEN
    (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx) END, 6)
    AS heaps_beta,
  round(CASE WHEN n_points * sxx - sx * sx <> 0 THEN
    (sy - ((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx)) * sx)
      / n_points END, 6) AS heaps_ln_k
FROM a
"""

QUERIES["heaps_fit"] = q_heaps_fit
_RAW_ORACLES["heaps_fit"] = SQL_HEAPS_FIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_term_burstiness(spark, sf_dir):
    """Church-Gale dispersion of the corpus top-64 terms
    (operators/text.py term_burstiness): burstiness = cf/df and the
    within-containing-doc variance-to-mean ratio — content-vs-function
    term separation for stopword induction on a new corpus."""
    from mpds_spark.operators.text import term_burstiness

    docs = load(spark, sf_dir, "documents")
    out = term_burstiness(docs, top_v=64)
    return out.select(
        "word",
        "cf",
        "df",
        _r6("burstiness").alias("burstiness"),
        _r6("vmr").alias("vmr"),
    )


SQL_TERM_BURSTINESS = """
WITH wd AS (
  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents
  ) GROUP BY word, doc_id
),
agg AS (
  SELECT word, CAST(sum(c) AS BIGINT) AS cf,
    CAST(count(*) AS BIGINT) AS df,
    CAST(sum(c * c) AS BIGINT) AS c2
  FROM wd GROUP BY word
),
top AS (SELECT * FROM agg ORDER BY cf DESC, word LIMIT 64)
SELECT word, cf, df,
  round(cf::DOUBLE / df::DOUBLE, 6) AS burstiness,
  round(CASE WHEN df >= 2 THEN
    ((c2::DOUBLE - cf::DOUBLE * cf::DOUBLE / df::DOUBLE)
      / (df::DOUBLE - 1.0)) / (cf::DOUBLE / df::DOUBLE) END, 6) AS vmr
FROM top
"""

QUERIES["term_burstiness"] = q_term_burstiness
_RAW_ORACLES["term_burstiness"] = SQL_TERM_BURSTINESS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_event_burstiness(spark, sf_dir):
    """Per-user inter-arrival burstiness B and memory coefficient M
    (Goh & Barabasi 2008; operators/windows.py event_burstiness) over the
    events stream — the temporal-pattern features separating Poisson
    activity from bursty or periodic behaviour."""
    from mpds_spark.operators.windows import event_burstiness

    ev = _events(spark, sf_dir)
    out = event_burstiness(ev, ts="ts", by="user_id", tiebreak="event_id")
    return out.select(
        "user_id",
        "n_events",
        _r6("mean_gap_s").alias("mean_gap_s"),
        _r6("burstiness_b").alias("burstiness_b"),
        _r6("memory_m").alias("memory_m"),
    )


SQL_EVENT_BURSTINESS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
g AS (
  SELECT user_id, us, event_id,
    CAST(us - lag(us) OVER w AS HUGEINT) AS g
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
gg AS (
  SELECT user_id, g, lead(g) OVER w AS gn
  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
a AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(g) AS BIGINT) AS m,
    coalesce(sum(g), 0) AS s1,
    coalesce(sum(g * g), 0) AS s2,
    CAST(count(CASE WHEN g IS NOT NULL AND gn IS NOT NULL THEN 1 END)
      AS BIGINT) AS np,
    coalesce(sum(CASE WHEN g IS NOT NULL AND gn IS NOT NULL THEN g END), 0)
      AS sx,
    coalesce(sum(CASE WHEN g IS NOT NULL AND gn IS NOT NULL THEN gn END), 0)
      AS sy,
    coalesce(sum(g * gn), 0) AS sxy,
    coalesce(sum(CASE WHEN g IS NOT NULL AND gn IS NOT NULL THEN g * g END),
      0) AS sxx,
    coalesce(sum(CASE WHEN g IS NOT NULL AND gn IS NOT NULL THEN gn * gn END),
      0) AS syy
  FROM gg GROUP BY user_id HAVING count(g) >= 1
),
d AS (
  SELECT user_id, n_events, np,
    s1::DOUBLE / m::DOUBLE AS mu,
    sqrt(greatest(s2::DOUBLE / m::DOUBLE
      - (s1::DOUBLE / m::DOUBLE) * (s1::DOUBLE / m::DOUBLE), 0.0)) AS sigma,
    np::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS covn,
    np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vxn,
    np::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vyn
  FROM a
)
SELECT user_id, n_events,
  round(mu / 1000000.0, 6) AS mean_gap_s,
  round(CASE WHEN sigma + mu <> 0.0 THEN (sigma - mu) / (sigma + mu) END, 6)
    AS burstiness_b,
  round(CASE WHEN np >= 3 AND vxn > 0.0 AND vyn > 0.0 THEN
    covn / (sqrt(vxn) * sqrt(vyn)) END, 6) AS memory_m
FROM d
"""

QUERIES["event_burstiness"] = q_event_burstiness
_RAW_ORACLES["event_burstiness"] = SQL_EVENT_BURSTINESS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_transition_entropy(spark, sf_dir):
    """Per-user Markov transition entropy of the event_type stream
    (operators/windows.py transition_entropy): H(next|cur), the
    current-state marginal entropy, and their predictability ratio —
    the session-predictability feature for bot/anomaly scoring."""
    from mpds_spark.operators.windows import transition_entropy

    ev = _events(spark, sf_dir)
    out = transition_entropy(
        ev, state="event_type", ts="ts", by="user_id", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        "n_transitions",
        _r6("h_cond").alias("h_cond"),
        _r6("h_cur").alias("h_cur"),
        _r6("predictability_ratio").alias("predictability_ratio"),
    )


SQL_TRANSITION_ENTROPY = """
WITH o AS (
  SELECT user_id, event_type AS s,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM events
),
cells AS (
  SELECT user_id, p, s, CAST(count(*) AS BIGINT) AS c
  FROM o WHERE p IS NOT NULL GROUP BY user_id, p, s
),
rt AS (
  SELECT user_id, p, CAST(sum(c) AS BIGINT) AS n_i
  FROM cells GROUP BY user_id, p
),
tot AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY user_id
),
hc AS (
  SELECT cells.user_id,
    list_sum(list((c::DOUBLE / n::DOUBLE) * ln(n_i::DOUBLE / c::DOUBLE)
      ORDER BY cells.p, cells.s)) AS h_cond
  FROM cells
  JOIN rt ON rt.user_id = cells.user_id AND rt.p = cells.p
  JOIN tot ON tot.user_id = cells.user_id
  GROUP BY cells.user_id
),
hu AS (
  SELECT rt.user_id,
    list_sum(list((n_i::DOUBLE / n::DOUBLE) * ln(n::DOUBLE / n_i::DOUBLE)
      ORDER BY rt.p)) AS h_cur
  FROM rt JOIN tot ON tot.user_id = rt.user_id
  GROUP BY rt.user_id
)
SELECT tot.user_id, n AS n_transitions,
  round(h_cond, 6) AS h_cond,
  round(h_cur, 6) AS h_cur,
  round(CASE WHEN h_cur <> 0.0 THEN h_cond / h_cur END, 6)
    AS predictability_ratio
FROM tot
JOIN hc ON hc.user_id = tot.user_id
JOIN hu ON hu.user_id = tot.user_id
"""

QUERIES["transition_entropy"] = q_transition_entropy
_RAW_ORACLES["transition_entropy"] = SQL_TRANSITION_ENTROPY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ewma_features(spark, sf_dir):
    """Per-user EWMA of the value stream (operators/windows.py
    ewma_features): the point-in-time momentum feature — the
    window-size-free analogue of the reference's expanding averages
    (dssFunctionLibrary.R:876-917). alpha = 1/4 (exact binary), fold
    over the (ts, event_id)-sorted array on both engines."""
    from mpds_spark.operators.windows import ewma_features

    ev = _events(spark, sf_dir)
    out = ewma_features(
        ev, value="value", ts="ts", by="user_id", alpha=0.25,
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "n_events",
        "last_value",
        _r6("ewma").alias("ewma"),
        _r6("ewma_gap").alias("ewma_gap"),
    )


SQL_EWMA_FEATURES = """
WITH a AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
    list(value ORDER BY ts, event_id) AS l
  FROM events GROUP BY user_id
),
f AS (
  SELECT user_id, n_events, l[len(l)] AS last_value,
    list_reduce(l, (acc, x) -> acc * 0.75::DOUBLE + x * 0.25::DOUBLE)
      AS ewma
  FROM a
)
SELECT user_id, n_events, last_value,
  round(ewma, 6) AS ewma,
  round(last_value - ewma, 6) AS ewma_gap
FROM f
"""

QUERIES["ewma_features"] = q_ewma_features
_RAW_ORACLES["ewma_features"] = SQL_EWMA_FEATURES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_cusum_changepoint(spark, sf_dir):
    """Per-user CUSUM level-shift scan (operators/windows.py
    cusum_changepoint): location/size of max_k |sum_{i<=k}(x_i - xbar)|
    plus the Brownian-bridge-normalized statistic — the behaviour-change
    detector over each entity's value stream, integer-exact argmax."""
    from mpds_spark.functions.timeutil import epoch_seconds
    from mpds_spark.operators.windows import cusum_changepoint

    ev = _events(spark, sf_dir)
    out = cusum_changepoint(
        ev, value="value", ts="ts", by="user_id", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        "n_events",
        "cp_index",
        epoch_seconds(out, "cp_ts").alias("cp_ts"),
        _r6("cusum_max").alias("cusum_max"),
        _r6("cusum_stat").alias("cusum_stat"),
    )


SQL_CUSUM_CHANGEPOINT = """
WITH e AS (
  SELECT user_id, ts, event_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS HUGEINT) AS c
  FROM events
),
r AS (
  SELECT user_id, ts,
    CAST(row_number() OVER w AS HUGEINT) AS k,
    sum(c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum,
    CAST(count(*) OVER p AS HUGEINT) AS n,
    sum(c) OVER p AS s1,
    sum(c * c) OVER p AS s2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         p AS (PARTITION BY user_id)
),
s AS (
  SELECT user_id, ts, k, n, s1, s2,
    abs(n * cum - k * s1) AS a
  FROM r WHERE n >= 2
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY abs(n * cum - k * s1) DESC, k ASC
  ) = 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS cp_index,
  epoch(ts) AS cp_ts,
  round(a::DOUBLE / (100.0::DOUBLE * n::DOUBLE), 6) AS cusum_max,
  round(CASE WHEN n * s2 - s1 * s1 > 0 THEN
    a::DOUBLE / (sqrt((n * s2 - s1 * s1)::DOUBLE) * sqrt(n::DOUBLE)) END, 6)
    AS cusum_stat
FROM s
"""

QUERIES["cusum_changepoint"] = q_cusum_changepoint
_RAW_ORACLES["cusum_changepoint"] = SQL_CUSUM_CHANGEPOINT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix (operators/funnels.py
    retention_cohorts): users cohorted by the Monday of their first
    event; (cohort, week_offset) active-user counts + retention rate —
    the point-in-time cohort anchor is a first-event as-of."""
    from mpds_spark.operators.funnels import retention_cohorts

    ev = _events(spark, sf_dir)
    out = retention_cohorts(ev, ts="ts", by="user_id")
    return out.select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        _r6("retention").alias("retention"),
    )


SQL_RETENTION_COHORTS = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
),
c AS (
  SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS w0 FROM uw
),
cells AS (
  SELECT w0 AS cohort_week, (w - w0) // 7 AS week_offset,
    CAST(count(*) AS BIGINT) AS n_active
  FROM c GROUP BY w0, (w - w0) // 7
),
sizes AS (
  SELECT cohort_week, n_active AS cohort_size FROM cells
  WHERE week_offset = 0
)
SELECT CAST(cells.cohort_week AS VARCHAR) AS cohort_week,
  CAST(week_offset AS BIGINT) AS week_offset, n_active, cohort_size,
  round(n_active::DOUBLE / cohort_size::DOUBLE, 6) AS retention
FROM cells JOIN sizes ON sizes.cohort_week = cells.cohort_week
"""

QUERIES["retention_cohorts"] = q_retention_cohorts
_RAW_ORACLES["retention_cohorts"] = SQL_RETENTION_COHORTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_conversion_funnel(spark, sf_dir):
    """Ordered view -> click -> purchase funnel (operators/funnels.py
    conversion_funnel): per-user forward-chained first-occurrence scan
    (each step strictly after the previous, within 24 h of it),
    collapsed to stage counts and mean seconds from first step — the
    per-entity ordered state machine the reference builds for reaction
    chains (functions/battery.py reaction-lag), as a funnel."""
    from mpds_spark.operators.funnels import conversion_funnel

    ev = _events(spark, sf_dir)
    out = conversion_funnel(
        ev,
        steps=("view", "click", "purchase"),
        event_type="event_type",
        ts="ts",
        by="user_id",
        within=86400.0,
    )
    return out.select(
        "stage",
        "step",
        "n_entities",
        _r6("mean_s_to_stage").alias("mean_s_to_stage"),
    )


SQL_CONVERSION_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s0 AS (
  SELECT user_id, event_type, us,
    min(CASE WHEN event_type = 'view' THEN us END)
      OVER (PARTITION BY user_id) AS t0
  FROM e
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND t0 IS NOT NULL
      AND us > t0 AND us <= t0 + 86400000000 THEN us END)
    OVER (PARTITION BY user_id) AS t1
  FROM s0
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND t1 IS NOT NULL
      AND us > t1 AND us <= t1 + 86400000000 THEN us END)
    OVER (PARTITION BY user_id) AS t2
  FROM s1
),
u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM s2),
st AS (
  SELECT user_id,
    CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
         WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS stage,
    CASE WHEN t2 IS NOT NULL THEN t2 - t0 WHEN t1 IS NOT NULL THEN t1 - t0
         WHEN t0 IS NOT NULL THEN 0 END AS lag_us
  FROM u
)
SELECT CAST(stage AS INTEGER) AS stage,
  CASE stage WHEN 1 THEN 'view' WHEN 2 THEN 'click' WHEN 3 THEN 'purchase'
    END AS step,
  CAST(count(*) AS BIGINT) AS n_entities,
  round(CASE WHEN stage > 0 THEN
    sum(lag_us)::DOUBLE / (count(*)::DOUBLE * 1000000.0::DOUBLE) END, 6)
    AS mean_s_to_stage
FROM st GROUP BY stage
"""

QUERIES["conversion_funnel"] = q_conversion_funnel
_RAW_ORACLES["conversion_funnel"] = SQL_CONVERSION_FUNNEL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hourly_seasonality(spark, sf_dir):
    """Per-user hour-of-day circular activity profile
    (operators/windows.py hourly_seasonality): resultant length R,
    circular mean hour, peak hour and night fraction — diurnal-rhythm
    features; cos/sin weights are driver-computed literals shared by
    both engines (libm parity)."""
    from mpds_spark.operators.windows import hourly_seasonality

    ev = _events(spark, sf_dir)
    out = hourly_seasonality(ev, ts="ts", by="user_id")
    return out.select(
        "user_id",
        "n_events",
        "peak_hour",
        _r6("peak_frac").alias("peak_frac"),
        _r6("resultant_r").alias("resultant_r"),
        _r6("circ_mean_h").alias("circ_mean_h"),
        _r6("night_frac").alias("night_frac"),
    )


def _sql_hourly_seasonality() -> str:
    from mpds_spark.operators.windows import circular_weights

    cosw, sinw = circular_weights(24)
    cl = "[" + ", ".join(f"{x!r}::DOUBLE" for x in cosw) + "]"
    sl = "[" + ", ".join(f"{x!r}::DOUBLE" for x in sinw) + "]"
    return f"""
WITH cells AS (
  SELECT user_id, hour(ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, hour(ts)
),
agg AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
    list_sum(list(c::DOUBLE * ({cl})[h + 1] ORDER BY h)) AS sc,
    list_sum(list(c::DOUBLE * ({sl})[h + 1] ORDER BY h)) AS ss,
    coalesce(sum(c) FILTER (h < 6), 0) AS night
  FROM cells GROUP BY user_id
),
peak AS (
  SELECT user_id, h AS peak_hour, c AS peak_c FROM cells
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY c DESC, h ASC
  ) = 1
)
SELECT agg.user_id, n_events, CAST(peak_hour AS INTEGER) AS peak_hour,
  round(peak_c::DOUBLE / n_events::DOUBLE, 6) AS peak_frac,
  round(sqrt(sc * sc + ss * ss) / n_events::DOUBLE, 6) AS resultant_r,
  round(fmod(atan2(ss, sc) * {24.0 / 6.283185307179586!r}::DOUBLE
    + 24.0::DOUBLE, 24.0::DOUBLE), 6) AS circ_mean_h,
  round(night::DOUBLE / n_events::DOUBLE, 6) AS night_frac
FROM agg JOIN peak ON peak.user_id = agg.user_id
"""


QUERIES["hourly_seasonality"] = q_hourly_seasonality
_RAW_ORACLES["hourly_seasonality"] = _sql_hourly_seasonality()
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_streaming_windowed_counts(spark, sf_dir):
    """Watermarked tumbling-window rollup run THROUGH the streaming
    engine (streaming/sessions.py tumbling_counts: file source ->
    withWatermark -> F.window agg -> memory sink, complete mode,
    availableNow): per (hour, user) event count + exact-cents value sum.
    Complete mode re-emits every window, so the batch GROUP BY is an
    exact oracle; the append-mode drop-late semantics are pinned by
    tests/test_streaming.py::test_session_watermark_drops_late_event and
    the tumbling twin below it."""
    from mpds_spark.streaming.sessions import tumbling_counts

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(
        _stream_dir(sf_dir, "events")
    )
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    # withWatermark requires TIMESTAMP (not NTZ); session tz is UTC-pinned
    agg = tumbling_counts(
        stream.withColumn("value", cents)
        .withColumn("ts", F.col("ts").cast("timestamp")),
        window="1 hour",
        entity="user_id",
        ts="ts",
        value="value",
        watermark="30 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mpds_q_streaming_windowed_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("mpds_q_streaming_windowed_counts")
    return out.select(
        "user_id",
        F.col("window_start").cast("timestamp").cast("double")
        .alias("window_start"),
        F.col("window_end").cast("timestamp").cast("double")
        .alias("window_end"),
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("sum_value").cast("double") / 100.0).alias("sum_value"),
    )


SQL_STREAMING_WINDOWED_COUNTS = """
SELECT user_id,
  floor(epoch(ts) / 3600) * 3600 AS window_start,
  floor(epoch(ts) / 3600) * 3600 + 3600 AS window_end,
  CAST(count(*) AS BIGINT) AS n_events,
  sum(CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT))::DOUBLE
    / 100.0 AS sum_value
FROM events
GROUP BY user_id, floor(epoch(ts) / 3600)
"""

QUERIES["streaming_windowed_counts"] = q_streaming_windowed_counts
_RAW_ORACLES["streaming_windowed_counts"] = SQL_STREAMING_WINDOWED_COUNTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_zscore_outliers(spark, sf_dir):
    """Per-user expanding z-score anomaly scan (operators/windows.py
    zscore_outliers): each event scored against STRICTLY PRIOR events
    only (zero leakage); outlier counts + the extreme event's signed z
    and timestamp, integer-exact inside the sqrt on both engines."""
    from mpds_spark.functions.timeutil import epoch_seconds
    from mpds_spark.operators.windows import zscore_outliers

    ev = _events(spark, sf_dir)
    out = zscore_outliers(
        ev, value="value", ts="ts", by="user_id", threshold=3.0,
        min_prior=5, tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "n_events",
        "n_scored",
        "n_outliers",
        _r6("max_abs_z").alias("max_abs_z"),
        _r6("z_at_max").alias("z_at_max"),
        epoch_seconds(out, "ts_at_max").alias("ts_at_max"),
    )


SQL_ZSCORE_OUTLIERS = """
WITH e AS (
  SELECT user_id, ts, event_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS HUGEINT) AS c
  FROM events
),
r AS (
  SELECT user_id, ts, c,
    CAST(row_number() OVER w AS HUGEINT) AS k,
    CAST(coalesce(count(c) OVER pw, 0) AS HUGEINT) AS m,
    coalesce(sum(c) OVER pw, 0::HUGEINT) AS c1,
    coalesce(sum(c * c) OVER pw, 0::HUGEINT) AS c2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
    pw AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT user_id, ts, k,
    CASE WHEN m >= 5 AND m * c2 - c1 * c1 > 0 THEN
      (m * c - c1)::DOUBLE / sqrt((m * c2 - c1 * c1)::DOUBLE) END AS z
  FROM r
),
agg AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(z) AS BIGINT) AS n_scored,
    CAST(coalesce(sum(CASE WHEN abs(z) > 3.0 THEN 1 END), 0) AS BIGINT)
      AS n_outliers,
    max(abs(z)) AS max_abs_z
  FROM z GROUP BY user_id
),
best AS (
  SELECT user_id, z AS z_at_max, ts AS ts_at_max FROM z
  WHERE z IS NOT NULL
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY abs(z) DESC, k ASC
  ) = 1
)
SELECT agg.user_id, n_events, n_scored, n_outliers,
  round(max_abs_z, 6) AS max_abs_z,
  round(z_at_max, 6) AS z_at_max,
  epoch(ts_at_max) AS ts_at_max
FROM agg LEFT JOIN best ON best.user_id = agg.user_id
"""

QUERIES["zscore_outliers"] = q_zscore_outliers
_RAW_ORACLES["zscore_outliers"] = SQL_ZSCORE_OUTLIERS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_session_stats(spark, sf_dir):
    """Per-user session-shape summary (operators/sessionize.py
    session_stats): 30-minute gap-rule sessions rolled up to count,
    events, mean events/session, mean/max duration — the engagement
    features beside the per-event temporal windows, one entity-keyed
    exchange end to end."""
    from mpds_spark.operators.sessionize import session_stats

    ev = _events(spark, sf_dir)
    out = session_stats(ev, entity="user_id", ts="ts", gap=1800.0)
    return out.select(
        "user_id",
        "n_sessions",
        "n_events",
        _r6("mean_events").alias("mean_events"),
        _r6("mean_duration_s").alias("mean_duration_s"),
        _r6("max_duration_s").alias("max_duration_s"),
    )


SQL_SESSION_STATS = """
WITH m AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
         THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, us,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
),
per_session AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n,
    CAST(max(us) - min(us) AS BIGINT) AS dur_us
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(n) AS BIGINT) AS n_events,
  round(sum(n)::DOUBLE / count(*)::DOUBLE, 6) AS mean_events,
  round(sum(dur_us)::DOUBLE / (count(*)::DOUBLE * 1000000.0), 6)
    AS mean_duration_s,
  round(max(dur_us)::DOUBLE / 1000000.0, 6) AS max_duration_s
FROM per_session GROUP BY user_id
"""

QUERIES["session_stats"] = q_session_stats
_RAW_ORACLES["session_stats"] = SQL_SESSION_STATS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_dedup_impact_report(spark, sf_dir):
    """Per-source dedup impact audit (operators/dedup.py
    dedup_impact_report): docs in multi-doc duplicate clusters, docs the
    keep-min rule removes, cluster counts and the word-mass cost —
    the report a curation run reads before committing a dedup pass.
    Gated here over EXACT-duplicate clusters (md5 groups — the cheapest
    first-pass report, one window) so the driver row prices the AUDIT,
    not a second run of the simhash pipeline near_dup_components
    already prices; the near-dup variant is the identical operator call
    on dedup_keep_list output (pytest-pinned in test_dedup.py)."""
    from mpds_spark.operators.dedup import dedup_impact_report

    docs = load(spark, sf_dir, "documents")
    comp = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    kl = docs.select(
        "doc_id",
        comp.alias("component"),
        (comp == F.col("doc_id")).alias("keep"),
    )
    out = dedup_impact_report(docs, kl, key="doc_id", group="source")
    return out.select(
        "source",
        "n_docs",
        "n_dup_docs",
        "n_removed",
        "n_clusters",
        "max_cluster_size",
        "words_total",
        "words_removed",
        _r6("pct_words_removed").alias("pct_words_removed"),
    )


SQL_DEDUP_IMPACT_REPORT = """
WITH kl AS (
  SELECT doc_id, source,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nw,
    min(doc_id) OVER (PARTITION BY md5(text)) AS component
  FROM documents
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY component) AS csize,
    (component = doc_id) AS keep
  FROM kl
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(coalesce(sum(CASE WHEN csize > 1 THEN 1 END), 0) AS BIGINT)
    AS n_dup_docs,
  CAST(coalesce(sum(CASE WHEN NOT keep THEN 1 END), 0) AS BIGINT)
    AS n_removed,
  CAST(count(DISTINCT CASE WHEN csize > 1 THEN component END) AS BIGINT)
    AS n_clusters,
  CAST(max(csize) AS BIGINT) AS max_cluster_size,
  CAST(sum(nw) AS BIGINT) AS words_total,
  CAST(coalesce(sum(CASE WHEN NOT keep THEN nw END), 0) AS BIGINT)
    AS words_removed,
  round(coalesce(sum(CASE WHEN NOT keep THEN nw END), 0)::DOUBLE
    / sum(nw)::DOUBLE, 6) AS pct_words_removed
FROM sized GROUP BY source
"""

QUERIES["dedup_impact_report"] = q_dedup_impact_report
_RAW_ORACLES["dedup_impact_report"] = SQL_DEDUP_IMPACT_REPORT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_value_acf(spark, sf_dir):
    """Per-user value autocorrelation at lags 1-3 (operators/windows.py
    value_acf): persistence/periodicity features, exact integer moments
    multiplied through by n^2 so both engines divide identical doubles."""
    from mpds_spark.operators.windows import value_acf

    ev = _events(spark, sf_dir)
    out = value_acf(
        ev, value="value", ts="ts", by="user_id", lags=(1, 2, 3),
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "n_events",
        _r6("acf_1").alias("acf_1"),
        _r6("acf_2").alias("acf_2"),
        _r6("acf_3").alias("acf_3"),
    )


SQL_VALUE_ACF = """
WITH e AS (
  SELECT user_id, ts, event_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS HUGEINT) AS c
  FROM events
),
l AS (
  SELECT user_id, c,
    lag(c, 1) OVER w AS p1, lag(c, 2) OVER w AS p2, lag(c, 3) OVER w AS p3
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
a AS (
  SELECT user_id,
    CAST(count(*) AS HUGEINT) AS n,
    sum(c) AS s1, sum(c * c) AS s2,
    CAST(count(p1) AS HUGEINT) AS m1,
    coalesce(sum(c * p1), 0::HUGEINT) AS cc1,
    coalesce(sum(CASE WHEN p1 IS NOT NULL THEN c END), 0::HUGEINT) AS t1,
    coalesce(sum(p1), 0::HUGEINT) AS h1,
    CAST(count(p2) AS HUGEINT) AS m2,
    coalesce(sum(c * p2), 0::HUGEINT) AS cc2,
    coalesce(sum(CASE WHEN p2 IS NOT NULL THEN c END), 0::HUGEINT) AS t2,
    coalesce(sum(p2), 0::HUGEINT) AS h2,
    CAST(count(p3) AS HUGEINT) AS m3,
    coalesce(sum(c * p3), 0::HUGEINT) AS cc3,
    coalesce(sum(CASE WHEN p3 IS NOT NULL THEN c END), 0::HUGEINT) AS t3,
    coalesce(sum(p3), 0::HUGEINT) AS h3
  FROM l GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
  round(CASE WHEN m1 >= 1 AND n*n*s2 - n*s1*s1 > 0 THEN
    (n*n*cc1 - n*s1*(h1 + t1) + m1*s1*s1)::DOUBLE
      / (n*n*s2 - n*s1*s1)::DOUBLE END, 6) AS acf_1,
  round(CASE WHEN m2 >= 1 AND n*n*s2 - n*s1*s1 > 0 THEN
    (n*n*cc2 - n*s1*(h2 + t2) + m2*s1*s1)::DOUBLE
      / (n*n*s2 - n*s1*s1)::DOUBLE END, 6) AS acf_2,
  round(CASE WHEN m3 >= 1 AND n*n*s2 - n*s1*s1 > 0 THEN
    (n*n*cc3 - n*s1*(h3 + t3) + m3*s1*s1)::DOUBLE
      / (n*n*s2 - n*s1*s1)::DOUBLE END, 6) AS acf_3
FROM a
"""

QUERIES["value_acf"] = q_value_acf
_RAW_ORACLES["value_acf"] = SQL_VALUE_ACF
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_behavior_divergence(spark, sf_dir):
    """Per-user behavioral-profile divergence vs the corpus event-type
    mix (operators/profiles.py behavior_divergence): KL in nats +
    exact-arithmetic total variation + modal type — the fingerprint
    feature that flags bots/broken integrations before any single-event
    rule fires."""
    from mpds_spark.operators.profiles import behavior_divergence

    ev = _events(spark, sf_dir)
    out = behavior_divergence(ev, state="event_type", by="user_id")
    return out.select(
        "user_id",
        "n_events",
        "n_types",
        "top_type",
        _r6("kl_global").alias("kl_global"),
        _r6("tv_global").alias("tv_global"),
    )


SQL_BEHAVIOR_DIVERGENCE = """
WITH cells AS (
  SELECT user_id, event_type AS s, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
),
gl AS (
  SELECT s, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY s
),
tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn FROM gl),
j AS (
  SELECT cells.user_id, cells.s, cells.c, gl.g, tot.nn,
    CAST(sum(c) OVER (PARTITION BY cells.user_id) AS BIGINT) AS n_u
  FROM cells JOIN gl USING (s) CROSS JOIN tot
),
a AS (
  SELECT user_id,
    max(n_u) AS n_events,
    CAST(count(*) AS BIGINT) AS n_types,
    max(nn) AS nn,
    CAST(sum(g) AS BIGINT) AS g_present,
    list_sum(list(
      (c::DOUBLE / n_u::DOUBLE)
      * ln((c::HUGEINT * nn::HUGEINT)::DOUBLE
           / (n_u::HUGEINT * g::HUGEINT)::DOUBLE)
      ORDER BY s)) AS kl,
    list_sum(list(
      abs(c::HUGEINT * nn::HUGEINT - n_u::HUGEINT * g::HUGEINT)
      ORDER BY s)) AS tv_present
  FROM j GROUP BY user_id
),
top AS (
  SELECT user_id, s AS top_type FROM cells
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY c DESC, s DESC
  ) = 1
)
SELECT a.user_id, n_events, n_types, top_type,
  round(kl, 6) AS kl_global,
  round((tv_present::DOUBLE
      + (n_events::HUGEINT * (nn::HUGEINT - g_present::HUGEINT))::DOUBLE)
    / (2.0 * n_events::DOUBLE * nn::DOUBLE), 6) AS tv_global
FROM a JOIN top ON top.user_id = a.user_id
"""

QUERIES["behavior_divergence"] = q_behavior_divergence
_RAW_ORACLES["behavior_divergence"] = SQL_BEHAVIOR_DIVERGENCE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_gap_quantiles(spark, sf_dir):
    """Per-user inter-arrival gap quantiles (p50/p90, exact interpolated)
    via the bracketed-selection grouped-quantile plan
    (operators/scale.py exact_grouped_quantiles_multi) — the survival-
    curve features beside burstiness; gaps are exact-microsecond
    differences divided once, so both engines interpolate identical
    doubles."""
    from mpds_spark.operators.scale import exact_grouped_quantiles_multi

    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.select("user_id", us.alias("__us"), "event_id")
        .withColumn("__gap", (F.col("__us") - F.lag("__us").over(
            Window.partitionBy("user_id").orderBy("__us", "event_id")
        )).cast("double") / 1e6)
        .filter(F.col("__gap").isNotNull())
    )
    out = exact_grouped_quantiles_multi(
        gaps, "user_id", "__gap", ps=[0.5, 0.9]
    )
    return out.select(
        "user_id",
        _r6("p").alias("p"),
        _r6("q___gap").alias("gap_q_s"),
    )


SQL_GAP_QUANTILES = """
WITH g AS (
  SELECT user_id,
    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ))::DOUBLE / 1000000.0 AS gap
  FROM events
),
f AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL)
SELECT user_id, 0.5 AS p,
  round(quantile_cont(gap, 0.5), 6) AS gap_q_s
FROM f GROUP BY user_id
UNION ALL
SELECT user_id, 0.9 AS p,
  round(quantile_cont(gap, 0.9), 6) AS gap_q_s
FROM f GROUP BY user_id
"""

QUERIES["gap_quantiles"] = q_gap_quantiles
_RAW_ORACLES["gap_quantiles"] = SQL_GAP_QUANTILES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_star_join_revenue(spark, sf_dir):
    """TPC-H-style star join (Q5 flavor): lineitem x orders co-keyed
    shuffle join, then the customer -> nation -> region dimension chain
    as BROADCAST hash joins (plan-asserted), rolled up to revenue per
    (region, nation, order year). Revenue sums exact integer
    cents*(100 - discount_pct) products, divided once — the float
    product order hazard never exists."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    ep_c = (
        F.signum("l_extendedprice")
        * F.floor(F.abs(F.col("l_extendedprice")) * 100 + F.lit(0.5))
    ).cast("long")
    d_c = (
        F.signum("l_discount")
        * F.floor(F.abs(F.col("l_discount")) * 100 + F.lit(0.5))
    ).cast("long")
    item = li.select(
        "l_orderkey", (ep_c * (F.lit(100) - d_c)).alias("__rev_c"),
    )
    j = (
        item.join(
            orders.select(
                "o_orderkey", "o_custkey",
                F.year(F.col("o_orderdate").cast("timestamp"))
                .alias("o_year"),
            ),
            item.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name",
                                        "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy("r_name", "n_name", "o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.count_distinct("l_orderkey").cast("long").alias("n_orders"),
            F.sum(F.col("__rev_c").cast("decimal(38,0)")).alias("__rev"),
        )
        .select(
            "r_name",
            "n_name",
            "o_year",
            "n_items",
            "n_orders",
            _r6(F.col("__rev").cast("double") / 10000.0).alias("revenue"),
        )
    )


SQL_STAR_JOIN_REVENUE = """
SELECT r_name, n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
  round(sum(CAST(floor(abs(l_extendedprice)*100 + 0.5)
              * sign(l_extendedprice) AS HUGEINT)
          * (100 - CAST(floor(abs(l_discount)*100 + 0.5)
              * sign(l_discount) AS HUGEINT)))::DOUBLE / 10000.0, 6)
    AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name, year(o_orderdate)
"""

QUERIES["star_join_revenue"] = q_star_join_revenue
_RAW_ORACLES["star_join_revenue"] = SQL_STAR_JOIN_REVENUE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_asof_tolerance(spark, sf_dir):
    """Staleness-bounded as-of join (operators/asof.py asof_join
    tolerance=, merge_asof semantics): the last order within 7 days
    only — matches older than the bound are NULLed, the point-in-time
    freshness contract a feature store enforces. Oracle: native ASOF
    JOIN + the same staleness predicate."""
    from mpds_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").cast("timestamp").cast("double").alias("ts"),
        "o_totalprice",
    )
    out = asof_join(
        ev, orders, on="ts", by="entity_id", tolerance=7 * 86400.0
    )
    return out.select(
        "event_id",
        F.col("o_totalprice").alias("recent_order_price"),
        _r6(F.col("ts") - F.col("ts_r")).alias("order_age_s"),
    )


SQL_ASOF_TOLERANCE = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
), o AS (
  SELECT o_custkey, epoch(o_orderdate) AS t, o_totalprice FROM orders
)
SELECT e.event_id,
  CASE WHEN e.t - o.t <= 604800.0 THEN o.o_totalprice END
    AS recent_order_price,
  round(CASE WHEN e.t - o.t <= 604800.0 THEN e.t - o.t END, 6)
    AS order_age_s
FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.t >= o.t
"""

QUERIES["asof_tolerance"] = q_asof_tolerance
_RAW_ORACLES["asof_tolerance"] = SQL_ASOF_TOLERANCE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_trailing_features(spark, sf_dir):
    """Multi-horizon bounded trailing-window features at each event
    (operators/windows.py trailing_window_features): 1-hour and 24-hour
    trailing count + sum per user, both RANGE frames ordered on exact
    integer epoch micros and sharing ONE entity-keyed exchange — the
    feature-store rolling-features-at-event-time shape beside the
    expanding derived_features."""
    from mpds_spark.operators.windows import trailing_window_features

    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    out = trailing_window_features(
        ev.withColumn("__c", cents),
        value="__c",
        ts="ts",
        by="user_id",
        horizons={"1h": 3600.0, "24h": 86400.0},
        extra=("event_id",),
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts_s").alias("ts"),
        "n_1h",
        (F.col("sum_1h").cast("double") / 100.0).alias("sum_1h"),
        "n_24h",
        (F.col("sum_24h").cast("double") / 100.0).alias("sum_24h"),
    )


SQL_TRAILING_FEATURES = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
)
SELECT event_id, user_id, us::DOUBLE / 1000000.0 AS ts,
  CAST(count(*) OVER h1 AS BIGINT) AS n_1h,
  (sum(c) OVER h1)::DOUBLE / 100.0 AS sum_1h,
  CAST(count(*) OVER h24 AS BIGINT) AS n_24h,
  (sum(c) OVER h24)::DOUBLE / 100.0 AS sum_24h
FROM e
WINDOW
  h1 AS (PARTITION BY user_id ORDER BY us
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
  h24 AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""

QUERIES["trailing_features"] = q_trailing_features
_RAW_ORACLES["trailing_features"] = SQL_TRAILING_FEATURES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rfm_snapshot(spark, sf_dir):
    """Point-in-time RFM snapshot per customer as of 1998-06-30
    (operators/snapshots.py rfm_snapshot): recency/tenure in whole days,
    lifetime frequency + exact-cents monetary, and the 90-day recent
    window as conditional aggregates — one grouped pass, cutoff filter
    pushed into the parquet scan, zero leakage past the cutoff."""
    from mpds_spark.operators.snapshots import rfm_snapshot

    orders = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
    ).cast("long")
    out = rfm_snapshot(
        orders.withColumn("__amt_c", cents),
        entity="o_custkey",
        ts="o_orderdate",
        amount="__amt_c",
        cutoff="1998-06-30 00:00:00",
        recent_window_s=90 * 86400.0,
    )
    return out.select(
        F.col("o_custkey").alias("custkey"),
        "frequency",
        "recency_days",
        "tenure_days",
        (F.col("monetary_c").cast("double") / 100.0).alias("monetary"),
        "n_recent",
        (F.col("monetary_recent_c").cast("double") / 100.0)
        .alias("monetary_recent"),
        F.col("last_ts_s").alias("last_order_ts"),
    )


SQL_RFM_SNAPSHOT = """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS us,
    CAST(floor(abs(o_totalprice)*100 + 0.5)*sign(o_totalprice) AS HUGEINT)
      AS c
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
), p AS (
  SELECT epoch_us(TIMESTAMP '1998-06-30 00:00:00') AS cut
)
SELECT o_custkey AS custkey,
  CAST(count(*) AS BIGINT) AS frequency,
  CAST(floor((cut - max(us)) / 86400000000.0) AS BIGINT) AS recency_days,
  CAST(floor((cut - min(us)) / 86400000000.0) AS BIGINT) AS tenure_days,
  sum(c)::DOUBLE / 100.0 AS monetary,
  CAST(coalesce(sum(CASE WHEN us >= cut - 7776000000000 THEN 1 END), 0)
    AS BIGINT) AS n_recent,
  coalesce(sum(CASE WHEN us >= cut - 7776000000000 THEN c END),
           0::HUGEINT)::DOUBLE / 100.0 AS monetary_recent,
  max(us)::DOUBLE / 1000000.0 AS last_order_ts
FROM o, p
GROUP BY o_custkey, cut
"""

QUERIES["rfm_snapshot"] = q_rfm_snapshot
_RAW_ORACLES["rfm_snapshot"] = SQL_RFM_SNAPSHOT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ohlc_bars(spark, sf_dir):
    """Per-user daily OHLC bars (operators/snapshots.py ohlc_bars):
    open/close = first/last event value in the bar (row_number()=1
    conditional aggregates, event_id tie-break), high/low = exact-cents
    max/min — the bucketed-bar rollup where both windows and the group
    rollup reuse ONE (entity, bar) exchange, never a self-join back for
    the open row."""
    from mpds_spark.operators.snapshots import ohlc_bars

    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    out = ohlc_bars(
        ev.withColumn("__c", cents),
        entity="user_id",
        ts="ts",
        value="__c",
        tiebreak="event_id",
        bucket_s=86400,
    )
    return out.select(
        "user_id",
        "bar_start_s",
        "n_events",
        (F.col("open_c").cast("double") / 100.0).alias("open"),
        (F.col("high_c").cast("double") / 100.0).alias("high"),
        (F.col("low_c").cast("double") / 100.0).alias("low"),
        (F.col("close_c").cast("double") / 100.0).alias("close"),
    )


SQL_OHLC_BARS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT user_id, us // 86400000000 AS bar, c,
    row_number() OVER (PARTITION BY user_id, us // 86400000000
                       ORDER BY us, event_id) AS ra,
    row_number() OVER (PARTITION BY user_id, us // 86400000000
                       ORDER BY us DESC, event_id DESC) AS rd
  FROM e
)
SELECT user_id, bar * 86400.0 AS bar_start_s,
  CAST(count(*) AS BIGINT) AS n_events,
  max(CASE WHEN ra = 1 THEN c END)::DOUBLE / 100.0 AS open,
  max(c)::DOUBLE / 100.0 AS high,
  min(c)::DOUBLE / 100.0 AS low,
  max(CASE WHEN rd = 1 THEN c END)::DOUBLE / 100.0 AS close
FROM r GROUP BY user_id, bar
"""

QUERIES["ohlc_bars"] = q_ohlc_bars
_RAW_ORACLES["ohlc_bars"] = SQL_OHLC_BARS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_quantile_transform(spark, sf_dir):
    """Rank-based normalization of each event's value within its user's
    history (operators/windows.py rank_normalize): percent_rank +
    cume_dist — tie-stable SQL rank windows over exact-cents order, one
    entity-keyed exchange; the distribution-free feature scaling beside
    the z-score/robust scalers."""
    from mpds_spark.operators.windows import rank_normalize

    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    out = rank_normalize(
        ev.select("event_id", "user_id", cents.alias("__c")),
        value="__c",
        by="user_id",
        extra=("event_id",),
    )
    return out.select(
        "event_id",
        "user_id",
        (F.col("__c").cast("double") / 100.0).alias("value"),
        F.col("pct_rank"),
        F.col("cume_dist"),
    )


SQL_QUANTILE_TRANSFORM = """
WITH e AS (
  SELECT event_id, user_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
)
SELECT event_id, user_id, c::DOUBLE / 100.0 AS value,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume_dist
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY c)
"""

QUERIES["quantile_transform"] = q_quantile_transform
_RAW_ORACLES["quantile_transform"] = SQL_QUANTILE_TRANSFORM
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_event_pivot(spark, sf_dir):
    """Wide per-entity feature materialization: event-type counts
    pivoted to columns via groupBy().pivot() with an EXPLICIT value
    list (no schema-inference distinct job — the pivot plans as
    conditional aggregates in ONE grouped pass), plus exact-cents
    purchase monetary — the one-row-per-entity feature table a trainer
    joins against."""
    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.select("user_id", "event_type", cents.alias("__c"))
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__c").alias("s"),
        )
    )
    cols = [F.col("user_id")]
    for t in types:
        cols.append(
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long")
            .alias(f"n_{t}")
        )
    cols.append(
        (F.coalesce(F.col("purchase_s"), F.lit(0)).cast("double") / 100.0)
        .alias("purchase_value")
    )
    return wide.select(*cols)


SQL_EVENT_PIVOT = """
SELECT user_id,
  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
    AS BIGINT) AS n_click,
  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
    AS BIGINT) AS n_error,
  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
    AS BIGINT) AS n_purchase,
  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0)
    AS BIGINT) AS n_signup,
  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0)
    AS BIGINT) AS n_view,
  coalesce(sum(CASE WHEN event_type = 'purchase' THEN
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) END),
    0)::DOUBLE / 100.0 AS purchase_value
FROM events
GROUP BY user_id
"""

QUERIES["event_pivot"] = q_event_pivot
_RAW_ORACLES["event_pivot"] = SQL_EVENT_PIVOT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_gini_concentration(spark, sf_dir):
    """Per-source Gini coefficient of document character mass
    (operators/validate.py gini_concentration): the mixture-inequality
    audit beside source_stats/domain_cap — exact decimal(38,0) rank-sum
    arithmetic with a tie-invariant sum, ONE group-keyed exchange."""
    from mpds_spark.operators.validate import gini_concentration

    docs = load(spark, sf_dir, "documents")
    out = gini_concentration(docs, value="n_chars", by="source")
    return out.select(
        "source", "n_docs", "total_mass", _r6("gini").alias("gini")
    )


SQL_GINI_CONCENTRATION = """
WITH r AS (
  SELECT source, n_chars::HUGEINT AS x,
    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars)
      AS HUGEINT) AS i
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(x) AS BIGINT) AS total_mass,
  round(CASE WHEN sum(x) > 0 THEN
    (2*sum(i*x) - (count(*)::HUGEINT + 1) * sum(x))::DOUBLE
      / ((count(*)::HUGEINT * sum(x))::DOUBLE) END, 6) AS gini
FROM r GROUP BY source
"""

QUERIES["gini_concentration"] = q_gini_concentration
_RAW_ORACLES["gini_concentration"] = SQL_GINI_CONCENTRATION
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hot_key_audit(spark, sf_dir):
    """Distributed hot-key skew audit (operators/salting.py
    hot_key_audit): per-entity event counts rolled into exact
    floor(log2) buckets via length(bin(count))-1 — integer string ops,
    never floor(log2()) on a double — the distribution read before
    choosing chunk_span / enabling salting; skew collapses at the
    entity-keyed partial agg."""
    from mpds_spark.operators.salting import hot_key_audit

    ev = _events(spark, sf_dir)
    return hot_key_audit(ev, entity="user_id")


SQL_HOT_KEY_AUDIT = """
WITH c AS (
  SELECT user_id, count(*) AS c FROM events GROUP BY user_id
)
SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS log2_bucket,
  CAST(count(*) AS BIGINT) AS n_entities,
  CAST(sum(c) AS BIGINT) AS n_events,
  CAST(min(c) AS BIGINT) AS min_count,
  CAST(max(c) AS BIGINT) AS max_count
FROM c GROUP BY 1
"""

QUERIES["hot_key_audit"] = q_hot_key_audit
_RAW_ORACLES["hot_key_audit"] = SQL_HOT_KEY_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_rollup_activity(spark, sf_dir):
    """Multi-level OLAP rollup: event counts + exact-cents value totals
    at (event_type, hour), (event_type), and grand-total grains in ONE
    pass via df.rollup() — Spark's Expand + single aggregate (each input
    row fans out to its grouping sets before the one exchange; no
    per-grain re-scan). NULL group markers are unambiguous because both
    grouping columns are non-null."""
    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    hour = F.hour(F.col("ts").cast("timestamp")).cast("long")
    return (
        ev.select("event_type", hour.alias("hour"), cents.alias("__c"))
        .rollup("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum("__c").cast("double") / 100.0).alias("sum_value"),
        )
    )


SQL_ROLLUP_ACTIVITY = """
SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
  CAST(count(*) AS BIGINT) AS n_events,
  sum(CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT))::DOUBLE
    / 100.0 AS sum_value
FROM events
GROUP BY ROLLUP(event_type, hour(ts))
"""

QUERIES["rollup_activity"] = q_rollup_activity
_RAW_ORACLES["rollup_activity"] = SQL_ROLLUP_ACTIVITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_bucketed_join(spark, sf_dir):
    """Bucketed CO-LOCATED entity join (sources/bucketed.py): events and
    orders written once as bucketBy(user-key)+sortBy tables (≙ Iceberg
    bucket(N, entity) transform), then a MERGE-hinted equi-join and the
    per-user rollup run with ZERO shuffle exchanges — the
    write-once/join-many layout that is the single biggest win at 10^12
    rows. Tables are cached per (sf_dir, row count) and rebuilt only
    when the source changes; the oracle joins the raw parquet, so the
    row prices layout equivalence, not just the plan."""
    import hashlib
    import os

    from mpds_spark.sources.bucketed import write_bucketed

    ev = _events(spark, sf_dir)
    orders = load(spark, sf_dir, "orders")
    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    t_ev, t_or = f"mpds_bkt_events_{h}", f"mpds_bkt_orders_{h}"

    def ensure(table, src, entity, ts):
        if spark.catalog.tableExists(table):
            if spark.table(table).count() == src.count():
                return
        else:
            # a prior session's in-memory catalog may have left the
            # managed location on disk without a catalog entry — a
            # fresh write would fail LOCATION_ALREADY_EXISTS
            import shutil

            wh = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            loc = os.path.join(wh, table)
            if os.path.isdir(loc):
                shutil.rmtree(loc)
        write_bucketed(src, table, entity=entity, ts=ts, n_buckets=8)

    ensure(t_ev, ev, "user_id", "ts")
    ensure(t_or, orders, "o_custkey", "o_orderdate")
    e = spark.table(t_ev).select("user_id", "event_id")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
    ).cast("long")
    o = spark.table(t_or).select(
        F.col("o_custkey"), "o_orderkey", cents.alias("__c")
    )
    j = e.join(o.hint("merge"), e.user_id == o.o_custkey)
    return (
        j.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count_distinct("o_orderkey").cast("long").alias("n_orders"),
            (F.sum(F.col("__c").cast("decimal(38,0)")).cast("double")
             / 100.0).alias("pair_value"),
        )
    )


SQL_BUCKETED_JOIN = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
  sum(CAST(floor(abs(o_totalprice)*100 + 0.5)*sign(o_totalprice)
    AS HUGEINT))::DOUBLE / 100.0 AS pair_value
FROM events JOIN orders ON user_id = o_custkey
GROUP BY user_id
"""

QUERIES["bucketed_join"] = q_bucketed_join
_RAW_ORACLES["bucketed_join"] = SQL_BUCKETED_JOIN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_dense_daily_counts(spark, sf_dir):
    """Dense per-user daily grid with zero-fill (operators/backfill.py
    densify_daily): sequence()-exploded generated dimension between each
    user's first and last day, left-joined back to the per-day partial
    agg — silent days appear with n_events=0/sum 0.00, the grid a
    fixed-stride windowed model convolves over."""
    from mpds_spark.operators.backfill import densify_daily

    ev = _events(spark, sf_dir)
    cents = (
        F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
    ).cast("long")
    out = densify_daily(
        ev.withColumn("__c", cents),
        ts="ts",
        entity="user_id",
        value="__c",
        bucket_s=86400,
    )
    return out.select(
        "user_id",
        "bucket_start_s",
        "n_events",
        (F.col("sum_value").cast("double") / 100.0).alias("sum_value"),
    )


SQL_DENSE_DAILY_COUNTS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS b,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS HUGEINT) AS c
  FROM events
), pd AS (
  SELECT user_id, b, CAST(count(*) AS BIGINT) AS n, sum(c) AS s
  FROM e GROUP BY user_id, b
), sp AS (
  SELECT user_id, min(b) AS b0, max(b) AS b1 FROM pd GROUP BY user_id
), g AS (
  SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM sp
)
SELECT g.user_id, g.b * 86400.0 AS bucket_start_s,
  coalesce(pd.n, 0)::BIGINT AS n_events,
  coalesce(pd.s, 0::HUGEINT)::DOUBLE / 100.0 AS sum_value
FROM g LEFT JOIN pd ON g.user_id = pd.user_id AND g.b = pd.b
"""

QUERIES["dense_daily_counts"] = q_dense_daily_counts
_RAW_ORACLES["dense_daily_counts"] = SQL_DENSE_DAILY_COUNTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_temporal_split(spark, sf_dir):
    """Leakage-correct per-user temporal train/test split
    (operators/sampling.py temporal_split): each user's time-ordered
    history cut at 80% with an integer-exact rank*100 <= pct*n rule —
    every training row strictly precedes every test row; the split a
    temporal model must use where hash_split would leak the future."""
    from mpds_spark.operators.sampling import temporal_split

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    out = temporal_split(
        ev, ts="ts", entity="user_id", train_frac_pct=80,
        tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "split_rank", "split_n", "split"
    )


SQL_TEMPORAL_SPLIT = """
WITH r AS (
  SELECT event_id, user_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS BIGINT) AS split_rank,
    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS split_n
  FROM events
)
SELECT event_id, user_id, split_rank, split_n,
  CASE WHEN split_rank * 100 <= 80 * split_n THEN 'train' ELSE 'test' END
    AS split
FROM r
"""

QUERIES["temporal_split"] = q_temporal_split
_RAW_ORACLES["temporal_split"] = SQL_TEMPORAL_SPLIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_forward_label(spark, sf_dir):
    """Forward-looking LABEL construction (operators/asof.py asof_join
    direction='forward', allow_exact_matches=False, tolerance=24h,
    leakage_ok=True): for each event, whether the user's next purchase
    occurs STRICTLY after it within 24 hours, plus the exact
    time-to-purchase — the label half of training-set assembly. The
    forward direction raises LeakageError without the explicit
    leakage_ok opt-in (labels/eval only, never features); this row
    drives the gated path end to end."""
    from mpds_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    left = ev.select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    out = asof_join(
        left,
        purchases,
        on="ts",
        by="entity_id",
        direction="forward",
        tolerance=86400.0,
        allow_exact_matches=False,
        leakage_ok=True,
    )
    return out.select(
        "event_id",
        F.when(F.col("ts_r").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("label"),
        (F.col("ts_r") - F.col("ts")).alias("time_to_purchase_s"),
    )


SQL_FORWARD_LABEL = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
), p AS (
  SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id,
  CAST(CASE WHEN p.t - e.t <= 86400.0 THEN 1 ELSE 0 END AS BIGINT)
    AS label,
  CASE WHEN p.t - e.t <= 86400.0 THEN p.t - e.t END
    AS time_to_purchase_s
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.t < p.t
"""

QUERIES["forward_label"] = q_forward_label
_RAW_ORACLES["forward_label"] = SQL_FORWARD_LABEL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}

def q_target_encode(spark, sf_dir):
    """Out-of-fold smoothed target encoding (operators/encoding.py
    target_encode_oof): encode event_type by the propensity of a
    high-value event (value > 50), folds hashed from event_id, m=10
    empirical-Bayes shrinkage toward the leave-fold-out global rate.
    The leak-free categorical encoder in its scale shape: one fact-table
    exchange for the (category, fold) sufficient statistics, windows
    only on the 25-row tiny frame, broadcast join back. Reference
    analogue: held-out scoring discipline of
    dssPerformanceEvaluation.R:49-58 (a row never sees its own label)."""
    from mpds_spark.operators.encoding import target_encode_oof

    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.when(F.col("value") > 50, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    out = target_encode_oof(
        ev, category="event_type", target="y", key="event_id",
        n_folds=5, m=10.0,
    )
    return out.select(
        "event_id", "event_type", "fold", "y",
        F.col("te_event_type").alias("te"),
    )


SQL_TARGET_ENCODE = """
WITH e AS (
  SELECT event_id, event_type,
    CAST(CASE WHEN value > 50 THEN 1 ELSE 0 END AS BIGINT) AS y,
    CAST(CAST(('0x' || substr(md5('fold|' || CAST(event_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 5 AS INT) AS fold
  FROM events
), cf AS (
  SELECT event_type, fold,
    CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS c
  FROM e GROUP BY event_type, fold
), lo AS (
  SELECT event_type, fold,
    SUM(s) OVER (PARTITION BY event_type) - s AS loo_s,
    SUM(c) OVER (PARTITION BY event_type) - c AS loo_c,
    SUM(s) OVER () - SUM(s) OVER (PARTITION BY fold) AS g_s,
    SUM(c) OVER () - SUM(c) OVER (PARTITION BY fold) AS g_c
  FROM cf
)
SELECT e.event_id, e.event_type, e.fold, e.y,
  (CAST(loo_s AS DOUBLE) +
   10.0 * (CAST(g_s AS DOUBLE) / CAST(g_c AS DOUBLE)))
  / (CAST(loo_c AS DOUBLE) + 10.0) AS te
FROM e
JOIN lo ON e.event_type = lo.event_type AND e.fold = lo.fold
"""

QUERIES["target_encode"] = q_target_encode
_RAW_ORACLES["target_encode"] = SQL_TARGET_ENCODE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_json_features(spark, sf_dir):
    """Semi-structured feature extraction: parse the events.props JSON
    column JVM-side (get_json_object — no Python, no shuffle for the
    extraction itself) and aggregate the extracted integer k per user:
    count / sum / min / max / distinct-k / exact mean. The schema-on-read
    munging stage every telemetry pipeline runs before feature windows;
    at 100 TB the parse is a codegen'd map over the scan and the only
    exchange is the user-keyed aggregate."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("user_id", k.alias("k"))
        .groupBy("user_id")
        .agg(
            F.count("k").alias("k_cnt"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("k_distinct"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_mean"),
        )
    )


SQL_JSON_FEATURES = """
WITH e AS (
  SELECT user_id,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT user_id,
  count(k) AS k_cnt,
  CAST(sum(k) AS BIGINT) AS k_sum,
  min(k) AS k_min,
  max(k) AS k_max,
  count(DISTINCT k) AS k_distinct,
  CAST(sum(k) AS DOUBLE) / count(k) AS k_mean
FROM e GROUP BY user_id
"""

QUERIES["json_features"] = q_json_features
_RAW_ORACLES["json_features"] = SQL_JSON_FEATURES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_scd2_join(spark, sf_dir):
    """SCD Type-2 point-in-time dimension join — the feature-store
    staple: build a versioned (valid_from, valid_to) dimension from a
    change log, then enrich facts with the version valid AT each fact's
    timestamp. The customer-tier dimension is derived from orders (each
    order opens a new tier version; same-day restatements collapse to
    the highest orderkey, classic last-write-wins), versions are closed
    by lead(valid_from) and numbered, and events are joined point-in-
    time. Implementation is the as-of join (one fact exchange, no
    interval blow-up): because versions are contiguous, the latest
    version with valid_from <= t IS the interval match — and the DuckDB
    oracle verifies exactly that equivalence with an explicit
    valid_from <= t < valid_to interval-predicate join. At 100 TB the
    dimension windows touch only the (small) change log and the fact
    table pays one entity-keyed exchange, never a range join.
    Reference analogue: per-patient medication-state epochs gating
    before/after comparisons (dssFunctionLibrary.R:119-171 interleave
    epochs; dssPerformanceEvaluation.R:49-58 held-out discipline)."""
    dim0 = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.col("o_orderdate").cast("timestamp").cast("double").alias("ts"),
        "o_totalprice",
        "o_orderkey",
    )
    # same-(entity, day) restatements: last write (max orderkey) wins
    w_dup = Window.partitionBy("entity_id", "ts").orderBy(
        F.desc("o_orderkey")
    )
    dim1 = (
        dim0.withColumn("__rn", F.row_number().over(w_dup))
        .filter(F.col("__rn") == 1)
        .select(
            "entity_id",
            "ts",
            F.when(F.col("o_totalprice") >= 300000, F.lit("gold"))
            .when(F.col("o_totalprice") >= 150000, F.lit("silver"))
            .otherwise(F.lit("bronze"))
            .alias("tier"),
        )
    )
    w_v = Window.partitionBy("entity_id").orderBy("ts")
    dim = dim1.select(
        "entity_id",
        "ts",
        "tier",
        F.row_number().over(w_v).cast("long").alias("tier_version"),
        F.lead("ts").over(w_v).alias("__vt"),
    )
    fact = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    out = asof_join(fact, dim, on="ts", by="entity_id")
    matched = F.col("ts_r").isNotNull()
    return out.select(
        "event_id",
        "tier",
        "tier_version",
        _r6("ts_r").alias("tier_since"),
        F.when(matched, F.col("__vt").isNull().cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("is_current"),
    )


SQL_SCD2_JOIN = """
WITH d0 AS (
  SELECT o_custkey AS user_id, epoch(o_orderdate) AS vf, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC) AS rn
  FROM orders
), d1 AS (
  SELECT user_id, vf,
    CASE WHEN o_totalprice >= 300000 THEN 'gold'
         WHEN o_totalprice >= 150000 THEN 'silver'
         ELSE 'bronze' END AS tier
  FROM d0 WHERE rn = 1
), d AS (
  SELECT user_id, vf, tier,
    lead(vf) OVER (PARTITION BY user_id ORDER BY vf) AS vt,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY vf) AS BIGINT)
      AS tier_version
  FROM d1
), e AS (
  SELECT event_id, user_id, epoch(ts) AS t FROM events
)
SELECT e.event_id, d.tier, d.tier_version,
  round(d.vf, 6) AS tier_since,
  CAST(CASE WHEN d.user_id IS NULL THEN NULL
            WHEN d.vt IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM e
LEFT JOIN d ON e.user_id = d.user_id
           AND e.t >= d.vf AND (d.vt IS NULL OR e.t < d.vt)
"""

QUERIES["scd2_join"] = q_scd2_join
_RAW_ORACLES["scd2_join"] = SQL_SCD2_JOIN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rolling_median(spark, sf_dir):
    """Per-entity rolling median (and min/max) of `value` over the
    trailing 5 events — the robust-smoothing twin of the expanding
    means in derived_features: a median filter is the standard outlier-
    immune denoise before rolling features (reference analogue: the
    window median in the accel stat battery, extractAccelTestV2.m:80,
    re-expressed on the point-in-time trailing frame). Exact semantics:
    the frame is ROWS 4 PRECEDING..CURRENT ordered by (ts, event_id);
    median = (arr[(n+1) div 2] + arr[n div 2 + 1]) / 2 over the sorted
    frame — the two indices coincide for odd n, so one expression covers
    both parities and matches the interpolating median exactly. Scale
    shape: bounded O(k) frame state, one entity-keyed exchange shared by
    all three windows, everything JVM-side (collect_list + array_sort
    on a 5-element array — no Python)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "value",
    )
    w = (
        Window.partitionBy("entity_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + F.lit(1)) / F.lit(2)).cast("int"))
    hi = F.element_at(arr, (n / F.lit(2)).cast("int") + F.lit(1))
    return ev.select(
        "event_id",
        n.cast("long").alias("win_n"),
        _r6((lo + hi) / F.lit(2.0)).alias("roll_med"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
    )


SQL_ROLLING_MEDIAN = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, value FROM events
), w AS (
  SELECT event_id,
    list_sort(list(value) OVER frame) AS arr,
    min(value) OVER frame AS roll_min,
    max(value) OVER frame AS roll_max
  FROM e
  WINDOW frame AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT event_id,
  CAST(len(arr) AS BIGINT) AS win_n,
  round((arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1]) / 2.0, 6)
    AS roll_med,
  roll_min, roll_max
FROM w
"""

QUERIES["rolling_median"] = q_rolling_median
_RAW_ORACLES["rolling_median"] = SQL_ROLLING_MEDIAN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_feature_matrix(spark, sf_dir):
    """Point-in-time training-matrix assembly — the feature-store
    flagship shape: for every purchase event (the label row: was it a
    high-value purchase?) assemble strictly-backward-looking features
    from the full event stream (trailing-7-day count/value-sum/click
    count, lifetime event count, seconds since the previous event) plus
    a broadcast customer dimension. Implementation is the union-timeline
    cumulative-difference pattern — NOT a per-label range join: label
    markers and 7-day boundary markers are unioned into the event
    stream, ONE entity-keyed window computes running aggregates over
    (ts, kind) — markers sort before same-instant events, so every
    feature is strict-past (zero leakage, exactly `e.ts < label.ts`) —
    and each label's trailing window is the difference of its two
    markers' running values. Cost at 10^12 rows: one entity exchange +
    one label-keyed agg + a broadcast hash join; a naive interval join
    would pay |labels|x|window| and a range-join blow-up. The DuckDB
    oracle IS that naive interval join, proving the equivalence.
    Reference analogue: per-patient clinical comparisons assembled from
    sensor-feature history relative to visit timestamps
    (dssFunctionLibrary.R:119-171) with the held-out per-user scoring
    discipline of dssPerformanceEvaluation.R:49-58."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "event_type",
        "value",
    )
    events = ev.select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("label_id"),
        F.lit(None).cast("string").alias("marker"),
        F.lit(1).alias("is_ev"),
        "value",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase")

    def marker(ts_col, name):
        return purchases.select(
            "user_id",
            ts_col.alias("ts"),
            F.lit(0).alias("kind"),
            F.col("event_id").alias("label_id"),
            F.lit(name).alias("marker"),
            F.lit(0).alias("is_ev"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("int").alias("is_click"),
        )

    frame = events.unionAll(marker(F.col("ts") - 604800.0, "lo")).unionAll(
        marker(F.col("ts"), "hi")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = frame.select(
        "label_id",
        "marker",
        "user_id",
        "ts",
        F.sum("is_ev").over(w).alias("c_cnt"),
        F.sum(F.when(F.col("is_ev") == 1, F.col("value"))).over(w).alias("c_val"),
        F.sum("is_click").over(w).alias("c_clk"),
        F.max(F.when(F.col("is_ev") == 1, F.col("ts"))).over(w).alias("c_last"),
    ).filter(F.col("label_id").isNotNull())
    hi = F.when(F.col("marker") == "hi", F.col("c_cnt"))
    lo = F.when(F.col("marker") == "lo", F.col("c_cnt"))
    feats = run.groupBy("label_id").agg(
        F.first("user_id").alias("user_id"),
        F.max(F.when(F.col("marker") == "hi", F.col("ts"))).alias("__t"),
        (F.coalesce(F.max(hi), F.lit(0)) - F.coalesce(F.max(lo), F.lit(0)))
        .cast("long")
        .alias("t7_cnt"),
        (
            F.coalesce(F.max(F.when(F.col("marker") == "hi", F.col("c_val"))), F.lit(0.0))
            - F.coalesce(F.max(F.when(F.col("marker") == "lo", F.col("c_val"))), F.lit(0.0))
        ).alias("__t7_sum"),
        (
            F.coalesce(F.max(F.when(F.col("marker") == "hi", F.col("c_clk"))), F.lit(0))
            - F.coalesce(F.max(F.when(F.col("marker") == "lo", F.col("c_clk"))), F.lit(0))
        )
        .cast("long")
        .alias("t7_clicks"),
        F.coalesce(F.max(hi), F.lit(0)).cast("long").alias("life_cnt"),
        F.max(F.when(F.col("marker") == "hi", F.col("c_last"))).alias("__prev"),
    )
    lab = purchases.select(
        F.col("event_id").alias("label_id"),
        (F.col("value") >= 100.0).cast("int").alias("label_high_value"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return (
        feats.join(F.broadcast(lab), "label_id")
        .join(F.broadcast(cust), "user_id", "left")
        .select(
            "label_id",
            "label_high_value",
            "t7_cnt",
            _r6(F.col("__t7_sum")).alias("t7_sum"),
            "t7_clicks",
            "life_cnt",
            _r6(F.col("__t") - F.col("__prev")).alias("secs_since_prev"),
            "acctbal",
            "mktsegment",
        )
    )


SQL_FEATURE_MATRIX = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, event_type, value FROM events
), l AS (
  SELECT event_id AS label_id, user_id, t,
    CAST(value >= 100.0 AS INT) AS label_high_value
  FROM e WHERE event_type = 'purchase'
), f AS (
  SELECT l.label_id,
    CAST(count(e.t) FILTER (WHERE e.t >= l.t - 604800.0) AS BIGINT)
      AS t7_cnt,
    round(coalesce(sum(e.value) FILTER (WHERE e.t >= l.t - 604800.0), 0),
          6) AS t7_sum,
    CAST(coalesce(count(e.t) FILTER (
        WHERE e.t >= l.t - 604800.0 AND e.event_type = 'click'), 0)
      AS BIGINT) AS t7_clicks,
    CAST(count(e.t) AS BIGINT) AS life_cnt,
    round(l.t - max(e.t), 6) AS secs_since_prev
  FROM l LEFT JOIN e ON e.user_id = l.user_id AND e.t < l.t
  GROUP BY l.label_id, l.t
)
SELECT l.label_id, l.label_high_value, f.t7_cnt, f.t7_sum, f.t7_clicks,
  f.life_cnt, f.secs_since_prev,
  c.c_acctbal AS acctbal, c.c_mktsegment AS mktsegment
FROM l JOIN f USING (label_id)
LEFT JOIN customer c ON c.c_custkey = l.user_id
"""

QUERIES["feature_matrix"] = q_feature_matrix
_RAW_ORACLES["feature_matrix"] = SQL_FEATURE_MATRIX
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_psi_drift(spark, sf_dir):
    """Population Stability Index — the standard MLOps feature-drift
    monitor: split the event stream at its temporal midpoint, learn
    decile bin edges on the REFERENCE half (exact interpolating
    percentiles), bin both halves, and report per-bin counts +
    Laplace-smoothed PSI terms (p-q)*ln(p/q) plus the total. Every
    scalar (midpoint, bin edges, totals) stays lazy/distributed via
    1-row broadcast cross joins — no driver collect; the per-value work
    is one binning map over a broadcast 9-edge array; the only real
    exchange is the bin aggregation. The single-partition window at the
    end runs over exactly 10 bin rows. Drift gates are how a production
    feature store decides to retrain/alert (reference analogue: the
    train-vs-holdout score-distribution comparison in
    dssPerformanceEvaluation.R:49-58)."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").cast("timestamp").cast("double").alias("t"), "value"
    )
    mid = ev.agg(
        ((F.min("t") + F.max("t")) / F.lit(2.0)).alias("__mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "value", (F.col("t") < F.col("__mid")).cast("int").alias("is_ref")
    )
    edges = (
        tagged.filter(F.col("is_ref") == 1)
        .agg(
            F.expr(
                "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("__bp")
        )
    )
    binned = tagged.crossJoin(F.broadcast(edges)).select(
        "is_ref",
        (
            F.size(F.expr("filter(__bp, b -> value > b)")) + F.lit(1)
        ).cast("long").alias("bin"),
    )
    cnt = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("ref_cnt"),
        F.sum(F.lit(1) - F.col("is_ref")).cast("long").alias("cur_cnt"),
    )
    w_all = Window.partitionBy()
    n_ref = F.sum("ref_cnt").over(w_all)
    n_cur = F.sum("cur_cnt").over(w_all)
    p = (F.col("ref_cnt") + F.lit(0.5)) / (n_ref + F.lit(5.0))
    q = (F.col("cur_cnt") + F.lit(0.5)) / (n_cur + F.lit(5.0))
    term = (p - q) * F.log(
        ((F.col("ref_cnt") + F.lit(0.5)) * (n_cur + F.lit(5.0)))
        / ((F.col("cur_cnt") + F.lit(0.5)) * (n_ref + F.lit(5.0)))
    )
    out = cnt.select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        term.alias("__term"),
    )
    return out.select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        _r6(F.col("__term")).alias("psi_term"),
        _r6(F.sum("__term").over(w_all)).alias("psi_total"),
    )


SQL_PSI_DRIFT = """
WITH e AS (
  SELECT epoch(ts) AS t, value FROM events
), m AS (
  SELECT (min(t) + max(t)) / 2.0 AS mid FROM e
), tagged AS (
  SELECT value, CAST(t < m.mid AS INT) AS is_ref FROM e CROSS JOIN m
), edges AS (
  SELECT quantile_cont(value,
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bp
  FROM tagged WHERE is_ref = 1
), binned AS (
  SELECT is_ref,
    CAST(len(list_filter(e.bp, b -> value > b)) + 1 AS BIGINT) AS bin
  FROM tagged CROSS JOIN edges e
), cnt AS (
  SELECT bin,
    CAST(sum(is_ref) AS BIGINT) AS ref_cnt,
    CAST(sum(1 - is_ref) AS BIGINT) AS cur_cnt
  FROM binned GROUP BY bin
), terms AS (
  SELECT bin, ref_cnt, cur_cnt,
    ((ref_cnt + 0.5) / (sum(ref_cnt) OVER () + 5.0)
     - (cur_cnt + 0.5) / (sum(cur_cnt) OVER () + 5.0))
    * ln(((ref_cnt + 0.5) * (sum(cur_cnt) OVER () + 5.0))
         / ((cur_cnt + 0.5) * (sum(ref_cnt) OVER () + 5.0))) AS term
  FROM cnt
)
SELECT bin, ref_cnt, cur_cnt, round(term, 6) AS psi_term,
  round(sum(term) OVER (), 6) AS psi_total
FROM terms
"""

QUERIES["psi_drift"] = q_psi_drift
_RAW_ORACLES["psi_drift"] = SQL_PSI_DRIFT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_anomaly_mad(spark, sf_dir):
    """Robust per-entity anomaly scores via Median Absolute Deviation —
    the outlier-immune twin of zscore_outliers (a handful of spikes
    inflate a stddev but barely move the MAD): modified z-score
    0.6745*(x-med)/MAD with the standard |z|>3.5 flag (Iglewicz &
    Hoaglin 1993). Both exact medians (value, then absolute deviation)
    run as WINDOW aggregates over the same entity partitioning — the
    chained windows satisfy the subset rule, so the whole query costs
    ONE entity-keyed exchange, never a median-agg + join-back round
    trip. Reference analogue: the robust location/scale idiom of the
    accel battery's median/prctile stack (extractAccelTestV2.m:80-90,
    dssFunctionLibrary.R robust rescale)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        "value",
    )
    w = Window.partitionBy("entity_id")
    med = F.expr("percentile(value, 0.5)").over(w)
    step = ev.withColumn("med", med).withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = F.expr("percentile(absdev, 0.5)").over(w)
    out = step.withColumn("mad", mad)
    rz = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"),
    )
    return out.select(
        "event_id",
        _r6(F.col("med")).alias("med"),
        _r6(F.col("mad")).alias("mad"),
        _r6(rz).alias("robust_z"),
        F.when(rz.isNotNull(), (F.abs(rz) > 3.5).cast("int")).alias(
            "is_outlier"
        ),
    )


SQL_ANOMALY_MAD = """
WITH e AS (
  SELECT event_id, user_id, value FROM events
), m AS (
  SELECT event_id, user_id, value,
    quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
  FROM e
), d AS (
  SELECT event_id, value, med,
    quantile_cont(abs(value - med), 0.5) OVER (PARTITION BY user_id)
      AS mad
  FROM m
)
SELECT event_id, round(med, 6) AS med, round(mad, 6) AS mad,
  round(CASE WHEN mad > 0
             THEN 0.6745 * (value - med) / mad END, 6) AS robust_z,
  CASE WHEN mad > 0
       THEN CAST(abs(0.6745 * (value - med) / mad) > 3.5 AS INT)
       END AS is_outlier
FROM d
"""

QUERIES["anomaly_mad"] = q_anomaly_mad
_RAW_ORACLES["anomaly_mad"] = SQL_ANOMALY_MAD
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rolling_distinct(spark, sf_dir):
    """Trailing-24h DISTINCT event-type count + row count per event —
    the cardinality-flavored trailing feature (how *varied* was this
    entity's recent behavior, not just how much): a time-RANGE frame
    [t-86400, t] on one entity-keyed exchange, distinct via
    array_distinct over the frame's collected types (bounded: |types|
    <= 5 here; at an unbounded type domain the HLL-sketch variant in
    hot_key_audit's family takes over). RANGE (not ROWS) so exact-tie
    timestamps agree deterministically with the oracle's interval
    self-join regardless of tie order. The float-seconds frame goes
    through SQL RANGE BETWEEN (the py4j rangeBetween binding is
    long-only)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "event_type",
    )
    ev = ev.withColumn(
        "types",
        F.expr(
            "collect_list(event_type) OVER ("
            "PARTITION BY entity_id ORDER BY ts "
            "RANGE BETWEEN 86400.0 PRECEDING AND CURRENT ROW)"
        ),
    )
    return ev.select(
        "event_id",
        F.size(F.array_distinct("types")).cast("long").alias("d1_types"),
        F.size("types").cast("long").alias("d1_cnt"),
    )


SQL_ROLLING_DISTINCT = """
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t, event_type FROM events
)
SELECT a.event_id,
  CAST(count(DISTINCT b.event_type) AS BIGINT) AS d1_types,
  CAST(count(*) AS BIGINT) AS d1_cnt
FROM e a JOIN e b
  ON b.user_id = a.user_id AND b.t >= a.t - 86400.0 AND b.t <= a.t
GROUP BY a.event_id
"""

QUERIES["rolling_distinct"] = q_rolling_distinct
_RAW_ORACLES["rolling_distinct"] = SQL_ROLLING_DISTINCT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_top_paths(spark, sf_dir):
    """Session path mining — the top-20 opening event-type sequences
    (first 3 events of each 30-min gap-rule session, joined 'a>b>c')
    with session and distinct-user counts: the classic product-analytics
    path report and the discrete cousin of conversion_funnel. The gap
    window, session-id running sum and within-session ranking all ride
    ONE entity-keyed exchange (subset rule); paths then pay one
    two-level count-distinct agg, and the top-20 is a per-partition heap
    (TakeOrderedAndProject — no global sort of the path universe, which
    at 10^12 events is |type|^3-bounded but long-tailed). Deterministic
    ties: (count DESC, path ASC) on both sides."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("entity_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts") - F.lag("ts").over(w)) > 1800.0),
        1,
    ).otherwise(0)
    sed = ev.withColumn(
        "sid",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_s = Window.partitionBy("entity_id", "sid").orderBy("ts", "event_id")
    first3 = sed.withColumn("rn", F.row_number().over(w_s)).filter(
        F.col("rn") <= 3
    )
    paths = first3.groupBy("entity_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("entity_id").alias("n_users"),
    )
    return agg.orderBy(F.desc("n_sessions"), "path").limit(20)


SQL_TOP_PATHS = """
WITH e AS (
  SELECT user_id, epoch(ts) AS t, event_id, event_type FROM events
), m AS (
  SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800.0
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
), f AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY t, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM f WHERE rn <= 3 GROUP BY user_id, sid
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""

QUERIES["top_paths"] = q_top_paths
_RAW_ORACLES["top_paths"] = SQL_TOP_PATHS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_lagged_corr(spark, sf_dir):
    """Cross-series LAGGED correlation per entity: Pearson corr between
    this hour's click count and the NEXT hour's purchase count over the
    entity's dense hourly grid — the lead/lag predictive-signal screen
    (does activity anticipate conversion?). Missing hours are real
    zeros, so the grid is densified first (global hour span via a 1-row
    broadcast, per-entity sequence explode — never a driver loop); the
    correlation folds to six exact integer sums (n, Sx, Sy, Sxy, Sxx,
    Syy — counts, so decimal-exact at any scale) with one double
    division at the end. Lead + final agg share the entity-keyed
    exchange."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.floor(F.col("ts").cast("timestamp").cast("double") / 3600)
        .cast("long")
        .alias("hr"),
        "event_type",
    )
    cnt = ev.groupBy("entity_id", "hr").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("p"),
    )
    span = ev.agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = (
        cnt.select("entity_id")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "entity_id", F.explode(F.sequence("h0", "h1")).alias("hr")
        )
    )
    dense = grid.join(cnt, ["entity_id", "hr"], "left").select(
        "entity_id",
        "hr",
        F.coalesce("c", F.lit(0)).alias("x"),
        F.coalesce("p", F.lit(0)).alias("y"),
    )
    w = Window.partitionBy("entity_id").orderBy("hr")
    led = dense.withColumn("y1", F.lead("y").over(w)).filter(
        F.col("y1").isNotNull()
    )
    agg = led.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").alias("sx"),
        F.sum("y1").alias("sy"),
        F.sum(F.col("x") * F.col("y1")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y1") * F.col("y1")).alias("syy"),
    )
    num = agg["n_hours"] * F.col("sxy") - F.col("sx") * F.col("sy")
    den2 = (agg["n_hours"] * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        agg["n_hours"] * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return agg.select(
        "entity_id",
        "n_hours",
        F.col("sx").alias("clicks_total"),
        _r6(
            F.when(den2 > 0, num / F.sqrt(den2.cast("double")))
        ).alias("corr_click_next_purchase"),
    )


SQL_LAGGED_CORR = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
    event_type
  FROM events
), cnt AS (
  SELECT user_id, hr,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS c,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS p
  FROM e GROUP BY user_id, hr
), span AS (
  SELECT min(hr) AS h0, max(hr) AS h1 FROM e
), grid AS (
  SELECT u.user_id, g.hr
  FROM (SELECT DISTINCT user_id FROM cnt) u
  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS hr FROM span) g
), dense AS (
  SELECT grid.user_id, grid.hr,
    coalesce(cnt.c, 0) AS x, coalesce(cnt.p, 0) AS y
  FROM grid LEFT JOIN cnt
    ON cnt.user_id = grid.user_id AND cnt.hr = grid.hr
), led AS (
  SELECT user_id, x,
    lead(y) OVER (PARTITION BY user_id ORDER BY hr) AS y1
  FROM dense
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
    sum(x) AS sx, sum(y1) AS sy, sum(x * y1) AS sxy,
    sum(x * x) AS sxx, sum(y1 * y1) AS syy
  FROM led WHERE y1 IS NOT NULL GROUP BY user_id
)
SELECT user_id AS entity_id, n_hours,
  CAST(sx AS BIGINT) AS clicks_total,
  round(CASE WHEN (n_hours * sxx - sx * sx) * (n_hours * syy - sy * sy)
                  > 0
             THEN (n_hours * sxy - sx * sy)
                  / sqrt(CAST((n_hours * sxx - sx * sx)
                              * (n_hours * syy - sy * sy) AS DOUBLE))
             END, 6) AS corr_click_next_purchase
FROM agg
"""

QUERIES["lagged_corr"] = q_lagged_corr
_RAW_ORACLES["lagged_corr"] = SQL_LAGGED_CORR
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_centroid_similarity(spark, sf_dir):
    """Inter-cluster separation audit: pairwise cosine between every
    pair of label centroids, with cluster sizes — the companion to
    centroid_outliers (which scores members vs their OWN centroid):
    near-1 pairs flag label families SemDeDup-style pruning would
    conflate. One exploded (label,pos) mean pass over the corpus — the
    centroid frame is persisted so the stats/pairs branches never
    re-explode the source; the pairwise join then runs on the
    |labels| x dim centroid frame only (corpus never self-joined), so
    at 10^12 vectors the cost stays the single explode+agg scan."""
    from mpds_spark.operators.util import scratch_persist

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).select("vec_id", "label", "pos", F.col("x").cast("double").alias("x"))
    c = scratch_persist(
        e.groupBy("label", "pos").agg(
            F.avg("x").alias("cx"), F.countDistinct("vec_id").alias("nv")
        )
    )
    stats = c.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("norm"),
        F.max("nv").alias("n_vecs"),
    )
    a = c.select(
        F.col("label").alias("label_a"), "pos", F.col("cx").alias("ax")
    )
    b = c.select(
        F.col("label").alias("label_b"), "pos", F.col("cx").alias("bx")
    )
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("dot"))
    )
    sa = stats.select(
        F.col("label").alias("label_a"),
        F.col("norm").alias("na"),
        F.col("n_vecs").alias("n_a"),
    )
    sb = stats.select(
        F.col("label").alias("label_b"),
        F.col("norm").alias("nb"),
        F.col("n_vecs").alias("n_b"),
    )
    return (
        dots.join(F.broadcast(sa), "label_a")
        .join(F.broadcast(sb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            _r6(F.col("dot") / (F.col("na") * F.col("nb"))).alias(
                "centroid_cos"
            ),
        )
    )


SQL_CENTROID_SIMILARITY = """
WITH e AS (
  SELECT vec_id, label,
    generate_subscripts(embedding, 1) AS pos,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), c AS (
  SELECT label, pos, avg(x) AS cx,
    CAST(count(DISTINCT vec_id) AS BIGINT) AS nv
  FROM e GROUP BY label, pos
), s AS (
  SELECT label, sqrt(sum(cx * cx)) AS norm, max(nv) AS n_vecs
  FROM c GROUP BY label
), d AS (
  SELECT a.label AS label_a, b.label AS label_b,
    sum(a.cx * b.cx) AS dot
  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT d.label_a, d.label_b, sa.n_vecs AS n_a, sb.n_vecs AS n_b,
  round(d.dot / (sa.norm * sb.norm), 6) AS centroid_cos
FROM d
JOIN s sa ON sa.label = d.label_a
JOIN s sb ON sb.label = d.label_b
"""

QUERIES["centroid_similarity"] = q_centroid_similarity
_RAW_ORACLES["centroid_similarity"] = SQL_CENTROID_SIMILARITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_sliding_windows(spark, sf_dir):
    """Native event-time SLIDING windows (1-hour windows every 15 min,
    epoch-aligned): per-window event + distinct-user counts via
    F.window(slide) — Catalyst's Expand assigns each event its 4
    overlapping windows in the map stage, so the cost is one widened
    aggregation, never a per-window scan or a grid self-join. The batch
    twin of streaming_windowed_counts' tumbling path; the DuckDB oracle
    derives each event's window starts s in (t-3600, t] from first
    principles with generate_series, proving the assignment arithmetic.
    Output keyed by window start (epoch seconds)."""
    ev = _events(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    agg = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return agg.select(
        F.col("w.start").cast("double").alias("window_start"),
        "n_events",
        "n_users",
    )


SQL_SLIDING_WINDOWS = """
WITH e AS (
  SELECT user_id, epoch(ts) AS t FROM events
), assigned AS (
  SELECT user_id, 900.0 * k AS window_start
  FROM e, LATERAL unnest(generate_series(
    CAST(floor((t - 3600.0) / 900.0) AS BIGINT) + 1,
    CAST(floor(t / 900.0) AS BIGINT))) AS u(k)
)
SELECT window_start,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM assigned GROUP BY window_start
"""

QUERIES["sliding_windows"] = q_sliding_windows
_RAW_ORACLES["sliding_windows"] = SQL_SLIDING_WINDOWS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_local_peaks(spark, sf_dir):
    """Per-entity local-maximum detection — the distributed findpeaks:
    a peak is a strict neighbor-compare maximum (value > prev AND
    value > next, (ts,event_id)-ordered), rolled up to peak count, mean
    inter-peak gap and max peak height per entity. The neighbor lags,
    the inter-peak lag over the filtered peak rows, and the final
    rollup all cluster on the SAME entity key, so the whole query is
    one exchange (subset rule). Reference analogue: the alternation /
    peak segmentation in the tap battery (extractTapTestV2.m tap
    alternation; kernels.py:222 transcription oracle) re-expressed as a
    set-based window op."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("entity_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "entity_id",
        "ts",
        "value",
        (
            (F.col("value") > F.lag("value").over(w))
            & (F.col("value") > F.lead("value").over(w))
        ).alias("is_peak"),
    ).filter(F.col("is_peak"))
    w_p = Window.partitionBy("entity_id").orderBy("ts")
    gapped = flagged.select(
        "entity_id",
        "value",
        (F.col("ts") - F.lag("ts").over(w_p)).alias("gap"),
    )
    return gapped.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_peaks"),
        _r6(F.avg("gap")).alias("mean_peak_gap_s"),
        _r6(F.max("value")).alias("max_peak_value"),
    )


SQL_LOCAL_PEAKS = """
WITH e AS (
  SELECT user_id, epoch(ts) AS t, event_id, value FROM events
), n AS (
  SELECT user_id, t, value,
    lag(value) OVER w AS pv, lead(value) OVER w AS nv
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), p AS (
  SELECT user_id, t, value,
    t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
  FROM n WHERE value > pv AND value > nv
)
SELECT user_id AS entity_id,
  CAST(count(*) AS BIGINT) AS n_peaks,
  round(avg(gap), 6) AS mean_peak_gap_s,
  round(max(value), 6) AS max_peak_value
FROM p GROUP BY user_id
"""

QUERIES["local_peaks"] = q_local_peaks
_RAW_ORACLES["local_peaks"] = SQL_LOCAL_PEAKS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_profile_events(spark, sf_dir):
    """One-pass column profile of the events table (the Deequ-style
    profiling companion to validate_docs' rule suite): per column —
    null count, exact distinct count, numeric min/max (epoch seconds
    for ts), lexicographic min/max for strings. ALL columns' statistics
    come out of a single wide aggregation (Catalyst plans the six exact
    count-distincts through one Expand), then one explode pivots the
    1-row result to long format — the profile never rescans the table
    per column, which is the difference between 6x and 1x the 100-TB
    scan bill."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    total = F.count(F.lit(1))
    agg = ev.agg(
        total.alias("n_rows"),
        *[
            a
            for c in ("event_id", "ts", "user_id", "value")
            for a in (
                (total - F.count(c)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__ndv"),
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            )
        ],
        *[
            a
            for c in ("event_type", "props")
            for a in (
                (total - F.count(c)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__ndv"),
                F.min(c).alias(f"{c}__smin"),
                F.max(c).alias(f"{c}__smax"),
            )
        ],
    )
    rows = []
    for c in ("event_id", "ts", "user_id", "value"):
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                _r6(F.col(f"{c}__min")).alias("min_d"),
                _r6(F.col(f"{c}__max")).alias("max_d"),
                F.lit(None).cast("string").alias("min_s"),
                F.lit(None).cast("string").alias("max_s"),
            )
        )
    for c in ("event_type", "props"):
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_d"),
                F.lit(None).cast("double").alias("max_d"),
                F.col(f"{c}__smin").alias("min_s"),
                F.col(f"{c}__smax").alias("max_s"),
            )
        )
    return agg.select(
        "n_rows", F.explode(F.array(*rows)).alias("p")
    ).select("p.column", "n_rows", "p.n_nulls", "p.n_distinct",
             "p.min_d", "p.max_d", "p.min_s", "p.max_s")


SQL_PROFILE_EVENTS = """
WITH e AS (
  SELECT event_id, epoch(ts) AS ts, user_id, event_type, value, props
  FROM events
), t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM e)
SELECT 'event_id' AS "column", t.n_rows,
  (SELECT CAST(t.n_rows - count(event_id) AS BIGINT) FROM e) AS n_nulls,
  (SELECT CAST(count(DISTINCT event_id) AS BIGINT) FROM e) AS n_distinct,
  (SELECT round(CAST(min(event_id) AS DOUBLE), 6) FROM e) AS min_d,
  (SELECT round(CAST(max(event_id) AS DOUBLE), 6) FROM e) AS max_d,
  NULL AS min_s, NULL AS max_s
FROM t
UNION ALL
SELECT 'ts', t.n_rows,
  (SELECT CAST(t.n_rows - count(ts) AS BIGINT) FROM e),
  (SELECT CAST(count(DISTINCT ts) AS BIGINT) FROM e),
  (SELECT round(min(ts), 6) FROM e),
  (SELECT round(max(ts), 6) FROM e), NULL, NULL
FROM t
UNION ALL
SELECT 'user_id', t.n_rows,
  (SELECT CAST(t.n_rows - count(user_id) AS BIGINT) FROM e),
  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM e),
  (SELECT round(CAST(min(user_id) AS DOUBLE), 6) FROM e),
  (SELECT round(CAST(max(user_id) AS DOUBLE), 6) FROM e), NULL, NULL
FROM t
UNION ALL
SELECT 'value', t.n_rows,
  (SELECT CAST(t.n_rows - count(value) AS BIGINT) FROM e),
  (SELECT CAST(count(DISTINCT value) AS BIGINT) FROM e),
  (SELECT round(min(value), 6) FROM e),
  (SELECT round(max(value), 6) FROM e), NULL, NULL
FROM t
UNION ALL
SELECT 'event_type', t.n_rows,
  (SELECT CAST(t.n_rows - count(event_type) AS BIGINT) FROM e),
  (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM e),
  NULL, NULL,
  (SELECT min(event_type) FROM e), (SELECT max(event_type) FROM e)
FROM t
UNION ALL
SELECT 'props', t.n_rows,
  (SELECT CAST(t.n_rows - count(props) AS BIGINT) FROM e),
  (SELECT CAST(count(DISTINCT props) AS BIGINT) FROM e),
  NULL, NULL,
  (SELECT min(props) FROM e), (SELECT max(props) FROM e)
FROM t
"""

QUERIES["profile_events"] = q_profile_events
_RAW_ORACLES["profile_events"] = SQL_PROFILE_EVENTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution + type count,
    normalized entropy and type-token ratio (operators/text.py
    token_entropy): the lexical-diversity signal, computed with ZERO
    shuffles — a per-row sorted-array run-length fold (the sort fixes
    the float summation order so the DuckDB twin folds identically)."""
    from mpds_spark.operators.text import token_entropy

    docs = load(spark, sf_dir, "documents")
    out = token_entropy(docs, text="text", key="doc_id")
    return out.select(
        "doc_id",
        "n_tok",
        "n_types",
        _r6("entropy").alias("entropy"),
        _r6("norm_entropy").alias("norm_entropy"),
        _r6("ttr").alias("ttr"),
    )


SQL_TOKEN_ENTROPY = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), c AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w
), a AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS nt,
    coalesce(list_sum(list(
      CASE WHEN c > 1 THEN c * ln(CAST(c AS DOUBLE)) ELSE 0.0 END
      ORDER BY w)), 0.0) AS acc
  FROM c GROUP BY doc_id
)
SELECT doc_id,
  CAST(n AS INT) AS n_tok,
  CAST(nt AS INT) AS n_types,
  round(ln(CAST(n AS DOUBLE)) - acc / n, 6) AS entropy,
  round(CASE WHEN nt > 1
        THEN (ln(CAST(n AS DOUBLE)) - acc / n) / ln(CAST(nt AS DOUBLE))
        ELSE 0.0 END, 6) AS norm_entropy,
  round(CAST(nt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ttr
FROM a
"""

QUERIES["token_entropy"] = q_token_entropy
_RAW_ORACLES["token_entropy"] = SQL_TOKEN_ENTROPY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_bm25_scores(spark, sf_dir):
    """Okapi BM25 relevance against the corpus-derived query-term set —
    terms ranked 11..18 by document frequency (operators/text.py
    bm25_scores; Robertson & Zaragoza 2009; the synthetic corpus
    vocabulary is ~31 words, so the skip clears the stopword head while
    leaving a non-empty query set). Scoring pass is one
    shuffle-free map stage: per-term tf is size(filter(ws, x = t))
    unrolled over the 8 literal terms; only the df/term-selection aggs
    shuffle. Contributions summed in ascending-term order on both
    engines."""
    from mpds_spark.operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    out = bm25_scores(
        docs, text="text", key="doc_id", n_terms=8, skip_top=10,
        k1=1.2, b=0.75,
    )
    return out.select(
        "doc_id",
        "n_tok",
        F.col("n_match").cast("int").alias("n_match"),
        _r6("bm25").alias("bm25"),
    )


SQL_BM25_SCORES = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(len(ws)) AS BIGINT) AS len_sum
  FROM t
), dfreq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, unnest(ws) AS w FROM t) GROUP BY w
), terms AS (
  SELECT w AS term, df FROM dfreq
  ORDER BY df DESC, w ASC LIMIT 8 OFFSET 10
), scored AS (
  SELECT t.doc_id, len(t.ws) AS dl, terms.term,
    len(list_filter(t.ws, x -> x = terms.term)) AS tf,
    ln(1.0 + (stats.n - terms.df + 0.5) / (terms.df + 0.5)) AS idf,
    CAST(stats.len_sum AS DOUBLE) / CAST(stats.n AS DOUBLE) AS avgdl
  FROM t CROSS JOIN terms CROSS JOIN stats
), per AS (
  SELECT doc_id, dl,
    idf * (tf * 2.2 / (tf + 1.2 *
      (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))) AS contrib,
    CASE WHEN tf > 0 THEN 1 ELSE 0 END AS hit,
    term
  FROM scored
)
SELECT doc_id,
  CAST(any_value(dl) AS INT) AS n_tok,
  CAST(sum(hit) AS INT) AS n_match,
  round(list_sum(list(contrib ORDER BY term)), 6) AS bm25
FROM per GROUP BY doc_id HAVING sum(hit) > 0
"""

QUERIES["bm25_scores"] = q_bm25_scores
_RAW_ORACLES["bm25_scores"] = SQL_BM25_SCORES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_allen_sessions(spark, sf_dir):
    """Two-granularity nested sessionization with Allen interval-relation
    classification (operators/sessionize.py nested_sessions; Allen 1983):
    every 5-minute burst positioned (equals / starts / finishes / during)
    inside its enclosing 30-minute session — the multi-scale engagement
    hierarchy, on ONE entity-keyed exchange (both cumulative boundary
    sums, the (entity,coarse,fine) rollup and the coarse-bounds window
    all reuse the entity hash partitioning via the subset rule)."""
    from mpds_spark.operators.sessionize import nested_sessions

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    out = nested_sessions(
        ev, entity="entity_id", ts="ts", fine_gap=300.0, coarse_gap=1800.0
    )
    return out.select(
        "entity_id",
        "coarse_id",
        "fine_id",
        "n_events",
        "fine_start",
        "fine_end",
        "coarse_start",
        "coarse_end",
        "relation",
    )


SQL_ALLEN_SESSIONS = """
WITH e AS (
  SELECT user_id, epoch(ts) AS t FROM events
), g AS (
  SELECT user_id, t,
    CASE WHEN t - lag(t) OVER w > 300.0 THEN 1 ELSE 0 END AS fn,
    CASE WHEN t - lag(t) OVER w > 1800.0 THEN 1 ELSE 0 END AS cn
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
), ids AS (
  SELECT user_id, t,
    CAST(sum(fn) OVER we AS BIGINT) AS fine_id,
    CAST(sum(cn) OVER we AS BIGINT) AS coarse_id
  FROM g WINDOW we AS (PARTITION BY user_id ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), f AS (
  SELECT user_id, coarse_id, fine_id,
    CAST(count(*) AS BIGINT) AS n_events,
    min(t) AS fine_start, max(t) AS fine_end
  FROM ids GROUP BY user_id, coarse_id, fine_id
), c AS (
  SELECT *,
    min(fine_start) OVER wc AS coarse_start,
    max(fine_end) OVER wc AS coarse_end
  FROM f WINDOW wc AS (PARTITION BY user_id, coarse_id)
)
SELECT user_id AS entity_id, coarse_id, fine_id, n_events,
  fine_start, fine_end, coarse_start, coarse_end,
  CASE WHEN fine_start = coarse_start AND fine_end = coarse_end
         THEN 'equals'
       WHEN fine_start = coarse_start THEN 'starts'
       WHEN fine_end = coarse_end THEN 'finishes'
       ELSE 'during' END AS relation
FROM c
"""

QUERIES["allen_sessions"] = q_allen_sessions
_RAW_ORACLES["allen_sessions"] = SQL_ALLEN_SESSIONS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_basket_lift(spark, sf_dir):
    """Top-20 part pairs by market-basket lift over lineitem orders
    (operators/pairs.py cooccurrence_lift; Agrawal et al. 1993): the
    co-occurrence/collocation feature family. Pair explosion is a JVM
    flatten over each order's sorted distinct-part array (never a basket
    self-join); marginals broadcast; top-k via TakeOrderedAndProject on
    the ROUNDED lift with (supp desc, a, b) tie-breaks."""
    from mpds_spark.operators.pairs import cooccurrence_lift

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    out = cooccurrence_lift(
        li, basket="l_orderkey", item="l_partkey", min_support=2, k=20
    )
    return out.select(
        "a", "b", "supp", "ca", "cb", _r6("lift").alias("lift")
    )


SQL_BASKET_LIFT = """
WITH di AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM di),
m AS (SELECT it, CAST(count(*) AS BIGINT) AS c FROM di GROUP BY it),
p AS (
  SELECT x.it AS a, y.it AS b, CAST(count(*) AS BIGINT) AS supp
  FROM di x JOIN di y ON x.bk = y.bk AND x.it < y.it
  GROUP BY x.it, y.it HAVING count(*) >= 2
), s AS (
  SELECT p.a, p.b, p.supp, ma.c AS ca, mb.c AS cb,
    CAST(p.supp * nb.n AS DOUBLE) / CAST(ma.c * mb.c AS DOUBLE) AS lift
  FROM p CROSS JOIN nb
  JOIN m ma ON ma.it = p.a JOIN m mb ON mb.it = p.b
)
SELECT a, b, supp, ca, cb, round(lift, 6) AS lift
FROM s
ORDER BY round(lift, 6) DESC, supp DESC, a ASC, b ASC
LIMIT 20
"""

QUERIES["basket_lift"] = q_basket_lift
_RAW_ORACLES["basket_lift"] = SQL_BASKET_LIFT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rolling_slope(spark, sf_dir):
    """Trailing-8 OLS slope of value vs time at every event, in value
    units/day (operators/windows.py rolling_slope): the local-trend
    feature. Exact DECIMAL(38,0) frame sums (x = micros since the
    entity's first event, y = cents), one double division + one exact
    literal multiply; ONE entity-keyed exchange."""
    from mpds_spark.operators.windows import rolling_slope

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        "ts",
        "value",
    )
    out = rolling_slope(
        ev, value="value", ts="ts", by="entity_id", k=8, decimals=2
    )
    return out.select(
        "event_id", "n_frame", _r6("slope_per_day").alias("slope_per_day")
    )


SQL_ROLLING_SLOPE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS HUGEINT) AS y
  FROM events
), x AS (
  SELECT event_id, user_id, y,
    CAST(us - first_value(us) OVER (PARTITION BY user_id ORDER BY us
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS x
  FROM e
), s AS (
  SELECT event_id,
    CAST(count(*) OVER wf AS HUGEINT) AS n,
    sum(x) OVER wf AS sx, sum(y) OVER wf AS sy,
    sum(x*y) OVER wf AS sxy, sum(x*x) OVER wf AS sxx
  FROM x WINDOW wf AS (PARTITION BY user_id ORDER BY x
    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT event_id, CAST(n AS INT) AS n_frame,
  round(CASE WHEN n >= 2 AND (n*sxx - sx*sx)::DOUBLE > 0
    THEN ((n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE)
         * 864000000.0
  END, 6) AS slope_per_day
FROM s
"""

QUERIES["rolling_slope"] = q_rolling_slope
_RAW_ORACLES["rolling_slope"] = SQL_ROLLING_SLOPE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_interval_overlap(spark, sf_dir):
    """Per-entity temporal co-activity of view-windows vs click-windows
    (operators/sessionize.py interval_overlap): merged measure of each
    1h-window set, their intersection, and the temporal Jaccard — one
    union-timeline sweep on ONE entity exchange. The oracle derives the
    same numbers the naive way (gaps-and-islands merge + interval-
    intersection join), proving the sweep's equivalence."""
    from mpds_spark.operators.sessionize import interval_overlap

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "event_type"
    )
    out = interval_overlap(
        ev, entity="entity_id", ts="ts", kind="event_type",
        a_kind="view", b_kind="click", duration=3600.0,
    )
    return out.select(
        "entity_id",
        "n_a",
        "n_b",
        _r6("a_seconds").alias("a_seconds"),
        _r6("b_seconds").alias("b_seconds"),
        _r6("overlap_seconds").alias("overlap_seconds"),
        _r6("time_jaccard").alias("time_jaccard"),
    )


SQL_INTERVAL_OVERLAP = """
WITH ev AS (
  SELECT user_id,
    CASE WHEN event_type = 'view' THEN 'a' ELSE 'b' END AS side,
    epoch_us(ts) AS s, epoch_us(ts) + 3600000000 AS e
  FROM events WHERE event_type IN ('view', 'click')
), m AS (
  SELECT user_id, side, s, e,
    CASE WHEN s >= coalesce(max(e) OVER (PARTITION BY user_id, side
      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      -1) THEN 1 ELSE 0 END AS brk
  FROM ev
), g AS (
  SELECT user_id, side, s, e,
    sum(brk) OVER (PARTITION BY user_id, side ORDER BY s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM m
), iv AS (
  SELECT user_id, side, grp, min(s) AS s, max(e) AS e
  FROM g GROUP BY user_id, side, grp
), ln AS (
  SELECT user_id, side, CAST(sum(e - s) AS BIGINT) AS us
  FROM iv GROUP BY user_id, side
), cnt AS (
  SELECT user_id, side, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY user_id, side
), ov AS (
  SELECT a.user_id,
    CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS us
  FROM iv a JOIN iv b ON a.user_id = b.user_id
    AND a.side = 'a' AND b.side = 'b' AND a.s < b.e AND b.s < a.e
  GROUP BY a.user_id
), base AS (SELECT DISTINCT user_id FROM ev)
SELECT base.user_id AS entity_id,
  coalesce(ca.n, 0) AS n_a,
  coalesce(cb.n, 0) AS n_b,
  round(coalesce(la.us, 0) / 1000000.0, 6) AS a_seconds,
  round(coalesce(lb.us, 0) / 1000000.0, 6) AS b_seconds,
  round(coalesce(ov.us, 0) / 1000000.0, 6) AS overlap_seconds,
  round(CASE WHEN coalesce(la.us,0) + coalesce(lb.us,0)
                  - coalesce(ov.us,0) > 0
    THEN CAST(coalesce(ov.us,0) AS DOUBLE)
         / CAST(coalesce(la.us,0) + coalesce(lb.us,0)
                - coalesce(ov.us,0) AS DOUBLE)
    ELSE 0.0 END, 6) AS time_jaccard
FROM base
LEFT JOIN (SELECT user_id, n FROM cnt WHERE side = 'a') ca
  ON ca.user_id = base.user_id
LEFT JOIN (SELECT user_id, n FROM cnt WHERE side = 'b') cb
  ON cb.user_id = base.user_id
LEFT JOIN (SELECT user_id, us FROM ln WHERE side = 'a') la
  ON la.user_id = base.user_id
LEFT JOIN (SELECT user_id, us FROM ln WHERE side = 'b') lb
  ON lb.user_id = base.user_id
LEFT JOIN ov ON ov.user_id = base.user_id
"""

QUERIES["interval_overlap"] = q_interval_overlap
_RAW_ORACLES["interval_overlap"] = SQL_INTERVAL_OVERLAP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_zorder_key(spark, sf_dir):
    """Morton/Z-order interleaved layout key over (entity-bucket,
    epoch-day) for every event (sources/layout.py zorder_key; the
    Delta/Iceberg OPTIMIZE ZORDER technique, Morton 1966): the sort key
    whose ranges map to small (entity x time) boxes so parquet footer
    min/max stats prune scans on EITHER predicate. Pure exact-integer
    bit arithmetic, ZERO shuffles — the layout write's range exchange is
    exercised in the pytest."""
    from mpds_spark.sources.layout import zorder_key

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
    )
    d = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("zx"),
        (F.expr("__us div 86400000000") % 256).alias("zy"),
    )
    return d.select(
        "event_id", "zx", "zy", zorder_key("zx", "zy", bits=8).alias("zkey")
    )


_ZTERMS = " + ".join(
    f"(((zx >> {i}) & 1) << {2 * i}) + (((zy >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)
SQL_ZORDER_KEY = f"""
WITH e AS (
  SELECT event_id, user_id % 256 AS zx,
    (epoch_us(ts) // 86400000000) % 256 AS zy
  FROM events
)
SELECT event_id, CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
  CAST({_ZTERMS} AS BIGINT) AS zkey
FROM e
"""

QUERIES["zorder_key"] = q_zorder_key
_RAW_ORACLES["zorder_key"] = SQL_ZORDER_KEY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_survival_km(spark, sf_dir):
    """Kaplan–Meier retention curve over user event-stream lifetimes
    (operators/survival.py kaplan_meier): day-binned durations, 7-day
    right-censoring at the corpus boundary (a broadcast 1-row max fit),
    survival folded as exp(sum of integer-ratio ln terms) in ascending-
    duration order on both engines. Heavy passes are entity- and
    day-keyed; only the tiny aggregated curve crosses the global
    window."""
    from mpds_spark.operators.survival import kaplan_meier

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    out = kaplan_meier(
        ev, entity="entity_id", ts="ts", churn_gap_days=7.0,
        bin_seconds=3600,
    )
    return out.select(
        "duration_bin",
        "n_risk",
        "n_events",
        "n_censored",
        _r6("km_survival").alias("km_survival"),
    )


SQL_SURVIVAL_KM = """
WITH d AS (SELECT user_id AS e, epoch_us(ts) AS us FROM events),
mx AS (SELECT max(us) AS mx FROM d),
sp AS (SELECT e, min(us) AS s, max(us) AS t FROM d GROUP BY e),
sv AS (
  SELECT CAST((t - s) // 3600000000 AS BIGINT) AS day,
    CASE WHEN t <= (SELECT mx FROM mx) - 604800000000
         THEN 1 ELSE 0 END AS obs
  FROM sp
), curve AS (
  SELECT day, CAST(sum(obs) AS BIGINT) AS n_events,
    CAST(sum(1 - obs) AS BIGINT) AS n_censored
  FROM sv GROUP BY day
), risk AS (
  SELECT day, n_events, n_censored,
    CAST((SELECT sum(n_events + n_censored) FROM curve)
      - coalesce(sum(n_events + n_censored) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS n_risk
  FROM curve
), km AS (
  SELECT r1.day,
    list_sum(list(CASE WHEN r2.n_events < r2.n_risk
      THEN ln((r2.n_risk - r2.n_events)::DOUBLE / r2.n_risk::DOUBLE)
      ELSE 0.0 END ORDER BY r2.day)) AS lnsum,
    max(CASE WHEN r2.n_events = r2.n_risk THEN 1 ELSE 0 END) AS zero
  FROM risk r1 JOIN risk r2 ON r2.day <= r1.day GROUP BY r1.day
)
SELECT r.day AS duration_bin, r.n_risk, r.n_events, r.n_censored,
  round(CASE WHEN k.zero = 1 THEN 0.0 ELSE exp(k.lnsum) END, 6)
    AS km_survival
FROM risk r JOIN km k ON k.day = r.day
"""

QUERIES["survival_km"] = q_survival_km
_RAW_ORACLES["survival_km"] = SQL_SURVIVAL_KM
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_benford_audit(spark, sf_dir):
    """Benford first-digit audit of order totals per priority class
    (operators/profiles.py benford_audit): exact digit counts off the
    integer-cents STRING (never log10), chi-square and MAD vs embedded
    Benford literals folded digit-ascending. One group-keyed agg."""
    from mpds_spark.operators.profiles import benford_audit

    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("value"),
    )
    out = benford_audit(od, group="priority", value="value", decimals=2)
    cols = ["priority", "n"] + [f"d{i}" for i in range(1, 10)]
    return out.select(
        *cols, _r6("chi2").alias("chi2"), _r6("mad").alias("mad")
    )


def _benford_sql() -> str:
    import math

    ps = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}
    digit_counts = ",\n    ".join(
        f"CAST(sum(CASE WHEN dg = {d} THEN 1 ELSE 0 END) AS BIGINT) AS d{d}"
        for d in range(1, 10)
    )
    chi2 = " + ".join(
        f"(d{d}::DOUBLE - n::DOUBLE*{ps[d]})"
        f" * (d{d}::DOUBLE - n::DOUBLE*{ps[d]}) / (n::DOUBLE*{ps[d]})"
        for d in range(1, 10)
    )
    mad = " + ".join(
        f"abs(d{d}::DOUBLE / n::DOUBLE - {ps[d]})" for d in range(1, 10)
    )
    return f"""
WITH c AS (
  SELECT o_orderpriority AS priority,
    CAST(sign(o_totalprice) * floor(abs(o_totalprice)*100 + 0.5)
         AS BIGINT) AS cents
  FROM orders
), dgt AS (
  SELECT priority,
    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS dg
  FROM c WHERE cents > 0
), agg AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
    {digit_counts}
  FROM dgt GROUP BY priority
)
SELECT priority, n, d1, d2, d3, d4, d5, d6, d7, d8, d9,
  round({chi2}, 6) AS chi2,
  round(({mad}) / 9.0, 6) AS mad
FROM agg
"""


SQL_BENFORD_AUDIT = _benford_sql()

QUERIES["benford_audit"] = q_benford_audit
_RAW_ORACLES["benford_audit"] = SQL_BENFORD_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_graph_triangles(spark, sf_dir):
    """Per-part triangle counts + local clustering coefficient over the
    co-order part graph (operators/graph.py: JVM pair-flatten edges,
    degree-ordered-orientation triangle counting — Cohen 2009 MR
    triangle scheme). Gated on the l_partkey % 4 == 0 subgraph to bound
    the toy-scale wedge volume (the star-CC fixture lesson); the DuckDB
    oracle enumerates x<y<z triangles naively, proving the oriented
    algorithm's counts."""
    from mpds_spark.operators.graph import (
        co_occurrence_edges,
        triangle_stats,
    )

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    edges = co_occurrence_edges(
        li, basket="l_orderkey", item="l_partkey"
    )
    out = triangle_stats(edges)
    return out.select(
        F.col("node").alias("part_id"),
        "degree",
        "triangles",
        _r6("clustering").alias("clustering"),
    )


SQL_GRAPH_TRIANGLES = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_partkey % 4 = 0
), e AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), tn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node AS part_id, d.degree,
  CAST(coalesce(tn.triangles, 0) AS BIGINT) AS triangles,
  round(CASE WHEN d.degree >= 2
    THEN 2.0 * CAST(coalesce(tn.triangles, 0) AS DOUBLE)
         / CAST(d.degree * (d.degree - 1) AS DOUBLE)
    ELSE 0.0 END, 6) AS clustering
FROM deg d LEFT JOIN tn ON tn.node = d.node
"""

QUERIES["graph_triangles"] = q_graph_triangles
_RAW_ORACLES["graph_triangles"] = SQL_GRAPH_TRIANGLES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hll_cardinality(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type, audited
    against the exact distinct count (operators/sketches.py
    hll_cardinality, Flajolet et al. 2007): md5-derived 60-bit hashes,
    p=8 registers built in ONE mergeable (group, bucket)-keyed MAX,
    2^-M terms folded bucket-ascending as exact powers of two. The
    DuckDB oracle rebuilds the identical registers, so the gate is
    EXACT even though the sketch itself is approximate."""
    from mpds_spark.operators.sketches import hll_cardinality

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    out = hll_cardinality(ev, key="user_id", group="event_type", p=8)
    return out.select(
        "event_type",
        "n_exact",
        "hll_buckets_hit",
        _r6("hll_estimate").alias("hll_estimate"),
        _r6("rel_err").alias("rel_err"),
    )


def _hll_sql() -> str:
    from mpds_spark.operators.sketches import hll_alpha

    amm = repr(hll_alpha(256) * 256 * 256)
    return f"""
WITH h AS (
  SELECT event_type,
    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
         AS BIGINT) AS hv
  FROM events
), br AS (
  SELECT event_type, hv >> 52 AS bucket, hv % 4503599627370496 AS r
  FROM h
), regs AS (
  SELECT event_type, bucket,
    max(CASE WHEN r = 0 THEN 53 ELSE 53 - length(bin(r)) END) AS m
  FROM br GROUP BY event_type, bucket
), folded AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS hll_buckets_hit,
    list_sum(list(1.0 / CAST(1::BIGINT << m AS DOUBLE) ORDER BY bucket))
      AS z_hit
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type, hll_buckets_hit,
    CASE WHEN ({amm} / (z_hit + CAST(256 - hll_buckets_hit AS DOUBLE)))
              <= 640.0
          AND (256 - hll_buckets_hit) > 0
      THEN 256.0 * ln(256.0 / CAST(256 - hll_buckets_hit AS DOUBLE))
      ELSE {amm} / (z_hit + CAST(256 - hll_buckets_hit AS DOUBLE))
    END AS e
  FROM folded
), exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT x.event_type, x.n_exact, s.hll_buckets_hit,
  round(s.e, 6) AS hll_estimate,
  round((s.e - x.n_exact::DOUBLE) / x.n_exact::DOUBLE, 6) AS rel_err
FROM exact x JOIN est s ON s.event_type = x.event_type
"""


SQL_HLL_CARDINALITY = _hll_sql()

QUERIES["hll_cardinality"] = q_hll_cardinality
_RAW_ORACLES["hll_cardinality"] = SQL_HLL_CARDINALITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_countmin_topk(spark, sf_dir):
    """Count-Min point estimates for the exact top-20 users by event
    count (operators/sketches.py countmin_estimates, Cormode &
    Muthukrishnan 2005): 4 salted md5 rows x 256 buckets of exact long
    cells in ONE exploded aggregation; estimate = min over rows
    (one-sided overcount). Top-k via TakeOrdered; the 1024-cell table
    joins broadcast."""
    from mpds_spark.operators.sketches import countmin_estimates

    ev = _events(spark, sf_dir).select("user_id")
    out = countmin_estimates(ev, key="user_id", d=4, w=256, k=20)
    return out.select("user_id", "n_exact", "cm_estimate", "overcount")


SQL_COUNTMIN_TOPK = """
WITH gen AS (SELECT unnest([0, 1, 2, 3]) AS r),
cm AS (
  SELECT g.r AS r,
    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || '|'
          || CAST(e.user_id AS VARCHAR)), 1, 15))::UBIGINT % 256
         AS BIGINT) AS b,
    CAST(count(*) AS BIGINT) AS c
  FROM events e CROSS JOIN gen g GROUP BY 1, 2
), top AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact FROM events
  GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 20
), probes AS (
  SELECT t.user_id, t.n_exact, g.r AS r,
    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || '|'
          || CAST(t.user_id AS VARCHAR)), 1, 15))::UBIGINT % 256
         AS BIGINT) AS b
  FROM top t CROSS JOIN gen g
)
SELECT p.user_id, p.n_exact,
  CAST(min(c.c) AS BIGINT) AS cm_estimate,
  CAST(min(c.c) - p.n_exact AS BIGINT) AS overcount
FROM probes p JOIN cm c ON c.r = p.r AND c.b = p.b
GROUP BY p.user_id, p.n_exact
"""

QUERIES["countmin_topk"] = q_countmin_topk
_RAW_ORACLES["countmin_topk"] = SQL_COUNTMIN_TOPK
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_temporal_motifs(spark, sf_dir):
    """Top-20 temporal motifs: consecutive event-type triples on one
    user within a 24-hour span (operators/funnels.py temporal_motifs,
    Paranjape et al. 2017 specialization): two lead() columns + span
    predicate on ONE entity exchange, motif rollup on the tiny
    |types|^3 key, TakeOrdered heap."""
    from mpds_spark.operators.funnels import temporal_motifs

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "event_type",
        "event_id",
    )
    return temporal_motifs(
        ev, entity="entity_id", ts="ts", kind="event_type",
        max_span=86400.0, k=20, tiebreak=("event_id",),
    )


SQL_TEMPORAL_MOTIFS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_type, event_id FROM events
), l AS (
  SELECT event_type AS t1,
    lead(event_type, 1) OVER w AS t2,
    lead(event_type, 2) OVER w AS t3,
    lead(us, 2) OVER w AS us3, us
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM l WHERE t3 IS NOT NULL AND us3 - us <= 86400000000
GROUP BY t1, t2, t3
ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""

QUERIES["temporal_motifs"] = q_temporal_motifs
_RAW_ORACLES["temporal_motifs"] = SQL_TEMPORAL_MOTIFS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_woe_encoding(spark, sf_dir):
    """Weight-of-evidence + information-value terms of order priority
    vs final status (operators/encoding.py woe_encoding, Siddiqi 2006):
    exact cell counts in ONE category agg, totals from a window over
    the 5-row aggregated frame, smoothed integer-ratio-style ln."""
    from mpds_spark.operators.encoding import woe_encoding

    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    out = woe_encoding(od, category="category", label="label")
    return out.select(
        "category",
        "n_pos",
        "n_neg",
        _r6("woe").alias("woe"),
        _r6("iv_term").alias("iv_term"),
    )


SQL_WOE_ENCODING = """
WITH cells AS (
  SELECT o_orderpriority AS category,
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pos,
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT)
      AS n_neg
  FROM orders GROUP BY o_orderpriority
), tot AS (
  SELECT category, n_pos, n_neg,
    CAST((SELECT sum(n_pos) FROM cells) AS BIGINT) AS pt,
    CAST((SELECT sum(n_neg) FROM cells) AS BIGINT) AS nt
  FROM cells
)
SELECT category, n_pos, n_neg,
  round(ln((n_pos::DOUBLE + 0.5) * nt::DOUBLE
           / ((n_neg::DOUBLE + 0.5) * pt::DOUBLE)), 6) AS woe,
  round((n_pos::DOUBLE / pt::DOUBLE - n_neg::DOUBLE / nt::DOUBLE)
        * ln((n_pos::DOUBLE + 0.5) * nt::DOUBLE
             / ((n_neg::DOUBLE + 0.5) * pt::DOUBLE)), 6) AS iv_term
FROM tot
"""

QUERIES["woe_encoding"] = q_woe_encoding
_RAW_ORACLES["woe_encoding"] = SQL_WOE_ENCODING
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_haar_energy(spark, sf_dir):
    """Unnormalized Haar wavelet level energies of each user's first 8
    values (operators/windows.py haar_energy): differences/sums over
    exact cents so every energy is an exact long; ONE entity exchange
    (row_number + sorted-array fold via the subset rule)."""
    from mpds_spark.operators.windows import haar_energy

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value", "event_id"
    )
    out = haar_energy(
        ev, value="value", ts="ts", by="entity_id", n=8, decimals=2
    )
    return out.select("entity_id", "e1", "e2", "e3", "approx_sq")


def _haar_sql() -> str:
    x = [f"x[{i}]" for i in range(9)]  # 1-based
    sq = lambda e: f"({e}) * ({e})"  # noqa: E731
    a1 = [f"({x[1]} + {x[2]})", f"({x[3]} + {x[4]})",
          f"({x[5]} + {x[6]})", f"({x[7]} + {x[8]})"]
    a2 = [f"({a1[0]} + {a1[1]})", f"({a1[2]} + {a1[3]})"]
    e1 = " + ".join(sq(f"{x[i]} - {x[i + 1]}") for i in (1, 3, 5, 7))
    e2 = " + ".join(
        [sq(f"{a1[0]} - {a1[1]}"), sq(f"{a1[2]} - {a1[3]}")]
    )
    e3 = sq(f"{a2[0]} - {a2[1]}")
    asq = sq(f"{a2[0]} + {a2[1]}")
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST(sign(value) * floor(abs(value)*100 + 0.5) AS BIGINT) AS y
  FROM events
), r AS (
  SELECT user_id, y,
    row_number() OVER (PARTITION BY user_id ORDER BY us, y) AS rn
  FROM e
), arr AS (
  SELECT user_id, list(y ORDER BY rn) AS x
  FROM r WHERE rn <= 8 GROUP BY user_id HAVING count(*) = 8
)
SELECT user_id AS entity_id,
  CAST({e1} AS BIGINT) AS e1,
  CAST({e2} AS BIGINT) AS e2,
  CAST({e3} AS BIGINT) AS e3,
  CAST({asq} AS BIGINT) AS approx_sq
FROM arr
"""


SQL_HAAR_ENERGY = _haar_sql()

QUERIES["haar_energy"] = q_haar_energy
_RAW_ORACLES["haar_energy"] = SQL_HAAR_ENERGY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_fuzzy_name_pairs(spark, sf_dir):
    """Blocked fuzzy-match candidates over part names (operators/
    pairs.py blocked_fuzzy_pairs, Christen 2012): Levenshtein <= 3
    within (last-token, first-char) blocks — a block-keyed equi-join,
    never an all-pairs matrix; heap top-50 by (dist, key_a, key_b)."""
    from mpds_spark.operators.pairs import blocked_fuzzy_pairs

    pt = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    return blocked_fuzzy_pairs(
        pt, key="p_partkey", name="p_name", max_dist=2, k=50,
        block_exprs=[F.element_at(F.split(F.col("p_name"), " "), -1)],
    )


SQL_FUZZY_NAME_PAIRS = """
WITH base AS (
  SELECT p_name AS n, CAST(min(p_partkey) AS BIGINT) AS k,
    CAST(count(*) AS BIGINT) AS cnt,
    string_split(p_name, ' ')[-1] AS tok
  FROM part GROUP BY p_name
)
SELECT a.k AS key_a, b.k AS key_b, a.n AS name_a, b.n AS name_b,
  CAST(levenshtein(a.n, b.n) AS INT) AS dist,
  a.cnt AS n_a, b.cnt AS n_b
FROM base a JOIN base b
  ON a.tok = b.tok AND a.k < b.k
WHERE levenshtein(a.n, b.n) <= 2
ORDER BY dist, key_a, key_b LIMIT 50
"""

QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs
_RAW_ORACLES["fuzzy_name_pairs"] = SQL_FUZZY_NAME_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_fk_integrity(spark, sf_dir):
    """Referential-integrity audit of three star-schema relations
    (operators/validate.py referential_audit): exact orphan /
    unreferenced counts from one fact-key agg + one full-outer key join
    per relation — the trust-the-joins pass every warehouse load
    runs."""
    from mpds_spark.operators.validate import referential_audit

    ev = _events(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    audits = [
        referential_audit(
            ev, cust, "user_id", "c_custkey", "events->customer"
        ),
        referential_audit(
            orders, cust, "o_custkey", "c_custkey", "orders->customer"
        ),
        referential_audit(
            li, part, "l_partkey", "p_partkey", "lineitem->part"
        ),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


def _fk_block(fact_sql: str, dim_sql: str, relation: str) -> str:
    return f"""
SELECT '{relation}' AS relation,
  CAST(sum(coalesce(rows, 0)) AS BIGINT) AS n_fact_rows,
  CAST(sum(CASE WHEN rows IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_fact_keys,
  CAST(sum(CASE WHEN rows IS NOT NULL AND dk IS NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_orphan_keys,
  CAST(sum(CASE WHEN dk IS NULL THEN coalesce(rows, 0) ELSE 0 END)
    AS BIGINT) AS n_orphan_rows,
  CAST(sum(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dim_keys,
  CAST(sum(CASE WHEN dk IS NOT NULL AND rows IS NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_unreferenced_dim
FROM (
  SELECT fk.rows, fk.k AS fkk, dk.k AS dk
  FROM ({fact_sql}) fk FULL OUTER JOIN ({dim_sql}) dk ON fk.k = dk.k
)"""


SQL_FK_INTEGRITY = " UNION ALL ".join(
    [
        _fk_block(
            "SELECT user_id AS k, count(*) AS rows FROM events GROUP BY 1",
            "SELECT DISTINCT c_custkey AS k FROM customer",
            "events->customer",
        ),
        _fk_block(
            "SELECT o_custkey AS k, count(*) AS rows FROM orders GROUP BY 1",
            "SELECT DISTINCT c_custkey AS k FROM customer",
            "orders->customer",
        ),
        _fk_block(
            "SELECT l_partkey AS k, count(*) AS rows FROM lineitem GROUP BY 1",
            "SELECT DISTINCT p_partkey AS k FROM part",
            "lineitem->part",
        ),
    ]
)

QUERIES["fk_integrity"] = q_fk_integrity
_RAW_ORACLES["fk_integrity"] = SQL_FK_INTEGRITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_welch_pairs(spark, sf_dir):
    """Welch's t statistic for every event-type pair on value
    (operators/profiles.py welch_pairs, Welch 1947): exact decimal
    moments in ONE group agg; the pair expansion is a theta self-join
    of the 5-row aggregate frame only (registered BNLJ-by-design)."""
    from mpds_spark.operators.profiles import welch_pairs

    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("grp"), "value"
    ).filter(F.col("value").isNotNull())
    out = welch_pairs(ev, group="grp", value="value", decimals=2)
    return out.select(
        "g1",
        "g2",
        "n1",
        "n2",
        _r6("mean_diff").alias("mean_diff"),
        _r6("t_stat").alias("t_stat"),
        _r6("dof").alias("dof"),
    )


SQL_WELCH_PAIRS = """
WITH g AS (
  SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(sign(value)*floor(abs(value)*100 + 0.5) AS HUGEINT)) AS sx,
    sum(CAST(sign(value)*floor(abs(value)*100 + 0.5) AS HUGEINT)
        * CAST(sign(value)*floor(abs(value)*100 + 0.5) AS HUGEINT)) AS sxx
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), s AS (
  SELECT grp, n,
    sx::DOUBLE / n::DOUBLE / 100.0 AS m,
    CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE)
      / CAST(n::HUGEINT * (n::HUGEINT - 1) AS DOUBLE) / 10000.0 AS v
  FROM g WHERE n >= 2
)
SELECT a.grp AS g1, b.grp AS g2, a.n AS n1, b.n AS n2,
  round(a.m - b.m, 6) AS mean_diff,
  round((a.m - b.m) / sqrt(a.v / a.n::DOUBLE + b.v / b.n::DOUBLE), 6)
    AS t_stat,
  round(((a.v / a.n::DOUBLE + b.v / b.n::DOUBLE)
         * (a.v / a.n::DOUBLE + b.v / b.n::DOUBLE))
        / ((a.v / a.n::DOUBLE) * (a.v / a.n::DOUBLE)
             / CAST(a.n - 1 AS DOUBLE)
           + (b.v / b.n::DOUBLE) * (b.v / b.n::DOUBLE)
             / CAST(b.n - 1 AS DOUBLE)), 6) AS dof
FROM s a JOIN s b ON a.grp < b.grp
"""

QUERIES["welch_pairs"] = q_welch_pairs
_RAW_ORACLES["welch_pairs"] = SQL_WELCH_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_bloom_members(spark, sf_dir):
    """Bloom-filter membership audit: a 512-bit / 3-hash filter over
    purchase users probed by every user (operators/sketches.py
    bloom_membership, Bloom 1970) — the runtime-filter pre-prune shape;
    the md5-deterministic bit set lets the oracle rebuild the identical
    filter, so even the false positives gate EXACT."""
    from mpds_spark.operators.sketches import bloom_membership

    ev = _events(spark, sf_dir)
    ref = ev.filter(F.col("event_type") == "purchase").select("user_id")
    out = bloom_membership(ref, ev.select("user_id"), key="user_id",
                           m=512, k=3)
    return out.select(
        "user_id", "bloom_positive", "actual_member", "false_positive"
    )


SQL_BLOOM_MEMBERS = """
WITH ref AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS k
  FROM events WHERE event_type = 'purchase'
), gen AS (SELECT unnest([0, 1, 2]) AS i),
bits AS (
  SELECT DISTINCT
    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || '|' || r.k), 1, 15))
      ::UBIGINT % 512 AS pos
  FROM ref r CROSS JOIN gen g
), probe AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
), pp AS (
  SELECT p.k,
    ('0x' || substring(md5(CAST(g.i AS VARCHAR) || '|' || p.k), 1, 15))
      ::UBIGINT % 512 AS pos
  FROM probe p CROSS JOIN gen g
), v AS (
  SELECT pp.k,
    sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) = 3 AS bloom_positive
  FROM pp LEFT JOIN bits b ON b.pos = pp.pos GROUP BY pp.k
)
SELECT v.k AS user_id, v.bloom_positive,
  r.k IS NOT NULL AS actual_member,
  v.bloom_positive AND r.k IS NULL AS false_positive
FROM v LEFT JOIN ref r ON r.k = v.k
"""

QUERIES["bloom_members"] = q_bloom_members
_RAW_ORACLES["bloom_members"] = SQL_BLOOM_MEMBERS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_phrase_search(spark, sf_dir):
    """Positional inverted-index phrase search for "fast table"
    (operators/text.py phrase_search): literal-term posting lists
    joined on (doc, pos+1) — only the two terms' postings shuffle,
    never the corpus; the oracle scans every document's word list
    directly, proving the index join exact."""
    from mpds_spark.operators.text import phrase_search

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(docs, w1="fast", w2="table")


SQL_PHRASE_SEARCH = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), hits AS (
  SELECT doc_id,
    list_filter(range(1, len(w)),
                i -> w[i] = 'fast' AND w[i + 1] = 'table') AS pos
  FROM ws
)
SELECT doc_id, CAST(len(pos) AS BIGINT) AS n_occurrences,
  CAST(list_min(pos) AS BIGINT) AS first_pos
FROM hits WHERE len(pos) > 0
"""

QUERIES["phrase_search"] = q_phrase_search
_RAW_ORACLES["phrase_search"] = SQL_PHRASE_SEARCH
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_decayed_counts(spark, sf_dir):
    """Half-life-decayed event counter per user at the corpus boundary
    (operators/windows.py decayed_counts): one entity agg; terms folded
    over a (ts, event_id)-sorted array with a single embedded decay
    literal, so the float sum is order-pinned on both engines."""
    from mpds_spark.operators.windows import decayed_counts

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "event_id"
    )
    out = decayed_counts(
        ev, by="entity_id", ts="ts", half_life_days=7.0,
        tiebreak=("event_id",),
    )
    return out.select(
        "entity_id", "n_events", _r6("decayed_count").alias("decayed_count")
    )


def _decayed_sql() -> str:
    import math

    c = repr(math.log(2.0) / (7.0 * 86400e6))
    return f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
), mx AS (SELECT max(us) AS mx FROM d)
SELECT user_id AS entity_id, CAST(count(*) AS BIGINT) AS n_events,
  round(list_sum(list(exp((us - (SELECT mx FROM mx))::DOUBLE * {c})
                      ORDER BY us, event_id)), 6) AS decayed_count
FROM d GROUP BY user_id
"""


SQL_DECAYED_COUNTS = _decayed_sql()

QUERIES["decayed_counts"] = q_decayed_counts
_RAW_ORACLES["decayed_counts"] = SQL_DECAYED_COUNTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ratio_to_parent(spark, sf_dir):
    """Share-of-total reporting rollup: each priority's share of its
    month's revenue — exact integer cents at both grains (ONE fact agg;
    the ratio window runs on the |months|x|priorities| aggregate frame
    only), one double division for the share."""
    od = load(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderpriority").alias("priority"),
        (
            F.signum("o_totalprice")
            * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    g = od.groupBy("month", "priority").agg(
        F.sum("__c").cast("long").alias("revenue_cents")
    )
    w = Window.partitionBy("month")
    g = g.withColumn(
        "month_cents", F.sum("revenue_cents").over(w).cast("long")
    )
    share = (
        F.col("revenue_cents").cast("double")
        / F.col("month_cents").cast("double")
    )
    return g.select(
        "month",
        "priority",
        "revenue_cents",
        "month_cents",
        _r6(share).alias("share"),
    )


SQL_RATIO_TO_PARENT = """
WITH g AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
    o_orderpriority AS priority,
    CAST(sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice)*100 + 0.5)
             AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT month, priority, revenue_cents,
  CAST(sum(revenue_cents) OVER (PARTITION BY month) AS BIGINT)
    AS month_cents,
  round(revenue_cents::DOUBLE
        / CAST(sum(revenue_cents) OVER (PARTITION BY month) AS DOUBLE),
        6) AS share
FROM g
"""

QUERIES["ratio_to_parent"] = q_ratio_to_parent
_RAW_ORACLES["ratio_to_parent"] = SQL_RATIO_TO_PARENT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_chi2_independence(spark, sf_dir):
    """Chi-square independence of six-hour daypart vs event type
    (operators/profiles.py chi2_independence): exact contingency cells
    from ONE agg, marginals via windows over the 20-cell frame,
    contributions folded in (row,col)-sorted order, Cramér's V."""
    from mpds_spark.operators.profiles import chi2_independence

    ev = _events(spark, sf_dir).select(
        F.expr(
            "cast((unix_micros(cast(ts as timestamp)) "
            "div 21600000000) % 4 as bigint)"
        ).alias("daypart"),
        "event_type",
    )
    out = chi2_independence(ev, row="daypart", col="event_type")
    return out.select(
        "daypart",
        "event_type",
        "obs",
        _r6("expected").alias("expected"),
        _r6("contrib").alias("contrib"),
        _r6("chi2_total").alias("chi2_total"),
        "dof",
        _r6("cramers_v").alias("cramers_v"),
    )


SQL_CHI2_INDEPENDENCE = """
WITH e AS (
  SELECT CAST((epoch_us(ts) // 21600000000) % 4 AS BIGINT) AS daypart,
    event_type
  FROM events
), cells AS (
  SELECT daypart, event_type, CAST(count(*) AS BIGINT) AS obs
  FROM e GROUP BY daypart, event_type
), m AS (
  SELECT daypart, event_type, obs,
    CAST(sum(obs) OVER (PARTITION BY daypart) AS BIGINT) AS rt,
    CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS ct,
    CAST(sum(obs) OVER () AS BIGINT) AS n
  FROM cells
), x AS (
  SELECT *,
    CAST(rt * ct AS DOUBLE) / n::DOUBLE AS expected,
    (obs::DOUBLE - CAST(rt * ct AS DOUBLE) / n::DOUBLE)
      * (obs::DOUBLE - CAST(rt * ct AS DOUBLE) / n::DOUBLE)
      / (CAST(rt * ct AS DOUBLE) / n::DOUBLE) AS contrib
  FROM m
), tot AS (
  SELECT list_sum(list(contrib ORDER BY daypart, event_type)) AS chi2,
    CAST(count(DISTINCT daypart) AS BIGINT) AS nr,
    CAST(count(DISTINCT event_type) AS BIGINT) AS nc,
    CAST(max(n) AS BIGINT) AS n
  FROM x
)
SELECT x.daypart, x.event_type, x.obs,
  round(x.expected, 6) AS expected,
  round(x.contrib, 6) AS contrib,
  round(t.chi2, 6) AS chi2_total,
  CAST((t.nr - 1) * (t.nc - 1) AS BIGINT) AS dof,
  round(sqrt(t.chi2 / CAST(t.n * least(t.nr - 1, t.nc - 1) AS DOUBLE)),
        6) AS cramers_v
FROM x CROSS JOIN tot t
"""

QUERIES["chi2_independence"] = q_chi2_independence
_RAW_ORACLES["chi2_independence"] = SQL_CHI2_INDEPENDENCE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_max_drawdown(spark, sf_dir):
    """Max drawdown of each user's cumulative value stream
    (operators/windows.py max_drawdown): running sum + running max +
    rollup all exact integer cents on ONE entity exchange — zero float
    folds anywhere."""
    from mpds_spark.operators.windows import max_drawdown

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value", "event_id"
    ).filter(F.col("value").isNotNull())
    return max_drawdown(
        ev, value="value", ts="ts", by="entity_id",
        tiebreak=("event_id",),
    )


SQL_MAX_DRAWDOWN = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
    CAST(sign(value) * floor(abs(value)*100 + 0.5) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
), cu AS (
  SELECT user_id, us, event_id, y,
    CAST(sum(y) OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM e
), c AS (
  SELECT user_id, y, cum,
    CAST(max(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
  FROM cu
)
SELECT user_id AS entity_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(y) AS BIGINT) AS final_cents,
  CAST(max(peak) AS BIGINT) AS peak_cents,
  CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents
FROM c GROUP BY user_id
"""

QUERIES["max_drawdown"] = q_max_drawdown
_RAW_ORACLES["max_drawdown"] = SQL_MAX_DRAWDOWN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_activity_streaks(spark, sf_dir):
    """Consecutive-day activity streaks per user (operators/windows.py
    activity_streaks): gaps-and-islands over distinct active days —
    day minus row_number is constant within a run; the whole chain is
    entity-cluster-keyed, no self-join."""
    from mpds_spark.operators.windows import activity_streaks

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    return activity_streaks(ev, by="entity_id", ts="ts")


SQL_ACTIVITY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
), r AS (
  SELECT user_id, day,
    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      AS anchor
  FROM d
), s AS (
  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len,
    CAST(max(day) AS BIGINT) AS end_day
  FROM r GROUP BY user_id, anchor
)
SELECT user_id AS entity_id,
  CAST(sum(len) AS BIGINT) AS n_active_days,
  CAST(count(*) AS BIGINT) AS n_streaks,
  CAST(max(len) AS BIGINT) AS longest_streak,
  CAST(max(end_day) AS BIGINT) AS current_streak_end_day
FROM s GROUP BY user_id
"""

QUERIES["activity_streaks"] = q_activity_streaks
_RAW_ORACLES["activity_streaks"] = SQL_ACTIVITY_STREAKS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_pareto_frontier(spark, sf_dir):
    """2-D Pareto frontier of parts on (price asc, size desc)
    (operators/pairs.py pareto_frontier, Börzsönyi et al. 2001): the
    one-sort skyline — two RANGE frames on exact price cents over one
    ordering; the oracle is the NOT-EXISTS domination definition
    itself, proving the window formulation."""
    from mpds_spark.operators.pairs import pareto_frontier

    pt = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return pareto_frontier(
        pt, key="p_partkey", minimize="p_retailprice",
        maximize="p_size",
    )


SQL_PARETO_FRONTIER = """
WITH p AS (
  SELECT p_partkey, p_retailprice, p_size,
    CAST(sign(p_retailprice) * floor(abs(p_retailprice)*100 + 0.5)
         AS BIGINT) AS c
  FROM part
)
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.c <= a.c AND b.p_size >= a.p_size
    AND (b.c < a.c OR b.p_size > a.p_size)
)
"""

QUERIES["pareto_frontier"] = q_pareto_frontier
_RAW_ORACLES["pareto_frontier"] = SQL_PARETO_FRONTIER
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution of purchase value to view/click
    touches within a 7-day lookback (operators/funnels.py
    linear_attribution): interval-join shape (entity equi-key, range
    post-filter), exact touch counts, per-type totals folded in
    conversion-id order; zero-touch conversions land in '(none)'."""
    from mpds_spark.operators.funnels import linear_attribution

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        "ts",
        "event_type",
        "value",
        "event_id",
    )
    out = linear_attribution(ev)
    return out.select(
        "touch_type",
        "n_conversions",
        "n_touches",
        _r6("attributed_value").alias("attributed_value"),
    )


SQL_LINEAR_ATTRIBUTION = """
WITH conv AS (
  SELECT event_id AS cid, user_id, epoch_us(ts) AS cu,
    CAST(sign(value) * floor(abs(value)*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type AS tk
  FROM events WHERE event_type IN ('view', 'click')
), m AS (
  SELECT c.cid, c.cents, t.tk
  FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
    AND t.tu <= c.cu AND t.tu > c.cu - 604800000000
), pc AS (
  SELECT cid, cents, CAST(count(tk) AS BIGINT) AS n
  FROM m GROUP BY cid, cents
), pt AS (
  SELECT cid, tk, CAST(count(*) AS BIGINT) AS nt
  FROM m WHERE tk IS NOT NULL GROUP BY cid, tk
), typed AS (
  SELECT pt.cid, pt.tk, pt.nt,
    pc.cents::DOUBLE * pt.nt::DOUBLE / pc.n::DOUBLE / 100.0 AS contrib
  FROM pt JOIN pc ON pc.cid = pt.cid
  UNION ALL
  SELECT cid, '(none)' AS tk, CAST(0 AS BIGINT) AS nt,
    cents::DOUBLE / 100.0 AS contrib
  FROM pc WHERE n = 0
)
SELECT tk AS touch_type, CAST(count(*) AS BIGINT) AS n_conversions,
  CAST(sum(nt) AS BIGINT) AS n_touches,
  round(list_sum(list(contrib ORDER BY cid)), 6) AS attributed_value
FROM typed GROUP BY tk
"""

QUERIES["linear_attribution"] = q_linear_attribution
_RAW_ORACLES["linear_attribution"] = SQL_LINEAR_ATTRIBUTION
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ltv_curves(spark, sf_dir):
    """Cohort lifetime-value curves: cumulative purchase revenue per
    (first-activity cohort WEEK, 7-day age period) — first-activity
    agg, one (cohort, age) rollup with exact cents and distinct actives,
    cumulative window over the tiny curve frame."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        "event_type",
        "value",
    )
    first = ev.groupBy("user_id").agg(F.min("__us").alias("__f"))
    j = ev.join(first, "user_id").select(
        "user_id",
        F.expr("(__f div 86400000000) div 7").alias("cohort_week"),
        F.expr("(__us - __f) div 604800000000").alias("age_period"),
        F.when(
            F.col("event_type") == "purchase",
            (
                F.signum("value")
                * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
            ).cast("long"),
        ).otherwise(F.lit(0)).alias("__cents"),
    )
    g = j.groupBy("cohort_week", "age_period").agg(
        F.count_distinct("user_id").cast("long").alias("n_active_users"),
        F.sum("__cents").cast("long").alias("revenue_cents"),
    )
    w = Window.partitionBy("cohort_week").orderBy(
        "age_period"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return g.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long")
    ).select(
        "cohort_week",
        "age_period",
        "n_active_users",
        "revenue_cents",
        "cum_revenue_cents",
    )


SQL_LTV_CURVES = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
    CAST(sign(value) * floor(abs(value)*100 + 0.5) AS BIGINT) AS cents
  FROM events
), f AS (
  SELECT user_id, min(us) AS fus FROM e GROUP BY user_id
), j AS (
  SELECT e.user_id,
    CAST((f.fus // 86400000000) // 7 AS BIGINT) AS cohort_week,
    (e.us - f.fus) // 604800000000 AS age_period,
    CASE WHEN e.event_type = 'purchase' THEN e.cents ELSE 0 END AS cents
  FROM e JOIN f ON f.user_id = e.user_id
), g AS (
  SELECT cohort_week, CAST(age_period AS BIGINT) AS age_period,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users,
    CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM j GROUP BY cohort_week, age_period
)
SELECT cohort_week, age_period, n_active_users, revenue_cents,
  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week ORDER BY age_period
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_revenue_cents
FROM g
"""

QUERIES["ltv_curves"] = q_ltv_curves
_RAW_ORACLES["ltv_curves"] = SQL_LTV_CURVES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_fulfillment_latency(spark, sf_dir):
    """Order-to-first-shipment latency p50/p90 per priority: per-order
    min shipdate joined to orders (order-keyed), exact day latency,
    EXACT grouped quantiles via the K-in-one-pass bracketed selection
    (operators/scale.py exact_grouped_quantiles_multi) — no value map
    on a reducer, no driver collect."""
    from mpds_spark.operators.scale import exact_grouped_quantiles_multi

    li = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.min(
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        ).alias("__ship")
    )
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "__ord"
        ),
    )
    lat = od.join(li, od["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        ((F.col("__ship") - F.col("__ord")) / F.lit(86400e6)).alias(
            "latency_days"
        ),
    )
    out = exact_grouped_quantiles_multi(
        lat, "priority", "latency_days", ps=[0.5, 0.9]
    )
    return out.select(
        "priority",
        F.col("p").cast("double").alias("p"),
        _r6("q_latency_days").alias("latency_days"),
    )


SQL_FULFILLMENT_LATENCY = """
WITH s AS (
  SELECT l_orderkey, min(epoch_us(l_shipdate)) AS ship
  FROM lineitem GROUP BY l_orderkey
), lat AS (
  SELECT o.o_orderpriority AS priority,
    (s.ship - epoch_us(o.o_orderdate)) / 86400000000.0 AS latency_days
  FROM orders o JOIN s ON s.l_orderkey = o.o_orderkey
)
SELECT priority, p, round(q, 6) AS latency_days
FROM (
  SELECT priority, 0.5 AS p,
    quantile_cont(latency_days, 0.5) AS q
  FROM lat GROUP BY priority
  UNION ALL
  SELECT priority, 0.9 AS p,
    quantile_cont(latency_days, 0.9) AS q
  FROM lat GROUP BY priority
)
"""

QUERIES["fulfillment_latency"] = q_fulfillment_latency
_RAW_ORACLES["fulfillment_latency"] = SQL_FULFILLMENT_LATENCY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_log_odds_words(spark, sf_dir):
    """Top-20 words most distinctive of src0 vs src1 by weighted
    log-odds with informative Dirichlet prior (operators/text.py
    log_odds_words, Monroe et al. 2008): one word-keyed agg with
    conditional per-group sums, fixed double prior/z expressions,
    TakeOrdered on the rounded z."""
    from mpds_spark.operators.text import log_odds_words

    docs = load(spark, sf_dir, "documents").select("source", "text")
    out = log_odds_words(
        docs, group_a="src0", group_b="src1", group="source",
        text="text", alpha0=100.0, k=20,
    )
    return out.select(
        "word", "y_a", "y_b", _r6("delta").alias("delta"),
        _r6("z").alias("z"),
    )


SQL_LOG_ODDS_WORDS = """
WITH w AS (
  SELECT source = 'src0' AS a, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE source IN ('src0', 'src1')
), c AS (
  SELECT word,
    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS y_a,
    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS y_b
  FROM w WHERE word != '' GROUP BY word
), t AS (
  SELECT word, y_a, y_b,
    CAST(sum(y_a) OVER () AS BIGINT) AS na,
    CAST(sum(y_b) OVER () AS BIGINT) AS nb
  FROM c
), s AS (
  SELECT word, y_a, y_b,
    ln((y_a::DOUBLE + 100.0 * (y_a + y_b)::DOUBLE / (na + nb)::DOUBLE)
       / (na::DOUBLE + 100.0 - y_a::DOUBLE
          - 100.0 * (y_a + y_b)::DOUBLE / (na + nb)::DOUBLE))
    - ln((y_b::DOUBLE + 100.0 * (y_a + y_b)::DOUBLE / (na + nb)::DOUBLE)
       / (nb::DOUBLE + 100.0 - y_b::DOUBLE
          - 100.0 * (y_a + y_b)::DOUBLE / (na + nb)::DOUBLE)) AS delta,
    sqrt(1.0 / (y_a::DOUBLE + 100.0 * (y_a + y_b)::DOUBLE
                / (na + nb)::DOUBLE)
       + 1.0 / (y_b::DOUBLE + 100.0 * (y_a + y_b)::DOUBLE
                / (na + nb)::DOUBLE)) AS se
  FROM t
)
SELECT word, y_a, y_b, round(delta, 6) AS delta,
  round(delta / se, 6) AS z
FROM s
ORDER BY (floor(abs(delta / se)*1000000.0 + 0.5)/1000000.0
          *sign(delta / se)) DESC, word ASC
LIMIT 20
"""

QUERIES["log_odds_words"] = q_log_odds_words
_RAW_ORACLES["log_odds_words"] = SQL_LOG_ODDS_WORDS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hll_rolling_merge(spark, sf_dir):
    """Trailing-7-day distinct-user estimates by max-merging daily HLL
    registers (operators/sketches.py hll_rolling_merge): the raw stream
    is scanned ONCE into daily registers; every window is a register
    MAX over tiny rows — the mergeable-sketch rollup that makes
    sliding distinct counts affordable at 100 TB. Exact trailing
    distinct computed beside it; the oracle rebuilds identical
    registers so the gate is EXACT."""
    from mpds_spark.operators.sketches import hll_rolling_merge

    ev = _events(spark, sf_dir).select("user_id", "ts")
    out = hll_rolling_merge(
        ev, key="user_id", ts="ts", window_days=7, p=8
    )
    return out.select(
        "day",
        "n_exact",
        "hll_buckets_hit",
        _r6("hll_estimate").alias("hll_estimate"),
        _r6("rel_err").alias("rel_err"),
    )


def _hll_rolling_sql() -> str:
    from mpds_spark.operators.sketches import hll_alpha

    amm = repr(hll_alpha(256) * 256 * 256)
    return f"""
WITH h AS (
  SELECT epoch_us(ts) // 86400000000 AS day, user_id,
    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
         AS BIGINT) AS hv
  FROM events
), br AS (
  SELECT day, user_id, hv >> 52 AS bucket,
    hv % 4503599627370496 AS r
  FROM h
), daily AS (
  SELECT day, bucket,
    max(CASE WHEN r = 0 THEN 53 ELSE 53 - length(bin(r)) END) AS m
  FROM br GROUP BY day, bucket
), active AS (SELECT DISTINCT day FROM br),
spread AS (
  SELECT unnest(generate_series(d.day, d.day + 6)) AS day, d.bucket, d.m
  FROM daily d
), merged AS (
  SELECT s.day, s.bucket, max(s.m) AS m
  FROM spread s JOIN active a ON a.day = s.day
  GROUP BY s.day, s.bucket
), folded AS (
  SELECT day, CAST(count(*) AS BIGINT) AS hll_buckets_hit,
    list_sum(list(1.0 / CAST(1::BIGINT << m AS DOUBLE) ORDER BY bucket))
      AS z_hit
  FROM merged GROUP BY day
), est AS (
  SELECT day, hll_buckets_hit,
    CASE WHEN ({amm} / (z_hit + CAST(256 - hll_buckets_hit AS DOUBLE)))
              <= 640.0
          AND (256 - hll_buckets_hit) > 0
      THEN 256.0 * ln(256.0 / CAST(256 - hll_buckets_hit AS DOUBLE))
      ELSE {amm} / (z_hit + CAST(256 - hll_buckets_hit AS DOUBLE))
    END AS e
  FROM folded
), du AS (
  SELECT DISTINCT day, user_id FROM br
), xspread AS (
  SELECT unnest(generate_series(du.day, du.day + 6)) AS day, du.user_id
  FROM du
), exact AS (
  SELECT x.day, CAST(count(DISTINCT x.user_id) AS BIGINT) AS n_exact
  FROM xspread x JOIN active a ON a.day = x.day GROUP BY x.day
)
SELECT CAST(x.day AS BIGINT) AS day, x.n_exact, s.hll_buckets_hit,
  round(s.e, 6) AS hll_estimate,
  round((s.e - x.n_exact::DOUBLE) / x.n_exact::DOUBLE, 6) AS rel_err
FROM exact x JOIN est s ON s.day = x.day
"""


SQL_HLL_ROLLING_MERGE = _hll_rolling_sql()

QUERIES["hll_rolling_merge"] = q_hll_rolling_merge
_RAW_ORACLES["hll_rolling_merge"] = SQL_HLL_ROLLING_MERGE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_snm_pairs(spark, sf_dir):
    """Sorted-neighborhood entity-resolution candidates over part names
    (operators/pairs.py snm_pairs, Hernández & Stolfo 1995): distinct
    names sorted once, each paired with its next 4 sort neighbors via
    lead() — never a self-join; Levenshtein <= 3 verify; heap top-50.
    The complementary generator to blocked_fuzzy_pairs."""
    from mpds_spark.operators.pairs import snm_pairs

    pt = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    return snm_pairs(
        pt, key="p_partkey", name="p_name", window=5, max_dist=3, k=50
    )


SQL_SNM_PAIRS = """
WITH base AS (
  SELECT p_name AS n, CAST(min(p_partkey) AS BIGINT) AS k,
    CAST(count(*) AS BIGINT) AS cnt
  FROM part GROUP BY p_name
), r AS (
  SELECT n, k, cnt, row_number() OVER (ORDER BY n) AS rn FROM base
)
SELECT least(a.k, b.k) AS key_a, greatest(a.k, b.k) AS key_b,
  CASE WHEN a.k < b.k THEN a.n ELSE b.n END AS name_a,
  CASE WHEN a.k < b.k THEN b.n ELSE a.n END AS name_b,
  CAST(levenshtein(a.n, b.n) AS INT) AS dist,
  CASE WHEN a.k < b.k THEN a.cnt ELSE b.cnt END AS n_a,
  CASE WHEN a.k < b.k THEN b.cnt ELSE a.cnt END AS n_b
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
WHERE levenshtein(a.n, b.n) <= 3
ORDER BY dist, key_a, key_b LIMIT 50
"""

QUERIES["snm_pairs"] = q_snm_pairs
_RAW_ORACLES["snm_pairs"] = SQL_SNM_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_peak_concurrency(spark, sf_dir):
    """Peak concurrent 30-min activity windows per day
    (operators/sessionize.py peak_concurrency): the boundary sweep —
    +1/-1 ordered (time, delta) so ends precede starts at ties, one
    global running count, per-day (max, earliest-attaining-time)
    rollup. Capacity-planning metric; exact longs throughout."""
    from mpds_spark.operators.sessionize import peak_concurrency

    ev = _events(spark, sf_dir).select("ts")
    return peak_concurrency(ev, ts="ts", duration=1800.0)


SQL_PEAK_CONCURRENCY = """
WITH b AS (
  SELECT epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + 1800000000 AS t, -1 AS d FROM events
), r AS (
  SELECT t, d,
    CAST(sum(d) OVER (ORDER BY t, d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
  FROM b
), s AS (
  SELECT t // 86400000000 AS day, t, run FROM r WHERE d = 1
), p AS (
  SELECT day, max(run) AS peak FROM s GROUP BY day
)
SELECT CAST(p.day AS BIGINT) AS day,
  CAST(p.peak AS BIGINT) AS peak_concurrent,
  CAST(min(s.t) AS BIGINT) AS peak_at_us
FROM p JOIN s ON s.day = p.day AND s.run = p.peak
GROUP BY p.day, p.peak
"""

QUERIES["peak_concurrency"] = q_peak_concurrency
_RAW_ORACLES["peak_concurrency"] = SQL_PEAK_CONCURRENCY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_join_size_audit(spark, sf_dir):
    """Exact equi-join cardinalities vs the Selinger uniform-frequency
    estimate for three star relations (operators/validate.py
    join_size_audit): per-key count frames joined — never the raw
    tables — exact decimal products, one double division per row."""
    from mpds_spark.operators.validate import join_size_audit

    ev = _events(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    audits = [
        join_size_audit(
            orders, cust, "o_custkey", "c_custkey", "orders*customer"
        ),
        join_size_audit(
            li, orders, "l_orderkey", "o_orderkey", "lineitem*orders"
        ),
        join_size_audit(
            li, part, "l_partkey", "p_partkey", "lineitem*part"
        ),
        join_size_audit(
            ev, cust, "user_id", "c_custkey", "events*customer"
        ),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out.select(
        "relation",
        "n_left",
        "n_right",
        "ndv_left",
        "ndv_right",
        "actual_rows",
        _r6("est_rows").alias("est_rows"),
        _r6("ratio").alias("ratio"),
    )


def _join_audit_block(lsql, rsql, relation):
    return f"""
SELECT '{relation}' AS relation,
  (SELECT CAST(count(*) AS BIGINT) FROM ({lsql})) AS n_left,
  (SELECT CAST(count(*) AS BIGINT) FROM ({rsql})) AS n_right,
  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM ({lsql})) AS ndv_left,
  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM ({rsql})) AS ndv_right,
  (SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT) FROM
     (SELECT k, CAST(count(*) AS HUGEINT) AS cl FROM ({lsql}) GROUP BY k) a
     JOIN
     (SELECT k, CAST(count(*) AS HUGEINT) AS cr FROM ({rsql}) GROUP BY k) b
     ON a.k = b.k) AS actual_rows,
  round(
    (SELECT count(*) FROM ({lsql}))::DOUBLE
    * (SELECT count(*) FROM ({rsql}))::DOUBLE
    / greatest((SELECT count(DISTINCT k) FROM ({lsql})),
               (SELECT count(DISTINCT k) FROM ({rsql})))::DOUBLE, 6)
    AS est_rows,
  round(
    (SELECT CAST(coalesce(sum(cl * cr), 0) AS HUGEINT) FROM
     (SELECT k, CAST(count(*) AS HUGEINT) AS cl FROM ({lsql}) GROUP BY k) a
     JOIN
     (SELECT k, CAST(count(*) AS HUGEINT) AS cr FROM ({rsql}) GROUP BY k) b
     ON a.k = b.k)::DOUBLE
    / ((SELECT count(*) FROM ({lsql}))::DOUBLE
       * (SELECT count(*) FROM ({rsql}))::DOUBLE
       / greatest((SELECT count(DISTINCT k) FROM ({lsql})),
                  (SELECT count(DISTINCT k) FROM ({rsql})))::DOUBLE), 6)
    AS ratio
"""


SQL_JOIN_SIZE_AUDIT = " UNION ALL ".join(
    [
        _join_audit_block(
            "SELECT o_custkey AS k FROM orders",
            "SELECT c_custkey AS k FROM customer",
            "orders*customer",
        ),
        _join_audit_block(
            "SELECT l_orderkey AS k FROM lineitem",
            "SELECT o_orderkey AS k FROM orders",
            "lineitem*orders",
        ),
        _join_audit_block(
            "SELECT l_partkey AS k FROM lineitem",
            "SELECT p_partkey AS k FROM part",
            "lineitem*part",
        ),
        _join_audit_block(
            "SELECT user_id AS k FROM events",
            "SELECT c_custkey AS k FROM customer",
            "events*customer",
        ),
    ]
)

QUERIES["join_size_audit"] = q_join_size_audit
_RAW_ORACLES["join_size_audit"] = SQL_JOIN_SIZE_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_log2_histogram(spark, sf_dir):
    """Power-of-two histogram of per-user event counts (the activity
    profile every ops dashboard shows): bucket = floor(log2 n) computed
    from the bin()-string length — never libm log2; one user agg + one
    tiny bucket agg, all exact longs."""
    ev = _events(spark, sf_dir).select("user_id")
    n = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    b = n.select(
        (F.length(F.bin(F.col("__n"))) - 1).cast("long").alias("bucket")
    )
    out = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return out.select(
        "bucket",
        F.expr("cast(1 as bigint) << cast(bucket as int)").alias("lo"),
        (
            F.expr("cast(1 as bigint) << (cast(bucket as int) + 1)") - 1
        ).alias("hi"),
        "n_users",
    )


SQL_LOG2_HISTOGRAM = """
WITH n AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id
), b AS (
  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket FROM n
)
SELECT bucket,
  CAST(1::BIGINT << CAST(bucket AS INT) AS BIGINT) AS lo,
  CAST((1::BIGINT << (CAST(bucket AS INT) + 1)) - 1 AS BIGINT) AS hi,
  CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY bucket
"""

QUERIES["log2_histogram"] = q_log2_histogram
_RAW_ORACLES["log2_histogram"] = SQL_LOG2_HISTOGRAM
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_calendar_features(spark, sf_dir):
    """Calendar feature extraction — the feature-eng staple whose
    cross-engine parity is genuinely subtle (weekday and week-of-year
    conventions differ per engine): ISO weekday (1=Mon..7=Sun) via
    Spark weekday()+1 == DuckDB isodow, ISO week number (Spark
    weekofyear == DuckDB week), weekend flag, month/quarter/hour,
    epoch day. Pure map stage, zero shuffles beyond none."""
    ev = _events(spark, sf_dir).select(
        "event_id", F.col("ts").cast("timestamp").alias("__t")
    )
    return ev.select(
        "event_id",
        F.expr("unix_micros(__t) div 86400000000").alias("epoch_day"),
        (F.weekday("__t") + 1).cast("long").alias("iso_dow"),
        (F.weekday("__t") >= 5).alias("is_weekend"),
        F.weekofyear("__t").cast("long").alias("iso_week"),
        F.month("__t").cast("long").alias("month"),
        F.quarter("__t").cast("long").alias("quarter"),
        F.hour("__t").cast("long").alias("hour"),
    )


SQL_CALENDAR_FEATURES = """
SELECT event_id,
  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS epoch_day,
  CAST(isodow(ts) AS BIGINT) AS iso_dow,
  isodow(ts) >= 6 AS is_weekend,
  CAST(week(ts) AS BIGINT) AS iso_week,
  CAST(month(ts) AS BIGINT) AS month,
  CAST(quarter(ts) AS BIGINT) AS quarter,
  CAST(hour(ts) AS BIGINT) AS hour
FROM events
"""

QUERIES["calendar_features"] = q_calendar_features
_RAW_ORACLES["calendar_features"] = SQL_CALENDAR_FEATURES
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust per-entity trend (operators/windows.py
    theil_sen): exact median of all pairwise slopes, pair expansion
    JVM-side on the per-entity sorted array — never a self-join. The
    oracle IS the naive pairwise self-join + explicit middle-element
    selection, proving the array formulation."""
    from mpds_spark.operators.windows import theil_sen

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value"
    )
    out = theil_sen(ev, value="value", ts="ts", by="entity_id")
    return out.select(
        "entity_id", "n_obs", "n_pairs",
        _r6("slope_per_day").alias("slope_per_day"),
    )


SQL_THEIL_SEN = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS x,
         CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS y
  FROM events
), p AS (
  SELECT a.user_id,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
  FROM e a JOIN e b ON a.user_id = b.user_id AND b.x > a.x
), r AS (
  SELECT user_id, s,
         row_number() OVER (PARTITION BY user_id ORDER BY s) AS rn,
         count(*) OVER (PARTITION BY user_id) AS m
  FROM p
), g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs FROM e GROUP BY user_id
)
SELECT g.user_id AS entity_id, g.n_obs,
  CAST(g.n_obs*(g.n_obs-1)//2 AS BIGINT) AS n_pairs,
  round((lo.s + hi.s)/2.0 * 864000000.0, 6) AS slope_per_day
FROM g
JOIN (SELECT user_id, s FROM r WHERE rn = (m+1)//2) lo ON g.user_id = lo.user_id
JOIN (SELECT user_id, s FROM r WHERE rn = (m+2)//2) hi ON g.user_id = hi.user_id
WHERE g.n_obs >= 2
"""

QUERIES["theil_sen_slope"] = q_theil_sen_slope
_RAW_ORACLES["theil_sen_slope"] = SQL_THEIL_SEN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_spearman_rank(spark, sf_dir):
    """Spearman rank correlation of per-customer order count vs total
    spend, beside the raw Pearson r (operators/profiles.py
    spearman_corr): tie-correct average ranks WITHOUT a global sort —
    distinct-value frame + one cumulative window over it + broadcast
    join back; all moments DECIMAL(38,0)-exact on doubled ranks. The
    per-customer base frame is scratch-persisted: three plan branches
    (two value frames + the moment scan) read it, and without the pin
    each would re-aggregate orders from the scan."""
    from mpds_spark.operators.profiles import spearman_corr
    from mpds_spark.operators.util import scratch_persist

    od = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
    ).cast("long")
    base = scratch_persist(
        od.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("nx"),
            F.sum(cents).cast("long").alias("yv"),
        )
    )
    out = spearman_corr(base, x="nx", y="yv")
    return out.select(
        "n_units",
        _r6("spearman_rho").alias("spearman_rho"),
        _r6("pearson_r").alias("pearson_r"),
    )


SQL_SPEARMAN_RANK = """
WITH base AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS nx,
    CAST(sum(CAST(floor(abs(o_totalprice)*100 + 0.5)*sign(o_totalprice)
                  AS BIGINT)) AS BIGINT) AS yv
  FROM orders GROUP BY o_custkey
), vx AS (
  SELECT nx,
    2*coalesce(sum(count(*)) OVER (ORDER BY nx
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + count(*) + 1 AS rx
  FROM base GROUP BY nx
), vy AS (
  SELECT yv,
    2*coalesce(sum(count(*)) OVER (ORDER BY yv
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + count(*) + 1 AS ry
  FROM base GROUP BY yv
), d AS (
  SELECT CAST(base.nx AS HUGEINT) AS x, CAST(base.yv AS HUGEINT) AS y,
         CAST(vx.rx AS HUGEINT) AS rx, CAST(vy.ry AS HUGEINT) AS ry
  FROM base JOIN vx ON base.nx = vx.nx JOIN vy ON base.yv = vy.yv
), mo AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    sum(rx) AS srx, sum(ry) AS sry, sum(rx*rx) AS srxx,
    sum(ry*ry) AS sryy, sum(rx*ry) AS srxy,
    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
    sum(y*y) AS syy, sum(x*y) AS sxy
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_units,
  round(CAST(n*srxy - srx*sry AS DOUBLE)
    / sqrt(CAST(n*srxx - srx*srx AS DOUBLE)
           * CAST(n*sryy - sry*sry AS DOUBLE)), 6) AS spearman_rho,
  round(CAST(n*sxy - sx*sy AS DOUBLE)
    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS pearson_r
FROM mo
"""

QUERIES["spearman_rank"] = q_spearman_rank
_RAW_ORACLES["spearman_rank"] = SQL_SPEARMAN_RANK
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_cuped_adjust(spark, sf_dir):
    """CUPED variance-reduction audit (operators/profiles.py cuped):
    pre-period spend as covariate, post-period spend as metric per
    user, split at the exact integer-microsecond midpoint of the
    corpus span (1-row scalar broadcast, registered BNLJ-by-design);
    theta and the adjusted-metric variance derived analytically from
    DECIMAL(38,0)-exact moments — no per-unit float fold."""
    from mpds_spark.operators.profiles import cuped

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__yc"),
    )
    b = ev.agg(F.min("__us").alias("__mn"), F.max("__us").alias("__mx"))
    ev = ev.crossJoin(F.broadcast(b)).withColumn(
        "__mid", F.expr("__mn + (__mx - __mn) div 2")
    )
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("__us") <= F.col("__mid"), F.col("__yc"))
            .otherwise(F.lit(0))
        ).cast("long").alias("x"),
        F.sum(
            F.when(F.col("__us") > F.col("__mid"), F.col("__yc"))
            .otherwise(F.lit(0))
        ).cast("long").alias("y"),
    )
    out = cuped(u, x="x", y="y")
    return out.select(
        "n_units",
        _r6("theta").alias("theta"),
        _r6("var_y").alias("var_y"),
        _r6("var_cuped").alias("var_cuped"),
        _r6("reduction_pct").alias("reduction_pct"),
    )


SQL_CUPED_ADJUST = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS yc
  FROM events
), b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
m AS (SELECT mn + (mx - mn) // 2 AS mid FROM b),
u AS (
  SELECT user_id,
    CAST(sum(CASE WHEN us <= (SELECT mid FROM m) THEN yc ELSE 0 END)
         AS HUGEINT) AS x,
    CAST(sum(CASE WHEN us > (SELECT mid FROM m) THEN yc ELSE 0 END)
         AS HUGEINT) AS y
  FROM e GROUP BY user_id
), mo AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM u
)
SELECT CAST(n AS BIGINT) AS n_units,
  round(CAST(n*sxy - sx*sy AS DOUBLE)
        / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS theta,
  round(CAST(n*syy - sy*sy AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0), 6)
    AS var_y,
  round((CAST(n*syy - sy*sy AS DOUBLE)
         - CAST(n*sxy - sx*sy AS DOUBLE)*CAST(n*sxy - sx*sy AS DOUBLE)
           / CAST(n*sxx - sx*sx AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0), 6)
    AS var_cuped,
  round(100.0 * CAST(n*sxy - sx*sy AS DOUBLE)
        * CAST(n*sxy - sx*sy AS DOUBLE)
        / (CAST(n*sxx - sx*sx AS DOUBLE)
           * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS reduction_pct
FROM mo
"""

QUERIES["cuped_adjust"] = q_cuped_adjust
_RAW_ORACLES["cuped_adjust"] = SQL_CUPED_ADJUST
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ams_f2_sketch(spark, sf_dir):
    """AMS F2 sketch vs exact self-join size of events.user_id
    (operators/sketches.py ams_f2): 16 sign counters folded over the
    raw stream with md5-parity signs — zero per-key state — then
    median-of-means; exact F2 from the per-user count pass beside it.
    The oracle rebuilds the identical counters, so the gate is EXACT
    despite the approximate estimator."""
    from mpds_spark.operators.sketches import ams_f2

    ev = _events(spark, sf_dir).select("user_id")
    out = ams_f2(ev, key="user_id")
    return out.select(
        "n_rows", "f2_exact",
        _r6("f2_est").alias("f2_est"),
        _r6("rel_err").alias("rel_err"),
    )


SQL_AMS_F2 = """
WITH e AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), sk AS (
  SELECT j,
    CAST(sum(2*(('0x' || substring(md5('ams' || CAST(j AS VARCHAR)
        || '|' || k), 1, 1))::UBIGINT % 2)::BIGINT - 1) AS BIGINT) AS y
  FROM e, (SELECT unnest(generate_series(0, 15)) AS j)
  GROUP BY j
), mg AS (
  SELECT j // 4 AS g, CAST(sum(y*y) AS DOUBLE) / 4.0 AS m
  FROM sk GROUP BY j // 4
), est AS (
  SELECT (ms[(len(ms)+1)//2] + ms[(len(ms)+2)//2]) / 2.0 AS f2_est
  FROM (SELECT list(m ORDER BY m) AS ms FROM mg)
), ex AS (
  SELECT CAST(sum(f) AS BIGINT) AS n_rows,
         CAST(sum(f*f) AS BIGINT) AS f2_exact
  FROM (SELECT count(*) AS f FROM e GROUP BY k)
)
SELECT n_rows, f2_exact, round(f2_est, 6) AS f2_est,
  round((f2_est - f2_exact::DOUBLE) / f2_exact::DOUBLE, 6) AS rel_err
FROM ex, est
"""

QUERIES["ams_f2_sketch"] = q_ams_f2_sketch
_RAW_ORACLES["ams_f2_sketch"] = SQL_AMS_F2
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_good_turing(spark, sf_dir):
    """Good-Turing frequency-of-frequencies over the documents corpus
    (operators/text.py good_turing): exact (r, N_r) table with the
    Turing-adjusted count (r+1)N_{r+1}/N_r and each bucket's share of
    corpus mass — the smoothing backbone of Katz backoff and the
    unseen-mass estimate."""
    from mpds_spark.operators.text import good_turing

    docs = load(spark, sf_dir, "documents")
    out = good_turing(docs, text="text")
    return out.select(
        "r", "n_r",
        _r6("r_star").alias("r_star"),
        _r6("mass_pct").alias("mass_pct"),
    )


SQL_GOOD_TURING = """
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
  WHERE trim(text) <> ''
), wf AS (
  SELECT word, CAST(count(*) AS BIGINT) AS r FROM w
  WHERE word <> '' GROUP BY word
), nr AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wf GROUP BY r
)
SELECT a.r, a.n_r,
  round(CAST(a.r + 1 AS DOUBLE) * CAST(b.n_r AS DOUBLE)
        / CAST(a.n_r AS DOUBLE), 6) AS r_star,
  round(100.0 * CAST(a.r * a.n_r AS DOUBLE)
        / CAST((SELECT sum(r * n_r) FROM nr) AS DOUBLE), 6) AS mass_pct
FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
"""

QUERIES["good_turing"] = q_good_turing
_RAW_ORACLES["good_turing"] = SQL_GOOD_TURING
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity release audit over customers
    (operators/validate.py k_anonymity): QI = (mktsegment, nationkey),
    sensitive = exact acctbal cents; per-threshold counts of
    under-anonymized classes and exposed rows, worst-case sensitive
    diversity — all exact longs, one QI agg + one tiny k agg."""
    from mpds_spark.operators.validate import k_anonymity

    cust = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        (
            F.signum("c_acctbal")
            * F.floor(F.abs(F.col("c_acctbal")) * 100 + F.lit(0.5))
        ).cast("long").alias("__bal_c"),
    )
    return k_anonymity(
        cust,
        qi=("c_mktsegment", "c_nationkey"),
        sensitive="__bal_c",
    ).select(
        "k", "n_classes", "min_class_size", "min_l_div",
        "classes_below", "rows_at_risk",
        _r6("risk_pct").alias("risk_pct"),
    )


SQL_K_ANONYMITY = """
WITH cls AS (
  SELECT c_mktsegment, c_nationkey,
    CAST(count(*) AS BIGINT) AS sz,
    CAST(count(DISTINCT CAST(floor(abs(c_acctbal)*100 + 0.5)
         * sign(c_acctbal) AS BIGINT)) AS BIGINT) AS ldiv
  FROM customer GROUP BY c_mktsegment, c_nationkey
), e AS (
  SELECT sz, ldiv, CAST(k AS BIGINT) AS k
  FROM cls, (SELECT unnest([2, 5, 10, 20]) AS k)
)
SELECT k,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(min(sz) AS BIGINT) AS min_class_size,
  CAST(min(ldiv) AS BIGINT) AS min_l_div,
  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
    AS classes_below,
  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
    AS rows_at_risk,
  round(100.0 * CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
        / CAST(sum(sz) AS DOUBLE), 6) AS risk_pct
FROM e GROUP BY k
"""

QUERIES["k_anonymity"] = q_k_anonymity
_RAW_ORACLES["k_anonymity"] = SQL_K_ANONYMITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_pmi_pairs(spark, sf_dir):
    """Windowed PMI collocations over documents (operators/text.py
    pmi_pairs, Church & Hanks 1990): pairs within 3 positions via the
    exact-offset posting equi-join (never a theta self-join), support
    guard >= 10, top-50 by (rounded PMI desc, pair); the oracle IS the
    positional theta-join definition, proving the offset-explode."""
    from mpds_spark.operators.text import pmi_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return pmi_pairs(docs, text="text", window=3, min_pair=10, k=50)


SQL_PMI_PAIRS = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), p AS (
  SELECT doc_id, i AS pos, w[i] AS word
  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) t
  WHERE w[i] <> ''
), pairs AS (
  SELECT least(a.word, b.word) AS word_a,
         greatest(a.word, b.word) AS word_b
  FROM p a JOIN p b ON a.doc_id = b.doc_id
   AND b.pos - a.pos BETWEEN 1 AND 3
  WHERE a.word <> b.word
), pc AS (
  SELECT word_a, word_b, CAST(count(*) AS BIGINT) AS c_pair
  FROM pairs GROUP BY word_a, word_b
), tot AS (SELECT CAST(sum(c_pair) AS HUGEINT) AS t FROM pc),
marg AS (SELECT word, CAST(count(*) AS HUGEINT) AS c FROM p GROUP BY word),
ntot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM p)
SELECT word_a, word_b, c_pair,
  round(ln(CAST(CAST(c_pair AS HUGEINT) * (SELECT n FROM ntot)
                * (SELECT n FROM ntot) AS DOUBLE)
           / CAST((SELECT t FROM tot) * ma.c * mb.c AS DOUBLE)), 6)
    AS pmi
FROM pc
JOIN marg ma ON pc.word_a = ma.word
JOIN marg mb ON pc.word_b = mb.word
WHERE c_pair >= 10
ORDER BY pmi DESC, word_a, word_b
LIMIT 50
"""

QUERIES["pmi_pairs"] = q_pmi_pairs
_RAW_ORACLES["pmi_pairs"] = SQL_PMI_PAIRS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_sax_symbols(spark, sf_dir):
    """SAX words per entity (operators/windows.py sax_symbols, Lin et
    al. 2003): 8-segment PAA of the cents stream z-scored on exact
    entity moments (the cents scale cancels inside z), 4-letter
    quartile alphabet — the output is a STRING, gated exactly."""
    from mpds_spark.operators.windows import sax_symbols

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value"
    )
    return sax_symbols(ev, value="value", ts="ts", by="entity_id")


SQL_SAX_SYMBOLS = """
WITH e AS (
  SELECT user_id, ts,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c,
    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), seg AS (
  SELECT user_id, (rn - 1) * 8 // n AS seg,
    CAST(count(*) AS BIGINT) AS k, CAST(sum(c) AS BIGINT) AS sc,
    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ssq
  FROM e GROUP BY user_id, (rn - 1) * 8 // n
), mo AS (
  SELECT user_id, CAST(sum(k) AS BIGINT) AS nn,
    CAST(sum(sc) AS HUGEINT) AS sx, CAST(sum(ssq) AS HUGEINT) AS sxx
  FROM seg GROUP BY user_id
), z AS (
  SELECT seg.user_id, seg.seg,
    ((CAST(sc AS DOUBLE) / CAST(k AS DOUBLE))
     - CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE))
    / sqrt(CAST(CAST(nn AS HUGEINT) * sxx - sx * sx AS DOUBLE)
           / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))) AS z
  FROM seg JOIN mo ON seg.user_id = mo.user_id
), sym AS (
  SELECT user_id, seg,
    CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS s
  FROM z
)
SELECT sym.user_id AS entity_id, mo.nn AS n_obs,
  string_agg(s, '' ORDER BY seg) AS sax
FROM sym JOIN mo ON sym.user_id = mo.user_id
GROUP BY sym.user_id, mo.nn
"""

QUERIES["sax_symbols"] = q_sax_symbols
_RAW_ORACLES["sax_symbols"] = SQL_SAX_SYMBOLS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_holt_trend(spark, sf_dir):
    """Holt level+trend smoothing per entity (operators/windows.py
    holt_trend): sequential struct fold over the ts-sorted cents
    array — Spark aggregate vs DuckDB list_reduce with the level
    expression inlined verbatim in the trend update on both engines."""
    from mpds_spark.operators.windows import holt_trend

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value"
    )
    out = holt_trend(ev, value="value", ts="ts", by="entity_id")
    return out.select(
        "entity_id", "n_events",
        _r6("level").alias("level"),
        _r6("trend").alias("trend"),
        _r6("forecast_1").alias("forecast_1"),
    )


SQL_HOLT_TREND = """
WITH e AS (
  SELECT user_id, ts,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
), g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
    list(CAST(c AS DOUBLE) ORDER BY ts) AS vs
  FROM e GROUP BY user_id
), f AS (
  -- list (not struct) accumulator: DuckDB 1.0 list_reduce evaluates
  -- struct-result lambdas FIELD-SEQUENTIALLY, rebinding acc.<field> to
  -- the just-computed value inside later fields; list results build
  -- atomically, matching Spark's named_struct fold
  SELECT user_id, n_events,
    list_reduce(
      list_transform(vs, v -> [v, 0.0::DOUBLE]),
      (acc, x) -> [
        0.25::DOUBLE * x[1] + 0.75::DOUBLE * (acc[1] + acc[2]),
        0.125::DOUBLE * ((0.25::DOUBLE * x[1]
              + 0.75::DOUBLE * (acc[1] + acc[2])) - acc[1])
             + 0.875::DOUBLE * acc[2]]) AS st
  FROM g
)
SELECT user_id AS entity_id, n_events,
  round(st[1] / 100.0, 6) AS level,
  round(st[2] / 100.0, 6) AS trend,
  round((st[1] + st[2]) / 100.0, 6) AS forecast_1
FROM f
"""

QUERIES["holt_trend"] = q_holt_trend
_RAW_ORACLES["holt_trend"] = SQL_HOLT_TREND
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ivm_merge_audit(spark, sf_dir):
    """Incremental-view-maintenance merge audit: the mergeable-aggregate
    contract (count/sum/min/max compose; avg re-derives from merged
    sum/count) that makes incremental pipelines, AQE partial aggs and
    checkpoint-resume correct. Events split base/delta at the exact
    corpus midpoint (1-row broadcast, registered BNLJ-by-design); the
    merged path must equal the full recompute cell-for-cell — the
    audit reports both so the oracle gate PROVES the merge."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    b = ev.agg(F.min("__us").alias("__mn"), F.max("__us").alias("__mx"))
    ev = ev.crossJoin(F.broadcast(b)).withColumn(
        "__base", F.expr("__us <= __mn + (__mx - __mn) div 2")
    )

    def leg(pred):
        return [
            F.sum(F.when(pred, 1).otherwise(0)).cast("long"),
            F.sum(F.when(pred, F.col("__c")).otherwise(0)).cast("long"),
            F.min(F.when(pred, F.col("__c"))).cast("long"),
            F.max(F.when(pred, F.col("__c"))).cast("long"),
        ]

    base = leg(F.col("__base"))
    delta = leg(~F.col("__base"))
    full = leg(F.lit(True))
    g = ev.groupBy("event_type").agg(
        base[0].alias("__bn"), base[1].alias("__bs"),
        base[2].alias("__bmin"), base[3].alias("__bmax"),
        delta[0].alias("__dn"), delta[1].alias("__ds"),
        delta[2].alias("__dmin"), delta[3].alias("__dmax"),
        full[0].alias("n_full"), full[1].alias("__fs"),
        full[2].alias("__fmin"), full[3].alias("__fmax"),
    )
    n_m = (F.col("__bn") + F.col("__dn")).cast("long")
    s_m = (F.col("__bs") + F.col("__ds")).cast("long")
    min_m = F.least(
        F.coalesce("__bmin", "__dmin"), F.coalesce("__dmin", "__bmin")
    ).cast("long")
    max_m = F.greatest(
        F.coalesce("__bmax", "__dmax"), F.coalesce("__dmax", "__bmax")
    ).cast("long")
    return g.select(
        "event_type",
        "n_full",
        n_m.alias("n_merged"),
        F.col("__fs").alias("sum_full_c"),
        s_m.alias("sum_merged_c"),
        F.col("__fmin").alias("min_full_c"),
        min_m.alias("min_merged_c"),
        F.col("__fmax").alias("max_full_c"),
        max_m.alias("max_merged_c"),
        _r6(F.col("__fs").cast("double") / F.col("n_full").cast("double"))
        .alias("avg_full"),
        _r6(s_m.cast("double") / n_m.cast("double")).alias("avg_merged"),
        (
            (F.col("n_full") == n_m) & (F.col("__fs") == s_m)
            & (F.col("__fmin") == min_m) & (F.col("__fmax") == max_m)
        ).alias("merge_ok"),
    )


SQL_IVM_MERGE = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
), b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
t AS (
  SELECT event_type, c,
    us <= (SELECT mn + (mx - mn) // 2 FROM b) AS is_base
  FROM e
), g AS (
  SELECT event_type,
    CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS bn,
    CAST(sum(CASE WHEN is_base THEN c ELSE 0 END) AS BIGINT) AS bs,
    CAST(min(CASE WHEN is_base THEN c END) AS BIGINT) AS bmin,
    CAST(max(CASE WHEN is_base THEN c END) AS BIGINT) AS bmax,
    CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS dn,
    CAST(sum(CASE WHEN is_base THEN 0 ELSE c END) AS BIGINT) AS ds,
    CAST(min(CASE WHEN NOT is_base THEN c END) AS BIGINT) AS dmin,
    CAST(max(CASE WHEN NOT is_base THEN c END) AS BIGINT) AS dmax,
    CAST(count(*) AS BIGINT) AS n_full,
    CAST(sum(c) AS BIGINT) AS fs,
    CAST(min(c) AS BIGINT) AS fmin,
    CAST(max(c) AS BIGINT) AS fmax
  FROM t GROUP BY event_type
)
SELECT event_type, n_full,
  CAST(bn + dn AS BIGINT) AS n_merged,
  fs AS sum_full_c,
  CAST(bs + ds AS BIGINT) AS sum_merged_c,
  fmin AS min_full_c,
  CAST(least(coalesce(bmin, dmin), coalesce(dmin, bmin)) AS BIGINT)
    AS min_merged_c,
  fmax AS max_full_c,
  CAST(greatest(coalesce(bmax, dmax), coalesce(dmax, bmax)) AS BIGINT)
    AS max_merged_c,
  round(CAST(fs AS DOUBLE) / CAST(n_full AS DOUBLE), 6) AS avg_full,
  round(CAST(bs + ds AS DOUBLE) / CAST(bn + dn AS DOUBLE), 6)
    AS avg_merged,
  (n_full = bn + dn AND fs = bs + ds
   AND fmin = least(coalesce(bmin, dmin), coalesce(dmin, bmin))
   AND fmax = greatest(coalesce(bmax, dmax), coalesce(dmax, bmax)))
    AS merge_ok
FROM g
"""

QUERIES["ivm_merge_audit"] = q_ivm_merge_audit
_RAW_ORACLES["ivm_merge_audit"] = SQL_IVM_MERGE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_mase_eval(spark, sf_dir):
    """Forecast backtest per entity: MAE of the naive lag-1 forecast,
    MAE of the lag-7 'seasonal' forecast, and MASE = seasonal/naive
    (Hyndman & Koehler 2006 — the scale-free forecast-accuracy metric;
    values below 1 mean the weekly-period model beats persistence).
    Exact integer |error| sums on ONE entity-keyed exchange; two
    divisions + one ratio at the end."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts"),
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    w = Window.partitionBy("entity_id").orderBy("ts")
    d = ev.select(
        "entity_id",
        F.abs(F.col("__c") - F.lag("__c", 1).over(w)).alias("__e1"),
        F.abs(F.col("__c") - F.lag("__c", 7).over(w)).alias("__e7"),
    )
    g = d.groupBy("entity_id").agg(
        F.count("__e1").cast("long").alias("n_naive"),
        F.sum("__e1").cast("long").alias("__s1"),
        F.count("__e7").cast("long").alias("n_seasonal"),
        F.sum("__e7").cast("long").alias("__s7"),
    ).filter(F.col("n_seasonal") > 0)
    mae1 = F.col("__s1").cast("double") / F.col("n_naive").cast("double")
    mae7 = (
        F.col("__s7").cast("double") / F.col("n_seasonal").cast("double")
    )
    return g.select(
        "entity_id", "n_naive", "n_seasonal",
        _r6(mae1 / F.lit(100.0)).alias("mae_naive"),
        _r6(mae7 / F.lit(100.0)).alias("mae_lag7"),
        _r6(mae7 / mae1).alias("mase_lag7"),
    )


SQL_MASE_EVAL = """
WITH e AS (
  SELECT user_id, ts,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
), d AS (
  SELECT user_id,
    abs(c - lag(c, 1) OVER w) AS e1,
    abs(c - lag(c, 7) OVER w) AS e7
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT user_id,
    CAST(count(e1) AS BIGINT) AS n_naive,
    CAST(sum(e1) AS BIGINT) AS s1,
    CAST(count(e7) AS BIGINT) AS n_seasonal,
    CAST(sum(e7) AS BIGINT) AS s7
  FROM d GROUP BY user_id
)
SELECT user_id AS entity_id, n_naive, n_seasonal,
  round(CAST(s1 AS DOUBLE) / CAST(n_naive AS DOUBLE) / 100.0, 6)
    AS mae_naive,
  round(CAST(s7 AS DOUBLE) / CAST(n_seasonal AS DOUBLE) / 100.0, 6)
    AS mae_lag7,
  round((CAST(s7 AS DOUBLE) / CAST(n_seasonal AS DOUBLE))
        / (CAST(s1 AS DOUBLE) / CAST(n_naive AS DOUBLE)), 6)
    AS mase_lag7
FROM g WHERE n_seasonal > 0
"""

QUERIES["mase_eval"] = q_mase_eval
_RAW_ORACLES["mase_eval"] = SQL_MASE_EVAL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_simpson_audit(spark, sf_dir):
    """Simpson's-paradox audit over lineitem: the discounted→returned
    association P(R|disc) - P(R|full), pooled vs within each
    linestatus stratum, with the per-stratum sign-flip flag — the
    pooled-vs-stratified sanity check every observational metric read
    needs. All cells exact longs; every probability ONE division."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("stratum"),
        (F.col("l_discount") >= 0.05).alias("__x"),
        (F.col("l_returnflag") == "R").alias("__y"),
    )
    cells = [
        F.sum(F.when(F.col("__x") & F.col("__y"), 1).otherwise(0))
        .cast("long").alias("__xy"),
        F.sum(F.when(F.col("__x") & ~F.col("__y"), 1).otherwise(0))
        .cast("long").alias("__xn"),
        F.sum(F.when(~F.col("__x") & F.col("__y"), 1).otherwise(0))
        .cast("long").alias("__ny"),
        F.sum(F.when(~F.col("__x") & ~F.col("__y"), 1).otherwise(0))
        .cast("long").alias("__nn"),
    ]
    g = li.groupBy("stratum").agg(*cells)
    pooled = li.agg(*cells)

    def diff(pre=""):
        px = F.col(f"{pre}__xy").cast("double") / (
            F.col(f"{pre}__xy") + F.col(f"{pre}__xn")
        ).cast("double")
        pn = F.col(f"{pre}__ny").cast("double") / (
            F.col(f"{pre}__ny") + F.col(f"{pre}__nn")
        ).cast("double")
        return px, pn, px - pn

    px, pn, d = diff()
    pooled = pooled.select(
        F.col("__xy").alias("p__xy"), F.col("__xn").alias("p__xn"),
        F.col("__ny").alias("p__ny"), F.col("__nn").alias("p__nn"),
    )
    j = g.crossJoin(F.broadcast(pooled))
    ppx = F.col("p__xy").cast("double") / (
        F.col("p__xy") + F.col("p__xn")
    ).cast("double")
    ppn = F.col("p__ny").cast("double") / (
        F.col("p__ny") + F.col("p__nn")
    ).cast("double")
    pd = ppx - ppn
    return j.select(
        "stratum",
        (F.col("__xy") + F.col("__xn") + F.col("__ny") + F.col("__nn"))
        .cast("long").alias("n"),
        _r6(px).alias("p_ret_disc"),
        _r6(pn).alias("p_ret_full"),
        _r6(d).alias("diff"),
        _r6(pd).alias("pooled_diff"),
        (F.signum(d) != F.signum(pd)).alias("sign_flipped"),
    )


SQL_SIMPSON_AUDIT = """
WITH li AS (
  SELECT l_linestatus AS stratum,
    l_discount >= 0.05 AS x, l_returnflag = 'R' AS y
  FROM lineitem
), g AS (
  SELECT stratum,
    CAST(sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS xy,
    CAST(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS xn,
    CAST(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS ny,
    CAST(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
      AS nn
  FROM li GROUP BY stratum
), p AS (
  SELECT CAST(sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS xy,
    CAST(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS xn,
    CAST(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS ny,
    CAST(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
      AS nn
  FROM li
)
SELECT g.stratum,
  CAST(g.xy + g.xn + g.ny + g.nn AS BIGINT) AS n,
  round(CAST(g.xy AS DOUBLE) / CAST(g.xy + g.xn AS DOUBLE), 6)
    AS p_ret_disc,
  round(CAST(g.ny AS DOUBLE) / CAST(g.ny + g.nn AS DOUBLE), 6)
    AS p_ret_full,
  round(CAST(g.xy AS DOUBLE) / CAST(g.xy + g.xn AS DOUBLE)
        - CAST(g.ny AS DOUBLE) / CAST(g.ny + g.nn AS DOUBLE), 6)
    AS diff,
  round(CAST(p.xy AS DOUBLE) / CAST(p.xy + p.xn AS DOUBLE)
        - CAST(p.ny AS DOUBLE) / CAST(p.ny + p.nn AS DOUBLE), 6)
    AS pooled_diff,
  sign(CAST(g.xy AS DOUBLE) / CAST(g.xy + g.xn AS DOUBLE)
       - CAST(g.ny AS DOUBLE) / CAST(g.ny + g.nn AS DOUBLE))
    <> sign(CAST(p.xy AS DOUBLE) / CAST(p.xy + p.xn AS DOUBLE)
            - CAST(p.ny AS DOUBLE) / CAST(p.ny + p.nn AS DOUBLE))
    AS sign_flipped
FROM g, p
"""

QUERIES["simpson_audit"] = q_simpson_audit
_RAW_ORACLES["simpson_audit"] = SQL_SIMPSON_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_pagerank_iter(spark, sf_dir):
    """Five synchronous PageRank sweeps over the co-order part graph
    (operators/graph.py pagerank, Brin & Page 1998): per-iteration
    rank-to-adjacency equi-join + source-sorted contribution fold so
    the float sum order is pinned; adjacency persisted once; the
    oracle unrolls the identical five iterations as CTEs."""
    from mpds_spark.operators.graph import co_occurrence_edges, pagerank

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 8 == 0
    )
    edges = co_occurrence_edges(
        li, basket="l_orderkey", item="l_partkey"
    )
    out = pagerank(edges, damping=0.85, n_iter=5)
    return out.select(
        F.col("node").alias("part_id"),
        "degree",
        _r6("pr").alias("pr"),
    )


def _pagerank_sql() -> str:
    head = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey % 8 = 0 AND b.l_partkey % 8 = 0
), sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (
  SELECT src AS node, 1.0::DOUBLE / CAST((SELECT n FROM nn) AS DOUBLE)
    AS pr
  FROM deg
)"""
    om = repr(1.0 - 0.85)  # Spark computes F.lit(1.0 - d): embed the
    # IDENTICAL double (0.15000000000000002), not the 0.15 literal
    step = """, r{k} AS (
  SELECT sym.dst AS node,
    {om}::DOUBLE / CAST((SELECT n FROM nn) AS DOUBLE)
    + 0.85::DOUBLE
      * list_sum(list(r{p}.pr / CAST(deg.deg AS DOUBLE)
                      ORDER BY sym.src)) AS pr
  FROM sym JOIN deg ON sym.src = deg.src
           JOIN r{p} ON r{p}.node = sym.src
  GROUP BY sym.dst
)"""
    tail = """
SELECT r5.node AS part_id, deg.deg AS degree, round(r5.pr, 6) AS pr
FROM r5 JOIN deg ON deg.src = r5.node
"""
    return head + "".join(
        step.format(k=i, p=i - 1, om=om) for i in range(1, 6)
    ) + tail


SQL_PAGERANK_ITER = _pagerank_sql()

QUERIES["pagerank_iter"] = q_pagerank_iter
_RAW_ORACLES["pagerank_iter"] = SQL_PAGERANK_ITER
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_knn_eval(spark, sf_dir):
    """Leave-one-out 1-NN label accuracy over the embedding table — the
    standard intrinsic embedding-quality eval (does the space cluster
    by label?): exact cosine argmax per held-out vector against the
    FULL corpus (operators/similarity.py cosine_topk, the documented
    brute-force baseline with ties broken by neighbor id), per-label
    accuracy from exact counts. The query side is a deterministic
    1-in-4 id sample — the standard sampled-eval shape that keeps the
    quadratic Q x N scorer budget-bounded; the at-scale path swaps the
    exact scorer for the LSH/IVF variants beside it."""
    from mpds_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    nn1 = cosine_topk(emb, emb.filter(F.col("vec_id") % 4 == 0), k=1)
    lab = emb.select("vec_id", "label")
    j = (
        nn1.join(
            F.broadcast(lab.select(F.col("vec_id").alias("query_id"),
                                   F.col("label").alias("__ql"))),
            "query_id",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("neighbor_id"),
                                   F.col("label").alias("__nl"))),
            "neighbor_id",
        )
    )
    g = j.groupBy(F.col("__ql").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__ql") == F.col("__nl"), 1).otherwise(0))
        .cast("long").alias("n_correct"),
    )
    return g.select(
        "label", "n", "n_correct",
        _r6(
            F.col("n_correct").cast("double") / F.col("n").cast("double")
        ).alias("accuracy"),
    )


SQL_KNN_EVAL = """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), s AS (
  SELECT a.vec_id AS q, a.label AS ql, b.label AS nl,
    list_dot_product(a.e, b.e) / sqrt(list_dot_product(a.e, a.e))
      / sqrt(list_dot_product(b.e, b.e)) AS cos,
    b.vec_id AS nid
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
  WHERE a.vec_id % 4 = 0
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY q ORDER BY cos DESC, nid) AS rn
  FROM s
)
SELECT ql AS label, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN ql = nl THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  round(CAST(sum(CASE WHEN ql = nl THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM r WHERE rn = 1
GROUP BY ql
"""

QUERIES["knn_eval"] = q_knn_eval
_RAW_ORACLES["knn_eval"] = SQL_KNN_EVAL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_window_funnel(spark, sf_dir):
    """ClickHouse-style strict-order funnel depth per user
    (operators/funnels.py window_funnel): deepest view->click->purchase
    chain with every step within 48h of the chain start, computed by an
    all-integer latest-start fold — the gate needs no rounding at all."""
    from mpds_spark.operators.funnels import window_funnel

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "event_type"
    )
    return window_funnel(
        ev, chain=("view", "click", "purchase"),
        window_us=48 * 3600 * 1000000,
    )


SQL_WINDOW_FUNNEL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
         WHEN 'purchase' THEN 3 ELSE 0 END AS c
  FROM events
), g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
    list_reduce(
      list_prepend([-1, -1, -1]::BIGINT[],
                   list([t, c, 0]::BIGINT[] ORDER BY t)),
      (acc, x) -> [
        CASE WHEN x[2] = 1 THEN greatest(acc[1], x[1]) ELSE acc[1] END,
        CASE WHEN x[2] = 2 AND acc[1] >= 0
                  AND x[1] - acc[1] <= 172800000000
             THEN greatest(acc[2], acc[1]) ELSE acc[2] END,
        CASE WHEN x[2] = 3 AND acc[2] >= 0
                  AND x[1] - acc[2] <= 172800000000
             THEN greatest(acc[3], acc[2]) ELSE acc[3] END]) AS s
  FROM e GROUP BY user_id
)
SELECT user_id AS entity_id, n_events,
  CAST(CASE WHEN s[3] >= 0 THEN 3 WHEN s[2] >= 0 THEN 2
            WHEN s[1] >= 0 THEN 1 ELSE 0 END AS BIGINT)
    AS funnel_depth
FROM g
"""

QUERIES["window_funnel"] = q_window_funnel
_RAW_ORACLES["window_funnel"] = SQL_WINDOW_FUNNEL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_burst_detect(spark, sf_dir):
    """Hysteresis burst segmentation per user (operators/windows.py
    burst_detect): bursts open at gaps <= 2h and close only at gaps
    >= 10h — the Schmitt-trigger rule single-threshold segmentation
    can't express; three-integer state fold, one final pct division."""
    from mpds_spark.operators.windows import burst_detect

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    out = burst_detect(
        ev, t_on_us=2 * 3600 * 1000000, t_off_us=10 * 3600 * 1000000
    )
    return out.select(
        "entity_id", "n_events", "n_bursts", "events_in_burst",
        _r6("burst_pct").alias("burst_pct"),
    )


SQL_BURST_DETECT = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
), d AS (
  SELECT user_id, t,
    t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
  FROM e
), g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
    list_reduce(
      list_prepend([0, 0, 0]::BIGINT[],
                   list([gap, 0, 0]::BIGINT[] ORDER BY t)
                     FILTER (WHERE gap IS NOT NULL)),
      (acc, x) -> CASE
        WHEN acc[1] = 0 AND x[1] <= 7200000000
          THEN [1, acc[2] + 1, acc[3] + 2]::BIGINT[]
        WHEN acc[1] = 1 AND x[1] < 36000000000
          THEN [1, acc[2], acc[3] + 1]::BIGINT[]
        WHEN acc[1] = 1 THEN [0, acc[2], acc[3]]::BIGINT[]
        ELSE acc END) AS s
  FROM d GROUP BY user_id
)
SELECT user_id AS entity_id, n_events,
  s[2] AS n_bursts, s[3] AS events_in_burst,
  round(100.0 * CAST(s[3] AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
    AS burst_pct
FROM g
"""

QUERIES["burst_detect"] = q_burst_detect
_RAW_ORACLES["burst_detect"] = SQL_BURST_DETECT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_quant_recall(spark, sf_dir):
    """INT8 quantization recall@10 per sampled query
    (operators/similarity.py quantized_recall): exact integer-dot
    ranking of round(127*x/||x||) codes vs the exact float cosine
    top-10; deterministic corpus halving + 1-in-16 query sample bound the two
    registered brute legs."""
    from mpds_spark.operators.similarity import quantized_recall

    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 2 == 0
    )
    out = quantized_recall(
        emb, emb.filter(F.col("vec_id") % 16 == 0), k=10
    )
    return out.select(
        "query_id", "n_overlap", _r6("recall").alias("recall")
    )


SQL_QUANT_RECALL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      AS n
  FROM embeddings WHERE vec_id % 2 = 0
), q8 AS (
  SELECT vec_id,
    list_transform(e, x -> CAST(floor(abs(127.0::DOUBLE * x / n)
        + 0.5) * sign(x) AS BIGINT)) AS q,
    e
  FROM v
), ex AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    row_number() OVER (PARTITION BY a.vec_id ORDER BY
      list_dot_product(a.e, b.e)
        / sqrt(list_dot_product(a.e, a.e))
        / sqrt(list_dot_product(b.e, b.e)) DESC, b.vec_id) AS rn
  FROM q8 a JOIN q8 b ON a.vec_id <> b.vec_id
  WHERE a.vec_id % 16 = 0
), qt AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    row_number() OVER (PARTITION BY a.vec_id ORDER BY
      CAST(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[]) AS BIGINT)
        DESC, b.vec_id) AS rn
  FROM q8 a JOIN q8 b ON a.vec_id <> b.vec_id
  WHERE a.vec_id % 16 = 0
), ov AS (
  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM (SELECT query_id, neighbor_id FROM ex WHERE rn <= 10) e
  JOIN (SELECT query_id, neighbor_id FROM qt WHERE rn <= 10) t
    ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
  GROUP BY e.query_id
), base AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS k
  FROM ex WHERE rn <= 10 GROUP BY query_id
)
SELECT base.query_id,
  coalesce(ov.n_overlap, 0) AS n_overlap,
  round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        / CAST(base.k AS DOUBLE), 6) AS recall
FROM base LEFT JOIN ov ON base.query_id = ov.query_id
"""

QUERIES["quant_recall"] = q_quant_recall
_RAW_ORACLES["quant_recall"] = SQL_QUANT_RECALL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_consistent_hash_audit(spark, sf_dir):
    """Consistent-hash ring resize audit over customer keys
    (operators/validate.py consistent_hash_audit, Karger et al. 1997):
    8 nodes x 16 vnodes -> add one node; per-node before/after
    membership + gained/lost — the moved share must concentrate on the
    new node's arcs. All exact longs; rings are 1-row sorted-array
    broadcasts (registered)."""
    from mpds_spark.operators.validate import consistent_hash_audit

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    return consistent_hash_audit(cust, key="key", n_nodes=8,
                                 n_virtual=16)


SQL_CONSISTENT_HASH = """
WITH vn AS (
  SELECT ('0x' || substring(md5('node' || CAST(i AS VARCHAR) || '|v'
          || CAST(j AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h,
         'node' || CAST(i AS VARCHAR) AS node, i
  FROM (SELECT unnest(generate_series(0, 8)) AS i),
       (SELECT unnest(generate_series(0, 15)) AS j)
), keys AS (
  SELECT ('0x' || substring(md5('key|' || CAST(c_custkey AS VARCHAR)),
          1, 15))::UBIGINT::BIGINT AS hk
  FROM customer
), a AS (
  SELECT hk,
    coalesce(
      (SELECT min_by(node, h) FROM vn WHERE i < 8 AND h >= keys.hk),
      (SELECT min_by(node, h) FROM vn WHERE i < 8)) AS before,
    coalesce(
      (SELECT min_by(node, h) FROM vn WHERE h >= keys.hk),
      (SELECT min_by(node, h) FROM vn)) AS after
  FROM keys
), nodes AS (
  SELECT DISTINCT before AS node FROM a
  UNION SELECT DISTINCT after FROM a
)
SELECT nodes.node,
  coalesce(b.n_before, 0) AS n_before,
  coalesce(f.n_after, 0) AS n_after,
  coalesce(f.n_gained, 0) AS n_gained,
  coalesce(b.n_lost, 0) AS n_lost
FROM nodes
LEFT JOIN (
  SELECT before AS node, CAST(count(*) AS BIGINT) AS n_before,
    CAST(sum(CASE WHEN after <> before THEN 1 ELSE 0 END) AS BIGINT)
      AS n_lost
  FROM a GROUP BY before) b ON nodes.node = b.node
LEFT JOIN (
  SELECT after AS node, CAST(count(*) AS BIGINT) AS n_after,
    CAST(sum(CASE WHEN after <> before THEN 1 ELSE 0 END) AS BIGINT)
      AS n_gained
  FROM a GROUP BY after) f ON nodes.node = f.node
"""

QUERIES["consistent_hash_audit"] = q_consistent_hash_audit
_RAW_ORACLES["consistent_hash_audit"] = SQL_CONSISTENT_HASH
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_label_propagation(spark, sf_dir):
    """Deterministic synchronous LPA communities over the co-order part
    graph (operators/graph.py label_propagation, Raghavan et al. 2007
    with the randomized tie-break replaced by smallest-label): four
    sweeps, each ONE join + two hash aggs; the oracle unrolls the same
    four rounds with QUALIFY row_number argmax."""
    from mpds_spark.operators.graph import (
        co_occurrence_edges,
        label_propagation,
    )

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 8 == 0
    )
    edges = co_occurrence_edges(
        li, basket="l_orderkey", item="l_partkey"
    )
    out = label_propagation(edges, n_rounds=4)
    return out.select(F.col("node").alias("part_id"), "community")


def _lpa_sql() -> str:
    head = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey % 8 = 0 AND b.l_partkey % 8 = 0
), sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e
), l0 AS (
  SELECT DISTINCT src AS node, src AS community FROM sym
)"""
    step = """, l{k} AS (
  SELECT dst AS node, community
  FROM (
    SELECT sym.dst, l{p}.community, count(*) AS c
    FROM sym JOIN l{p} ON l{p}.node = sym.src
    GROUP BY sym.dst, l{p}.community
  )
  QUALIFY row_number() OVER (
    PARTITION BY dst ORDER BY c DESC, community) = 1
)"""
    tail = """
SELECT node AS part_id, CAST(community AS BIGINT) AS community FROM l4
"""
    return head + "".join(
        step.format(k=i, p=i - 1) for i in range(1, 5)
    ) + tail


SQL_LABEL_PROPAGATION = _lpa_sql()

QUERIES["label_propagation"] = q_label_propagation
_RAW_ORACLES["label_propagation"] = SQL_LABEL_PROPAGATION
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch guardrail (the first check every A/B
    readout runs): md5-parity 50/50 user assignment, exact arm counts,
    1-dof chi-square (o_a - o_b)^2 / n vs the 3.841 critical value.
    One agg over the distinct-user frame; everything exact until one
    division."""
    ev = _events(spark, sf_dir).select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm|"),
                               F.col("user_id").cast("string"))), 1, 1
            ), 16, 10
        ).cast("long") % 2
    )
    g = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(arm).cast("long").alias("n_b"),
    )
    chi2 = (
        ((F.col("n") - 2 * F.col("n_b"))
         * (F.col("n") - 2 * F.col("n_b"))).cast("double")
        / F.col("n").cast("double")
    )
    return g.select(
        "n",
        (F.col("n") - F.col("n_b")).cast("long").alias("n_a"),
        "n_b",
        _r6(chi2).alias("chi2"),
        (chi2 > F.lit(3.841)).alias("srm_flag"),
    )


SQL_SRM_CHECK = """
WITH u AS (SELECT DISTINCT user_id FROM events),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(('0x' || substring(md5('srm|' ||
        CAST(user_id AS VARCHAR)), 1, 1))::UBIGINT % 2) AS BIGINT)
      AS n_b
  FROM u
)
SELECT n, CAST(n - n_b AS BIGINT) AS n_a, n_b,
  round(CAST((n - 2*n_b) * (n - 2*n_b) AS DOUBLE)
        / CAST(n AS DOUBLE), 6) AS chi2,
  CAST((n - 2*n_b) * (n - 2*n_b) AS DOUBLE) / CAST(n AS DOUBLE)
    > 3.841 AS srm_flag
FROM g
"""

QUERIES["srm_check"] = q_srm_check
_RAW_ORACLES["srm_check"] = SQL_SRM_CHECK
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset over embeddings (operators/similarity.py
    kcenter_coreset, Gonzalez 1985 / Sener & Savarese 2018): 8 maximally
    diverse exemplars by farthest-point traversal with id tie-breaks;
    bounded driver rounds (the sanctioned fit idiom); the oracle unrolls
    the same greedy rounds as CTEs."""
    from mpds_spark.operators.similarity import kcenter_coreset

    emb = load(spark, sf_dir, "embeddings")
    out = kcenter_coreset(emb, k=8)
    return out.select(
        "round", "vec_id", _r6("dist_to_chosen").alias("dist_to_chosen")
    )


def _kcenter_sql(k: int = 8) -> str:
    head = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      AS n
  FROM embeddings
), sel0 AS (
  SELECT 0 AS round, min(vec_id) AS vec_id,
         CAST(NULL AS DOUBLE) AS d
  FROM v
)"""
    step = """, p{r} AS (
  SELECT {r} AS round, vec_id, d FROM (
    SELECT a.vec_id,
      min(1.0 - list_dot_product(a.e, c.e) / a.n / c.n) AS d
    FROM v a, v c
    WHERE c.vec_id IN (SELECT vec_id FROM sel{p})
      AND a.vec_id NOT IN (SELECT vec_id FROM sel{p})
    GROUP BY a.vec_id
  ) QUALIFY row_number() OVER (ORDER BY d DESC, vec_id) = 1
), sel{r} AS (
  SELECT * FROM sel{p} UNION ALL SELECT * FROM p{r}
)"""
    tail = f"""
SELECT CAST(round AS BIGINT) AS round, vec_id,
  round(d, 6) AS dist_to_chosen
FROM sel{k - 1}
"""
    return head + "".join(
        step.format(r=i, p=i - 1) for i in range(1, k)
    ) + tail


SQL_KCENTER_CORESET = _kcenter_sql(8)

QUERIES["kcenter_coreset"] = q_kcenter_coreset
_RAW_ORACLES["kcenter_coreset"] = SQL_KCENTER_CORESET
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_trimmed_mean(spark, sf_dir):
    """10%-trimmed vs raw mean order value per priority — the robust
    location estimate beside the exact grouped quantiles: rank by
    (cents, orderkey) per group, drop floor(n/10) from each tail,
    exact integer sums, one division each."""
    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        (
            F.signum("o_totalprice")
            * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    w = Window.partitionBy("priority").orderBy("__c", "o_orderkey")
    wn = Window.partitionBy("priority")
    d = od.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    cut = F.floor(F.col("__n") / 10).cast("long")
    kept = (F.col("__rn") > cut) & (F.col("__rn") <= F.col("__n") - cut)
    g = d.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__c").cast("long").alias("__s_all"),
        F.sum(F.when(kept, F.col("__c")).otherwise(0)).cast("long")
        .alias("__s_kept"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
    )
    return g.select(
        "priority", "n", "n_kept",
        _r6(
            F.col("__s_all").cast("double")
            / F.col("n").cast("double") / F.lit(100.0)
        ).alias("mean_raw"),
        _r6(
            F.col("__s_kept").cast("double")
            / F.col("n_kept").cast("double") / F.lit(100.0)
        ).alias("mean_trimmed"),
    )


SQL_TRIMMED_MEAN = """
WITH o AS (
  SELECT o_orderpriority AS priority, o_orderkey,
    CAST(floor(abs(o_totalprice)*100 + 0.5)*sign(o_totalprice)
         AS BIGINT) AS c
  FROM orders
), d AS (
  SELECT priority, c,
    row_number() OVER (PARTITION BY priority ORDER BY c, o_orderkey)
      AS rn,
    count(*) OVER (PARTITION BY priority) AS n
  FROM o
), g AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS s_all,
    CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
             THEN c ELSE 0 END) AS BIGINT) AS s_kept,
    CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
  FROM d GROUP BY priority
)
SELECT priority, n, n_kept,
  round(CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
    AS mean_raw,
  round(CAST(s_kept AS DOUBLE) / CAST(n_kept AS DOUBLE) / 100.0, 6)
    AS mean_trimmed
FROM g
"""

QUERIES["trimmed_mean"] = q_trimmed_mean
_RAW_ORACLES["trimmed_mean"] = SQL_TRIMMED_MEAN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_source_digest(spark, sf_dir):
    """Per-source content digest — the reproducibility audit a staged
    pipeline runs to prove a rewrite/resume produced byte-identical
    data: md5 row hashes over canonicalized fields, then one md5 over
    the row-hash-sorted concatenation per source. Order-insensitive by
    construction (the sort pins it), partition-count-invariant. At
    10^12 rows the concat becomes a Merkle tree over per-partition
    digests; the per-source array is the catalog-scale shape."""
    docs = load(spark, sf_dir, "documents")
    rh = docs.select(
        "source",
        F.md5(
            F.concat_ws(
                "\x1f",
                F.col("doc_id").cast("string"),
                F.col("text"),
                F.col("lang"),
                F.col("n_chars").cast("string"),
            )
        ).alias("__h"),
    )
    return rh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("__h")), "")
        ).alias("digest"),
    )


SQL_SOURCE_DIGEST = """
WITH rh AS (
  SELECT source,
    md5(CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31)
        || lang || chr(31) || CAST(n_chars AS VARCHAR)) AS h
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
  md5(string_agg(h, '' ORDER BY h)) AS digest
FROM rh GROUP BY source
"""

QUERIES["source_digest"] = q_source_digest
_RAW_ORACLES["source_digest"] = SQL_SOURCE_DIGEST
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_lpt_partition_plan(spark, sf_dir):
    """Skew-aware partition planning via Graham's LPT greedy (1969,
    4/3-approximation): assign per-user row counts, LARGEST FIRST, to
    the least-loaded of 4 target partitions (ties to the lowest slot) —
    the planner behind salting decisions: the output's makespan ratio
    says whether key-hash assignment needs rebalancing. Entirely
    integer: counts exact, the fold carries 4 long loads, the only
    float is the final load-share division."""
    ev = _events(spark, sf_dir).select("user_id")
    cnt = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    g = cnt.agg(
        F.expr(
            # fold (count desc, user asc): sort by (-count, user)
            "aggregate(array_sort(collect_list("
            "struct(-__c as nc, user_id as u, __c as c))), "
            "array(0L, 0L, 0L, 0L), (acc, x) -> CASE "
            "WHEN acc[0] <= acc[1] AND acc[0] <= acc[2] "
            "AND acc[0] <= acc[3] "
            "THEN array(acc[0] + x.c, acc[1], acc[2], acc[3]) "
            "WHEN acc[1] <= acc[2] AND acc[1] <= acc[3] "
            "THEN array(acc[0], acc[1] + x.c, acc[2], acc[3]) "
            "WHEN acc[2] <= acc[3] "
            "THEN array(acc[0], acc[1], acc[2] + x.c, acc[3]) "
            "ELSE array(acc[0], acc[1], acc[2], acc[3] + x.c) END)"
        ).alias("__l"),
        F.sum("__c").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__nk"),
    )
    e = g.select(
        "__total", "__nk",
        F.posexplode("__l").alias("partition", "load"),
    )
    return e.select(
        F.col("partition").cast("long").alias("partition"),
        F.col("load").cast("long").alias("load"),
        F.col("__nk").alias("n_keys_total"),
        _r6(
            F.col("load").cast("double")
            / (F.col("__total").cast("double") / F.lit(4.0))
        ).alias("balance_ratio"),
    )


SQL_LPT_PLAN = """
WITH cnt AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
), g AS (
  SELECT
    list_reduce(
      list_prepend([0, 0, 0, 0]::BIGINT[],
        list([c, 0, 0, 0]::BIGINT[] ORDER BY c DESC, user_id)),
      (acc, x) -> CASE
        WHEN acc[1] <= acc[2] AND acc[1] <= acc[3] AND acc[1] <= acc[4]
          THEN [acc[1] + x[1], acc[2], acc[3], acc[4]]::BIGINT[]
        WHEN acc[2] <= acc[3] AND acc[2] <= acc[4]
          THEN [acc[1], acc[2] + x[1], acc[3], acc[4]]::BIGINT[]
        WHEN acc[3] <= acc[4]
          THEN [acc[1], acc[2], acc[3] + x[1], acc[4]]::BIGINT[]
        ELSE [acc[1], acc[2], acc[3], acc[4] + x[1]]::BIGINT[]
        END) AS l,
    CAST(sum(c) AS BIGINT) AS total,
    CAST(count(*) AS BIGINT) AS nk
  FROM cnt
)
SELECT CAST(i - 1 AS BIGINT) AS partition,
  l[i] AS load, nk AS n_keys_total,
  round(CAST(l[i] AS DOUBLE) / (CAST(total AS DOUBLE) / 4.0), 6)
    AS balance_ratio
FROM g, (SELECT unnest(generate_series(1, 4)) AS i)
"""

QUERIES["lpt_partition_plan"] = q_lpt_partition_plan
_RAW_ORACLES["lpt_partition_plan"] = SQL_LPT_PLAN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rate_shrinkage(spark, sf_dir):
    """Smoothed purchase-rate league table: per-user purchase share
    shrunk toward the pooled rate with prior strength m=20
    (additive/Dirichlet smoothing — the small-n ranking fix: a 2/2
    user must NOT out-rank a 95/100 one). Exact integer counts; the
    pooled rate is a registered 1-row broadcast; raw and shrunk rates
    are one division each."""
    ev = _events(spark, sf_dir).select(
        "user_id", (F.col("event_type") == "purchase").alias("__p")
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__p"), 1).otherwise(0)).cast("long")
        .alias("k"),
    )
    tot = u.agg(
        F.sum("n").cast("long").alias("__tn"),
        F.sum("k").cast("long").alias("__tk"),
    )
    j = u.crossJoin(F.broadcast(tot))
    p0 = F.col("__tk").cast("double") / F.col("__tn").cast("double")
    shrunk = (
        (F.col("k").cast("double") + F.lit(20.0) * p0)
        / (F.col("n").cast("double") + F.lit(20.0))
    )
    return j.select(
        "user_id", "n", "k",
        _r6(F.col("k").cast("double") / F.col("n").cast("double"))
        .alias("rate_raw"),
        _r6(shrunk).alias("rate_shrunk"),
    )


SQL_RATE_SHRINKAGE = """
WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS k
  FROM events GROUP BY user_id
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(k) AS BIGINT) AS tk
  FROM u
)
SELECT user_id, n, k,
  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
  round((CAST(k AS DOUBLE)
         + 20.0 * (CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE)))
        / (CAST(n AS DOUBLE) + 20.0), 6) AS rate_shrunk
FROM u, t
"""

QUERIES["rate_shrinkage"] = q_rate_shrinkage
_RAW_ORACLES["rate_shrinkage"] = SQL_RATE_SHRINKAGE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_merkle_diff(spark, sf_dir):
    """Block-level Merkle diff between two snapshots — the incremental
    sync/verify primitive (rsync, snapshot deep-clone verification):
    rows bucket into doc_id-range blocks of 64, each side digests each
    block (md5 over row-hash-sorted concat), and ONLY differing blocks
    surface. v2 is a deterministic in-query simulation of drift:
    doc_id % 97 == 0 rows edited, doc_id % 101 == 0 rows deleted —
    self-contained, no second table needed. At 10^12 rows the block
    digests ARE the Merkle leaves: comparing snapshots touches
    O(changed blocks), not O(rows)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    v2 = docs.filter(F.col("doc_id") % 101 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit("!"))
        ).otherwise(F.col("text")).alias("text"),
        "lang", "n_chars",
    )

    def blocks(df, side):
        rh = df.select(
            (F.col("doc_id") / 64).cast("long").alias("block"),
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col("doc_id").cast("string"), "text", "lang",
                    F.col("n_chars").cast("string"),
                )
            ).alias("__h"),
        )
        return rh.groupBy("block").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{side}"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("__h")), "")
            ).alias(f"d_{side}"),
        )

    j = blocks(docs, "v1").join(blocks(v2, "v2"), "block", "full")
    changed = j.filter(
        F.col("d_v1").isNull() | F.col("d_v2").isNull()
        | (F.col("d_v1") != F.col("d_v2"))
    )
    z = F.lit(0).cast("long")
    return changed.select(
        "block",
        F.coalesce("n_v1", z).alias("n_v1"),
        F.coalesce("n_v2", z).alias("n_v2"),
    )


SQL_MERKLE_DIFF = """
WITH v1 AS (
  SELECT doc_id, text, lang, n_chars FROM documents
), v2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN text || '!' ELSE text END AS text,
    lang, n_chars
  FROM documents WHERE doc_id % 101 <> 0
), b1 AS (
  SELECT doc_id // 64 AS block, CAST(count(*) AS BIGINT) AS n_v1,
    md5(string_agg(h, '' ORDER BY h)) AS d_v1
  FROM (SELECT doc_id,
          md5(CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31)
              || lang || chr(31) || CAST(n_chars AS VARCHAR)) AS h
        FROM v1)
  GROUP BY doc_id // 64
), b2 AS (
  SELECT doc_id // 64 AS block, CAST(count(*) AS BIGINT) AS n_v2,
    md5(string_agg(h, '' ORDER BY h)) AS d_v2
  FROM (SELECT doc_id,
          md5(CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31)
              || lang || chr(31) || CAST(n_chars AS VARCHAR)) AS h
        FROM v2)
  GROUP BY doc_id // 64
)
SELECT coalesce(b1.block, b2.block) AS block,
  coalesce(n_v1, 0) AS n_v1, coalesce(n_v2, 0) AS n_v2
FROM b1 FULL OUTER JOIN b2 ON b1.block = b2.block
WHERE d_v1 IS NULL OR d_v2 IS NULL OR d_v1 <> d_v2
"""

QUERIES["merkle_diff"] = q_merkle_diff
_RAW_ORACLES["merkle_diff"] = SQL_MERKLE_DIFF
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_jackknife_ratio(spark, sf_dir):
    """Delete-a-group jackknife standard error (Efron 1982; Kott 2001
    for the grouped variant) of the average order value — the
    resampling-free CI machinery for RATIO statistics, where naive
    per-row variance is simply wrong: G=20 md5-hash groups, leave-out
    ratios r_g = (Sa - a_g)/(Sb - b_g) from exact integer group
    totals, SE = sqrt((G-1)/G * sum (r_g - rbar)^2) with both folds
    order-pinned over the group-sorted array."""
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            F.signum("o_totalprice")
            * F.floor(F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    grp = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("jk|"),
                               F.col("o_orderkey").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long") % 20
    )
    g = od.groupBy(grp.alias("__g")).agg(
        F.sum("__c").cast("long").alias("__a"),
        F.count(F.lit(1)).cast("long").alias("__b"),
    )
    agg = g.agg(
        F.sum("__a").cast("long").alias("__sa"),
        F.sum("__b").cast("long").alias("__sb"),
        F.count(F.lit(1)).cast("long").alias("__gn"),
        F.array_sort(
            F.collect_list(F.struct("__g", "__a", "__b"))
        ).alias("__arr"),
    )
    # leave-out ratios in group order, then two order-pinned folds
    rs = F.expr(
        "transform(__arr, x -> "
        "cast(__sa - x.__a as double) / cast(__sb - x.__b as double))"
    )
    agg = agg.withColumn("__rs", rs)
    rbar = F.expr(
        "aggregate(__rs, 0.0D, (acc, r) -> acc + r)"
    ) / F.col("__gn").cast("double")
    agg = agg.withColumn("__rbar", rbar)
    ss = F.expr(
        "aggregate(__rs, 0.0D, (acc, r) -> "
        "acc + (r - __rbar) * (r - __rbar))"
    )
    ratio = F.col("__sa").cast("double") / F.col("__sb").cast("double")
    se = F.sqrt(
        (F.col("__gn") - 1).cast("double")
        / F.col("__gn").cast("double") * ss
    )
    return agg.select(
        F.col("__gn").alias("n_groups"),
        F.col("__sb").alias("n_orders"),
        _r6(ratio / F.lit(100.0)).alias("avg_order_value"),
        _r6(se / F.lit(100.0)).alias("jackknife_se"),
    )


SQL_JACKKNIFE_RATIO = """
WITH o AS (
  SELECT o_orderkey,
    CAST(floor(abs(o_totalprice)*100 + 0.5)*sign(o_totalprice)
         AS BIGINT) AS c,
    CAST(('0x' || substring(md5('jk|' || CAST(o_orderkey AS VARCHAR)),
          1, 15))::UBIGINT % 20 AS BIGINT) AS g
  FROM orders
), gr AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS a, CAST(count(*) AS BIGINT) AS b
  FROM o GROUP BY g
), t AS (
  SELECT CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
    CAST(count(*) AS BIGINT) AS gn
  FROM gr
), rs AS (
  SELECT gn, sa, sb,
    list(CAST(sa - a AS DOUBLE) / CAST(sb - b AS DOUBLE) ORDER BY g)
      AS r
  FROM gr, t GROUP BY gn, sa, sb
), m AS (
  SELECT gn, sa, sb, r,
    list_sum(r) / CAST(gn AS DOUBLE) AS rbar
  FROM rs
)
SELECT gn AS n_groups, sb AS n_orders,
  round(CAST(sa AS DOUBLE) / CAST(sb AS DOUBLE) / 100.0, 6)
    AS avg_order_value,
  round(sqrt(CAST(gn - 1 AS DOUBLE) / CAST(gn AS DOUBLE)
        * list_sum(list_transform(r,
            x -> (x - rbar) * (x - rbar)))) / 100.0, 6)
    AS jackknife_se
FROM m
"""

QUERIES["jackknife_ratio"] = q_jackknife_ratio
_RAW_ORACLES["jackknife_ratio"] = SQL_JACKKNIFE_RATIO
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_rank_auc(spark, sf_dir):
    """ROC AUC + Mann-Whitney U from tie-corrected rank sums — the
    eval staple computed WITHOUT a global per-row sort: the classifier
    here is "does event value predict a purchase event". AUC is the
    rank-sum formula AUC = (R+ - n1(n1+1)/2)/(n1*n0) on DOUBLED
    average ranks (r2 = 2*cum_before + cnt + 1 over the distinct-value
    frame, the spearman_rank machinery), so every moment up to the two
    final divisions is an exact integer: U, the tie-corrected variance
    term sum(t^3 - t), and the normal-approximation z are all derived
    from one distinct-cents aggregate + one window over that tiny
    frame. Zero unordered float reductions anywhere — the gate is
    exact by construction, not by rounding luck."""
    ev = _events(spark, sf_dir).select(
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("__p"),
    )
    v = ev.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.sum("__p").cast("long").alias("__pc"),
    )
    w = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r2 = (
        2 * F.coalesce(F.sum("__cnt").over(w), F.lit(0).cast("long"))
        + F.col("__cnt") + 1
    )
    a = v.select(
        (F.col("__pc") * r2).alias("__pr2"),
        "__cnt", "__pc",
        (F.col("__cnt") * F.col("__cnt") * F.col("__cnt")
         - F.col("__cnt")).alias("__t3"),
    ).agg(
        F.sum("__pr2").cast("long").alias("__s2"),
        F.sum("__cnt").cast("long").alias("__n"),
        F.sum("__pc").cast("long").alias("__n1"),
        F.sum("__t3").cast("long").alias("__tt"),
    )
    n0 = F.col("__n") - F.col("__n1")
    u2 = F.col("__s2") - F.col("__n1") * (F.col("__n1") + 1)
    auc = u2.cast("double") / (2 * F.col("__n1") * n0).cast("double")
    varu = (
        (F.col("__n1") * n0).cast("double")
        * (
            (F.col("__n") + 1).cast("double")
            - F.col("__tt").cast("double")
            / (F.col("__n") * (F.col("__n") - 1)).cast("double")
        )
        / F.lit(12.0)
    )
    z = (
        (u2 - F.col("__n1") * n0).cast("double")
        / (F.lit(2.0) * F.sqrt(varu))
    )
    return a.select(
        F.col("__n1").alias("n_pos"),
        n0.alias("n_neg"),
        (u2.cast("double") / F.lit(2.0)).alias("mann_whitney_u"),
        _r6(auc).alias("auc"),
        _r6(z).alias("z_score"),
    )


SQL_RANK_AUC = """
WITH ev AS (
  SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
), v AS (
  SELECT c, CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(p) AS BIGINT) AS pc
  FROM ev GROUP BY c
), r AS (
  SELECT cnt, pc,
    2*coalesce(sum(cnt) OVER (ORDER BY c
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + cnt + 1 AS r2,
    cnt*cnt*cnt - cnt AS t3
  FROM v
), a AS (
  SELECT CAST(sum(pc * r2) AS BIGINT) AS s2,
    CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pc) AS BIGINT) AS n1,
    CAST(sum(t3) AS BIGINT) AS tt
  FROM r
)
SELECT n1 AS n_pos, n - n1 AS n_neg,
  CAST(s2 - n1*(n1+1) AS DOUBLE) / 2.0 AS mann_whitney_u,
  round(CAST(s2 - n1*(n1+1) AS DOUBLE)
        / CAST(2*n1*(n - n1) AS DOUBLE), 6) AS auc,
  round(CAST(s2 - n1*(n1+1) - n1*(n - n1) AS DOUBLE)
        / (2.0 * sqrt(CAST(n1*(n - n1) AS DOUBLE)
            * (CAST(n + 1 AS DOUBLE)
               - CAST(tt AS DOUBLE) / CAST(n*(n-1) AS DOUBLE))
            / 12.0)), 6) AS z_score
FROM a
"""

QUERIES["rank_auc"] = q_rank_auc
_RAW_ORACLES["rank_auc"] = SQL_RANK_AUC
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_knn_shapley(spark, sf_dir):
    """KNN-Shapley data valuation (Jia et al. VLDB 2019, Theorem 1 —
    operators/similarity.py knn_shapley): the exact Shapley value of
    each training embedding for a 5-NN label classifier over a
    deterministic held-out query set, the closed-form
    training-data-attribution primitive (2^N coalitions collapse to
    one sorted sweep per test point). Neighbor order is the EXACT
    INT8 integer dot product with id tie-breaks (cross-engine exact);
    the suffix-sum recursion runs as a rank-DESC running window inside
    the ONE query-keyed exchange; only the final cross-query mean is
    an unordered float reduction (rounded 6dp both sides). Corpus =
    even vec_ids, queries = vec_id % 8 == 1 (disjoint), the bounded
    registered brute leg — at scale the same sweep runs inside
    IVF/LSH candidate buckets over identical codes."""
    from mpds_spark.operators.similarity import knn_shapley

    emb = load(spark, sf_dir, "embeddings")
    out = knn_shapley(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 8 == 1),
        k=5,
    )
    return out.select(
        "train_id", "n_queries", _r6("mean_shapley").alias("mean_shapley")
    )


SQL_KNN_SHAPLEY = """
WITH base AS (
  SELECT vec_id, label,
    list_transform(embedding::DOUBLE[], x ->
      CAST(floor(abs(127.0::DOUBLE * x /
        sqrt(list_dot_product(embedding::DOUBLE[],
                              embedding::DOUBLE[]))) + 0.5)
           * sign(x) AS BIGINT)) AS q
  FROM embeddings
), tr AS (
  SELECT vec_id AS train_id, label AS tl, q FROM base
  WHERE vec_id % 2 = 0
), qs AS (
  SELECT vec_id AS query_id, label AS ql, q AS qq FROM base
  WHERE vec_id % 8 = 1
), p AS (
  SELECT t.train_id, s.query_id,
    CAST(list_dot_product(t.q::DOUBLE[], s.qq::DOUBLE[]) AS BIGINT)
      AS sc,
    CASE WHEN t.tl = s.ql THEN 1 ELSE 0 END AS i
  FROM tr t JOIN qs s ON s.query_id <> t.train_id
), r AS (
  SELECT train_id, query_id, i,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY sc DESC, train_id) AS rnk,
    lead(i) OVER (PARTITION BY query_id
                  ORDER BY sc DESC, train_id) AS inext,
    count(*) OVER (PARTITION BY query_id) AS nn,
    last_value(i) OVER (PARTITION BY query_id
      ORDER BY sc DESC, train_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      AS ilast
  FROM p
), dd AS (
  SELECT train_id, query_id, nn, ilast, rnk,
    CASE WHEN rnk < nn THEN
      CAST((i - inext) * least(5, rnk) AS DOUBLE)
        / CAST(5 * rnk AS DOUBLE)
    ELSE 0.0 END AS d
  FROM r
), sfx AS (
  SELECT train_id, query_id,
    CAST(ilast AS DOUBLE) / CAST(nn AS DOUBLE)
      + sum(d) OVER (PARTITION BY query_id ORDER BY rnk DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shap
  FROM dd
)
SELECT train_id, CAST(count(*) AS BIGINT) AS n_queries,
  round(avg(shap), 6) AS mean_shapley
FROM sfx GROUP BY train_id
"""

QUERIES["knn_shapley"] = q_knn_shapley
_RAW_ORACLES["knn_shapley"] = SQL_KNN_SHAPLEY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_wasserstein_drift(spark, sf_dir):
    """1-D Wasserstein-1 (earth mover's) distance between the purchase
    and click value distributions, PLUS the KS statistic from the same
    sweep — the drift metric pair a feature-monitoring pipeline wants
    (W1 sees magnitude of shift, KS sees the worst point). Entirely
    integer-exact: over the merged distinct-cents support, |F_A - F_B|
    = |cumA*nB - cumB*nA| / (nA*nB), so W1 = sum(|cumA*nB - cumB*nA|
    * gap) / (nA*nB) accumulates exact longs and performs ONE double
    division at the end (ditto KS = max numerator). One distinct-cents
    agg + one tiny global window — the per-row frame never sorts. At
    10^12 rows the distinct-support frame is the value histogram, not
    the corpus."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("__a"),
    )
    v = ev.groupBy("__c").agg(
        F.sum("__a").cast("long").alias("__ca"),
        F.sum(1 - F.col("__a")).cast("long").alias("__cb"),
    )
    wcum = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wlead = Window.orderBy("__c")
    v = v.select(
        "__c",
        F.sum("__ca").over(wcum).alias("__cA"),
        F.sum("__cb").over(wcum).alias("__cB"),
        F.sum("__ca").over(wall).alias("__na"),
        F.sum("__cb").over(wall).alias("__nb"),
        (F.lead("__c").over(wlead) - F.col("__c")).alias("__gap"),
    )
    num = F.abs(
        F.col("__cA") * F.col("__nb") - F.col("__cB") * F.col("__na")
    )
    a = v.select(
        num.alias("__num"), "__gap", "__na", "__nb"
    ).agg(
        F.sum(F.col("__num") * F.coalesce("__gap", F.lit(0).cast("long")))
        .cast("long").alias("__w1n"),
        F.max("__num").cast("long").alias("__ksn"),
        F.max("__na").alias("__n1"),
        F.max("__nb").alias("__n0"),
    )
    denom = (F.col("__n1") * F.col("__n0")).cast("double")
    return a.select(
        F.col("__n1").alias("n_purchase"),
        F.col("__n0").alias("n_click"),
        (F.col("__w1n").cast("double") / denom / F.lit(100.0))
        .alias("wasserstein"),
        (F.col("__ksn").cast("double") / denom).alias("ks_stat"),
    )


SQL_WASSERSTEIN_DRIFT = """
WITH ev AS (
  SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
  FROM events WHERE event_type IN ('purchase', 'click')
), v AS (
  SELECT c, CAST(sum(a) AS BIGINT) AS ca,
    CAST(sum(1 - a) AS BIGINT) AS cb
  FROM ev GROUP BY c
), s AS (
  SELECT c,
    sum(ca) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cA,
    sum(cb) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cB,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
    lead(c) OVER (ORDER BY c) - c AS gap
  FROM v
), a AS (
  SELECT CAST(sum(abs(cA*nb - cB*na) * coalesce(gap, 0)) AS BIGINT)
      AS w1n,
    CAST(max(abs(cA*nb - cB*na)) AS BIGINT) AS ksn,
    CAST(max(na) AS BIGINT) AS n1, CAST(max(nb) AS BIGINT) AS n0
  FROM s
)
SELECT n1 AS n_purchase, n0 AS n_click,
  CAST(w1n AS DOUBLE) / CAST(n1*n0 AS DOUBLE) / 100.0 AS wasserstein,
  CAST(ksn AS DOUBLE) / CAST(n1*n0 AS DOUBLE) AS ks_stat
FROM a
"""

QUERIES["wasserstein_drift"] = q_wasserstein_drift
_RAW_ORACLES["wasserstein_drift"] = SQL_WASSERSTEIN_DRIFT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa (Cohen 1960) between two deterministic document
    quality raters — the inter-annotator-agreement audit every
    labeling/filtering pipeline runs before trusting a rule or a
    model-distilled classifier: rater A keeps n_chars >= 120, rater B
    keeps docs with >= 20 whitespace-delimited words (word count from
    the space-count identity length(text) - length(replace(text,' ',''))
    + 1, identical in any engine). The 2x2 contingency cells come from
    ONE aggregate; po, pe and kappa = (n*(n11+n00) - sum(r*c)) /
    (n^2 - sum(r*c)) are single exact-integer-ratio divisions — no
    float folds anywhere."""
    d = load(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 120, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("__ra"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 20,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__rb"),
    )
    a = d.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__ra") * F.col("__rb")).cast("long").alias("__n11"),
        F.sum((1 - F.col("__ra")) * (1 - F.col("__rb"))).cast("long")
        .alias("__n00"),
        F.sum(F.col("__ra") * (1 - F.col("__rb"))).cast("long")
        .alias("__n10"),
        F.sum((1 - F.col("__ra")) * F.col("__rb")).cast("long")
        .alias("__n01"),
    )
    r1 = F.col("__n11") + F.col("__n10")
    r0 = F.col("__n00") + F.col("__n01")
    c1 = F.col("__n11") + F.col("__n01")
    c0 = F.col("__n00") + F.col("__n10")
    rc = r1 * c1 + r0 * c0
    po = (F.col("__n11") + F.col("__n00")).cast("double") \
        / F.col("__n").cast("double")
    pe = rc.cast("double") / (F.col("__n") * F.col("__n")).cast("double")
    kappa = (
        (F.col("__n") * (F.col("__n11") + F.col("__n00")) - rc)
        .cast("double")
        / (F.col("__n") * F.col("__n") - rc).cast("double")
    )
    return a.select(
        F.col("__n").alias("n_docs"),
        F.col("__n11").alias("n_both_keep"),
        F.col("__n00").alias("n_both_drop"),
        F.col("__n10").alias("n_only_a"),
        F.col("__n01").alias("n_only_b"),
        po.alias("p_observed"),
        pe.alias("p_expected"),
        kappa.alias("kappa"),
    )


SQL_COHENS_KAPPA = """
WITH d AS (
  SELECT CASE WHEN n_chars >= 120 THEN 1 ELSE 0 END AS ra,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 20
      THEN 1 ELSE 0 END AS rb
  FROM documents
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(ra*rb) AS BIGINT) AS n11,
    CAST(sum((1-ra)*(1-rb)) AS BIGINT) AS n00,
    CAST(sum(ra*(1-rb)) AS BIGINT) AS n10,
    CAST(sum((1-ra)*rb) AS BIGINT) AS n01
  FROM d
)
SELECT n AS n_docs, n11 AS n_both_keep, n00 AS n_both_drop,
  n10 AS n_only_a, n01 AS n_only_b,
  CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
  CAST((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10) AS DOUBLE)
    / CAST(n*n AS DOUBLE) AS p_expected,
  CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10))
       AS DOUBLE)
    / CAST(n*n - ((n11+n10)*(n11+n01) + (n00+n01)*(n00+n10))
           AS DOUBLE) AS kappa
FROM a
"""

QUERIES["cohens_kappa"] = q_cohens_kappa
_RAW_ORACLES["cohens_kappa"] = SQL_COHENS_KAPPA
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_silhouette_cosine(spark, sf_dir):
    """Per-point silhouette under mean-cosine dissimilarity (Rousseeuw
    1987 — operators/similarity.py silhouette_cosine): the labeled-
    embedding cluster-quality audit, with the O(n^2) pairwise
    definition collapsed to O(n*L) via linearity of the mean cosine —
    one exact-integer L x dim label-sum table (ONE corpus agg +
    bounded L-row fit) and a shuffle-free scoring map. a/b/s are
    single IEEE divisions of exact longs (int8 codes, 64-dim dots
    < 2^53), so the gate is EXACT with zero rounding; the oracle
    recomputes the identical sum table and per-label min, proving the
    linearity collapse against the definitional form."""
    from mpds_spark.operators.similarity import silhouette_cosine

    emb = load(spark, sf_dir, "embeddings")
    return silhouette_cosine(emb).select(
        "vec_id", "label", "a_intra", "b_inter", "silhouette"
    )


SQL_SILHOUETTE_COSINE = """
WITH base AS (
  SELECT vec_id, label,
    list_transform(embedding::DOUBLE[], x ->
      CAST(floor(abs(127.0::DOUBLE * x /
        sqrt(list_dot_product(embedding::DOUBLE[],
                              embedding::DOUBLE[]))) + 0.5)
           * sign(x) AS BIGINT)) AS q
  FROM embeddings
), comp AS (
  SELECT label, unnest(q) AS v, generate_subscripts(q, 1) AS pos
  FROM base
), lsum AS (
  SELECT label AS lb, array_agg(sv ORDER BY pos) AS sv
  FROM (
    SELECT label, pos, CAST(sum(v) AS BIGINT) AS sv
    FROM comp GROUP BY label, pos
  ) GROUP BY label
), cnt AS (
  SELECT label AS lb, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY label
), x AS (
  SELECT b.vec_id, b.label, l.lb, c.n,
    CAST(list_dot_product(b.q::DOUBLE[], l.sv::DOUBLE[]) AS BIGINT)
      AS dt,
    CAST(list_dot_product(b.q::DOUBLE[], b.q::DOUBLE[]) AS BIGINT)
      AS sd
  FROM base b, lsum l JOIN cnt c ON c.lb = l.lb
), p AS (
  SELECT vec_id, label,
    max(CASE WHEN lb = label AND n > 1 THEN
      CAST((n-1)*16129 - (dt - sd) AS DOUBLE)
        / CAST((n-1)*16129 AS DOUBLE) END) AS a,
    min(CASE WHEN lb <> label THEN
      CAST(n*16129 - dt AS DOUBLE) / CAST(n*16129 AS DOUBLE) END) AS b
  FROM x GROUP BY vec_id, label
)
SELECT vec_id, label, a AS a_intra, b AS b_inter,
  CASE WHEN a IS NULL THEN 0.0
       ELSE (b - a) / greatest(a, b) END AS silhouette
FROM p
"""

QUERIES["silhouette_cosine"] = q_silhouette_cosine
_RAW_ORACLES["silhouette_cosine"] = SQL_SILHOUETTE_COSINE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_calibration_bins(spark, sf_dir):
    """Reliability diagram + expected calibration error + Brier score
    (Brier 1950; ECE as in Naeini et al. 2015 / Guo et al. 2017) for a
    deterministic length-based document classifier: predicted
    probability s = least(n_chars, 400)/400 of the label y = "doc has
    >= 50 whitespace words" (space-count identity), 10 equal-width
    score bins via integer division. Entirely integer-exact: per-bin
    confidence = sum(m)/(400 n_b), accuracy = pos_b/n_b, ECE =
    sum_b |400 pos_b - sum_b(m)| / (400 N) and Brier = (sum m^2 -
    800 sum(m y) + 160000 sum y)/(160000 N) all accumulate exact longs
    and divide ONCE — no float folds, no rounding, gate EXACT. ONE bin
    agg + one tiny global window over the <=10-row bin frame; at 10^12
    docs the bin frame is still 10 rows."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(400)).cast("long").alias("__m"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 50,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    b = d.groupBy(
        F.least(F.lit(9).cast("long"), F.expr("__m div 40")).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__pos"),
        F.sum("__m").cast("long").alias("__sm"),
        F.sum(F.col("__m") * F.col("__m")).cast("long").alias("__sm2"),
        F.sum(F.col("__m") * F.col("__y")).cast("long").alias("__smy"),
    )
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = b.select(
        "bin", "__n", "__pos", "__sm",
        F.sum("__n").over(wall).alias("__ntot"),
        F.sum(F.abs(F.lit(400) * F.col("__pos") - F.col("__sm")))
        .over(wall).alias("__eceN"),
        (
            F.sum("__sm2").over(wall)
            - F.lit(800) * F.sum("__smy").over(wall)
            + F.lit(160000) * F.sum("__pos").over(wall)
        ).alias("__brierN"),
    )
    return b.select(
        "bin",
        F.col("__n").alias("n_docs"),
        F.col("__pos").alias("n_pos"),
        (F.col("__sm").cast("double")
         / (F.lit(400) * F.col("__n")).cast("double")).alias("confidence"),
        (F.col("__pos").cast("double") / F.col("__n").cast("double"))
        .alias("accuracy"),
        (F.col("__eceN").cast("double")
         / (F.lit(400) * F.col("__ntot")).cast("double")).alias("ece"),
        (F.col("__brierN").cast("double")
         / (F.lit(160000) * F.col("__ntot")).cast("double")).alias("brier"),
    )


SQL_CALIBRATION_BINS = """
WITH d AS (
  SELECT CAST(least(n_chars, 400) AS BIGINT) AS m,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 50
      THEN 1 ELSE 0 END AS y
  FROM documents
), b AS (
  SELECT least(9, m // 40) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(m) AS BIGINT) AS sm,
    CAST(sum(m*m) AS BIGINT) AS sm2,
    CAST(sum(m*y) AS BIGINT) AS smy
  FROM d GROUP BY 1
), w AS (
  SELECT bin, n, pos, sm,
    sum(n) OVER () AS nn,
    sum(abs(400*pos - sm)) OVER () AS ecen,
    sum(sm2) OVER () - 800*sum(smy) OVER ()
      + 160000*sum(pos) OVER () AS briern
  FROM b
)
SELECT bin, n AS n_docs, pos AS n_pos,
  CAST(sm AS DOUBLE) / CAST(400*n AS DOUBLE) AS confidence,
  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
  CAST(ecen AS DOUBLE) / CAST(400*nn AS DOUBLE) AS ece,
  CAST(briern AS DOUBLE) / CAST(160000*nn AS DOUBLE) AS brier
FROM w
"""

QUERIES["calibration_bins"] = q_calibration_bins
_RAW_ORACLES["calibration_bins"] = SQL_CALIBRATION_BINS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_markov_accuracy(spark, sf_dir):
    """First-order Markov next-event predictability audit (the Shannon
    1951 guessing-game baseline for event sequences, and the
    sanity floor every sequence model must beat): fit the global
    event-type transition table, predict the modal next type per
    current type, and report each type's top-1 accuracy. The key
    collapse: the correct-prediction count per current type IS the max
    transition count, so no join back to the pair stream is needed —
    ONE entity exchange builds (cur, next) lead pairs, a transition
    agg counts them, and a tiny per-cur argmax via min(struct(-cnt,
    next)) (count desc, type asc — deterministic tie-break) finishes.
    accuracy = ONE division of exact longs; gate EXACT. Complements
    transition_entropy (the information bound) with the achievable
    top-1 rate."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        F.col("event_type").alias("__cur"),
    )
    w = Window.partitionBy("user_id").orderBy("__t")
    pairs = ev.withColumn("__nxt", F.lead("__cur").over(w)).filter(
        F.col("__nxt").isNotNull()
    )
    t = pairs.groupBy("__cur", "__nxt").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    a = t.groupBy("__cur").agg(
        F.sum("__cnt").cast("long").alias("__np"),
        F.min(
            F.struct(
                (-F.col("__cnt")).alias("negc"),
                F.col("__nxt").alias("nxt"),
            )
        ).alias("__best"),
    )
    return a.select(
        F.col("__cur").alias("cur_type"),
        F.col("__best.nxt").alias("predicted_next"),
        F.col("__np").alias("n_pairs"),
        (-F.col("__best.negc")).cast("long").alias("n_correct"),
        ((-F.col("__best.negc")).cast("double")
         / F.col("__np").cast("double")).alias("accuracy"),
    )


SQL_MARKOV_ACCURACY = """
WITH ev AS (
  SELECT user_id, epoch(ts) AS t, event_type AS cur FROM events
), p AS (
  SELECT cur,
    lead(cur) OVER (PARTITION BY user_id ORDER BY t) AS nxt
  FROM ev
), t AS (
  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
  FROM p WHERE nxt IS NOT NULL GROUP BY cur, nxt
), a AS (
  SELECT cur, nxt, cnt,
    row_number() OVER (PARTITION BY cur
                       ORDER BY cnt DESC, nxt) AS rn,
    CAST(sum(cnt) OVER (PARTITION BY cur) AS BIGINT) AS np
  FROM t
)
SELECT cur AS cur_type, nxt AS predicted_next, np AS n_pairs,
  cnt AS n_correct,
  CAST(cnt AS DOUBLE) / CAST(np AS DOUBLE) AS accuracy
FROM a WHERE rn = 1
"""

QUERIES["markov_accuracy"] = q_markov_accuracy
_RAW_ORACLES["markov_accuracy"] = SQL_MARKOV_ACCURACY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the co-order part graph
    (operators/graph.py degree_assortativity): Pearson correlation of
    endpoint degrees over the directed doubling of the edge set —
    whether hub parts co-occur with hub parts. Exact integer moments
    (one moment agg over the annotated directed edges), fixed
    expression tree for r (all intermediate longs < 2^53 so every
    double op is on exactly-represented values): the gate is EXACT
    with zero rounding. Same %4 subgraph gate as graph_triangles to
    bound the toy-scale pair flatten; at 10^12 rows the edge build is
    the bucketed basket aggregation and the moment agg is one
    map-side-combine pass."""
    from mpds_spark.operators.graph import (
        co_occurrence_edges,
        degree_assortativity,
    )

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    edges = co_occurrence_edges(
        li, basket="l_orderkey", item="l_partkey"
    )
    return degree_assortativity(edges).select(
        "n_nodes", "n_edges", "assortativity"
    )


SQL_DEGREE_ASSORTATIVITY = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_partkey % 4 = 0
), e AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
), dir AS (
  SELECT a AS s, b AS d FROM e
  UNION ALL SELECT b AS s, a AS d FROM e
), ann AS (
  SELECT ds.degree AS x, dd.degree AS y
  FROM dir JOIN deg ds ON ds.node = dir.s
           JOIN deg dd ON dd.node = dir.d
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x*y) AS BIGINT) AS sxy,
    CAST(sum(x*x) AS BIGINT) AS sxx,
    CAST(sum(y*y) AS BIGINT) AS syy
  FROM ann
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg
)
SELECT nn.n_nodes, m.m // 2 AS n_edges,
  (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
    AS assortativity
FROM m, nn
"""

QUERIES["degree_assortativity"] = q_degree_assortativity
_RAW_ORACLES["degree_assortativity"] = SQL_DEGREE_ASSORTATIVITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank correlation (Kendall 1938; tau-b tie
    correction as in Agresti, "Analysis of Ordinal Categorical Data")
    between document length decile and word-count decile — the
    ordinal-association audit that, unlike Pearson/Spearman, is a
    direct function of concordant/discordant PAIR counts, so it reads
    as "probability a random doc pair agrees in order". The O(n^2)
    pair definition collapses to the contingency table: C and D are
    cell-pair sums over the <=100-cell frame (a broadcast self-join of
    the aggregate — BNLJ-by-design on a bounded frame, never the
    corpus), tie terms come from the row/column marginals, and tau_b =
    (C-D)/(sqrt(n0-Tx)*sqrt(n0-Ty)) is a fixed expression tree over
    exact longs — gate EXACT, no rounding. Goodman-Kruskal gamma
    rides along as the tie-free companion. At 10^12 docs the cell
    frame is STILL <=100 rows — the corpus is touched exactly once."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.lit(9).cast("long"),
                F.expr("cast(n_chars as bigint) div 40")).alias("__i"),
        F.least(
            F.lit(9).cast("long"),
            F.expr(
                "cast(length(text) - length(replace(text, ' ', ''))"
                " + 1 as bigint) div 10"
            ),
        ).alias("__j"),
    )
    cells = d.groupBy("__i", "__j").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    from mpds_spark.operators.util import scratch_persist

    cells = scratch_persist(cells)
    c1 = cells.select(F.col("__i").alias("i1"), F.col("__j").alias("j1"),
                      F.col("__n").alias("n1"))
    c2 = cells.select(F.col("__i").alias("i2"), F.col("__j").alias("j2"),
                      F.col("__n").alias("n2"))
    cd = (
        c1.join(F.broadcast(c2), F.col("i2") > F.col("i1"))
        .agg(
            F.sum(
                F.when(F.col("j2") > F.col("j1"),
                       F.col("n1") * F.col("n2")).otherwise(F.lit(0))
            ).cast("long").alias("__C"),
            F.sum(
                F.when(F.col("j2") < F.col("j1"),
                       F.col("n1") * F.col("n2")).otherwise(F.lit(0))
            ).cast("long").alias("__D"),
        )
    )
    tx = (
        cells.groupBy("__i").agg(F.sum("__n").cast("long").alias("t"))
        .agg((F.sum(F.col("t") * (F.col("t") - 1)) / F.lit(2))
             .cast("long").alias("__tx"),
             F.sum("t").cast("long").alias("__nd"))
    )
    ty = (
        cells.groupBy("__j").agg(F.sum("__n").cast("long").alias("t"))
        .agg((F.sum(F.col("t") * (F.col("t") - 1)) / F.lit(2))
             .cast("long").alias("__ty"))
    )
    one = cd.join(F.broadcast(tx)).join(F.broadcast(ty))
    n0 = (F.col("__nd") * (F.col("__nd") - 1) / F.lit(2)).cast("long")
    one = one.withColumn("__n0", n0)
    tau = (F.col("__C") - F.col("__D")).cast("double") / (
        F.sqrt((F.col("__n0") - F.col("__tx")).cast("double"))
        * F.sqrt((F.col("__n0") - F.col("__ty")).cast("double"))
    )
    gamma = (F.col("__C") - F.col("__D")).cast("double") / (
        F.col("__C") + F.col("__D")
    ).cast("double")
    return one.select(
        F.col("__nd").alias("n_docs"),
        F.col("__C").alias("concordant"),
        F.col("__D").alias("discordant"),
        tau.alias("tau_b"),
        gamma.alias("gamma"),
    )


SQL_KENDALL_TAU = """
WITH d AS (
  SELECT least(9, CAST(n_chars AS BIGINT) // 40) AS i,
    least(9, CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) // 10) AS j
  FROM documents
), cells AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY i, j
), cd AS (
  SELECT
    CAST(sum(CASE WHEN c2.j > c1.j THEN c1.n * c2.n ELSE 0 END)
         AS BIGINT) AS c,
    CAST(sum(CASE WHEN c2.j < c1.j THEN c1.n * c2.n ELSE 0 END)
         AS BIGINT) AS dd
  FROM cells c1 JOIN cells c2 ON c2.i > c1.i
), tx AS (
  SELECT CAST(sum(t*(t-1)) // 2 AS BIGINT) AS tx,
         CAST(sum(t) AS BIGINT) AS nd
  FROM (SELECT sum(n) AS t FROM cells GROUP BY i)
), ty AS (
  SELECT CAST(sum(t*(t-1)) // 2 AS BIGINT) AS ty
  FROM (SELECT sum(n) AS t FROM cells GROUP BY j)
)
SELECT nd AS n_docs, c AS concordant, dd AS discordant,
  CAST(c - dd AS DOUBLE)
    / (sqrt(CAST(nd*(nd-1)//2 - tx AS DOUBLE))
       * sqrt(CAST(nd*(nd-1)//2 - ty AS DOUBLE))) AS tau_b,
  CAST(c - dd AS DOUBLE) / CAST(c + dd AS DOUBLE) AS gamma
FROM cd, tx, ty
"""

QUERIES["kendall_tau"] = q_kendall_tau
_RAW_ORACLES["kendall_tau"] = SQL_KENDALL_TAU
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_did_estimate(spark, sf_dir):
    """Difference-in-differences estimate + pooled standard error
    (Card & Krueger 1994 for the design; SE caveat per Bertrand,
    Duflo & Mullainathan 2004 — with one period per side the pooled
    4-cell SE is the textbook form) over purchase values: treatment =
    md5-parity user assignment (an A/A audit by construction, like
    srm_check — the expected DiD is ~0, so a large |t| flags a broken
    assignment or leaky metric), period = second half of the month (day >= 16) vs first. ONE cell
    aggregate (n, sum-cents, sum-cents^2 — exact longs), pivoted to a
    single row by order-independent conditional MAX, then a FIXED
    expression tree: each mean is one division of exact longs, DiD two
    subtractions, the variance terms Welford-free exact-moment forms.
    No float folds anywhere -> gate EXACT. At 10^12 rows the cell
    frame is 4 rows."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("did|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__tr"),
        F.when(F.dayofmonth(F.col("ts").cast("timestamp")) >= 16, F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("__po"),
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    cells = ev.groupBy("__tr", "__po").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__c").cast("long").alias("__s"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__s2"),
    )
    p = cells.agg(
        *[
            f
            for tr in (0, 1)
            for po in (0, 1)
            for f in (
                F.max(
                    F.when((F.col("__tr") == tr) & (F.col("__po") == po),
                           F.col("__n"))
                ).alias(f"n{tr}{po}"),
                F.max(
                    F.when((F.col("__tr") == tr) & (F.col("__po") == po),
                           F.col("__s"))
                ).alias(f"s{tr}{po}"),
                F.max(
                    F.when((F.col("__tr") == tr) & (F.col("__po") == po),
                           F.col("__s2"))
                ).alias(f"q{tr}{po}"),
            )
        ]
    )

    def mean(tr, po):
        return F.col(f"s{tr}{po}").cast("double") / (
            F.lit(100) * F.col(f"n{tr}{po}")
        ).cast("double")

    def varterm(tr, po):
        n = F.col(f"n{tr}{po}").cast("double")
        s = F.col(f"s{tr}{po}").cast("double")
        q = F.col(f"q{tr}{po}").cast("double")
        return (q - s * s / n) / (n - F.lit(1.0)) / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        varterm(0, 0) + varterm(0, 1) + varterm(1, 0) + varterm(1, 1)
    ) / F.lit(100.0)
    return p.select(
        (F.col("n00") + F.col("n01") + F.col("n10") + F.col("n11"))
        .alias("n_purchases"),
        mean(0, 0).alias("mean_ctrl_pre"),
        mean(0, 1).alias("mean_ctrl_post"),
        mean(1, 0).alias("mean_treat_pre"),
        mean(1, 1).alias("mean_treat_post"),
        did.alias("did"),
        se.alias("did_se"),
        (did / se).alias("t_stat"),
    )


SQL_DID_ESTIMATE = """
WITH ev AS (
  SELECT
    CAST(('0x' || substring(md5('did|' || CAST(user_id AS VARCHAR)),
          1, 15))::UBIGINT % 2 AS BIGINT) AS tr,
    CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END AS po,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT tr, po, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS q
  FROM ev GROUP BY tr, po
), p AS (
  SELECT
    max(CASE WHEN tr=0 AND po=0 THEN n END) AS n00,
    max(CASE WHEN tr=0 AND po=0 THEN s END) AS s00,
    max(CASE WHEN tr=0 AND po=0 THEN q END) AS q00,
    max(CASE WHEN tr=0 AND po=1 THEN n END) AS n01,
    max(CASE WHEN tr=0 AND po=1 THEN s END) AS s01,
    max(CASE WHEN tr=0 AND po=1 THEN q END) AS q01,
    max(CASE WHEN tr=1 AND po=0 THEN n END) AS n10,
    max(CASE WHEN tr=1 AND po=0 THEN s END) AS s10,
    max(CASE WHEN tr=1 AND po=0 THEN q END) AS q10,
    max(CASE WHEN tr=1 AND po=1 THEN n END) AS n11,
    max(CASE WHEN tr=1 AND po=1 THEN s END) AS s11,
    max(CASE WHEN tr=1 AND po=1 THEN q END) AS q11
  FROM cells
), f AS (
  SELECT n00 + n01 + n10 + n11 AS n_purchases,
    CAST(s00 AS DOUBLE)/CAST(100*n00 AS DOUBLE) AS m00,
    CAST(s01 AS DOUBLE)/CAST(100*n01 AS DOUBLE) AS m01,
    CAST(s10 AS DOUBLE)/CAST(100*n10 AS DOUBLE) AS m10,
    CAST(s11 AS DOUBLE)/CAST(100*n11 AS DOUBLE) AS m11,
    sqrt(
      (CAST(q00 AS DOUBLE) - CAST(s00 AS DOUBLE)*CAST(s00 AS DOUBLE)
        / CAST(n00 AS DOUBLE)) / (CAST(n00 AS DOUBLE) - 1.0)
        / CAST(n00 AS DOUBLE)
      + (CAST(q01 AS DOUBLE) - CAST(s01 AS DOUBLE)*CAST(s01 AS DOUBLE)
        / CAST(n01 AS DOUBLE)) / (CAST(n01 AS DOUBLE) - 1.0)
        / CAST(n01 AS DOUBLE)
      + (CAST(q10 AS DOUBLE) - CAST(s10 AS DOUBLE)*CAST(s10 AS DOUBLE)
        / CAST(n10 AS DOUBLE)) / (CAST(n10 AS DOUBLE) - 1.0)
        / CAST(n10 AS DOUBLE)
      + (CAST(q11 AS DOUBLE) - CAST(s11 AS DOUBLE)*CAST(s11 AS DOUBLE)
        / CAST(n11 AS DOUBLE)) / (CAST(n11 AS DOUBLE) - 1.0)
        / CAST(n11 AS DOUBLE)
    ) / 100.0 AS se
  FROM p
)
SELECT n_purchases, m00 AS mean_ctrl_pre, m01 AS mean_ctrl_post,
  m10 AS mean_treat_pre, m11 AS mean_treat_post,
  (m11 - m10) - (m01 - m00) AS did, se AS did_se,
  ((m11 - m10) - (m01 - m00)) / se AS t_stat
FROM f
"""

QUERIES["did_estimate"] = q_did_estimate
_RAW_ORACLES["did_estimate"] = SQL_DID_ESTIMATE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_perm_entropy(spark, sf_dir):
    """Per-user permutation entropy of the purchase-value stream
    (Bandt & Pompe 2002, "Permutation entropy: a natural complexity
    measure for time series", PRL 88 — the standard
    model-free complexity feature for sensor/behavioral series, robust
    to monotone transforms because it sees only ORDER patterns):
    embed order m=3, ordinal pattern of each consecutive value triple
    under the stable (value, time-index) tie rule, normalized Shannon
    entropy of the 6-pattern distribution. Encoded branch-free: the
    three pairwise stable comparisons (b01, b02, b12) determine the
    permutation, so code = 4*b01 + 2*b02 + b12 needs no rank sort.
    Counts are exact longs; the entropy folds SEQUENTIALLY over the
    code-sorted cell array (<=6 cells/user), so no shuffle-order float
    summation on either engine (the transition_entropy discipline);
    _r6 absorbs libm ln ULP skew. ONE user exchange feeds both lead
    windows and the cell count. Low H -> trending/periodic behavior,
    H ~ 1 -> white-noise spending."""
    import math

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        "event_id",
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    d = (
        ev.withColumn("__v1", F.lead("__c", 1).over(w))
        .withColumn("__v2", F.lead("__c", 2).over(w))
        .filter(F.col("__v2").isNotNull())
    )
    code = (
        F.when(F.col("__c") <= F.col("__v1"), F.lit(4)).otherwise(F.lit(0))
        + F.when(F.col("__c") <= F.col("__v2"), F.lit(2)).otherwise(F.lit(0))
        + F.when(F.col("__v1") <= F.col("__v2"), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    cells = d.groupBy("user_id", code.alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    per_u = cells.groupBy("user_id").agg(
        F.sum("__n").cast("long").alias("n_triples"),
        F.array_sort(F.collect_list(F.struct("__k", "__n"))).alias("__a"),
    )
    h = F.expr(
        "aggregate(__a, 0.0D, (acc, x) -> acc + (cast(x.__n as double)"
        " / cast(n_triples as double))"
        " * ln(cast(n_triples as double) / cast(x.__n as double)))"
    )
    return per_u.select(
        "user_id",
        "n_triples",
        _r6(h / F.lit(math.log(6.0))).alias("perm_entropy"),
    )


SQL_PERM_ENTROPY = """
WITH ev AS (
  SELECT user_id, epoch(ts) AS t, event_id,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events
), tr AS (
  SELECT user_id, c,
    lead(c, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS v1,
    lead(c, 2) OVER (PARTITION BY user_id ORDER BY t, event_id) AS v2
  FROM ev
), pat AS (
  SELECT user_id,
    (CASE WHEN c <= v1 THEN 4 ELSE 0 END
     + CASE WHEN c <= v2 THEN 2 ELSE 0 END
     + CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS k
  FROM tr WHERE v2 IS NOT NULL
), cells AS (
  SELECT user_id, k, CAST(count(*) AS BIGINT) AS n
  FROM pat GROUP BY user_id, k
), tot AS (
  SELECT user_id, CAST(sum(n) AS BIGINT) AS nt
  FROM cells GROUP BY user_id
), h AS (
  SELECT cells.user_id,
    list_sum(list((n::DOUBLE / nt::DOUBLE) * ln(nt::DOUBLE / n::DOUBLE)
      ORDER BY k)) AS h
  FROM cells JOIN tot ON tot.user_id = cells.user_id
  GROUP BY cells.user_id
)
SELECT tot.user_id, nt AS n_triples,
  round(h.h / {LN6}, 6) AS perm_entropy
FROM tot JOIN h ON h.user_id = tot.user_id
""".replace("{LN6}", __import__("math").log(6.0).__repr__())

QUERIES["perm_entropy"] = q_perm_entropy
_RAW_ORACLES["perm_entropy"] = SQL_PERM_ENTROPY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_theil_index(spark, sf_dir):
    """Per-source Theil-T inequality decomposition of document word
    counts (Theil 1967; the between/within decomposition as in
    Shorrocks 1980, "The class of additively decomposable inequality
    measures", Econometrica — the corpus-balance audit that says
    whether length inequality lives INSIDE sources or BETWEEN them,
    which decides whether to rebalance the mixture or re-chunk
    individual sources): T = T_between + sum_g s_g T_g with
    s_g = X_g / X the token share. Per source: T_g = (1/X_g) *
    sum x ln x - ln(X_g/n_g), computed over the DISTINCT word-count
    histogram (the value frame, <=few hundred rows per source — never
    a per-row float fold): counts and sums are exact longs, the
    sum x ln x folds SEQUENTIALLY over the value-sorted array, global
    N and X are integer window sums (order-independent), and every
    emitted float is a fixed per-row expression — no cross-row float
    reduction anywhere. _r6 absorbs libm ln ULP skew. At 10^12 docs
    the histogram IS the aggregate; the corpus is scanned once."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1
        ).cast("long").alias("__w"),
    )
    vals = d.groupBy("source", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    g = vals.groupBy("source").agg(
        F.sum("__n").cast("long").alias("n_docs"),
        F.sum(F.col("__n") * F.col("__w")).cast("long").alias("sum_words"),
        F.array_sort(F.collect_list(F.struct("__w", "__n"))).alias("__a"),
    )
    sxlx = F.expr(
        "aggregate(__a, 0.0D, (acc, x) -> acc +"
        " cast(x.__n as double) * cast(x.__w as double)"
        " * ln(cast(x.__w as double)))"
    )
    g = g.withColumn("__sxlx", sxlx)
    wall = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = g.withColumn("__N", F.sum("n_docs").over(wall)).withColumn(
        "__X", F.sum("sum_words").over(wall)
    )
    tg = (
        F.col("__sxlx") / F.col("sum_words").cast("double")
        - F.log(
            F.col("sum_words").cast("double") / F.col("n_docs").cast("double")
        )
    )
    sg = F.col("sum_words").cast("double") / F.col("__X").cast("double")
    between = sg * F.log(
        (F.col("sum_words").cast("double") / F.col("__X").cast("double"))
        / (F.col("n_docs").cast("double") / F.col("__N").cast("double"))
    )
    return g.select(
        "source",
        "n_docs",
        "sum_words",
        _r6(sg).alias("word_share"),
        _r6(tg).alias("theil_within"),
        _r6(between).alias("between_term"),
        _r6(sg * tg + between).alias("contribution"),
    )


SQL_THEIL_INDEX = """
WITH d AS (
  SELECT source,
    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
      AS w
  FROM documents
), vals AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY source, w
), g AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
    CAST(sum(n*w) AS BIGINT) AS sum_words,
    list_sum(list(n::DOUBLE * w::DOUBLE * ln(w::DOUBLE) ORDER BY w))
      AS sxlx
  FROM vals GROUP BY source
), t AS (
  SELECT *, CAST(sum(n_docs) OVER () AS BIGINT) AS nn,
    CAST(sum(sum_words) OVER () AS BIGINT) AS xx
  FROM g
)
SELECT source, n_docs, sum_words,
  round(CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE), 6)
    AS word_share,
  round(sxlx / CAST(sum_words AS DOUBLE)
        - ln(CAST(sum_words AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6)
    AS theil_within,
  round((CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE))
        * ln((CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))), 6)
    AS between_term,
  round((CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE))
        * (sxlx / CAST(sum_words AS DOUBLE)
           - ln(CAST(sum_words AS DOUBLE) / CAST(n_docs AS DOUBLE)))
        + (CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE))
        * ln((CAST(sum_words AS DOUBLE) / CAST(xx AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))), 6)
    AS contribution
FROM t
"""

QUERIES["theil_index"] = q_theil_index
_RAW_ORACLES["theil_index"] = SQL_THEIL_INDEX
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_anova_twoway(spark, sf_dir):
    """Two-way variance decomposition of purchase value over hour-of-
    day x day-of-week (Fisher's ANOVA in the cell-means form; for the
    unbalanced counts the interaction term is the hierarchical
    SS_cells - SS_hour - SS_dow, i.e. sequential/Type-I-style — the
    seasonality-strength audit that says whether a value model needs
    hour, weekday, or their interaction as features, read off as
    eta-squared shares). EVERYTHING derives from ONE corpus aggregate
    to the <=168-cell (hour, dow) frame of exact integer (n, sum,
    sum-of-squares): marginal hour/dow totals are integer regroups of
    the cell frame, each SS is a difference of exact-ratio doubles
    via a fixed expression tree, and no float ever crosses a shuffle
    — gate EXACT with zero rounding. At 10^12 rows the cell frame is
    still 168 rows."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("__h"),
        F.dayofweek(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    cells = ev.groupBy("__h", "__d").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__c").cast("long").alias("__s"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__q"),
    )
    from mpds_spark.operators.util import scratch_persist

    cells = scratch_persist(cells)

    def ss_of(df, keys):
        # sum over groups of s_g^2 / n_g (exact longs -> one division
        # each, order-pinned by folding over the key-sorted array)
        gg = df.groupBy(*keys).agg(
            F.sum("__n").cast("long").alias("n"),
            F.sum("__s").cast("long").alias("s"),
        )
        return gg.agg(
            F.array_sort(
                F.collect_list(F.struct(*keys, "n", "s"))
            ).alias("arr")
        ).select(
            F.expr(
                "aggregate(arr, 0.0D, (acc, x) -> acc +"
                " cast(x.s as double) * cast(x.s as double)"
                " / cast(x.n as double))"
            ).alias("v")
        )

    tot = cells.agg(
        F.sum("__n").cast("long").alias("__nn"),
        F.sum("__s").cast("long").alias("__ss"),
        F.sum("__q").cast("long").alias("__qq"),
    )
    sc = ss_of(cells, ["__h", "__d"]).select(F.col("v").alias("__vc"))
    sh = ss_of(cells, ["__h"]).select(F.col("v").alias("__vh"))
    sd = ss_of(cells, ["__d"]).select(F.col("v").alias("__vd"))
    one = (
        tot.join(F.broadcast(sc))
        .join(F.broadcast(sh))
        .join(F.broadcast(sd))
    )
    cm = (
        F.col("__ss").cast("double") * F.col("__ss").cast("double")
        / F.col("__nn").cast("double")
    )
    ss_total = F.col("__qq").cast("double") - cm
    ss_cells = F.col("__vc") - cm
    ss_hour = F.col("__vh") - cm
    ss_dow = F.col("__vd") - cm
    ss_inter = ss_cells - ss_hour - ss_dow
    ss_within = ss_total - ss_cells
    return one.select(
        F.col("__nn").alias("n_purchases"),
        (ss_total / F.lit(10000.0)).alias("ss_total"),
        (ss_hour / F.lit(10000.0)).alias("ss_hour"),
        (ss_dow / F.lit(10000.0)).alias("ss_dow"),
        (ss_inter / F.lit(10000.0)).alias("ss_interaction"),
        (ss_within / F.lit(10000.0)).alias("ss_within"),
        (ss_hour / ss_total).alias("eta2_hour"),
        (ss_dow / ss_total).alias("eta2_dow"),
        (ss_inter / ss_total).alias("eta2_interaction"),
    )


SQL_ANOVA_TWOWAY = """
WITH ev AS (
  SELECT hour(ts) AS h, dayofweek(ts) + 1 AS d,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT h, d, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS q
  FROM ev GROUP BY h, d
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
    CAST(sum(q) AS BIGINT) AS qq
  FROM cells
), vc AS (
  SELECT list_sum(list(s::DOUBLE * s::DOUBLE / n::DOUBLE
    ORDER BY h, d)) AS v
  FROM cells
), vh AS (
  SELECT list_sum(list(s::DOUBLE * s::DOUBLE / n::DOUBLE ORDER BY h))
    AS v
  FROM (SELECT h, CAST(sum(n) AS BIGINT) AS n,
          CAST(sum(s) AS BIGINT) AS s FROM cells GROUP BY h)
), vd AS (
  SELECT list_sum(list(s::DOUBLE * s::DOUBLE / n::DOUBLE ORDER BY d))
    AS v
  FROM (SELECT d, CAST(sum(n) AS BIGINT) AS n,
          CAST(sum(s) AS BIGINT) AS s FROM cells GROUP BY d)
), f AS (
  SELECT nn,
    qq::DOUBLE - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS sst,
    vc.v - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS ssc,
    vh.v - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS ssh,
    vd.v - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS ssd
  FROM tot, vc, vh, vd
)
SELECT nn AS n_purchases,
  sst / 10000.0 AS ss_total,
  ssh / 10000.0 AS ss_hour,
  ssd / 10000.0 AS ss_dow,
  (ssc - ssh - ssd) / 10000.0 AS ss_interaction,
  (sst - ssc) / 10000.0 AS ss_within,
  ssh / sst AS eta2_hour,
  ssd / sst AS eta2_dow,
  (ssc - ssh - ssd) / sst AS eta2_interaction
FROM f
"""

QUERIES["anova_twoway"] = q_anova_twoway
_RAW_ORACLES["anova_twoway"] = SQL_ANOVA_TWOWAY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_hurst_variance_plot(spark, sf_dir):
    """Hurst exponent of the per-user event-value stream via the
    aggregated-variance method (Beran 1994, "Statistics for Long-
    Memory Processes"; Taqqu, Teverovsky & Willinger 1995 for the
    estimator): pool block means at block sizes m in {1,2,4,8} over
    every user's ts-ordered series, regress log2 Var(mean_m) on
    log2 m — slope beta estimates 2H-2, H = 1 + beta/2. H ~ 0.5 is
    memoryless spending, H -> 1 long-range-dependent sessions — the
    self-similarity feature that decides whether naive sqrt(n) CI
    scaling is valid for the metric at all.

    Exactness discipline: block sums are exact longs, so
    sum of block-mean squares = (sum s^2) / m^2 keeps an exact
    integer numerator (max |s| ~ 8 * max cents keeps sum s^2 well
    under 2^53 at sf0.1); each Var(m) is a fixed expression of exact
    longs; the 4-point least-squares slope is a fixed tree over the 4
    variances. The block roll-up is a log-depth hierarchy (m=2 blocks
    aggregate m=1 rows, m=4 aggregates m=2, ...), exactly the at-
    scale shape; trailing partial blocks drop (count == m only)."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        "event_id",
        (
            F.signum("value") * F.floor(F.abs(F.col("value")) * 100
                                        + F.lit(0.5))
        ).cast("long").alias("__c"),
    )
    from mpds_spark.operators.util import scratch_persist

    w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    base = scratch_persist(ev.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("__i"),
        F.col("__c").alias("__s"),
    ))

    levels = {}
    cur = base
    m = 1
    for lvl in range(4):  # m = 1, 2, 4, 8
        if lvl > 0:
            # each level is scanned twice (its own moment agg + the next
            # roll-up) — persist so the corpus window runs ONCE
            cur = scratch_persist(
                cur.groupBy(
                    "user_id",
                    (F.col("__i") / 2).cast("long").alias("__i2"),
                )
                .agg(
                    F.sum("__s").cast("long").alias("__s"),
                    F.count(F.lit(1)).alias("__k"),
                )
                .filter(F.col("__k") == 2)
                .select("user_id", F.col("__i2").alias("__i"), "__s")
            )
        levels[m] = cur.agg(
            F.count(F.lit(1)).cast("long").alias(f"b{m}"),
            F.sum("__s").cast("long").alias(f"t{m}"),
            F.sum(F.col("__s") * F.col("__s")).cast("long")
            .alias(f"u{m}"),
        )
        m *= 2
    one = levels[1]
    for mm in (2, 4, 8):
        one = one.join(F.broadcast(levels[mm]))

    def var(mm):
        b = F.col(f"b{mm}").cast("double")
        t = F.col(f"t{mm}").cast("double")
        u = F.col(f"u{mm}").cast("double")
        md = float(mm)
        # Var of block means: (sum s^2/m^2 - (sum s/m)^2 / B) / (B-1)
        return (
            (u / F.lit(md * md) - (t / F.lit(md)) * (t / F.lit(md)) / b)
            / (b - F.lit(1.0))
        )

    lv = {mm: F.log2(var(mm)) for mm in (1, 2, 4, 8)}
    xs = [0.0, 1.0, 2.0, 3.0]
    xbar = sum(xs) / 4.0  # 1.5
    sxx = sum((x - xbar) ** 2 for x in xs)  # 5.0
    ybar = (lv[1] + lv[2] + lv[4] + lv[8]) / F.lit(4.0)
    slope = (
        (lv[1] - ybar) * F.lit(0.0 - xbar)
        + (lv[2] - ybar) * F.lit(1.0 - xbar)
        + (lv[4] - ybar) * F.lit(2.0 - xbar)
        + (lv[8] - ybar) * F.lit(3.0 - xbar)
    ) / F.lit(sxx)
    return one.select(
        F.col("b1").alias("n_events"),
        _r6(var(1) / F.lit(10000.0)).alias("var_m1"),
        _r6(var(2) / F.lit(10000.0)).alias("var_m2"),
        _r6(var(4) / F.lit(10000.0)).alias("var_m4"),
        _r6(var(8) / F.lit(10000.0)).alias("var_m8"),
        _r6(slope).alias("slope"),
        _r6(F.lit(1.0) + slope / F.lit(2.0)).alias("hurst"),
    )


SQL_HURST_VARIANCE_PLOT = """
WITH ev AS (
  SELECT user_id,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch(ts), event_id) - 1 AS i,
    CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS s
  FROM events
), l2 AS (
  SELECT user_id, i // 2 AS i, CAST(sum(s) AS BIGINT) AS s
  FROM ev GROUP BY user_id, i // 2 HAVING count(*) = 2
), l4 AS (
  SELECT user_id, i // 2 AS i, CAST(sum(s) AS BIGINT) AS s
  FROM l2 GROUP BY user_id, i // 2 HAVING count(*) = 2
), l8 AS (
  SELECT user_id, i // 2 AS i, CAST(sum(s) AS BIGINT) AS s
  FROM l4 GROUP BY user_id, i // 2 HAVING count(*) = 2
), a1 AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(s) AS BIGINT) AS t,
    CAST(sum(s*s) AS BIGINT) AS u FROM ev
), a2 AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(s) AS BIGINT) AS t,
    CAST(sum(s*s) AS BIGINT) AS u FROM l2
), a4 AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(s) AS BIGINT) AS t,
    CAST(sum(s*s) AS BIGINT) AS u FROM l4
), a8 AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(s) AS BIGINT) AS t,
    CAST(sum(s*s) AS BIGINT) AS u FROM l8
), v AS (
  SELECT a1.b AS n_events,
    (a1.u::DOUBLE / 1.0 - (a1.t::DOUBLE / 1.0)*(a1.t::DOUBLE / 1.0)
       / a1.b::DOUBLE) / (a1.b::DOUBLE - 1.0) AS v1,
    (a2.u::DOUBLE / 4.0 - (a2.t::DOUBLE / 2.0)*(a2.t::DOUBLE / 2.0)
       / a2.b::DOUBLE) / (a2.b::DOUBLE - 1.0) AS v2,
    (a4.u::DOUBLE / 16.0 - (a4.t::DOUBLE / 4.0)*(a4.t::DOUBLE / 4.0)
       / a4.b::DOUBLE) / (a4.b::DOUBLE - 1.0) AS v4,
    (a8.u::DOUBLE / 64.0 - (a8.t::DOUBLE / 8.0)*(a8.t::DOUBLE / 8.0)
       / a8.b::DOUBLE) / (a8.b::DOUBLE - 1.0) AS v8
  FROM a1, a2, a4, a8
), s AS (
  SELECT n_events, v1, v2, v4, v8,
    (log2(v1) + log2(v2) + log2(v4) + log2(v8)) / 4.0 AS ybar
  FROM v
), f AS (
  SELECT n_events, v1, v2, v4, v8,
    ((log2(v1) - ybar) * (0.0 - 1.5)
     + (log2(v2) - ybar) * (1.0 - 1.5)
     + (log2(v4) - ybar) * (2.0 - 1.5)
     + (log2(v8) - ybar) * (3.0 - 1.5)) / 5.0 AS slope
  FROM s
)
SELECT n_events,
  round(v1 / 10000.0, 6) AS var_m1,
  round(v2 / 10000.0, 6) AS var_m2,
  round(v4 / 10000.0, 6) AS var_m4,
  round(v8 / 10000.0, 6) AS var_m8,
  round(slope, 6) AS slope,
  round(1.0 + slope / 2.0, 6) AS hurst
FROM f
"""

QUERIES["hurst_variance_plot"] = q_hurst_variance_plot
_RAW_ORACLES["hurst_variance_plot"] = SQL_HURST_VARIANCE_PLOT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_logrank_test(spark, sf_dir):
    """Two-arm log-rank test (Mantel 1966; Peto & Peto 1972) of
    inter-purchase gap-time curves between md5-parity arms — the
    survival-curve companion to srm_check/did_estimate: arms are
    hash-random, so the expected chi-square is ~1 and a large value
    flags a broken assignment or a gap metric leaking the arm.
    Survival variable: each user's consecutive purchase gaps
    (completed gap = event; the final open gap, last purchase ->
    corpus end, is right-censored), hour bins — the recurrent-event
    gap-time pooling (within-user correlation caveat per
    Andersen & Gill 1982 noted; as an assignment AUDIT the hash
    randomization makes the null exact). The whole test reduces to
    the per-hour-bin curve frame: deaths/censored per (bin, arm) are
    exact longs, at-risk counts are integer suffix sums over the
    <=720-row bin frame, the hypergeometric O-E and variance terms
    fold SEQUENTIALLY in bin order (each term a fixed expression of
    exact longs), and chi2 = one final division. At 10^12 events
    only the binned curve crosses the global window."""
    d = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("__e"),
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        "event_id",
    )
    mx = _events(spark, sf_dir).agg(
        F.max(F.col("ts").cast("timestamp").cast("double")).alias("__mx")
    )
    wlead = Window.partitionBy("__e").orderBy("__t", "event_id")
    g = d.withColumn("__nxt", F.lead("__t").over(wlead)).join(
        F.broadcast(mx)
    )
    sv = g.select(
        F.floor(
            (F.coalesce(F.col("__nxt"), F.col("__mx")) - F.col("__t"))
            / F.lit(3600.0)
        ).cast("long").alias("__day"),
        F.when(F.col("__nxt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("__obs"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("lr|"),
                                   F.col("__e").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    curve = sv.groupBy("__day").agg(
        F.sum(F.when(F.col("__arm") == 1, F.col("__obs")).otherwise(0))
        .cast("long").alias("__d1"),
        F.sum(F.when(F.col("__arm") == 1, 1 - F.col("__obs")).otherwise(0))
        .cast("long").alias("__c1"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__obs")).otherwise(0))
        .cast("long").alias("__d0"),
        F.sum(F.when(F.col("__arm") == 0, 1 - F.col("__obs")).otherwise(0))
        .cast("long").alias("__c0"),
    )
    wall = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tall = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = curve.select(
        "*",
        (
            F.sum(F.col("__d1") + F.col("__c1")).over(tall)
            - F.coalesce(
                F.sum(F.col("__d1") + F.col("__c1")).over(wall), F.lit(0)
            )
        ).cast("long").alias("__n1"),
        (
            F.sum(
                F.col("__d1") + F.col("__c1") + F.col("__d0") + F.col("__c0")
            ).over(tall)
            - F.coalesce(
                F.sum(
                    F.col("__d1") + F.col("__c1")
                    + F.col("__d0") + F.col("__c0")
                ).over(wall),
                F.lit(0),
            )
        ).cast("long").alias("__nt"),
    )
    agg = curve.agg(
        F.sum("__d1").cast("long").alias("obs_deaths_arm1"),
        F.sum("__d0").cast("long").alias("obs_deaths_arm0"),
        F.array_sort(
            F.collect_list(
                F.struct("__day", "__d1", "__d0", "__n1", "__nt")
            )
        ).alias("__a"),
    )
    oe = F.expr(
        "aggregate(__a, 0.0D, (acc, x) -> acc + (CASE WHEN"
        " x.__d1 + x.__d0 > 0 THEN cast(x.__d1 as double)"
        " - cast(x.__d1 + x.__d0 as double) * cast(x.__n1 as double)"
        " / cast(x.__nt as double) ELSE 0.0D END))"
    )
    vv = F.expr(
        "aggregate(__a, 0.0D, (acc, x) -> acc + (CASE WHEN"
        " x.__d1 + x.__d0 > 0 AND x.__nt > 1 THEN"
        " cast(x.__d1 + x.__d0 as double)"
        " * (cast(x.__n1 as double) / cast(x.__nt as double))"
        " * (cast(x.__nt - x.__n1 as double) / cast(x.__nt as double))"
        " * (cast(x.__nt - x.__d1 - x.__d0 as double)"
        "    / cast(x.__nt - 1 as double)) ELSE 0.0D END))"
    )
    agg = agg.withColumn("__oe", oe).withColumn("__v", vv)
    return agg.select(
        "obs_deaths_arm1",
        "obs_deaths_arm0",
        _r6(F.col("obs_deaths_arm1") - F.col("__oe"))
        .alias("expected_deaths_arm1"),
        _r6("__oe").alias("o_minus_e"),
        _r6("__v").alias("variance"),
        _r6(F.col("__oe") * F.col("__oe") / F.col("__v")).alias("chi2"),
    )


SQL_LOGRANK_TEST = """
WITH mx AS (SELECT max(epoch(ts)) AS mx FROM events),
d AS (
  SELECT user_id AS e, epoch(ts) AS t,
    lead(epoch(ts)) OVER (PARTITION BY user_id
                          ORDER BY epoch(ts), event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
),
sv AS (
  SELECT CAST(floor((coalesce(nxt, (SELECT mx FROM mx)) - t) / 3600.0)
              AS BIGINT) AS day,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs,
    CAST(('0x' || substring(md5('lr|' || CAST(e AS VARCHAR)), 1, 15))
      ::UBIGINT % 2 AS BIGINT) AS arm
  FROM d
), curve AS (
  SELECT day,
    CAST(sum(CASE WHEN arm = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
    CAST(sum(CASE WHEN arm = 1 THEN 1 - obs ELSE 0 END) AS BIGINT)
      AS c1,
    CAST(sum(CASE WHEN arm = 0 THEN obs ELSE 0 END) AS BIGINT) AS d0,
    CAST(sum(CASE WHEN arm = 0 THEN 1 - obs ELSE 0 END) AS BIGINT)
      AS c0
  FROM sv GROUP BY day
), risk AS (
  SELECT day, d1, d0,
    CAST((SELECT sum(d1 + c1) FROM curve)
      - coalesce(sum(d1 + c1) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS n1,
    CAST((SELECT sum(d1 + c1 + d0 + c0) FROM curve)
      - coalesce(sum(d1 + c1 + d0 + c0) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS nt
  FROM curve
), f AS (
  SELECT CAST(sum(d1) AS BIGINT) AS obs1,
    CAST(sum(d0) AS BIGINT) AS obs0,
    list_sum(list(CASE WHEN d1 + d0 > 0 THEN d1::DOUBLE
      - (d1 + d0)::DOUBLE * n1::DOUBLE / nt::DOUBLE
      ELSE 0.0 END ORDER BY day)) AS oe,
    list_sum(list(CASE WHEN d1 + d0 > 0 AND nt > 1 THEN
      (d1 + d0)::DOUBLE * (n1::DOUBLE / nt::DOUBLE)
      * ((nt - n1)::DOUBLE / nt::DOUBLE)
      * ((nt - d1 - d0)::DOUBLE / (nt - 1)::DOUBLE)
      ELSE 0.0 END ORDER BY day)) AS v
  FROM risk
)
SELECT obs1 AS obs_deaths_arm1, obs0 AS obs_deaths_arm0,
  round(obs1 - oe, 6) AS expected_deaths_arm1,
  round(oe, 6) AS o_minus_e,
  round(v, 6) AS variance,
  round(oe * oe / v, 6) AS chi2
FROM f
"""

QUERIES["logrank_test"] = q_logrank_test
_RAW_ORACLES["logrank_test"] = SQL_LOGRANK_TEST
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_segmented_trend(spark, sf_dir):
    """Best single-breakpoint two-piece linear trend of daily event
    volume (segmented/piecewise regression with the break chosen by
    least squares — Quandt 1958's likelihood-ratio formulation,
    Bai & Perron 1998 for the general program; the changepoint
    complement to cusum_changepoint that returns the fitted TREND
    LINES, not just the shift day): for every candidate break b with
    >= 3 days each side, fit separate OLS lines to daily counts on
    [1..b] and (b..D], pick the b minimizing total SSE (smallest-b
    tie-break), and report both slopes plus the single-line fit and
    the SSE reduction share. All OLS moments (n, Sx, Sy, Sxy, Sxx,
    Syy per side) are exact-integer prefix/suffix sums over the
    <=31-row day frame — the corpus is touched ONCE by the day
    aggregate; every SSE is a fixed expression tree; argmin via
    min(struct(sse, b)) on deterministic doubles. At 10^12 rows the
    candidate scan is still a 31-row frame."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    wcum = Window.orderBy("__x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tall = Window.orderBy("__x").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = day.select(
        F.col("__x").alias("b"),
        F.count(F.lit(1)).over(wcum).cast("long").alias("nl"),
        F.sum("__x").over(wcum).cast("long").alias("sxl"),
        F.sum("__y").over(wcum).cast("long").alias("syl"),
        F.sum(F.col("__x") * F.col("__y")).over(wcum).cast("long")
        .alias("sxyl"),
        F.sum(F.col("__x") * F.col("__x")).over(wcum).cast("long")
        .alias("sxxl"),
        F.sum(F.col("__y") * F.col("__y")).over(wcum).cast("long")
        .alias("syyl"),
        F.count(F.lit(1)).over(tall).cast("long").alias("nt"),
        F.sum("__x").over(tall).cast("long").alias("sxt"),
        F.sum("__y").over(tall).cast("long").alias("syt"),
        F.sum(F.col("__x") * F.col("__y")).over(tall).cast("long")
        .alias("sxyt"),
        F.sum(F.col("__x") * F.col("__x")).over(tall).cast("long")
        .alias("sxxt"),
        F.sum(F.col("__y") * F.col("__y")).over(tall).cast("long")
        .alias("syyt"),
    ).filter(
        (F.col("nl") >= 3) & (F.col("nt") - F.col("nl") >= 3)
    )

    def sse(n, sx, sy, sxy, sxx, syy):
        nd = n.cast("double")
        sxd, syd = sx.cast("double"), sy.cast("double")
        sxyd, sxxd, syyd = (sxy.cast("double"), sxx.cast("double"),
                            syy.cast("double"))
        sxx_c = sxxd - sxd * sxd / nd
        sxy_c = sxyd - sxd * syd / nd
        syy_c = syyd - syd * syd / nd
        return syy_c - sxy_c * sxy_c / sxx_c

    def slope(n, sx, sy, sxy, sxx):
        nd = n.cast("double")
        return (sxy.cast("double") - sx.cast("double") * sy.cast("double")
                / nd) / (sxx.cast("double")
                         - sx.cast("double") * sx.cast("double") / nd)

    nr = F.col("nt") - F.col("nl")
    sxr = F.col("sxt") - F.col("sxl")
    syr = F.col("syt") - F.col("syl")
    sxyr = F.col("sxyt") - F.col("sxyl")
    sxxr = F.col("sxxt") - F.col("sxxl")
    syyr = F.col("syyt") - F.col("syyl")
    sse_l = sse(F.col("nl"), F.col("sxl"), F.col("syl"), F.col("sxyl"),
                F.col("sxxl"), F.col("syyl"))
    sse_r = sse(nr, sxr, syr, sxyr, sxxr, syyr)
    sse0 = sse(F.col("nt"), F.col("sxt"), F.col("syt"), F.col("sxyt"),
               F.col("sxxt"), F.col("syyt"))
    cand = c.select(
        "b",
        (sse_l + sse_r).alias("__sse"),
        slope(F.col("nl"), F.col("sxl"), F.col("syl"), F.col("sxyl"),
              F.col("sxxl")).alias("__sll"),
        slope(nr, sxr, syr, sxyr, sxxr).alias("__slr"),
        sse0.alias("__sse0"),
    )
    best = cand.agg(
        F.min(F.struct(F.col("__sse"), F.col("b"), F.col("__sll"),
                       F.col("__slr"), F.col("__sse0"))).alias("w")
    )
    return best.select(
        F.col("w.b").alias("break_day"),
        _r6(F.col("w.__sll")).alias("slope_left"),
        _r6(F.col("w.__slr")).alias("slope_right"),
        _r6(F.col("w.__sse")).alias("sse_two_piece"),
        _r6(F.col("w.__sse0")).alias("sse_single_line"),
        _r6((F.col("w.__sse0") - F.col("w.__sse")) / F.col("w.__sse0"))
        .alias("sse_reduction"),
    )


SQL_SEGMENTED_TREND = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), c AS (
  SELECT x AS b,
    CAST(count(*) OVER w AS BIGINT) AS nl,
    CAST(sum(x) OVER w AS BIGINT) AS sxl,
    CAST(sum(y) OVER w AS BIGINT) AS syl,
    CAST(sum(x*y) OVER w AS BIGINT) AS sxyl,
    CAST(sum(x*x) OVER w AS BIGINT) AS sxxl,
    CAST(sum(y*y) OVER w AS BIGINT) AS syyl,
    CAST(count(*) OVER t AS BIGINT) AS nt,
    CAST(sum(x) OVER t AS BIGINT) AS sxt,
    CAST(sum(y) OVER t AS BIGINT) AS syt,
    CAST(sum(x*y) OVER t AS BIGINT) AS sxyt,
    CAST(sum(x*x) OVER t AS BIGINT) AS sxxt,
    CAST(sum(y*y) OVER t AS BIGINT) AS syyt
  FROM day
  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW),
         t AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING)
), f AS (
  SELECT b,
    ((syyl::DOUBLE - syl::DOUBLE*syl::DOUBLE/nl::DOUBLE)
     - (sxyl::DOUBLE - sxl::DOUBLE*syl::DOUBLE/nl::DOUBLE)
       * (sxyl::DOUBLE - sxl::DOUBLE*syl::DOUBLE/nl::DOUBLE)
       / (sxxl::DOUBLE - sxl::DOUBLE*sxl::DOUBLE/nl::DOUBLE))
    + (((syyt-syyl)::DOUBLE
        - (syt-syl)::DOUBLE*(syt-syl)::DOUBLE/(nt-nl)::DOUBLE)
     - ((sxyt-sxyl)::DOUBLE
        - (sxt-sxl)::DOUBLE*(syt-syl)::DOUBLE/(nt-nl)::DOUBLE)
       * ((sxyt-sxyl)::DOUBLE
          - (sxt-sxl)::DOUBLE*(syt-syl)::DOUBLE/(nt-nl)::DOUBLE)
       / ((sxxt-sxxl)::DOUBLE
          - (sxt-sxl)::DOUBLE*(sxt-sxl)::DOUBLE/(nt-nl)::DOUBLE))
      AS sse,
    (sxyl::DOUBLE - sxl::DOUBLE*syl::DOUBLE/nl::DOUBLE)
      / (sxxl::DOUBLE - sxl::DOUBLE*sxl::DOUBLE/nl::DOUBLE) AS sll,
    ((sxyt-sxyl)::DOUBLE
       - (sxt-sxl)::DOUBLE*(syt-syl)::DOUBLE/(nt-nl)::DOUBLE)
      / ((sxxt-sxxl)::DOUBLE
         - (sxt-sxl)::DOUBLE*(sxt-sxl)::DOUBLE/(nt-nl)::DOUBLE)
      AS slr,
    ((syyt::DOUBLE - syt::DOUBLE*syt::DOUBLE/nt::DOUBLE)
     - (sxyt::DOUBLE - sxt::DOUBLE*syt::DOUBLE/nt::DOUBLE)
       * (sxyt::DOUBLE - sxt::DOUBLE*syt::DOUBLE/nt::DOUBLE)
       / (sxxt::DOUBLE - sxt::DOUBLE*sxt::DOUBLE/nt::DOUBLE)) AS sse0
  FROM c WHERE nl >= 3 AND nt - nl >= 3
)
SELECT b AS break_day,
  round(sll, 6) AS slope_left,
  round(slr, 6) AS slope_right,
  round(sse, 6) AS sse_two_piece,
  round(sse0, 6) AS sse_single_line,
  round((sse0 - sse) / sse0, 6) AS sse_reduction
FROM f ORDER BY sse, b LIMIT 1
"""

QUERIES["segmented_trend"] = q_segmented_trend
_RAW_ORACLES["segmented_trend"] = SQL_SEGMENTED_TREND


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall nonparametric trend test on daily event volume
    (Mann 1945, Kendall 1975; Hirsch et al. 1982 made it the standard
    monitoring-series audit): S = sum over day pairs i<j of
    sign(y_j - y_i), tie-corrected variance
    var = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18, and the
    continuity-corrected z. The significance companion to
    theil_sen_slope (magnitude) and segmented_trend (shape): it asks
    "is there a monotone trend at all" with no distributional
    assumption, which is the right first question for a pipeline
    volume monitor. The corpus is touched ONCE by the day aggregate;
    S comes from a registered-by-design BNLJ self-join of the
    persisted <=31-row day frame (a bounded 31x31 pair sweep, never a
    corpus join); the tie term regroups the same frame. S, n and the
    tie term are exact longs; var is ONE division of exact integers;
    z is a fixed expression tree (IEEE sqrt is correctly rounded, so
    cross-engine exact). At 10^12 rows the pair sweep is still 465
    comparisons."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = scratch_persist(
        ev.groupBy("__x").agg(
            F.count(F.lit(1)).cast("long").alias("__y")
        )
    )
    d1 = day.select(F.col("__x").alias("x1"), F.col("__y").alias("y1"))
    d2 = day.select(F.col("__x").alias("x2"), F.col("__y").alias("y2"))
    sfrm = (
        d1.join(d2, F.col("x1") < F.col("x2"))
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y1"), 1)
                .when(F.col("y2") < F.col("y1"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    tiefrm = (
        day.groupBy("__y")
        .agg(F.count(F.lit(1)).cast("long").alias("__t"))
        .agg(
            F.sum("__t").cast("long").alias("n_days"),
            F.sum(
                F.col("__t") * (F.col("__t") - 1)
                * (2 * F.col("__t") + 5)
            ).cast("long").alias("tie_term"),
        )
    )
    f = sfrm.crossJoin(tiefrm)
    n = F.col("n_days")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double")
        / F.lit(18.0)
    )
    s = F.col("s_stat")
    z = (
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var_s))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return f.select(
        "n_days",
        "s_stat",
        "tie_term",
        _r6(var_s).alias("var_s"),
        _r6(z).alias("z_score"),
        F.when(s > 0, F.lit("increasing"))
        .when(s < 0, F.lit("decreasing"))
        .otherwise(F.lit("no_trend")).alias("trend"),
    )


SQL_MANN_KENDALL = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), s AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
         AS s_stat
  FROM day a JOIN day b ON a.x < b.x
), t AS (
  SELECT CAST(sum(tt) AS BIGINT) AS n_days,
         CAST(sum(tt*(tt-1)*(2*tt+5)) AS BIGINT) AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS tt FROM day GROUP BY y)
), f AS (
  SELECT n_days, s_stat, tie_term,
    CAST(n_days*(n_days-1)*(2*n_days+5) - tie_term AS DOUBLE) / 18.0
      AS var_s
  FROM s, t
)
SELECT n_days, s_stat, tie_term,
  round(var_s, 6) AS var_s,
  round(CASE WHEN s_stat > 0
             THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
             WHEN s_stat < 0
             THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
             ELSE 0.0 END, 6) AS z_score,
  CASE WHEN s_stat > 0 THEN 'increasing'
       WHEN s_stat < 0 THEN 'decreasing'
       ELSE 'no_trend' END AS trend
FROM f
"""

QUERIES["mann_kendall"] = q_mann_kendall
_RAW_ORACLES["mann_kendall"] = SQL_MANN_KENDALL


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test of the daily event-volume sequence
    around its median (Wald & Wolfowitz 1940; the classic randomness
    audit — too FEW runs means the series is sticky/trending, too MANY
    means oscillation, either way iid-based monitors are miscalibrated
    and block-wise resampling is required). Days equal to the median
    are dropped (the standard treatment); R = 1 + #sign changes,
    E[R] = 1 + 2*n1*n2/n, Var[R] = 2*n1*n2*(2*n1*n2 - n)/(n^2*(n-1)).
    The corpus is touched ONCE by the day aggregate; everything after
    runs on the persisted <=31-row day frame: the median is kept as
    the INTEGER doubled statistic med2 = y_lo + y_hi (so the
    above/below classification never touches a float), the sign
    changes come from one lag over the tiny frame, and E/Var/z are
    fixed expression trees over exact longs. The single-partition
    windows scan 31 rows by construction at any corpus scale."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = scratch_persist(
        ev.groupBy("__x").agg(
            F.count(F.lit(1)).cast("long").alias("__y")
        )
    )
    wr = Window.orderBy("__y", "__x")
    ranked = day.select(
        "__x", "__y",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.orderBy("__y", "__x").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__n"),
    )
    med = ranked.agg(
        (
            F.sum(
                F.when(
                    F.col("__rn") == F.floor((F.col("__n") + 1) / 2),
                    F.col("__y"),
                ).otherwise(0)
            )
            + F.sum(
                F.when(
                    F.col("__rn") == F.floor(F.col("__n") / 2) + 1,
                    F.col("__y"),
                ).otherwise(0)
            )
        ).cast("long").alias("med2")
    )
    signs = (
        day.crossJoin(med)
        .filter(2 * F.col("__y") != F.col("med2"))
        .select(
            "__x",
            F.when(2 * F.col("__y") > F.col("med2"), 1)
            .otherwise(0).alias("__s"),
        )
    )
    lagged = signs.select(
        "__s", F.lag("__s").over(Window.orderBy("__x")).alias("__p")
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("__s").cast("long").alias("n_above"),
        (
            1
            + F.sum(
                F.when(
                    F.col("__p").isNotNull()
                    & (F.col("__p") != F.col("__s")),
                    1,
                ).otherwise(0)
            )
        ).cast("long").alias("runs"),
    )
    n1 = F.col("n_above")
    nk = F.col("n_kept")
    n2 = nk - n1
    two = (2 * n1 * n2).cast("double")
    e_runs = F.lit(1.0) + two / nk.cast("double")
    var_runs = (
        two * (two - nk.cast("double"))
        / (nk.cast("double") * nk.cast("double")
           * (nk - 1).cast("double"))
    )
    z = F.when(
        var_runs > 0,
        (F.col("runs").cast("double") - e_runs) / F.sqrt(var_runs),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_kept",
        "n_above",
        n2.alias("n_below"),
        "runs",
        _r6(e_runs).alias("expected_runs"),
        _r6(var_runs).alias("var_runs"),
        _r6(z).alias("z_score"),
    )


SQL_RUNS_TEST = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), ranked AS (
  SELECT x, y, row_number() OVER (ORDER BY y, x) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM day
), med AS (
  SELECT CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN y ELSE 0 END)
            + sum(CASE WHEN rn = n // 2 + 1 THEN y ELSE 0 END)
         AS BIGINT) AS med2
  FROM ranked
), s AS (
  SELECT x, CASE WHEN 2*y > med2 THEN 1 ELSE 0 END AS sgn
  FROM day, med WHERE 2*y <> med2
), lagged AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY x) AS prev FROM s
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(sgn) AS BIGINT) AS n_above,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND prev <> sgn
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM lagged
), f AS (
  SELECT n_kept, n_above, n_kept - n_above AS n_below, runs,
    1.0 + CAST(2*n_above*(n_kept-n_above) AS DOUBLE)
        / CAST(n_kept AS DOUBLE) AS e_runs,
    CAST(2*n_above*(n_kept-n_above) AS DOUBLE)
      * (CAST(2*n_above*(n_kept-n_above) AS DOUBLE)
         - CAST(n_kept AS DOUBLE))
      / (CAST(n_kept AS DOUBLE) * CAST(n_kept AS DOUBLE)
         * CAST(n_kept - 1 AS DOUBLE)) AS var_runs
  FROM agg
)
SELECT n_kept, n_above, n_below, runs,
  round(e_runs, 6) AS expected_runs,
  round(var_runs, 6) AS var_runs,
  round(CASE WHEN var_runs > 0
             THEN (CAST(runs AS DOUBLE) - e_runs) / sqrt(var_runs)
             ELSE 0.0 END, 6) AS z_score
FROM f
"""

QUERIES["runs_test"] = q_runs_test
_RAW_ORACLES["runs_test"] = SQL_RUNS_TEST


def q_bpe_merge_step(spark, sf_dir):
    """One byte-pair-encoding merge iteration over the corpus word
    streams (Gage 1994; Sennrich, Haddow & Birch 2016 made it THE
    subword tokenizer-training step): count every adjacent token pair,
    pick the most frequent (count desc, then lexicographic — the
    deterministic tie-break real BPE trainers pin), and report what
    applying that merge greedily left-to-right does to the corpus
    token count. The pair stream is the posting-list (doc, pos+1)
    equi-join — the phrase_search shape, only positions shuffle, never
    a theta join; the posting frame is persisted so the corpus
    tokenizes ONCE. Greedy application never needs a sequential fold:
    two occurrences of (A,B) can share a token only when A == B, so
    merges_applied = pair_count for A != B, and for A == B it is
    sum(floor(L/2)) over maximal runs of A — recovered exactly by
    gaps-and-islands (pos - row_number) on A's postings. Counts are
    exact longs; the one float is the reduction share. At 10^12 tokens
    this is the real first iteration of a distributed BPE trainer:
    pair counts are one word-pair-keyed agg, the argmax is a 1-row
    frame, and the run-length pass touches only the winning token's
    postings."""
    from mpds_spark.operators.util import scratch_persist

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("__w")
    )
    post = scratch_persist(
        docs.select(
            "doc_id", F.posexplode("__w").alias("__p", "__word")
        )
    )
    a = post.select(
        F.col("doc_id").alias("d1"), F.col("__p").alias("p1"),
        F.col("__word").alias("w1"),
    )
    b = post.select(
        F.col("doc_id").alias("d2"), F.col("__p").alias("p2"),
        F.col("__word").alias("w2"),
    )
    cnts = (
        a.join(
            b,
            (F.col("d1") == F.col("d2"))
            & (F.col("p2") == F.col("p1") + 1),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = cnts.agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("nc"),
                F.col("w1").alias("tw1"),
                F.col("w2").alias("tw2"),
            )
        ).alias("t")
    ).select(
        F.col("t.tw1").alias("tw1"),
        F.col("t.tw2").alias("tw2"),
        (-F.col("t.nc")).cast("long").alias("pair_count"),
    )
    tot = post.agg(
        F.count(F.lit(1)).cast("long").alias("tokens_before")
    )
    wisl = Window.partitionBy("doc_id").orderBy("__p")
    eq_app = (
        post.crossJoin(top.select("tw1"))
        .filter(F.col("__word") == F.col("tw1"))
        .select(
            "doc_id",
            (F.col("__p") - F.row_number().over(wisl)).alias("__g"),
        )
        .groupBy("doc_id", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__L"))
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("__L") / 2)), F.lit(0)
            ).cast("long").alias("eq_app")
        )
    )
    f = top.crossJoin(tot).crossJoin(eq_app)
    applied = F.when(
        F.col("tw1") == F.col("tw2"), F.col("eq_app")
    ).otherwise(F.col("pair_count"))
    return f.select(
        F.col("tw1").alias("pair_left"),
        F.col("tw2").alias("pair_right"),
        "pair_count",
        applied.alias("merges_applied"),
        "tokens_before",
        (F.col("tokens_before") - applied).alias("tokens_after"),
        _r6(
            applied.cast("double")
            / F.col("tokens_before").cast("double")
        ).alias("reduction_share"),
    )


SQL_BPE_MERGE_STEP = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), pairs AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM ws)
), top AS (
  SELECT w1 AS tw1, w2 AS tw2, CAST(count(*) AS BIGINT) AS pair_count
  FROM pairs GROUP BY w1, w2
  ORDER BY count(*) DESC, w1, w2 LIMIT 1
), tot AS (
  SELECT CAST(sum(len(w)) AS BIGINT) AS tokens_before FROM ws
), occ AS (
  SELECT doc_id, i
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM ws),
       top
  WHERE w[i] = top.tw1
), runs AS (
  SELECT CAST(count(*) AS BIGINT) AS L
  FROM (SELECT doc_id,
          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM occ)
  GROUP BY doc_id, g
), eqapp AS (
  SELECT CAST(coalesce(sum(L // 2), 0) AS BIGINT) AS eq_app FROM runs
)
SELECT tw1 AS pair_left, tw2 AS pair_right, pair_count,
  CASE WHEN tw1 = tw2 THEN eq_app ELSE pair_count END
    AS merges_applied,
  tokens_before,
  tokens_before - CASE WHEN tw1 = tw2 THEN eq_app ELSE pair_count END
    AS tokens_after,
  round(CAST(CASE WHEN tw1 = tw2 THEN eq_app ELSE pair_count END
             AS DOUBLE)
        / CAST(tokens_before AS DOUBLE), 6) AS reduction_share
FROM top, tot, eqapp
"""

QUERIES["bpe_merge_step"] = q_bpe_merge_step
_RAW_ORACLES["bpe_merge_step"] = SQL_BPE_MERGE_STEP


def q_padding_waste_audit(spark, sf_dir):
    """Batch padding-waste audit: how many pad tokens does fixed-size-8
    batching burn per source under arrival-order vs length-sorted
    batching (the bucketed-batching argument every seq2seq/LLM trainer
    makes — Vaswani et al. 2017 tensor2tensor and fairseq both ship
    length-bucketed loaders; this measures the win on OUR corpus
    instead of assuming it). Per (source, batch of 8 consecutive
    docs): padded cost = rows * max(len), waste = padded - real.
    Everything is exact longs off ONE persisted per-doc length frame;
    waste_pct is the single division. The per-source row_number is the
    per-shard sort a real loader does; at 10^12 docs each source
    partition range-sorts independently (the documented
    range-partition + boundary-carry variant applies if one source
    dominates)."""
    from mpds_spark.operators.util import scratch_persist

    d = scratch_persist(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source",
            F.size(F.split(F.col("text"), " ")).cast("long")
            .alias("__l"),
        )
    )

    def audit(order_cols, label):
        w = Window.partitionBy("source").orderBy(*order_cols)
        batched = d.select(
            "source", "__l",
            F.floor((F.row_number().over(w) - 1) / 8).alias("__b"),
        )
        per_batch = batched.groupBy("source", "__b").agg(
            F.count(F.lit(1)).cast("long").alias("__rows"),
            F.max("__l").alias("__mx"),
            F.sum("__l").cast("long").alias("__real"),
        )
        agg = per_batch.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("__real").cast("long").alias("real_tokens"),
            F.sum(F.col("__rows") * F.col("__mx")).cast("long")
            .alias("padded_tokens"),
        )
        return agg.select(
            F.lit(label).alias("strategy"),
            "source", "n_batches", "real_tokens", "padded_tokens",
            _r6(
                (F.col("padded_tokens") - F.col("real_tokens"))
                .cast("double")
                / F.col("padded_tokens").cast("double")
            ).alias("waste_pct"),
        )

    return audit([F.col("doc_id")], "arrival").unionAll(
        audit([F.col("__l"), F.col("doc_id")], "length_sorted")
    )


SQL_PADDING_WASTE = """
WITH d AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS l
  FROM documents
), a AS (
  SELECT source, l,
    (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 8
      AS b
  FROM d
), s AS (
  SELECT source, l,
    (row_number() OVER (PARTITION BY source ORDER BY l, doc_id) - 1)
      // 8 AS b
  FROM d
), pa AS (
  SELECT source, b, CAST(count(*) AS BIGINT) AS rows_,
    CAST(max(l) AS BIGINT) AS mx, CAST(sum(l) AS BIGINT) AS real_
  FROM a GROUP BY source, b
), ps AS (
  SELECT source, b, CAST(count(*) AS BIGINT) AS rows_,
    CAST(max(l) AS BIGINT) AS mx, CAST(sum(l) AS BIGINT) AS real_
  FROM s GROUP BY source, b
), fa AS (
  SELECT 'arrival' AS strategy, source,
    CAST(count(*) AS BIGINT) AS n_batches,
    CAST(sum(real_) AS BIGINT) AS real_tokens,
    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens
  FROM pa GROUP BY source
), fs AS (
  SELECT 'length_sorted' AS strategy, source,
    CAST(count(*) AS BIGINT) AS n_batches,
    CAST(sum(real_) AS BIGINT) AS real_tokens,
    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens
  FROM ps GROUP BY source
), u AS (
  SELECT * FROM fa UNION ALL SELECT * FROM fs
)
SELECT strategy, source, n_batches, real_tokens, padded_tokens,
  round(CAST(padded_tokens - real_tokens AS DOUBLE)
        / CAST(padded_tokens AS DOUBLE), 6) AS waste_pct
FROM u
"""

QUERIES["padding_waste_audit"] = q_padding_waste_audit
_RAW_ORACLES["padding_waste_audit"] = SQL_PADDING_WASTE


def _chi2_inv_1dof(p: float) -> float:
    """Inverse upper-tail chi-square(1): the z with erfc(z/sqrt(2)) = p,
    squared. 200 deterministic bisection steps on [0, 40] converge past
    double resolution, so the returned literal is a pure function of p —
    the SAME double is embedded in the Spark plan and the DuckDB SQL
    (repr round-trips doubles exactly), and the BH comparisons stay
    cross-engine exact."""
    import math

    lo, hi = 0.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(mid / math.sqrt(2.0)) > p:
            lo = mid
        else:
            hi = mid
    z = (lo + hi) / 2
    return z * z


_BH_M = 24
_BH_ALPHA = 0.05
_BH_CRITS = [
    _chi2_inv_1dof(i * _BH_ALPHA / _BH_M) for i in range(1, _BH_M + 1)
]


def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg step-up FDR control over the 24 simultaneous
    per-hour purchase-rate tests (Benjamini & Hochberg 1995 — THE
    multiple-testing correction for feature screens and metric sweeps;
    running 24 hourly tests at alpha=0.05 uncorrected expects a false
    alarm, which is how seasonality dashboards cry wolf). Each hour
    gets the one-sample binomial chi-square against the pooled rate (a
    fixed expression tree of exact longs, so the statistic is
    cross-engine exact); BH works in chi2 space — p_(i) <= i*alpha/m
    iff chi2_(i) >= chi2inv(1 - i*alpha/m) — with the 24 critical
    values precomputed ONCE by deterministic bisection and embedded as
    identical literals on both engines, so no runtime erf is needed
    (Spark has none). Reject ranks 1..k where k is the LARGEST
    satisfied rank (the step-up rule — a window max over the 24-row
    frame, so a non-monotone chi2 sequence still rejects everything
    below the last crossing). ONE corpus aggregate; everything after
    runs on 24 rows at any scale."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("hour"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0).alias("__pur"),
    )
    c = ev.groupBy("hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__pur").cast("long").alias("purchases"),
    )
    tall = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = c.select(
        "hour", "n_events", "purchases",
        F.sum("n_events").over(tall).cast("long").alias("__N"),
        F.sum("purchases").over(tall).cast("long").alias("__X"),
    )
    nd = F.col("n_events").cast("double")
    xd = F.col("purchases").cast("double")
    Nd = F.col("__N").cast("double")
    Xd = F.col("__X").cast("double")
    num = xd - nd * Xd / Nd
    den = nd * (Xd / Nd) * (F.lit(1.0) - Xd / Nd)
    s = t.select(
        "hour", "n_events", "purchases",
        (xd / nd).alias("__rate"),
        (num * num / den).alias("__chi2"),
    )
    wr = Window.orderBy(F.desc("__chi2"), "hour")
    crit_arr = F.array(*[F.lit(v) for v in _BH_CRITS])
    r = s.select(
        "hour", "n_events", "purchases", "__rate", "__chi2",
        F.row_number().over(wr).alias("rank"),
    ).select(
        "*", F.element_at(crit_arr, F.col("rank")).alias("__crit")
    )
    wk = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    k = F.max(
        F.when(F.col("__chi2") >= F.col("__crit"), F.col("rank"))
        .otherwise(0)
    ).over(wk)
    return r.select(
        "hour", "n_events", "purchases",
        _r6(F.col("__rate")).alias("rate"),
        _r6(F.col("__chi2")).alias("chi2"),
        "rank",
        _r6(F.col("__crit")).alias("bh_critical"),
        (F.col("rank") <= k).alias("rejected"),
    )


_BH_VALUES = ",\n         ".join(
    f"({i + 1}, CAST({v!r} AS DOUBLE))" for i, v in enumerate(_BH_CRITS)
)

SQL_BH_FDR = f"""
WITH c AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hour,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS purchases
  FROM events GROUP BY 1
), t AS (
  SELECT hour, n_events, purchases,
    CAST(sum(n_events) OVER () AS BIGINT) AS nn,
    CAST(sum(purchases) OVER () AS BIGINT) AS xx
  FROM c
), s AS (
  SELECT hour, n_events, purchases,
    CAST(purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS rate,
    ((CAST(purchases AS DOUBLE)
      - CAST(n_events AS DOUBLE) * CAST(xx AS DOUBLE)
        / CAST(nn AS DOUBLE))
     * (CAST(purchases AS DOUBLE)
        - CAST(n_events AS DOUBLE) * CAST(xx AS DOUBLE)
          / CAST(nn AS DOUBLE)))
    / (CAST(n_events AS DOUBLE)
       * (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
       * (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))) AS chi2
  FROM t
), r AS (
  SELECT *, row_number() OVER (ORDER BY chi2 DESC, hour) AS rank
  FROM s
), cr (rank, crit) AS (
  VALUES {_BH_VALUES}
), j AS (
  SELECT r.*, cr.crit FROM r JOIN cr ON r.rank = cr.rank
), k AS (
  SELECT max(CASE WHEN chi2 >= crit THEN rank ELSE 0 END) AS kmax
  FROM j
)
SELECT hour, n_events, purchases,
  round(rate, 6) AS rate,
  round(chi2, 6) AS chi2,
  rank,
  round(crit, 6) AS bh_critical,
  rank <= kmax AS rejected
FROM j, k
"""

QUERIES["bh_fdr"] = q_bh_fdr
_RAW_ORACLES["bh_fdr"] = SQL_BH_FDR


def q_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes beta-binomial shrinkage of per-user purchase
    rates with the prior FITTED from the data by method of moments
    (Robbins 1956 empirical Bayes; the beta-binomial MoM is the
    textbook Efron & Morris 1975 batting-average treatment): estimate
    (m, v) = mean/variance of raw rates across users with n >= 5,
    prior strength s = m(1-m)/v - 1, alpha = m*s, beta = (1-m)*s,
    shrunk rate = (x + alpha)/(n + alpha + beta). The data-driven
    companion to rate_shrinkage's FIXED prior strength 20 — here the
    data says how much to trust small samples. The corpus aggregates
    to per-user (x, n), then to the DISTINCT (x, n) CELL histogram, so
    the rate moments are sequential folds over the (n, x)-sorted
    bounded cell array (the theil_index convention — no per-row float
    reduction ever touches the user frame, and at 10^12 users the cell
    frame is still bounded by max-events-per-user^2). MoM caveat
    documented: if between-user variance is sub-binomial the strength
    goes negative and EB is undefined — both engines emit the same
    fixed expressions either way, so the gate stays exact."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0).alias("__pur"),
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pur").cast("long").alias("x"),
    ).filter(F.col("n") >= 5)
    cells = scratch_persist(
        u.groupBy("x", "n").agg(
            F.count(F.lit(1)).cast("long").alias("users")
        )
    )
    xd = F.col("x").cast("double")
    ndc = F.col("n").cast("double")
    ud = F.col("users").cast("double")
    terms = cells.select(
        F.struct(
            F.col("n").alias("n"), F.col("x").alias("x"),
            (ud * (xd / ndc)).alias("t1"),
            (ud * (xd / ndc) * (xd / ndc)).alias("t2"),
        ).alias("__s"),
        "users",
    )
    st = terms.agg(
        F.sum("users").cast("long").alias("uu"),
        F.sort_array(F.collect_list("__s")).alias("__arr"),
    ).select(
        "uu",
        F.aggregate(
            F.transform(F.col("__arr"), lambda e: e["t1"]),
            F.lit(0.0), lambda a, b: a + b,
        ).alias("sr"),
        F.aggregate(
            F.transform(F.col("__arr"), lambda e: e["t2"]),
            F.lit(0.0), lambda a, b: a + b,
        ).alias("sr2"),
    )
    uud = F.col("uu").cast("double")
    m = F.col("sr") / uud
    v = (F.col("sr2") - F.col("sr") * F.col("sr") / uud) / (
        (F.col("uu") - 1).cast("double")
    )
    s = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    ab = st.select(
        (m * s).alias("__alpha"),
        ((F.lit(1.0) - m) * s).alias("__beta"),
    )
    f = cells.crossJoin(ab)
    return f.select(
        F.col("x").alias("purchases"),
        F.col("n").alias("n_events"),
        "users",
        _r6(xd / ndc).alias("raw_rate"),
        _r6(
            (xd + F.col("__alpha"))
            / (ndc + F.col("__alpha") + F.col("__beta"))
        ).alias("shrunk_rate"),
        _r6(F.col("__alpha")).alias("alpha"),
        _r6(F.col("__beta")).alias("beta"),
    )


SQL_EB_SHRINKAGE = """
WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS x
  FROM events GROUP BY 1
), cells AS (
  SELECT x, n, CAST(count(*) AS BIGINT) AS users
  FROM u WHERE n >= 5 GROUP BY x, n
), st AS (
  SELECT CAST(sum(users) AS BIGINT) AS uu,
    coalesce(list_reduce(
      list(CAST(users AS DOUBLE)
           * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
           ORDER BY n, x),
      (a, b) -> a + b), 0.0) AS sr,
    coalesce(list_reduce(
      list(CAST(users AS DOUBLE)
           * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
           ORDER BY n, x),
      (a, b) -> a + b), 0.0) AS sr2
  FROM cells
), p AS (
  SELECT uu, sr / CAST(uu AS DOUBLE) AS m,
    (sr2 - sr * sr / CAST(uu AS DOUBLE))
      / CAST(uu - 1 AS DOUBLE) AS v
  FROM st
), ab AS (
  SELECT m * (m * (1.0 - m) / v - 1.0) AS alpha,
         (1.0 - m) * (m * (1.0 - m) / v - 1.0) AS beta
  FROM p
)
SELECT c.x AS purchases, c.n AS n_events, c.users,
  round(CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE), 6) AS raw_rate,
  round((CAST(c.x AS DOUBLE) + alpha)
        / (CAST(c.n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
  round(alpha, 6) AS alpha,
  round(beta, 6) AS beta
FROM cells c, ab
"""

QUERIES["eb_shrinkage"] = q_eb_shrinkage
_RAW_ORACLES["eb_shrinkage"] = SQL_EB_SHRINKAGE


def q_kneser_ney_nll(spark, sf_dir):
    """Per-doc interpolated Kneser-Ney bigram NLL (operators/text.py
    kneser_ney_score; Kneser & Ney 1995, Chen & Goodman 1998 §2.7
    fixed-discount form, D = 0.75): the smoothing upgrade of
    bigram_nll whose continuation probabilities separate
    narrow-continuation boilerplate from fluent text. Forward and
    backward continuation counts and the type total all derive from
    the ONE persisted bigram-count frame; the occurrence stream joins
    back by bigram — occurrence-linear, no self-join."""
    from mpds_spark.operators.text import kneser_ney_score

    docs = load(spark, sf_dir, "documents")
    out = kneser_ney_score(docs, text="text", key="doc_id",
                           discount=0.75)
    return out.select(
        "doc_id", "n_bigrams", _r6("kn_nll").alias("kn_nll")
    )


SQL_KNESER_NEY_NLL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents
), occ AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ws)), i ->
      struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b
  FROM t WHERE len(ws) >= 2
), o2 AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM occ),
c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM o2 GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
    CAST(count(*) AS BIGINT) AS n1fw
  FROM c12 GROUP BY w1
), bw AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1bw FROM c12 GROUP BY w2
), tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c12)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
  round(avg(-ln(
    greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
    + (0.75 * CAST(n1fw AS DOUBLE) / CAST(c1 AS DOUBLE))
      * (CAST(n1bw AS DOUBLE) / CAST(t AS DOUBLE))
  )), 6) AS kn_nll
FROM o2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1) JOIN bw USING (w2)
CROSS JOIN tt
GROUP BY doc_id
"""

QUERIES["kneser_ney_nll"] = q_kneser_ney_nll
_RAW_ORACLES["kneser_ney_nll"] = SQL_KNESER_NEY_NLL


def q_levene_test(spark, sf_dir):
    """Brown-Forsythe homogeneity-of-variance test of event value
    across event types (Levene 1960 with Brown & Forsythe 1974's
    median centers — the robust pre-check before any pooled-variance
    t/F machinery, and the reason Welch pairs exist in this catalog:
    if this F is large, pooling is wrong). Deviations are kept
    INTEGER: z = |2*cents - med2_g| where med2_g is the group's
    doubled median (lo+hi middle ranks), so every per-row quantity and
    every group moment (n, sum z, sum z^2) is an exact long — the
    common factor 2 cancels inside F. The between-groups term folds
    S_g^2/n_g in group-sorted order over the tiny k-row frame; F is a
    fixed expression tree. ONE corpus exchange: the group-rank window,
    the median agg, the deviation pass and the moment agg all share
    the event_type partitioning."""
    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"),
        "event_id",
        (F.signum("value")
         * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)))
        .cast("long").alias("__c"),
    )
    wg = Window.partitionBy("g").orderBy("__c", "event_id")
    wn = Window.partitionBy("g")
    ranked = ev.select(
        "g", "__c",
        F.row_number().over(wg).alias("__rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("__n"),
    )
    med = ranked.groupBy("g").agg(
        (
            F.sum(
                F.when(
                    F.col("__rn") == F.floor((F.col("__n") + 1) / 2),
                    F.col("__c"),
                ).otherwise(0)
            )
            + F.sum(
                F.when(
                    F.col("__rn") == F.floor(F.col("__n") / 2) + 1,
                    F.col("__c"),
                ).otherwise(0)
            )
        ).cast("long").alias("med2")
    )
    z = ranked.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("__c") - F.col("med2")).alias("__z")
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("__z").cast("long").alias("s"),
        F.sum(F.col("__z") * F.col("__z")).cast("long").alias("q"),
    )
    one = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("s").cast("long").alias("st"),
        F.sum("q").cast("long").alias("qt"),
        F.sort_array(
            F.collect_list(F.struct("g", "ng", "s"))
        ).alias("__arr"),
    ).select(
        "k", "n", "st", "qt",
        F.aggregate(
            F.transform(
                F.col("__arr"),
                lambda e: e["s"].cast("double") * e["s"].cast("double")
                / e["ng"].cast("double"),
            ),
            F.lit(0.0), lambda a, b: a + b,
        ).alias("sb"),
    )
    b = F.col("sb") - (
        F.col("st").cast("double") * F.col("st").cast("double")
        / F.col("n").cast("double")
    )
    w = F.col("qt").cast("double") - F.col("sb")
    km1 = (F.col("k") - 1).cast("double")
    nmk = (F.col("n") - F.col("k")).cast("double")
    return one.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        (F.col("k") - 1).alias("df1"),
        (F.col("n") - F.col("k")).alias("df2"),
        _r6(b / km1).alias("between_ms"),
        _r6(w / nmk).alias("within_ms"),
        _r6((b / km1) / (w / nmk)).alias("f_stat"),
    )


SQL_LEVENE_TEST = """
WITH e AS (
  SELECT event_type AS g, event_id,
    CAST(floor(abs(value)*100 + 0.5) * sign(value) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT g, c,
    row_number() OVER (PARTITION BY g ORDER BY c, event_id) AS rn,
    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM e
), m AS (
  SELECT g, CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN c ELSE 0 END)
             + sum(CASE WHEN rn = n // 2 + 1 THEN c ELSE 0 END)
         AS BIGINT) AS med2
  FROM r GROUP BY g
), z AS (
  SELECT r.g, abs(2 * r.c - m.med2) AS z FROM r JOIN m ON r.g = m.g
), grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
    CAST(sum(z) AS BIGINT) AS s,
    CAST(sum(z * z) AS BIGINT) AS q
  FROM z GROUP BY g
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
    CAST(sum(s) AS BIGINT) AS st, CAST(sum(q) AS BIGINT) AS qt,
    coalesce(list_reduce(
      list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(ng AS DOUBLE)
           ORDER BY g),
      (a, b) -> a + b), 0.0) AS sb
  FROM grp
), f AS (
  SELECT k, n,
    sb - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)
      AS b,
    CAST(qt AS DOUBLE) - sb AS w
  FROM one
)
SELECT k AS k_groups, n AS n_total, k - 1 AS df1, n - k AS df2,
  round(b / CAST(k - 1 AS DOUBLE), 6) AS between_ms,
  round(w / CAST(n - k AS DOUBLE), 6) AS within_ms,
  round((b / CAST(k - 1 AS DOUBLE)) / (w / CAST(n - k AS DOUBLE)), 6)
    AS f_stat
FROM f
"""

QUERIES["levene_test"] = q_levene_test
_RAW_ORACLES["levene_test"] = SQL_LEVENE_TEST


def q_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage trend-in-proportions test of the purchase
    SHARE across the ordered days of the month (Cochran 1954, Armitage
    1955 — the dose-response test, with the day index as the dose: a
    1-dof monotone-drift audit of the event mix that a plain
    chi-square on the same cells cannot see because it ignores the
    level ORDERING; the mix-drift companion to segmented_trend's
    volume drift). T = sum_i s_i (x_i - n_i X/N) has the exact integer
    numerator N*sum(s x) - X*sum(s n); z^2 = N*T_num^2 /
    (X (N-X) (N*sum(s^2 n) - sum(s n)^2)) is a fixed expression tree
    whose every operand is an exact long < 2^53, so each double
    conversion is correctly rounded and the gate is exact with zero
    rounding. ONE corpus aggregate to the <=31-day frame; the user
    frame is never touched."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__s"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0).alias("__pur"),
    )
    lev = ev.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__ni"),
        F.sum("__pur").cast("long").alias("__xi"),
    )
    one = lev.agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum("__ni").cast("long").alias("n_events"),
        F.sum("__xi").cast("long").alias("n_pos"),
        F.sum(F.col("__s") * F.col("__ni")).cast("long").alias("ssn"),
        F.sum(F.col("__s") * F.col("__xi")).cast("long").alias("ssx"),
        F.sum(F.col("__s") * F.col("__s") * F.col("__ni"))
        .cast("long").alias("ss2n"),
    )
    N = F.col("n_events")
    X = F.col("n_pos")
    tnum = N * F.col("ssx") - X * F.col("ssn")
    Nd = N.cast("double")
    Xd = X.cast("double")
    Td = tnum.cast("double")
    z2 = (Nd * Td * Td) / (
        Xd * (Nd - Xd)
        * (Nd * F.col("ss2n").cast("double")
           - F.col("ssn").cast("double") * F.col("ssn").cast("double"))
    )
    return one.select(
        "n_levels", "n_events", "n_pos",
        tnum.alias("t_num"),
        _r6(z2).alias("z2"),
        F.when(tnum > 0, F.lit("increasing"))
        .when(tnum < 0, F.lit("decreasing"))
        .otherwise(F.lit("no_trend")).alias("trend"),
    )


SQL_COCHRAN_ARMITAGE = """
WITH lev AS (
  SELECT CAST(day(ts) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS ni,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS xi
  FROM events GROUP BY 1
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_levels,
    CAST(sum(ni) AS BIGINT) AS n_events,
    CAST(sum(xi) AS BIGINT) AS n_pos,
    CAST(sum(s * ni) AS BIGINT) AS ssn,
    CAST(sum(s * xi) AS BIGINT) AS ssx,
    CAST(sum(s * s * ni) AS BIGINT) AS ss2n
  FROM lev
)
SELECT n_levels, n_events, n_pos,
  n_events * ssx - n_pos * ssn AS t_num,
  round((CAST(n_events AS DOUBLE)
         * CAST(n_events * ssx - n_pos * ssn AS DOUBLE)
         * CAST(n_events * ssx - n_pos * ssn AS DOUBLE))
        / (CAST(n_pos AS DOUBLE)
           * (CAST(n_events AS DOUBLE) - CAST(n_pos AS DOUBLE))
           * (CAST(n_events AS DOUBLE) * CAST(ss2n AS DOUBLE)
              - CAST(ssn AS DOUBLE) * CAST(ssn AS DOUBLE))), 6)
    AS z2,
  CASE WHEN n_events * ssx - n_pos * ssn > 0 THEN 'increasing'
       WHEN n_events * ssx - n_pos * ssn < 0 THEN 'decreasing'
       ELSE 'no_trend' END AS trend
FROM one
"""

QUERIES["cochran_armitage"] = q_cochran_armitage
_RAW_ORACLES["cochran_armitage"] = SQL_COCHRAN_ARMITAGE


def q_isotonic_calibration(spark, sf_dir):
    """Isotonic regression of the calibration_bins reliability curve
    (PAVA solution via the Barlow et al. 1972 minimax identity
    iso_i = max_{j<=i} min_{k>=i} weightedMean(x[j..k]) — the
    calibration-repair step of Zadrozny & Elkan 2002 that every
    score-based curation filter should run before thresholding).
    Same deterministic classifier as calibration_bins: score bin =
    min(9, min(n_chars,400) div 40), label = doc has >= 50 words. The
    corpus aggregates ONCE to the <=10-bin frame; the minimax runs as
    nested bounded transforms over the bin-sorted arrays, every
    candidate mean ONE division of exact slice-sum longs, so max/min
    pick identical doubles on both engines and the gate is exact. The
    pytest proves the minimax equals classic stack-based PAVA. At
    10^12 docs the isotonic fit still touches 10 rows."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(400)).cast("long").alias("__m"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 50,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    b = d.groupBy(
        F.least(F.lit(9).cast("long"), F.expr("__m div 40"))
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("pos"),
    )
    one = b.agg(
        F.sort_array(
            F.collect_list(F.struct("bin", "n", "pos"))
        ).alias("__arr")
    ).select(
        F.transform(F.col("__arr"), lambda e: e["bin"]).alias("bs"),
        F.transform(F.col("__arr"), lambda e: e["n"]).alias("ns"),
        F.transform(F.col("__arr"), lambda e: e["pos"]).alias("xs"),
        F.size(F.col("__arr")).alias("bcnt"),
    )

    def ssum(arr, j, k):
        return F.aggregate(
            F.slice(arr, j, k - j + 1),
            F.lit(0).cast("long"),
            lambda a, e: a + e,
        )

    iso = one.select(
        "bs", "ns", "xs",
        F.transform(
            F.sequence(F.lit(1), F.col("bcnt")),
            lambda i: F.array_max(
                F.transform(
                    F.sequence(F.lit(1), i),
                    lambda j: F.array_min(
                        F.transform(
                            F.sequence(i, F.col("bcnt")),
                            lambda k: ssum(F.col("xs"), j, k)
                            .cast("double")
                            / ssum(F.col("ns"), j, k).cast("double"),
                        )
                    ),
                )
            ),
        ).alias("iso_arr"),
    )
    z = iso.select(
        F.explode(
            F.arrays_zip(
                F.col("bs").alias("bin"),
                F.col("ns").alias("n"),
                F.col("xs").alias("pos"),
                F.col("iso_arr").alias("iso"),
            )
        ).alias("__e")
    )
    return z.select(
        F.col("__e.bin").alias("bin"),
        F.col("__e.n").alias("n_docs"),
        F.col("__e.pos").alias("n_pos"),
        _r6(
            F.col("__e.pos").cast("double")
            / F.col("__e.n").cast("double")
        ).alias("raw_rate"),
        _r6(F.col("__e.iso")).alias("iso_rate"),
    )


SQL_ISOTONIC_CALIBRATION = """
WITH d AS (
  SELECT least(n_chars, 400) AS m,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 50
         THEN 1 ELSE 0 END AS y
  FROM documents
), bins AS (
  SELECT least(9, m // 40) AS bin,
    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM d GROUP BY 1
), one AS (
  SELECT list(bin ORDER BY bin) AS bs,
         list(n ORDER BY bin) AS ns,
         list(pos ORDER BY bin) AS xs,
         CAST(count(*) AS BIGINT) AS bcnt
  FROM bins
), iso AS (
  SELECT bs, ns, xs, bcnt,
    list_transform(range(1, bcnt + 1), i ->
      list_max(list_transform(range(1, i + 1), j ->
        list_min(list_transform(range(i, bcnt + 1), k ->
          CAST(list_sum(xs[j:k]) AS DOUBLE)
          / CAST(list_sum(ns[j:k]) AS DOUBLE)))))) AS iso_arr
  FROM one
), ex AS (
  SELECT bs, ns, xs, iso_arr,
    unnest(range(1, bcnt + 1)) AS i
  FROM iso
)
SELECT bs[i] AS bin, ns[i] AS n_docs, xs[i] AS n_pos,
  round(CAST(xs[i] AS DOUBLE) / CAST(ns[i] AS DOUBLE), 6) AS raw_rate,
  round(iso_arr[i], 6) AS iso_rate
FROM ex
"""

QUERIES["isotonic_calibration"] = q_isotonic_calibration
_RAW_ORACLES["isotonic_calibration"] = SQL_ISOTONIC_CALIBRATION


def q_gumbel_maxima(spark, sf_dir):
    """Gumbel extreme-value fit of DAILY MAXIMUM purchase value by
    block maxima + method of moments (Gumbel 1958; the Fisher-Tippett
    1928 type-I domain — the capacity-planning question 'how big a
    spike should we provision for' answered from tail theory instead
    of eyeballing the max): scale beta = std * sqrt(6)/pi, location
    mu = mean - gamma * beta (Euler-Mascheroni gamma pinned as the
    identical literal on both engines), and the T-block return levels
    x_T = mu - beta * ln(-ln(1 - 1/T)) for T = 7 and 30 days. Daily
    maxima are exact integer cents from ONE corpus aggregate; n, sum,
    sum-of-squares over the <=31-day frame are exact longs, so
    mean/std/mu/beta/rl are fixed expression trees (IEEE sqrt exact;
    the lns follow the catalog's established cross-engine ln
    precedent). At 10^12 rows the block-maxima frame is still 31
    rows."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
        (F.signum("value")
         * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)))
        .cast("long").alias("__c"),
    )
    day = ev.groupBy("__d").agg(F.max("__c").alias("__m"))
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__m").cast("long").alias("__s"),
        F.sum(F.col("__m") * F.col("__m")).cast("long").alias("__q"),
    )
    nd = F.col("n_days").cast("double")
    sd = F.col("__s").cast("double")
    qd = F.col("__q").cast("double")
    mean = sd / nd / F.lit(100.0)
    std = F.sqrt(
        (qd - sd * sd / nd) / (F.col("n_days") - 1).cast("double")
    ) / F.lit(100.0)
    euler = F.lit(0.5772156649015329)
    beta = std * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = mean - euler * beta

    def rl(T):
        return mu - beta * F.log(
            -F.log(F.lit(1.0) - F.lit(1.0) / F.lit(float(T)))
        )

    return one.select(
        "n_days",
        _r6(mean).alias("mean_daily_max"),
        _r6(std).alias("std_daily_max"),
        _r6(mu).alias("gumbel_mu"),
        _r6(beta).alias("gumbel_beta"),
        _r6(rl(7)).alias("return_level_7d"),
        _r6(rl(30)).alias("return_level_30d"),
    )


SQL_GUMBEL_MAXIMA = """
WITH e AS (
  SELECT CAST(day(ts) AS BIGINT) AS d,
    CAST(floor(abs(value)*100 + 0.5) * sign(value) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), day AS (
  SELECT d, CAST(max(c) AS BIGINT) AS m FROM e GROUP BY d
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(m) AS BIGINT) AS s,
    CAST(sum(m * m) AS BIGINT) AS q
  FROM day
), f AS (
  SELECT n_days,
    CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) / 100.0 AS mean,
    sqrt((CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            / CAST(n_days AS DOUBLE))
         / CAST(n_days - 1 AS DOUBLE)) / 100.0 AS std
  FROM one
), g AS (
  SELECT n_days, mean, std,
    std * sqrt(6.0) / 3.141592653589793 AS beta
  FROM f
), h AS (
  SELECT n_days, mean, std, beta,
    mean - 0.5772156649015329 * beta AS mu
  FROM g
)
SELECT n_days,
  round(mean, 6) AS mean_daily_max,
  round(std, 6) AS std_daily_max,
  round(mu, 6) AS gumbel_mu,
  round(beta, 6) AS gumbel_beta,
  round(mu - beta * ln(-ln(1.0 - 1.0 / 7.0)), 6) AS return_level_7d,
  round(mu - beta * ln(-ln(1.0 - 1.0 / 30.0)), 6) AS return_level_30d
FROM h
"""

QUERIES["gumbel_maxima"] = q_gumbel_maxima
_RAW_ORACLES["gumbel_maxima"] = SQL_GUMBEL_MAXIMA


def q_session_edit_distance(spark, sf_dir):
    """Histogram of Levenshtein edit distances between each user's
    CONSECUTIVE active-day behavior strings (Levenshtein 1966; the
    day's events collapse to an initials string in time order —
    'vvcp' = view view click purchase — so the distance measures how
    much a user's daily routine mutates day over day: the behavioral-
    stability feature that separates habitual from exploratory users,
    and the sequence-level drift audit for event pipelines). Day
    strings are deterministic (ts is unique per user); distances are
    exact integers from the JVM/native levenshtein on BOTH engines;
    the histogram is exact longs — zero floats anywhere. One
    (user, day) aggregate + one user-keyed lag; day strings are <= a
    few dozen chars so the O(len^2) DP is constant work per pair."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        F.substring("event_type", 1, 1).alias("__i"),
    )
    day = ev.groupBy("user_id", "__d").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__t", "__i"))),
                lambda e: e["__i"],
            ),
            "",
        ).alias("__s")
    )
    w = Window.partitionBy("user_id").orderBy("__d")
    pairs = day.select(
        F.lag("__s").over(w).alias("__p"), "__s"
    ).filter(F.col("__p").isNotNull())
    return (
        pairs.select(
            F.levenshtein("__p", "__s").cast("long")
            .alias("edit_distance")
        )
        .groupBy("edit_distance")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


SQL_SESSION_EDIT_DISTANCE = """
WITH e AS (
  SELECT user_id, CAST(day(ts) AS BIGINT) AS d, ts,
    substring(event_type, 1, 1) AS i
  FROM events
), day AS (
  SELECT user_id, d, string_agg(i, '' ORDER BY ts) AS s
  FROM e GROUP BY user_id, d
), pairs AS (
  SELECT lag(s) OVER (PARTITION BY user_id ORDER BY d) AS p, s
  FROM day
)
SELECT CAST(levenshtein(p, s) AS BIGINT) AS edit_distance,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs WHERE p IS NOT NULL
GROUP BY 1
"""

QUERIES["session_edit_distance"] = q_session_edit_distance
_RAW_ORACLES["session_edit_distance"] = SQL_SESSION_EDIT_DISTANCE


_BT_TYPES = ["click", "error", "purchase", "signup", "view"]
_BT_K = len(_BT_TYPES)
_BT_R = 10


def _bt_fragments():
    """Shared SQL fragments for the Bradley-Terry MM iterations: the
    SAME strings run through Spark selectExpr and the DuckDB CTE
    chain, so every float op is literally identical cross-engine."""
    K = _BT_K
    carry = []
    for i in range(K):
        for j in range(i + 1, K):
            carry.append(
                f"CAST(w{i}{j} + w{j}{i} AS DOUBLE) AS n{i}{j}"
            )
    for i in range(K):
        ws = " + ".join(f"w{i}{j}" for j in range(K) if j != i)
        ls = " + ".join(f"w{j}{i}" for j in range(K) if j != i)
        carry.append(f"CAST({ws} AS DOUBLE) AS bw{i}")
        carry.append(f"CAST({ws} AS BIGINT) AS wt{i}")
        carry.append(f"CAST({ls} AS BIGINT) AS lt{i}")
    init = [f"CAST(0.2 AS DOUBLE) AS p0_{i}" for i in range(K)]
    iters = []
    for t in range(1, _BT_R + 1):
        qs = []
        for i in range(K):
            den = " + ".join(
                f"n{min(i, j)}{max(i, j)} / (p{t - 1}_{i} + p{t - 1}_{j})"
                for j in range(K) if j != i
            )
            qs.append(f"bw{i} / ({den}) AS q{t}_{i}")
        s = " + ".join(f"q{t}_{i}" for i in range(K))
        ps = [f"q{t}_{i} / ({s}) AS p{t}_{i}" for i in range(K)]
        iters.append((qs, ps))
    return carry, init, iters


def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry strength ranking of the event types from pairwise
    user-level dominance (Zermelo 1929; Bradley & Terry 1952; fitted
    by Hunter 2004's MM algorithm, 10 iterations from the uniform
    start — the SAME model RLHF reward pipelines fit to pairwise
    preference data, exercised here on 'which event type does a user
    do more of': w_ij = #users with count_i > count_j, ties dropped).
    The corpus aggregates to per-user type counts, then ONE global
    aggregate yields all 20 directed win counts (exact longs); the MM
    fixed-point iterations p_i <- W_i / sum_j n_ij/(p_i+p_j),
    renormalized each round, run on that 1-row frame as generated SQL
    fragments executed VERBATIM by both engines (selectExpr here, a
    CTE chain in DuckDB), so every division happens in the same order
    and the gate is exact. The 1-row iteration frame is persisted
    before the 5-way output union (cached-branch convention). At
    10^12 events the iteration cost is still 1 row x 10 rounds."""
    from mpds_spark.operators.util import scratch_persist

    K = _BT_K
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(*[
        F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("long").alias(f"c{i}")
        for i, t in enumerate(_BT_TYPES)
    ])
    wins = []
    for i in range(K):
        for j in range(K):
            if i != j:
                wins.append(
                    F.sum(
                        F.when(F.col(f"c{i}") > F.col(f"c{j}"), 1)
                        .otherwise(0)
                    ).cast("long").alias(f"w{i}{j}")
                )
    w = u.agg(*wins)
    carry, init, iters = _bt_fragments()
    df = w.selectExpr("*", *carry).selectExpr("*", *init)
    for qs, ps in iters:
        df = df.selectExpr("*", *qs).selectExpr("*", *ps)
    df = scratch_persist(df)
    outs = [
        df.selectExpr(
            f"'{t}' AS event_type",
            f"wt{i} AS wins",
            f"lt{i} AS losses",
            f"p{_BT_R}_{i} AS __p",
        )
        for i, t in enumerate(_BT_TYPES)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "event_type", "wins", "losses",
        _r6(F.col("__p")).alias("bt_strength"),
    )


def _bt_sql() -> str:
    K = _BT_K
    carry, init, iters = _bt_fragments()
    cases = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, t in enumerate(_BT_TYPES)
    )
    winsel = ", ".join(
        f"CAST(sum(CASE WHEN c{i} > c{j} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS w{i}{j}"
        for i in range(K) for j in range(K) if i != j
    )
    ctes = [
        f"u AS (SELECT user_id, {cases} FROM events GROUP BY user_id)",
        f"w AS (SELECT {winsel} FROM u)",
        f"base AS (SELECT *, {', '.join(carry)} FROM w)",
        f"it0 AS (SELECT *, {', '.join(init)} FROM base)",
    ]
    prev = "it0"
    for t, (qs, ps) in enumerate(iters, start=1):
        ctes.append(f"iq{t} AS (SELECT *, {', '.join(qs)} FROM {prev})")
        ctes.append(f"it{t} AS (SELECT *, {', '.join(ps)} FROM iq{t})")
        prev = f"it{t}"
    finals = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, wt{i} AS wins, lt{i} AS losses,"
        f" round(p{_BT_R}_{i}, 6) AS bt_strength FROM {prev}"
        for i, t in enumerate(_BT_TYPES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


SQL_BRADLEY_TERRY = _bt_sql()

QUERIES["bradley_terry"] = q_bradley_terry
_RAW_ORACLES["bradley_terry"] = SQL_BRADLEY_TERRY


_PCA_D = 64
_PCA_R = 8


def q_pca_power_iter(spark, sf_dir):
    """Top principal component of the embedding cloud by distributed
    scatter-matrix + power iteration (Pearson 1901 for PCA; von Mises
    & Pollaczek-Geiger 1929 for the iteration — the anisotropy audit
    that says whether the embedding space has a dominant direction,
    which decides PCA-whitening before ANN and exposes collapsed
    encoders): embeddings quantize to exact integer milli-codes
    (floor(|x|*1000+.5)*sign — the quant_recall idiom), so the UPPER-
    TRIANGULAR scatter S_ij = sum q_i q_j and the dim sums are EXACT
    LONGS from one explode+agg — the one corpus-shaped reduce, emitting
    a dim^2-bounded frame no matter the row count. The covariance
    C_ij = (S_ij - s_i s_j/n)/(n-1) is a fixed per-cell expression; 8
    power iterations v <- C v / ||C v|| run as array transforms over
    the collected 4096-cell matrix with j-ascending matvec folds and
    one CTE/select per step so both engines execute literally the same
    float sequence; the Rayleigh quotient and explained-variance share
    close it out. At 10^12 embeddings only the scatter agg grows."""
    from mpds_spark.operators.util import scratch_persist

    D, R = _PCA_D, _PCA_R
    codes = scratch_persist(
        load(spark, sf_dir, "embeddings").select(
            F.transform(
                "embedding",
                lambda x: (
                    F.signum(x.cast("double"))
                    * F.floor(F.abs(x.cast("double")) * 1000
                              + F.lit(0.5))
                ).cast("long"),
            ).alias("q")
        )
    )
    tri = codes.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(D)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(D)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at("q", i)
                                * F.element_at("q", j)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    cells = scratch_persist(
        tri.groupBy("i", "j").agg(
            F.sum("p").cast("long").alias("s")
        )
    )
    fullm = cells.unionAll(
        cells.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s"
        )
    )
    cf_row = fullm.agg(
        F.sort_array(F.collect_list(F.struct("i", "j", "s")))
        .alias("__a")
    ).select(
        F.transform(F.col("__a"), lambda e: e["s"]).alias("cf")
    )
    dimsums = codes.select(
        F.posexplode("q").alias("__p0", "__v")
    ).groupBy((F.col("__p0") + 1).alias("i")).agg(
        F.sum("__v").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    si_row = dimsums.agg(
        F.sort_array(F.collect_list(F.struct("i", "s", "c")))
        .alias("__a")
    ).select(
        F.transform(F.col("__a"), lambda e: e["s"]).alias("si"),
        F.element_at(
            F.transform(F.col("__a"), lambda e: e["c"]), 1
        ).alias("n"),
    )
    df = cf_row.crossJoin(si_row).select(
        "cf", "si",
        F.col("n").cast("double").alias("nd"),
        (F.col("n") - 1).cast("double").alias("nm1"),
    )

    def cov(i, j):
        return (
            F.element_at("cf", ((i - F.lit(1)) * F.lit(D) + j))
            - F.element_at("si", i) * F.element_at("si", j)
            / F.col("nd")
        ) / F.col("nm1")

    def matvec(vcol):
        return F.transform(
            F.sequence(F.lit(1), F.lit(D)),
            lambda i: F.aggregate(
                F.sequence(F.lit(1), F.lit(D)),
                F.lit(0.0),
                lambda acc, j: acc
                + cov(i, j) * F.element_at(vcol, j),
            ),
        )

    df = df.select(
        "*",
        F.transform(
            F.sequence(F.lit(1), F.lit(D)),
            lambda i: F.lit(1.0) / F.sqrt(F.lit(float(D))),
        ).alias("v0"),
    )
    for t in range(1, R + 1):
        df = df.select(
            "*", matvec(F.col(f"v{t - 1}")).alias(f"u{t}")
        ).select(
            "*",
            F.sqrt(
                F.aggregate(
                    F.col(f"u{t}"), F.lit(0.0),
                    lambda a, e: a + e * e,
                )
            ).alias(f"m{t}"),
        ).select(
            "*",
            F.transform(
                F.col(f"u{t}"), lambda e: e / F.col(f"m{t}")
            ).alias(f"v{t}"),
        )
    df = df.select(
        "*", matvec(F.col(f"v{R}")).alias("uf")
    ).select(
        "*",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(D)), F.lit(0.0),
            lambda a, i: a
            + F.element_at(f"v{R}", i) * F.element_at("uf", i),
        ).alias("lam"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(D)), F.lit(0.0),
            lambda a, i: a + cov(i, i),
        ).alias("tr"),
        F.sqrt(
            F.aggregate(
                F.col("uf"), F.lit(0.0), lambda a, e: a + e * e
            )
        ).alias("mf"),
    )
    out = df.select(
        F.posexplode(
            F.transform(F.col("uf"), lambda e: e / F.col("mf"))
        ).alias("__p0", "__l"),
        "lam", "tr",
    )
    return out.select(
        (F.col("__p0") + 1).alias("component"),
        _r6(F.col("__l")).alias("loading"),
        _r6(F.col("lam")).alias("eigenvalue"),
        _r6(F.col("lam") / F.col("tr")).alias("explained_share"),
    )


def _pca_sql() -> str:
    D, R = _PCA_D, _PCA_R
    cov = (
        "((cf[(i-1)*{d}+j] - si[i]*si[j]/nd)/nm1)".replace(
            "{d}", str(D)
        )
    )
    covii = "((cf[(i-1)*{d}+i] - si[i]*si[i]/nd)/nm1)".replace(
        "{d}", str(D)
    )

    def mv(v):
        return (
            f"list_transform(range(1, {D + 1}), i -> "
            f"list_reduce(list_transform(range(1, {D + 1}), j -> "
            f"{cov} * {v}[j]), (a, b) -> a + b))"
        )

    its = []
    prev = "v0"
    for t in range(1, R + 1):
        its.append(
            f"iu{t} AS (SELECT *, {mv(prev)} AS u{t} FROM "
            f"{'init' if t == 1 else 'iv' + str(t - 1)})"
        )
        its.append(
            f"im{t} AS (SELECT *, sqrt(list_reduce(list_transform("
            f"u{t}, e -> e * e), (a, b) -> a + b)) AS m{t} FROM iu{t})"
        )
        its.append(
            f"iv{t} AS (SELECT *, list_transform(u{t}, e -> "
            f"e / m{t}) AS v{t} FROM im{t})"
        )
        prev = f"v{t}"
    return f"""
WITH q AS (
  SELECT list_transform(embedding, x ->
    CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)
         * sign(CAST(x AS DOUBLE)) AS BIGINT)) AS q
  FROM embeddings
), tri AS (
  SELECT unnest(flatten(list_transform(range(1, {D + 1}), i ->
    list_transform(range(i, {D + 1}), j ->
      struct_pack(i := i, j := j, p := q[i]*q[j]))))) AS e
  FROM q
), cells AS (
  SELECT e.i AS i, e.j AS j, CAST(sum(e.p) AS BIGINT) AS s
  FROM tri GROUP BY 1, 2
), fullm AS (
  SELECT i, j, s FROM cells
  UNION ALL
  SELECT j AS i, i AS j, s FROM cells WHERE i < j
), cfr AS (SELECT list(s ORDER BY i, j) AS cf FROM fullm),
ds AS (
  SELECT i, CAST(sum(q[i]) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM (SELECT q, unnest(range(1, {D + 1})) AS i FROM q)
  GROUP BY i
), sir AS (
  SELECT list(s ORDER BY i) AS si, min(c) AS n FROM ds
), init AS (
  SELECT cf, si, CAST(n AS DOUBLE) AS nd,
    CAST(n - 1 AS DOUBLE) AS nm1,
    list_transform(range(1, {D + 1}), i ->
      1.0 / sqrt(CAST({D} AS DOUBLE))) AS v0
  FROM cfr, sir
),
{",".join(its)},
fin AS (
  SELECT *, {mv(prev)} AS uf FROM iv{R}
), fin2 AS (
  SELECT *,
    list_reduce(list_transform(range(1, {D + 1}), i ->
      v{R}[i] * uf[i]), (a, b) -> a + b) AS lam,
    list_reduce(list_transform(range(1, {D + 1}), i ->
      {covii}), (a, b) -> a + b) AS tr,
    sqrt(list_reduce(list_transform(uf, e -> e * e),
         (a, b) -> a + b)) AS mf
  FROM fin
), ex AS (
  SELECT unnest(range(1, {D + 1})) AS component, uf, mf, lam, tr
  FROM fin2
)
SELECT CAST(component AS INT) AS component,
  round(uf[component] / mf, 6) AS loading,
  round(lam, 6) AS eigenvalue,
  round(lam / tr, 6) AS explained_share
FROM ex
"""


SQL_PCA_POWER_ITER = _pca_sql()

QUERIES["pca_power_iter"] = q_pca_power_iter
_RAW_ORACLES["pca_power_iter"] = SQL_PCA_POWER_ITER


def q_ransac_trend(spark, sf_dir):
    """RANSAC line fit of daily event volume, made fully deterministic
    by sweeping EVERY two-day candidate line instead of random
    sampling (Fischler & Bolles 1981; with <=31 days the
    465-candidate exhaustive sweep IS the algorithm, no RNG needed —
    the robust alternative to OLS when a release-day spike or outage
    day would drag the least-squares trend): for each day pair the
    line through the two points counts its inliers (residual within
    10% of the mean daily count), the candidate with the most inliers
    wins (smallest-pair tie-break), and the final slope/intercept are
    RE-FIT by OLS on the winning inlier set from exact integer
    moments. The corpus is touched ONCE by the day aggregate; the
    candidate x day sweep is a bounded 465x31 join over the persisted
    tiny frame (registered BNLJ-by-design), never a corpus join."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = scratch_persist(
        ev.groupBy("__x").agg(
            F.count(F.lit(1)).cast("long").alias("__y")
        )
    )
    tol = day.agg(
        (F.lit(0.1) * (
            F.sum("__y").cast("double")
            / F.count(F.lit(1)).cast("double")
        )).alias("__tol")
    )
    a = day.select(F.col("__x").alias("x1"), F.col("__y").alias("y1"))
    b = day.select(F.col("__x").alias("x2"), F.col("__y").alias("y2"))
    # try_divide: Catalyst's join reorder may evaluate the slope on
    # pairs that fail x1 < x2 before that predicate applies (ANSI mode
    # throws on double/0 in Spark 4); surviving rows always have
    # x2 > x1, so try_divide equals plain division on them
    cand = a.join(b, F.col("x1") < F.col("x2")).select(
        "x1", "y1", "x2",
        F.try_divide(
            (F.col("y2") - F.col("y1")).cast("double"),
            (F.col("x2") - F.col("x1")).cast("double"),
        ).alias("__sl"),
    )
    sweep = cand.crossJoin(tol).join(
        day.select(F.col("__x").alias("xx"), F.col("__y").alias("yy")),
        F.abs(
            F.col("yy").cast("double")
            - (F.col("y1").cast("double")
               + F.col("__sl")
               * (F.col("xx") - F.col("x1")).cast("double"))
        ) <= F.col("__tol"),
    )
    scored = sweep.groupBy("x1", "x2", "y1", "__sl").agg(
        F.count(F.lit(1)).cast("long").alias("__inl")
    )
    win = scored.agg(
        F.min(
            F.struct(
                (-F.col("__inl")).alias("ninl"),
                F.col("x1"), F.col("x2"), F.col("y1"), F.col("__sl"),
            )
        ).alias("w")
    ).select(
        F.col("w.x1").alias("x1"), F.col("w.x2").alias("x2"),
        F.col("w.y1").alias("wy1"), F.col("w.__sl").alias("wsl"),
        (-F.col("w.ninl")).cast("long").alias("n_inliers"),
    )
    refit = win.crossJoin(tol).join(
        day,
        F.abs(
            F.col("__y").cast("double")
            - (F.col("wy1").cast("double")
               + F.col("wsl")
               * (F.col("__x") - F.col("x1")).cast("double"))
        ) <= F.col("__tol"),
    ).groupBy("x1", "x2", "n_inliers").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
    )
    nd = F.col("__n").cast("double")
    sxd = F.col("__sx").cast("double")
    syd = F.col("__sy").cast("double")
    slope = (
        F.col("__sxy").cast("double") - sxd * syd / nd
    ) / (F.col("__sxx").cast("double") - sxd * sxd / nd)
    return refit.select(
        F.col("x1").alias("anchor_day1"),
        F.col("x2").alias("anchor_day2"),
        "n_inliers",
        _r6(slope).alias("slope_refit"),
        _r6(syd / nd - slope * (sxd / nd)).alias("intercept_refit"),
    )


SQL_RANSAC_TREND = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), tol AS (
  SELECT 0.1 * (CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
    AS tol
  FROM day
), cand AS (
  SELECT a.x AS x1, a.y AS y1, b.x AS x2,
    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
  FROM day a JOIN day b ON a.x < b.x
), scored AS (
  SELECT c.x1, c.x2, c.y1, c.sl, CAST(count(*) AS BIGINT) AS inl
  FROM cand c, tol, day d
  WHERE abs(CAST(d.y AS DOUBLE)
            - (CAST(c.y1 AS DOUBLE)
               + c.sl * CAST(d.x - c.x1 AS DOUBLE))) <= tol
  GROUP BY c.x1, c.x2, c.y1, c.sl
), win AS (
  SELECT x1, x2, y1 AS wy1, sl AS wsl, inl AS n_inliers
  FROM scored ORDER BY inl DESC, x1, x2 LIMIT 1
), refit AS (
  SELECT w.x1, w.x2, w.n_inliers,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(d.x) AS BIGINT) AS sx,
    CAST(sum(d.y) AS BIGINT) AS sy,
    CAST(sum(d.x * d.y) AS BIGINT) AS sxy,
    CAST(sum(d.x * d.x) AS BIGINT) AS sxx
  FROM win w, tol, day d
  WHERE abs(CAST(d.y AS DOUBLE)
            - (CAST(w.wy1 AS DOUBLE)
               + w.wsl * CAST(d.x - w.x1 AS DOUBLE))) <= tol
  GROUP BY w.x1, w.x2, w.n_inliers
)
SELECT x1 AS anchor_day1, x2 AS anchor_day2, n_inliers,
  round((CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(n AS DOUBLE)), 6) AS slope_refit,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        - ((CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE))
           / (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE)))
          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
    AS intercept_refit
FROM refit
"""

QUERIES["ransac_trend"] = q_ransac_trend
_RAW_ORACLES["ransac_trend"] = SQL_RANSAC_TREND


def q_dft_periodogram(spark, sf_dir):
    """Discrete-Fourier periodogram of the daily event-volume series
    at cycle counts k = 1..8 over the month (Schuster 1898 — THE
    seasonality detector; the weekly cycle shows up as power
    concentrated at k ~ n/7): P_k = C_k^2 + S_k^2 with C_k =
    sum_t y_t cos(2 pi k t/n) and S_k the sine sum, t the dense day
    rank. The corpus is touched ONCE by the day aggregate; the trig
    sums fold DAY-ASCENDING over the collected <=31-point arrays so
    both engines execute the identical float sequence (cos/sin follow
    the catalog's cross-engine libm precedent, verified at all three
    SFs), and the mean is removed exactly via the integer identity
    n*y_t - S inside the fold (scaled by n, so P_k carries n^2 — the
    power SHARE divides it out). Output: per-k power share of the
    detrended total."""
    from mpds_spark.operators.util import scratch_persist

    K = 8
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("s"),
    ).select(
        F.transform(F.col("__a"), lambda e: e["__y"]).alias("ys"),
        "n", "s",
    )
    twopi = F.lit(6.283185307179586)
    nd = F.col("n").cast("double")

    def trig(k, fn):
        # sum over t of (n*y_t - S) * fn(2 pi k t / n), t ascending
        return F.aggregate(
            F.sequence(F.lit(1), F.col("n").cast("int")),
            F.lit(0.0),
            lambda acc, t: acc
            + (F.col("n") * F.element_at("ys", t) - F.col("s"))
            .cast("double")
            * fn(twopi * F.lit(float(k)) * t.cast("double") / nd),
        )

    powers = one.select(
        "n",
        *[
            (trig(k, F.cos) * trig(k, F.cos)
             + trig(k, F.sin) * trig(k, F.sin)).alias(f"p{k}")
            for k in range(1, K + 1)
        ],
    )
    powers = scratch_persist(powers)
    tot = " + ".join(f"p{k}" for k in range(1, K + 1))
    rows = []
    for k in range(1, K + 1):
        rows.append(
            powers.selectExpr(
                f"{k} AS k",
                f"p{k} AS __p",
                f"({tot}) AS __tot",
            )
        )
    res = rows[0]
    for r in rows[1:]:
        res = res.unionAll(r)
    return res.select(
        "k",
        _r6(F.col("__p") / F.col("__tot")).alias("power_share"),
    )


def _dft_sql() -> str:
    K = 8

    def trig(k, fn):
        return (
            f"list_reduce(list_transform(range(1, n + 1), t -> "
            f"CAST(n * ys[t] - s AS DOUBLE) "
            f"* {fn}(6.283185307179586 * CAST({k} AS DOUBLE) "
            f"* CAST(t AS DOUBLE) / CAST(n AS DOUBLE))), "
            f"(a, b) -> a + b)"
        )

    pcols = ", ".join(
        f"{trig(k, 'cos')} * {trig(k, 'cos')}"
        f" + {trig(k, 'sin')} * {trig(k, 'sin')} AS p{k}"
        for k in range(1, K + 1)
    )
    tot = " + ".join(f"p{k}" for k in range(1, K + 1))
    finals = " UNION ALL ".join(
        f"SELECT {k} AS k, round(p{k} / ({tot}), 6) AS power_share"
        f" FROM powers"
        for k in range(1, K + 1)
    )
    return f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(y ORDER BY x) AS ys, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s
  FROM day
), powers AS (
  SELECT n, {pcols} FROM one
)
{finals}
"""


SQL_DFT_PERIODOGRAM = _dft_sql()

QUERIES["dft_periodogram"] = q_dft_periodogram
_RAW_ORACLES["dft_periodogram"] = SQL_DFT_PERIODOGRAM


import math as _math

_SPRT_LN_LIFT = _math.log(1.1)
_SPRT_LN19 = _math.log(19.0)


def q_sprt_monitor(spark, sf_dir):
    """Wald sequential probability ratio test replayed over the month
    of daily purchase shares (Wald 1945 — the sequential monitor that
    lets a metric watch stop EARLY with guaranteed alpha/beta, the
    ancestor of every always-valid A/B sequential boundary): H0 = the
    pooled share p0, H1 = a 10% lift 1.1*p0, so the per-event
    log-likelihood ratio is x*ln(1.1) + (n-x)*ln((1-p1)/(1-p0)) and
    the cumulative LLR is a running window over the <=31-day frame;
    decision boundaries +-ln(19) are the alpha=beta=0.05 Wald bounds,
    with ln(1.1) and ln(19) pinned as identical python literals on
    both engines. Replaying against the POOLED p0 makes this an A/A
    null replay: the LLR should random-walk between the boundaries,
    and an early accept_h1 crossing flags a drifting metric (the
    sequential companion to srm_check). ONE corpus aggregate; the
    cumulative machinery never touches more than 31 rows."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__s"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0).alias("__pur"),
    )
    cells = ev.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__pur").cast("long").alias("__x"),
    )
    wc = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = cells.select(
        F.col("__s").alias("day"),
        F.sum("__n").over(wc).cast("long").alias("cum_events"),
        F.sum("__x").over(wc).cast("long").alias("cum_purchases"),
        F.sum("__n").over(wt).cast("long").alias("__N"),
        F.sum("__x").over(wt).cast("long").alias("__X"),
    )
    p0 = F.col("__X").cast("double") / F.col("__N").cast("double")
    p1 = F.lit(1.1) * p0
    l0 = F.log((F.lit(1.0) - p1) / (F.lit(1.0) - p0))
    llr = (
        F.col("cum_purchases").cast("double") * F.lit(_SPRT_LN_LIFT)
        + (F.col("cum_events") - F.col("cum_purchases")).cast("double")
        * l0
    )
    return t.select(
        "day", "cum_events", "cum_purchases",
        _r6(llr).alias("llr"),
        F.when(llr >= F.lit(_SPRT_LN19), F.lit("accept_h1"))
        .when(llr <= F.lit(-_SPRT_LN19), F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"),
    )


SQL_SPRT_MONITOR = f"""
WITH cells AS (
  SELECT CAST(day(ts) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS x
  FROM events GROUP BY 1
), t AS (
  SELECT s AS day,
    CAST(sum(n) OVER w AS BIGINT) AS cum_events,
    CAST(sum(x) OVER w AS BIGINT) AS cum_purchases,
    CAST(sum(n) OVER () AS BIGINT) AS nn,
    CAST(sum(x) OVER () AS BIGINT) AS xx
  FROM cells
  WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), f AS (
  SELECT day, cum_events, cum_purchases,
    CAST(cum_purchases AS DOUBLE) * CAST({_SPRT_LN_LIFT!r} AS DOUBLE)
    + CAST(cum_events - cum_purchases AS DOUBLE)
      * ln((1.0 - 1.1 * (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)))
           / (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))) AS llr
  FROM t
)
SELECT day, cum_events, cum_purchases,
  round(llr, 6) AS llr,
  CASE WHEN llr >= CAST({_SPRT_LN19!r} AS DOUBLE) THEN 'accept_h1'
       WHEN llr <= CAST({(-_SPRT_LN19)!r} AS DOUBLE) THEN 'accept_h0'
       ELSE 'continue' END AS decision
FROM f
"""

QUERIES["sprt_monitor"] = q_sprt_monitor
_RAW_ORACLES["sprt_monitor"] = SQL_SPRT_MONITOR


_SK_R = 20
_SK_K = [_math.exp(-float(c)) for c in range(10)]


def q_sinkhorn_ot(spark, sf_dir):
    """Entropic optimal transport between the purchase and click value
    histograms by Sinkhorn-Knopp scaling (Cuturi NeurIPS 2013 — the
    regularized OT that made transport distances practical for ML;
    the geometry-aware drift metric beside wasserstein_drift's exact
    1-D EMD, and the same machinery behind dataset-distance work like
    OTDD): both streams bin into 10 equal-width value buckets (width
    from the shared max via a registered 1-row boundary broadcast),
    marginals are exact-count ratios, the Gibbs kernel
    K_ij = exp(-|i-j|) is a 10-literal python table pinned identically
    on both engines, and 20 u/v scaling rounds run as array
    transforms with ascending folds and one select/CTE per step —
    literally the same float sequence cross-engine. Output: the
    transport cost <P, C>, the row-marginal residual after the final
    column update (the convergence certificate), and the plan
    entropy. ONE corpus aggregate; the iteration state is 2x10
    doubles at any scale."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.col("event_type").alias("__t"),
        (F.signum("value")
         * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)))
        .cast("long").alias("__c"),
    )
    mx = ev.agg(F.max("__c").alias("__mx"))
    binned = ev.crossJoin(mx).select(
        "__t",
        (F.col("__c") / (F.floor(F.col("__mx") / 10) + 1))
        .cast("long").alias("__b"),
    )
    cells = binned.groupBy("__b").agg(
        F.sum(F.when(F.col("__t") == "purchase", 1).otherwise(0))
        .cast("long").alias("__pa"),
        F.sum(F.when(F.col("__t") == "click", 1).otherwise(0))
        .cast("long").alias("__pb"),
    )
    one = cells.agg(
        F.sort_array(
            F.collect_list(F.struct("__b", "__pa", "__pb"))
        ).alias("__arr")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.coalesce(
                F.try_element_at(
                    F.filter(
                        F.col("__arr"), lambda e: e["__b"] == i
                    ), F.lit(1)
                )["__pa"],
                F.lit(0).cast("long"),
            ),
        ).alias("pa"),
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.coalesce(
                F.try_element_at(
                    F.filter(
                        F.col("__arr"), lambda e: e["__b"] == i
                    ), F.lit(1)
                )["__pb"],
                F.lit(0).cast("long"),
            ),
        ).alias("pb"),
    )
    karr = F.array(*[F.lit(v) for v in _SK_K])

    def kk(i, j):
        return F.element_at(karr, F.abs(i - j) + 1)

    df = one.select(
        F.transform(
            "pa",
            lambda e: e.cast("double")
            / F.aggregate(
                F.col("pa"), F.lit(0).cast("long"), lambda a, b: a + b
            ).cast("double"),
        ).alias("a"),
        F.transform(
            "pb",
            lambda e: e.cast("double")
            / F.aggregate(
                F.col("pb"), F.lit(0).cast("long"), lambda a, b: a + b
            ).cast("double"),
        ).alias("b"),
    )
    seq10 = F.sequence(F.lit(1), F.lit(10))

    # One fold carries the (u, v) pair as a 20-element array — 40
    # chained projections of higher-order functions stall Catalyst
    # analysis, a single aggregate does not. The inner transform-over-
    # singleton binds u' once per round (DuckDB mirrors round-by-round
    # with the identical update expressions, so the floats match).
    def round_step(acc):
        vprev = F.slice(acc, 11, 10)
        uexpr = F.transform(
            seq10,
            lambda i: F.element_at("a", i)
            / F.aggregate(
                seq10, F.lit(0.0),
                lambda a2, j: a2 + kk(i, j) * F.element_at(vprev, j),
            ),
        )
        return F.element_at(
            F.transform(
                F.array(uexpr),
                lambda u: F.concat(
                    u,
                    F.transform(
                        seq10,
                        lambda j: F.element_at("b", j)
                        / F.aggregate(
                            seq10, F.lit(0.0),
                            lambda a2, i: a2
                            + kk(i, j) * F.element_at(u, i),
                        ),
                    ),
                ),
            ),
            1,
        )

    ones = F.transform(seq10, lambda i: F.lit(1.0))
    df = df.select(
        "a", "b",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(_SK_R)),
            F.concat(ones, ones),
            lambda acc, t: round_step(acc),
        ).alias("uv"),
    ).select(
        "a", "b",
        F.slice("uv", 1, 10).alias("uR"),
        F.slice("uv", 11, 10).alias("vR"),
    )
    plan = lambda i, j: (
        F.element_at("uR", i) * kk(i, j) * F.element_at("vR", j)
    )
    cost = F.aggregate(
        F.sequence(F.lit(1), F.lit(10)), F.lit(0.0),
        lambda acc, i: acc
        + F.aggregate(
            F.sequence(F.lit(1), F.lit(10)), F.lit(0.0),
            lambda a2, j: a2
            + plan(i, j) * F.abs(i - j).cast("double"),
        ),
    )
    resid = F.aggregate(
        F.sequence(F.lit(1), F.lit(10)), F.lit(0.0),
        lambda acc, i: acc
        + F.abs(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(10)), F.lit(0.0),
                lambda a2, j: a2 + plan(i, j),
            )
            - F.element_at("a", i)
        ),
    )
    return df.select(
        F.lit(_SK_R).alias("iterations"),
        _r6(cost).alias("ot_cost"),
        _r6(resid).alias("row_marginal_resid"),
    )


def _sinkhorn_sql() -> str:
    R = _SK_R
    klit = "[" + ", ".join(
        f"CAST({v!r} AS DOUBLE)" for v in _SK_K
    ) + "]"
    kk = f"({klit})[abs(i - j) + 1]"
    kkji = f"({klit})[abs(i - j) + 1]"
    its = []
    prev = "v0"
    for t in range(1, R + 1):
        its.append(
            f"iu{t} AS (SELECT *, list_transform(range(1, 11), i -> "
            f"a[i] / list_reduce(list_transform(range(1, 11), j -> "
            f"{kk} * {prev}[j]), (x, y) -> x + y)) AS u{t} FROM "
            f"{'init' if t == 1 else 'iv' + str(t - 1)})"
        )
        its.append(
            f"iv{t} AS (SELECT *, list_transform(range(1, 11), j -> "
            f"b[j] / list_reduce(list_transform(range(1, 11), i -> "
            f"{kkji} * u{t}[i]), (x, y) -> x + y)) AS v{t} FROM iu{t})"
        )
        prev = f"v{t}"
    plan = f"u{R}[i] * ({klit})[abs(i - j) + 1] * v{R}[j]"
    return f"""
WITH e AS (
  SELECT event_type AS t,
    CAST(floor(abs(value)*100 + 0.5) * sign(value) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click')
), mx AS (SELECT CAST(max(c) AS BIGINT) AS mx FROM e),
binned AS (
  SELECT t, CAST(c // (mx // 10 + 1) AS BIGINT) AS b FROM e, mx
), cells AS (
  SELECT b,
    CAST(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS pa,
    CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS pb
  FROM binned GROUP BY b
), dense AS (
  SELECT i AS b, coalesce(pa, 0) AS pa, coalesce(pb, 0) AS pb
  FROM (SELECT unnest(range(0, 10)) AS i)
  LEFT JOIN cells ON cells.b = i
), one AS (
  SELECT list(pa ORDER BY b) AS lpa, list(pb ORDER BY b) AS lpb
  FROM dense
), init AS (
  SELECT
    list_transform(lpa, e -> CAST(e AS DOUBLE)
      / CAST(list_reduce(lpa, (x, y) -> x + y) AS DOUBLE)) AS a,
    list_transform(lpb, e -> CAST(e AS DOUBLE)
      / CAST(list_reduce(lpb, (x, y) -> x + y) AS DOUBLE)) AS b,
    list_transform(range(1, 11), i -> 1.0) AS v0
  FROM one
),
{",".join(its)}
SELECT {R} AS iterations,
  round(list_reduce(list_transform(range(1, 11), i ->
    list_reduce(list_transform(range(1, 11), j ->
      {plan} * CAST(abs(i - j) AS DOUBLE)), (x, y) -> x + y)),
    (x, y) -> x + y), 6) AS ot_cost,
  round(list_reduce(list_transform(range(1, 11), i ->
    abs(list_reduce(list_transform(range(1, 11), j ->
      {plan}), (x, y) -> x + y) - a[i])), (x, y) -> x + y), 6)
    AS row_marginal_resid
FROM iv{R}
"""


SQL_SINKHORN_OT = _sinkhorn_sql()

QUERIES["sinkhorn_ot"] = q_sinkhorn_ot
_RAW_ORACLES["sinkhorn_ot"] = SQL_SINKHORN_OT


def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis rank one-way ANOVA of event value across event
    types (Kruskal & Wallis 1952 — the distribution-free complement to
    levene_test/welch_pairs: it asks whether ANY group's value
    distribution is shifted, with no normality assumption, which is
    the right omnibus test for heavy-tailed revenue-like values).
    Ranks never require a global per-row sort: doubled mid-ranks
    r2(c) = 2*cum_before + t_c + 1 come from the DISTINCT-cents
    histogram (the spearman_rank convention) and stay EXACT INTEGERS;
    per-group rank sums R2_g are exact longs; H = 12/(N(N+1)) *
    sum_g (R2_g/2)^2/n_g - 3(N+1) and the tie correction
    C = 1 - sum(t^3-t)/(N^3-N) fold group-sorted/value-sorted over
    bounded frames. ONE corpus agg to the histogram + one rank join
    back + one group agg. At 10^12 rows the rank table is the value
    histogram."""
    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"),
        (F.signum("value")
         * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)))
        .cast("long").alias("__c"),
    )
    hist = ev.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    wv = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranks = hist.select(
        "__c", "__t",
        (2 * (F.sum("__t").over(wv) - F.col("__t"))
         + F.col("__t") + 1).cast("long").alias("__r2"),
    )
    joined = ev.join(ranks.select("__c", "__r2"), "__c")
    grp = joined.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("__r2").cast("long").alias("r2g"),
    )
    tiefrm = hist.agg(
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).cast("long").alias("tie")
    )
    one = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("g", "ng", "r2g"))
        ).alias("__arr"),
    ).crossJoin(tiefrm)
    nd = F.col("n").cast("double")
    sb = F.aggregate(
        F.transform(
            F.col("__arr"),
            lambda e: (e["r2g"].cast("double") / F.lit(2.0))
            * (e["r2g"].cast("double") / F.lit(2.0))
            / e["ng"].cast("double"),
        ),
        F.lit(0.0), lambda a, b: a + b,
    )
    h = F.lit(12.0) / (nd * (nd + F.lit(1.0))) * sb \
        - F.lit(3.0) * (nd + F.lit(1.0))
    corr = F.lit(1.0) - F.col("tie").cast("double") / (
        nd * nd * nd - nd
    )
    return one.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.col("tie").alias("tie_term"),
        _r6(h).alias("h_stat"),
        _r6(h / corr).alias("h_corrected"),
    )


SQL_KRUSKAL_WALLIS = """
WITH e AS (
  SELECT event_type AS g,
    CAST(floor(abs(value)*100 + 0.5) * sign(value) AS BIGINT) AS c
  FROM events
), hist AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM e GROUP BY c
), ranks AS (
  SELECT c, t,
    CAST(2 * (sum(t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) - t) + t + 1 AS BIGINT)
      AS r2
  FROM hist
), grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
    CAST(sum(r2) AS BIGINT) AS r2g
  FROM e JOIN ranks USING (c) GROUP BY g
), tiefrm AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie FROM hist
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
    coalesce(list_reduce(
      list((CAST(r2g AS DOUBLE) / 2.0) * (CAST(r2g AS DOUBLE) / 2.0)
           / CAST(ng AS DOUBLE) ORDER BY g),
      (a, b) -> a + b), 0.0) AS sb
  FROM grp
), f AS (
  SELECT k, n, tie,
    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sb
      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
    1.0 - CAST(tie AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
         - CAST(n AS DOUBLE)) AS corr
  FROM one, tiefrm
)
SELECT k AS k_groups, n AS n_total, tie AS tie_term,
  round(h, 6) AS h_stat,
  round(h / corr, 6) AS h_corrected
FROM f
"""

QUERIES["kruskal_wallis"] = q_kruskal_wallis
_RAW_ORACLES["kruskal_wallis"] = SQL_KRUSKAL_WALLIS


def q_mcnemar_test(spark, sf_dir):
    """McNemar's test on the cohens_kappa rater pair (McNemar 1947;
    Edwards 1948 continuity correction — the PAIRED disagreement test
    that kappa does not give you: kappa says how much two
    quality-filter rules agree, McNemar says whether their
    DISAGREEMENTS are one-sided, i.e. one rule is systematically
    stricter, which is what you check before swapping rule A for rule
    B in a curation pipeline). Uses the identical deterministic raters
    (n_chars >= 120 vs >= 20 words via the space-count identity); the
    discordant cells b = A-only, c = B-only come from ONE aggregate;
    chi2 = (b-c)^2/(b+c) and the corrected (|b-c|-1)^2/(b+c) are
    single exact-integer-ratio divisions."""
    d = load(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 120, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("__ra"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 20,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__rb"),
    )
    a = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("__ra") * (1 - F.col("__rb"))).cast("long")
        .alias("b_only_a"),
        F.sum((1 - F.col("__ra")) * F.col("__rb")).cast("long")
        .alias("c_only_b"),
    )
    b = F.col("b_only_a")
    c = F.col("c_only_b")
    bc = (b + c).cast("double")
    chi2 = F.when(
        b + c > 0,
        ((b - c) * (b - c)).cast("double") / bc,
    ).otherwise(F.lit(0.0))
    chi2_cc = F.when(
        b + c > 0,
        ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double") / bc,
    ).otherwise(F.lit(0.0))
    return a.select(
        "n_docs", "b_only_a", "c_only_b",
        _r6(chi2).alias("chi2"),
        _r6(chi2_cc).alias("chi2_corrected"),
        (chi2_cc > F.lit(3.841)).alias("one_sided_disagreement"),
    )


SQL_MCNEMAR_TEST = """
WITH d AS (
  SELECT CASE WHEN n_chars >= 120 THEN 1 ELSE 0 END AS ra,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 20
         THEN 1 ELSE 0 END AS rb
  FROM documents
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(ra * (1 - rb)) AS BIGINT) AS b_only_a,
    CAST(sum((1 - ra) * rb) AS BIGINT) AS c_only_b
  FROM d
)
SELECT n_docs, b_only_a, c_only_b,
  round(CASE WHEN b_only_a + c_only_b > 0
    THEN CAST((b_only_a - c_only_b) * (b_only_a - c_only_b) AS DOUBLE)
         / CAST(b_only_a + c_only_b AS DOUBLE)
    ELSE 0.0 END, 6) AS chi2,
  round(CASE WHEN b_only_a + c_only_b > 0
    THEN CAST((abs(b_only_a - c_only_b) - 1)
              * (abs(b_only_a - c_only_b) - 1) AS DOUBLE)
         / CAST(b_only_a + c_only_b AS DOUBLE)
    ELSE 0.0 END, 6) AS chi2_corrected,
  CASE WHEN b_only_a + c_only_b > 0
    THEN CAST((abs(b_only_a - c_only_b) - 1)
              * (abs(b_only_a - c_only_b) - 1) AS DOUBLE)
         / CAST(b_only_a + c_only_b AS DOUBLE)
    ELSE 0.0 END > 3.841 AS one_sided_disagreement
FROM a
"""

QUERIES["mcnemar_test"] = q_mcnemar_test
_RAW_ORACLES["mcnemar_test"] = SQL_MCNEMAR_TEST
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_LB_H = 8
_LB_CHI2_8_95 = 15.507


def q_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau whiteness test of the daily event-volume
    series at lags 1..8 (Box & Pierce 1970; Ljung & Box 1978 — THE
    residual-autocorrelation gate: before trusting holt_trend /
    segmented_trend / dft_periodogram readings you ask whether the
    series is distinguishable from white noise at all). Sample ACF
    from EXACT INTEGERS: with y_t the daily counts and S their sum,
    z_t = n*y_t - S is an exact long, so den = sum z_t^2 and
    num_k = sum_{t>k} z_t z_{t-k} are exact longs and each
    rho_k = num_k/den is ONE division of identical integers on both
    engines (exact for daily counts up to ~3e7; at 10^12 rows/day
    widen to decimal). Q_LB = n(n+2) sum rho_k^2/(n-k) and the
    Box-Pierce Q_BP = n sum rho_k^2 are fixed left-assoc chains
    written identically on both sides; reject at the chi2(8) 95%
    point 15.507. ONE corpus aggregate; everything after the day
    histogram is a <=31-element array fold."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("s"),
    ).selectExpr(
        "n",
        "transform(sequence(1, cast(n as int)),"
        " t -> n * element_at(__a, t).__y - s) AS zs",
    ).selectExpr(
        "n", "zs",
        "aggregate(zs, 0L, (acc, z) -> acc + z * z) AS den",
    )
    nums = [
        f"CASE WHEN n > {k} THEN"
        f" aggregate(sequence({k} + 1, cast(n as int)), 0L,"
        f" (acc, t) -> acc + element_at(zs, t) * element_at(zs, t - {k}))"
        f" ELSE 0L END AS num{k}"
        for k in range(1, _LB_H + 1)
    ]
    one = one.selectExpr("n", "den", *nums)
    rhos = [
        f"CASE WHEN n > {k} AND den > 0 THEN"
        f" CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" ELSE 0.0D END AS rho{k}"
        for k in range(1, _LB_H + 1)
    ]
    one = one.selectExpr("n", "den", *rhos)
    lb_terms = " + ".join(
        f"(CASE WHEN n > {k} THEN rho{k} * rho{k}"
        f" / CAST(n - {k} AS DOUBLE) ELSE 0.0D END)"
        for k in range(1, _LB_H + 1)
    )
    bp_terms = " + ".join(
        f"rho{k} * rho{k}" for k in range(1, _LB_H + 1)
    )
    one = one.selectExpr(
        "n", "den", "rho1", "rho7",
        f"CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ({lb_terms})"
        " AS __qlb",
        f"CAST(n AS DOUBLE) * ({bp_terms}) AS __qbp",
    )
    return one.select(
        F.col("n").alias("n_days"),
        F.col("den").alias("den_z2"),
        _r6("rho1").alias("rho_1"),
        _r6("rho7").alias("rho_7"),
        _r6("__qlb").alias("q_ljung_box"),
        _r6("__qbp").alias("q_box_pierce"),
        (F.col("__qlb") > F.lit(_LB_CHI2_8_95)).alias("reject_white"),
    )


def _ljung_box_sql() -> str:
    nums = ", ".join(
        f"CASE WHEN n > {k} THEN"
        f" list_reduce(list_transform(range({k} + 1, CAST(n + 1 AS"
        f" INTEGER)), t -> zs[t] * zs[t - {k}]), (a, b) -> a + b)"
        f" ELSE 0 END AS num{k}"
        for k in range(1, _LB_H + 1)
    )
    rhos = ", ".join(
        f"CASE WHEN n > {k} AND den > 0 THEN"
        f" CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" ELSE 0.0 END AS rho{k}"
        for k in range(1, _LB_H + 1)
    )
    lb_terms = " + ".join(
        f"(CASE WHEN n > {k} THEN rho{k} * rho{k}"
        f" / CAST(n - {k} AS DOUBLE) ELSE 0.0 END)"
        for k in range(1, _LB_H + 1)
    )
    bp_terms = " + ".join(
        f"rho{k} * rho{k}" for k in range(1, _LB_H + 1)
    )
    return f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(y ORDER BY x) AS ys, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s
  FROM day
), z AS (
  SELECT n, list_transform(range(1, CAST(n + 1 AS INTEGER)),
    t -> n * ys[t] - s) AS zs
  FROM one
), dd AS (
  SELECT n, zs,
    list_reduce(list_transform(zs, zz -> zz * zz), (a, b) -> a + b)
      AS den
  FROM z
), nn AS (
  SELECT n, den, {nums} FROM dd
), rr AS (
  SELECT n, den, {rhos} FROM nn
), f AS (
  SELECT n, den, rho1, rho7,
    CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ({lb_terms}) AS qlb,
    CAST(n AS DOUBLE) * ({bp_terms}) AS qbp
  FROM rr
)
SELECT n AS n_days, den AS den_z2,
  round(rho1, 6) AS rho_1,
  round(rho7, 6) AS rho_7,
  round(qlb, 6) AS q_ljung_box,
  round(qbp, 6) AS q_box_pierce,
  qlb > {_LB_CHI2_8_95!r} AS reject_white
FROM f
"""


SQL_LJUNG_BOX = _ljung_box_sql()

QUERIES["ljung_box"] = q_ljung_box
_RAW_ORACLES["ljung_box"] = SQL_LJUNG_BOX
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_COX_R = 15


def _cox_den_duck(th: str) -> str:
    """Breslow MM denominator sum_bins d * n1 / (n0 + n1*theta) as a
    DuckDB left fold over the day-ascending risk-set list (exact
    logrank_test frame; list_reduce is a guaranteed sequential fold,
    matching Spark's aggregate)."""
    return (
        "list_reduce(list_transform(a, x ->"
        " CASE WHEN x.d1 + x.d0 > 0 AND x.n1 > 0 THEN"
        " CAST(x.d1 + x.d0 AS DOUBLE) * CAST(x.n1 AS DOUBLE)"
        " / (CAST(x.nt - x.n1 AS DOUBLE)"
        f"    + CAST(x.n1 AS DOUBLE) * {th})"
        " ELSE 0.0 END), (acc, t) -> acc + t)"
    )


def q_cox_ph(spark, sf_dir):
    """Cox proportional-hazards fit of the md5-parity arm effect on
    inter-purchase gap times (Cox 1972, Breslow 1974 tie handling —
    the regression companion to survival_km/logrank_test: logrank
    answers 'do the curves differ', Cox answers 'by WHAT hazard
    ratio', the effect size a curation A/B readout ships). One binary
    covariate makes the Breslow partial likelihood a function of
    theta = exp(beta) alone: L(theta) = theta^s1 / prod_bins
    (n0 + n1*theta)^d, and the score root solves s1/theta =
    sum d*n1/(n0 + n1*theta) — fitted by the monotone fixed-point
    iteration theta <- s1 / sum_bins d*n1/(n0 + n1*theta) (15 rounds
    from theta=1; the Zermelo/MM shape bradley_terry uses, so NO
    exp() inside the loop — ln enters once at the end under the
    catalog's cross-engine ln precedent). Risk sets are the EXACT
    logrank_test frame (hour-binned completed gaps, final open gap
    right-censored, arms hash-random so H0 is true by construction
    and hazard_ratio ~ 1): deaths/at-risk per bin are exact longs;
    Spark runs all 15 rounds as ONE nested-aggregate fold over the
    collected <=720-row array (the sinkhorn precedent — chained HOF
    projections stall Catalyst), DuckDB as a CTE chain with the
    identical per-round update expression; standard error
    1/sqrt(I(theta)) from the observed information
    I = sum d*n1*n0*theta/(n0+n1*theta)^2, Wald z = ln(theta)/se,
    and score_at_null re-reports the logrank O-E fold (cross-query
    consistency gate). At 10^12 events only the hour-bin curve
    crosses the global window; the fit itself is 1 row."""
    d = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("__e"),
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        "event_id",
    )
    mx = _events(spark, sf_dir).agg(
        F.max(F.col("ts").cast("timestamp").cast("double")).alias("__mx")
    )
    wlead = Window.partitionBy("__e").orderBy("__t", "event_id")
    g = d.withColumn("__nxt", F.lead("__t").over(wlead)).join(
        F.broadcast(mx)
    )
    sv = g.select(
        F.floor(
            (F.coalesce(F.col("__nxt"), F.col("__mx")) - F.col("__t"))
            / F.lit(3600.0)
        ).cast("long").alias("__day"),
        F.when(F.col("__nxt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("__obs"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("lr|"),
                                   F.col("__e").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    curve = sv.groupBy("__day").agg(
        F.sum(F.when(F.col("__arm") == 1, F.col("__obs")).otherwise(0))
        .cast("long").alias("__d1"),
        F.sum(F.when(F.col("__arm") == 1, 1 - F.col("__obs")).otherwise(0))
        .cast("long").alias("__c1"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__obs")).otherwise(0))
        .cast("long").alias("__d0"),
        F.sum(F.when(F.col("__arm") == 0, 1 - F.col("__obs")).otherwise(0))
        .cast("long").alias("__c0"),
    )
    wall = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tall = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = curve.select(
        "*",
        (
            F.sum(F.col("__d1") + F.col("__c1")).over(tall)
            - F.coalesce(
                F.sum(F.col("__d1") + F.col("__c1")).over(wall), F.lit(0)
            )
        ).cast("long").alias("__n1"),
        (
            F.sum(
                F.col("__d1") + F.col("__c1") + F.col("__d0") + F.col("__c0")
            ).over(tall)
            - F.coalesce(
                F.sum(
                    F.col("__d1") + F.col("__c1")
                    + F.col("__d0") + F.col("__c0")
                ).over(wall),
                F.lit(0),
            )
        ).cast("long").alias("__nt"),
    )
    agg = curve.agg(
        F.sum("__d1").cast("long").alias("s1"),
        F.sum("__d0").cast("long").alias("s0"),
        F.array_sort(
            F.collect_list(
                F.struct("__day", "__d1", "__d0", "__n1", "__nt")
            )
        ).alias("__a"),
    )
    # the per-round Breslow MM denominator as a Spark fold over __a,
    # parameterized on the current theta expression
    def den(th: str) -> str:
        return (
            "aggregate(__a, 0.0D, (acc, x) ->"
            " acc + (CASE WHEN x.__d1 + x.__d0 > 0 AND x.__n1 > 0 THEN"
            " cast(x.__d1 + x.__d0 as double) * cast(x.__n1 as double)"
            " / (cast(x.__nt - x.__n1 as double)"
            f"    + cast(x.__n1 as double) * {th})"
            " ELSE 0.0D END))"
        )

    th_fold = (
        f"aggregate(sequence(1, {_COX_R}), 1.0D, (th, r) ->"
        f" CASE WHEN {den('th')} > 0.0D THEN"
        f" cast(s1 as double) / {den('th')}"
        " ELSE th END) AS th"
    )
    agg = agg.selectExpr("s1", "s0", "__a", th_fold)
    info = (
        "aggregate(__a, 0.0D, (acc, x) ->"
        " acc + (CASE WHEN x.__d1 + x.__d0 > 0 AND x.__n1 > 0"
        " AND x.__nt > x.__n1 THEN"
        " cast(x.__d1 + x.__d0 as double) * cast(x.__n1 as double)"
        " * cast(x.__nt - x.__n1 as double) * th"
        " / ((cast(x.__nt - x.__n1 as double)"
        "     + cast(x.__n1 as double) * th)"
        "    * (cast(x.__nt - x.__n1 as double)"
        "       + cast(x.__n1 as double) * th))"
        " ELSE 0.0D END)) AS info"
    )
    u0 = (
        "aggregate(__a, 0.0D, (acc, x) ->"
        " acc + (CASE WHEN x.__d1 + x.__d0 > 0 THEN"
        " cast(x.__d1 as double) - cast(x.__d1 + x.__d0 as double)"
        " * cast(x.__n1 as double) / cast(x.__nt as double)"
        " ELSE 0.0D END)) AS u0"
    )
    agg = agg.selectExpr("s1", "s0", "th", info, u0)
    return agg.selectExpr(
        "s1 AS deaths_arm1",
        "s0 AS deaths_arm0",
        "th AS __th", "info AS __info", "u0 AS __u0",
    ).select(
        "deaths_arm1", "deaths_arm0",
        _r6("__th").alias("hazard_ratio"),
        _r6(
            F.when(F.col("__th") > 0, F.log(F.col("__th")))
        ).alias("log_hr"),
        _r6(
            F.when(
                F.col("__info") > 0,
                F.lit(1.0) / F.sqrt(F.col("__info")),
            )
        ).alias("se_log_hr"),
        _r6(
            F.when(
                (F.col("__th") > 0) & (F.col("__info") > 0),
                F.log(F.col("__th")) * F.sqrt(F.col("__info")),
            )
        ).alias("wald_z"),
        _r6("__u0").alias("score_at_null"),
    )


def _cox_sql() -> str:
    ctes = [
        """mx AS (SELECT max(epoch(ts)) AS mx FROM events)""",
        """d AS (
  SELECT user_id AS e, epoch(ts) AS t,
    lead(epoch(ts)) OVER (PARTITION BY user_id
                          ORDER BY epoch(ts), event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
)""",
        """sv AS (
  SELECT CAST(floor((coalesce(nxt, (SELECT mx FROM mx)) - t) / 3600.0)
              AS BIGINT) AS day,
    CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS obs,
    CAST(('0x' || substring(md5('lr|' || CAST(e AS VARCHAR)), 1, 15))
      ::UBIGINT % 2 AS BIGINT) AS arm
  FROM d
)""",
        """curve AS (
  SELECT day,
    CAST(sum(CASE WHEN arm = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
    CAST(sum(CASE WHEN arm = 1 THEN 1 - obs ELSE 0 END) AS BIGINT)
      AS c1,
    CAST(sum(CASE WHEN arm = 0 THEN obs ELSE 0 END) AS BIGINT) AS d0,
    CAST(sum(CASE WHEN arm = 0 THEN 1 - obs ELSE 0 END) AS BIGINT)
      AS c0
  FROM sv GROUP BY day
)""",
        """risk AS (
  SELECT day, d1, d0,
    CAST((SELECT sum(d1 + c1) FROM curve)
      - coalesce(sum(d1 + c1) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS n1,
    CAST((SELECT sum(d1 + c1 + d0 + c0) FROM curve)
      - coalesce(sum(d1 + c1 + d0 + c0) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS nt
  FROM curve
)""",
        """base AS (
  SELECT CAST(sum(d1) AS BIGINT) AS s1, CAST(sum(d0) AS BIGINT) AS s0,
    list({'d1': d1, 'd0': d0, 'n1': n1, 'nt': nt} ORDER BY day) AS a,
    1.0 AS th0
  FROM risk
)""",
    ]
    prev = "base"
    for r in range(_COX_R):
        ctes.append(
            f"dn{r} AS (SELECT *, {_cox_den_duck(f'th{r}')} AS den{r}"
            f" FROM {prev})"
        )
        ctes.append(
            f"it{r} AS (SELECT *, CASE WHEN den{r} > 0.0 THEN"
            f" CAST(s1 AS DOUBLE) / den{r} ELSE th{r} END AS th{r + 1}"
            f" FROM dn{r})"
        )
        prev = f"it{r}"
    info = (
        "list_reduce(list_transform(a, x ->"
        " CASE WHEN x.d1 + x.d0 > 0 AND x.n1 > 0 AND x.nt > x.n1 THEN"
        " CAST(x.d1 + x.d0 AS DOUBLE) * CAST(x.n1 AS DOUBLE)"
        " * CAST(x.nt - x.n1 AS DOUBLE) * th"
        " / ((CAST(x.nt - x.n1 AS DOUBLE) + CAST(x.n1 AS DOUBLE) * th)"
        "    * (CAST(x.nt - x.n1 AS DOUBLE)"
        "       + CAST(x.n1 AS DOUBLE) * th))"
        " ELSE 0.0 END), (acc, t) -> acc + t)"
    )
    u0 = (
        "list_reduce(list_transform(a, x ->"
        " CASE WHEN x.d1 + x.d0 > 0 THEN"
        " CAST(x.d1 AS DOUBLE) - CAST(x.d1 + x.d0 AS DOUBLE)"
        " * CAST(x.n1 AS DOUBLE) / CAST(x.nt AS DOUBLE)"
        " ELSE 0.0 END), (acc, t) -> acc + t)"
    )
    ctes.append(
        f"fin AS (SELECT s1, s0, th{_COX_R} AS th, a FROM {prev})"
    )
    ctes.append(
        f"ff AS (SELECT s1, s0, th, {info} AS info, {u0} AS u0 FROM fin)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT s1 AS deaths_arm1, s0 AS deaths_arm0,\n"
        "  round(th, 6) AS hazard_ratio,\n"
        "  round(CASE WHEN th > 0 THEN ln(th) END, 6) AS log_hr,\n"
        "  round(CASE WHEN info > 0 THEN 1.0 / sqrt(info) END, 6)"
        " AS se_log_hr,\n"
        "  round(CASE WHEN th > 0 AND info > 0 THEN"
        " ln(th) * sqrt(info) END, 6) AS wald_z,\n"
        "  round(u0, 6) AS score_at_null\n"
        "FROM ff"
    )


SQL_COX_PH = _cox_sql()

QUERIES["cox_ph"] = q_cox_ph
_RAW_ORACLES["cox_ph"] = SQL_COX_PH
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}



_FR_CHI2_4_95 = 9.488


def q_friedman_test(spark, sf_dir):
    """Friedman blocked rank test (Friedman 1937) of event-type daily
    volume with day-of-month blocks — the WITHIN-block companion to
    kruskal_wallis: kruskal asks whether the value distributions of
    the types differ pooled over the month, Friedman asks whether the
    type ORDERING is consistent day after day, which is robust to the
    day-level volume swings that dominate a pooled test. Treatments =
    the 5 event types, blocks = days; the dense 31x5 measurement grid
    is built as 5 CONDITIONAL-COUNT COLUMNS of one day aggregate
    (missing cells are true zeros by construction — no type-grid
    cross join), and the within-block average ranks collapse to
    row-level integer expressions over those 5 columns using the
    catalog's doubled mid-rank convention r2_i = 2*#{c_j < c_i} +
    #{c_j = c_i} + 1 — no window, no shuffle beyond the two aggs.
    Per-type rank sums R2_j = 2*R_j and the rank-square total are
    exact longs from ONE global aggregate, and the tie-general
    statistic (Conover 1999 eq. 5.5, scaled by 4/4)
    Q = (k-1) * sum_j (R2_j - n(k+1))^2 / (sum r2^2 - n k (k+1)^2)
    is ONE division of exact integers — the no-tie case reduces to
    the familiar 12/(nk(k+1)) sum R_j^2 - 3n(k+1). The persisted
    1-row frame fans out to the 5 output rows (cached-branch
    convention); at 10^12 events the rank machinery is 31 rows."""
    from mpds_spark.operators.util import scratch_persist

    k = _BT_K
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
        "event_type",
    )
    day = ev.groupBy("__d").agg(*[
        F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("long").alias(f"c{i}")
        for i, t in enumerate(_BT_TYPES)
    ])
    r2s = []
    for i in range(k):
        lt = sum(
            F.when(F.col(f"c{j}") < F.col(f"c{i}"), 1).otherwise(0)
            for j in range(k) if j != i
        )
        eq = sum(
            F.when(F.col(f"c{j}") == F.col(f"c{i}"), 1).otherwise(0)
            for j in range(k) if j != i
        )
        r2s.append(
            (2 * lt + (eq + 1) + 1).cast("long").alias(f"r2_{i}")
        )
    r = day.select(*r2s)
    one = r.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[F.sum(f"r2_{i}").cast("long").alias(f"R2_{i}")
          for i in range(k)],
        F.sum(
            sum(F.col(f"r2_{i}") * F.col(f"r2_{i}") for i in range(k))
        ).cast("long").alias("__a4"),
    )
    ss = sum(
        (F.col(f"R2_{i}") - F.col("__n") * F.lit(k + 1))
        * (F.col(f"R2_{i}") - F.col("__n") * F.lit(k + 1))
        for i in range(k)
    ).cast("long")
    den = (
        F.col("__a4") - F.col("__n") * F.lit(k) * F.lit((k + 1) * (k + 1))
    ).cast("long")
    q = F.when(
        den > 0,
        F.lit(k - 1) * ss.cast("double") / den.cast("double"),
    ).otherwise(F.lit(0.0))
    one = scratch_persist(one.select(
        *[f"R2_{i}" for i in range(k)],
        F.col("__n").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        _r6(q).alias("q_friedman"),
        (q > F.lit(_FR_CHI2_4_95)).alias("reject_equal"),
    ))
    outs = [
        one.selectExpr(
            f"'{t}' AS event_type",
            f"CAST(R2_{i} AS DOUBLE) / 2.0 AS rank_sum",
            "n_blocks", "k_treatments", "q_friedman", "reject_equal",
        )
        for i, t in enumerate(_BT_TYPES)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def _friedman_sql() -> str:
    k = _BT_K
    cases = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, t in enumerate(_BT_TYPES)
    )
    r2s = []
    for i in range(k):
        lt = " + ".join(
            f"CASE WHEN c{j} < c{i} THEN 1 ELSE 0 END"
            for j in range(k) if j != i
        )
        eq = " + ".join(
            f"CASE WHEN c{j} = c{i} THEN 1 ELSE 0 END"
            for j in range(k) if j != i
        )
        r2s.append(
            f"CAST(2 * ({lt}) + (({eq}) + 1) + 1 AS BIGINT) AS r2_{i}"
        )
    sums = ", ".join(
        f"CAST(sum(r2_{i}) AS BIGINT) AS R2_{i}" for i in range(k)
    )
    sq = " + ".join(f"r2_{i} * r2_{i}" for i in range(k))
    ss = " + ".join(
        f"(R2_{i} - n * {k + 1}) * (R2_{i} - n * {k + 1})"
        for i in range(k)
    )
    finals = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type,"
        f" CAST(R2_{i} AS DOUBLE) / 2.0 AS rank_sum,"
        " n_blocks, k_treatments, q_friedman, reject_equal FROM f"
        for i, t in enumerate(_BT_TYPES)
    )
    return f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, {cases}
  FROM events GROUP BY 1
), r AS (
  SELECT {', '.join(r2s)} FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n, {sums},
    CAST(sum({sq}) AS BIGINT) AS a4
  FROM r
), f AS (
  SELECT {', '.join(f'R2_{i}' for i in range(k))},
    n AS n_blocks, CAST({k} AS BIGINT) AS k_treatments,
    round(CASE WHEN a4 - n * {k} * {(k + 1) * (k + 1)} > 0 THEN
      {k - 1} * CAST({ss} AS DOUBLE)
      / CAST(a4 - n * {k} * {(k + 1) * (k + 1)} AS DOUBLE)
    ELSE 0.0 END, 6) AS q_friedman,
    CASE WHEN a4 - n * {k} * {(k + 1) * (k + 1)} > 0 THEN
      {k - 1} * CAST({ss} AS DOUBLE)
      / CAST(a4 - n * {k} * {(k + 1) * (k + 1)} AS DOUBLE)
    ELSE 0.0 END > {_FR_CHI2_4_95!r} AS reject_equal
  FROM one
)
{finals}
"""


SQL_FRIEDMAN_TEST = _friedman_sql()

QUERIES["friedman_test"] = q_friedman_test
_RAW_ORACLES["friedman_test"] = SQL_FRIEDMAN_TEST


_JB_CHI2_2_95 = 5.991


def q_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test (Jarque & Bera 1980; Bowman &
    Shenton 1975) of each event type's daily-count series — the
    omnibus skew/kurtosis gate you run BEFORE trusting the Gaussian
    machinery downstream (gumbel block maxima, welch/levene/anova all
    assume rough normality of their inputs): JB = n/6 (g1^2 +
    (g2-3)^2/4) with g1 = sqrt(n) M3/M2^1.5 and g2 = n M4/M2^2.
    EXACT INTEGER central moments in ONE pass: with y_t the (type,
    day) counts, S = sum y and P_k = sum y^k raw power sums (exact
    longs / decimal(38,0) / HUGEINT), the scaled central moments of
    z_t = n*y_t - S expand binomially —
    M2z = n^2 P2 - n S^2, M3z = n^3 P3 - 3 n^2 S P2 + 2 n S^3,
    M4z = n^4 P4 - 4 n^3 S P3 + 6 n^2 S^2 P2 - 3 n S^4 —
    so NO mean-centering join and the corpus is touched ONCE; the
    n-scaling cancels inside g1/g2 (z = n*(y - mean) exactly).
    Every downstream value is a fixed expression tree over exact
    integers (x*sqrt(x) for the ^1.5, no pow) — the gate is exact
    with zero float folds (integer-exact for daily counts up to
    ~1e6/day at month scale; widen the decimal at 10^12 rows/day).
    Reject at the chi2(2) 95% point 5.991."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
    )
    cells = ev.groupBy("event_type", "__d").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    yd = F.col("__y").cast("decimal(38,0)")
    mom = cells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__p2"),
        F.sum(yd * yd * yd).cast("decimal(38,0)").alias("__p3"),
        F.sum(yd * yd * yd * yd).cast("decimal(38,0)").alias("__p4"),
    )
    nn = F.col("__n").cast("decimal(38,0)")
    sd = F.col("__s").cast("decimal(38,0)")
    p2 = F.col("__p2").cast("decimal(38,0)")
    m2 = (nn * nn * p2 - nn * sd * sd).cast("double")
    m3 = (
        nn * nn * nn * F.col("__p3")
        - F.lit(3) * nn * nn * sd * p2
        + F.lit(2) * nn * sd * sd * sd
    ).cast("double")
    m4 = (
        nn * nn * nn * nn * F.col("__p4")
        - F.lit(4) * nn * nn * nn * sd * F.col("__p3")
        + F.lit(6) * nn * nn * sd * sd * p2
        - F.lit(3) * nn * sd * sd * sd * sd
    ).cast("double")
    nd = F.col("__n").cast("double")
    g1 = F.when(
        m2 > 0, F.sqrt(nd) * m3 / (m2 * F.sqrt(m2))
    ).otherwise(F.lit(0.0))
    g2 = F.when(m2 > 0, nd * m4 / (m2 * m2)).otherwise(F.lit(0.0))
    jb = nd / F.lit(6.0) * (
        g1 * g1
        + (g2 - F.lit(3.0)) * (g2 - F.lit(3.0)) / F.lit(4.0)
    )
    return mom.select(
        "event_type",
        F.col("__n").alias("n_days"),
        _r6(g1).alias("skew_g1"),
        _r6(g2).alias("kurt_g2"),
        _r6(jb).alias("jb_stat"),
        (jb > F.lit(_JB_CHI2_2_95)).alias("reject_normal"),
    )


SQL_JARQUE_BERA = f"""
WITH cells AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
    CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day(ts)
), mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s,
    CAST(sum(y * y) AS BIGINT) AS p2,
    CAST(sum(CAST(y AS HUGEINT) * y * y) AS HUGEINT) AS p3,
    CAST(sum(CAST(y AS HUGEINT) * y * y * y) AS HUGEINT) AS p4
  FROM cells GROUP BY event_type
), cm AS (
  SELECT event_type, n,
    CAST(CAST(n AS HUGEINT) * n * p2
         - CAST(n AS HUGEINT) * s * s AS DOUBLE) AS m2,
    CAST(CAST(n AS HUGEINT) * n * n * p3
         - 3 * CAST(n AS HUGEINT) * n * s * p2
         + 2 * CAST(n AS HUGEINT) * s * s * s AS DOUBLE) AS m3,
    CAST(CAST(n AS HUGEINT) * n * n * n * p4
         - 4 * CAST(n AS HUGEINT) * n * n * s * p3
         + 6 * CAST(n AS HUGEINT) * n * s * s * p2
         - 3 * CAST(n AS HUGEINT) * s * s * s * s AS DOUBLE) AS m4
  FROM mom
), f AS (
  SELECT event_type, n,
    CASE WHEN m2 > 0 THEN
      sqrt(CAST(n AS DOUBLE)) * m3 / (m2 * sqrt(m2))
    ELSE 0.0 END AS g1,
    CASE WHEN m2 > 0 THEN
      CAST(n AS DOUBLE) * m4 / (m2 * m2)
    ELSE 0.0 END AS g2
  FROM cm
), jb AS (
  SELECT event_type, n, g1, g2,
    CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0)
      AS jb
  FROM f
)
SELECT event_type, n AS n_days,
  round(g1, 6) AS skew_g1,
  round(g2, 6) AS kurt_g2,
  round(jb, 6) AS jb_stat,
  jb > {_JB_CHI2_2_95!r} AS reject_normal
FROM jb
"""

QUERIES["jarque_bera"] = q_jarque_bera
_RAW_ORACLES["jarque_bera"] = SQL_JARQUE_BERA
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_BC_LAMBDAS = [-1.0, -0.5, 0.0, 0.5, 1.0]


def _bc_x(lam: float) -> str:
    """Box-Cox transform of yv at the grid point, as expression text
    executed verbatim by both engines (sqrt/ln only — no generic pow).
    yv is bound by the caller's fold lambda."""
    if lam == -1.0:
        return "(1.0 - 1.0 / yv)"
    if lam == -0.5:
        return "(2.0 * (1.0 - 1.0 / sqrt(yv)))"
    if lam == 0.0:
        return "ln(yv)"
    if lam == 0.5:
        return "(2.0 * (sqrt(yv) - 1.0))"
    return "(yv - 1.0)"


def q_box_cox_lambda(spark, sf_dir):
    """Box-Cox power-transform selection for the purchase-value
    distribution (Box & Cox 1964 — the feature-engineering step that
    decides HOW to transform a heavy-tailed monetary column before the
    Gaussian machinery: profile log-likelihood
    LL(lambda) = -n/2 ln(sigma2_lambda) + (lambda-1) sum ln y over the
    grid {-1, -1/2, 0, 1/2, 1}, where the transforms need only
    sqrt/ln/reciprocal — no generic pow). The corpus collapses ONCE to
    the DISTINCT-cents histogram (the kruskal_wallis convention), so
    every float enters via folds over the <=10k-element value-sorted
    array executed in identical order by both engines (ln/sqrt follow
    the catalog's cross-engine libm precedent); counts and n are exact
    longs. The persisted 1-row frame fans out to the 5 output rows
    (cached-branch convention); is_best breaks ties toward the
    smaller lambda. At 10^12 rows the histogram is still the number
    of distinct prices."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c")
    ).filter(F.col("__c") > 0)  # Box-Cox domain: strictly positive y
    hist = ev.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    one = hist.agg(
        F.sort_array(
            F.collect_list(F.struct("__c", "__t"))
        ).alias("__a"),
        F.sum("__t").cast("long").alias("n"),
    )

    def fold(body: str) -> str:
        # yv bound per element; t is the exact multiplicity
        return (
            "aggregate(__a, 0.0D, (acc, e) -> acc + ("
            "cast(e.__t as double) * "
            + body.replace(
                "yv", "(cast(e.__c as double) / 100.0)"
            )
            + "))"
        )

    cols = ["__a", "n", f"{fold('ln(yv)')} AS logsum"]
    for i, lam in enumerate(_BC_LAMBDAS):
        x = _bc_x(lam)
        cols.append(f"{fold(x)} AS s1_{i}")
        cols.append(f"{fold(f'{x} * {x}')} AS s2_{i}")
    one = one.selectExpr(*cols)
    lls = []
    for i, lam in enumerate(_BC_LAMBDAS):
        sig = (
            f"((s2_{i} - s1_{i} * s1_{i} / cast(n as double))"
            " / cast(n as double))"
        )
        lls.append(f"{sig} AS sigma2_{i}")
        lls.append(
            f"(-0.5 * cast(n as double) * ln({sig})"
            f" + ({lam!r} - 1.0) * logsum) AS ll_{i}"
        )
    one = one.selectExpr("n", *lls)
    best = "greatest(" + ", ".join(
        f"ll_{i}" for i in range(len(_BC_LAMBDAS))
    ) + ")"
    one = scratch_persist(one.selectExpr("*", f"{best} AS __best"))
    outs = [
        one.selectExpr(
            f"CAST({lam!r} AS DOUBLE) AS lambda",
            "n AS n_obs",
            f"sigma2_{i} AS __sig",
            f"ll_{i} AS __ll",
            # tie-break toward the smaller lambda: earlier grid points
            # claim the flag via strict comparison on the later ones
            "(ll_{i} >= __best{ties}) AS is_best".format(
                i=i,
                ties="".join(
                    f" AND ll_{j} < __best" for j in range(i)
                ),
            ),
        )
        for i, lam in enumerate(_BC_LAMBDAS)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "lambda", "n_obs",
        _r6("__sig").alias("sigma2"),
        _r6("__ll").alias("loglik"),
        "is_best",
    )


def _box_cox_sql() -> str:
    def fold(body: str) -> str:
        return (
            "list_reduce(list_transform(a, e -> CAST(e.t AS DOUBLE) * "
            + body.replace("yv", "(CAST(e.c AS DOUBLE) / 100.0)")
            + "), (acc, v) -> acc + v)"
        )

    scols = [fold("ln(yv)") + " AS logsum"]
    for i, lam in enumerate(_BC_LAMBDAS):
        x = _bc_x(lam)
        scols.append(f"{fold(x)} AS s1_{i}")
        scols.append(f"{fold(f'{x} * {x}')} AS s2_{i}")
    lls = []
    for i, lam in enumerate(_BC_LAMBDAS):
        sig = (
            f"((s2_{i} - s1_{i} * s1_{i} / CAST(n AS DOUBLE))"
            " / CAST(n AS DOUBLE))"
        )
        lls.append(f"{sig} AS sigma2_{i}")
        lls.append(
            f"(-0.5 * CAST(n AS DOUBLE) * ln({sig})"
            f" + ({lam!r} - 1.0) * logsum) AS ll_{i}"
        )
    best = "greatest(" + ", ".join(
        f"ll_{i}" for i in range(len(_BC_LAMBDAS))
    ) + ")"
    finals = " UNION ALL ".join(
        "SELECT CAST({lam!r} AS DOUBLE) AS lambda, n AS n_obs,"
        " round(sigma2_{i}, 6) AS sigma2,"
        " round(ll_{i}, 6) AS loglik,"
        " (ll_{i} >= best{ties}) AS is_best FROM b".format(
            lam=lam, i=i,
            ties="".join(
                f" AND ll_{j} < best" for j in range(i)
            ),
        )
        for i, lam in enumerate(_BC_LAMBDAS)
    )
    return f"""
WITH ev AS (
  SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
    AND CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) > 0
), hist AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM ev GROUP BY c
), one AS (
  SELECT list({{'c': c, 't': t}} ORDER BY c) AS a,
    CAST(sum(t) AS BIGINT) AS n
  FROM hist
), s AS (
  SELECT n, {', '.join(scols)} FROM one
), l AS (
  SELECT n, logsum, {', '.join(lls)} FROM s
), b AS (
  SELECT *, {best} AS best FROM l
)
{finals}
"""


SQL_BOX_COX_LAMBDA = _box_cox_sql()

QUERIES["box_cox_lambda"] = q_box_cox_lambda
_RAW_ORACLES["box_cox_lambda"] = SQL_BOX_COX_LAMBDA
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_DF_TAU_MU_5PCT = -2.96


def q_dickey_fuller(spark, sf_dir):
    """Dickey-Fuller unit-root test of the daily event-volume series
    (Dickey & Fuller 1979; drift specification Delta y_t = alpha +
    beta y_{t-1} + eps, the DF(0) regression — the stationarity gate
    you run BEFORE trusting ACF-based tooling like ljung_box /
    holt_trend: a unit root makes sample autocorrelations
    meaningless). OLS on the <=30-obs lag frame from EXACT INTEGER
    moments: with x = y_{t-1}, d = y_t - y_{t-1} (exact longs) and
    m = n-1 observations, beta = (m*Sxd - Sx*Sd)/(m*Sxx - Sx^2) is
    ONE division of exact integers, alpha = (Sd - beta*Sx)/m, and
    RSS = (SYYc - beta*SXYc)/m with SXYc/SYYc exact longs, so
    t = beta/se is a fixed expression tree — the gate is exact with
    zero float folds. Reject 'unit root' when t < -2.96 (Fuller 1976
    / MacKinnon 1991 tau_mu 5% point near n=30, pinned literal). The
    corpus is touched ONCE by the day aggregate; the regression frame
    is the <=31-day series."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    wlag = Window.orderBy("__x")
    lagf = day.select(
        F.col("__y").alias("__cur"),
        F.lag("__y").over(wlag).alias("__prev"),
    ).filter(F.col("__prev").isNotNull())
    mom = lagf.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("__prev").cast("long").alias("sx"),
        F.sum(F.col("__cur") - F.col("__prev")).cast("long").alias("sd"),
        F.sum(F.col("__prev") * F.col("__prev")).cast("long")
        .alias("sxx"),
        F.sum(
            F.col("__prev") * (F.col("__cur") - F.col("__prev"))
        ).cast("long").alias("sxd"),
        F.sum(
            (F.col("__cur") - F.col("__prev"))
            * (F.col("__cur") - F.col("__prev"))
        ).cast("long").alias("sdd"),
    )
    den = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    sxyc = (F.col("m") * F.col("sxd") - F.col("sx") * F.col("sd"))
    syyc = (F.col("m") * F.col("sdd") - F.col("sd") * F.col("sd"))
    beta = sxyc.cast("double") / den.cast("double")
    alpha = (
        F.col("sd").cast("double") - beta * F.col("sx").cast("double")
    ) / F.col("m").cast("double")
    rss = (syyc.cast("double") - beta * sxyc.cast("double")) \
        / F.col("m").cast("double")
    s2 = rss / (F.col("m") - 2).cast("double")
    se = F.sqrt(s2 * F.col("m").cast("double") / den.cast("double"))
    t = beta / se
    ok = (den > 0) & (F.col("m") > 2)
    return mom.select(
        (F.col("m") + 1).alias("n_days"),
        _r6(F.when(ok, beta)).alias("beta"),
        _r6(F.when(ok, alpha)).alias("alpha"),
        _r6(F.when(ok, t)).alias("t_stat"),
        F.when(ok, t < F.lit(_DF_TAU_MU_5PCT)).alias("unit_root_rejected"),
    )


SQL_DICKEY_FULLER = f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), lagf AS (
  SELECT y AS cur, lag(y) OVER (ORDER BY x) AS prev FROM day
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    CAST(sum(prev) AS BIGINT) AS sx,
    CAST(sum(cur - prev) AS BIGINT) AS sd,
    CAST(sum(prev * prev) AS BIGINT) AS sxx,
    CAST(sum(prev * (cur - prev)) AS BIGINT) AS sxd,
    CAST(sum((cur - prev) * (cur - prev)) AS BIGINT) AS sdd
  FROM lagf WHERE prev IS NOT NULL
), f AS (
  SELECT m,
    m * sxx - sx * sx AS den,
    m * sxd - sx * sd AS sxyc,
    m * sdd - sd * sd AS syyc,
    sx, sd
  FROM mom
), g AS (
  SELECT m, den, sx, sd,
    CAST(sxyc AS DOUBLE) / CAST(den AS DOUBLE) AS beta,
    (CAST(syyc AS DOUBLE)
     - CAST(sxyc AS DOUBLE) / CAST(den AS DOUBLE)
       * CAST(sxyc AS DOUBLE)) / CAST(m AS DOUBLE) AS rss
  FROM f WHERE den > 0 AND m > 2
), h AS (
  SELECT m, beta,
    (CAST(sd AS DOUBLE) - beta * CAST(sx AS DOUBLE))
      / CAST(m AS DOUBLE) AS alpha,
    beta / sqrt(rss / CAST(m - 2 AS DOUBLE)
                * CAST(m AS DOUBLE) / CAST(den AS DOUBLE)) AS t
  FROM g
)
SELECT m + 1 AS n_days,
  round(beta, 6) AS beta,
  round(alpha, 6) AS alpha,
  round(t, 6) AS t_stat,
  t < {_DF_TAU_MU_5PCT!r} AS unit_root_rejected
FROM h
"""

QUERIES["dickey_fuller"] = q_dickey_fuller
_RAW_ORACLES["dickey_fuller"] = SQL_DICKEY_FULLER
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_KMV_K = 256
_KMV_SPACE = float(1 << 60)  # 16^15, the 60-bit md5-prefix hash space


def q_kmv_distinct(spark, sf_dir):
    """KMV / k-minimum-values distinct-count sketch of users per event
    type and pooled (Bar-Yossef et al. RANDOM 2002; Beyer et al.
    SIGMOD 2007 unbiased estimator D = (k-1)/u_(k)) — the ORDER-
    STATISTIC sketch family beside hll_cardinality's register family:
    KMV supports set EXPRESSIONS (union/intersection via the combined
    k smallest) and gives a distribution-free error bound, which is
    why join-size planners carry it. Hashes are the catalog's 60-bit
    md5 prefixes (exact longs, uniform on [0, 2^60)); the k smallest
    per scope come from a rank window that plans as a per-partition
    WindowGroupLimit heap — never a global sort; when a scope has
    fewer than k distinct keys the sketch IS the exact set (est =
    count, the standard small-regime behavior). The estimate
    (k-1) * 2^60 / h_(k) is one division of exactly-representable
    values, audited against the exact distinct count per scope. At
    10^12 rows each scope ships k=256 longs — mergeable by taking
    the k smallest of a union."""
    ev = _events(spark, sf_dir).select("event_type", "user_id")
    stacked = ev.select(
        F.col("event_type").alias("__scope"), "user_id"
    ).unionAll(
        ev.select(F.lit("all").alias("__scope"), "user_id")
    ).distinct()
    h = stacked.select(
        "__scope",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16, 10,
        ).cast("long").alias("__h"),
    )
    exact = h.groupBy("__scope").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    wr = Window.partitionBy("__scope").orderBy("__h")
    topk = h.withColumn("__rn", F.row_number().over(wr)).filter(
        F.col("__rn") <= F.lit(_KMV_K)
    ).groupBy("__scope").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("__h").cast("long").alias("__kth"),
    )
    j = exact.join(topk, "__scope")
    est = F.when(
        F.col("k_used") < F.lit(_KMV_K),
        F.col("k_used").cast("double"),
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SPACE)
        / F.col("__kth").cast("double")
    )
    return j.select(
        F.col("__scope").alias("scope"),
        "exact_distinct",
        "k_used",
        _r6(est).alias("kmv_estimate"),
        _r6(
            (est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


SQL_KMV_DISTINCT = f"""
WITH stacked AS (
  SELECT DISTINCT scope, user_id FROM (
    SELECT event_type AS scope, user_id FROM events
    UNION ALL
    SELECT 'all' AS scope, user_id FROM events
  )
), h AS (
  SELECT scope,
    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
      ::UBIGINT AS BIGINT) AS hv
  FROM stacked
), exact AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS exact_distinct
  FROM h GROUP BY scope
), topk AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS k_used,
    CAST(max(hv) AS BIGINT) AS kth
  FROM (
    SELECT scope, hv,
      row_number() OVER (PARTITION BY scope ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= {_KMV_K}
  GROUP BY scope
), j AS (
  SELECT exact.scope, exact_distinct, k_used,
    CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE)
      ELSE {float(_KMV_K - 1)!r} * {_KMV_SPACE!r}
           / CAST(kth AS DOUBLE) END AS est
  FROM exact JOIN topk USING (scope)
)
SELECT scope, exact_distinct, k_used,
  round(est, 6) AS kmv_estimate,
  round((est - CAST(exact_distinct AS DOUBLE))
        / CAST(exact_distinct AS DOUBLE), 6) AS rel_err
FROM j
"""

QUERIES["kmv_distinct"] = q_kmv_distinct
_RAW_ORACLES["kmv_distinct"] = SQL_KMV_DISTINCT


def q_yule_k(spark, sf_dir):
    """Yule's characteristic K per source (Yule 1944, "The Statistical
    Study of Literary Vocabulary") plus Herdan's C (Herdan 1960) — the
    repeat-rate lexical-diversity pair that, unlike zipf_fit's slope
    or heaps_fit's growth exponent, is a CLOSED-FORM function of the
    frequency-of-frequencies: K = 10^4 (sum_w c_w^2 - N) / N^2 is
    (up to scale) the probability two random tokens are the same
    word, so template-heavy / boilerplate sources score high and
    diverse prose scores low — the cheap per-source screen you run
    before the expensive dedup passes. Token counts c_w are exact
    longs from ONE (source, word) aggregation (whitespace tokens, the
    corpus convention), K is a fixed expression over exact integers,
    and C = ln V / ln N rides the catalog's ln precedent. At 10^12
    tokens both reduce to the word-count table."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__w"),
    )
    cells = d.groupBy("source", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    mom = cells.groupBy("source").agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("sum_c2"),
    )
    nd = F.col("n_tokens").cast("double")
    k = (
        F.lit(10000.0)
        * (F.col("sum_c2") - F.col("n_tokens")).cast("double")
        / (nd * nd)
    )
    c = F.log(F.col("vocab").cast("double")) / F.log(nd)
    return mom.select(
        "source", "n_tokens", "vocab", "sum_c2",
        _r6(k).alias("yule_k"),
        _r6(c).alias("herdan_c"),
    )


SQL_YULE_K = """
WITH w AS (
  SELECT source,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), cells AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c
  FROM w GROUP BY source, word
), mom AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS vocab,
    CAST(sum(c * c) AS BIGINT) AS sum_c2
  FROM cells GROUP BY source
)
SELECT source, n_tokens, vocab, sum_c2,
  round(10000.0 * CAST(sum_c2 - n_tokens AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
    AS yule_k,
  round(ln(CAST(vocab AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6)
    AS herdan_c
FROM mom
"""

QUERIES["yule_k"] = q_yule_k
_RAW_ORACLES["yule_k"] = SQL_YULE_K
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_newman_modularity(spark, sf_dir):
    """Newman modularity of the BRAND partition over the co-order part
    graph (Newman & Girvan 2004; Newman PNAS 2006 eq. 17 — Q =
    sum_c [e_c/m - (d_c/2m)^2], the null-adjusted intra-community
    edge share): do parts of the same brand co-occur in orders more
    than the degree-preserving null predicts? The categorical
    companion to degree_assortativity (same %4-gated edge set, same
    persisted-edges convention): assortativity asks whether hubs
    attach to hubs, modularity asks whether a GIVEN labeling explains
    the edge structure — run with quality buckets or dedup components
    as the labels it is the audit that decides whether a partition is
    worth sharding by. Both sums are EXACT LONGS (intra-edge count;
    per-brand degree masses d_c and sum d_c^2 from one explode+agg),
    so Q = intra/m - sum(d_c^2)/(4m^2) is two divisions of exact
    integers. The 1-row edge-moment x 1-row degree-moment combine is
    the registered BNLJ; at 10^12 rows the brand frame is <=|brands|."""
    from mpds_spark.operators.graph import co_occurrence_edges
    from mpds_spark.operators.util import scratch_persist

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    e = scratch_persist(
        co_occurrence_edges(li, basket="l_orderkey", item="l_partkey")
    )
    brand = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("__pk"), F.col("p_brand").alias("__br")
    )
    ann = e.join(
        F.broadcast(brand.select(F.col("__pk").alias("a"),
                                 F.col("__br").alias("__ba"))), "a"
    ).join(
        F.broadcast(brand.select(F.col("__pk").alias("b"),
                                 F.col("__br").alias("__bb"))), "b"
    )
    em = ann.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(
            F.when(F.col("__ba") == F.col("__bb"), 1).otherwise(0)
        ).cast("long").alias("intra_edges"),
    )
    deg = e.select(
        F.explode(F.array("a", "b")).alias("__pk")
    ).groupBy("__pk").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    dc = deg.join(F.broadcast(brand), "__pk").groupBy("__br").agg(
        F.sum("__deg").cast("long").alias("__dc")
    )
    dm = dc.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum(F.col("__dc") * F.col("__dc")).cast("long").alias("__d2"),
    )
    j = em.join(F.broadcast(dm))
    md = F.col("n_edges").cast("double")
    intra_share = F.col("intra_edges").cast("double") / md
    expected = F.col("__d2").cast("double") / (F.lit(4.0) * md * md)
    return j.select(
        "n_edges", "intra_edges", "n_communities",
        _r6(intra_share).alias("intra_share"),
        _r6(expected).alias("expected_share"),
        _r6(intra_share - expected).alias("modularity"),
    )


SQL_NEWMAN_MODULARITY = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_partkey % 4 = 0
), e AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
), brand AS (
  SELECT p_partkey AS pk, p_brand AS br FROM part
), em AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
    CAST(sum(CASE WHEN ba.br = bb.br THEN 1 ELSE 0 END) AS BIGINT)
      AS intra_edges
  FROM e JOIN brand ba ON ba.pk = e.a
         JOIN brand bb ON bb.pk = e.b
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
), dc AS (
  SELECT brand.br, CAST(sum(degree) AS BIGINT) AS dcm
  FROM deg JOIN brand ON brand.pk = deg.node
  GROUP BY brand.br
), dm AS (
  SELECT CAST(count(*) AS BIGINT) AS n_communities,
    CAST(sum(dcm * dcm) AS BIGINT) AS d2
  FROM dc
)
SELECT n_edges, intra_edges, n_communities,
  round(CAST(intra_edges AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
    AS intra_share,
  round(CAST(d2 AS DOUBLE)
        / (4.0 * CAST(n_edges AS DOUBLE) * CAST(n_edges AS DOUBLE)), 6)
    AS expected_share,
  round(CAST(intra_edges AS DOUBLE) / CAST(n_edges AS DOUBLE)
        - CAST(d2 AS DOUBLE)
          / (4.0 * CAST(n_edges AS DOUBLE) * CAST(n_edges AS DOUBLE)),
        6) AS modularity
FROM em CROSS JOIN dm
"""

QUERIES["newman_modularity"] = q_newman_modularity
_RAW_ORACLES["newman_modularity"] = SQL_NEWMAN_MODULARITY


_HT_RATES = {"src0": 0.5, "src1": 0.25, "src2": 1.0, "src3": 0.1}


def q_horvitz_thompson(spark, sf_dir):
    """Horvitz-Thompson estimation audit over the deterministic
    stratified sample (Horvitz & Thompson JASA 1952): every kept doc
    is inverse-weighted by its inclusion probability pi_s (the
    stratum rate), so N_hat = n_kept/pi_s and T_hat(chars) =
    sum_kept(n_chars)/pi_s are design-unbiased totals — the estimator
    that makes rate-subsampled pipelines still report calibrated
    corpus statistics (count a 10%-sampled stratum at x10). Reuses
    the EXACT stratified_sample inclusion rule (md5 content-hash
    threshold, operators/sampling.py:371 — same seed, so the kept
    sets of the shared strata are identical across the two queries,
    pytest-asserted), audits the estimates against the true per-
    stratum totals, and pools the covered strata. Kept agg + true
    agg + |strata|-row join; at 10^12 docs the audit frame is
    |strata|+1 rows."""
    from mpds_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(docs, _HT_RATES, group="source")
    rates = spark.createDataFrame(
        [(g, float(x)) for g, x in _HT_RATES.items()],
        "source string, __pi double",
    )
    ka = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(F.col("n_chars").cast("long")).cast("long")
        .alias("__kchars"),
    )
    tr = docs.join(F.broadcast(rates), "source").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.col("n_chars").cast("long")).cast("long")
        .alias("chars_true"),
    )
    per = tr.join(ka, "source", "left").join(
        F.broadcast(rates), "source"
    ).select(
        "source",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        "n_true",
        (F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("__pi"))
        .alias("__nht"),
        "chars_true",
        (F.coalesce("__kchars", F.lit(0)).cast("double")
         / F.col("__pi")).alias("__cht"),
    )
    # pooled float totals fold in source order (integer sums are
    # order-free; the double HT sums are not)
    pooled = per.agg(
        F.lit("__all__").alias("source"),
        F.sum("n_kept").cast("long").alias("n_kept"),
        F.sum("n_true").cast("long").alias("n_true"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, __nht))),"
            " 0.0D, (acc, x) -> acc + x.__nht)"
        ).alias("__nht"),
        F.sum("chars_true").cast("long").alias("chars_true"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, __cht))),"
            " 0.0D, (acc, x) -> acc + x.__cht)"
        ).alias("__cht"),
    )
    allr = per.unionAll(pooled)
    return allr.select(
        "source", "n_kept", "n_true",
        _r6("__nht").alias("n_ht"),
        "chars_true",
        _r6("__cht").alias("chars_ht"),
        _r6(
            (F.col("__cht") - F.col("chars_true").cast("double"))
            / F.col("chars_true").cast("double")
        ).alias("chars_rel_err"),
    )


def _ht_sql() -> str:
    rv = ", ".join(f"('{g}', {x!r})" for g, x in _HT_RATES.items())
    return f"""
WITH rates(source, pi) AS (
  VALUES {rv}
), kept AS (
  SELECT d.source,
    CAST(count(*) AS BIGINT) AS n_kept,
    CAST(sum(n_chars) AS BIGINT) AS kchars
  FROM documents d JOIN rates USING (source)
  WHERE CAST(('0x' || substr(md5('strat|' || d.source || '|'
      || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0
    < rates.pi
  GROUP BY d.source
), tr AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_true,
    CAST(sum(n_chars) AS BIGINT) AS chars_true
  FROM documents d JOIN rates USING (source)
  GROUP BY d.source
), per AS (
  SELECT tr.source,
    CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
    tr.n_true,
    CAST(coalesce(kept.n_kept, 0) AS DOUBLE) / rates.pi AS nht,
    tr.chars_true,
    CAST(coalesce(kept.kchars, 0) AS DOUBLE) / rates.pi AS cht
  FROM tr LEFT JOIN kept ON kept.source = tr.source
          JOIN rates ON rates.source = tr.source
), pooled AS (
  SELECT '__all__' AS source,
    CAST(sum(n_kept) AS BIGINT) AS n_kept,
    CAST(sum(n_true) AS BIGINT) AS n_true,
    list_reduce(list_prepend(0.0, list(nht ORDER BY source)),
                (acc, x) -> acc + x) AS nht,
    CAST(sum(chars_true) AS BIGINT) AS chars_true,
    list_reduce(list_prepend(0.0, list(cht ORDER BY source)),
                (acc, x) -> acc + x) AS cht
  FROM per
), allr AS (
  SELECT * FROM per UNION ALL SELECT * FROM pooled
)
SELECT source, n_kept, n_true,
  round(nht, 6) AS n_ht,
  chars_true,
  round(cht, 6) AS chars_ht,
  round((cht - CAST(chars_true AS DOUBLE))
        / CAST(chars_true AS DOUBLE), 6) AS chars_rel_err
FROM allr
"""


SQL_HORVITZ_THOMPSON = _ht_sql()

QUERIES["horvitz_thompson"] = q_horvitz_thompson
_RAW_ORACLES["horvitz_thompson"] = SQL_HORVITZ_THOMPSON
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_km_confidence(spark, sf_dir):
    """Kaplan-Meier curve with Greenwood variance and log-log 95%
    bands (Greenwood 1926; Kalbfleisch & Prentice 2002 §1.4 —
    operators/survival.py kaplan_meier_ci): the same hour-binned
    user-lifetime curve as survival_km (identical risk sets,
    pytest-asserted), now shipping the uncertainty a retention
    readout is useless without — bands via the ln(-ln S) transform
    stay inside [0,1] (what survfit/lifelines print by default).
    Greenwood's G(t) folds over the same running window with
    integer-ratio d/(n(n-d)) terms in ascending-duration order; the
    DuckDB twin folds list(term ORDER BY day) over a theta self-join
    of the tiny curve. Bands NULL where undefined (S=1 before the
    first death; S=0 after risk exhaustion). Only the aggregated
    curve crosses the global window at any corpus size."""
    from mpds_spark.operators.survival import kaplan_meier_ci

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    out = kaplan_meier_ci(
        ev, entity="entity_id", ts="ts", churn_gap_days=7.0,
        bin_seconds=3600,
    )
    return out.select(
        "duration_bin",
        "n_risk",
        "n_events",
        "n_censored",
        _r6("km_survival").alias("km_survival"),
        _r6("se_greenwood").alias("se_greenwood"),
        _r6("lo95").alias("lo95"),
        _r6("hi95").alias("hi95"),
    )


SQL_KM_CONFIDENCE = """
WITH d AS (SELECT user_id AS e, epoch_us(ts) AS us FROM events),
mx AS (SELECT max(us) AS mx FROM d),
sp AS (SELECT e, min(us) AS s, max(us) AS t FROM d GROUP BY e),
sv AS (
  SELECT CAST((t - s) // 3600000000 AS BIGINT) AS day,
    CASE WHEN t <= (SELECT mx FROM mx) - 604800000000
         THEN 1 ELSE 0 END AS obs
  FROM sp
), curve AS (
  SELECT day, CAST(sum(obs) AS BIGINT) AS n_events,
    CAST(sum(1 - obs) AS BIGINT) AS n_censored
  FROM sv GROUP BY day
), risk AS (
  SELECT day, n_events, n_censored,
    CAST((SELECT sum(n_events + n_censored) FROM curve)
      - coalesce(sum(n_events + n_censored) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS n_risk
  FROM curve
), km AS (
  SELECT r1.day,
    list_sum(list(CASE WHEN r2.n_events < r2.n_risk
      THEN ln((r2.n_risk - r2.n_events)::DOUBLE / r2.n_risk::DOUBLE)
      ELSE 0.0 END ORDER BY r2.day)) AS lnsum,
    list_sum(list(CASE WHEN r2.n_events < r2.n_risk
      THEN r2.n_events::DOUBLE
           / (r2.n_risk::DOUBLE * (r2.n_risk - r2.n_events)::DOUBLE)
      ELSE 0.0 END ORDER BY r2.day)) AS g,
    max(CASE WHEN r2.n_events = r2.n_risk THEN 1 ELSE 0 END) AS zero
  FROM risk r1 JOIN risk r2 ON r2.day <= r1.day GROUP BY r1.day
), f AS (
  SELECT r.day, r.n_risk, r.n_events, r.n_censored,
    CASE WHEN k.zero = 1 THEN 0.0 ELSE exp(k.lnsum) END AS s,
    k.g
  FROM risk r JOIN km k ON k.day = r.day
)
SELECT day AS duration_bin, n_risk, n_events, n_censored,
  round(s, 6) AS km_survival,
  round(CASE WHEN s > 0 AND s < 1 THEN s * sqrt(g) END, 6)
    AS se_greenwood,
  round(CASE WHEN s > 0 AND s < 1 THEN
    exp(-exp(ln(-ln(s)) + 1.96 * (sqrt(g) / abs(ln(s))))) END, 6)
    AS lo95,
  round(CASE WHEN s > 0 AND s < 1 THEN
    exp(-exp(ln(-ln(s)) - 1.96 * (sqrt(g) / abs(ln(s))))) END, 6)
    AS hi95
FROM f
"""

QUERIES["km_confidence"] = q_km_confidence
_RAW_ORACLES["km_confidence"] = SQL_KM_CONFIDENCE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_SES_ALPHAS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_ses_alpha_grid(spark, sf_dir):
    """Simple-exponential-smoothing alpha selection for the daily
    event-volume series by one-step-ahead SSE over the grid
    alpha = 0.1..0.9 (Brown 1956; Hyndman & Athanasopoulos FPP3 §8.1
    — the forecasting-hyperparameter sweep beside holt_trend: SES is
    the level-only special case, and the SSE grid is exactly how
    statsmodels' fixed-smoothing path evaluates it): l_1 = y_1,
    e_t = y_t - l_{t-1}, l_t = alpha*y_t + (1-alpha)*l_{t-1}. Each
    alpha's recursion runs as ONE left fold over the day-ascending
    array with a (level, sse) struct accumulator — Spark seeds
    aggregate() with the first element and folds the rest via
    slice(); DuckDB's list_reduce seeds from the first element
    NATIVELY, so the two engines execute the identical float
    sequence by construction. Counts are exact longs; is_best takes
    the smallest SSE with the smaller-alpha tie-break. The persisted
    1-row frame fans out to the 9-row grid (cached-branch); at 10^12
    rows the fold still sees <=31 values."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).selectExpr(
        "n",
        "transform(__a, e -> cast(e.__y as double)) AS ys",
    )
    cols = ["n"]
    for i, a in enumerate(_SES_ALPHAS):
        fold = (
            "aggregate(slice(ys, 2, cast(n - 1 as int)),"
            " named_struct('l', element_at(ys, 1), 'sse', 0.0D),"
            f" (acc, y) -> named_struct("
            f"'l', {a!r} * y + (1.0 - {a!r}) * acc.l,"
            " 'sse', acc.sse + (y - acc.l) * (y - acc.l)))"
        )
        cols.append(f"{fold} AS st_{i}")
    one = one.selectExpr(*cols)
    one = scratch_persist(one.selectExpr(
        "n",
        *[c for i in range(len(_SES_ALPHAS))
          for c in (f"st_{i}.sse AS sse_{i}", f"st_{i}.l AS lvl_{i}")],
        "least(" + ", ".join(
            f"st_{i}.sse" for i in range(len(_SES_ALPHAS))
        ) + ") AS __best",
    ))
    outs = [
        one.selectExpr(
            f"CAST({a!r} AS DOUBLE) AS alpha",
            "n AS n_days",
            f"sse_{i} AS __sse",
            f"sqrt(sse_{i} / cast(n - 1 as double)) AS __rmse",
            f"lvl_{i} AS __lvl",
            "(sse_{i} <= __best{ties}) AS is_best".format(
                i=i,
                ties="".join(
                    f" AND sse_{j} > __best" for j in range(i)
                ),
            ),
        )
        for i, a in enumerate(_SES_ALPHAS)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "alpha", "n_days",
        _r6("__sse").alias("sse"),
        _r6("__rmse").alias("rmse"),
        _r6("__lvl").alias("final_level"),
        "is_best",
    )


def _ses_sql() -> str:
    # DuckDB list_reduce evaluates struct-accumulator fields
    # SEQUENTIALLY (the 'sse' field sees the already-updated 'l'), so
    # the oracle avoids struct accumulators entirely: each one-step
    # level l_{t-1} is recomputed from scratch as a plain DOUBLE fold
    # over the prefix (identical op sequence => bit-identical to the
    # running value), and the SSE folds t-ascending. O(n^2) on the
    # <=31-day frame.
    def lvl(a, hi):
        return (
            f"list_reduce(list_slice(ys, 1, {hi}), (acc, y) ->"
            f" CAST({a!r} AS DOUBLE) * y"
            f" + (CAST(1.0 AS DOUBLE) - CAST({a!r} AS DOUBLE)) * acc)"
        )

    folds = []
    for i, a in enumerate(_SES_ALPHAS):
        err = f"(ys[t] - {lvl(a, 't - 1')})"
        folds.append(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list_transform(range(2, CAST(n + 1 AS INTEGER)),"
            f" t -> {err} * {err})), (acc, v) -> acc + v) AS sse_{i}"
        )
        folds.append(f"{lvl(a, 'CAST(n AS INTEGER)')} AS lvl_{i}")
    best = "least(" + ", ".join(
        f"sse_{i}" for i in range(len(_SES_ALPHAS))
    ) + ")"
    finals = " UNION ALL ".join(
        "SELECT CAST({a!r} AS DOUBLE) AS alpha, n AS n_days,"
        " round(sse_{i}, 6) AS sse,"
        " round(sqrt(sse_{i} / CAST(n - 1 AS DOUBLE)), 6) AS rmse,"
        " round(lvl_{i}, 6) AS final_level,"
        " (sse_{i} <= best{ties}) AS is_best FROM b".format(
            a=a, i=i,
            ties="".join(
                f" AND sse_{j} > best" for j in range(i)
            ),
        )
        for i, a in enumerate(_SES_ALPHAS)
    )
    return f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(CAST(y AS DOUBLE) ORDER BY x) AS ys,
    CAST(count(*) AS BIGINT) AS n
  FROM day
), fl AS (
  SELECT n, {', '.join(folds)} FROM one
), b AS (
  SELECT *, {best} AS best FROM fl
)
{finals}
"""


SQL_SES_ALPHA_GRID = _ses_sql()

QUERIES["ses_alpha_grid"] = q_ses_alpha_grid
_RAW_ORACLES["ses_alpha_grid"] = SQL_SES_ALPHA_GRID
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_best_split_stump(spark, sf_dir):
    """CART decision-stump split finder (Breiman et al. 1984): the
    single n_chars threshold that best separates the >=20-words
    quality label by Gini impurity — the one-feature special case of
    the split search every tree learner runs, and the weak-supervision
    primitive that turns a labeling rule into a cheap surrogate
    feature threshold. The corpus collapses ONCE to the distinct-
    n_chars histogram with per-class counts (exact longs); prefix
    sums over the value-ascending window make every candidate split
    'x <= v' a row, the weighted Gini
    sum_side (n_s - (s1^2 + s0^2)/n_s) is a fixed expression over
    exact integers per candidate (single divisions), and the argmin
    is a TakeOrdered over (score, threshold) — smallest-threshold
    tie-break, no global sort. At 10^12 docs the candidate frame is
    the number of distinct lengths."""
    d = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("__v"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 20,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    hist = d.groupBy("__v").agg(
        F.sum("__y").cast("long").alias("__p"),
        F.sum(1 - F.col("__y")).cast("long").alias("__q"),
    )
    w = Window.orderBy("__v")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = hist.select(
        "__v",
        F.sum("__p").over(wc).cast("long").alias("__l1"),
        F.sum("__q").over(wc).cast("long").alias("__l0"),
        F.sum("__p").over(wt).cast("long").alias("__t1"),
        F.sum("__q").over(wt).cast("long").alias("__t0"),
    ).select(
        "__v", "__l1", "__l0", "__t1", "__t0",
        (F.col("__l1") + F.col("__l0")).alias("__nl"),
        (F.col("__t1") - F.col("__l1") + F.col("__t0") - F.col("__l0"))
        .alias("__nr"),
    ).filter((F.col("__nl") > 0) & (F.col("__nr") > 0))
    r1 = F.col("__t1") - F.col("__l1")
    r0 = F.col("__t0") - F.col("__l0")
    score = (
        F.col("__nl").cast("double")
        - (F.col("__l1") * F.col("__l1")
           + F.col("__l0") * F.col("__l0")).cast("double")
        / F.col("__nl").cast("double")
        + F.col("__nr").cast("double")
        - (r1 * r1 + r0 * r0).cast("double")
        / F.col("__nr").cast("double")
    )
    best = cand.select(
        "__v", "__l1", "__l0", "__t1", "__t0", "__nl", "__nr",
        score.alias("__score"),
    ).orderBy("__score", "__v").limit(1)
    n = (F.col("__t1") + F.col("__t0")).cast("double")
    gini_parent = F.lit(1.0) - (
        (F.col("__t1") * F.col("__t1")
         + F.col("__t0") * F.col("__t0")).cast("double") / (n * n)
    )
    return best.select(
        (F.col("__t1") + F.col("__t0")).alias("n_docs"),
        F.col("__t1").alias("n_pos"),
        F.col("__v").alias("best_threshold"),
        F.col("__nl").alias("n_left"),
        F.col("__l1").alias("pos_left"),
        F.col("__nr").alias("n_right"),
        (F.col("__t1") - F.col("__l1")).alias("pos_right"),
        _r6(gini_parent).alias("gini_parent"),
        _r6(F.col("__score") / n).alias("gini_split"),
        _r6(gini_parent - F.col("__score") / n).alias("gini_gain"),
    )


SQL_BEST_SPLIT_STUMP = """
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 20
         THEN 1 ELSE 0 END AS y
  FROM documents
), hist AS (
  SELECT v, CAST(sum(y) AS BIGINT) AS p,
    CAST(sum(1 - y) AS BIGINT) AS q
  FROM d GROUP BY v
), cand AS (
  SELECT v,
    CAST(sum(p) OVER wc AS BIGINT) AS l1,
    CAST(sum(q) OVER wc AS BIGINT) AS l0,
    CAST(sum(p) OVER () AS BIGINT) AS t1,
    CAST(sum(q) OVER () AS BIGINT) AS t0
  FROM hist
  WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
), scored AS (
  SELECT v, l1, l0, t1, t0, l1 + l0 AS nl,
    (t1 - l1) + (t0 - l0) AS nr,
    CAST(l1 + l0 AS DOUBLE)
      - CAST(l1 * l1 + l0 * l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE)
      + CAST((t1 - l1) + (t0 - l0) AS DOUBLE)
      - CAST((t1 - l1) * (t1 - l1) + (t0 - l0) * (t0 - l0) AS DOUBLE)
        / CAST((t1 - l1) + (t0 - l0) AS DOUBLE) AS score
  FROM cand
  WHERE l1 + l0 > 0 AND (t1 - l1) + (t0 - l0) > 0
), best AS (
  SELECT * FROM scored ORDER BY score, v LIMIT 1
)
SELECT t1 + t0 AS n_docs, t1 AS n_pos, v AS best_threshold,
  nl AS n_left, l1 AS pos_left, nr AS n_right, t1 - l1 AS pos_right,
  round(1.0 - CAST(t1 * t1 + t0 * t0 AS DOUBLE)
        / (CAST(t1 + t0 AS DOUBLE) * CAST(t1 + t0 AS DOUBLE)), 6)
    AS gini_parent,
  round(score / CAST(t1 + t0 AS DOUBLE), 6) AS gini_split,
  round(1.0 - CAST(t1 * t1 + t0 * t0 AS DOUBLE)
        / (CAST(t1 + t0 AS DOUBLE) * CAST(t1 + t0 AS DOUBLE))
        - score / CAST(t1 + t0 AS DOUBLE), 6) AS gini_gain
FROM best
"""

QUERIES["best_split_stump"] = q_best_split_stump
_RAW_ORACLES["best_split_stump"] = SQL_BEST_SPLIT_STUMP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_THSD_Q_K5_DF120 = 3.92  # studentized range q(0.05; k=5, df=120)


def q_tukey_hsd(spark, sf_dir):
    """Tukey-Kramer HSD post-hoc pairwise comparisons of event-type
    daily volume (Tukey 1949; Kramer 1956 unequal-n form) — the
    follow-up kruskal_wallis / friedman_test / anova_twoway all
    punt on: the omnibus tests say SOME types differ, HSD says WHICH
    pairs, with the studentized-range correction that keeps the
    familywise error at alpha across all 10 comparisons (what a naive
    10x welch sweep inflates). Per-type moments (n_i, S_i, sum y^2)
    come from 5 conditional-count column sets of ONE cell aggregate
    (exact longs); MSW = sum_g (n_g P2_g - S_g^2)/n_g / (N - k) is a
    fixed 5-term chain of exact-integer ratios; each pair's
    |mean_i - mean_j| tests against q* sqrt(MSW/2 (1/n_i + 1/n_j))
    with the pinned q(0.05; 5, 120) = 3.92 literal. The persisted
    1-row moment frame fans out to the 10 pair rows (cached-branch).
    At 10^12 events the comparison frame is 1 row."""
    from mpds_spark.operators.util import scratch_persist

    k = _BT_K
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__d"),
        "event_type",
    )
    cells = ev.groupBy("__d", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = cells.agg(*[
        c for i, t in enumerate(_BT_TYPES) for c in (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long").alias(f"n{i}"),
            F.sum(
                F.when(F.col("event_type") == t, F.col("__y"))
                .otherwise(0)
            ).cast("long").alias(f"s{i}"),
            F.sum(
                F.when(F.col("event_type") == t,
                       F.col("__y") * F.col("__y")).otherwise(0)
            ).cast("long").alias(f"p{i}"),
        )
    ])
    ssw = " + ".join(
        f"(cast(n{i} as double) * cast(p{i} as double)"
        f" - cast(s{i} as double) * cast(s{i} as double))"
        f" / cast(n{i} as double)"
        for i in range(k)
    )
    ntot = " + ".join(f"n{i}" for i in range(k))
    one = scratch_persist(one.selectExpr(
        "*",
        f"({ssw}) / cast(({ntot}) - {k} as double) AS msw",
        f"cast({ntot} as long) AS n_cells",
    ))
    outs = []
    for i in range(k):
        for j in range(i + 1, k):
            diff = (
                f"cast(s{i} as double) / cast(n{i} as double)"
                f" - cast(s{j} as double) / cast(n{j} as double)"
            )
            hsd = (
                f"{_THSD_Q_K5_DF120!r} * sqrt(msw / 2.0"
                f" * (1.0 / cast(n{i} as double)"
                f"    + 1.0 / cast(n{j} as double)))"
            )
            outs.append(one.selectExpr(
                f"'{_BT_TYPES[i]}' AS type_a",
                f"'{_BT_TYPES[j]}' AS type_b",
                "n_cells",
                f"({diff}) AS __diff",
                "msw AS __msw",
                f"({hsd}) AS __hsd",
                f"(abs({diff}) > {hsd}) AS significant",
            ))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "type_a", "type_b", "n_cells",
        _r6("__diff").alias("mean_diff"),
        _r6("__msw").alias("msw"),
        _r6("__hsd").alias("hsd_threshold"),
        "significant",
    )


def _tukey_sql() -> str:
    k = _BT_K
    moms = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n{i},"
        f" CAST(sum(CASE WHEN event_type = '{t}' THEN y ELSE 0 END)"
        f" AS BIGINT) AS s{i},"
        f" CAST(sum(CASE WHEN event_type = '{t}' THEN y * y ELSE 0 END)"
        f" AS BIGINT) AS p{i}"
        for i, t in enumerate(_BT_TYPES)
    )
    ssw = " + ".join(
        f"(CAST(n{i} AS DOUBLE) * CAST(p{i} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
        f" / CAST(n{i} AS DOUBLE)"
        for i in range(k)
    )
    ntot = " + ".join(f"n{i}" for i in range(k))
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            diff = (
                f"CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE)"
                f" - CAST(s{j} AS DOUBLE) / CAST(n{j} AS DOUBLE)"
            )
            hsd = (
                f"{_THSD_Q_K5_DF120!r} * sqrt(msw / 2.0"
                f" * (1.0 / CAST(n{i} AS DOUBLE)"
                f"    + 1.0 / CAST(n{j} AS DOUBLE)))"
            )
            pairs.append(
                f"SELECT '{_BT_TYPES[i]}' AS type_a,"
                f" '{_BT_TYPES[j]}' AS type_b, n_cells,"
                f" round({diff}, 6) AS mean_diff,"
                " round(msw, 6) AS msw,"
                f" round({hsd}, 6) AS hsd_threshold,"
                f" (abs({diff}) > {hsd}) AS significant FROM m"
            )
    return f"""
WITH cells AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, event_type,
    CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), one AS (
  SELECT {moms} FROM cells
), m AS (
  SELECT *, ({ssw}) / CAST(({ntot}) - {k} AS DOUBLE) AS msw,
    CAST({ntot} AS BIGINT) AS n_cells
  FROM one
)
{' UNION ALL '.join(pairs)}
"""


SQL_TUKEY_HSD = _tukey_sql()

QUERIES["tukey_hsd"] = q_tukey_hsd
_RAW_ORACLES["tukey_hsd"] = SQL_TUKEY_HSD
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_LW_D = 64


def q_ledoit_wolf_shrinkage(spark, sf_dir):
    """Ledoit-Wolf covariance shrinkage intensity for the embedding
    cloud (Ledoit & Wolf 2004, "A well-conditioned estimator for
    large-dimensional covariance matrices", JMA — THE closed-form
    answer to 'how much do I shrink the sample covariance toward
    mu*I before whitening/Mahalanobis at d=64': rho* = b^2/d^2 with
    d^2 = ||S - mu I||_F^2 the dispersion and b^2 = min(d^2,
    (1/n^2) sum_k ||y_k y_k' - S||_F^2) the estimation noise — the
    quantity sklearn's LedoitWolf.shrinkage_ returns, here with the
    MLE 1/n covariance of the SAME milli-quantized codes as
    pca_power_iter). EVERYTHING is exact integers until the final
    divisions: with A_ij = n M_ij - s_i s_j (scatter M, dim sums s)
    the covariance is A/n^2, so ||S||_F^2 = sum A^2/n^4 and
    tr(S) = sum A_ii/n^2 are exact-integer ratios; the noise term
    collapses by sum_k ||y_k y_k' - S||^2 = sum_k ||y_k||^4 -
    n||S||^2 with ||y_k||^2 = B_k/n^2, B_k = n^2 (x_k.x_k) -
    2n (x_k.s) + s.s exact per row (A^2/B^2 sums ride decimal(38,0)
    / HUGEINT). The dim^2-bounded scatter is the only corpus-scale
    agg (pca convention); two 1-row combines + the si broadcast are
    the registered BNLJs."""
    from mpds_spark.operators.util import scratch_persist

    D = _LW_D
    codes = scratch_persist(
        load(spark, sf_dir, "embeddings").select(
            F.transform(
                "embedding",
                lambda x: (
                    F.signum(x.cast("double"))
                    * F.floor(F.abs(x.cast("double")) * 1000
                              + F.lit(0.5))
                ).cast("long"),
            ).alias("q")
        )
    )
    tri = codes.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(D)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(D)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at("q", i)
                                * F.element_at("q", j)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    cells = tri.groupBy("i", "j").agg(
        F.sum("p").cast("long").alias("s")
    )
    dimsums = codes.select(
        F.posexplode("q").alias("__p0", "__v")
    ).groupBy((F.col("__p0") + 1).alias("i")).agg(
        F.sum("__v").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    si_row = scratch_persist(dimsums.agg(
        F.sort_array(F.collect_list(F.struct("i", "s", "c")))
        .alias("__a")
    ).selectExpr(
        "transform(__a, e -> e.s) AS si",
        "element_at(transform(__a, e -> e.c), 1) AS n",
        "aggregate(transform(__a, e -> e.s), 0L,"
        " (acc, s) -> acc + s * s) AS ss",
    ))
    perrow = codes.join(F.broadcast(si_row)).selectExpr(
        "n",
        "aggregate(q, 0L, (acc, v) -> acc + v * v) AS xx",
        f"aggregate(sequence(1, {D}), 0L, (acc, d) ->"
        " acc + element_at(q, d) * element_at(si, d)) AS xs",
        "ss",
    ).selectExpr(
        "cast(n * n * xx - 2 * n * xs + ss as decimal(38,0)) AS B"
    )
    momB = perrow.agg(
        F.sum(F.col("B") * F.col("B")).cast("decimal(38,0)")
        .alias("sumB2"),
    )
    cellsA = cells.join(F.broadcast(si_row)).selectExpr(
        "i", "j",
        "cast(n * s - element_at(si, i) * element_at(si, j) as"
        " decimal(38,0)) AS A",
    )
    momA = cellsA.selectExpr(
        "i", "j", "A",
        "CASE WHEN i = j THEN 1 ELSE 2 END AS w",
    ).agg(
        F.sum(F.expr("w * A * A")).cast("decimal(38,0)").alias("sumA2"),
        F.sum(F.expr("CASE WHEN i = j THEN A ELSE 0 END"))
        .cast("decimal(38,0)").alias("sumAii"),
    )
    one = si_row.select("n").join(F.broadcast(momA)).join(
        F.broadcast(momB)
    )
    nd = F.col("n").cast("double")
    dd = F.lit(float(D))
    n4 = nd * nd * nd * nd
    a2 = F.col("sumA2").cast("double")
    aii = F.col("sumAii").cast("double")
    b2s = F.col("sumB2").cast("double")
    mu = aii / (dd * nd * nd)
    d2 = (a2 - aii * aii / dd) / n4
    bbar2 = (b2s - nd * a2) / (n4 * nd * nd)
    b2 = F.least(bbar2, d2)
    rho = F.when(d2 > 0, b2 / d2).otherwise(F.lit(0.0))
    return one.select(
        F.col("n").alias("n_vectors"),
        F.lit(D).cast("long").alias("dim"),
        _r6(mu).alias("mu"),
        _r6(d2).alias("dispersion_d2"),
        _r6(bbar2).alias("noise_bbar2"),
        _r6(b2).alias("b2"),
        _r6(rho).alias("shrinkage"),
    )


def _lw_sql() -> str:
    D = _LW_D
    return f"""
WITH q AS (
  SELECT list_transform(embedding, x ->
    CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)
         * sign(CAST(x AS DOUBLE)) AS BIGINT)) AS q
  FROM embeddings
), tri AS (
  SELECT unnest(flatten(list_transform(range(1, {D + 1}), i ->
    list_transform(range(i, {D + 1}), j ->
      struct_pack(i := i, j := j, p := q[i]*q[j]))))) AS e
  FROM q
), cells AS (
  SELECT e.i AS i, e.j AS j, CAST(sum(e.p) AS BIGINT) AS s
  FROM tri GROUP BY 1, 2
), ds AS (
  SELECT i, CAST(sum(q[i]) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM (SELECT q, unnest(range(1, {D + 1})) AS i FROM q)
  GROUP BY i
), sir AS (
  SELECT list(s ORDER BY i) AS si, min(c) AS n,
    list_reduce(list_transform(list(s ORDER BY i), s -> s * s),
                (a, b) -> a + b) AS ss
  FROM ds
), perrow AS (
  SELECT CAST(sir.n * sir.n *
      list_reduce(list_transform(q.q, v -> v * v), (a, b) -> a + b)
    - 2 * sir.n *
      list_reduce(list_transform(range(1, {D + 1}), d ->
        q.q[d] * sir.si[d]), (a, b) -> a + b)
    + sir.ss AS HUGEINT) AS B
  FROM q CROSS JOIN sir
), momB AS (
  SELECT CAST(sum(B * B) AS HUGEINT) AS sumB2 FROM perrow
), cellsA AS (
  SELECT i, j,
    CAST(sir.n * cells.s - sir.si[i] * sir.si[j] AS HUGEINT) AS A
  FROM cells CROSS JOIN sir
), momA AS (
  SELECT CAST(sum((CASE WHEN i = j THEN 1 ELSE 2 END) * A * A)
              AS HUGEINT) AS sumA2,
    CAST(sum(CASE WHEN i = j THEN A ELSE 0 END) AS HUGEINT) AS sumAii
  FROM cellsA
), one AS (
  SELECT sir.n, momA.sumA2, momA.sumAii, momB.sumB2
  FROM sir CROSS JOIN momA CROSS JOIN momB
), f AS (
  SELECT n,
    CAST(sumAii AS DOUBLE)
      / ({float(D)!r} * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS mu,
    (CAST(sumA2 AS DOUBLE)
     - CAST(sumAii AS DOUBLE) * CAST(sumAii AS DOUBLE) / {float(D)!r})
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       * CAST(n AS DOUBLE)) AS d2,
    (CAST(sumB2 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(sumA2 AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
      AS bbar2
  FROM one
)
SELECT n AS n_vectors, CAST({D} AS BIGINT) AS dim,
  round(mu, 6) AS mu,
  round(d2, 6) AS dispersion_d2,
  round(bbar2, 6) AS noise_bbar2,
  round(least(bbar2, d2), 6) AS b2,
  round(CASE WHEN d2 > 0 THEN least(bbar2, d2) / d2 ELSE 0.0 END, 6)
    AS shrinkage
FROM f
"""


SQL_LEDOIT_WOLF = _lw_sql()

QUERIES["ledoit_wolf_shrinkage"] = q_ledoit_wolf_shrinkage
_RAW_ORACLES["ledoit_wolf_shrinkage"] = SQL_LEDOIT_WOLF
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_PH_DELTA = 0.001
_PH_LAMBDA = 0.05


def q_page_hinkley(spark, sf_dir):
    """Page-Hinkley drift monitor replayed over the month of daily
    purchase shares (Page 1954 §5; Hinkley 1971 — the mean-shift
    detector streaming-ML stacks (river/MOA) run per feature: the
    cumulative deviation from the RUNNING mean, m_t = sum_{i<=t}
    (x_i - xbar_i - delta), alarms when it rises more than lambda
    above its own running minimum; unlike cusum_changepoint's
    fixed-reference two-sided scan this tracks an adaptive baseline,
    and unlike sprt_monitor it needs no alternative hypothesis).
    Daily shares are exact-integer ratios p_t/n_t; every float after
    that is a PREFIX FOLD over the day-ascending array — running
    means, m, and the running minimum are all O(n^2)/O(n^3)
    recomputed-prefix folds executed identically by both engines
    (the ses_alpha_grid convention: plain DOUBLE accumulators only,
    no struct folds), so the replay is exact. An alarm says the share
    is NOT mean-stationary (the weekday pattern in this corpus does
    trip it — exactly what the detector is for). ONE corpus
    aggregate; the detector never sees more than 31 values."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__s"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0).alias("__pur"),
    )
    cells = ev.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__pur").cast("long").alias("__x"),
    )
    one = cells.agg(
        F.sort_array(
            F.collect_list(F.struct("__s", "__n", "__x"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).selectExpr(
        "n",
        "transform(__a, e -> e.__s) AS days",
        "transform(__a, e -> cast(e.__x as double)"
        " / cast(e.__n as double)) AS xs",
    )
    d, lam = _PH_DELTA, _PH_LAMBDA
    one = one.selectExpr(
        "n", "days", "xs",
        "transform(sequence(1, cast(n as int)), t ->"
        " element_at(xs, t)"
        " - aggregate(slice(xs, 1, t), 0.0D, (acc, v) -> acc + v)"
        f"   / cast(t as double) - {d!r}) AS devs",
    ).selectExpr(
        "n", "days", "xs",
        "transform(sequence(1, cast(n as int)), t ->"
        " aggregate(slice(devs, 1, t), 0.0D, (acc, v) -> acc + v))"
        " AS ms",
    ).selectExpr(
        "n", "days", "xs", "ms",
        "transform(sequence(1, cast(n as int)), t ->"
        " element_at(ms, t) - array_min(slice(ms, 1, t))) AS phs",
    )
    out = one.selectExpr(
        "posexplode(days) AS (__p, day)",
        "xs", "ms", "phs",
    ).selectExpr(
        "day",
        "element_at(xs, __p + 1) AS __x",
        "element_at(ms, __p + 1) AS __m",
        "element_at(phs, __p + 1) AS __ph",
    )
    return out.select(
        "day",
        _r6("__x").alias("share"),
        _r6("__m").alias("m_cum"),
        _r6("__ph").alias("ph_stat"),
        (F.col("__ph") > F.lit(lam)).alias("alarm"),
    )


SQL_PAGE_HINKLEY = f"""
WITH cells AS (
  SELECT CAST(day(ts) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS x
  FROM events GROUP BY 1
), one AS (
  SELECT list(s ORDER BY s) AS days,
    list(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY s) AS xs,
    CAST(count(*) AS BIGINT) AS n
  FROM cells
), dv AS (
  SELECT n, days, xs,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), t ->
      xs[t] - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_slice(xs, 1, t)), (acc, v) -> acc + v)
              / CAST(t AS DOUBLE) - {_PH_DELTA!r}) AS devs
  FROM one
), mm AS (
  SELECT n, days, xs,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), t ->
      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_slice(devs, 1, t)), (acc, v) -> acc + v)) AS ms
  FROM dv
), ph AS (
  SELECT n, days, xs, ms,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), t ->
      ms[t] - list_aggregate(list_slice(ms, 1, t), 'min')) AS phs
  FROM mm
), rows_out AS (
  SELECT days[t] AS day, xs[t] AS x, ms[t] AS m, phs[t] AS p
  FROM ph, unnest(range(1, CAST(n + 1 AS INTEGER))) AS u(t)
)
SELECT day,
  round(x, 6) AS share,
  round(m, 6) AS m_cum,
  round(p, 6) AS ph_stat,
  p > {_PH_LAMBDA!r} AS alarm
FROM rows_out
"""

QUERIES["page_hinkley"] = q_page_hinkley
_RAW_ORACLES["page_hinkley"] = SQL_PAGE_HINKLEY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_l_moments(spark, sf_dir):
    """L-moment shape statistics of the purchase-value distribution
    (Hosking JRSS-B 1990 — the order-statistic moments that stay
    FINITE and robust for the heavy-tailed monetary columns where
    jarque_bera's classical skew/kurtosis explode: L-CV, L-skewness
    and L-kurtosis are THE regional-frequency-analysis features and
    the distribution fingerprint that survives subsampling). Fully
    EXACT from the distinct-cents histogram: with c the rank mass
    before a value and t its multiplicity, the order-statistic sums
    collapse by sum_{i=c+1}^{c+t} C(i-1, r) = C(c+t, r+1) - C(c, r+1),
    carried as FALLING FACTORIALS P_{r+1}(m) = m(m-1)..(m-r) in
    decimal(38,0)/HUGEINT so no binomial division happens until the
    single exact-ratio division per b_r: b_r = G_r / ((r+1)! * n *
    C(n-1, r)) with G_r = sum_v v*(P_{r+1}(c+t) - P_{r+1}(c)).
    lambda_1..4 and the tau ratios are fixed expression trees over
    those four doubles. ONE corpus aggregate; everything after the
    histogram is a <=10k-row frame. Values in dollars (cents/100)."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c")
    )
    h = ev.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    w = Window.orderBy("__c")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    rows = h.select(
        "__c", "__t",
        F.coalesce(F.sum("__t").over(wc), F.lit(0)).cast("long")
        .alias("__b"),
    )

    def pfall(m: str, k: int) -> str:
        # falling factorial P_k(m) in decimal(38,0)
        terms = " * ".join(
            f"cast({m} - {r} as decimal(38,0))" for r in range(k)
        )
        return f"({terms})"

    gcols = []
    for r in range(4):
        k = r + 1
        up = pfall("(__b + __t)", k)
        lo = pfall("__b", k)
        gcols.append(
            f"cast(__c as decimal(38,0)) * ({up} - {lo}) AS g{r}"
        )
    rows = rows.selectExpr("__c", "__t", *gcols)
    mom = rows.agg(
        F.sum("__t").cast("long").alias("n"),
        *[
            F.sum(f"g{r}").cast("decimal(38,0)").alias(f"G{r}")
            for r in range(4)
        ],
    )
    nd = F.col("n").cast("double")
    # C(n-1, r) as doubles from exact longs (n-1 choose r, r<=3)
    c1 = (F.col("n") - 1).cast("double")
    c2 = ((F.col("n") - 1) * (F.col("n") - 2) / F.lit(2)).cast("double")
    c3 = (
        (F.col("n") - 1) * (F.col("n") - 2) * (F.col("n") - 3)
        / F.lit(6)
    ).cast("double")
    fact = [1.0, 2.0, 6.0, 24.0]
    b = [
        F.col("G0").cast("double") / (F.lit(fact[0]) * nd),
        F.col("G1").cast("double") / (F.lit(fact[1]) * nd * c1),
        F.col("G2").cast("double") / (F.lit(fact[2]) * nd * c2),
        F.col("G3").cast("double") / (F.lit(fact[3]) * nd * c3),
    ]
    l1 = b[0]
    l2 = 2 * b[1] - b[0]
    l3 = 6 * b[2] - 6 * b[1] + b[0]
    l4 = 20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]
    return mom.select(
        "n",
        _r6(l1 / F.lit(100.0)).alias("l1_mean"),
        _r6(l2 / F.lit(100.0)).alias("l2_scale"),
        _r6(l2 / l1).alias("l_cv"),
        _r6(l3 / l2).alias("l_skew"),
        _r6(l4 / l2).alias("l_kurt"),
    )


def _lmom_sql() -> str:
    def pfall(m: str, k: int) -> str:
        terms = " * ".join(
            f"CAST({m} - {r} AS HUGEINT)" for r in range(k)
        )
        return f"({terms})"

    gcols = ", ".join(
        f"CAST(sum(CAST(c AS HUGEINT)"
        f" * ({pfall('(b + t)', r + 1)} - {pfall('b', r + 1)}))"
        f" AS HUGEINT) AS G{r}"
        for r in range(4)
    )
    return f"""
WITH ev AS (
  SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), h AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM ev GROUP BY c
), rk AS (
  SELECT c, t,
    CAST(coalesce(sum(t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM h
), mom AS (
  SELECT CAST(sum(t) AS BIGINT) AS n, {gcols} FROM rk
), f AS (
  SELECT n,
    CAST(G0 AS DOUBLE) / (1.0 * CAST(n AS DOUBLE)) AS b0,
    CAST(G1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)
      * CAST(n - 1 AS DOUBLE)) AS b1,
    CAST(G2 AS DOUBLE) / (6.0 * CAST(n AS DOUBLE)
      * CAST((n - 1) * (n - 2) // 2 AS DOUBLE)) AS b2,
    CAST(G3 AS DOUBLE) / (24.0 * CAST(n AS DOUBLE)
      * CAST((n - 1) * (n - 2) * (n - 3) // 6 AS DOUBLE)) AS b3
  FROM mom
), l AS (
  SELECT n, b0 AS l1, 2 * b1 - b0 AS l2,
    6 * b2 - 6 * b1 + b0 AS l3,
    20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4
  FROM f
)
SELECT n,
  round(l1 / 100.0, 6) AS l1_mean,
  round(l2 / 100.0, 6) AS l2_scale,
  round(l2 / l1, 6) AS l_cv,
  round(l3 / l2, 6) AS l_skew,
  round(l4 / l2, 6) AS l_kurt
FROM l
"""


SQL_L_MOMENTS = _lmom_sql()

QUERIES["l_moments"] = q_l_moments
_RAW_ORACLES["l_moments"] = SQL_L_MOMENTS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_chao1_richness(spark, sf_dir):
    """Chao1 unseen-vocabulary richness estimate per source (Chao
    1984; bias-corrected form Chao 2005 — 'how many word types does
    this source REALLY have', the coverage question behind
    deduplication budgeting and crawl-more-or-stop decisions, with
    Good-Turing coverage C = 1 - F1/N riding along): chao1 = V +
    F1(F1-1)/(2(F2+1)) from the singleton/doubleton counts of the
    frequency-of-frequencies — the companion to yule_k (repeat rate)
    and the global good_turing table, answering richness rather than
    concentration. All inputs are exact longs from the (source,
    word) count aggregation; the estimate and coverage are fixed
    expression trees (single divisions). At 10^12 tokens the
    per-source frame is |sources| rows."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__w"),
    )
    cells = d.groupBy("source", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    mom = cells.groupBy("source").agg(
        F.sum("__cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("__cnt") == 1, 1).otherwise(0)).cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("__cnt") == 2, 1).otherwise(0)).cast("long")
        .alias("f2"),
    )
    chao = (
        F.col("vocab").cast("double")
        + (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (F.lit(2.0) * (F.col("f2") + 1).cast("double"))
    )
    cov = (
        F.lit(1.0)
        - F.col("f1").cast("double") / F.col("n_tokens").cast("double")
    )
    unseen = (
        (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (F.lit(2.0) * (F.col("f2") + 1).cast("double"))
    )
    return mom.select(
        "source", "n_tokens", "vocab", "f1", "f2",
        _r6(chao).alias("chao1"),
        _r6(unseen).alias("unseen_est"),
        _r6(cov).alias("coverage"),
    )


SQL_CHAO1_RICHNESS = """
WITH w AS (
  SELECT source,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), cells AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c
  FROM w GROUP BY source, word
), mom AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS vocab,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM cells GROUP BY source
)
SELECT source, n_tokens, vocab, f1, f2,
  round(CAST(vocab AS DOUBLE)
        + CAST(f1 * (f1 - 1) AS DOUBLE)
          / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao1,
  round(CAST(f1 * (f1 - 1) AS DOUBLE)
        / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS unseen_est,
  round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
    AS coverage
FROM mom
"""

QUERIES["chao1_richness"] = q_chao1_richness
_RAW_ORACLES["chao1_richness"] = SQL_CHAO1_RICHNESS
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_PACF_K = 5


def _pacf_steps():
    """Durbin-Levinson recursion unrolled to fixed column expressions
    over rho1..rho5 (identical text both engines): returns a list of
    (colname, expr) in dependency order, ending at pk1..pk5 = the
    partial autocorrelations phi_kk."""
    steps = [("pk1", "rho1"), ("p1_1", "rho1")]
    for k in range(2, _PACF_K + 1):
        num = f"rho{k} - (" + " + ".join(
            f"p{k - 1}_{j} * rho{k - j}" for j in range(1, k)
        ) + ")"
        den = "1.0 - (" + " + ".join(
            f"p{k - 1}_{j} * rho{j}" for j in range(1, k)
        ) + ")"
        steps.append((f"pk{k}", f"({num}) / ({den})"))
        for j in range(1, k):
            steps.append(
                (f"p{k}_{j}", f"p{k - 1}_{j} - pk{k} * p{k - 1}_{k - j}")
            )
        steps.append((f"p{k}_{k}", f"pk{k}"))
    return steps


def q_pacf_durbin(spark, sf_dir):
    """Partial autocorrelations of the daily event-volume series at
    lags 1..5 via the Durbin-Levinson recursion (Durbin 1960;
    Levinson 1947; Box & Jenkins ch. 3 — THE AR-order identification
    tool: the PACF cuts off after lag p for an AR(p), so this is how
    you pick the lag depth for trailing features, where ljung_box
    only says 'some structure exists' and dickey_fuller only tests
    the unit root). Sample ACF comes from the ljung_box exact-integer
    machinery (z_t = n*y_t - S, each rho_k ONE division of exact
    longs); the recursion unrolls to a fixed chain of column
    expressions over those five doubles, generated ONCE and executed
    verbatim by both engines (selectExpr steps here, an identical CTE
    chain in DuckDB), so every division happens in the same order.
    The persisted 1-row frame fans out to the 5 output rows
    (cached-branch). The 1.96/sqrt(n) white-noise band rides along."""
    from mpds_spark.operators.util import scratch_persist

    K = _PACF_K
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("s"),
    ).selectExpr(
        "n",
        "transform(sequence(1, cast(n as int)),"
        " t -> n * element_at(__a, t).__y - s) AS zs",
    ).selectExpr(
        "n", "zs",
        "aggregate(zs, 0L, (acc, z) -> acc + z * z) AS den",
    )
    nums = [
        f"CASE WHEN n > {k} THEN"
        f" aggregate(sequence({k} + 1, cast(n as int)), 0L,"
        f" (acc, t) -> acc + element_at(zs, t) * element_at(zs, t - {k}))"
        f" ELSE 0L END AS num{k}"
        for k in range(1, K + 1)
    ]
    one = one.selectExpr("n", "den", *nums)
    rhos = [
        f"CASE WHEN n > {k} AND den > 0 THEN"
        f" CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" ELSE 0.0D END AS rho{k}"
        for k in range(1, K + 1)
    ]
    one = one.selectExpr("n", *rhos)
    for name, expr in _pacf_steps():
        one = one.selectExpr("*", f"({expr}) AS {name}")
    one = scratch_persist(one)
    outs = [
        one.selectExpr(
            f"CAST({k} AS BIGINT) AS lag",
            "n AS n_days",
            f"rho{k} AS __acf",
            f"pk{k} AS __pacf",
            f"abs(pk{k}) > 1.96 / sqrt(cast(n as double))"
            " AS outside_band",
        )
        for k in range(1, K + 1)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "lag", "n_days",
        _r6("__acf").alias("acf"),
        _r6("__pacf").alias("pacf"),
        "outside_band",
    )


def _pacf_sql() -> str:
    K = _PACF_K
    nums = ", ".join(
        f"CASE WHEN n > {k} THEN"
        f" list_reduce(list_transform(range({k} + 1, CAST(n + 1 AS"
        f" INTEGER)), t -> zs[t] * zs[t - {k}]), (a, b) -> a + b)"
        f" ELSE 0 END AS num{k}"
        for k in range(1, K + 1)
    )
    rhos = ", ".join(
        f"CASE WHEN n > {k} AND den > 0 THEN"
        f" CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" ELSE 0.0 END AS rho{k}"
        for k in range(1, K + 1)
    )
    ctes = [
        """day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
)""",
        """one AS (
  SELECT list(y ORDER BY x) AS ys, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s
  FROM day
)""",
        """z AS (
  SELECT n, list_transform(range(1, CAST(n + 1 AS INTEGER)),
    t -> n * ys[t] - s) AS zs
  FROM one
)""",
        """dd AS (
  SELECT n, zs,
    list_reduce(list_transform(zs, zz -> zz * zz), (a, b) -> a + b)
      AS den
  FROM z
)""",
        f"nn AS (SELECT n, den, {nums} FROM dd)",
        f"rr AS (SELECT n, {rhos} FROM nn)",
    ]
    prev = "rr"
    for i, (name, expr) in enumerate(_pacf_steps()):
        ctes.append(f"s{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})")
        prev = f"s{i}"
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, n AS n_days,"
        f" round(rho{k}, 6) AS acf,"
        f" round(pk{k}, 6) AS pacf,"
        f" abs(pk{k}) > 1.96 / sqrt(CAST(n AS DOUBLE)) AS outside_band"
        f" FROM {prev}"
        for k in range(1, K + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


SQL_PACF_DURBIN = _pacf_sql()

QUERIES["pacf_durbin"] = q_pacf_durbin
_RAW_ORACLES["pacf_durbin"] = SQL_PACF_DURBIN
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_ols_influence(spark, sf_dir):
    """Regression influence diagnostics for the daily-volume linear
    trend (Cook 1977; Belsley, Kuh & Welsch 1980 — leverage,
    internally studentized residuals, Cook's distance: WHICH days
    drive the fitted trend, the diagnostic companion to
    ransac_trend's robust fit and dickey_fuller's OLS machinery; a
    single outage or launch day with D > 4/n can flip a trend
    readout). y = daily count on x = day-of-month; beta/alpha/SSR
    from EXACT INTEGER moments (m Sxy - Sx Sy etc., single
    divisions), then per-day leverage h_t = 1/m + m(x_t - xbar)^2 /
    (m Sxx - Sx^2) [written as exact-integer ratios:
    (m x_t - Sx)^2 / (m (m Sxx - Sx^2))], residual e_t, studentized
    r_t = e_t / sqrt(s2 (1 - h_t)) and D_t = r_t^2 h_t /
    (2 (1 - h_t)) — every term a fixed expression of exact longs
    joined back by a broadcast 1-row moment fit (the registered
    BNLJ). At 10^12 events the diagnostic frame is <=31 rows."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    mom = day.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("__x").cast("long").alias("sx"),
        F.sum("__y").cast("long").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("sxx"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("sxy"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("syy"),
    )
    j = day.join(F.broadcast(mom))
    den = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    sxyc = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
    syyc = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    beta = sxyc.cast("double") / den.cast("double")
    alpha = (
        F.col("sy").cast("double") - beta * F.col("sx").cast("double")
    ) / F.col("m").cast("double")
    rss = (syyc.cast("double") - beta * sxyc.cast("double")) \
        / F.col("m").cast("double")
    s2 = rss / (F.col("m") - 2).cast("double")
    dev = (F.col("m") * F.col("__x") - F.col("sx"))
    h = (
        F.lit(1.0) / F.col("m").cast("double")
        + (dev * dev).cast("double")
        / (F.col("m").cast("double") * den.cast("double"))
    )
    e = F.col("__y").cast("double") - (alpha + beta
                                       * F.col("__x").cast("double"))
    ok = (F.col("m") > 2) & (den > 0)
    rstud = e / F.sqrt(s2 * (F.lit(1.0) - h))
    cook = (rstud * rstud) * h / (F.lit(2.0) * (F.lit(1.0) - h))
    infl = cook > F.lit(4.0) / F.col("m").cast("double")
    return j.select(
        F.col("__x").alias("day"),
        F.col("__y").alias("volume"),
        _r6(F.when(ok, h)).alias("leverage"),
        _r6(F.when(ok, e)).alias("residual"),
        _r6(F.when(ok, rstud)).alias("r_student"),
        _r6(F.when(ok, cook)).alias("cooks_d"),
        F.when(ok, infl).alias("influential"),
    )


SQL_OLS_INFLUENCE = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM day
), f AS (
  SELECT day.x, day.y, mom.m, mom.sx, mom.sy,
    m * sxx - sx * sx AS den,
    m * sxy - sx * sy AS sxyc,
    m * syy - sy * sy AS syyc
  FROM day CROSS JOIN mom
), g AS (
  SELECT x, y, m, sx, sy, den,
    CAST(sxyc AS DOUBLE) / CAST(den AS DOUBLE) AS beta,
    (CAST(syyc AS DOUBLE)
     - CAST(sxyc AS DOUBLE) / CAST(den AS DOUBLE)
       * CAST(sxyc AS DOUBLE)) / CAST(m AS DOUBLE) AS rss
  FROM f WHERE m > 2 AND den > 0
), h AS (
  SELECT x, y, m, den, beta,
    (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
      / CAST(m AS DOUBLE) AS alpha,
    rss / CAST(m - 2 AS DOUBLE) AS s2,
    1.0 / CAST(m AS DOUBLE)
      + CAST((m * x - sx) * (m * x - sx) AS DOUBLE)
        / (CAST(m AS DOUBLE) * CAST(den AS DOUBLE)) AS lev
  FROM g
), i AS (
  SELECT x, y, m, lev,
    CAST(y AS DOUBLE) - (alpha + beta * CAST(x AS DOUBLE)) AS e,
    s2
  FROM h
), k AS (
  SELECT x, y, m, lev, e,
    e / sqrt(s2 * (1.0 - lev)) AS rstud
  FROM i
)
SELECT x AS day, y AS volume,
  round(lev, 6) AS leverage,
  round(e, 6) AS residual,
  round(rstud, 6) AS r_student,
  round((rstud * rstud) * lev / (2.0 * (1.0 - lev)), 6) AS cooks_d,
  (rstud * rstud) * lev / (2.0 * (1.0 - lev))
    > 4.0 / CAST(m AS DOUBLE) AS influential
FROM k
"""

QUERIES["ols_influence"] = q_ols_influence
_RAW_ORACLES["ols_influence"] = SQL_OLS_INFLUENCE
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_WI_Z = 1.96


def q_wilson_intervals(spark, sf_dir):
    """Wilson score 95% intervals for each event type's share of
    total events (Wilson JASA 1927; Brown, Cai & DasGupta 2001 —
    the proportion CI that actually holds its coverage at small n
    and extreme p, where the naive Wald interval collapses; what a
    metrics layer should print next to every rate). Counts are exact
    longs from ONE aggregate; the interval
    (p + z^2/2n +- z sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n) is a
    fixed expression tree per type with the z = 1.96 literal pinned,
    and the Wald interval rides along to show the difference. At
    10^12 events the interval frame is |types| rows."""
    ev = _events(spark, sf_dir).select("event_type")
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = cells.select(
        "event_type", "k",
        F.sum("k").over(wt).cast("long").alias("n"),
    )
    z = F.lit(_WI_Z)
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    p = kd / nd
    z2n = z * z / nd
    center = (p + z2n / F.lit(2.0)) / (F.lit(1.0) + z2n)
    half = (
        z
        * F.sqrt(
            p * (F.lit(1.0) - p) / nd
            + z * z / (F.lit(4.0) * nd * nd)
        )
        / (F.lit(1.0) + z2n)
    )
    wald = z * F.sqrt(p * (F.lit(1.0) - p) / nd)
    return t.select(
        "event_type", "k", "n",
        _r6(p).alias("share"),
        _r6(center - half).alias("wilson_lo"),
        _r6(center + half).alias("wilson_hi"),
        _r6(p - wald).alias("wald_lo"),
        _r6(p + wald).alias("wald_hi"),
    )


SQL_WILSON_INTERVALS = f"""
WITH cells AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY event_type
), t AS (
  SELECT event_type, k, CAST(sum(k) OVER () AS BIGINT) AS n FROM cells
), f AS (
  SELECT event_type, k, n,
    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
    {_WI_Z!r} * {_WI_Z!r} / CAST(n AS DOUBLE) AS z2n
  FROM t
), g AS (
  SELECT event_type, k, n, p,
    (p + z2n / 2.0) / (1.0 + z2n) AS center,
    {_WI_Z!r} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
      + {_WI_Z!r} * {_WI_Z!r}
        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      / (1.0 + z2n) AS half,
    {_WI_Z!r} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)) AS wald
  FROM f
)
SELECT event_type, k, n,
  round(p, 6) AS share,
  round(center - half, 6) AS wilson_lo,
  round(center + half, 6) AS wilson_hi,
  round(p - wald, 6) AS wald_lo,
  round(p + wald, 6) AS wald_hi
FROM g
"""

QUERIES["wilson_intervals"] = q_wilson_intervals
_RAW_ORACLES["wilson_intervals"] = SQL_WILSON_INTERVALS


_MDE_Z_ALPHA = 1.96   # two-sided 5%
_MDE_Z_BETA = 0.8416  # 80% power


def q_mde_power(spark, sf_dir):
    """Minimum detectable effect of the md5-parity A/B design for
    each event type's per-user conversion rate (the classic
    two-proportion power formula, e.g. Cohen 1988 / every experiment
    sizing sheet: MDE_abs = (z_{a/2} + z_beta) sqrt(2 p(1-p) / n)
    at 80% power, 5% two-sided — the 'how small a lift could this
    split even see' readout that belongs NEXT TO srm_check before
    anyone celebrates a flat metric). Baseline p = share of users
    with >= 1 event of the type, n = the smaller arm's user count
    (conservative), z literals pinned; exact longs from one
    user-level aggregate + one global aggregate. At 10^12 events the
    sizing frame is |types| rows."""
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    peru = ev.groupBy("user_id").agg(*[
        F.max(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("long").alias(f"c{i}")
        for i, t in enumerate(_BT_TYPES)
    ]).select(
        "*",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("lr|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    from mpds_spark.operators.util import scratch_persist

    one = scratch_persist(peru.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("__arm")).cast("long").alias("n_arm1"),
        *[
            F.sum(f"c{i}").cast("long").alias(f"k{i}")
            for i in range(len(_BT_TYPES))
        ],
    ))
    za, zb = F.lit(_MDE_Z_ALPHA), F.lit(_MDE_Z_BETA)
    outs = []
    for i, t in enumerate(_BT_TYPES):
        nd = F.col("n_users").cast("double")
        n1 = F.col("n_arm1").cast("double")
        n0 = nd - n1
        narm = F.least(n0, n1)
        p = F.col(f"k{i}").cast("double") / nd
        mde = (za + zb) * F.sqrt(
            F.lit(2.0) * p * (F.lit(1.0) - p) / narm
        )
        outs.append(
            one.select(
                F.lit(t).alias("event_type"),
                F.col("n_users"),
                narm.cast("long").alias("n_smaller_arm"),
                _r6(p).alias("baseline_rate"),
                _r6(mde).alias("mde_abs"),
                _r6(
                    F.when(p > 0, mde / p)
                ).alias("mde_rel"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def _mde_sql() -> str:
    cases = ", ".join(
        f"CAST(sum(c{i}) AS BIGINT) AS k{i}"
        for i in range(len(_BT_TYPES))
    )
    percase = ", ".join(
        f"CAST(max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, t in enumerate(_BT_TYPES)
    )
    zsum = f"({_MDE_Z_ALPHA!r} + {_MDE_Z_BETA!r})"
    finals = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, n_users,"
        " CAST(least(CAST(n_users - n_arm1 AS DOUBLE),"
        " CAST(n_arm1 AS DOUBLE)) AS BIGINT) AS n_smaller_arm,"
        f" round(CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE), 6)"
        " AS baseline_rate,"
        f" round({zsum} * sqrt(2.0"
        f" * (CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE))"
        f" * (1.0 - CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE))"
        " / least(CAST(n_users - n_arm1 AS DOUBLE),"
        " CAST(n_arm1 AS DOUBLE))), 6) AS mde_abs,"
        f" round(CASE WHEN k{i} > 0 THEN"
        f" {zsum} * sqrt(2.0"
        f" * (CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE))"
        f" * (1.0 - CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE))"
        " / least(CAST(n_users - n_arm1 AS DOUBLE),"
        " CAST(n_arm1 AS DOUBLE)))"
        f" / (CAST(k{i} AS DOUBLE) / CAST(n_users AS DOUBLE))"
        " END, 6) AS mde_rel FROM one"
        for i, t in enumerate(_BT_TYPES)
    )
    return f"""
WITH peru AS (
  SELECT user_id, {percase},
    CAST(('0x' || substring(md5('lr|' || CAST(user_id AS VARCHAR)),
      1, 15))::UBIGINT % 2 AS BIGINT) AS arm
  FROM events GROUP BY user_id
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(arm) AS BIGINT) AS n_arm1, {cases}
  FROM peru
)
{finals}
"""


SQL_MDE_POWER = _mde_sql()

QUERIES["mde_power"] = q_mde_power
_RAW_ORACLES["mde_power"] = SQL_MDE_POWER
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_nb_dispersion(spark, sf_dir):
    """Poisson overdispersion test + negative-binomial moment fit for
    per-user event counts (Boehning 1994's O statistic — the
    asymptotically-normal score test of H0: Poisson; Cameron &
    Trivedi 1990 family — the 'is a Poisson rate feature enough, or
    do we need the NB dispersion parameter' gate every count-feature
    pipeline should run before modeling): with exact integer moments
    n, S = sum y, Q = sum y^2 over the per-user counts, the sample
    mean/variance, the dispersion index v/m, the MoM NB size
    r = m^2/(v - m) and p = m/v, and O = (n S2/m - n)/sqrt(2(n-1))
    are all fixed expression trees (v written as the exact-integer
    ratio (nQ - S^2)/(n(n-1)) so both engines divide identical
    longs). Overdispersed at the one-sided 5% point 1.645. ONE
    user agg + ONE global agg; the test frame is 1 row at 10^12
    events."""
    ev = _events(spark, sf_dir).select("user_id")
    peru = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    mom = peru.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("__y").cast("long").alias("s"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("q"),
    )
    nd = F.col("n_users").cast("double")
    m = F.col("s").cast("double") / nd
    vnum = (
        F.col("n_users") * F.col("q") - F.col("s") * F.col("s")
    ).cast("double")
    vden = (
        F.col("n_users") * (F.col("n_users") - 1)
    ).cast("double")
    v = vnum / vden
    disp = v / m
    r = F.when(v > m, m * m / (v - m))
    p = F.when(v > 0, m / v)
    o = (nd * v / m - nd) / F.sqrt(
        F.lit(2.0) * (nd - F.lit(1.0))
    )
    return mom.select(
        "n_users",
        _r6(m).alias("mean_count"),
        _r6(v).alias("var_count"),
        _r6(disp).alias("dispersion_index"),
        _r6(r).alias("nb_size_r"),
        _r6(p).alias("nb_prob_p"),
        _r6(o).alias("boehning_o"),
        (o > F.lit(1.645)).alias("overdispersed"),
    )


SQL_NB_DISPERSION = """
WITH peru AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY user_id
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s,
    CAST(sum(y * y) AS BIGINT) AS q
  FROM peru
), f AS (
  SELECT n,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
    CAST(n * q - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS v
  FROM mom
), g AS (
  SELECT n, m, v, v / m AS disp,
    CASE WHEN v > m THEN m * m / (v - m) END AS r,
    CASE WHEN v > 0 THEN m / v END AS p,
    (CAST(n AS DOUBLE) * v / m - CAST(n AS DOUBLE))
      / sqrt(2.0 * (CAST(n AS DOUBLE) - 1.0)) AS o
  FROM f
)
SELECT n AS n_users,
  round(m, 6) AS mean_count,
  round(v, 6) AS var_count,
  round(disp, 6) AS dispersion_index,
  round(r, 6) AS nb_size_r,
  round(p, 6) AS nb_prob_p,
  round(o, 6) AS boehning_o,
  o > 1.645 AS overdispersed
FROM g
"""

QUERIES["nb_dispersion"] = q_nb_dispersion
_RAW_ORACLES["nb_dispersion"] = SQL_NB_DISPERSION
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_MS_R = 20


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the per-user event-type transition
    chain by unrolled power iteration (Kemeny & Snell 1960 ch. 4 —
    pi = pi P; 20 left-multiplications from the uniform start, the
    convergence horizon a 5-state ergodic chain needs), audited
    against the EMPIRICAL type distribution with the total-variation
    distance: if the process were stationary the two match, so a
    large TV flags cohort drift inside the month — the missing third
    of the catalog's Markov family (transition_entropy = how
    predictable, markov_accuracy = how well a 1-step predictor does,
    THIS = where the chain settles). Transition counts are exact
    longs from ONE lag pass sharing the entity-keyed exchange (the
    transition_entropy shape); row-normalized probabilities are
    exact-integer ratios; the 100 update expressions are generated
    ONCE and executed verbatim by both engines (selectExpr chain /
    CTE chain, the bradley_terry convention). The persisted 1-row
    frame fans out to the 5 output rows (cached-branch)."""
    from mpds_spark.operators.util import scratch_persist

    K = _BT_K
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type",
        F.col("ts").cast("timestamp").cast("double").alias("__t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("__prev"),
        F.col("event_type").alias("__cur"),
    ).filter(F.col("__prev").isNotNull())
    one = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_trans"),
        *[
            F.sum(
                F.when(
                    (F.col("__prev") == a) & (F.col("__cur") == b), 1
                ).otherwise(0)
            ).cast("long").alias(f"c{i}{j}")
            for i, a in enumerate(_BT_TYPES)
            for j, b in enumerate(_BT_TYPES)
        ],
        *[
            F.sum(
                F.when(F.col("__cur") == b, 1).otherwise(0)
            ).cast("long").alias(f"e{j}")
            for j, b in enumerate(_BT_TYPES)
        ],
    )
    rows_ = [
        f"(c{i}0 + c{i}1 + c{i}2 + c{i}3 + c{i}4) AS r{i}"
        for i in range(K)
    ]
    one = one.selectExpr("*", *rows_)
    ps = [
        f"CASE WHEN r{i} > 0 THEN cast(c{i}{j} as double)"
        f" / cast(r{i} as double) ELSE {1.0 / K!r} END AS p{i}{j}"
        for i in range(K) for j in range(K)
    ]
    one = one.selectExpr("*", *ps)
    one = one.selectExpr(
        "*", *[f"{1.0 / K!r} AS pi0_{j}" for j in range(K)]
    )
    # the 100 scalar updates chunked into per-round projections
    for r in range(_MS_R):
        exprs = [
            "({}) AS pi{}_{}".format(
                " + ".join(f"pi{r}_{i} * p{i}{j}" for i in range(K)),
                r + 1, j,
            )
            for j in range(K)
        ]
        one = one.selectExpr("*", *exprs)
    conv = " + ".join(
        f"abs(pi{_MS_R}_{j} - pi{_MS_R - 1}_{j})" for j in range(K)
    )
    tv = " + ".join(
        f"abs(pi{_MS_R}_{j} - cast(e{j} as double)"
        f" / cast(n_trans as double))"
        for j in range(K)
    )
    one = scratch_persist(one.selectExpr(
        "n_trans",
        *[f"pi{_MS_R}_{j}" for j in range(K)],
        *[f"cast(e{j} as double) / cast(n_trans as double)"
          f" AS emp{j}" for j in range(K)],
        f"0.5 * ({tv}) AS tv_dist",
        f"({conv}) < 1e-9 AS converged",
    ))
    outs = [
        one.selectExpr(
            f"'{t}' AS event_type",
            "n_trans",
            f"pi{_MS_R}_{j} AS __pi",
            f"emp{j} AS __emp",
            "tv_dist", "converged",
        )
        for j, t in enumerate(_BT_TYPES)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "event_type", "n_trans",
        _r6("__pi").alias("stationary_pi"),
        _r6("__emp").alias("empirical_share"),
        _r6("tv_dist").alias("tv_dist"),
        "converged",
    )


def _ms_sql() -> str:
    K = _BT_K
    cells = ", ".join(
        f"CAST(sum(CASE WHEN prev = '{a}' AND cur = '{b}'"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS c{i}{j}"
        for i, a in enumerate(_BT_TYPES)
        for j, b in enumerate(_BT_TYPES)
    )
    emps = ", ".join(
        f"CAST(sum(CASE WHEN cur = '{b}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS e{j}"
        for j, b in enumerate(_BT_TYPES)
    )
    rows_ = ", ".join(
        f"(c{i}0 + c{i}1 + c{i}2 + c{i}3 + c{i}4) AS r{i}"
        for i in range(K)
    )
    ps = ", ".join(
        f"CASE WHEN r{i} > 0 THEN CAST(c{i}{j} AS DOUBLE)"
        f" / CAST(r{i} AS DOUBLE) ELSE {1.0 / K!r} END AS p{i}{j}"
        for i in range(K) for j in range(K)
    )
    pis = ", ".join(f"{1.0 / K!r} AS pi0_{j}" for j in range(K))
    ctes = [
        """pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch(ts), event_id) AS prev,
    event_type AS cur
  FROM events
)""",
        f"""one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_trans, {cells}, {emps}
  FROM pairs WHERE prev IS NOT NULL
)""",
        f"rr AS (SELECT *, {rows_} FROM one)",
        f"pp AS (SELECT *, {ps} FROM rr)",
        f"i0 AS (SELECT *, {pis} FROM pp)",
    ]
    prev = "i0"
    for r in range(_MS_R):
        exprs = ", ".join(
            "({}) AS pi{}_{}".format(
                " + ".join(f"pi{r}_{i} * p{i}{j}" for i in range(K)),
                r + 1, j,
            )
            for j in range(K)
        )
        ctes.append(f"i{r + 1} AS (SELECT *, {exprs} FROM {prev})")
        prev = f"i{r + 1}"
    conv = " + ".join(
        f"abs(pi{_MS_R}_{j} - pi{_MS_R - 1}_{j})" for j in range(K)
    )
    tv = " + ".join(
        f"abs(pi{_MS_R}_{j} - CAST(e{j} AS DOUBLE)"
        f" / CAST(n_trans AS DOUBLE))"
        for j in range(K)
    )
    ctes.append(
        f"fin AS (SELECT n_trans,"
        + ", ".join(f"pi{_MS_R}_{j}" for j in range(K)) + ", "
        + ", ".join(
            f"CAST(e{j} AS DOUBLE) / CAST(n_trans AS DOUBLE) AS emp{j}"
            for j in range(K)
        )
        + f", 0.5 * ({tv}) AS tv_dist, ({conv}) < 1e-9 AS converged"
        f" FROM {prev})"
    )
    finals = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, n_trans,"
        f" round(pi{_MS_R}_{j}, 6) AS stationary_pi,"
        f" round(emp{j}, 6) AS empirical_share,"
        " round(tv_dist, 6) AS tv_dist, converged FROM fin"
        for j, t in enumerate(_BT_TYPES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


SQL_MARKOV_STATIONARY = _ms_sql()

QUERIES["markov_stationary"] = q_markov_stationary
_RAW_ORACLES["markov_stationary"] = SQL_MARKOV_STATIONARY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_JL_K = 16
_JL_D = 64


def _jl_signs():
    """Pinned +-1 projection matrix (Achlioptas 2003 sign variant),
    derived from md5 in PYTHON at build time and embedded as literals
    in both engines — the matrix IS part of the query definition."""
    import hashlib

    return [
        [
            1 if int(
                hashlib.md5(f"jl|{k}|{d}".encode()).hexdigest()[-1], 16
            ) % 2 == 0 else -1
            for d in range(_JL_D)
        ]
        for k in range(_JL_K)
    ]


def q_jl_projection_audit(spark, sf_dir):
    """Johnson-Lindenstrauss random-projection distortion audit
    (Johnson & Lindenstrauss 1984; Achlioptas JCSS 2003 — the +-1
    sign projection whose E||Rx||^2 = k||x||^2 makes y = Rx / sqrt(k)
    an unbiased distance sketch; THE cheap dimension squeeze before
    ANN/clustering at 10^12 vectors, and this query answers 'how
    much pairwise-distance distortion did 64 -> 16 actually cost ON
    THIS corpus'): the pinned sign matrix is generated from md5 in
    python ONCE and embedded as literals in both engines, so the
    projections y_k = sum_d r_kd q_d of the milli-quantized codes
    are EXACT LONGS; pairs are the deterministic md5-rank
    half-pairing (row i with row i + n/2 — layout-independent), and
    both the true distance d2 and the sketch distance dy2 are exact
    integers, so the distortion |1 - dy2/(k d2)| is one exact-ratio
    division per pair. Outputs exact distortion-bin COUNTS plus the
    max (order-free aggregates — no float folds anywhere). At 10^12
    rows the audit runs on the same half-pairing sample shape."""
    signs = _jl_signs()
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (
                F.signum(x.cast("double"))
                * F.floor(F.abs(x.cast("double")) * 1000 + F.lit(0.5))
            ).cast("long"),
        ).alias("q"),
    )
    ycols = [
        sum(
            (F.element_at("q", d + 1) * F.lit(signs[k][d]))
            for d in range(_JL_D)
        ).cast("long").alias(f"y{k}")
        for k in range(_JL_K)
    ]
    proj = emb.select("vec_id", "q", *ycols)
    w = Window.orderBy(
        F.md5(F.concat(F.lit("jlp|"), F.col("vec_id").cast("string")))
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = proj.select(
        "*",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wt).cast("long").alias("__n"),
    )
    half = (F.col("__n") / 2).cast("long")
    left = ranked.filter(F.col("__r") <= half).select(
        F.col("__r").alias("__k"),
        F.col("q").alias("qa"),
        *[F.col(f"y{k}").alias(f"ya{k}") for k in range(_JL_K)],
    )
    right = ranked.filter(F.col("__r") > half).select(
        (F.col("__r") - half).alias("__k"),
        F.col("q").alias("qb"),
        *[F.col(f"y{k}").alias(f"yb{k}") for k in range(_JL_K)],
    )
    pairs = left.join(right, "__k")
    d2 = F.expr(
        "aggregate(zip_with(qa, qb, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, v) -> acc + v)"
    )
    dy2 = sum(
        (F.col(f"ya{k}") - F.col(f"yb{k}"))
        * (F.col(f"ya{k}") - F.col(f"yb{k}"))
        for k in range(_JL_K)
    ).cast("long")
    pr = pairs.select(
        d2.alias("__d2"), dy2.alias("__dy2")
    ).filter(F.col("__d2") > 0)
    dist = F.abs(
        F.lit(1.0)
        - F.col("__dy2").cast("double")
        / (F.lit(float(_JL_K)) * F.col("__d2").cast("double"))
    )
    return pr.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        _r6(F.max(dist)).alias("max_distortion"),
        F.sum(F.when(dist <= 0.1, 1).otherwise(0)).cast("long")
        .alias("within_10pct"),
        F.sum(F.when(dist <= 0.25, 1).otherwise(0)).cast("long")
        .alias("within_25pct"),
        F.sum(F.when(dist <= 0.5, 1).otherwise(0)).cast("long")
        .alias("within_50pct"),
    )


def _jl_sql() -> str:
    signs = _jl_signs()
    ycols = ", ".join(
        "("
        + " + ".join(
            f"q[{d + 1}] * ({signs[k][d]})" for d in range(_JL_D)
        )
        + f") AS y{k}"
        for k in range(_JL_K)
    )
    dy2 = " + ".join(
        f"(l.y{k} - r.y{k}) * (l.y{k} - r.y{k})"
        for k in range(_JL_K)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x ->
    CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)
         * sign(CAST(x AS DOUBLE)) AS BIGINT)) AS q
  FROM embeddings
), proj AS (
  SELECT vec_id, q, {ycols} FROM emb
), ranked AS (
  SELECT *,
    row_number() OVER (ORDER BY md5('jlp|' || CAST(vec_id AS VARCHAR)))
      AS r,
    CAST(count(*) OVER () AS BIGINT) AS n
  FROM proj
), pairs AS (
  SELECT l.q AS qa, r.q AS qb,
    CAST({dy2} AS BIGINT) AS dy2
  FROM ranked l JOIN ranked r
    ON r.r = l.r + CAST(l.n // 2 AS BIGINT)
  WHERE l.r <= l.n // 2
), pd AS (
  SELECT dy2,
    CAST(list_reduce(list_transform(range(1, {_JL_D + 1}),
      d -> (qa[d] - qb[d]) * (qa[d] - qb[d])), (a, b) -> a + b)
      AS BIGINT) AS d2
  FROM pairs
), f AS (
  SELECT
    abs(1.0 - CAST(dy2 AS DOUBLE)
        / ({float(_JL_K)!r} * CAST(d2 AS DOUBLE))) AS dist
  FROM pd WHERE d2 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  round(max(dist), 6) AS max_distortion,
  CAST(sum(CASE WHEN dist <= 0.1 THEN 1 ELSE 0 END) AS BIGINT)
    AS within_10pct,
  CAST(sum(CASE WHEN dist <= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
    AS within_25pct,
  CAST(sum(CASE WHEN dist <= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
    AS within_50pct
FROM f
"""


SQL_JL_PROJECTION_AUDIT = _jl_sql()

QUERIES["jl_projection_audit"] = q_jl_projection_audit
_RAW_ORACLES["jl_projection_audit"] = SQL_JL_PROJECTION_AUDIT
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_pr_curve_ap(spark, sf_dir):
    """Average precision + best-F1 operating point for n_chars as a
    scorer of the >=20-words quality label (the precision-recall
    summary sklearn's average_precision_score computes, with the
    step-wise AP = sum_k (R_k - R_{k-1}) P_k convention — the eval
    primitive beside rank_auc (threshold-free ranking quality) and
    calibration_bins (probability quality): AP answers 'how good is
    the ranking where it matters, at the top', and the best-F1 row
    answers 'where should the production threshold sit'). The corpus
    collapses ONCE to the distinct-length class histogram; suffix
    sums over the value-DESCENDING window make every threshold
    'x >= v' a row with exact TP/FP longs; AP folds the exact-ratio
    step terms (p_v/P) * precision_v in descending-threshold order
    over the collected array (both engines, identical order); the
    best-F1 argmax is one TakeOrdered over (-F1-as-ratio, v) — F1
    compared via the cross-multiplied EXACT INTEGER ratio 2TP /
    (2TP + FP + FN) so the tie-break is exact, never a global
    sort."""
    d = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("__v"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 20,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    hist = d.groupBy("__v").agg(
        F.sum("__y").cast("long").alias("__p"),
        F.sum(1 - F.col("__y")).cast("long").alias("__q"),
    )
    wdesc = Window.orderBy(F.desc("__v"))
    wc = wdesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = wdesc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = hist.select(
        "__v", "__p",
        F.sum("__p").over(wc).cast("long").alias("__tp"),
        F.sum("__q").over(wc).cast("long").alias("__fp"),
        F.sum("__p").over(wt).cast("long").alias("__post"),
        F.sum("__q").over(wt).cast("long").alias("__negt"),
    )
    # AP: fold (p_v / P) * (tp / (tp + fp)) in v-DESC order
    ap_frame = cand.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("__v")).alias("__nv"),
                    "__p", "__tp", "__fp",
                )
            )
        ).alias("__a"),
        F.max("__post").alias("__post"),
        F.max("__negt").alias("__negt"),
    ).selectExpr(
        "__post", "__negt",
        "aggregate(__a, 0.0D, (acc, x) -> acc +"
        " (cast(x.__p as double) / cast(__post as double))"
        " * (cast(x.__tp as double)"
        "    / cast(x.__tp + x.__fp as double))) AS __ap",
    )
    # best F1 by exact-integer cross-comparison via TakeOrdered on
    # the double ratio (exact-ratio doubles; smaller-v tie-break)
    f1 = (
        (F.lit(2) * F.col("__tp")).cast("double")
        / (F.lit(2) * F.col("__tp") + F.col("__fp")
           + (F.col("__post") - F.col("__tp"))).cast("double")
    )
    best = cand.select(
        "__v", "__tp", "__fp", "__post",
        f1.alias("__f1"),
    ).orderBy(F.desc("__f1"), "__v").limit(1)
    out = best.join(F.broadcast(ap_frame.select("__ap", "__negt")))
    return out.select(
        (F.col("__post") + F.col("__negt")).alias("n_docs"),
        F.col("__post").alias("n_pos"),
        _r6("__ap").alias("average_precision"),
        F.col("__v").alias("best_f1_threshold"),
        _r6("__f1").alias("best_f1"),
        _r6(
            F.col("__tp").cast("double")
            / (F.col("__tp") + F.col("__fp")).cast("double")
        ).alias("precision_at_best"),
        _r6(
            F.col("__tp").cast("double") / F.col("__post").cast("double")
        ).alias("recall_at_best"),
    )


SQL_PR_CURVE_AP = """
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 20
         THEN 1 ELSE 0 END AS y
  FROM documents
), hist AS (
  SELECT v, CAST(sum(y) AS BIGINT) AS p,
    CAST(sum(1 - y) AS BIGINT) AS q
  FROM d GROUP BY v
), cand AS (
  SELECT v, p,
    CAST(sum(p) OVER wc AS BIGINT) AS tp,
    CAST(sum(q) OVER wc AS BIGINT) AS fp,
    CAST(sum(p) OVER () AS BIGINT) AS post,
    CAST(sum(q) OVER () AS BIGINT) AS negt
  FROM hist
  WINDOW wc AS (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
), apf AS (
  SELECT max(post) AS post, max(negt) AS negt,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list((CAST(p AS DOUBLE) / CAST(post AS DOUBLE))
           * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
           ORDER BY v DESC)),
      (acc, x) -> acc + x) AS ap
  FROM cand
), best AS (
  SELECT v, tp, fp, post,
    CAST(2 * tp AS DOUBLE)
      / CAST(2 * tp + fp + (post - tp) AS DOUBLE) AS f1
  FROM cand
  ORDER BY f1 DESC, v LIMIT 1
)
SELECT best.post + apf.negt AS n_docs, best.post AS n_pos,
  round(apf.ap, 6) AS average_precision,
  best.v AS best_f1_threshold,
  round(best.f1, 6) AS best_f1,
  round(CAST(best.tp AS DOUBLE) / CAST(best.tp + best.fp AS DOUBLE), 6)
    AS precision_at_best,
  round(CAST(best.tp AS DOUBLE) / CAST(best.post AS DOUBLE), 6)
    AS recall_at_best
FROM best CROSS JOIN apf
"""

QUERIES["pr_curve_ap"] = q_pr_curve_ap
_RAW_ORACLES["pr_curve_ap"] = SQL_PR_CURVE_AP
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_seasonal_strength(spark, sf_dir):
    """Weekly seasonality strength of daily event volume as the
    day-of-week eta-squared (the one-way ANOVA R^2 = SSB/SST over
    dow groups — the variance-decomposition reading of what
    dft_periodogram shows as power at k ~ n/7 and friedman_test
    shows as rank consistency: 'WHAT SHARE of day-to-day volume
    variation is the weekly cycle', Hyndman & Athanasopoulos FPP3
    seasonal-strength analog with the flat-trend simplification
    appropriate to a one-month window). EXACT INTEGERS throughout:
    with day counts y, dow group sums S_g and sizes n_g, SST*n and
    SSB*n are integer combinations (n sum y^2 - S^2 and
    n sum_g S_g^2/n_g re-scaled by the lcm-free per-group single
    divisions), so eta2 is a ratio of two doubles each assembled
    from exact longs. Per-dow mean volume rides along (7 rows +
    strength replicated, cached-branch fan-out avoided — the dow
    frame IS the output). ONE day agg + ONE dow agg."""
    ev = _events(spark, sf_dir).select(
        F.to_date(F.col("ts").cast("timestamp")).alias("__d"),
        F.dayofweek(F.col("ts").cast("timestamp")).cast("long")
        .alias("__dow"),
    )
    day = ev.groupBy("__d", "__dow").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    bydow = day.groupBy("__dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__q"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = bydow.select(
        "*",
        F.sum("n_days").over(wt).cast("long").alias("__n"),
        F.sum("__s").over(wt).cast("long").alias("__st"),
        F.sum("__q").over(wt).cast("long").alias("__qt"),
        # SSB accumulations need S_g^2/n_g — fold in dow order as
        # exact-ratio doubles
        F.expr(
            "aggregate(array_sort(collect_list(struct(__dow, __s,"
            " n_days)) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " UNBOUNDED FOLLOWING)), 0.0D, (acc, x) ->"
            " acc + cast(x.__s as double) * cast(x.__s as double)"
            " / cast(x.n_days as double))"
        ).alias("__gs"),
    )
    nd = F.col("__n").cast("double")
    sst = F.col("__qt").cast("double") \
        - F.col("__st").cast("double") * F.col("__st").cast("double") \
        / nd
    ssb = F.col("__gs") - F.col("__st").cast("double") \
        * F.col("__st").cast("double") / nd
    eta2 = F.when(sst > 0, ssb / sst).otherwise(F.lit(0.0))
    return t.select(
        F.col("__dow").alias("dow"),
        "n_days",
        _r6(
            F.col("__s").cast("double") / F.col("n_days").cast("double")
        ).alias("mean_volume"),
        _r6(ssb).alias("ssb"),
        _r6(sst).alias("sst"),
        _r6(eta2).alias("seasonal_strength"),
    )


SQL_SEASONAL_STRENGTH = """
WITH day AS (
  SELECT CAST(ts AS DATE) AS d,
    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
    CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), bydow AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(y) AS BIGINT) AS s,
    CAST(sum(y * y) AS BIGINT) AS q
  FROM day GROUP BY dow
), gsf AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
           / CAST(n_days AS DOUBLE) ORDER BY dow)),
      (acc, x) -> acc + x) AS gs
  FROM bydow
), t AS (
  SELECT dow, n_days, s,
    CAST(sum(n_days) OVER () AS BIGINT) AS n,
    CAST(sum(s) OVER () AS BIGINT) AS st,
    CAST(sum(q) OVER () AS BIGINT) AS qt,
    gsf.gs AS gs
  FROM bydow CROSS JOIN gsf
), f AS (
  SELECT dow, n_days, s,
    CAST(qt AS DOUBLE)
      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        / CAST(n AS DOUBLE) AS sst,
    gs - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        / CAST(n AS DOUBLE) AS ssb
  FROM t
)
SELECT dow, n_days,
  round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_volume,
  round(ssb, 6) AS ssb,
  round(sst, 6) AS sst,
  round(CASE WHEN sst > 0 THEN ssb / sst ELSE 0.0 END, 6)
    AS seasonal_strength
FROM f
"""

QUERIES["seasonal_strength"] = q_seasonal_strength
_RAW_ORACLES["seasonal_strength"] = SQL_SEASONAL_STRENGTH
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


_CQ_RULES = [
    ("len120", "n_chars >= 120"),
    ("words20",
     "length(text) - length(replace(text, ' ', '')) + 1 >= 20"),
    ("len200", "n_chars >= 200"),
]


def q_cochran_q(spark, sf_dir):
    """Cochran's Q test of k=3 correlated binary quality rules
    (Cochran Biometrika 1950 — the k-rater generalization of
    mcnemar_test, which it reduces to at k=2: do the three
    deterministic document-quality rules pass the SAME share of
    docs, accounting for the within-doc correlation a naive 3-way
    chi-square ignores? The pre-check before treating any one rule
    as exchangeable with the others in a curation stack). With
    per-doc row sums R_i and per-rule column totals C_j:
    Q = k(k-1) sum_j (C_j - T/k)^2 / (k T - sum_i R_i^2), all EXACT
    LONGS from ONE corpus aggregate (sum R, sum R^2, and the three
    C_j come from the same pass; the numerator is assembled with
    the k-scaled integer identity sum_j (k C_j - T)^2 / k to avoid
    the fractional mean). Reject at the chi2(2) 95% point 5.991.
    The test frame is 1 row at 10^12 docs."""
    k = len(_CQ_RULES)
    d = load(spark, sf_dir, "documents").selectExpr(
        *[
            f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS BIGINT)"
            f" AS r_{name}"
            for name, cond in _CQ_RULES
        ]
    )
    rsum = " + ".join(f"r_{name}" for name, _ in _CQ_RULES)
    one = d.selectExpr(
        "*", f"({rsum}) AS __ri"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ri").cast("long").alias("t"),
        F.sum(F.expr("__ri * __ri")).cast("long").alias("r2"),
        *[
            F.sum(f"r_{name}").cast("long").alias(f"c_{name}")
            for name, _ in _CQ_RULES
        ],
    )
    # numerator: k(k-1) sum_j (C_j - T/k)^2 = (k-1)/k sum_j (kC_j-T)^2
    sq = " + ".join(
        f"(cast({k} * c_{name} - t as double))"
        f" * (cast({k} * c_{name} - t as double))"
        for name, _ in _CQ_RULES
    )
    qexpr = (
        f"CASE WHEN {k} * t - r2 > 0 THEN"
        f" (cast({k - 1} as double) / cast({k} as double))"
        f" * ({sq}) / cast({k} * t - r2 as double)"
        " ELSE 0.0D END"
    )
    one = one.selectExpr(
        "n_docs", "t AS n_passes",
        *[f"c_{name} AS pass_{name}" for name, _ in _CQ_RULES],
        f"({qexpr}) AS __q",
    )
    return one.select(
        "n_docs", "n_passes",
        *[f"pass_{name}" for name, _ in _CQ_RULES],
        _r6("__q").alias("cochran_q"),
        (F.col("__q") > F.lit(5.991)).alias("rules_differ"),
    )


def _cq_sql() -> str:
    k = len(_CQ_RULES)
    rs = ", ".join(
        f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS BIGINT)"
        f" AS r_{name}"
        for name, cond in _CQ_RULES
    )
    rsum = " + ".join(f"r_{name}" for name, _ in _CQ_RULES)
    cs = ", ".join(
        f"CAST(sum(r_{name}) AS BIGINT) AS c_{name}"
        for name, _ in _CQ_RULES
    )
    sq = " + ".join(
        f"(CAST({k} * c_{name} - t AS DOUBLE))"
        f" * (CAST({k} * c_{name} - t AS DOUBLE))"
        for name, _ in _CQ_RULES
    )
    passes = ", ".join(
        f"c_{name} AS pass_{name}" for name, _ in _CQ_RULES
    )
    return f"""
WITH d AS (
  SELECT {rs} FROM documents
), e AS (
  SELECT *, ({rsum}) AS ri FROM d
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(ri) AS BIGINT) AS t,
    CAST(sum(ri * ri) AS BIGINT) AS r2, {cs}
  FROM e
), f AS (
  SELECT n_docs, t AS n_passes, {passes},
    CASE WHEN {k} * t - r2 > 0 THEN
      (CAST({k - 1} AS DOUBLE) / CAST({k} AS DOUBLE))
      * ({sq}) / CAST({k} * t - r2 AS DOUBLE)
    ELSE 0.0 END AS q
  FROM one
)
SELECT n_docs, n_passes,
  {', '.join(f'pass_{name}' for name, _ in _CQ_RULES)},
  round(q, 6) AS cochran_q,
  q > 5.991 AS rules_differ
FROM f
"""


SQL_COCHRAN_Q = _cq_sql()

QUERIES["cochran_q"] = q_cochran_q
_RAW_ORACLES["cochran_q"] = SQL_COCHRAN_Q
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_capture_recapture(spark, sf_dir):
    """Chapman-corrected Lincoln-Petersen capture-recapture estimate
    of the active-user population from the month's two halves
    (Lincoln 1930; Petersen 1896; Chapman 1951 — the two-sample
    mark-recapture estimator N = (n1+1)(n2+1)/(m+1) - 1 with
    Seber 1970's variance; in a data platform this is the closed-
    population audit: if the estimate from two observation windows
    undershoots the true distinct count, user identity is CHURNING
    under you — cookies resetting, ids rotating — exactly what
    breaks retention features). Capture 1 = users seen on days
    1-15, capture 2 = days 16+, marks m = users in both; all exact
    longs from ONE user-level aggregate; estimate, variance and the
    relative error vs the TRUE distinct count (observable here, the
    audit's point) are fixed expression trees. 2 shuffles at any
    corpus size."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        (F.dayofmonth(F.col("ts").cast("timestamp")) <= 15)
        .alias("__h1"),
    )
    peru = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("__h1"), 1).otherwise(0)).alias("__in1"),
        F.max(F.when(~F.col("__h1"), 1).otherwise(0)).alias("__in2"),
    )
    one = peru.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("__in1").cast("long").alias("n1"),
        F.sum("__in2").cast("long").alias("n2"),
        F.sum(F.col("__in1") * F.col("__in2")).cast("long").alias("m"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m = F.col("m").cast("double")
    est = (n1 + 1) * (n2 + 1) / (m + 1) - F.lit(1.0)
    var = (
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) * (m + 1) * (m + 2))
    )
    return one.select(
        "n_true", "n1", "n2", "m",
        _r6(est).alias("chapman_estimate"),
        _r6(F.sqrt(var)).alias("se"),
        _r6(
            (est - F.col("n_true").cast("double"))
            / F.col("n_true").cast("double")
        ).alias("rel_err"),
    )


SQL_CAPTURE_RECAPTURE = """
WITH peru AS (
  SELECT user_id,
    max(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS in1,
    max(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS in2
  FROM events GROUP BY user_id
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
    CAST(sum(in1) AS BIGINT) AS n1,
    CAST(sum(in2) AS BIGINT) AS n2,
    CAST(sum(in1 * in2) AS BIGINT) AS m
  FROM peru
), f AS (
  SELECT n_true, n1, n2, m,
    (CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
      / (CAST(m AS DOUBLE) + 1) - 1.0 AS est,
    (CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
      * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
      * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
      / ((CAST(m AS DOUBLE) + 1) * (CAST(m AS DOUBLE) + 1)
         * (CAST(m AS DOUBLE) + 2)) AS var
  FROM one
)
SELECT n_true, n1, n2, m,
  round(est, 6) AS chapman_estimate,
  round(sqrt(var), 6) AS se,
  round((est - CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE), 6)
    AS rel_err
FROM f
"""

QUERIES["capture_recapture"] = q_capture_recapture
_RAW_ORACLES["capture_recapture"] = SQL_CAPTURE_RECAPTURE


def q_odds_ratio_ci(spark, sf_dir):
    """Weekend x purchase odds ratio with the Woolf 95% log-interval
    (Woolf Ann. Hum. Genet. 1955; Bland & Altman BMJ 2000 — THE 2x2
    effect-size-with-uncertainty: chi2_independence says the table
    isn't independent, woe_encoding gives the per-cell evidence
    weight, this says 'the purchase odds are X times higher on
    weekends, CI [lo, hi]' — the sentence an analyst actually
    ships). Cells a,b,c,d are exact longs from ONE aggregate;
    OR = ad/bc is one division of exact products, ln OR rides the
    catalog's ln precedent, se = sqrt(1/a+1/b+1/c+1/d), and the
    interval exponentiates the pinned +-1.96 band. Significant when
    the CI excludes 1. 1-row frame at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofweek(F.col("ts").cast("timestamp")).isin(1, 7)
        .alias("__wk"),
        (F.col("event_type") == "purchase").alias("__pur"),
    )
    one = ev.agg(
        F.sum(F.when(F.col("__wk") & F.col("__pur"), 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("__wk") & ~F.col("__pur"), 1).otherwise(0))
        .cast("long").alias("b"),
        F.sum(F.when(~F.col("__wk") & F.col("__pur"), 1).otherwise(0))
        .cast("long").alias("c"),
        F.sum(F.when(~F.col("__wk") & ~F.col("__pur"), 1).otherwise(0))
        .cast("long").alias("d"),
    )
    ok = (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) \
        & (F.col("d") > 0)
    orr = (F.col("a") * F.col("d")).cast("double") \
        / (F.col("b") * F.col("c")).cast("double")
    se = F.sqrt(
        F.lit(1.0) / F.col("a").cast("double")
        + F.lit(1.0) / F.col("b").cast("double")
        + F.lit(1.0) / F.col("c").cast("double")
        + F.lit(1.0) / F.col("d").cast("double")
    )
    lo = F.exp(F.log(orr) - F.lit(1.96) * se)
    hi = F.exp(F.log(orr) + F.lit(1.96) * se)
    return one.select(
        "a", "b", "c", "d",
        _r6(F.when(ok, orr)).alias("odds_ratio"),
        _r6(F.when(ok, F.log(orr))).alias("log_or"),
        _r6(F.when(ok, se)).alias("se_log_or"),
        _r6(F.when(ok, lo)).alias("or_lo95"),
        _r6(F.when(ok, hi)).alias("or_hi95"),
        F.when(ok, (lo > 1.0) | (hi < 1.0)).alias("significant"),
    )


SQL_ODDS_RATIO_CI = """
WITH ev AS (
  SELECT (dayofweek(ts) IN (0, 6)) AS wk,
    (event_type = 'purchase') AS pur
  FROM events
), one AS (
  SELECT
    CAST(sum(CASE WHEN wk AND pur THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN wk AND NOT pur THEN 1 ELSE 0 END) AS BIGINT)
      AS b,
    CAST(sum(CASE WHEN NOT wk AND pur THEN 1 ELSE 0 END) AS BIGINT)
      AS c,
    CAST(sum(CASE WHEN NOT wk AND NOT pur THEN 1 ELSE 0 END)
         AS BIGINT) AS d
  FROM ev
), f AS (
  SELECT a, b, c, d,
    CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) AS orr,
    sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
         + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)) AS se
  FROM one WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
)
SELECT a, b, c, d,
  round(orr, 6) AS odds_ratio,
  round(ln(orr), 6) AS log_or,
  round(se, 6) AS se_log_or,
  round(exp(ln(orr) - 1.96 * se), 6) AS or_lo95,
  round(exp(ln(orr) + 1.96 * se), 6) AS or_hi95,
  (exp(ln(orr) - 1.96 * se) > 1.0 OR exp(ln(orr) + 1.96 * se) < 1.0)
    AS significant
FROM f
"""

QUERIES["odds_ratio_ci"] = q_odds_ratio_ci
_RAW_ORACLES["odds_ratio_ci"] = SQL_ODDS_RATIO_CI
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_kpss_test(spark, sf_dir):
    """KPSS level-stationarity test of daily event volume
    (Kwiatkowski, Phillips, Schmidt & Shin J. Econometrics 1992 —
    the null-REVERSED complement to dickey_fuller: ADF's null is a
    unit root, KPSS's null is stationarity, and the 2x2 of their
    verdicts is the standard pre-check before trusting any
    rolling-mean feature or CI that assumes mean reversion).
    Daily counts are exact longs from ONE corpus aggregate; the
    demeaned residual numerators n*y_t - X and the partial-sum
    numerators n*cumY_t - t*X are exact longs (< 2^53 at any
    realistic month volume) so every double is ONE exact-integer
    division; eta = sum((S_t/n)^2) / s2_lrv with the Bartlett
    long-run variance s2 = g0/n + sum_j 2*(1-j/(l+1))*g_j/n at
    Schwert's l = floor(4*(n/100)^(1/4)) computed via the
    IEEE-exact sqrt(sqrt(.)) so no pow() crosses engines; the
    autocovariance folds g_j run t-ascending over the <=31-element
    day arrays on BOTH engines (sequence/element_at in Spark,
    range/list indexing in DuckDB) so the float sequences are
    identical. Reject at the 5% level-stationarity critical value
    0.463 (KPSS 1992 Table 1, pinned literal). 2 shuffles at any
    corpus size: the day aggregate and the tiny single-partition
    day window."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    wcum = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    day = day.select(
        "__day",
        "__y",
        F.sum("__y").over(wcum).cast("long").alias("__cy"),
        F.row_number().over(Window.orderBy("__day"))
        .cast("long").alias("__t"),
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__X"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__y", "__cy"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__e",
        F.expr(
            "transform(__a, s -> cast(n_days * s.__y - __X as double)"
            " / cast(n_days as double))"
        ),
    ).withColumn(
        "__s",
        F.expr(
            "transform(__a, s -> cast(n_days * s.__cy - s.__t * __X"
            " as double) / cast(n_days as double))"
        ),
    ).withColumn(
        "__l",
        F.expr(
            "cast(floor(4.0D * sqrt(sqrt(cast(n_days as double)"
            " / 100.0D))) as long)"
        ),
    )
    one = one.withColumn(
        "__g0",
        F.expr(
            "aggregate(transform(__e, x -> x * x), 0.0D,"
            " (acc, x) -> acc + x)"
        ),
    ).withColumn(
        "__ss",
        F.expr(
            "aggregate(transform(__s, x -> x * x), 0.0D,"
            " (acc, x) -> acc + x)"
        ),
    )
    for j in (1, 2, 3, 4):
        one = one.withColumn(
            f"__g{j}",
            F.expr(
                f"CASE WHEN n_days > {j} THEN"
                f" aggregate(transform(sequence({j + 1}L, n_days),"
                f" i -> element_at(__e, cast(i as int))"
                f" * element_at(__e, cast(i - {j} as int))), 0.0D,"
                f" (acc, x) -> acc + x) ELSE 0.0D END"
            ),
        )
    nD = F.col("n_days").cast("double")
    lD = F.col("__l").cast("double")
    s2 = F.col("__g0") / nD
    for j in (1, 2, 3, 4):
        s2 = s2 + F.when(
            F.col("__l") >= j,
            F.lit(2.0) * (F.lit(1.0) - F.lit(float(j)) / (lD + 1.0))
            * F.col(f"__g{j}") / nD,
        ).otherwise(F.lit(0.0))
    one = one.withColumn("__s2", s2)
    stat = F.col("__ss") / (nD * F.col("__s2"))
    return one.select(
        "n_days",
        F.col("__l").alias("lag_l"),
        _r6(F.col("__g0") / nD).alias("s2_short"),
        _r6("__s2").alias("s2_long"),
        _r6(stat).alias("kpss_stat"),
        (stat > F.lit(0.463)).alias("reject_5pct"),
    )


SQL_KPSS_TEST = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), cum AS (
  SELECT day, y,
    CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS cy,
    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(y) AS BIGINT) AS X,
    list(y ORDER BY t) AS ye,
    list(cy ORDER BY t) AS cye
  FROM cum
), arr AS (
  SELECT n_days, X,
    list_transform(range(1, n_days + 1),
      i -> CAST(n_days * ye[i] - X AS DOUBLE)
           / CAST(n_days AS DOUBLE)) AS e,
    list_transform(range(1, n_days + 1),
      t -> CAST(n_days * cye[t] - t * X AS DOUBLE)
           / CAST(n_days AS DOUBLE)) AS s,
    CAST(floor(CAST(4.0 AS DOUBLE)
      * sqrt(sqrt(CAST(n_days AS DOUBLE) / CAST(100.0 AS DOUBLE))))
      AS BIGINT) AS l
  FROM one
), fold AS (
  SELECT n_days, l,
    list_sum(list_transform(e, x -> x * x)) AS g0,
    list_sum(list_transform(s, x -> x * x)) AS ss,
    CASE WHEN n_days > 1 THEN list_sum(list_transform(
      range(2, n_days + 1), i -> e[i] * e[i - 1]))
      ELSE CAST(0.0 AS DOUBLE) END AS g1,
    CASE WHEN n_days > 2 THEN list_sum(list_transform(
      range(3, n_days + 1), i -> e[i] * e[i - 2]))
      ELSE CAST(0.0 AS DOUBLE) END AS g2,
    CASE WHEN n_days > 3 THEN list_sum(list_transform(
      range(4, n_days + 1), i -> e[i] * e[i - 3]))
      ELSE CAST(0.0 AS DOUBLE) END AS g3,
    CASE WHEN n_days > 4 THEN list_sum(list_transform(
      range(5, n_days + 1), i -> e[i] * e[i - 4]))
      ELSE CAST(0.0 AS DOUBLE) END AS g4
  FROM arr
), f AS (
  SELECT n_days, l, g0, ss,
    g0 / CAST(n_days AS DOUBLE)
    + (CASE WHEN l >= 1 THEN 2.0 * (1.0 - 1.0 / (CAST(l AS DOUBLE)
         + 1.0)) * g1 / CAST(n_days AS DOUBLE) ELSE 0.0 END)
    + (CASE WHEN l >= 2 THEN 2.0 * (1.0 - 2.0 / (CAST(l AS DOUBLE)
         + 1.0)) * g2 / CAST(n_days AS DOUBLE) ELSE 0.0 END)
    + (CASE WHEN l >= 3 THEN 2.0 * (1.0 - 3.0 / (CAST(l AS DOUBLE)
         + 1.0)) * g3 / CAST(n_days AS DOUBLE) ELSE 0.0 END)
    + (CASE WHEN l >= 4 THEN 2.0 * (1.0 - 4.0 / (CAST(l AS DOUBLE)
         + 1.0)) * g4 / CAST(n_days AS DOUBLE) ELSE 0.0 END)
    AS s2
  FROM fold
)
SELECT n_days, l AS lag_l,
  round(g0 / CAST(n_days AS DOUBLE), 6) AS s2_short,
  round(s2, 6) AS s2_long,
  round(ss / (CAST(n_days AS DOUBLE) * s2), 6) AS kpss_stat,
  (ss / (CAST(n_days AS DOUBLE) * s2) > 0.463) AS reject_5pct
FROM f
"""

QUERIES["kpss_test"] = q_kpss_test
_RAW_ORACLES["kpss_test"] = SQL_KPSS_TEST


def q_mantel_haenszel(spark, sf_dir):
    """Mantel-Haenszel pooled odds ratio across day-of-week strata
    with the Robins-Breslow-Greenland SE and the
    Cochran-Mantel-Haenszel chi-square (Mantel & Haenszel JNCI 1959;
    Robins, Breslow & Greenland Biometrics 1986 — the stratified
    companion to odds_ratio_ci and the REPAIR for simpson_audit's
    disease: when the exposure mix differs by stratum the crude OR
    lies, MH pools the per-stratum 2x2s into one
    confounding-adjusted effect). Exposure = md5-parity arm (hash-
    random, so the null OR=1 is exact by construction and a CI
    excluding 1 or a large CMH chi2 flags a broken assignment —
    the stratified A/A audit beside srm_check/did_estimate);
    outcome = purchase; strata = the 7 days of week. Per-stratum
    cells are exact longs from ONE corpus aggregate; every pooled
    sum (R, S, E, V and the three RBG variance pieces) folds
    stratum-ascending over the <=7-row frame so the float sequences
    are identical cross-engine; OR, ln OR, the 95% interval and
    chi2 = (sum a - E)^2 / V are fixed expression trees. 2 shuffles
    at any corpus size."""
    ev = _events(spark, sf_dir).select(
        (F.dayofweek(F.col("ts").cast("timestamp")) - 1).alias("__k"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mh|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
        (F.col("event_type") == "purchase").alias("__pur"),
    )
    st = ev.groupBy("__k").agg(
        F.sum(F.when((F.col("__arm") == 1) & F.col("__pur"), 1)
              .otherwise(0)).cast("long").alias("__ca"),
        F.sum(F.when((F.col("__arm") == 1) & ~F.col("__pur"), 1)
              .otherwise(0)).cast("long").alias("__cb"),
        F.sum(F.when((F.col("__arm") == 0) & F.col("__pur"), 1)
              .otherwise(0)).cast("long").alias("__cc"),
        F.sum(F.when((F.col("__arm") == 0) & ~F.col("__pur"), 1)
              .otherwise(0)).cast("long").alias("__cd"),
    )
    one = st.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("__ca").cast("long").alias("sum_a"),
        F.array_sort(
            F.collect_list(
                F.struct("__k", "__ca", "__cb", "__cc", "__cd")
            )
        ).alias("__a"),
    )

    def fold(term):
        return F.expr(
            "aggregate(__a, 0.0D, (acc, x) -> acc + (" + term + "))"
        )

    n = ("cast(x.__ca + x.__cb + x.__cc + x.__cd as double)")
    one = (
        one
        .withColumn("__R", fold(
            f"cast(x.__ca as double) * cast(x.__cd as double) / {n}"))
        .withColumn("__S", fold(
            f"cast(x.__cb as double) * cast(x.__cc as double) / {n}"))
        .withColumn("__E", fold(
            "cast(x.__ca + x.__cb as double)"
            f" * cast(x.__ca + x.__cc as double) / {n}"))
        .withColumn("__V", fold(
            "CASE WHEN x.__ca + x.__cb + x.__cc + x.__cd > 1 THEN"
            " cast(x.__ca + x.__cb as double)"
            " * cast(x.__cc + x.__cd as double)"
            " * cast(x.__ca + x.__cc as double)"
            " * cast(x.__cb + x.__cd as double)"
            f" / ({n} * {n}"
            " * cast(x.__ca + x.__cb + x.__cc + x.__cd - 1 as double))"
            " ELSE 0.0D END"))
        .withColumn("__PR", fold(
            f"(cast(x.__ca + x.__cd as double) / {n})"
            f" * (cast(x.__ca as double) * cast(x.__cd as double) / {n})"))
        .withColumn("__PSQR", fold(
            f"(cast(x.__ca + x.__cd as double) / {n})"
            f" * (cast(x.__cb as double) * cast(x.__cc as double) / {n})"
            f" + (cast(x.__cb + x.__cc as double) / {n})"
            f" * (cast(x.__ca as double) * cast(x.__cd as double) / {n})"))
        .withColumn("__QS", fold(
            f"(cast(x.__cb + x.__cc as double) / {n})"
            f" * (cast(x.__cb as double) * cast(x.__cc as double) / {n})"))
    )
    ok = (F.col("__R") > 0.0) & (F.col("__S") > 0.0) \
        & (F.col("__V") > 0.0)
    orr = F.col("__R") / F.col("__S")
    var = (
        F.col("__PR") / (F.lit(2.0) * F.col("__R") * F.col("__R"))
        + F.col("__PSQR")
        / (F.lit(2.0) * F.col("__R") * F.col("__S"))
        + F.col("__QS") / (F.lit(2.0) * F.col("__S") * F.col("__S"))
    )
    se = F.sqrt(var)
    lo = F.exp(F.log(orr) - F.lit(1.96) * se)
    hi = F.exp(F.log(orr) + F.lit(1.96) * se)
    dev = F.col("sum_a").cast("double") - F.col("__E")
    return one.select(
        "k_strata",
        "sum_a",
        _r6(F.when(ok, orr)).alias("or_mh"),
        _r6(F.when(ok, F.log(orr))).alias("log_or_mh"),
        _r6(F.when(ok, se)).alias("se_log_or"),
        _r6(F.when(ok, lo)).alias("or_lo95"),
        _r6(F.when(ok, hi)).alias("or_hi95"),
        _r6(F.when(ok, dev * dev / F.col("__V"))).alias("cmh_chi2"),
        F.when(ok, (lo > 1.0) | (hi < 1.0)).alias("significant"),
    )


SQL_MANTEL_HAENSZEL = """
WITH ev AS (
  SELECT dayofweek(ts) AS k,
    CAST(('0x' || substring(md5('mh|' || CAST(user_id AS VARCHAR)),
      1, 15))::UBIGINT % 2 AS BIGINT) AS arm,
    (event_type = 'purchase') AS pur
  FROM events
), st AS (
  SELECT k,
    CAST(sum(CASE WHEN arm = 1 AND pur THEN 1 ELSE 0 END)
      AS BIGINT) AS ca,
    CAST(sum(CASE WHEN arm = 1 AND NOT pur THEN 1 ELSE 0 END)
      AS BIGINT) AS cb,
    CAST(sum(CASE WHEN arm = 0 AND pur THEN 1 ELSE 0 END)
      AS BIGINT) AS cc,
    CAST(sum(CASE WHEN arm = 0 AND NOT pur THEN 1 ELSE 0 END)
      AS BIGINT) AS cd
  FROM ev GROUP BY k
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
    CAST(sum(ca) AS BIGINT) AS sum_a,
    list_sum(list(CAST(ca AS DOUBLE) * CAST(cd AS DOUBLE)
      / CAST(ca + cb + cc + cd AS DOUBLE) ORDER BY k)) AS R,
    list_sum(list(CAST(cb AS DOUBLE) * CAST(cc AS DOUBLE)
      / CAST(ca + cb + cc + cd AS DOUBLE) ORDER BY k)) AS S,
    list_sum(list(CAST(ca + cb AS DOUBLE) * CAST(ca + cc AS DOUBLE)
      / CAST(ca + cb + cc + cd AS DOUBLE) ORDER BY k)) AS E,
    list_sum(list(CASE WHEN ca + cb + cc + cd > 1 THEN
      CAST(ca + cb AS DOUBLE) * CAST(cc + cd AS DOUBLE)
      * CAST(ca + cc AS DOUBLE) * CAST(cb + cd AS DOUBLE)
      / (CAST(ca + cb + cc + cd AS DOUBLE)
         * CAST(ca + cb + cc + cd AS DOUBLE)
         * CAST(ca + cb + cc + cd - 1 AS DOUBLE))
      ELSE CAST(0.0 AS DOUBLE) END ORDER BY k)) AS V,
    list_sum(list((CAST(ca + cd AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE))
      * (CAST(ca AS DOUBLE) * CAST(cd AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE)) ORDER BY k)) AS PR,
    list_sum(list((CAST(ca + cd AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE))
      * (CAST(cb AS DOUBLE) * CAST(cc AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE))
      + (CAST(cb + cc AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE))
      * (CAST(ca AS DOUBLE) * CAST(cd AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE)) ORDER BY k)) AS PSQR,
    list_sum(list((CAST(cb + cc AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE))
      * (CAST(cb AS DOUBLE) * CAST(cc AS DOUBLE)
        / CAST(ca + cb + cc + cd AS DOUBLE)) ORDER BY k)) AS QS
  FROM st
), f AS (
  SELECT k_strata, sum_a, R, S, E, V,
    R / S AS orr,
    sqrt(PR / (2.0 * R * R) + PSQR / (2.0 * R * S)
         + QS / (2.0 * S * S)) AS se
  FROM one WHERE R > 0.0 AND S > 0.0 AND V > 0.0
)
SELECT k_strata, sum_a,
  round(orr, 6) AS or_mh,
  round(ln(orr), 6) AS log_or_mh,
  round(se, 6) AS se_log_or,
  round(exp(ln(orr) - 1.96 * se), 6) AS or_lo95,
  round(exp(ln(orr) + 1.96 * se), 6) AS or_hi95,
  round((CAST(sum_a AS DOUBLE) - E) * (CAST(sum_a AS DOUBLE) - E)
        / V, 6) AS cmh_chi2,
  (exp(ln(orr) - 1.96 * se) > 1.0
   OR exp(ln(orr) + 1.96 * se) < 1.0) AS significant
FROM f
"""

QUERIES["mantel_haenszel"] = q_mantel_haenszel
_RAW_ORACLES["mantel_haenszel"] = SQL_MANTEL_HAENSZEL
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_variance_ratio(spark, sf_dir):
    """Lo-MacKinlay variance-ratio test of the cumulative event-count
    path at horizons q in {2, 3, 5} (Lo & MacKinlay Rev. Fin. Studies
    1988 — THE random-walk diagnostic: if daily increments are iid
    the q-period variance is exactly q times the 1-period variance,
    VR < 1 flags mean reversion and VR > 1 flags trending/momentum;
    for a data platform this says whether tomorrow's volume forecast
    may simply scale today's noise or needs an AR term — the
    horizon-sweep companion to value_acf/hurst_variance_plot).
    Daily counts are exact longs from ONE corpus aggregate; with
    x_0 = 0 the overlapping q-period deviations carry exact-integer
    numerators n*(x_t - x_{t-q}) - q*X so every double is one exact
    division; folds run t-ascending over the <=31-element day arrays
    on BOTH engines; the unbiased-overlapping denominator
    m = q*(n-q+1)*(1-q/n) and the homoskedastic
    z = (VR-1)/sqrt(2(2q-1)(q-1)/(3qn)) are fixed expression trees
    (LM 1988 eqs. 12, 14). The persisted 1-row moment frame fans out
    to the 3 q-rows (cached-branch). 2 shuffles at any corpus
    size."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    wcum = Window.orderBy("__day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    day = day.select(
        "__day",
        "__y",
        F.sum("__y").over(wcum).cast("long").alias("__cy"),
        F.row_number().over(Window.orderBy("__day"))
        .cast("long").alias("__t"),
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__X"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__y", "__cy"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__cyarr", F.expr("transform(__a, s -> s.__cy)")
    ).withColumn(
        "__s1",
        F.expr(
            "aggregate(transform(__a, s -> (cast(n_days * s.__y - __X"
            " as double) / cast(n_days as double))"
            " * (cast(n_days * s.__y - __X as double)"
            " / cast(n_days as double))), 0.0D, (acc, x) -> acc + x)"
            " / cast(n_days - 1 as double)"
        ),
    )
    one = scratch_persist(one)
    outs = []
    for q in (2, 3, 5):
        sq = (
            f"aggregate(transform(sequence({q}L, n_days), t ->"
            f" (cast(n_days * (element_at(__cyarr, cast(t as int))"
            f" - (CASE WHEN t - {q} >= 1 THEN element_at(__cyarr,"
            f" cast(t - {q} as int)) ELSE 0L END)) - {q} * __X"
            f" as double) / cast(n_days as double))"
            f" * (cast(n_days * (element_at(__cyarr, cast(t as int))"
            f" - (CASE WHEN t - {q} >= 1 THEN element_at(__cyarr,"
            f" cast(t - {q} as int)) ELSE 0L END)) - {q} * __X"
            f" as double) / cast(n_days as double))), 0.0D,"
            f" (acc, x) -> acc + x)"
            f" / (cast({q} as double) * cast(n_days - {q} + 1 as double)"
            f" * (cast(1 as double) - cast({q} as double)"
            f" / cast(n_days as double)))"
        )
        vr = f"({sq}) / __s1"
        z = (
            f"(({vr}) - cast(1 as double))"
            f" / sqrt(cast(2 * (2 * {q} - 1) * ({q} - 1) as double)"
            f" / cast(3 * {q} as double) / cast(n_days as double))"
        )
        outs.append(
            one.filter(F.col("n_days") > q).selectExpr(
                f"cast({q} as long) AS q",
                "n_days",
                f"{vr} AS __vr",
                f"{z} AS __z",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "q",
        "n_days",
        _r6("__vr").alias("vr"),
        _r6("__z").alias("z_stat"),
        (F.abs(F.col("__z")) > F.lit(1.96)).alias("reject_5pct"),
    )


SQL_VARIANCE_RATIO = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), cum AS (
  SELECT day, y,
    CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS cy,
    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(y) AS BIGINT) AS X,
    list(y ORDER BY t) AS ye,
    list(cy ORDER BY t) AS cye
  FROM cum
), base AS (
  SELECT n_days, X, cye,
    list_sum(list_transform(range(1, n_days + 1),
      i -> (CAST(n_days * ye[i] - X AS DOUBLE)
            / CAST(n_days AS DOUBLE))
         * (CAST(n_days * ye[i] - X AS DOUBLE)
            / CAST(n_days AS DOUBLE))))
      / CAST(n_days - 1 AS DOUBLE) AS s1
  FROM one
), qs AS (
  SELECT CAST(q AS BIGINT) AS q FROM (VALUES (2), (3), (5)) v(q)
), f AS (
  SELECT qs.q, b.n_days,
    list_sum(list_transform(range(qs.q, b.n_days + 1),
      t -> (CAST(b.n_days * (b.cye[t] - (CASE WHEN t - qs.q >= 1
              THEN b.cye[t - qs.q] ELSE CAST(0 AS BIGINT) END))
            - qs.q * b.X AS DOUBLE) / CAST(b.n_days AS DOUBLE))
         * (CAST(b.n_days * (b.cye[t] - (CASE WHEN t - qs.q >= 1
              THEN b.cye[t - qs.q] ELSE CAST(0 AS BIGINT) END))
            - qs.q * b.X AS DOUBLE) / CAST(b.n_days AS DOUBLE))))
      / (CAST(qs.q AS DOUBLE) * CAST(b.n_days - qs.q + 1 AS DOUBLE)
         * (CAST(1 AS DOUBLE) - CAST(qs.q AS DOUBLE)
            / CAST(b.n_days AS DOUBLE)))
      / b.s1 AS vr
  FROM base b, qs
  WHERE b.n_days > qs.q
), z AS (
  SELECT q, n_days, vr,
    (vr - CAST(1 AS DOUBLE))
    / sqrt(CAST(2 * (2 * q - 1) * (q - 1) AS DOUBLE)
           / CAST(3 * q AS DOUBLE) / CAST(n_days AS DOUBLE)) AS zs
  FROM f
)
SELECT q, n_days,
  round(vr, 6) AS vr,
  round(zs, 6) AS z_stat,
  (abs(zs) > 1.96) AS reject_5pct
FROM z
"""

QUERIES["variance_ratio"] = q_variance_ratio
_RAW_ORACLES["variance_ratio"] = SQL_VARIANCE_RATIO


def _granger_frags(nu, Sz, Sz2, Sol, Sol2, Solz, Scl, Scl2, Sclz,
                   Solcl):
    """Shared SQL fragments for one Granger direction — executed
    VERBATIM by both engines (the bradley_terry convention) so every
    float op happens in the same order. All inputs are names of
    exact-integer moment columns; outputs are expression strings for
    the restricted/unrestricted SSEs, the lag coefficients and the
    F statistic. Cramer's rule on the 3x3 normal equations with
    every moment cast to double FIRST (minor products overflow
    int64); SSE via the moment identity sum(z^2) - a*Sz - b*Solz
    - c*Sclz, so no second pass over the data is needed."""
    d = {k: f"cast({v} as double)" for k, v in dict(
        nu=nu, Sz=Sz, Sz2=Sz2, Sol=Sol, Sol2=Sol2, Solz=Solz,
        Scl=Scl, Scl2=Scl2, Sclz=Sclz, Solcl=Solcl,
    ).items()}
    brn = f"({d['nu']} * {d['Solz']} - {d['Sol']} * {d['Sz']})"
    brd = f"({d['nu']} * {d['Sol2']} - {d['Sol']} * {d['Sol']})"
    br = f"({brn} / {brd})"
    ar = f"(({d['Sz']} - {br} * {d['Sol']}) / {d['nu']})"
    sse_r = (
        f"({d['Sz2']} - {ar} * {d['Sz']} - {br} * {d['Solz']})"
    )
    det = (
        f"({d['nu']} * ({d['Sol2']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Solcl']})"
        f" - {d['Sol']} * ({d['Sol']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Scl']})"
        f" + {d['Scl']} * ({d['Sol']} * {d['Solcl']}"
        f" - {d['Sol2']} * {d['Scl']}))"
    )
    da = (
        f"({d['Sz']} * ({d['Sol2']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Solcl']})"
        f" - {d['Sol']} * ({d['Solz']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Sclz']})"
        f" + {d['Scl']} * ({d['Solz']} * {d['Solcl']}"
        f" - {d['Sol2']} * {d['Sclz']}))"
    )
    db = (
        f"({d['nu']} * ({d['Solz']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Sclz']})"
        f" - {d['Sz']} * ({d['Sol']} * {d['Scl2']}"
        f" - {d['Solcl']} * {d['Scl']})"
        f" + {d['Scl']} * ({d['Sol']} * {d['Sclz']}"
        f" - {d['Solz']} * {d['Scl']}))"
    )
    dc = (
        f"({d['nu']} * ({d['Sol2']} * {d['Sclz']}"
        f" - {d['Solz']} * {d['Solcl']})"
        f" - {d['Sol']} * ({d['Sol']} * {d['Sclz']}"
        f" - {d['Solz']} * {d['Scl']})"
        f" + {d['Sz']} * ({d['Sol']} * {d['Solcl']}"
        f" - {d['Sol2']} * {d['Scl']}))"
    )
    a = f"({da} / {det})"
    b = f"({db} / {det})"
    c = f"({dc} / {det})"
    sse_u = (
        f"({d['Sz2']} - {a} * {d['Sz']} - {b} * {d['Solz']}"
        f" - {c} * {d['Sclz']})"
    )
    ok = f"(abs({det}) > cast(0 as double) and abs({brd}) > cast(0 as double))"
    f_stat = (
        f"(({sse_r} - {sse_u}) * ({d['nu']} - cast(3 as double))"
        f" / {sse_u})"
    )
    return {
        "ok": ok, "b_own": b, "b_cross": c,
        "sse_r": sse_r, "sse_u": sse_u, "f": f_stat,
    }


_GRANGER_XY = _granger_frags(
    "nu", "syt", "syt2", "syl", "syl2", "syly",
    "sxl", "sxl2", "sxly", "sylxl",
)
_GRANGER_YX = _granger_frags(
    "nu", "sxt", "sxt2", "sxl", "sxl2", "sxlx",
    "syl", "syl2", "sylx", "sylxl",
)


def q_granger_causality(spark, sf_dir):
    """Bivariate lag-1 Granger-causality F-tests between daily click
    and daily purchase volume, both directions (Granger Econometrica
    1969 — 'does yesterday's click volume improve today's purchase
    forecast beyond purchases' own history?': the lead-lag AUDIT
    behind cross-metric alerting and feature selection for
    next-day-volume models; the regression companion to lagged_corr,
    which reports raw cross-correlation without conditioning on the
    own lag). Daily type counts are exact longs from ONE corpus
    aggregate; the 14 regression moments over the <=30 lagged days
    are exact-integer sums (order-free); the restricted (own-lag)
    and unrestricted (own+cross-lag) OLS fits come from Cramer's
    rule on the 3x3 normal equations with every moment cast to
    double first, and both SSEs use the moment identity
    sum(z^2) - a*Sz - b*Solz - c*Sclz — so the whole test is a fixed
    expression tree executed VERBATIM by both engines (shared
    generated fragments, the bradley_terry convention) and no
    second data pass exists. F compared to the pinned 4.21
    (the F(1, 27) 5% point for a 31-day month — approximate by one
    df if days are missing, documented). The persisted 1-row moment
    frame fans out to the 2 direction rows (cached-branch).
    2 shuffles at any corpus size."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
        "event_type",
    )
    day = ev.groupBy("__day").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).cast("long").alias("__p"),
        F.sum(F.when(F.col("event_type") == "click", 1)
              .otherwise(0)).cast("long").alias("__c"),
    )
    wlag = Window.orderBy("__day")
    lagf = day.select(
        F.col("__p").alias("__yt"),
        F.col("__c").alias("__xt"),
        F.lag("__p").over(wlag).alias("__yl"),
        F.lag("__c").over(wlag).alias("__xl"),
    ).filter(F.col("__yl").isNotNull())
    one = lagf.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("__yt").cast("long").alias("syt"),
        F.sum("__xt").cast("long").alias("sxt"),
        F.sum("__yl").cast("long").alias("syl"),
        F.sum("__xl").cast("long").alias("sxl"),
        F.sum(F.col("__yt") * F.col("__yt")).cast("long").alias("syt2"),
        F.sum(F.col("__xt") * F.col("__xt")).cast("long").alias("sxt2"),
        F.sum(F.col("__yl") * F.col("__yl")).cast("long").alias("syl2"),
        F.sum(F.col("__xl") * F.col("__xl")).cast("long").alias("sxl2"),
        F.sum(F.col("__yl") * F.col("__xl")).cast("long").alias("sylxl"),
        F.sum(F.col("__yl") * F.col("__yt")).cast("long").alias("syly"),
        F.sum(F.col("__xl") * F.col("__yt")).cast("long").alias("sxly"),
        F.sum(F.col("__xl") * F.col("__xt")).cast("long").alias("sxlx"),
        F.sum(F.col("__yl") * F.col("__xt")).cast("long").alias("sylx"),
    )
    one = scratch_persist(one)
    outs = []
    for label, fr in (
        ("clicks->purchases", _GRANGER_XY),
        ("purchases->clicks", _GRANGER_YX),
    ):
        outs.append(one.selectExpr(
            f"'{label}' AS direction",
            "nu AS n_used",
            f"CASE WHEN {fr['ok']} THEN {fr['b_own']}"
            " ELSE NULL END AS __bo",
            f"CASE WHEN {fr['ok']} THEN {fr['b_cross']}"
            " ELSE NULL END AS __bc",
            f"CASE WHEN {fr['ok']} THEN {fr['sse_r']}"
            " ELSE NULL END AS __sr",
            f"CASE WHEN {fr['ok']} THEN {fr['sse_u']}"
            " ELSE NULL END AS __su",
            f"CASE WHEN {fr['ok']} THEN {fr['f']}"
            " ELSE NULL END AS __f",
        ))
    res = outs[0].unionByName(outs[1])
    return res.select(
        "direction",
        "n_used",
        _r6("__bo").alias("b_own_lag"),
        _r6("__bc").alias("b_cross_lag"),
        _r6("__sr").alias("sse_restricted"),
        _r6("__su").alias("sse_unrestricted"),
        _r6("__f").alias("f_stat"),
        (F.col("__f") > F.lit(4.21)).alias("reject_approx_5pct"),
    )


_SQL_GRANGER_DIR = """
  SELECT '{label}' AS direction, nu,
    CASE WHEN {ok} THEN {b_own} ELSE NULL END AS bo,
    CASE WHEN {ok} THEN {b_cross} ELSE NULL END AS bc,
    CASE WHEN {ok} THEN {sse_r} ELSE NULL END AS sr,
    CASE WHEN {ok} THEN {sse_u} ELSE NULL END AS su,
    CASE WHEN {ok} THEN {f} ELSE NULL END AS ff
  FROM one
"""

SQL_GRANGER_CAUSALITY = """
WITH day AS (
  SELECT day(ts) AS day,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS p,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      AS BIGINT) AS c
  FROM events GROUP BY day(ts)
), lagf AS (
  SELECT p AS yt, c AS xt,
    lag(p) OVER (ORDER BY day) AS yl,
    lag(c) OVER (ORDER BY day) AS xl
  FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS nu,
    CAST(sum(yt) AS BIGINT) AS syt,
    CAST(sum(xt) AS BIGINT) AS sxt,
    CAST(sum(yl) AS BIGINT) AS syl,
    CAST(sum(xl) AS BIGINT) AS sxl,
    CAST(sum(yt * yt) AS BIGINT) AS syt2,
    CAST(sum(xt * xt) AS BIGINT) AS sxt2,
    CAST(sum(yl * yl) AS BIGINT) AS syl2,
    CAST(sum(xl * xl) AS BIGINT) AS sxl2,
    CAST(sum(yl * xl) AS BIGINT) AS sylxl,
    CAST(sum(yl * yt) AS BIGINT) AS syly,
    CAST(sum(xl * yt) AS BIGINT) AS sxly,
    CAST(sum(xl * xt) AS BIGINT) AS sxlx,
    CAST(sum(yl * xt) AS BIGINT) AS sylx
  FROM lagf WHERE yl IS NOT NULL
), u AS (
{dir_xy}
  UNION ALL
{dir_yx}
)
SELECT direction, nu AS n_used,
  round(bo, 6) AS b_own_lag,
  round(bc, 6) AS b_cross_lag,
  round(sr, 6) AS sse_restricted,
  round(su, 6) AS sse_unrestricted,
  round(ff, 6) AS f_stat,
  (ff > 4.21) AS reject_approx_5pct
FROM u
""".format(
    dir_xy=_SQL_GRANGER_DIR.format(
        label="clicks->purchases",
        ok=_GRANGER_XY["ok"], b_own=_GRANGER_XY["b_own"],
        b_cross=_GRANGER_XY["b_cross"], sse_r=_GRANGER_XY["sse_r"],
        sse_u=_GRANGER_XY["sse_u"], f=_GRANGER_XY["f"],
    ),
    dir_yx=_SQL_GRANGER_DIR.format(
        label="purchases->clicks",
        ok=_GRANGER_YX["ok"], b_own=_GRANGER_YX["b_own"],
        b_cross=_GRANGER_YX["b_cross"], sse_r=_GRANGER_YX["sse_r"],
        sse_u=_GRANGER_YX["sse_u"], f=_GRANGER_YX["f"],
    ),
)

QUERIES["granger_causality"] = q_granger_causality
_RAW_ORACLES["granger_causality"] = SQL_GRANGER_CAUSALITY
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}


def q_durbin_watson(spark, sf_dir):
    """Durbin-Watson test for lag-1 autocorrelation in the residuals
    of the daily-volume-on-time OLS trend (Durbin & Watson Biometrika
    1950/51 — the classic 'is the trend line lying?' diagnostic: after
    removing a linear trend from daily event counts, DW ~ 2 says the
    leftover noise is white, DW << 2 says positive serial correlation
    (the trend's standard errors are overstated and a naive
    capacity-planning extrapolation will overshoot), DW >> 2 says
    negative/oscillating residuals; the REGRESSION-residual companion
    to ljung_box/pacf_durbin, which test the raw series). Daily
    counts are exact longs from ONE corpus aggregate; with
    t = 1..n the time moments St = n(n+1)/2 and St2 = n(n+1)(2n+1)/6
    are closed-form exact longs, so the scaled residuals
    E_t = n*D*y_t - D*Sy + Nb*St - n*Nb*t (D = n*St2 - St^2,
    Nb = n*Sty - St*Sy) are EXACT INTEGERS — the common factor n*D
    cancels in DW = sum (E_t - E_{t-1})^2 / sum E_t^2, so every
    double is one exact-long cast followed by one multiply, folded
    t-ascending on BOTH engines. Slope = Nb/D is one exact division.
    Savin & White (Econometrica 1977) 5% bounds at n = 30, k = 1
    pinned: dL = 1.352, dU = 1.489 (the 30-day test frame). 2
    shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__St", F.expr("n_days * (n_days + 1) div 2"))
        .withColumn(
            "__St2",
            F.expr("n_days * (n_days + 1) * (2 * n_days + 1) div 6"),
        )
        .withColumn(
            "__Sty",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, t) ->"
                " acc + t * element_at(__yarr, cast(t as int)))"
            ),
        )
    )
    one = one.withColumn(
        "__D", F.expr("n_days * __St2 - __St * __St")
    ).withColumn("__Nb", F.expr("n_days * __Sty - __St * __Sy"))
    one = one.withColumn(
        "__earr",
        F.expr(
            "transform(sequence(1L, n_days), t ->"
            " n_days * __D * element_at(__yarr, cast(t as int))"
            " - __D * __Sy + __Nb * __St - n_days * __Nb * t)"
        ),
    )
    one = one.withColumn(
        "__num",
        F.expr(
            "aggregate(sequence(2L, n_days), 0.0D, (acc, t) ->"
            " acc + cast(element_at(__earr, cast(t as int))"
            " - element_at(__earr, cast(t - 1 as int)) as double)"
            " * cast(element_at(__earr, cast(t as int))"
            " - element_at(__earr, cast(t - 1 as int)) as double))"
        ),
    ).withColumn(
        "__den",
        F.expr(
            "aggregate(sequence(1L, n_days), 0.0D, (acc, t) ->"
            " acc + cast(element_at(__earr, cast(t as int)) as double)"
            " * cast(element_at(__earr, cast(t as int)) as double))"
        ),
    )
    one = one.filter(
        (F.col("n_days") > 2)
        & (F.col("__D") > 0)
        & (F.col("__den") > 0.0)
    )
    dw = F.col("__num") / F.col("__den")
    return one.select(
        "n_days",
        _r6(F.col("__Nb").cast("double") / F.col("__D").cast("double"))
        .alias("slope_per_day"),
        _r6(dw).alias("dw"),
        _r6(F.lit(1.0) - dw / F.lit(2.0)).alias("rho_hat"),
        F.when(dw < 1.352, F.lit("positive_autocorr"))
        .when(dw > 2.648, F.lit("negative_autocorr"))
        .when((dw >= 1.489) & (dw <= 2.511), F.lit("no_autocorr"))
        .otherwise(F.lit("inconclusive"))
        .alias("verdict"),
    )


SQL_DURBIN_WATSON = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy,
    list(y ORDER BY day) AS yarr
  FROM day
), mo AS (
  SELECT n, Sy, yarr,
    n * (n + 1) // 2 AS St,
    n * (n + 1) * (2 * n + 1) // 6 AS St2,
    list_sum(list_transform(range(1, n + 1),
      t -> t * yarr[t])) AS Sty
  FROM one
), dd AS (
  SELECT n, Sy, yarr, St, Sty,
    n * St2 - St * St AS D,
    n * Sty - St * Sy AS Nb
  FROM mo
), ea AS (
  SELECT n, D, Nb,
    list_transform(range(1, n + 1),
      t -> n * D * yarr[t] - D * Sy + Nb * St - n * Nb * t) AS earr
  FROM dd
), f AS (
  SELECT n, D, Nb,
    list_sum(list_transform(range(2, n + 1),
      t -> CAST(earr[t] - earr[t - 1] AS DOUBLE)
         * CAST(earr[t] - earr[t - 1] AS DOUBLE))) AS num,
    list_sum(list_transform(range(1, n + 1),
      t -> CAST(earr[t] AS DOUBLE)
         * CAST(earr[t] AS DOUBLE))) AS den
  FROM ea
)
SELECT n AS n_days,
  round(CAST(Nb AS DOUBLE) / CAST(D AS DOUBLE), 6) AS slope_per_day,
  round(num / den, 6) AS dw,
  round(1.0 - num / den / 2.0, 6) AS rho_hat,
  CASE WHEN num / den < 1.352 THEN 'positive_autocorr'
       WHEN num / den > 2.648 THEN 'negative_autocorr'
       WHEN num / den >= 1.489 AND num / den <= 2.511
         THEN 'no_autocorr'
       ELSE 'inconclusive' END AS verdict
FROM f WHERE n > 2 AND D > 0 AND den > 0
"""

QUERIES["durbin_watson"] = q_durbin_watson
_RAW_ORACLES["durbin_watson"] = SQL_DURBIN_WATSON


def q_bartlett_test(spark, sf_dir):
    """Bartlett's test of variance homogeneity for `value` across the
    5 event types (Bartlett Proc. R. Soc. A 1937 — the likelihood-
    ratio-based twin of levene_test: Levene is robust to
    non-normality, Bartlett is the more powerful parametric test when
    jarque_bera clears the normality gate; running both is the
    textbook heteroskedasticity pre-check before pooling per-type
    value statistics into one scaler, cf. the fit in robust_scale).
    Values are exact 2-decimal cents (the derived_features idiom,
    non-negative at every SF), so the per-type moments n_i, sum c,
    sum c^2 are exact longs from ONE corpus aggregate and each
    (n_i-1)*s_i^2 = (n_i*Sc2 - Sc^2) / (n_i * 1e4) is one exact-long
    cast and one fixed division pair; every pooled sum (W, the
    (n_i-1)ln s_i^2 fold, the 1/(n_i-1) fold) runs event_type-
    ascending over the 5-row frame on BOTH engines; the Bartlett
    statistic T = ((N-k) ln s_p^2 - sum) / C with Snedecor-Cochran
    correction C is a fixed expression tree. chi2(4) 5% point 9.488
    pinned (k = 5 types). 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long").alias("__c"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__ni"),
        F.sum("__c").cast("long").alias("__sc"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__sc2"),
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__ni").cast("long").alias("n_total"),
        F.expr(
            "bool_and(__ni > 1 AND"
            " __ni * __sc2 - __sc * __sc > 0)"
        ).alias("__ok"),
        F.array_sort(
            F.collect_list(
                F.struct("event_type", "__ni", "__sc", "__sc2")
            )
        ).alias("__a"),
    )

    def fold(term):
        return F.expr(
            "aggregate(__a, 0.0D, (acc, x) -> acc + (" + term + "))"
        )

    wi = (
        "cast(x.__ni * x.__sc2 - x.__sc * x.__sc as double)"
        " / (cast(x.__ni as double) * 10000.0D)"
    )
    s2i = (
        "(CASE WHEN x.__ni > 1 AND x.__ni * x.__sc2"
        " - x.__sc * x.__sc > 0 THEN"
        f" ({wi}) / cast(x.__ni - 1 as double)"
        " ELSE 1.0D END)"
    )
    one = (
        one
        .withColumn("__W", fold(wi))
        .withColumn(
            "__LNS",
            fold(f"cast(x.__ni - 1 as double) * ln({s2i})"),
        )
        .withColumn(
            "__IN", fold("1.0D / cast(x.__ni - 1 as double)")
        )
    )
    one = one.filter(
        F.col("__ok")
        & (F.col("k_groups") > 1)
        & (F.col("n_total") > F.col("k_groups"))
    )
    nk = (F.col("n_total") - F.col("k_groups")).cast("double")
    sp2 = F.col("__W") / nk
    tnum = nk * F.log(sp2) - F.col("__LNS")
    cf = F.lit(1.0) + (F.col("__IN") - F.lit(1.0) / nk) / (
        F.lit(3.0) * (F.col("k_groups") - 1).cast("double")
    )
    t = tnum / cf
    return one.select(
        "k_groups",
        "n_total",
        _r6(sp2).alias("pooled_var"),
        _r6(cf).alias("c_factor"),
        _r6(t).alias("bartlett_t"),
        (t > F.lit(9.488)).alias("reject_5pct"),
    )


SQL_BARTLETT_TEST = """
WITH ev AS (
  SELECT event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), g AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS ni,
    CAST(sum(c) AS BIGINT) AS sc,
    CAST(sum(c * c) AS BIGINT) AS sc2
  FROM ev GROUP BY event_type
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(ni) AS BIGINT) AS N,
    bool_and(ni > 1 AND ni * sc2 - sc * sc > 0) AS ok,
    list_sum(list(
      CAST(ni * sc2 - sc * sc AS DOUBLE)
      / (CAST(ni AS DOUBLE) * 10000.0)
      ORDER BY event_type)) AS W,
    list_sum(list(
      CAST(ni - 1 AS DOUBLE)
      * ln(CASE WHEN ni > 1 AND ni * sc2 - sc * sc > 0 THEN
          (CAST(ni * sc2 - sc * sc AS DOUBLE)
           / (CAST(ni AS DOUBLE) * 10000.0))
          / CAST(ni - 1 AS DOUBLE)
        ELSE 1.0 END)
      ORDER BY event_type)) AS LNS,
    list_sum(list(1.0 / CAST(ni - 1 AS DOUBLE)
      ORDER BY event_type)) AS IN_
  FROM g
), f AS (
  SELECT k, N, W, LNS, IN_,
    CAST(N - k AS DOUBLE) AS nk
  FROM one
  WHERE ok AND k > 1 AND N > k
)
SELECT k AS k_groups, N AS n_total,
  round(W / nk, 6) AS pooled_var,
  round(1.0 + (IN_ - 1.0 / nk) / (3.0 * CAST(k - 1 AS DOUBLE)), 6)
    AS c_factor,
  round((nk * ln(W / nk) - LNS)
        / (1.0 + (IN_ - 1.0 / nk)
           / (3.0 * CAST(k - 1 AS DOUBLE))), 6) AS bartlett_t,
  ((nk * ln(W / nk) - LNS)
   / (1.0 + (IN_ - 1.0 / nk)
      / (3.0 * CAST(k - 1 AS DOUBLE))) > 9.488) AS reject_5pct
FROM f
"""

QUERIES["bartlett_test"] = q_bartlett_test
_RAW_ORACLES["bartlett_test"] = SQL_BARTLETT_TEST


def q_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan heteroskedasticity test (Koenker's studentized
    form) on the residuals of the daily-volume-on-time OLS trend
    (Breusch & Pagan Econometrica 1979; Koenker J. Econometrics 1981
    — the VARIANCE companion to durbin_watson's autocorrelation
    check: DW asks whether the trend's residuals are serially
    correlated, BP asks whether their spread GROWS or SHRINKS with
    time; either failure means the trend's standard errors — and any
    capacity-planning band built from them — are wrong. Koenker's
    form is the modern default because it drops BP's normality
    assumption: LM = n * R^2 of the auxiliary regression of e_t^2 on
    t). Reuses durbin_watson's exact-integer residual machinery:
    daily counts y_t are exact longs from ONE corpus aggregate, the
    time moments St/St2 are closed-form exact longs, and the scaled
    residuals E_t = n*D*y_t - D*Sy + Nb*St - n*Nb*t are EXACT
    INTEGERS; R^2 is scale-invariant so the auxiliary regression runs
    on g_t = (cast E_t as double)^2 directly — each g_t is ONE
    deterministic IEEE product of an exact-long cast with itself, and
    the three auxiliary moments Sg/Stg/Sgg fold t-ascending on BOTH
    engines. LM = n * (n*Stg - St*Sg)^2 / (D * (n*Sgg - Sg^2)) is a
    fixed expression tree; chi2(1) 5% point 3.841 pinned. 2 shuffles
    at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__St", F.expr("n_days * (n_days + 1) div 2"))
        .withColumn(
            "__St2",
            F.expr("n_days * (n_days + 1) * (2 * n_days + 1) div 6"),
        )
        .withColumn(
            "__Sty",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, t) ->"
                " acc + t * element_at(__yarr, cast(t as int)))"
            ),
        )
    )
    one = one.withColumn(
        "__D", F.expr("n_days * __St2 - __St * __St")
    ).withColumn("__Nb", F.expr("n_days * __Sty - __St * __Sy"))
    one = one.withColumn(
        "__garr",
        F.expr(
            "transform(sequence(1L, n_days), t ->"
            " cast(n_days * __D * element_at(__yarr, cast(t as int))"
            " - __D * __Sy + __Nb * __St - n_days * __Nb * t"
            " as double))"
        ),
    )
    one = (
        one
        .withColumn(
            "__Sg",
            F.expr(
                "aggregate(sequence(1L, n_days), 0.0D, (acc, t) ->"
                " acc + element_at(__garr, cast(t as int))"
                " * element_at(__garr, cast(t as int)))"
            ),
        )
        .withColumn(
            "__Stg",
            F.expr(
                "aggregate(sequence(1L, n_days), 0.0D, (acc, t) ->"
                " acc + cast(t as double)"
                " * element_at(__garr, cast(t as int))"
                " * element_at(__garr, cast(t as int)))"
            ),
        )
        .withColumn(
            "__Sgg",
            F.expr(
                "aggregate(sequence(1L, n_days), 0.0D, (acc, t) ->"
                " acc + element_at(__garr, cast(t as int))"
                " * element_at(__garr, cast(t as int))"
                " * element_at(__garr, cast(t as int))"
                " * element_at(__garr, cast(t as int)))"
            ),
        )
    )
    nd = F.col("n_days").cast("double")
    sxy = nd * F.col("__Stg") - F.col("__St").cast("double") * F.col(
        "__Sg"
    )
    sxx = F.col("__D").cast("double")
    syy = nd * F.col("__Sgg") - F.col("__Sg") * F.col("__Sg")
    one = one.filter(
        (F.col("n_days") > 2) & (F.col("__D") > 0) & (syy > 0.0)
    )
    r2 = sxy * sxy / (sxx * syy)
    lm = nd * r2
    return one.select(
        "n_days",
        _r6(r2).alias("r2_aux"),
        _r6(lm).alias("bp_lm"),
        (lm > F.lit(3.841)).alias("reject_5pct"),
        F.when(sxy > 0.0, F.lit("variance_increasing"))
        .when(sxy < 0.0, F.lit("variance_decreasing"))
        .otherwise(F.lit("flat"))
        .alias("direction"),
    )


SQL_BREUSCH_PAGAN = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy,
    list(y ORDER BY day) AS yarr
  FROM day
), mo AS (
  SELECT n, Sy, yarr,
    n * (n + 1) // 2 AS St,
    n * (n + 1) * (2 * n + 1) // 6 AS St2,
    list_sum(list_transform(range(1, n + 1),
      t -> t * yarr[t])) AS Sty
  FROM one
), dd AS (
  SELECT n, Sy, yarr, St, St2,
    n * St2 - St * St AS D,
    n * Sty - St * Sy AS Nb
  FROM mo
), ga AS (
  SELECT n, St, D,
    list_transform(range(1, n + 1),
      t -> CAST(n * D * yarr[t] - D * Sy + Nb * St - n * Nb * t
                AS DOUBLE)) AS garr
  FROM dd
), f AS (
  SELECT n, St, D,
    list_sum(list_transform(range(1, n + 1),
      t -> garr[t] * garr[t])) AS Sg,
    list_sum(list_transform(range(1, n + 1),
      t -> CAST(t AS DOUBLE) * garr[t] * garr[t])) AS Stg,
    list_sum(list_transform(range(1, n + 1),
      t -> garr[t] * garr[t] * garr[t] * garr[t])) AS Sgg
  FROM ga
), z AS (
  SELECT n,
    CAST(n AS DOUBLE) * Stg - CAST(St AS DOUBLE) * Sg AS sxy,
    CAST(D AS DOUBLE) AS sxx,
    CAST(n AS DOUBLE) * Sgg - Sg * Sg AS syy
  FROM f WHERE n > 2 AND D > 0
)
SELECT n AS n_days,
  round(sxy * sxy / (sxx * syy), 6) AS r2_aux,
  round(CAST(n AS DOUBLE) * sxy * sxy / (sxx * syy), 6) AS bp_lm,
  (CAST(n AS DOUBLE) * sxy * sxy / (sxx * syy) > 3.841)
    AS reject_5pct,
  CASE WHEN sxy > 0 THEN 'variance_increasing'
       WHEN sxy < 0 THEN 'variance_decreasing'
       ELSE 'flat' END AS direction
FROM z WHERE syy > 0
"""

QUERIES["breusch_pagan"] = q_breusch_pagan
_RAW_ORACLES["breusch_pagan"] = SQL_BREUSCH_PAGAN


def q_cronbach_alpha(spark, sf_dir):
    """Cronbach's alpha internal-consistency coefficient treating the
    5 event types as ITEMS and the calendar days as SUBJECTS
    (Cronbach Psychometrika 1951; Nunnally 1978 for the 0.7
    acceptance bar — the reliability audit that answers 'may I sum
    the per-type daily volumes into ONE activity score?': alpha near
    1 says the 5 per-type series co-move and a single composite
    feature is justified; alpha near 0 says they are independent
    channels and a sum would destroy signal — the feature-design
    gate before any rollup_activity-style composite, and the
    covariance-side complement to bartlett_test's variance check).
    Item scores x_{d,i} = count of type-i events on day d are exact
    longs from ONE conditional corpus aggregate (absent types
    contribute exact-zero columns); alpha = k/(k-1) * (1 - sum_i
    var_i / var_total) is computed from the exact-long moment
    identities (n*Q_i - S_i^2) and (n*Q_T - S_T^2) — the n(n-1)
    denominators cancel, so the whole statistic is ONE exact-long
    division; every double is one exact-long cast. k = 5 pinned
    (the corpus event-type alphabet). 2 shuffles at any corpus
    size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("__day"),
        "event_type",
    )
    types = ["click", "error", "purchase", "signup", "view"]
    aggs = []
    for i, t in enumerate(types):
        aggs.append(
            F.sum(
                F.when(F.col("event_type") == t, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias(f"__x{i}")
        )
    day = ev.groupBy("__day").agg(*aggs)
    tot = " + ".join(f"__x{i}" for i in range(len(types)))
    day = day.withColumn("__t", F.expr(tot))
    one_aggs = [F.count(F.lit(1)).cast("long").alias("n_days")]
    for i in range(len(types)):
        one_aggs.append(
            F.sum(f"__x{i}").cast("long").alias(f"__s{i}")
        )
        one_aggs.append(
            F.sum(F.col(f"__x{i}") * F.col(f"__x{i}"))
            .cast("long").alias(f"__q{i}")
        )
    one_aggs.append(F.sum("__t").cast("long").alias("__st"))
    one_aggs.append(
        F.sum(F.col("__t") * F.col("__t")).cast("long").alias("__qt")
    )
    one = day.agg(*one_aggs)
    item_num = " + ".join(
        f"(n_days * __q{i} - __s{i} * __s{i})"
        for i in range(len(types))
    )
    one = (
        one
        .withColumn("__inum", F.expr(item_num))
        .withColumn("__tden", F.expr("n_days * __qt - __st * __st"))
    )
    one = one.filter((F.col("n_days") > 1) & (F.col("__tden") > 0))
    k = float(len(types))
    ratio = F.col("__inum").cast("double") / F.col("__tden").cast(
        "double"
    )
    alpha = F.lit(k / (k - 1.0)) * (F.lit(1.0) - ratio)
    nn1 = (
        F.col("n_days").cast("double")
        * (F.col("n_days") - 1).cast("double")
    )
    return one.select(
        F.lit(int(k)).alias("k_items"),
        "n_days",
        _r6(F.col("__inum").cast("double") / nn1).alias(
            "sum_item_var"
        ),
        _r6(F.col("__tden").cast("double") / nn1).alias("total_var"),
        _r6(alpha).alias("alpha"),
        (alpha >= F.lit(0.7)).alias("acceptable"),
    )


SQL_CRONBACH_ALPHA = """
WITH day AS (
  SELECT day(ts) AS day,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS x0,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         AS BIGINT) AS x1,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS x2,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         AS BIGINT) AS x3,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS BIGINT) AS x4
  FROM events GROUP BY day(ts)
), d2 AS (
  SELECT *, x0 + x1 + x2 + x3 + x4 AS t FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x0) AS BIGINT) AS s0, CAST(sum(x0 * x0) AS BIGINT) AS q0,
    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x1 * x1) AS BIGINT) AS q1,
    CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(x2 * x2) AS BIGINT) AS q2,
    CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(x3 * x3) AS BIGINT) AS q3,
    CAST(sum(x4) AS BIGINT) AS s4, CAST(sum(x4 * x4) AS BIGINT) AS q4,
    CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS qt
  FROM d2
), f AS (
  SELECT n,
    (n * q0 - s0 * s0) + (n * q1 - s1 * s1) + (n * q2 - s2 * s2)
      + (n * q3 - s3 * s3) + (n * q4 - s4 * s4) AS inum,
    n * qt - st * st AS tden
  FROM one WHERE n > 1
)
SELECT 5 AS k_items, n AS n_days,
  round(CAST(inum AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
    AS sum_item_var,
  round(CAST(tden AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
    AS total_var,
  round(1.25 * (1.0 - CAST(inum AS DOUBLE) / CAST(tden AS DOUBLE)),
        6) AS alpha,
  (1.25 * (1.0 - CAST(inum AS DOUBLE) / CAST(tden AS DOUBLE))
   >= 0.7) AS acceptable
FROM f WHERE tden > 0
"""

QUERIES["cronbach_alpha"] = q_cronbach_alpha
_RAW_ORACLES["cronbach_alpha"] = SQL_CRONBACH_ALPHA


def q_pettitt_test(spark, sf_dir):
    """Pettitt's nonparametric change-point test on daily event
    volume (Pettitt Applied Statistics 1979 — THE single-changepoint
    screen for monitoring series: where cusum_changepoint needs a
    scale and page_hinkley a drift parameter, Pettitt asks the
    assumption-free question 'did the level of this series shift at
    some unknown day?' via a rank statistic, making it the standard
    first look before segmented_trend fits the two pieces). The
    statistic U_t = sum_{i<=t} sum_{j>t} sign(y_j - y_i) is an EXACT
    INTEGER for every split point t; the corpus is touched ONCE by
    the day aggregate and the <=31-element U array is a bounded
    nested fold on the 1-row frame (O(n^3) = 15k comparisons at
    n = 31 — constant work at any corpus size). K = max_t |U_t| with
    the EARLIEST-t tie-break via 1-based first-occurrence
    array_position on BOTH engines; the Pettitt approximation
    p = 2 exp(-6 K^2 / (n^3 + n^2)) is one exact-long division
    inside one exp. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__darr", F.expr("transform(__a, s -> s.__day)"))
        .withColumn(
            "__uarr",
            F.expr(
                "transform(sequence(1L, n_days - 1), t ->"
                " aggregate(sequence(1L, t), 0L, (ai, i) ->"
                "  ai + aggregate(sequence(t + 1, n_days), 0L,"
                "   (aj, j) -> aj + (CASE"
                "    WHEN element_at(__yarr, cast(j as int))"
                "       > element_at(__yarr, cast(i as int)) THEN 1L"
                "    WHEN element_at(__yarr, cast(j as int))"
                "       < element_at(__yarr, cast(i as int)) THEN -1L"
                "    ELSE 0L END))))"
            ),
        )
    )
    one = (
        one
        .withColumn(
            "__absu", F.expr("transform(__uarr, u -> abs(u))")
        )
        .withColumn("__k", F.expr("array_max(__absu)"))
        .withColumn(
            "__tstar",
            F.expr("array_position(__absu, __k)").cast("long"),
        )
    )
    one = one.filter((F.col("n_days") > 2) & (F.col("__k") > 0))
    uat = F.expr("element_at(__uarr, cast(__tstar as int))")
    p = F.lit(2.0) * F.exp(
        F.lit(-6.0) * (F.col("__k") * F.col("__k")).cast("double")
        / F.expr(
            "cast(n_days * n_days * n_days"
            " + n_days * n_days as double)"
        )
    )
    return one.select(
        "n_days",
        F.col("__k").alias("k_stat"),
        F.expr("element_at(__darr, cast(__tstar as int))")
        .alias("change_day"),
        uat.alias("u_at_k"),
        _r6(p).alias("p_approx"),
        (p < F.lit(0.05)).alias("significant_5pct"),
        F.when(uat > 0, F.lit("upward_shift"))
        .otherwise(F.lit("downward_shift"))
        .alias("direction"),
    )


SQL_PETTITT_TEST = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr,
    list(day ORDER BY day) AS darr
  FROM day
), ua AS (
  SELECT n, darr,
    list_transform(range(1, n), t ->
      list_sum(list_transform(range(1, t + 1), i ->
        list_sum(list_transform(range(t + 1, n + 1), j ->
          CASE WHEN yarr[j] > yarr[i] THEN 1
               WHEN yarr[j] < yarr[i] THEN -1
               ELSE 0 END))))) AS uarr
  FROM one
), kk AS (
  SELECT n, darr, uarr,
    list_transform(uarr, u -> abs(u)) AS absu
  FROM ua
), f AS (
  SELECT n, darr, uarr,
    list_max(absu) AS k,
    CAST(list_position(absu, list_max(absu)) AS BIGINT) AS tstar
  FROM kk
)
SELECT n AS n_days, k AS k_stat,
  darr[CAST(tstar AS INT)] AS change_day,
  uarr[CAST(tstar AS INT)] AS u_at_k,
  round(2.0 * exp(-6.0 * CAST(k * k AS DOUBLE)
        / CAST(n * n * n + n * n AS DOUBLE)), 6) AS p_approx,
  (2.0 * exp(-6.0 * CAST(k * k AS DOUBLE)
        / CAST(n * n * n + n * n AS DOUBLE)) < 0.05)
    AS significant_5pct,
  CASE WHEN uarr[CAST(tstar AS INT)] > 0 THEN 'upward_shift'
       ELSE 'downward_shift' END AS direction
FROM f WHERE n > 2 AND k > 0
"""

QUERIES["pettitt_test"] = q_pettitt_test
_RAW_ORACLES["pettitt_test"] = SQL_PETTITT_TEST


def q_cliffs_delta(spark, sf_dir):
    """Cliff's delta ordinal effect size for `value` between the two
    md5-parity user arms (Cliff Psychological Bulletin 1993; Romano
    et al. 2006 banding — the EFFECT-SIZE companion to the
    significance tests: srm_check/mantel_haenszel ask 'is the A/A
    split broken?', Cliff's delta asks 'by HOW MUCH do the two arms'
    value distributions differ?' on a pure ordinal scale that is
    immune to outliers and monotone transforms; hash-random arms
    make delta ~ 0 by construction, so a non-negligible band flags a
    broken assignment). delta = (P - Q) / (m*n) where P = #(a > b),
    Q = #(a < b) over all cross-arm pairs — computed WITHOUT the
    quadratic pair sweep: ONE conditional corpus aggregate groups the
    exact 2-decimal cents into the domain-bounded distinct-value
    frame (<=56k rows — bounded by the value range, like the <=31-day
    frames), a cumulative window over that frame yields
    #(b < c)/#(b > c) per value, and P/Q/T are EXACT-LONG sums of
    count products — delta, the tie-split probability of superiority
    (2P+T)/(2mn), and the banding are fixed expression trees with
    every double one exact-long cast. Romano bands |d| < 0.147
    negligible / < 0.33 small / < 0.474 medium pinned. 3 shuffles at
    any corpus size (corpus agg + domain-frame window + 1-row agg)."""
    ev = _events(spark, sf_dir).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("__c"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cd|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    g = ev.groupBy("__c").agg(
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0))
        .cast("long").alias("__na"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long").alias("__nb"),
    )
    w = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = g.withColumn(
        "__cumb", F.coalesce(F.sum("__nb").over(w), F.lit(0)).cast("long")
    )
    one = g.agg(
        F.sum("__na").cast("long").alias("__m"),
        F.sum("__nb").cast("long").alias("__n"),
        F.sum(F.col("__na") * F.col("__cumb")).cast("long")
        .alias("__p"),
        F.sum(F.col("__na") * F.col("__nb")).cast("long")
        .alias("__t"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    one = one.withColumn(
        "__q", F.expr("__m * __n - __p - __t")
    ).filter((F.col("__m") > 0) & (F.col("__n") > 0))
    mn = (F.col("__m") * F.col("__n")).cast("double")
    delta = (F.col("__p") - F.col("__q")).cast("double") / mn
    ad = F.abs(delta)
    return one.select(
        F.col("__m").alias("n_arm1"),
        F.col("__n").alias("n_arm0"),
        "n_values",
        F.col("__p").alias("gt_pairs"),
        F.col("__q").alias("lt_pairs"),
        F.col("__t").alias("tie_pairs"),
        _r6(delta).alias("cliffs_delta"),
        _r6(
            (2 * F.col("__p") + F.col("__t")).cast("double")
            / (F.lit(2.0) * mn)
        ).alias("p_superiority"),
        F.when(ad < 0.147, F.lit("negligible"))
        .when(ad < 0.33, F.lit("small"))
        .when(ad < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("band"),
    )


SQL_CLIFFS_DELTA = """
WITH ev AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
    CAST(('0x' || substring(md5('cd|' || CAST(user_id AS VARCHAR)),
      1, 15))::UBIGINT % 2 AS BIGINT) AS arm
  FROM events
), g AS (
  SELECT c,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM ev GROUP BY c
), cw AS (
  SELECT c, na, nb,
    CAST(coalesce(sum(nb) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cumb
  FROM g
), one AS (
  SELECT CAST(sum(na) AS BIGINT) AS m,
    CAST(sum(nb) AS BIGINT) AS n,
    CAST(sum(na * cumb) AS BIGINT) AS p,
    CAST(sum(na * nb) AS BIGINT) AS t,
    CAST(count(*) AS BIGINT) AS n_values
  FROM cw
), f AS (
  SELECT m, n, p, t, n_values, m * n - p - t AS q
  FROM one WHERE m > 0 AND n > 0
)
SELECT m AS n_arm1, n AS n_arm0, n_values,
  p AS gt_pairs, q AS lt_pairs, t AS tie_pairs,
  round(CAST(p - q AS DOUBLE) / CAST(m * n AS DOUBLE), 6)
    AS cliffs_delta,
  round(CAST(2 * p + t AS DOUBLE)
        / (2.0 * CAST(m * n AS DOUBLE)), 6) AS p_superiority,
  CASE WHEN abs(CAST(p - q AS DOUBLE) / CAST(m * n AS DOUBLE))
            < 0.147 THEN 'negligible'
       WHEN abs(CAST(p - q AS DOUBLE) / CAST(m * n AS DOUBLE))
            < 0.33 THEN 'small'
       WHEN abs(CAST(p - q AS DOUBLE) / CAST(m * n AS DOUBLE))
            < 0.474 THEN 'medium'
       ELSE 'large' END AS band
FROM f
"""

QUERIES["cliffs_delta"] = q_cliffs_delta
_RAW_ORACLES["cliffs_delta"] = SQL_CLIFFS_DELTA


def q_grubbs_test(spark, sf_dir):
    """Grubbs' maximum-studentized-deviation outlier test on the
    daily event volumes (Grubbs Technometrics 1969; critical value
    from the NIST/SEMATECH e-Handbook table — the single-outlier
    screen that anomaly_mad's robust z-scores deliberately avoid
    being: Grubbs is the classical NORMAL-theory test whose verdict
    auditors expect next to the MAD flags, and disagreement between
    the two is itself a distribution-shape signal, cf. jarque_bera).
    G = max_t |y_t - ybar| / s with the deviation numerators
    |n*y_t - Sy| EXACT LONGS (so the argmax and its EARLIEST-day
    tie-break are exact integer comparisons via array_position), and
    G = maxnum / (n * s) where s = sqrt((n*Syy - Sy^2)/(n(n-1))) is
    one IEEE-exact sqrt of one exact-long division — every double
    one exact-long cast. Two-sided 5% critical value at the 30-day
    test frame pinned: 2.908 (NIST table, n = 30). 2 shuffles at
    any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__Syy"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn(
            "__num",
            F.expr("transform(__a, s -> abs(n_days * s.__y - __Sy))"),
        )
        .withColumn("__mx", F.expr("array_max(__num)"))
        .withColumn(
            "__i",
            F.expr("array_position(__num, __mx)").cast("int"),
        )
        .withColumn("__ss", F.expr("n_days * __Syy - __Sy * __Sy"))
    )
    one = one.filter((F.col("n_days") > 2) & (F.col("__ss") > 0))
    nd = F.col("n_days").cast("double")
    s = F.sqrt(
        F.col("__ss").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    g = F.col("__mx").cast("double") / (nd * s)
    ystar = F.expr("element_at(__a, __i).__y")
    return one.select(
        "n_days",
        F.expr("element_at(__a, __i).__day").alias("outlier_day"),
        ystar.alias("outlier_value"),
        _r6(F.col("__Sy").cast("double") / nd).alias("mean_volume"),
        _r6(s).alias("sd_volume"),
        _r6(g).alias("g_stat"),
        (g > F.lit(2.908)).alias("reject_5pct"),
        F.when(
            (nd * ystar.cast("double"))
            > F.col("__Sy").cast("double"),
            F.lit("high"),
        ).otherwise(F.lit("low")).alias("side"),
    )


SQL_GRUBBS_TEST = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy,
    CAST(sum(y * y) AS BIGINT) AS Syy,
    list(day ORDER BY day) AS darr,
    list(y ORDER BY day) AS yarr
  FROM day
), nu AS (
  SELECT n, Sy, Syy, darr, yarr,
    list_transform(yarr, y -> abs(n * y - Sy)) AS num,
    n * Syy - Sy * Sy AS ss
  FROM one
), f AS (
  SELECT n, Sy, darr, yarr, ss,
    list_max(num) AS mx,
    list_position(num, list_max(num)) AS i
  FROM nu WHERE n > 2 AND ss > 0
)
SELECT n AS n_days,
  darr[i] AS outlier_day,
  yarr[i] AS outlier_value,
  round(CAST(Sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_volume,
  round(sqrt(CAST(ss AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
    AS sd_volume,
  round(CAST(mx AS DOUBLE) / (CAST(n AS DOUBLE)
        * sqrt(CAST(ss AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))), 6)
    AS g_stat,
  (CAST(mx AS DOUBLE) / (CAST(n AS DOUBLE)
        * sqrt(CAST(ss AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) > 2.908)
    AS reject_5pct,
  CASE WHEN CAST(n AS DOUBLE) * CAST(yarr[i] AS DOUBLE)
            > CAST(Sy AS DOUBLE) THEN 'high'
       ELSE 'low' END AS side
FROM f
"""

QUERIES["grubbs_test"] = q_grubbs_test
_RAW_ORACLES["grubbs_test"] = SQL_GRUBBS_TEST


def q_taylor_law(spark, sf_dir):
    """Taylor's power law exponent for event volume across the 24
    hour-of-day groups (Taylor Nature 1961; Eisler et al. Adv. Phys.
    2008 for the fluctuation-scaling reading — the cross-GROUP
    burstiness audit beside nb_dispersion's single-series check: for
    each hour-of-day, the mean and variance of that hour's daily
    count are one point on the log-log plane; the OLS slope b of
    ln var on ln mean is the scaling exponent — b = 1 is Poisson
    arrivals, b -> 2 means bursty/aggregated traffic whose hot hours
    get MORE than proportionally noisier, which decides whether
    per-hour capacity must be provisioned on mean or on mean^b).
    The corpus is touched ONCE by the (day, hour) cell aggregate — a
    <=744-row frame bounded by the calendar, like the <=31-day
    frames — collected sorted into ONE row; n_days, the per-hour
    sums S_h and square-sums Q_h are exact longs via bounded nested
    folds, each variance (n*Q_h - S_h^2)/(n(n-1)) and mean S_h/n is
    one exact division, and the log-log OLS moments fold
    hour-ascending on BOTH engines. Verdict bands pinned at 0.8/1.2.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
    )
    cell = ev.groupBy("__day", "__h").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    one = cell.agg(
        F.array_sort(
            F.collect_list(F.struct("__day", "__h", "__c"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__nd",
        F.expr(
            "cast(size(array_distinct(transform(__a, x -> x.__day)))"
            " as long)"
        ),
    )
    # per-hour (S_h, Q_h) as exact longs; keep hours with a defined,
    # positive variance and positive mean (ln needs both)
    one = one.withColumn(
        "__hs",
        F.expr(
            "filter(transform(sequence(0L, 23L), h -> struct("
            " h as h,"
            " aggregate(__a, 0L, (acc, x) ->"
            "  acc + IF(x.__h = h, x.__c, 0L)) as s,"
            " aggregate(__a, 0L, (acc, x) ->"
            "  acc + IF(x.__h = h, x.__c * x.__c, 0L)) as q)),"
            " p -> p.s > 0 AND __nd * p.q - p.s * p.s > 0)"
        ),
    )
    one = one.withColumn(
        "__pts",
        F.expr(
            "transform(__hs, p -> struct("
            " ln(cast(p.s as double) / cast(__nd as double)) as x,"
            " ln(cast(__nd * p.q - p.s * p.s as double)"
            "  / (cast(__nd as double) * cast(__nd - 1 as double)))"
            "  as y))"
        ),
    ).withColumn("__k", F.expr("cast(size(__pts) as long)"))

    def fold(term):
        return F.expr(
            "aggregate(__pts, 0.0D, (acc, p) -> acc + (" + term + "))"
        )

    one = (
        one
        .withColumn("__sx", fold("p.x"))
        .withColumn("__sy", fold("p.y"))
        .withColumn("__sxy", fold("p.x * p.y"))
        .withColumn("__sxx", fold("p.x * p.x"))
        .withColumn("__syy", fold("p.y * p.y"))
    )
    one = one.filter((F.col("__nd") > 1) & (F.col("__k") > 2))
    kd = F.col("__k").cast("double")
    dxy = kd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dxx = kd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dyy = kd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    one = one.filter((dxx > 0.0) & (dyy > 0.0))
    b = dxy / dxx
    a = (F.col("__sy") - b * F.col("__sx")) / kd
    r2 = dxy * dxy / (dxx * dyy)
    return one.select(
        F.col("__nd").alias("n_days"),
        F.col("__k").alias("n_hours"),
        _r6(b).alias("taylor_b"),
        _r6(a).alias("ln_a"),
        _r6(r2).alias("r2"),
        F.when(b > 1.2, F.lit("aggregated"))
        .when(b < 0.8, F.lit("underdispersed"))
        .otherwise(F.lit("poisson_like"))
        .alias("verdict"),
    )


SQL_TAYLOR_LAW = """
WITH cell AS (
  SELECT day(ts) AS day, hour(ts) AS h,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY day(ts), hour(ts)
), one AS (
  SELECT list({'h': h, 'c': c} ORDER BY day, h) AS a,
    CAST(count(DISTINCT day) AS BIGINT) AS nd
  FROM cell
), hs AS (
  SELECT nd,
    list_filter(
      list_transform(range(0, 24), h -> {
        's': list_sum(list_transform(a,
          x -> CASE WHEN x.h = h THEN x.c ELSE 0 END)),
        'q': list_sum(list_transform(a,
          x -> CASE WHEN x.h = h THEN x.c * x.c ELSE 0 END))}),
      p -> p.s > 0 AND nd * p.q - p.s * p.s > 0) AS hsl
  FROM one
), pts AS (
  SELECT nd,
    list_transform(hsl, p -> {
      'x': ln(CAST(p.s AS DOUBLE) / CAST(nd AS DOUBLE)),
      'y': ln(CAST(nd * p.q - p.s * p.s AS DOUBLE)
         / (CAST(nd AS DOUBLE) * CAST(nd - 1 AS DOUBLE)))}) AS pl,
    CAST(len(hsl) AS BIGINT) AS k
  FROM hs
), mo AS (
  SELECT nd, k,
    list_sum(list_transform(pl, p -> p.x)) AS sx,
    list_sum(list_transform(pl, p -> p.y)) AS sy,
    list_sum(list_transform(pl, p -> p.x * p.y)) AS sxy,
    list_sum(list_transform(pl, p -> p.x * p.x)) AS sxx,
    list_sum(list_transform(pl, p -> p.y * p.y)) AS syy
  FROM pts WHERE nd > 1 AND k > 2
), f AS (
  SELECT nd, k,
    CAST(k AS DOUBLE) * sxy - sx * sy AS dxy,
    CAST(k AS DOUBLE) * sxx - sx * sx AS dxx,
    CAST(k AS DOUBLE) * syy - sy * sy AS dyy,
    sx, sy
  FROM mo
)
SELECT nd AS n_days, k AS n_hours,
  round(dxy / dxx, 6) AS taylor_b,
  round((sy - (dxy / dxx) * sx) / CAST(k AS DOUBLE), 6) AS ln_a,
  round(dxy * dxy / (dxx * dyy), 6) AS r2,
  CASE WHEN dxy / dxx > 1.2 THEN 'aggregated'
       WHEN dxy / dxx < 0.8 THEN 'underdispersed'
       ELSE 'poisson_like' END AS verdict
FROM f WHERE dxx > 0 AND dyy > 0
"""

QUERIES["taylor_law"] = q_taylor_law
_RAW_ORACLES["taylor_law"] = SQL_TAYLOR_LAW


def q_sample_entropy(spark, sf_dir):
    """Sample entropy of the daily event-volume series at embedding
    m = 2 and tolerance r = 0.5 * SD (Richman & Moorman Am. J.
    Physiol. 2000; the tolerance sits above the classic 0.1-0.25*SD
    band on purpose — Yentes et al. Ann. Biomed. Eng. 2013 show that
    for VERY SHORT series (here n = 30 days) small r starves the
    m+1 template count and SampEn degenerates, so the short-series
    guidance is a wider r — the amplitude-aware regularity twin of
    perm_entropy's ordinal measure: SampEn = -ln(A/B) where B counts
    length-2 template matches under the Chebyshev tolerance and A
    counts their length-3 extensions; low SampEn means today's
    volume pattern keeps repeating (forecastable, cacheable), high
    SampEn means template matches die out (provision for surprise) —
    and unlike the original ApEn it is self-match-free and nearly
    length-unbiased, which is why it is the monitoring default).
    Daily counts are exact longs; distances |y_i - y_j| are exact
    integers, the tolerance rr = 0.2 * s is ONE deterministic IEEE
    product of the exact-moment sqrt, so every <=378-pair template
    comparison is the identical float comparison on BOTH engines and
    A, B are EXACT LONGS from bounded nested folds on the 1-row
    frame; SampEn = ln(B) - ln(A) on exact-long casts. Bands 0.5/1.5
    pinned. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__Syy"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__ss", F.expr("n_days * __Syy - __Sy * __Sy"))
    )
    one = one.filter((F.col("n_days") > 4) & (F.col("__ss") > 0))
    nd = F.col("n_days").cast("double")
    s = F.sqrt(
        F.col("__ss").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    one = one.withColumn("__rr", F.lit(0.5) * s)
    # M = n - 2 templates; B: 2-matches, A: 3-matches, pairs i < j
    dij = (
        "cast(abs(element_at(__yarr, cast(i {o} as int))"
        " - element_at(__yarr, cast(j {o} as int))) as double)"
    )
    d0 = dij.format(o="+ 0")
    d1 = dij.format(o="+ 1")
    d2 = dij.format(o="+ 2")
    one = (
        one
        .withColumn(
            "__b",
            F.expr(
                "aggregate(sequence(1L, n_days - 3), 0L, (ai, i) ->"
                " ai + aggregate(sequence(i + 1, n_days - 2), 0L,"
                f" (aj, j) -> aj + IF({d0} <= __rr AND {d1} <= __rr,"
                " 1L, 0L)))"
            ),
        )
        .withColumn(
            "__aa",
            F.expr(
                "aggregate(sequence(1L, n_days - 3), 0L, (ai, i) ->"
                " ai + aggregate(sequence(i + 1, n_days - 2), 0L,"
                f" (aj, j) -> aj + IF({d0} <= __rr AND {d1} <= __rr"
                f" AND {d2} <= __rr, 1L, 0L)))"
            ),
        )
    )
    one = one.filter((F.col("__b") > 0) & (F.col("__aa") > 0))
    sampen = F.log(F.col("__b").cast("double")) - F.log(
        F.col("__aa").cast("double")
    )
    return one.select(
        "n_days",
        _r6(F.col("__rr")).alias("r_tol"),
        F.col("__b").alias("b_count"),
        F.col("__aa").alias("a_count"),
        _r6(sampen).alias("sampen"),
        F.when(sampen < 0.5, F.lit("regular"))
        .when(sampen > 1.5, F.lit("complex"))
        .otherwise(F.lit("moderate"))
        .alias("band"),
    )


SQL_SAMPLE_ENTROPY = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy,
    CAST(sum(y * y) AS BIGINT) AS Syy,
    list(y ORDER BY day) AS yarr
  FROM day
), pre AS (
  SELECT n, yarr, n * Syy - Sy * Sy AS ss
  FROM one WHERE n > 4 AND n * Syy - Sy * Sy > 0
), rr AS (
  SELECT n, yarr,
    0.5 * sqrt(CAST(ss AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS r
  FROM pre
), cnt AS (
  SELECT n, r,
    list_sum(list_transform(range(1, n - 2), i ->
      list_sum(list_transform(range(i + 1, n - 1), j ->
        CASE WHEN CAST(abs(yarr[i] - yarr[j]) AS DOUBLE) <= r
          AND CAST(abs(yarr[i + 1] - yarr[j + 1]) AS DOUBLE) <= r
        THEN 1 ELSE 0 END)))) AS b,
    list_sum(list_transform(range(1, n - 2), i ->
      list_sum(list_transform(range(i + 1, n - 1), j ->
        CASE WHEN CAST(abs(yarr[i] - yarr[j]) AS DOUBLE) <= r
          AND CAST(abs(yarr[i + 1] - yarr[j + 1]) AS DOUBLE) <= r
          AND CAST(abs(yarr[i + 2] - yarr[j + 2]) AS DOUBLE) <= r
        THEN 1 ELSE 0 END)))) AS a
  FROM rr
)
SELECT n AS n_days,
  round(r, 6) AS r_tol,
  CAST(b AS BIGINT) AS b_count,
  CAST(a AS BIGINT) AS a_count,
  round(ln(CAST(b AS DOUBLE)) - ln(CAST(a AS DOUBLE)), 6) AS sampen,
  CASE WHEN ln(CAST(b AS DOUBLE)) - ln(CAST(a AS DOUBLE)) < 0.5
         THEN 'regular'
       WHEN ln(CAST(b AS DOUBLE)) - ln(CAST(a AS DOUBLE)) > 1.5
         THEN 'complex'
       ELSE 'moderate' END AS band
FROM cnt WHERE b > 0 AND a > 0
"""

QUERIES["sample_entropy"] = q_sample_entropy
_RAW_ORACLES["sample_entropy"] = SQL_SAMPLE_ENTROPY


def q_spectral_entropy(spark, sf_dir):
    """Normalized spectral entropy and Wiener spectral flatness of
    the daily event-volume series over the half-spectrum k = 1 ..
    floor((n-1)/2) (Powell & Percival J. Phys. A 1979 for spectral
    entropy; Gray & Markel 1974 for flatness — the ONE-NUMBER summary
    of dft_periodogram's per-k shares: H near 1 means power is spread
    flat across frequencies (white/broadband volume — no cycle worth
    modeling), H near 0 means power concentrates in few lines (a
    strong weekly/daily cycle that a seasonal feature must absorb);
    flatness is the geometric/arithmetic mean ratio reading of the
    same spectrum). Reuses dft_periodogram's conventions: the corpus
    is touched ONCE by the day aggregate, the mean is removed exactly
    via the integer identity n*y_t - S inside the trig folds, every
    fold (the per-k C/S sums over t, the total-power sum over k, the
    entropy and log-flatness sums over k) runs ASCENDING on BOTH
    engines, and cos/sin follow the catalog's cross-engine libm
    precedent. H is normalized by ln(m). Bands 0.6/0.9 pinned.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.array_sort(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__s"),
    ).select(
        F.expr("transform(__a, e -> e.__y)").alias("__ys"),
        "n_days", "__s",
    )
    one = one.withColumn(
        "__m", F.expr("(n_days - 1) div 2")
    ).filter((F.col("n_days") > 6) & (F.col("__m") > 1))
    trig = (
        "aggregate(sequence(1L, n_days), 0.0D, (acc, t) -> acc"
        " + cast(n_days * element_at(__ys, cast(t as int)) - __s"
        " as double)"
        " * {fn}(6.283185307179586D * cast(k as double)"
        " * cast(t as double) / cast(n_days as double)))"
    )
    ck = trig.format(fn="cos")
    sk = trig.format(fn="sin")
    one = one.withColumn(
        "__p",
        F.expr(
            "transform(sequence(1L, __m), k ->"
            f" ({ck}) * ({ck}) + ({sk}) * ({sk}))"
        ),
    )
    one = one.withColumn(
        "__tot",
        F.expr("aggregate(__p, 0.0D, (acc, p) -> acc + p)"),
    ).filter(F.col("__tot") > 0.0)
    one = (
        one
        .withColumn(
            "__h",
            F.expr(
                "-aggregate(__p, 0.0D, (acc, p) -> acc"
                " + IF(p > 0.0D, (p / __tot) * ln(p / __tot),"
                " 0.0D)) / ln(cast(__m as double))"
            ),
        )
        .withColumn(
            "__lnf",
            F.expr(
                "aggregate(__p, 0.0D, (acc, p) -> acc + ln(p))"
                " / cast(__m as double)"
            ),
        )
    )
    flat = F.exp(F.col("__lnf")) / (
        F.col("__tot") / F.col("__m").cast("double")
    )
    h = F.col("__h")
    return one.select(
        "n_days",
        F.col("__m").alias("n_freqs"),
        _r6(h).alias("spectral_entropy"),
        _r6(flat).alias("spectral_flatness"),
        F.when(h > 0.9, F.lit("broadband_noise"))
        .when(h < 0.6, F.lit("strongly_periodic"))
        .otherwise(F.lit("mixed"))
        .alias("band"),
    )


SQL_SPECTRAL_ENTROPY = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(y ORDER BY x) AS ys, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS s
  FROM day
), mm AS (
  SELECT ys, n, s, (n - 1) // 2 AS m
  FROM one WHERE n > 6 AND (n - 1) // 2 > 1
), pw AS (
  SELECT n, m,
    list_transform(range(1, m + 1), k ->
      list_reduce(list_transform(range(1, n + 1), t ->
        CAST(n * ys[t] - s AS DOUBLE)
        * cos(6.283185307179586 * CAST(k AS DOUBLE)
          * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))),
        (a, b) -> a + b)
      * list_reduce(list_transform(range(1, n + 1), t ->
        CAST(n * ys[t] - s AS DOUBLE)
        * cos(6.283185307179586 * CAST(k AS DOUBLE)
          * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))),
        (a, b) -> a + b)
      + list_reduce(list_transform(range(1, n + 1), t ->
        CAST(n * ys[t] - s AS DOUBLE)
        * sin(6.283185307179586 * CAST(k AS DOUBLE)
          * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))),
        (a, b) -> a + b)
      * list_reduce(list_transform(range(1, n + 1), t ->
        CAST(n * ys[t] - s AS DOUBLE)
        * sin(6.283185307179586 * CAST(k AS DOUBLE)
          * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))),
        (a, b) -> a + b)) AS p
  FROM mm
), tt AS (
  SELECT n, m, p,
    list_reduce(p, (a, b) -> a + b) AS tot
  FROM pw
), f AS (
  SELECT n, m, tot,
    -list_sum(list_transform(p, q ->
      CASE WHEN q > 0 THEN (q / tot) * ln(q / tot)
           ELSE 0.0 END)) / ln(CAST(m AS DOUBLE)) AS h,
    list_sum(list_transform(p, q -> ln(q)))
      / CAST(m AS DOUBLE) AS lnf
  FROM tt WHERE tot > 0
)
SELECT n AS n_days, m AS n_freqs,
  round(h, 6) AS spectral_entropy,
  round(exp(lnf) / (tot / CAST(m AS DOUBLE)), 6)
    AS spectral_flatness,
  CASE WHEN h > 0.9 THEN 'broadband_noise'
       WHEN h < 0.6 THEN 'strongly_periodic'
       ELSE 'mixed' END AS band
FROM f
"""

QUERIES["spectral_entropy"] = q_spectral_entropy
_RAW_ORACLES["spectral_entropy"] = SQL_SPECTRAL_ENTROPY


def q_adamic_adar(spark, sf_dir):
    """Top-12 Adamic-Adar link predictions over the co-order part
    graph (operators/graph.py adamic_adar; Adamic & Adar 2003,
    Liben-Nowell & Kleinberg 2003): non-edge part pairs ranked by
    sum 1/ln(deg z) over common neighbors — "items that should
    co-occur but don't yet", the candidate-generation channel beside
    basket_lift's observed pairs. Gated on the l_partkey % 4 == 0
    subgraph (the graph_triangles fixture convention) to bound the
    toy-scale wedge volume; per-pair weight folds are neighbor-id
    sorted on BOTH engines, counts exact longs, top-k a
    TakeOrderedAndProject with (aa DESC, x, y) tie-break."""
    from mpds_spark.operators.graph import (
        adamic_adar,
        co_occurrence_edges,
    )

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    edges = co_occurrence_edges(
        li, basket="l_orderkey", item="l_partkey"
    )
    out = adamic_adar(edges, k=12)
    return out.select(
        F.col("x").alias("part_a"),
        F.col("y").alias("part_b"),
        "common_neighbors",
        _r6("aa").alias("aa"),
    )


SQL_ADAMIC_ADAR = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_partkey % 4 = 0
), e AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
), sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg
  FROM sym GROUP BY src
), w AS (
  SELECT a1.src AS z, a1.dst AS x, a2.dst AS y, deg.deg AS deg
  FROM sym a1
  JOIN sym a2 ON a1.src = a2.src AND a1.dst < a2.dst
  JOIN deg ON deg.src = a1.src
), cand AS (
  SELECT z, x, y, deg FROM w
  WHERE NOT EXISTS (
    SELECT 1 FROM e WHERE e.a = w.x AND e.b = w.y)
), p AS (
  SELECT x, y,
    CAST(count(*) AS BIGINT) AS common_neighbors,
    list_sum(list(1.0 / ln(CAST(deg AS DOUBLE)) ORDER BY z)) AS aa
  FROM cand GROUP BY x, y
)
SELECT x AS part_a, y AS part_b, common_neighbors,
  round(aa, 6) AS aa
FROM p
ORDER BY aa DESC, x, y
LIMIT 12
"""

QUERIES["adamic_adar"] = q_adamic_adar
_RAW_ORACLES["adamic_adar"] = SQL_ADAMIC_ADAR


def q_hits_scores(spark, sf_dir):
    """Top-10 hubs and top-10 authorities of the customer -> part
    purchase graph by exact-integer unnormalized HITS, two full
    sweeps (operators/graph.py hits_bipartite; Kleinberg JACM 1999):
    round-2 authority = number of directed 3-paths into the part,
    hubs the buyers those paths route through — the bipartite
    reinforcement ranking beside pagerank_iter's undirected
    centrality, and the path-count formulation keeps EVERY score an
    exact long (integer sums are order-independent, so the float
    normalization that no engine pins never happens; the reported
    score_norm divides by the side's max — one exact-long division).
    Gated on l_partkey % 4 == 0; per-side top-10 are
    TakeOrderedAndProject with (score DESC, node) tie-break."""
    from mpds_spark.operators.graph import hits_bipartite

    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    edges = (
        od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            F.col("l_partkey").alias("dst"),
        )
        .distinct()
    )
    out = hits_bipartite(edges, n_rounds=2)
    auth = (
        out.filter(F.col("side") == "authority")
        .orderBy(F.desc("score"), "node")
        .limit(10)
    )
    hub = (
        out.filter(F.col("side") == "hub")
        .orderBy(F.desc("score"), "node")
        .limit(10)
    )
    return auth.unionAll(hub).select(
        "side", "node", "score", _r6("score_norm").alias("score_norm")
    )


SQL_HITS_SCORES = """
WITH e AS (
  SELECT DISTINCT o_custkey AS src, l_partkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_partkey % 4 = 0
), a1 AS (
  SELECT dst, CAST(count(*) AS BIGINT) AS a
  FROM e GROUP BY dst
), h1 AS (
  SELECT src, CAST(sum(a) AS BIGINT) AS h
  FROM e JOIN a1 USING (dst) GROUP BY src
), a2 AS (
  SELECT dst, CAST(sum(h) AS BIGINT) AS a
  FROM e JOIN h1 USING (src) GROUP BY dst
), h2 AS (
  SELECT src, CAST(sum(a) AS BIGINT) AS h
  FROM e JOIN a2 USING (dst) GROUP BY src
), am AS (SELECT max(a) AS m FROM a2),
hm AS (SELECT max(h) AS m FROM h2),
top_a AS (
  SELECT 'authority' AS side, dst AS node, a AS score,
    round(CAST(a AS DOUBLE) / CAST((SELECT m FROM am) AS DOUBLE), 6)
      AS score_norm
  FROM a2 ORDER BY a DESC, dst LIMIT 10
), top_h AS (
  SELECT 'hub' AS side, src AS node, h AS score,
    round(CAST(h AS DOUBLE) / CAST((SELECT m FROM hm) AS DOUBLE), 6)
      AS score_norm
  FROM h2 ORDER BY h DESC, src LIMIT 10
)
SELECT * FROM top_a
UNION ALL
SELECT * FROM top_h
"""

QUERIES["hits_scores"] = q_hits_scores
_RAW_ORACLES["hits_scores"] = SQL_HITS_SCORES


def q_ndcg_eval(spark, sf_dir):
    """NDCG@10 of the revenue-based part ranking under a temporal
    split (Järvelin & Kekäläinen TOIS 2002 — THE graded ranking
    metric: rank parts by first-period revenue (orders before
    1998-07-01), score the ranking against SECOND-period revenue as
    graded relevance; nDCG near 1 says yesterday's bestseller list
    still explains tomorrow's demand, the ranking-quality twin of
    mase_eval's magnitude check and the offline gate for any
    popularity-seeded recommender). Per-part period revenues are
    exact cents from ONE corpus aggregate; both the ranking top-10
    and the ideal top-10 are TakeOrderedAndProject heaps with exact
    (cents DESC, part) tie-breaks; DCG = sum rel_i/(ln(i+1)/ln 2)
    folds RANK-ASCENDING over the collected <=10-element arrays on
    BOTH engines, each rel one exact-cents division. Also reports
    the train/ideal top-10 overlap (exact long — the 'stability'
    reading). 100-TB shape: the heaps never sort the part frame."""
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate").cast("timestamp")
         < F.lit("1998-07-01").cast("timestamp")).alias("__first"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    cell = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("__first"),
                    F.floor(F.col("l_extendedprice") * 100
                            + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("__r1"),
            F.sum(
                F.when(
                    ~F.col("__first"),
                    F.floor(F.col("l_extendedprice") * 100
                            + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("__r2"),
        )
    )
    from mpds_spark.operators.util import scratch_persist

    cell = scratch_persist(cell)
    top_train = (
        cell.filter(F.col("__r1") > 0)
        .orderBy(F.desc("__r1"), "l_partkey")
        .limit(10)
    )
    top_ideal = (
        cell.orderBy(F.desc("__r2"), "l_partkey").limit(10)
    )
    n_parts = cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )

    # rank order keys: train ranking by (-r1, part); ideal by (-r2, part)
    t1 = top_train.select(
        F.col("l_partkey"),
        F.col("__r1"),
        F.col("__r2"),
    ).withColumn("__ord", F.struct((-F.col("__r1")).alias("k"),
                                   F.col("l_partkey").alias("p")))
    one_t = t1.agg(
        F.array_sort(
            F.collect_list(F.struct("__ord", "__r2", "l_partkey"))
        ).alias("__a"),
        F.collect_set("l_partkey").alias("__train_set"),
    )
    t2 = top_ideal.select("l_partkey", "__r2").withColumn(
        "__ord", F.struct((-F.col("__r2")).alias("k"),
                          F.col("l_partkey").alias("p"))
    )
    one_i = t2.agg(
        F.array_sort(
            F.collect_list(F.struct("__ord", "__r2", "l_partkey"))
        ).alias("__b"),
        F.collect_set("l_partkey").alias("__ideal_set"),
    )
    dcg_fold = (
        "aggregate(sequence(1, cast(size({arr}) as int)), 0.0D,"
        " (acc, i) -> acc"
        " + (cast(element_at({arr}, i).__r2 as double) / 100.0D)"
        " / (ln(cast(i + 1 as double)) / ln(2.0D)))"
    )
    f = one_t.crossJoin(F.broadcast(one_i)).crossJoin(
        F.broadcast(n_parts)
    )
    f = (
        f
        .withColumn("__dcg", F.expr(dcg_fold.format(arr="__a")))
        .withColumn("__idcg", F.expr(dcg_fold.format(arr="__b")))
        .withColumn(
            "__ov",
            F.expr(
                "cast(size(array_intersect(__train_set, __ideal_set))"
                " as long)"
            ),
        )
    )
    f = f.filter(F.col("__idcg") > 0.0)
    return f.select(
        F.lit(10).alias("k"),
        "n_parts",
        _r6(F.col("__dcg")).alias("dcg"),
        _r6(F.col("__idcg")).alias("idcg"),
        _r6(F.col("__dcg") / F.col("__idcg")).alias("ndcg"),
        F.col("__ov").alias("top10_overlap"),
    )


SQL_NDCG_EVAL = """
WITH cell AS (
  SELECT l_partkey,
    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01'
      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS r2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey
), tt AS (
  SELECT l_partkey, r2,
    row_number() OVER (ORDER BY r1 DESC, l_partkey) AS i
  FROM cell WHERE r1 > 0
  ORDER BY r1 DESC, l_partkey LIMIT 10
), ti AS (
  SELECT l_partkey, r2,
    row_number() OVER (ORDER BY r2 DESC, l_partkey) AS i
  FROM cell
  ORDER BY r2 DESC, l_partkey LIMIT 10
), d AS (
  SELECT
    list_sum(list(
      (CAST(r2 AS DOUBLE) / 100.0)
      / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0)) ORDER BY i)) AS dcg
  FROM tt
), di AS (
  SELECT
    list_sum(list(
      (CAST(r2 AS DOUBLE) / 100.0)
      / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0)) ORDER BY i)) AS idcg
  FROM ti
), ov AS (
  SELECT CAST(count(*) AS BIGINT) AS overlap
  FROM tt JOIN ti USING (l_partkey)
), np AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts FROM cell
)
SELECT 10 AS k, np.n_parts,
  round(d.dcg, 6) AS dcg,
  round(di.idcg, 6) AS idcg,
  round(d.dcg / di.idcg, 6) AS ndcg,
  ov.overlap AS top10_overlap
FROM d, di, ov, np
WHERE di.idcg > 0
"""

QUERIES["ndcg_eval"] = q_ndcg_eval
_RAW_ORACLES["ndcg_eval"] = SQL_NDCG_EVAL


def q_mrr_eval(spark, sf_dir):
    """Mean reciprocal rank @ 20 of per-customer part rankings under
    the same temporal split as ndcg_eval (Voorhees TREC-8 1999 — the
    per-USER counterpart to ndcg_eval's global ranking: for each
    customer, rank the parts they bought before 1998-07-01 by spend;
    the target is their single top part AFTER the split; RR = 1/rank
    of the target in that list, 0 on a miss — the offline
    personalization gate). EVERY aggregate is exact: per-(customer,
    part) period spends are exact cents, the target and the rank are
    exact integer comparisons with (cents DESC, part) tie-breaks,
    ranks are capped at 20 and the MRR float sum is NOT folded over
    users — users are first grouped BY RANK (<=21 groups), so
    MRR = sum_r count_r/r folds RANK-ASCENDING over a bounded frame
    on BOTH engines. Also reports hits@1/5/10 and the hit rate.
    100-TB shape: two customer-keyed aggs + one bounded-frame fold;
    no window over the part dimension, no global sort."""
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_orderdate").cast("timestamp")
         < F.lit("1998-07-01").cast("timestamp")).alias("__first"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    cell = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("__first"),
                    F.floor(F.col("l_extendedprice") * 100
                            + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("__c1"),
            F.sum(
                F.when(
                    ~F.col("__first"),
                    F.floor(F.col("l_extendedprice") * 100
                            + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("__c2"),
        )
    )
    # one customer-keyed agg: target (max c2, part tie-break) and the
    # sorted first-half cells in one pass
    per_user = cell.groupBy("o_custkey").agg(
        F.max(
            F.when(
                F.col("__c2") > 0,
                F.struct(
                    F.col("__c2").alias("c2"),
                    (-F.col("l_partkey")).alias("np"),
                ),
            )
        ).alias("__tgt"),
        F.collect_list(
            F.when(
                F.col("__c1") > 0,
                F.struct(
                    F.col("__c1").alias("c1"),
                    F.col("l_partkey").alias("p"),
                ),
            )
        ).alias("__fh"),
    )
    per_user = per_user.filter(F.col("__tgt").isNotNull())
    # rank of target within the first-half list: 1 + #(strictly better)
    per_user = per_user.withColumn(
        "__tp", F.expr("-__tgt.np")
    ).withColumn(
        "__tc1",
        F.expr(
            "aggregate(__fh, 0L, (acc, x) ->"
            " acc + IF(x IS NOT NULL AND x.p = __tp, x.c1, 0L))"
        ),
    )
    per_user = per_user.withColumn(
        "__rank",
        F.when(
            F.col("__tc1") > 0,
            F.expr(
                "1L + aggregate(__fh, 0L, (acc, x) ->"
                " acc + IF(x IS NOT NULL AND (x.c1 > __tc1 OR"
                " (x.c1 = __tc1 AND x.p < __tp)), 1L, 0L))"
            ),
        ).otherwise(F.lit(0).cast("long")),
    ).withColumn(
        "__rank",
        F.when(F.col("__rank") > 20, F.lit(0).cast("long"))
        .otherwise(F.col("__rank")),
    )
    ranks = per_user.groupBy("__rank").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    one = ranks.agg(
        F.sum("__cnt").cast("long").alias("n_users"),
        F.sum(F.when(F.col("__rank") == 1, F.col("__cnt"))
              .otherwise(F.lit(0))).cast("long").alias("hits_at_1"),
        F.sum(
            F.when(
                (F.col("__rank") >= 1) & (F.col("__rank") <= 5),
                F.col("__cnt"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("hits_at_5"),
        F.sum(
            F.when(
                (F.col("__rank") >= 1) & (F.col("__rank") <= 10),
                F.col("__cnt"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("hits_at_10"),
        F.sum(F.when(F.col("__rank") >= 1, F.col("__cnt"))
              .otherwise(F.lit(0))).cast("long").alias("__hits"),
        F.array_sort(
            F.collect_list(F.struct("__rank", "__cnt"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__rrsum",
        F.expr(
            "aggregate(__a, 0.0D, (acc, x) -> acc"
            " + IF(x.__rank >= 1L,"
            " cast(x.__cnt as double) / cast(x.__rank as double),"
            " 0.0D))"
        ),
    )
    one = one.filter(F.col("n_users") > 0)
    nu = F.col("n_users").cast("double")
    return one.select(
        F.lit(20).alias("k"),
        "n_users",
        "hits_at_1",
        "hits_at_5",
        "hits_at_10",
        _r6(F.col("__hits").cast("double") / nu).alias("hit_rate"),
        _r6(F.col("__rrsum") / nu).alias("mrr"),
    )


SQL_MRR_EVAL = """
WITH cell AS (
  SELECT o_custkey, l_partkey,
    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01'
      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS c2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_partkey
), tgt AS (
  SELECT o_custkey, l_partkey AS tp, c1 AS tc1
  FROM (
    SELECT o_custkey, l_partkey, c1,
      row_number() OVER (PARTITION BY o_custkey
        ORDER BY c2 DESC, l_partkey) AS rn
    FROM cell WHERE c2 > 0
  ) WHERE rn = 1
), rk AS (
  SELECT t.o_custkey,
    CASE WHEN t.tc1 = 0 THEN 0
      ELSE 1 + (
        SELECT CAST(count(*) AS BIGINT) FROM cell c
        WHERE c.o_custkey = t.o_custkey AND c.c1 > 0
          AND (c.c1 > t.tc1
               OR (c.c1 = t.tc1 AND c.l_partkey < t.tp))
      ) END AS r
  FROM tgt t
), capped AS (
  SELECT o_custkey,
    CASE WHEN r > 20 THEN 0 ELSE r END AS r
  FROM rk
), g AS (
  SELECT r, CAST(count(*) AS BIGINT) AS cnt
  FROM capped GROUP BY r
), one AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_users,
    CAST(sum(CASE WHEN r = 1 THEN cnt ELSE 0 END) AS BIGINT)
      AS hits_at_1,
    CAST(sum(CASE WHEN r BETWEEN 1 AND 5 THEN cnt ELSE 0 END)
      AS BIGINT) AS hits_at_5,
    CAST(sum(CASE WHEN r BETWEEN 1 AND 10 THEN cnt ELSE 0 END)
      AS BIGINT) AS hits_at_10,
    CAST(sum(CASE WHEN r >= 1 THEN cnt ELSE 0 END) AS BIGINT)
      AS hits,
    list_sum(list(CASE WHEN r >= 1
      THEN CAST(cnt AS DOUBLE) / CAST(r AS DOUBLE)
      ELSE 0.0 END ORDER BY r)) AS rrsum
  FROM g
)
SELECT 20 AS k, n_users, hits_at_1, hits_at_5, hits_at_10,
  round(CAST(hits AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
    AS hit_rate,
  round(rrsum / CAST(n_users AS DOUBLE), 6) AS mrr
FROM one WHERE n_users > 0
"""

QUERIES["mrr_eval"] = q_mrr_eval
_RAW_ORACLES["mrr_eval"] = SQL_MRR_EVAL


def q_brier_decomposition(spark, sf_dir):
    """Murphy decomposition of the Brier score for calibration_bins'
    deterministic length classifier (Murphy J. Appl. Meteor. 1973 —
    the WHY behind calibration_bins' single ECE number: Brier =
    RELIABILITY (calibration error, want 0) - RESOLUTION (how much
    the bins separate outcomes, want large) + UNCERTAINTY (the
    irreducible base-rate term ybar(1-ybar)); two models with equal
    Brier can differ entirely in the REL/RES split, which decides
    whether to recalibrate (high REL) or re-feature (low RES) — the
    post-mortem companion to calibration_bins). Same classifier and
    10 equal-width bins: per-bin (n_b, pos_b, sm_b) are exact longs
    from ONE corpus aggregate; each bin's REL term (sm_b - 400
    pos_b)^2 / (160000 n_b) and RES term (N pos_b - n_b P)^2 /
    (N^2 n_b) is one exact-long-cast division, folded BIN-ASCENDING
    over the <=10-row frame on BOTH engines; UNC = P(N-P)/N^2 and
    the Brier skill score BSS = 1 - B/UNC are fixed expression
    trees; the identity B_binned = REL - RES + UNC is exact by
    construction (checked in the rebuild pytest). 2 shuffles at any
    corpus size."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(400)).cast("long")
        .alias("__m"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 50,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    b = d.groupBy(
        F.least(F.lit(9).cast("long"), F.expr("__m div 40"))
        .alias("__bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__pos"),
        F.sum("__m").cast("long").alias("__sm"),
    )
    one = b.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("__n").cast("long").alias("__N"),
        F.sum("__pos").cast("long").alias("__P"),
        F.array_sort(
            F.collect_list(F.struct("__bin", "__n", "__pos", "__sm"))
        ).alias("__a"),
    )
    one = one.filter(
        (F.col("__N") > 0) & (F.col("__P") > 0)
        & (F.col("__P") < F.col("__N"))
    )
    one = (
        one
        .withColumn(
            "__rel",
            F.expr(
                "aggregate(__a, 0.0D, (acc, x) -> acc"
                " + cast((x.__sm - 400 * x.__pos)"
                " * (x.__sm - 400 * x.__pos) as double)"
                " / (160000.0D * cast(x.__n as double)))"
                " / cast(__N as double)"
            ),
        )
        .withColumn(
            "__res",
            F.expr(
                "aggregate(__a, 0.0D, (acc, x) -> acc"
                " + cast((__N * x.__pos - x.__n * __P) as double)"
                " * cast((__N * x.__pos - x.__n * __P) as double)"
                " / (cast(__N as double) * cast(__N as double)"
                " * cast(x.__n as double)))"
                " / cast(__N as double)"
            ),
        )
    )
    nn = F.col("__N").cast("double")
    pp = F.col("__P").cast("double")
    unc = pp * (nn - pp) / (nn * nn)
    brier = F.col("__rel") - F.col("__res") + unc
    return one.select(
        "n_bins",
        F.col("__N").alias("n_docs"),
        _r6(pp / nn).alias("base_rate"),
        _r6(F.col("__rel")).alias("reliability"),
        _r6(F.col("__res")).alias("resolution"),
        _r6(unc).alias("uncertainty"),
        _r6(brier).alias("brier_binned"),
        _r6(F.lit(1.0) - brier / unc).alias("bss"),
    )


SQL_BRIER_DECOMPOSITION = """
WITH d AS (
  SELECT CAST(least(n_chars, 400) AS BIGINT) AS m,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
      >= 50 THEN 1 ELSE 0 END AS y
  FROM documents
), b AS (
  SELECT least(9, m // 40) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(m) AS BIGINT) AS sm
  FROM d GROUP BY least(9, m // 40)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bins,
    CAST(sum(n) AS BIGINT) AS N,
    CAST(sum(pos) AS BIGINT) AS P,
    list_sum(list(
      CAST((sm - 400 * pos) * (sm - 400 * pos) AS DOUBLE)
      / (160000.0 * CAST(n AS DOUBLE)) ORDER BY bin)) AS reln,
    list(ROW(n, pos) ORDER BY bin) AS cells
  FROM b
), two AS (
  SELECT n_bins, N, P, reln,
    list_sum(list_transform(cells, x ->
      CAST((N * x[2] - x[1] * P) AS DOUBLE)
      * CAST((N * x[2] - x[1] * P) AS DOUBLE)
      / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)
         * CAST(x[1] AS DOUBLE)))) AS resn
  FROM one WHERE N > 0 AND P > 0 AND P < N
), f AS (
  SELECT n_bins, N, P,
    reln / CAST(N AS DOUBLE) AS rel,
    resn / CAST(N AS DOUBLE) AS res,
    CAST(P AS DOUBLE) * CAST(N - P AS DOUBLE)
      / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)) AS unc
  FROM two
)
SELECT n_bins, N AS n_docs,
  round(CAST(P AS DOUBLE) / CAST(N AS DOUBLE), 6) AS base_rate,
  round(rel, 6) AS reliability,
  round(res, 6) AS resolution,
  round(unc, 6) AS uncertainty,
  round(rel - res + unc, 6) AS brier_binned,
  round(1.0 - (rel - res + unc) / unc, 6) AS bss
FROM f
"""

QUERIES["brier_decomposition"] = q_brier_decomposition
_RAW_ORACLES["brier_decomposition"] = SQL_BRIER_DECOMPOSITION


def q_youden_j(spark, sf_dir):
    """Youden's J optimal operating point for calibration_bins'
    deterministic length classifier (Youden Cancer 1950 — the
    threshold-CHOICE companion to rank_auc's threshold-free ranking
    audit: sweep every decision threshold, maximize J = sensitivity
    + specificity - 1; the argmax is where a deployed binary filter
    should actually cut, and J* is the chance-corrected headroom the
    score offers). The sweep is EXACT and domain-bounded: scores
    m = least(n_chars,400) take <= 401 values, ONE corpus aggregate
    groups (pos_m, n_m), one cumulative window over the score frame
    gives TP/FP at every threshold, and the argmax compares the
    exact-long numerator J_num = TP*(N-P) - FP*P with a LOWEST-
    threshold tie-break via one exact struct max; sens/spec/J are
    single exact-long divisions. 100-TB shape: the window runs over
    <= 401 rows regardless of corpus size. 3 shuffles."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(400)).cast("long")
        .alias("__m"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 50,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    g = d.groupBy("__m").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__pos"),
    )
    wdesc = Window.orderBy(F.desc("__m")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.orderBy("__m").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = g.select(
        "__m",
        F.sum("__pos").over(wdesc).cast("long").alias("__tp"),
        (F.sum("__n").over(wdesc) - F.sum("__pos").over(wdesc))
        .cast("long").alias("__fp"),
        F.sum("__n").over(wall).cast("long").alias("__N"),
        F.sum("__pos").over(wall).cast("long").alias("__P"),
    )
    g = g.withColumn(
        "__jnum",
        F.col("__tp") * (F.col("__N") - F.col("__P"))
        - F.col("__fp") * F.col("__P"),
    )
    one = g.filter(
        (F.col("__P") > 0) & (F.col("__P") < F.col("__N"))
    ).agg(
        F.max(
            F.struct(
                F.col("__jnum").alias("j"),
                (-F.col("__m")).alias("nm"),
                F.col("__tp").alias("tp"),
                F.col("__fp").alias("fp"),
                F.col("__N").alias("N"),
                F.col("__P").alias("P"),
            )
        ).alias("__b")
    )
    one = one.select(
        F.expr("__b.N").alias("n_docs"),
        F.expr("__b.P").alias("n_pos"),
        F.expr("-__b.nm").alias("threshold"),
        F.expr("__b.tp").alias("tp"),
        F.expr("__b.fp").alias("fp"),
        _r6(
            F.expr("cast(__b.tp as double) / cast(__b.P as double)")
        ).alias("sensitivity"),
        _r6(
            F.expr(
                "1.0D - cast(__b.fp as double)"
                " / cast(__b.N - __b.P as double)"
            )
        ).alias("specificity"),
        _r6(
            F.expr(
                "cast(__b.j as double)"
                " / (cast(__b.P as double)"
                " * cast(__b.N - __b.P as double))"
            )
        ).alias("youden_j"),
    )
    return one


SQL_YOUDEN_J = """
WITH d AS (
  SELECT CAST(least(n_chars, 400) AS BIGINT) AS m,
    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
      >= 50 THEN 1 ELSE 0 END AS y
  FROM documents
), g AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS pos
  FROM d GROUP BY m
), c AS (
  SELECT m,
    CAST(sum(pos) OVER (ORDER BY m DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS tp,
    CAST(sum(n) OVER (ORDER BY m DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - sum(pos) OVER (ORDER BY m DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS fp,
    CAST(sum(n) OVER () AS BIGINT) AS N,
    CAST(sum(pos) OVER () AS BIGINT) AS P
  FROM g
), j AS (
  SELECT m, tp, fp, N, P,
    tp * (N - P) - fp * P AS jnum
  FROM c WHERE P > 0 AND P < N
), best AS (
  SELECT * FROM j
  ORDER BY jnum DESC, m ASC LIMIT 1
)
SELECT N AS n_docs, P AS n_pos, m AS threshold, tp, fp,
  round(CAST(tp AS DOUBLE) / CAST(P AS DOUBLE), 6) AS sensitivity,
  round(1.0 - CAST(fp AS DOUBLE) / CAST(N - P AS DOUBLE), 6)
    AS specificity,
  round(CAST(jnum AS DOUBLE)
        / (CAST(P AS DOUBLE) * CAST(N - P AS DOUBLE)), 6)
    AS youden_j
FROM best
"""

QUERIES["youden_j"] = q_youden_j
_RAW_ORACLES["youden_j"] = SQL_YOUDEN_J


def q_lin_ccc(spark, sf_dir):
    """Lin's concordance correlation coefficient between the daily
    click-volume and daily view-volume series (Lin Biometrics 1989 —
    the AGREEMENT statistic Pearson r deliberately is not: r asks
    'do the two channels co-move', CCC asks 'do they give the SAME
    number', penalizing location and scale shifts through the
    bias-correction factor C_b = CCC/r; the right audit before
    treating two telemetry channels as interchangeable measures of
    daily activity, and the parametric twin of cohens_kappa's
    categorical agreement). The day x channel counts come from ONE
    conditional corpus aggregate; with Lin's 1/n moment convention
    every n^2 denominator cancels, so CCC = 2(nSxy - SxSy) /
    (nSxx - Sx^2 + nSyy - Sy^2 + (Sx-Sy)^2) is ONE division of
    EXACT LONGS, and r, C_b, the location shift u and scale ratio
    follow as fixed expression trees (IEEE sqrt). 2 shuffles at any
    corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
        "event_type",
    )
    day = ev.groupBy("__day").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("__x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long").alias("__y"),
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
    )
    n = F.col("n_days")
    dxx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
    dyy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    dxy = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    dm = F.col("__sx") - F.col("__sy")
    one = one.filter((n > 1) & (dxx > 0) & (dyy > 0))
    ccc = (F.lit(2.0) * dxy.cast("double")) / (
        dxx.cast("double") + dyy.cast("double")
        + (dm * dm).cast("double")
    )
    rr = dxy.cast("double") / (
        F.sqrt(dxx.cast("double")) * F.sqrt(dyy.cast("double"))
    )
    scale = F.sqrt(dxx.cast("double") / dyy.cast("double"))
    return one.select(
        "n_days",
        _r6(F.col("__sx").cast("double") / n.cast("double"))
        .alias("mean_clicks"),
        _r6(F.col("__sy").cast("double") / n.cast("double"))
        .alias("mean_views"),
        _r6(rr).alias("pearson_r"),
        _r6(ccc).alias("ccc"),
        _r6(ccc / rr).alias("c_b"),
        _r6(scale).alias("scale_ratio"),
        (ccc > F.lit(0.9)).alias("interchangeable"),
    )


SQL_LIN_CCC = """
WITH day AS (
  SELECT day(ts) AS day,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      AS BIGINT) AS x,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(y * y) AS BIGINT) AS syy,
    CAST(sum(x * y) AS BIGINT) AS sxy
  FROM day
), f AS (
  SELECT n, sx, sy,
    n * sxx - sx * sx AS dxx,
    n * syy - sy * sy AS dyy,
    n * sxy - sx * sy AS dxy,
    sx - sy AS dm
  FROM one WHERE n > 1
)
SELECT n AS n_days,
  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_clicks,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_views,
  round(CAST(dxy AS DOUBLE)
        / (sqrt(CAST(dxx AS DOUBLE)) * sqrt(CAST(dyy AS DOUBLE))),
        6) AS pearson_r,
  round(2.0 * CAST(dxy AS DOUBLE)
        / (CAST(dxx AS DOUBLE) + CAST(dyy AS DOUBLE)
           + CAST(dm * dm AS DOUBLE)), 6) AS ccc,
  round((2.0 * CAST(dxy AS DOUBLE)
        / (CAST(dxx AS DOUBLE) + CAST(dyy AS DOUBLE)
           + CAST(dm * dm AS DOUBLE)))
        / (CAST(dxy AS DOUBLE)
           / (sqrt(CAST(dxx AS DOUBLE))
              * sqrt(CAST(dyy AS DOUBLE)))), 6) AS c_b,
  round(sqrt(CAST(dxx AS DOUBLE) / CAST(dyy AS DOUBLE)), 6)
    AS scale_ratio,
  (2.0 * CAST(dxy AS DOUBLE)
   / (CAST(dxx AS DOUBLE) + CAST(dyy AS DOUBLE)
      + CAST(dm * dm AS DOUBLE)) > 0.9) AS interchangeable
FROM f WHERE dxx > 0 AND dyy > 0
"""

QUERIES["lin_ccc"] = q_lin_ccc
_RAW_ORACLES["lin_ccc"] = SQL_LIN_CCC


def q_bland_altman(spark, sf_dir):
    """Bland-Altman limits of agreement between the daily click and
    view volumes (Bland & Altman Lancet 1986 — the agreement plot
    behind lin_ccc's single number: per-day differences d_t =
    clicks_t - views_t, bias = mean d, limits of agreement = bias
    +/- 1.96 sd; the within-limits share says how often the two
    channels disagree by more than the noise band, and a bias whose
    |t| = |mean|/(sd/sqrt(n)) clears 1.96 flags a SYSTEMATIC offset
    one channel must be corrected for before substitution). The
    differences are exact longs from the same conditional day
    aggregate as lin_ccc; mean/sd come from exact-long moments (one
    IEEE sqrt), the LoA are fixed expression trees, and the
    within-band count compares exact-long-cast differences against
    the deterministically-computed band edges — identical float
    comparisons on BOTH engines via the day-ascending fold.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
        "event_type",
    )
    day = ev.groupBy("__day").agg(
        (
            F.sum(F.when(F.col("event_type") == "click", 1)
                  .otherwise(0))
            - F.sum(F.when(F.col("event_type") == "view", 1)
                    .otherwise(0))
        ).cast("long").alias("__d"),
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__d").cast("long").alias("__sd"),
        F.sum(F.col("__d") * F.col("__d")).cast("long").alias("__sdd"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__d"))
        ).alias("__a"),
    )
    n = F.col("n_days")
    ss = n * F.col("__sdd") - F.col("__sd") * F.col("__sd")
    one = one.filter((n > 1) & (ss > 0))
    nd = n.cast("double")
    mean = F.col("__sd").cast("double") / nd
    sd = F.sqrt(ss.cast("double") / (nd * (nd - F.lit(1.0))))
    lo = mean - F.lit(1.96) * sd
    hi = mean + F.lit(1.96) * sd
    one = (
        one
        .withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn(
            "__within",
            F.expr(
                "aggregate(__a, 0L, (acc, x) -> acc"
                " + IF(cast(x.__d as double) >= __lo AND"
                " cast(x.__d as double) <= __hi, 1L, 0L))"
            ),
        )
    )
    tstat = mean / (sd / F.sqrt(nd))
    return one.select(
        "n_days",
        _r6(mean).alias("bias"),
        _r6(sd).alias("sd_diff"),
        _r6(F.col("__lo")).alias("loa_lower"),
        _r6(F.col("__hi")).alias("loa_upper"),
        F.col("__within").alias("n_within"),
        _r6(F.col("__within").cast("double") / nd)
        .alias("pct_within"),
        (F.abs(tstat) > F.lit(1.96)).alias("systematic_bias"),
    )


SQL_BLAND_ALTMAN = """
WITH day AS (
  SELECT day(ts) AS day,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      - sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      AS BIGINT) AS d
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(d) AS BIGINT) AS sd_,
    CAST(sum(d * d) AS BIGINT) AS sdd,
    list(d ORDER BY day) AS darr
  FROM day
), f AS (
  SELECT n, sd_, darr,
    CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
    sqrt(CAST(n * sdd - sd_ * sd_ AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
  FROM one WHERE n > 1 AND n * sdd - sd_ * sd_ > 0
), g AS (
  SELECT n, mean, sd,
    mean - 1.96 * sd AS lo,
    mean + 1.96 * sd AS hi,
    list_sum(list_transform(darr, d ->
      CASE WHEN CAST(d AS DOUBLE) >= mean - 1.96 * sd
        AND CAST(d AS DOUBLE) <= mean + 1.96 * sd
      THEN 1 ELSE 0 END)) AS within
  FROM f
)
SELECT n AS n_days,
  round(mean, 6) AS bias,
  round(sd, 6) AS sd_diff,
  round(lo, 6) AS loa_lower,
  round(hi, 6) AS loa_upper,
  CAST(within AS BIGINT) AS n_within,
  round(CAST(within AS DOUBLE) / CAST(n AS DOUBLE), 6)
    AS pct_within,
  (abs(mean / (sd / sqrt(CAST(n AS DOUBLE)))) > 1.96)
    AS systematic_bias
FROM g
"""

QUERIES["bland_altman"] = q_bland_altman
_RAW_ORACLES["bland_altman"] = SQL_BLAND_ALTMAN


def q_jensen_shannon(spark, sf_dir):
    """Jensen-Shannon divergence (bits) and total-variation distance
    between the hour-of-day event distributions of the two
    md5-parity user arms (Lin IEEE-IT 1991 for JSD — the SYMMETRIC,
    always-finite repair of discrete_entropy_mi's KL, bounded by 1
    bit, whose square root is a metric; TV is the 'worst-case event
    probability gap' reading of the same two histograms. As an A/A
    audit beside srm_check: hash-random arms share one temporal
    profile, so JSD ~ 0 and a non-trivial value flags assignment
    leakage into TIME — e.g. one arm saw a different rollout hour.
    As drift tooling it is psi_drift's bounded cousin). The 24x2
    cell counts come from ONE conditional corpus aggregate; TV =
    sum_h |B a_h - A b_h| / (2AB) is EXACT (long numerators, one
    division); JSD terms p ln(2p/(p+q)) are evaluated on the exact
    rationals' single-division doubles and folded HOUR-ASCENDING
    over the <=24-row frame on BOTH engines, then divided by ln 2.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("js|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    g = ev.groupBy("__h").agg(
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0))
        .cast("long").alias("__a"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long").alias("__b"),
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("__a").cast("long").alias("__A"),
        F.sum("__b").cast("long").alias("__B"),
        F.array_sort(
            F.collect_list(F.struct("__h", "__a", "__b"))
        ).alias("__c"),
    )
    one = one.filter((F.col("__A") > 0) & (F.col("__B") > 0))
    one = one.withColumn(
        "__tvnum",
        F.expr(
            "aggregate(__c, 0L, (acc, x) ->"
            " acc + abs(__B * x.__a - __A * x.__b))"
        ),
    )
    # JSD = sum p/2 ln(2p/(p+q)) + q/2 ln(2q/(p+q)), p=a/A, q=b/B
    term = (
        "(CASE WHEN x.{u} > 0 THEN"
        " (cast(x.{u} as double) / cast(__{U} as double)) / 2.0D"
        " * ln(2.0D * (cast(x.{u} as double) / cast(__{U} as double))"
        " / (cast(x.__a as double) / cast(__A as double)"
        "  + cast(x.__b as double) / cast(__B as double)))"
        " ELSE 0.0D END)"
    )
    one = one.withColumn(
        "__js",
        F.expr(
            "aggregate(__c, 0.0D, (acc, x) -> acc + "
            + term.format(u="__a", U="A")
            + " + "
            + term.format(u="__b", U="B")
            + ")"
        ),
    )
    ab2 = (
        F.lit(2.0)
        * F.col("__A").cast("double")
        * F.col("__B").cast("double")
    )
    jsd_bits = F.col("__js") / F.lit(float(__import__("math").log(2.0)))
    return one.select(
        "n_hours",
        F.col("__A").alias("n_arm1"),
        F.col("__B").alias("n_arm0"),
        _r6(F.col("__tvnum").cast("double") / ab2).alias("tv_dist"),
        _r6(jsd_bits).alias("jsd_bits"),
        _r6(F.sqrt(F.col("__js"))).alias("js_metric"),
        (jsd_bits < F.lit(0.01)).alias("arms_consistent"),
    )


SQL_JENSEN_SHANNON = """
WITH ev AS (
  SELECT hour(ts) AS h,
    CAST(('0x' || substring(md5('js|' || CAST(user_id AS VARCHAR)),
      1, 15))::UBIGINT % 2 AS BIGINT) AS arm
  FROM events
), g AS (
  SELECT h,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM ev GROUP BY h
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours,
    CAST(sum(a) AS BIGINT) AS A, CAST(sum(b) AS BIGINT) AS B,
    list({'a': a, 'b': b} ORDER BY h) AS c
  FROM g
), f AS (
  SELECT n_hours, A, B,
    list_sum(list_transform(c, x ->
      abs(B * x.a - A * x.b))) AS tvnum,
    list_sum(list_transform(c, x ->
      (CASE WHEN x.a > 0 THEN
        (CAST(x.a AS DOUBLE) / CAST(A AS DOUBLE)) / 2.0
        * ln(2.0 * (CAST(x.a AS DOUBLE) / CAST(A AS DOUBLE))
          / (CAST(x.a AS DOUBLE) / CAST(A AS DOUBLE)
             + CAST(x.b AS DOUBLE) / CAST(B AS DOUBLE)))
       ELSE 0.0 END)
      + (CASE WHEN x.b > 0 THEN
        (CAST(x.b AS DOUBLE) / CAST(B AS DOUBLE)) / 2.0
        * ln(2.0 * (CAST(x.b AS DOUBLE) / CAST(B AS DOUBLE))
          / (CAST(x.a AS DOUBLE) / CAST(A AS DOUBLE)
             + CAST(x.b AS DOUBLE) / CAST(B AS DOUBLE)))
       ELSE 0.0 END))) AS js
  FROM one WHERE A > 0 AND B > 0
)
SELECT n_hours, A AS n_arm1, B AS n_arm0,
  round(CAST(tvnum AS DOUBLE)
        / (2.0 * CAST(A AS DOUBLE) * CAST(B AS DOUBLE)), 6)
    AS tv_dist,
  round(js / ln(2.0), 6) AS jsd_bits,
  round(sqrt(js), 6) AS js_metric,
  (js / ln(2.0) < 0.01) AS arms_consistent
FROM f
"""

QUERIES["jensen_shannon"] = q_jensen_shannon
_RAW_ORACLES["jensen_shannon"] = SQL_JENSEN_SHANNON


def q_hellinger_affinity(spark, sf_dir):
    """Bhattacharyya coefficient and Hellinger distance between the
    same two md5-parity hour-of-day distributions (Bhattacharyya
    1943; Hellinger 1909 — the sqrt-space geometry of the histogram
    pair: BC = sum sqrt(p q) is the cosine of the angle between the
    sqrt-distributions, H = sqrt(1 - BC) the metric; H^2 sandwiches
    TV (H^2 <= TV <= H sqrt(2), checked in the rebuild pytest) and
    is the distance that controls sample-complexity bounds — the
    theory-side companion to jensen_shannon's information reading).
    Each BC term sqrt(a_h b_h)/sqrt(AB) uses IEEE-exact sqrt of
    exact-long products, folded HOUR-ASCENDING on BOTH engines;
    the per-hour MAX gap term |B a_h - A b_h| and its argmax hour
    are EXACT LONGS (earliest-hour tie-break via struct max).
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("js|"),
                                   F.col("user_id").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("__arm"),
    )
    g = ev.groupBy("__h").agg(
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0))
        .cast("long").alias("__a"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long").alias("__b"),
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("__a").cast("long").alias("__A"),
        F.sum("__b").cast("long").alias("__B"),
        F.array_sort(
            F.collect_list(F.struct("__h", "__a", "__b"))
        ).alias("__c"),
    )
    one = one.filter((F.col("__A") > 0) & (F.col("__B") > 0))
    one = one.withColumn(
        "__bcnum",
        F.expr(
            "aggregate(__c, 0.0D, (acc, x) -> acc"
            " + sqrt(cast(x.__a as double) * cast(x.__b as double)))"
        ),
    ).withColumn(
        "__mx",
        F.expr(
            "aggregate(__c, struct(-1L as g, -1L as h),"
            " (acc, x) -> IF(abs(__B * x.__a - __A * x.__b) > acc.g,"
            " struct(abs(__B * x.__a - __A * x.__b) as g,"
            " x.__h as h), acc))"
        ),
    )
    bc = F.col("__bcnum") / F.sqrt(
        F.col("__A").cast("double") * F.col("__B").cast("double")
    )
    h = F.sqrt(F.lit(1.0) - bc)
    return one.select(
        "n_hours",
        F.col("__A").alias("n_arm1"),
        F.col("__B").alias("n_arm0"),
        _r6(bc).alias("bhattacharyya"),
        _r6(h).alias("hellinger"),
        F.expr("__mx.h").alias("max_gap_hour"),
        _r6(
            F.expr("cast(__mx.g as double)")
            / (F.col("__A").cast("double")
               * F.col("__B").cast("double"))
        ).alias("max_gap"),
        (h < F.lit(0.1)).alias("arms_consistent"),
    )


SQL_HELLINGER_AFFINITY = """
WITH ev AS (
  SELECT hour(ts) AS h,
    CAST(('0x' || substring(md5('js|' || CAST(user_id AS VARCHAR)),
      1, 15))::UBIGINT % 2 AS BIGINT) AS arm
  FROM events
), g AS (
  SELECT h,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM ev GROUP BY h
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours,
    CAST(sum(a) AS BIGINT) AS A, CAST(sum(b) AS BIGINT) AS B,
    list({'h': h, 'a': a, 'b': b} ORDER BY h) AS c
  FROM g
), f AS (
  SELECT n_hours, A, B,
    list_sum(list_transform(c, x ->
      sqrt(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE)))) AS bcnum,
    list_reduce(
      list_transform(c, x -> {'g': abs(B * x.a - A * x.b),
                              'h': x.h}),
      (acc, x) -> CASE WHEN x.g > acc.g THEN x ELSE acc END) AS mx
  FROM one WHERE A > 0 AND B > 0
), z AS (
  SELECT n_hours, A, B, mx,
    bcnum / sqrt(CAST(A AS DOUBLE) * CAST(B AS DOUBLE)) AS bc
  FROM f
)
SELECT n_hours, A AS n_arm1, B AS n_arm0,
  round(bc, 6) AS bhattacharyya,
  round(sqrt(1.0 - bc), 6) AS hellinger,
  mx.h AS max_gap_hour,
  round(CAST(mx.g AS DOUBLE)
        / (CAST(A AS DOUBLE) * CAST(B AS DOUBLE)), 6) AS max_gap,
  (sqrt(1.0 - bc) < 0.1) AS arms_consistent
FROM z
"""

QUERIES["hellinger_affinity"] = q_hellinger_affinity
_RAW_ORACLES["hellinger_affinity"] = SQL_HELLINGER_AFFINITY


def q_moran_i(spark, sf_dir):
    """Moran's I spatial autocorrelation of hourly event volume on
    the CIRCULAR hour-of-day graph (Moran Biometrika 1950 — the
    'do neighboring hours look alike?' statistic: hourly_seasonality
    reports the diurnal profile, Moran's I certifies that the
    profile is a smooth curve rather than independent per-hour noise
    — the smoothness license for interpolating a missing hour from
    its neighbors, and the graph-general form of value_acf's lag-1
    reading). On the 24-cycle with unit weights the statistic
    collapses to I = sum_h z_h z_{h+1 mod 24} / sum_h z_h^2, and
    with the scaled residuals z_h = n*y_h - S EXACT LONGS both sums
    are exact integers — I is ONE exact-long division, the
    expectation E[I] = -1/(n-1) a fixed expression. ONE corpus
    aggregate to the <=24-row hour frame, folds hour-ascending on
    the 1-row frame. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
    )
    g = ev.groupBy("__h").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("__y").cast("long").alias("__S"),
        F.array_sort(
            F.collect_list(F.struct("__h", "__y"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__z", F.expr("transform(__a, x -> n_cells * x.__y - __S)")
    )
    one = (
        one
        .withColumn(
            "__num",
            F.expr(
                "aggregate(sequence(1L, n_cells), 0L, (acc, i) ->"
                " acc + element_at(__z, cast(i as int))"
                " * element_at(__z,"
                " cast(IF(i = n_cells, 1L, i + 1) as int)))"
            ),
        )
        .withColumn(
            "__den",
            F.expr(
                "aggregate(__z, 0L, (acc, z) -> acc + z * z)"
            ),
        )
    )
    one = one.filter((F.col("n_cells") > 2) & (F.col("__den") > 0))
    mi = F.col("__num").cast("double") / F.col("__den").cast("double")
    ei = F.lit(-1.0) / (F.col("n_cells") - 1).cast("double")
    return one.select(
        "n_cells",
        _r6(mi).alias("moran_i"),
        _r6(ei).alias("expected_i"),
        F.when(mi > 0.0, F.lit("positive_autocorr"))
        .when(mi < F.lit(2.0) * ei, F.lit("negative_autocorr"))
        .otherwise(F.lit("near_random"))
        .alias("verdict"),
    )


SQL_MORAN_I = """
WITH g AS (
  SELECT hour(ts) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY hour(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS S,
    list(y ORDER BY h) AS yarr
  FROM g
), z AS (
  SELECT n,
    list_transform(yarr, y -> n * y - S) AS zarr
  FROM one
), f AS (
  SELECT n,
    list_sum(list_transform(range(1, n + 1), i ->
      zarr[i] * zarr[CASE WHEN i = n THEN 1 ELSE i + 1 END]))
      AS num,
    list_sum(list_transform(zarr, v -> v * v)) AS den
  FROM z
)
SELECT n AS n_cells,
  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS moran_i,
  round(-1.0 / CAST(n - 1 AS DOUBLE), 6) AS expected_i,
  CASE WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) > 0
         THEN 'positive_autocorr'
       WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
            < 2.0 * (-1.0 / CAST(n - 1 AS DOUBLE))
         THEN 'negative_autocorr'
       ELSE 'near_random' END AS verdict
FROM f WHERE n > 2 AND den > 0
"""

QUERIES["moran_i"] = q_moran_i
_RAW_ORACLES["moran_i"] = SQL_MORAN_I


def q_geary_c(spark, sf_dir):
    """Geary's C contiguity ratio on the same circular hour-of-day
    graph (Geary The Incorporated Statistician 1954 — Moran's
    LOCAL-difference dual: I correlates neighbors through the global
    mean, C squares the neighbor-to-neighbor GAPS, so C is the more
    sensitive detector of single-hour discontinuities (a cron spike
    between smooth neighbors) while I responds to broad gradients;
    reading the (I, C) pair together is the standard spatial
    diagnostic — C ~ 1 - I only under smooth fields, and the rebuild
    pytest checks both against the same histogram). On the 24-cycle
    C = (n-1) sum_h (z_h - z_{h+1})^2 / (2n sum_h z_h^2) with
    z_h = n*y_h - S, so numerator and denominator are EXACT LONGS
    and C is ONE exact division; E[C] = 1 always. Same 2-shuffle
    hour-frame shape as moran_i."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
    )
    g = ev.groupBy("__h").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("__y").cast("long").alias("__S"),
        F.array_sort(
            F.collect_list(F.struct("__h", "__y"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__z", F.expr("transform(__a, x -> n_cells * x.__y - __S)")
    )
    one = (
        one
        .withColumn(
            "__num",
            F.expr(
                "aggregate(sequence(1L, n_cells), 0L, (acc, i) ->"
                " acc + (element_at(__z, cast(i as int))"
                " - element_at(__z,"
                "   cast(IF(i = n_cells, 1L, i + 1) as int)))"
                " * (element_at(__z, cast(i as int))"
                " - element_at(__z,"
                "   cast(IF(i = n_cells, 1L, i + 1) as int))))"
            ),
        )
        .withColumn(
            "__den",
            F.expr("aggregate(__z, 0L, (acc, z) -> acc + z * z)"),
        )
    )
    one = one.filter((F.col("n_cells") > 2) & (F.col("__den") > 0))
    c = (
        (F.col("n_cells") - 1).cast("double")
        * F.col("__num").cast("double")
    ) / (
        F.lit(2.0)
        * F.col("n_cells").cast("double")
        * F.col("__den").cast("double")
    )
    return one.select(
        "n_cells",
        _r6(c).alias("geary_c"),
        F.lit(1.0).alias("expected_c"),
        F.when(c < 1.0, F.lit("positive_autocorr"))
        .when(c > 1.0, F.lit("negative_autocorr"))
        .otherwise(F.lit("near_random"))
        .alias("verdict"),
    )


SQL_GEARY_C = """
WITH g AS (
  SELECT hour(ts) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY hour(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS S,
    list(y ORDER BY h) AS yarr
  FROM g
), z AS (
  SELECT n,
    list_transform(yarr, y -> n * y - S) AS zarr
  FROM one
), f AS (
  SELECT n,
    list_sum(list_transform(range(1, n + 1), i ->
      (zarr[i] - zarr[CASE WHEN i = n THEN 1 ELSE i + 1 END])
      * (zarr[i] - zarr[CASE WHEN i = n THEN 1 ELSE i + 1 END])))
      AS num,
    list_sum(list_transform(zarr, v -> v * v)) AS den
  FROM z
)
SELECT n AS n_cells,
  round(CAST(n - 1 AS DOUBLE) * CAST(num AS DOUBLE)
        / (2.0 * CAST(n AS DOUBLE) * CAST(den AS DOUBLE)), 6)
    AS geary_c,
  1.0 AS expected_c,
  CASE WHEN CAST(n - 1 AS DOUBLE) * CAST(num AS DOUBLE)
            / (2.0 * CAST(n AS DOUBLE) * CAST(den AS DOUBLE)) < 1.0
         THEN 'positive_autocorr'
       WHEN CAST(n - 1 AS DOUBLE) * CAST(num AS DOUBLE)
            / (2.0 * CAST(n AS DOUBLE) * CAST(den AS DOUBLE)) > 1.0
         THEN 'negative_autocorr'
       ELSE 'near_random' END AS verdict
FROM f WHERE n > 2 AND den > 0
"""

QUERIES["geary_c"] = q_geary_c
_RAW_ORACLES["geary_c"] = SQL_GEARY_C


def q_croston_forecast(spark, sf_dir):
    """Croston's method with the Syntetos-Boylan approximation for
    the INTERMITTENT daily series 'number of purchases over 150'
    (Croston Op. Res. Q. 1972; Syntetos & Boylan IJF 2005 for the
    (1 - alpha/2) bias fix and the ADI/CV^2 demand taxonomy — the
    forecaster ses_alpha_grid cannot be: SES of a zero-inflated
    series converges to a meaningless blend, Croston separates the
    SIZE of demand from the TIME BETWEEN demands, SES-smooths each,
    and forecasts size/interval; the taxonomy cell (smooth /
    intermittent / erratic / lumpy at the 1.32/0.49 cutoffs) is the
    standard router deciding whether Croston applies at all).
    Demand sizes and inter-demand intervals are EXACT LONGS from the
    day frame; both SES recursions run alpha = 0.2 seeded at the
    first element — Spark folds slice(arr, 2, m-1) seeded with
    element 1, DuckDB's list_reduce seeds from the first element
    natively, so both engines execute the identical float sequence
    (the ses_alpha_grid convention); ADI = t_m / m and CV^2 are
    exact-long divisions. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
        ((F.col("event_type") == "purchase")
         & (F.col("value") > 150)).alias("__hit"),
    )
    day = ev.groupBy("__day").agg(
        F.sum(F.when(F.col("__hit"), 1).otherwise(0))
        .cast("long").alias("__z")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("__z") > 0,
                       F.struct("__day", "__z"))
            )
        ).alias("__d"),
    )
    one = (
        one
        .withColumn("__m", F.expr("cast(size(__d) as long)"))
        .filter(F.col("__m") >= 2)
        .withColumn(
            "__zarr",
            F.expr("transform(__d, s -> cast(s.__z as double))"),
        )
        .withColumn(
            "__parr",
            F.expr(
                "transform(sequence(1L, __m), k -> cast("
                " IF(k = 1, element_at(__d, 1).__day,"
                " element_at(__d, cast(k as int)).__day"
                " - element_at(__d, cast(k - 1 as int)).__day)"
                " as double))"
            ),
        )
        .withColumn("__sz", F.expr("aggregate(__d, 0L, (a, s) -> a + s.__z)"))
        .withColumn(
            "__szz",
            F.expr("aggregate(__d, 0L, (a, s) -> a + s.__z * s.__z)"),
        )
        .withColumn("__tm", F.expr("element_at(__d, cast(__m as int)).__day"))
    )
    ses = (
        "aggregate(slice({arr}, 2, cast(__m - 1 as int)),"
        " element_at({arr}, 1),"
        " (acc, v) -> 0.2D * v + 0.8D * acc)"
    )
    one = (
        one
        .withColumn("__zl", F.expr(ses.format(arr="__zarr")))
        .withColumn("__pl", F.expr(ses.format(arr="__parr")))
    )
    md = F.col("__m").cast("double")
    adi = F.col("__tm").cast("double") / md
    cv2 = (
        (F.col("__m") * F.col("__szz")
         - F.col("__sz") * F.col("__sz")).cast("double")
        * md
        / (
            (F.col("__m") - 1).cast("double")
            * (F.col("__sz") * F.col("__sz")).cast("double")
        )
    )
    cro = F.col("__zl") / F.col("__pl")
    return one.select(
        "n_days",
        F.col("__m").alias("n_demands"),
        _r6(F.lit(1.0) - md / F.col("n_days").cast("double"))
        .alias("zero_share"),
        _r6(adi).alias("adi"),
        _r6(cv2).alias("cv2"),
        _r6(F.col("__zl")).alias("size_level"),
        _r6(F.col("__pl")).alias("interval_level"),
        _r6(cro).alias("croston"),
        _r6(F.lit(0.9) * cro).alias("sba"),
        F.when((adi < 1.32) & (cv2 < 0.49), F.lit("smooth"))
        .when((adi >= 1.32) & (cv2 < 0.49), F.lit("intermittent"))
        .when((adi < 1.32) & (cv2 >= 0.49), F.lit("erratic"))
        .otherwise(F.lit("lumpy"))
        .alias("demand_class"),
    )


SQL_CROSTON_FORECAST = """
WITH day AS (
  SELECT day(ts) AS day,
    CAST(sum(CASE WHEN event_type = 'purchase' AND value > 150
      THEN 1 ELSE 0 END) AS BIGINT) AS z
  FROM events GROUP BY day(ts)
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM day
), dem AS (
  SELECT day, z FROM day WHERE z > 0
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
    list(CAST(z AS DOUBLE) ORDER BY day) AS zarr,
    list(day ORDER BY day) AS darr,
    CAST(sum(z) AS BIGINT) AS sz,
    CAST(sum(z * z) AS BIGINT) AS szz,
    CAST(max(day) AS BIGINT) AS tm
  FROM dem
), pa AS (
  SELECT m, zarr, sz, szz, tm,
    list_transform(range(1, CAST(m + 1 AS INTEGER)), k ->
      CAST(CASE WHEN k = 1 THEN darr[1]
           ELSE darr[k] - darr[k - 1] END AS DOUBLE)) AS parr
  FROM one WHERE m >= 2
), sl AS (
  SELECT m, sz, szz, tm,
    list_reduce(zarr, (acc, v) -> 0.2 * v + 0.8 * acc) AS zl,
    list_reduce(parr, (acc, v) -> 0.2 * v + 0.8 * acc) AS pl
  FROM pa
), f AS (
  SELECT m, sz, szz, tm, zl, pl,
    CAST(tm AS DOUBLE) / CAST(m AS DOUBLE) AS adi,
    CAST(m * szz - sz * sz AS DOUBLE) * CAST(m AS DOUBLE)
      / (CAST(m - 1 AS DOUBLE) * CAST(sz * sz AS DOUBLE)) AS cv2
  FROM sl
)
SELECT nd.n_days, m AS n_demands,
  round(1.0 - CAST(m AS DOUBLE) / CAST(nd.n_days AS DOUBLE), 6)
    AS zero_share,
  round(adi, 6) AS adi,
  round(cv2, 6) AS cv2,
  round(zl, 6) AS size_level,
  round(pl, 6) AS interval_level,
  round(zl / pl, 6) AS croston,
  round(0.9 * (zl / pl), 6) AS sba,
  CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
       WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
       WHEN adi < 1.32 AND cv2 >= 0.49 THEN 'erratic'
       ELSE 'lumpy' END AS demand_class
FROM f, nd
"""

QUERIES["croston_forecast"] = q_croston_forecast
_RAW_ORACLES["croston_forecast"] = SQL_CROSTON_FORECAST


def q_tracking_signal(spark, sf_dir):
    """Brown's cumulative-error tracking signal for the alpha = 0.3
    SES forecast of daily event volume (Brown 1959 'Statistical
    Forecasting for Inventory Control'; the +/-4-MAD action limit is
    the standard ops-management rule — the MONITOR that belongs on
    top of whatever ses_alpha_grid/holt_trend deploy: a forecast can
    have fine RMSE yet drift consistently to one side, and
    TS = sum(e_t) / MAD crossing +/-4 is the classic 'your forecast
    is biased, re-fit it' alarm — the forecasting twin of
    sprt_monitor's sequential test). One-step errors e_t = y_t -
    l_{t-1} recompute each prefix level FROM SCRATCH as a plain
    double fold (the ses_alpha_grid O(n^2) convention — identical op
    sequence on BOTH engines, no struct accumulators, which DuckDB
    evaluates field-sequentially); the error and |error| sums fold
    t-ascending. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    ).selectExpr(
        "n_days",
        "transform(__a, e -> cast(e.__y as double)) AS __ys",
    )
    one = one.filter(F.col("n_days") > 2)
    lvl = (
        "aggregate(slice(__ys, 2, cast(t - 2 as int)),"
        " element_at(__ys, 1), (acc, y) ->"
        " 0.3D * y + 0.7D * acc)"
    )
    err = f"(element_at(__ys, cast(t as int)) - {lvl})"
    one = (
        one
        .withColumn(
            "__cum",
            F.expr(
                "aggregate(sequence(2L, n_days), 0.0D,"
                f" (acc, t) -> acc + {err})"
            ),
        )
        .withColumn(
            "__sad",
            F.expr(
                "aggregate(sequence(2L, n_days), 0.0D,"
                f" (acc, t) -> acc + abs({err}))"
            ),
        )
    )
    one = one.filter(F.col("__sad") > 0.0)
    mad = F.col("__sad") / (F.col("n_days") - 1).cast("double")
    ts = F.col("__cum") / mad
    return one.select(
        "n_days",
        F.lit(0.3).alias("alpha"),
        _r6(F.col("__cum")).alias("cum_error"),
        _r6(mad).alias("mad"),
        _r6(ts).alias("tracking_signal"),
        (F.abs(ts) > F.lit(4.0)).alias("alarm"),
        F.when(ts > 0.0, F.lit("under_forecasting"))
        .when(ts < 0.0, F.lit("over_forecasting"))
        .otherwise(F.lit("unbiased"))
        .alias("bias_direction"),
    )


def _tracking_sql() -> str:
    lvl = (
        "list_reduce(list_slice(ys, 1, t - 1), (acc, y) ->"
        " 0.3 * y + 0.7 * acc)"
    )
    err = f"(ys[t] - {lvl})"
    return f"""
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(CAST(y AS DOUBLE) ORDER BY x) AS ys,
    CAST(count(*) AS BIGINT) AS n
  FROM day
), f AS (
  SELECT n,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(2, CAST(n + 1 AS INTEGER)),
        t -> {err})), (acc, v) -> acc + v) AS cum,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(2, CAST(n + 1 AS INTEGER)),
        t -> abs({err}))), (acc, v) -> acc + v) AS sad
  FROM one WHERE n > 2
)
SELECT n AS n_days, 0.3 AS alpha,
  round(cum, 6) AS cum_error,
  round(sad / CAST(n - 1 AS DOUBLE), 6) AS mad,
  round(cum / (sad / CAST(n - 1 AS DOUBLE)), 6) AS tracking_signal,
  (abs(cum / (sad / CAST(n - 1 AS DOUBLE))) > 4.0) AS alarm,
  CASE WHEN cum / (sad / CAST(n - 1 AS DOUBLE)) > 0
         THEN 'under_forecasting'
       WHEN cum / (sad / CAST(n - 1 AS DOUBLE)) < 0
         THEN 'over_forecasting'
       ELSE 'unbiased' END AS bias_direction
FROM f WHERE sad > 0
"""


SQL_TRACKING_SIGNAL = _tracking_sql()

QUERIES["tracking_signal"] = q_tracking_signal
_RAW_ORACLES["tracking_signal"] = SQL_TRACKING_SIGNAL


def q_g_test(spark, sf_dir):
    """Likelihood-ratio G-test of independence with the Williams
    correction on the same daypart x event-type table as
    chi2_independence (Sokal & Rohlf 'Biometry' 1981 §17.4; Williams
    Biometrika 1976 for the q divisor — the LIKELIHOOD twin of
    Pearson's X^2: G = 2 sum O ln(O/E) is additive across partitions
    of the table (the property hierarchical log-linear decomposition
    needs) and is the statistic whose per-cell terms ARE the mutual
    information in nats scaled by 2N, tying this to
    discrete_entropy_mi; X^2 and G disagreeing is itself a
    small-cell warning). The <=20 contingency cells come from ONE
    corpus aggregate; each cell term O ln(O*N/(R*C)) evaluates ln on
    ONE exact-long-product ratio (cells with O = 0 contribute 0),
    folded (row, col)-ascending over the 1-row frame on BOTH
    engines; the Williams q = 1 + (N sum 1/R - 1)(N sum 1/C - 1) /
    (6 N (r-1)(c-1)) folds over the <=4 row and <=5 column marginal
    sets. chi2(12) 5% point 21.026 pinned. 2 shuffles at any corpus
    size."""
    ev = _events(spark, sf_dir).select(
        F.expr(
            "cast((unix_micros(cast(ts as timestamp)) "
            "div 21600000000) % 4 as bigint)"
        ).alias("__r"),
        F.col("event_type").alias("__c"),
    )
    cells = ev.groupBy("__r", "__c").agg(
        F.count(F.lit(1)).cast("long").alias("__o")
    )
    one = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("__o").cast("long").alias("__N"),
        F.array_sort(
            F.collect_list(F.struct("__r", "__c", "__o"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn(
            "__rows",
            F.expr("array_sort(array_distinct("
                   "transform(__a, x -> x.__r)))"),
        )
        .withColumn(
            "__cols",
            F.expr("array_sort(array_distinct("
                   "transform(__a, x -> x.__c)))"),
        )
    )
    # per-cell row/col marginals via bounded nested folds
    rsum = (
        "aggregate(__a, 0L, (acc, y) ->"
        " acc + IF(y.__r = x.__r, y.__o, 0L))"
    )
    csum = (
        "aggregate(__a, 0L, (acc, y) ->"
        " acc + IF(y.__c = x.__c, y.__o, 0L))"
    )
    one = one.withColumn(
        "__g",
        F.expr(
            "2.0D * aggregate(__a, 0.0D, (acc, x) -> acc"
            " + IF(x.__o > 0, cast(x.__o as double)"
            f" * ln(cast(x.__o * __N as double)"
            f" / cast(({rsum}) * ({csum}) as double)), 0.0D))"
        ),
    )
    rinv = (
        "aggregate(__rows, 0.0D, (acc, r) -> acc"
        " + 1.0D / cast(aggregate(__a, 0L, (acc2, y) ->"
        " acc2 + IF(y.__r = r, y.__o, 0L)) as double))"
    )
    cinv = (
        "aggregate(__cols, 0.0D, (acc, c) -> acc"
        " + 1.0D / cast(aggregate(__a, 0L, (acc2, y) ->"
        " acc2 + IF(y.__c = c, y.__o, 0L)) as double))"
    )
    one = (
        one
        .withColumn("__nr", F.expr("cast(size(__rows) as long)"))
        .withColumn("__nc", F.expr("cast(size(__cols) as long)"))
        .withColumn(
            "__q",
            F.expr(
                "1.0D + (cast(__N as double) * (" + rinv + ") - 1.0D)"
                " * (cast(__N as double) * (" + cinv + ") - 1.0D)"
                " / (6.0D * cast(__N as double)"
                " * cast((__nr - 1) * (__nc - 1) as double))"
            ),
        )
    )
    one = one.filter((F.col("__nr") > 1) & (F.col("__nc") > 1))
    gadj = F.col("__g") / F.col("__q")
    return one.select(
        F.col("__N").alias("n_events"),
        "n_cells",
        ((F.col("__nr") - 1) * (F.col("__nc") - 1)).alias("dof"),
        _r6(F.col("__g")).alias("g_stat"),
        _r6(F.col("__q")).alias("q_williams"),
        _r6(gadj).alias("g_adjusted"),
        (gadj > F.lit(21.026)).alias("reject_5pct"),
    )


SQL_G_TEST = """
WITH e AS (
  SELECT CAST((epoch_us(ts) // 21600000000) % 4 AS BIGINT) AS r,
    event_type AS c
  FROM events
), cells AS (
  SELECT r, c, CAST(count(*) AS BIGINT) AS o
  FROM e GROUP BY r, c
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
    CAST(sum(o) AS BIGINT) AS N,
    list({'r': r, 'c': c, 'o': o} ORDER BY r, c) AS a
  FROM cells
), marg AS (
  SELECT n_cells, N, a,
    list_sort(list_distinct(list_transform(a, x -> x.r))) AS rows_,
    list_sort(list_distinct(list_transform(a, x -> x.c))) AS cols_
  FROM one
), g AS (
  SELECT n_cells, N, a, rows_, cols_,
    2.0 * list_sum(list_transform(a, x ->
      CASE WHEN x.o > 0 THEN CAST(x.o AS DOUBLE)
        * ln(CAST(x.o * N AS DOUBLE)
          / CAST(list_sum(list_transform(a, y ->
              CASE WHEN y.r = x.r THEN y.o ELSE 0 END))
            * list_sum(list_transform(a, y ->
              CASE WHEN y.c = x.c THEN y.o ELSE 0 END))
            AS DOUBLE))
      ELSE 0.0 END)) AS gs,
    CAST(len(rows_) AS BIGINT) AS nr,
    CAST(len(cols_) AS BIGINT) AS nc
  FROM marg
), q AS (
  SELECT n_cells, N, gs, nr, nc,
    1.0 + (CAST(N AS DOUBLE) * list_sum(list_transform(rows_, r ->
        1.0 / CAST(list_sum(list_transform(a, y ->
          CASE WHEN y.r = r THEN y.o ELSE 0 END)) AS DOUBLE)))
      - 1.0)
      * (CAST(N AS DOUBLE) * list_sum(list_transform(cols_, c ->
        1.0 / CAST(list_sum(list_transform(a, y ->
          CASE WHEN y.c = c THEN y.o ELSE 0 END)) AS DOUBLE)))
      - 1.0)
      / (6.0 * CAST(N AS DOUBLE)
         * CAST((nr - 1) * (nc - 1) AS DOUBLE)) AS qw
  FROM g WHERE nr > 1 AND nc > 1
)
SELECT N AS n_events, n_cells,
  (nr - 1) * (nc - 1) AS dof,
  round(gs, 6) AS g_stat,
  round(qw, 6) AS q_williams,
  round(gs / qw, 6) AS g_adjusted,
  (gs / qw > 21.026) AS reject_5pct
FROM q
"""

QUERIES["g_test"] = q_g_test
_RAW_ORACLES["g_test"] = SQL_G_TEST


def q_mood_median_test(spark, sf_dir):
    """Mood's median test of `value` across the 5 event types
    (Mood 'Introduction to the Theory of Statistics' 1950 §16.4 —
    the bluntest of the k-sample location tests and the right one
    when outliers are extreme: where kruskal_wallis ranks every
    observation, Mood only asks which SIDE of the grand median each
    lands on, so a single corrupted value cannot move it; the
    standard cross-check when kruskal_wallis and anova disagree).
    The grand median is the EXACT lower-median order statistic
    selected from the domain-bounded cents histogram (<=56k rows,
    the cliffs_delta convention) via one cumulative window — an
    exact integer; the 2x5 above/<=median table then comes from the
    SAME (type, cents) frame re-aggregated against the broadcast
    median, every cell exact; chi2 = sum (N*O - R*C)^2 / (N*R*C)
    with the long products cast to double before squaring (the
    granger convention), folded type-ascending. chi2(4) 5% point
    9.488 pinned. 100-TB shape: two bounded-frame aggs + one
    broadcast — the corpus is touched ONCE."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("__t"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("__c"),
    )
    tc = scratch_persist(
        ev.groupBy("__t", "__c").agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
    )
    ch = tc.groupBy("__c").agg(F.sum("__n").cast("long").alias("__m"))
    wcum = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ch = ch.select(
        "__c",
        F.sum("__m").over(wcum).cast("long").alias("__cum"),
        F.sum("__m").over(wall).cast("long").alias("__tot"),
    )
    med = ch.filter(
        F.col("__cum") * 2 >= F.col("__tot")
    ).agg(F.min("__c").alias("__med"))
    cells = tc.crossJoin(F.broadcast(med)).groupBy("__t").agg(
        F.sum(F.when(F.col("__c") > F.col("__med"), F.col("__n"))
              .otherwise(F.lit(0))).cast("long").alias("__ab"),
        F.sum(F.when(F.col("__c") <= F.col("__med"), F.col("__n"))
              .otherwise(F.lit(0))).cast("long").alias("__be"),
        F.max("__med").alias("__medx"),
    )
    one = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(F.col("__ab") + F.col("__be")).cast("long").alias("__N"),
        F.sum("__ab").cast("long").alias("__A"),
        F.max("__medx").alias("__med"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__ab", "__be"))
        ).alias("__g"),
    )
    # chi2 over the 2xk table: rows above/below, cols = types
    term = (
        "cast(__N as double) * cast(x.{o} as double)"
        " - cast((x.__ab + x.__be) as double) * cast({R} as double)"
    )
    ta = term.format(o="__ab", R="__A")
    tb = term.format(o="__be", R="(__N - __A)")
    one = one.withColumn(
        "__chi2",
        F.expr(
            "aggregate(__g, 0.0D, (acc, x) -> acc"
            f" + ({ta}) * ({ta})"
            " / (cast(__N as double)"
            "    * cast(x.__ab + x.__be as double)"
            "    * cast(__A as double))"
            f" + ({tb}) * ({tb})"
            " / (cast(__N as double)"
            "    * cast(x.__ab + x.__be as double)"
            "    * cast(__N - __A as double)))"
        ),
    )
    one = one.filter(
        (F.col("k_groups") > 1) & (F.col("__A") > 0)
        & (F.col("__A") < F.col("__N"))
    )
    return one.select(
        "k_groups",
        F.col("__N").alias("n_events"),
        (F.col("__med").cast("double") / F.lit(100.0))
        .alias("grand_median"),
        F.col("__A").alias("n_above"),
        _r6(F.col("__chi2")).alias("chi2"),
        (F.col("k_groups") - 1).alias("dof"),
        (F.col("__chi2") > F.lit(9.488)).alias("reject_5pct"),
    )


SQL_MOOD_MEDIAN_TEST = """
WITH ev AS (
  SELECT event_type AS t,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), tc AS (
  SELECT t, c, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY t, c
), ch AS (
  SELECT c,
    CAST(sum(sum(n)) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS cum,
    CAST(sum(sum(n)) OVER () AS BIGINT) AS tot
  FROM tc GROUP BY c
), med AS (
  SELECT min(c) AS med FROM ch WHERE cum * 2 >= tot
), cells AS (
  SELECT t,
    CAST(sum(CASE WHEN c > (SELECT med FROM med) THEN n ELSE 0 END)
      AS BIGINT) AS ab,
    CAST(sum(CASE WHEN c <= (SELECT med FROM med) THEN n ELSE 0 END)
      AS BIGINT) AS be
  FROM tc GROUP BY t
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(ab + be) AS BIGINT) AS N,
    CAST(sum(ab) AS BIGINT) AS A,
    list({'t': t, 'ab': ab, 'be': be} ORDER BY t) AS g
  FROM cells
), f AS (
  SELECT k, N, A,
    list_sum(list_transform(g, x ->
      (CAST(N AS DOUBLE) * CAST(x.ab AS DOUBLE)
       - CAST(x.ab + x.be AS DOUBLE) * CAST(A AS DOUBLE))
      * (CAST(N AS DOUBLE) * CAST(x.ab AS DOUBLE)
       - CAST(x.ab + x.be AS DOUBLE) * CAST(A AS DOUBLE))
      / (CAST(N AS DOUBLE) * CAST(x.ab + x.be AS DOUBLE)
         * CAST(A AS DOUBLE))
      + (CAST(N AS DOUBLE) * CAST(x.be AS DOUBLE)
       - CAST(x.ab + x.be AS DOUBLE) * CAST(N - A AS DOUBLE))
      * (CAST(N AS DOUBLE) * CAST(x.be AS DOUBLE)
       - CAST(x.ab + x.be AS DOUBLE) * CAST(N - A AS DOUBLE))
      / (CAST(N AS DOUBLE) * CAST(x.ab + x.be AS DOUBLE)
         * CAST(N - A AS DOUBLE)))) AS chi2
  FROM one WHERE k > 1 AND A > 0 AND A < N
)
SELECT k AS k_groups, N AS n_events,
  CAST((SELECT med FROM med) AS DOUBLE) / 100.0 AS grand_median,
  A AS n_above,
  round(chi2, 6) AS chi2,
  k - 1 AS dof,
  (chi2 > 9.488) AS reject_5pct
FROM f
"""

QUERIES["mood_median_test"] = q_mood_median_test
_RAW_ORACLES["mood_median_test"] = SQL_MOOD_MEDIAN_TEST


def q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard over the same hour-binned user
    lifetimes as survival_km (Nelson Technometrics 1972; Aalen Ann.
    Stat. 1978 — the HAZARD-side dual of Kaplan-Meier: KM multiplies
    survival factors, NA adds d_i/n_i hazard increments, so NA has
    the smaller small-sample bias, carries the closed-form variance
    sum d_i/n_i^2 (Klein 1991), and its slope IS the hazard rate —
    the churn-intensity reading a retention feature wants; the
    Fleming-Harrington survival exp(-H) is reported beside KM's
    product for the standard cross-check). Reuses survival_km's
    lifetime construction verbatim (7-day censoring broadcast, hour
    bins); the curve frame is BOUNDED by the corpus span in hours,
    so the cumulative H and its variance are prefix folds over the
    collected bin-ascending array — each d_i/n_i one exact-long
    division, every prefix its own identical fold on BOTH engines
    (the tracking_signal O(B^2) convention). Returns the curve at
    every event bin."""
    from mpds_spark.operators.util import scratch_persist

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("__e"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("__us"),
    )
    mx = ev.agg(F.max("__us").alias("__mx"))
    sp = ev.groupBy("__e").agg(
        F.min("__us").alias("__s"), F.max("__us").alias("__t")
    )
    sv = sp.crossJoin(F.broadcast(mx)).select(
        F.expr("(__t - __s) div 3600000000").cast("long")
        .alias("__bin"),
        F.when(
            F.col("__t") <= F.col("__mx") - F.lit(604800000000),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__obs"),
    )
    curve = sv.groupBy("__bin").agg(
        F.sum("__obs").cast("long").alias("__d"),
        F.sum(F.lit(1) - F.col("__obs")).cast("long").alias("__c"),
    )
    one = curve.agg(
        F.sum(F.col("__d") + F.col("__c")).cast("long").alias("__n0"),
        F.array_sort(
            F.collect_list(F.struct("__bin", "__d", "__c"))
        ).alias("__a"),
    )
    # n_risk at bin k = n0 - sum_{j<k} (d_j + c_j); then H and its
    # variance are prefix folds of the exact d/r divisions
    one = one.withColumn(
        "__rw",
        F.expr(
            "transform(sequence(1, cast(size(__a) as int)), k ->"
            " named_struct("
            " 'bin', element_at(__a, k).__bin,"
            " 'd', element_at(__a, k).__d,"
            " 'r', __n0 - aggregate(slice(__a, 1, k - 1), 0L,"
            "   (acc, x) -> acc + x.__d + x.__c)))"
        ),
    )
    one = one.withColumn(
        "__rows",
        F.expr(
            "filter(transform(sequence(1, cast(size(__rw) as int)),"
            " k -> named_struct("
            " 'bin', element_at(__rw, k).bin,"
            " 'd', element_at(__rw, k).d,"
            " 'r', element_at(__rw, k).r,"
            " 'h', aggregate(slice(__rw, 1, k), 0.0D, (acc, x) ->"
            "  acc + IF(x.d > 0, cast(x.d as double)"
            "  / cast(x.r as double), 0.0D)),"
            " 'v', aggregate(slice(__rw, 1, k), 0.0D, (acc, x) ->"
            "  acc + IF(x.d > 0, cast(x.d as double)"
            "  / (cast(x.r as double) * cast(x.r as double)),"
            "  0.0D)))), p -> p.r > 0)"
        ),
    )
    out = one.select(F.explode("__rows").alias("__r")).select(
        F.expr("__r.bin").alias("duration_bin"),
        F.expr("__r.r").alias("n_risk"),
        F.expr("__r.d").alias("n_events"),
        _r6(F.expr("__r.h")).alias("na_cumhaz"),
        _r6(F.expr("__r.v")).alias("na_var"),
        _r6(F.exp(-F.expr("__r.h"))).alias("fh_survival"),
    )
    return out


SQL_NELSON_AALEN = """
WITH d AS (SELECT user_id AS e, epoch_us(ts) AS us FROM events),
mx AS (SELECT max(us) AS mx FROM d),
sp AS (SELECT e, min(us) AS s, max(us) AS t FROM d GROUP BY e),
sv AS (
  SELECT CAST((t - s) // 3600000000 AS BIGINT) AS bin,
    CASE WHEN t <= (SELECT mx FROM mx) - 604800000000
         THEN 1 ELSE 0 END AS obs
  FROM sp
), curve AS (
  SELECT bin, CAST(sum(obs) AS BIGINT) AS d_,
    CAST(sum(1 - obs) AS BIGINT) AS c_
  FROM sv GROUP BY bin
), one AS (
  SELECT CAST(sum(d_ + c_) AS BIGINT) AS n0,
    list({'bin': bin, 'd': d_, 'c': c_} ORDER BY bin) AS a
  FROM curve
), rw AS (
  SELECT n0,
    list_transform(range(1, CAST(len(a) + 1 AS INTEGER)), k -> {
      'bin': a[k].bin, 'd': a[k].d,
      'r': n0 - list_sum(list_prepend(CAST(0 AS BIGINT),
        list_transform(list_slice(a, 1, k - 1),
          x -> x.d + x.c)))}) AS w
  FROM one
), ex AS (
  SELECT
    unnest(list_transform(range(1, CAST(len(w) + 1 AS INTEGER)),
      k -> {
      'bin': w[k].bin, 'd': w[k].d, 'r': w[k].r,
      'h': list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(list_slice(w, 1, k), x ->
          CASE WHEN x.d > 0 THEN CAST(x.d AS DOUBLE)
            / CAST(x.r AS DOUBLE)
          ELSE 0.0 END))),
      'v': list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(list_slice(w, 1, k), x ->
          CASE WHEN x.d > 0 THEN CAST(x.d AS DOUBLE)
            / (CAST(x.r AS DOUBLE) * CAST(x.r AS DOUBLE))
          ELSE 0.0 END)))
    })) AS r
  FROM rw
)
SELECT r.bin AS duration_bin,
  CAST(r.r AS BIGINT) AS n_risk,
  CAST(r.d AS BIGINT) AS n_events,
  round(r.h, 6) AS na_cumhaz,
  round(r.v, 6) AS na_var,
  round(exp(-r.h), 6) AS fh_survival
FROM ex WHERE r.r > 0
"""

QUERIES["nelson_aalen"] = q_nelson_aalen
_RAW_ORACLES["nelson_aalen"] = SQL_NELSON_AALEN


def q_theta_forecast(spark, sf_dir):
    """Classical Theta-method 1/2/3-day-ahead forecasts of daily
    event volume (Assimakopoulos & Nikolopoulos IJF 2000 — the M3
    competition winner; Hyndman & Billah IJF 2003 proved it is SES
    with drift, which is why it pairs here with ses_alpha_grid and
    tracking_signal as the deployed-forecaster tier): theta-0 line =
    the OLS trend a + b t (durbin_watson's exact-integer machinery:
    a, b are exact-long ratios), theta-2 line = 2 y_t - (a + b t)
    (doubles via single exact divisions), SES(alpha = 0.3, seeded at
    the first element) smooths the theta-2 line — Spark folds
    slice(...) seeded with element 1, DuckDB list_reduce seeds
    natively, identical float sequences — and the h-step forecast
    averages the extrapolated theta-0 line with the theta-2 level.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
    ).selectExpr(
        "n_days", "__Sy",
        "transform(__a, e -> e.__y) AS __ys",
    )
    one = (
        one
        .withColumn("__St", F.expr("n_days * (n_days + 1) div 2"))
        .withColumn(
            "__St2",
            F.expr("n_days * (n_days + 1) * (2 * n_days + 1) div 6"),
        )
        .withColumn(
            "__Sty",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, t) ->"
                " acc + t * element_at(__ys, cast(t as int)))"
            ),
        )
    )
    one = (
        one
        .withColumn("__D", F.expr("n_days * __St2 - __St * __St"))
        .withColumn("__Nb", F.expr("n_days * __Sty - __St * __Sy"))
        .filter((F.col("n_days") > 2) & (F.col("__D") > 0))
        .withColumn(
            "__b", F.expr("cast(__Nb as double) / cast(__D as double)")
        )
        .withColumn(
            "__a0",
            F.expr(
                "(cast(__Sy as double) - (cast(__Nb as double)"
                " / cast(__D as double)) * cast(__St as double))"
                " / cast(n_days as double)"
            ),
        )
    )
    one = one.withColumn(
        "__t2",
        F.expr(
            "transform(sequence(1L, n_days), t ->"
            " 2.0D * cast(element_at(__ys, cast(t as int)) as double)"
            " - (__a0 + __b * cast(t as double)))"
        ),
    ).withColumn(
        "__l",
        F.expr(
            "aggregate(slice(__t2, 2, cast(n_days - 1 as int)),"
            " element_at(__t2, 1), (acc, v) ->"
            " 0.3D * v + 0.7D * acc)"
        ),
    )

    def fc(h):
        return _r6(
            F.lit(0.5)
            * (F.col("__a0")
               + F.col("__b")
               * (F.col("n_days") + F.lit(h)).cast("double"))
            + F.lit(0.5) * F.col("__l")
        ).alias(f"forecast_{h}")

    return one.select(
        "n_days",
        _r6(F.col("__b")).alias("trend_slope"),
        _r6(F.col("__a0")).alias("trend_intercept"),
        _r6(F.col("__l")).alias("theta2_level"),
        fc(1),
        fc(2),
        fc(3),
        _r6(
            F.expr(
                "cast(element_at(__ys, cast(n_days as int))"
                " as double)"
            )
        ).alias("naive_last"),
    )


SQL_THETA_FORECAST = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(y ORDER BY x) AS ys,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy
  FROM day
), mo AS (
  SELECT ys, n, Sy,
    n * (n + 1) // 2 AS St,
    n * (n + 1) * (2 * n + 1) // 6 AS St2,
    list_sum(list_transform(range(1, CAST(n + 1 AS INTEGER)),
      t -> t * ys[t])) AS Sty
  FROM one
), dd AS (
  SELECT ys, n, Sy, St,
    n * St2 - St * St AS D,
    n * Sty - St * Sy AS Nb
  FROM mo
), ab AS (
  SELECT ys, n,
    CAST(Nb AS DOUBLE) / CAST(D AS DOUBLE) AS b,
    (CAST(Sy AS DOUBLE) - (CAST(Nb AS DOUBLE) / CAST(D AS DOUBLE))
     * CAST(St AS DOUBLE)) / CAST(n AS DOUBLE) AS a0
  FROM dd WHERE n > 2 AND D > 0
), t2 AS (
  SELECT n, b, a0, ys,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), t ->
      2.0 * CAST(ys[t] AS DOUBLE)
      - (a0 + b * CAST(t AS DOUBLE))) AS th2
  FROM ab
), lv AS (
  SELECT n, b, a0, ys,
    list_reduce(th2, (acc, v) -> 0.3 * v + 0.7 * acc) AS l
  FROM t2
)
SELECT n AS n_days,
  round(b, 6) AS trend_slope,
  round(a0, 6) AS trend_intercept,
  round(l, 6) AS theta2_level,
  round(0.5 * (a0 + b * CAST(n + 1 AS DOUBLE)) + 0.5 * l, 6)
    AS forecast_1,
  round(0.5 * (a0 + b * CAST(n + 2 AS DOUBLE)) + 0.5 * l, 6)
    AS forecast_2,
  round(0.5 * (a0 + b * CAST(n + 3 AS DOUBLE)) + 0.5 * l, 6)
    AS forecast_3,
  round(CAST(ys[CAST(n AS INTEGER)] AS DOUBLE), 6) AS naive_last
FROM lv
"""

QUERIES["theta_forecast"] = q_theta_forecast
_RAW_ORACLES["theta_forecast"] = SQL_THETA_FORECAST


def q_allan_variance(spark, sf_dir):
    """Non-overlapping Allan variance of daily event volume at
    averaging times tau = 1, 2, 4 days (Allan Proc. IEEE 1966 — the
    clock-community's noise-type discriminator, and for event-rate
    telemetry the cleanest 'what KIND of noise is this?' instrument:
    white rate noise gives AVAR ~ tau^-1, flicker floors it flat,
    random-walk drift makes it RISE with tau — the log-log slope
    between consecutive taus routes directly to how long a rate
    feature may be averaged before drift dominates; the
    multi-resolution companion to variance_ratio and
    hurst_variance_plot). EVERYTHING is exact integers: block sums
    S_k are exact longs, AVAR(tau) = sum (S_k - S_{k-1})^2 /
    (2 (m-1) tau^2) is ONE exact-long division (the tau^2 from the
    block-mean denominators factors out), and only the reported
    ADEV = sqrt(AVAR) and the slope ln-ratio are IEEE doubles. ONE
    day aggregate; the 3 tau rows explode from the 1-row frame.
    2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__x")
    )
    day = ev.groupBy("__x").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.sort_array(
            F.collect_list(F.struct("__x", "__y"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    ).selectExpr(
        "n_days", "transform(__a, e -> e.__y) AS __ys"
    )
    # per-tau: m = n div tau blocks, S_k = sum of block k,
    # num = sum_{k>=2} (S_k - S_{k-1})^2  (exact longs)
    blk = (
        "aggregate(sequence(1L, {tau}L), 0L, (acc, j) -> acc"
        " + element_at(__ys, cast((k - 1) * {tau} + j as int)))"
    )
    row = (
        "named_struct('tau', {tau}L,"
        " 'm', n_days div {tau},"
        " 'num', aggregate(sequence(2L, n_days div {tau}), 0L,"
        " (acc, k) -> acc + ({sk} - {skm1}) * ({sk} - {skm1})))"
    )

    def mk(tau):
        sk = blk.format(tau=tau)
        skm1 = (
            "aggregate(sequence(1L, {tau}L), 0L, (acc, j) -> acc"
            " + element_at(__ys, cast((k - 2) * {tau} + j as int)))"
        ).format(tau=tau)
        return row.format(tau=tau, sk=sk, skm1=skm1)

    one = one.withColumn(
        "__rows",
        F.expr("array(" + ", ".join(mk(t) for t in (1, 2, 4)) + ")"),
    )
    out = one.select(
        "n_days", F.explode("__rows").alias("__r")
    ).select(
        "n_days",
        F.expr("__r.tau").alias("tau_days"),
        F.expr("__r.m").alias("m_blocks"),
        F.expr("__r.num").alias("diff2_sum"),
        _r6(
            F.expr(
                "cast(__r.num as double)"
                " / (2.0D * cast(__r.m - 1 as double)"
                " * cast(__r.tau * __r.tau as double))"
            )
        ).alias("avar"),
        _r6(
            F.sqrt(
                F.expr(
                    "cast(__r.num as double)"
                    " / (2.0D * cast(__r.m - 1 as double)"
                    " * cast(__r.tau * __r.tau as double))"
                )
            )
        ).alias("adev"),
    ).filter(F.col("m_blocks") > 1)
    return out


SQL_ALLAN_VARIANCE = """
WITH day AS (
  SELECT CAST(day(ts) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), one AS (
  SELECT list(y ORDER BY x) AS ys, CAST(count(*) AS BIGINT) AS n
  FROM day
), taus AS (
  SELECT n, ys, unnest([1, 2, 4]) AS tau FROM one
), rows_ AS (
  SELECT n, CAST(tau AS BIGINT) AS tau, n // tau AS m,
    list_sum(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(2, CAST(n // tau + 1 AS INTEGER)), k ->
        (list_sum(list_transform(range(1, tau + 1), j ->
           ys[(k - 1) * tau + j]))
         - list_sum(list_transform(range(1, tau + 1), j ->
           ys[(k - 2) * tau + j])))
        * (list_sum(list_transform(range(1, tau + 1), j ->
           ys[(k - 1) * tau + j]))
         - list_sum(list_transform(range(1, tau + 1), j ->
           ys[(k - 2) * tau + j])))))) AS num
  FROM taus
)
SELECT n AS n_days, tau AS tau_days, m AS m_blocks,
  CAST(num AS BIGINT) AS diff2_sum,
  round(CAST(num AS DOUBLE)
    / (2.0 * CAST(m - 1 AS DOUBLE) * CAST(tau * tau AS DOUBLE)), 6)
    AS avar,
  round(sqrt(CAST(num AS DOUBLE)
    / (2.0 * CAST(m - 1 AS DOUBLE) * CAST(tau * tau AS DOUBLE))), 6)
    AS adev
FROM rows_ WHERE m > 1
"""

QUERIES["allan_variance"] = q_allan_variance
_RAW_ORACLES["allan_variance"] = SQL_ALLAN_VARIANCE


def q_recurrence_quantification(spark, sf_dir):
    """Recurrence quantification of the daily volume series at the
    SampEn tolerance r = 0.5 * SD (Webber & Zbilut J. Appl. Physiol.
    1994; Marwan et al. Phys. Rep. 2007 — the recurrence-plot
    summary trio: RR = share of day pairs whose volumes recur within
    tolerance (the density sample_entropy's B count normalizes),
    DET = share of recurrent pairs sitting on a diagonal line of
    length >= 2 (recurring SEQUENCES, not just values — high DET
    with low RR is the signature of deterministic dynamics, the
    thing that makes tomorrow predictable from a matched history),
    and LMAX = the longest such diagonal, whose inverse estimates
    divergence). All pair predicates compare EXACT-INTEGER distances
    against the one deterministic IEEE tolerance (the sample_entropy
    convention), so the recurrence matrix is identical on BOTH
    engines and RR/DET/LMAX counts are EXACT LONGS from bounded
    O(n^2)/O(n^3) folds on the 1-row frame (n = 31 days -> <=27k
    fold steps, constant at any corpus size). 2 shuffles."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__y").cast("long").alias("__Sy"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__Syy"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__ss", F.expr("n_days * __Syy - __Sy * __Sy"))
        .filter("n_days > 4 AND n_days * __Syy - __Sy * __Sy > 0")
    )
    nd = F.col("n_days").cast("double")
    s = F.sqrt(
        F.col("__ss").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    one = one.withColumn("__rr_tol", F.lit(0.5) * s)
    rec = (
        "cast(abs(element_at(__yarr, cast({i} as int))"
        " - element_at(__yarr, cast({j} as int))) as double)"
        " <= __rr_tol"
    )
    r_ij = rec.format(i="i", j="j")
    r_n = rec.format(i="i + 1", j="j + 1")
    r_p = rec.format(i="i - 1", j="j - 1")
    one = (
        one
        .withColumn(
            "__nrec",
            F.expr(
                "aggregate(sequence(1L, n_days - 1), 0L, (ai, i) ->"
                " ai + aggregate(sequence(i + 1, n_days), 0L,"
                f" (aj, j) -> aj + IF({r_ij}, 1L, 0L)))"
            ),
        )
        .withColumn(
            "__ndet",
            F.expr(
                "aggregate(sequence(1L, n_days - 1), 0L, (ai, i) ->"
                " ai + aggregate(sequence(i + 1, n_days), 0L,"
                f" (aj, j) -> aj + IF(({r_ij}) AND ("
                f" (i < n_days AND j < n_days AND ({r_n}))"
                f" OR (i > 1 AND ({r_p}))"
                "), 1L, 0L)))"
            ),
        )
        .withColumn(
            # longest diagonal: for offset d and start s, the run
            # length is (first non-recurrent k >= s) - s
            "__lmax",
            F.expr(
                "aggregate(sequence(1L, n_days - 1), 0L, (am, d) ->"
                " greatest(am, aggregate("
                "  sequence(1L, n_days - d), 0L, (as_, s) ->"
                "  greatest(as_, aggregate("
                "   sequence(s, n_days - d), n_days - d + 1 - s,"
                "   (az, k) -> least(az, IF("
                + rec.format(i="k", j="k + d")
                + ", n_days - d + 1 - s, k - s)))))))"
            ),
        )
    )
    one = one.filter(F.col("__nrec") > 0)
    npairs = (
        F.col("n_days") * (F.col("n_days") - 1) / F.lit(2)
    ).cast("double")
    det = F.col("__ndet").cast("double") / F.col("__nrec").cast(
        "double"
    )
    return one.select(
        "n_days",
        _r6(F.col("__rr_tol")).alias("r_tol"),
        F.col("__nrec").alias("n_recurrent"),
        _r6(F.col("__nrec").cast("double") / npairs)
        .alias("recurrence_rate"),
        _r6(det).alias("determinism"),
        F.col("__lmax").alias("lmax"),
        F.when(det > 0.7, F.lit("deterministic"))
        .when(det < 0.3, F.lit("stochastic"))
        .otherwise(F.lit("mixed"))
        .alias("band"),
    )


SQL_RECURRENCE_QUANTIFICATION = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS Sy,
    CAST(sum(y * y) AS BIGINT) AS Syy,
    list(y ORDER BY day) AS yarr
  FROM day
), pre AS (
  SELECT n, yarr,
    0.5 * sqrt(CAST(n * Syy - Sy * Sy AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS r
  FROM one WHERE n > 4 AND n * Syy - Sy * Sy > 0
), cnt AS (
  SELECT n, r,
    list_sum(list_transform(range(1, n), i ->
      list_sum(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(i + 1, CAST(n + 1 AS INTEGER)), j ->
          CASE WHEN CAST(abs(yarr[i] - yarr[j]) AS DOUBLE) <= r
          THEN 1 ELSE 0 END))))) AS nrec,
    list_sum(list_transform(range(1, n), i ->
      list_sum(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(i + 1, CAST(n + 1 AS INTEGER)), j ->
          CASE WHEN CAST(abs(yarr[i] - yarr[j]) AS DOUBLE) <= r
            AND ((i < n AND j < n AND
              CAST(abs(yarr[i + 1] - yarr[j + 1]) AS DOUBLE) <= r)
             OR (i > 1 AND
              CAST(abs(yarr[i - 1] - yarr[j - 1]) AS DOUBLE) <= r))
          THEN 1 ELSE 0 END))))) AS ndet,
    list_max(list_transform(range(1, n), d ->
      list_max(list_transform(range(1, CAST(n - d + 1 AS INTEGER)),
        s -> list_reduce(list_prepend(n - d + 1 - s,
          list_transform(range(s, CAST(n - d + 1 AS INTEGER)), k ->
            CASE WHEN CAST(abs(yarr[k] - yarr[k + d]) AS DOUBLE)
              <= r THEN n - d + 1 - s ELSE k - s END)),
          (acc, v) -> least(acc, v)))))) AS lmax
  FROM pre
)
SELECT n AS n_days,
  round(r, 6) AS r_tol,
  CAST(nrec AS BIGINT) AS n_recurrent,
  round(CAST(nrec AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0), 6)
    AS recurrence_rate,
  round(CAST(ndet AS DOUBLE) / CAST(nrec AS DOUBLE), 6)
    AS determinism,
  CAST(lmax AS BIGINT) AS lmax,
  CASE WHEN CAST(ndet AS DOUBLE) / CAST(nrec AS DOUBLE) > 0.7
         THEN 'deterministic'
       WHEN CAST(ndet AS DOUBLE) / CAST(nrec AS DOUBLE) < 0.3
         THEN 'stochastic'
       ELSE 'mixed' END AS band
FROM cnt WHERE nrec > 0
"""

QUERIES["recurrence_quantification"] = q_recurrence_quantification
_RAW_ORACLES["recurrence_quantification"] = (
    SQL_RECURRENCE_QUANTIFICATION
)


def q_rare_word_profile(spark, sf_dir):
    """Honoré's R, Sichel's S and Brunet's W per source from the
    hapax end of the frequency spectrum (Honoré 1979; Sichel JRSS-A
    1975; Brunet 1978 — the RARE-word complement to yule_k's
    repeat-rate: K is driven by the most frequent words, these three
    are driven by words used once (V1) or twice (V2), which is
    where template expansion, boilerplate stuffing and synthetic
    text first distort a source's profile; R collapses when hapaxes
    vanish, S is the stable dis-legomena share Sichel showed is
    near-constant for natural prose, W is the length-robust
    vocabulary-richness constant). V, V1, V2, N are EXACT LONGS from
    ONE (source, word) aggregation re-grouped once; R = 100 ln N /
    (1 - V1/V) is exact divisions inside one ln; W = exp(ln N *
    exp(-0.165 ln V)) spells the fractional power out as exp/ln on
    BOTH engines (no pow(), whose libm paths differ). 2 shuffles at
    any corpus size."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__w"),
    )
    cells = d.groupBy("source", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    mom = cells.groupBy("source").agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("long").alias("v1"),
        F.sum(F.when(F.col("__c") == 2, 1).otherwise(0))
        .cast("long").alias("v2"),
    )
    mom = mom.filter(
        (F.col("n_tokens") > 1) & (F.col("vocab") > 1)
        & (F.col("v1") < F.col("vocab"))
    )
    nd = F.col("n_tokens").cast("double")
    vd = F.col("vocab").cast("double")
    honore = (F.lit(100.0) * F.log(nd)) / (
        F.lit(1.0) - F.col("v1").cast("double") / vd
    )
    sichel = F.col("v2").cast("double") / vd
    brunet = F.exp(
        F.log(nd) * F.exp(F.lit(-0.165) * F.log(vd))
    )
    return mom.select(
        "source", "n_tokens", "vocab", "v1", "v2",
        _r6(honore).alias("honore_r"),
        _r6(sichel).alias("sichel_s"),
        _r6(brunet).alias("brunet_w"),
    )


SQL_RARE_WORD_PROFILE = """
WITH d AS (
  SELECT source,
    unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
), cells AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY source, w
), mom AS (
  SELECT source,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS vocab,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM cells GROUP BY source
)
SELECT source, n_tokens, vocab, v1, v2,
  round((100.0 * ln(CAST(n_tokens AS DOUBLE)))
    / (1.0 - CAST(v1 AS DOUBLE) / CAST(vocab AS DOUBLE)), 6)
    AS honore_r,
  round(CAST(v2 AS DOUBLE) / CAST(vocab AS DOUBLE), 6) AS sichel_s,
  round(exp(ln(CAST(n_tokens AS DOUBLE))
    * exp(-0.165 * ln(CAST(vocab AS DOUBLE)))), 6) AS brunet_w
FROM mom
WHERE n_tokens > 1 AND vocab > 1 AND v1 < vocab
"""

QUERIES["rare_word_profile"] = q_rare_word_profile
_RAW_ORACLES["rare_word_profile"] = SQL_RARE_WORD_PROFILE


def q_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometric profile per source over the global
    top-20 words (Burrows LLC 2002; Evert et al. 2017 for the
    modern reading as a z-score L1 distance — THE attribution
    distance of computational stylometry: z-score each source's
    relative frequency of the most common words across sources,
    Delta(s, s') = mean |z_s - z_s'|; sources produced from one
    template sit at tiny Delta — the stylometric companion to
    cross_source_overlap's n-gram view, usable as dedup routing at
    the SOURCE level). The top-20 words are a TakeOrderedAndProject
    heap with (count DESC, word) tie-break; the <=20x20 cell grid
    and the <=20 source totals collect into ONE row, the z MATRIX is
    materialized ONCE (each entry one fold over the sorted grid, so
    both engines execute identical float sequences), and every Delta
    is a bounded fold over matrix lookups; per-source output reports
    the nearest and farthest other source with first-win tie-breaks
    over the source-ascending scan. 100-TB shape: the corpus is
    touched by ONE (source, word) agg; everything after runs on the
    bounded grid."""
    from mpds_spark.operators.util import scratch_persist

    d = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__w"),
    )
    cells = scratch_persist(
        d.groupBy("source", "__w").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
    )
    top = (
        cells.groupBy("__w")
        .agg(F.sum("__c").cast("long").alias("__tot"))
        .orderBy(F.desc("__tot"), "__w")
        .limit(20)
        .select("__w")
    )
    tot = cells.groupBy("source").agg(
        F.sum("__c").cast("long").alias("__n")
    )
    grid = cells.join(F.broadcast(top), "__w")
    one = grid.agg(
        F.array_sort(
            F.collect_list(F.struct("source", "__w", "__c"))
        ).alias("__g"),
    ).crossJoin(
        F.broadcast(
            tot.agg(
                F.array_sort(
                    F.collect_list(F.struct("source", "__n"))
                ).alias("__t"),
            )
        )
    )
    one = (
        one
        .withColumn(
            "__srcs",
            F.expr("transform(__t, x -> x.source)"),
        )
        .withColumn(
            "__words",
            F.expr("array_sort(array_distinct("
                   "transform(__g, x -> x.__w)))"),
        )
        .withColumn("__ns", F.expr("cast(size(__srcs) as long)"))
        .withColumn("__nw", F.expr("cast(size(__words) as long)"))
    )
    # frequency matrix f[si][wi] = c/n (0 when absent), ONE fold per
    # entry over the sorted grid
    one = one.withColumn(
        "__fm",
        F.expr(
            "transform(__srcs, s -> transform(__words, w ->"
            " aggregate(__g, 0.0D, (fa, fx) ->"
            "  fa + IF(fx.source = s AND fx.__w = w,"
            "  cast(fx.__c as double), 0.0D))"
            " / cast(aggregate(__t, 0L, (ga, gx) ->"
            "  ga + IF(gx.source = s, gx.__n, 0L)) as double)))"
        ),
    )
    one = scratch_persist(one)
    one = one.withColumn(
        "__mu",
        F.expr(
            "transform(sequence(1, cast(__nw as int)), wi ->"
            " aggregate(__fm, 0.0D, (acc, fr) ->"
            "  acc + element_at(fr, wi)) / cast(__ns as double))"
        ),
    ).withColumn(
        "__sd",
        F.expr(
            "transform(sequence(1, cast(__nw as int)), wi ->"
            " sqrt(aggregate(__fm, 0.0D, (acc, fr) ->"
            "  acc + (element_at(fr, wi) - element_at(__mu, wi))"
            "  * (element_at(fr, wi) - element_at(__mu, wi)))"
            " / cast(__ns - 1 as double)))"
        ),
    ).withColumn(
        "__zm",
        F.expr(
            "transform(__fm, fr ->"
            " transform(sequence(1, cast(__nw as int)), wi ->"
            "  (element_at(fr, wi) - element_at(__mu, wi))"
            "  / element_at(__sd, wi)))"
        ),
    )
    one = scratch_persist(one)
    delta = (
        "aggregate(sequence(1, cast(__nw as int)), 0.0D,"
        " (dacc, wi) -> dacc"
        " + abs(element_at(element_at(__zm, cast(i1 as int)), wi)"
        " - element_at(element_at(__zm, cast(i2 as int)), wi)))"
        " / cast(__nw as double)"
    )
    one = one.withColumn(
        "__pairs",
        F.expr(
            "flatten(transform(sequence(1, cast(__ns as int)),"
            " i1 -> transform("
            "  filter(sequence(1, cast(__ns as int)), i2 -> i2 != i1),"
            "  i2 -> named_struct("
            "   'src', element_at(__srcs, cast(i1 as int)),"
            "   'oth', element_at(__srcs, cast(i2 as int)),"
            f"   'd', {delta}))))"
        ),
    )
    pairs = one.select(F.explode("__pairs").alias("__p")).select(
        F.expr("__p.src").alias("source"),
        F.expr("__p.oth").alias("__oth"),
        F.expr("__p.d").alias("__d"),
    )
    wn = Window.partitionBy("source").orderBy("__d", "__oth")
    wf = Window.partitionBy("source").orderBy(
        F.desc("__d"), "__oth"
    )
    ranked = pairs.select(
        "source", "__oth", "__d",
        F.row_number().over(wn).alias("__rn"),
        F.row_number().over(wf).alias("__rf"),
    )
    near = ranked.filter(F.col("__rn") == 1).select(
        "source",
        F.col("__oth").alias("nearest_source"),
        _r6(F.col("__d")).alias("delta_min"),
    )
    far = ranked.filter(F.col("__rf") == 1).select(
        "source",
        F.col("__oth").alias("farthest_source"),
        _r6(F.col("__d")).alias("delta_max"),
    )
    return near.join(far, "source")


SQL_BURROWS_DELTA = """
WITH d AS (
  SELECT source,
    unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
), cells AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY source, w
), top AS (
  SELECT w FROM (
    SELECT w, CAST(sum(c) AS BIGINT) AS tot
    FROM cells GROUP BY w
  ) ORDER BY tot DESC, w LIMIT 20
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n
  FROM cells GROUP BY source
), one AS (
  SELECT
    (SELECT list({'source': source, 'w': w, 'c': c}
       ORDER BY source, w)
     FROM cells WHERE w IN (SELECT w FROM top)) AS g,
    (SELECT list({'source': source, 'n': n} ORDER BY source)
     FROM tot) AS t
), pre AS (
  SELECT g, t,
    list_transform(t, x -> x.source) AS srcs,
    list_sort(list_distinct(list_transform(g, x -> x.w)))
      AS words,
    CAST(len(t) AS BIGINT) AS ns
  FROM one
), fm AS MATERIALIZED (
  SELECT g, t, srcs, words, ns,
    CAST(len(words) AS BIGINT) AS nw,
    list_transform(srcs, s -> list_transform(words, w ->
      list_sum(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(g, fx -> CASE WHEN fx.source = s
          AND fx.w = w THEN CAST(fx.c AS DOUBLE)
          ELSE 0.0 END)))
      / CAST(list_sum(list_transform(t, gx ->
          CASE WHEN gx.source = s THEN gx.n ELSE 0 END))
        AS DOUBLE))) AS f
  FROM pre
), mu AS MATERIALIZED (
  SELECT srcs, ns, nw, f,
    list_transform(range(1, CAST(nw + 1 AS INTEGER)), wi ->
      list_sum(list_transform(f, fr -> fr[wi]))
      / CAST(ns AS DOUBLE)) AS mus
  FROM fm
), sd AS MATERIALIZED (
  SELECT srcs, ns, nw, f, mus,
    list_transform(range(1, CAST(nw + 1 AS INTEGER)), wi ->
      sqrt(list_sum(list_transform(f, fr ->
        (fr[wi] - mus[wi]) * (fr[wi] - mus[wi])))
      / CAST(ns - 1 AS DOUBLE))) AS sds
  FROM mu
), zm AS MATERIALIZED (
  SELECT srcs, ns, nw,
    list_transform(f, fr ->
      list_transform(range(1, CAST(nw + 1 AS INTEGER)), wi ->
        (fr[wi] - mus[wi]) / sds[wi])) AS z
  FROM sd
), pairs AS (
  SELECT
    unnest(flatten(list_transform(range(1, CAST(ns + 1 AS INTEGER)),
      i1 -> list_transform(
        list_filter(range(1, CAST(ns + 1 AS INTEGER)),
          i2 -> i2 != i1), i2 -> {
        'src': srcs[i1], 'oth': srcs[i2],
        'd': list_sum(list_transform(
          range(1, CAST(nw + 1 AS INTEGER)), wi ->
          abs(z[i1][wi] - z[i2][wi]))) / CAST(nw AS DOUBLE)}))))
      AS p
  FROM zm
), flat AS (
  SELECT p.src AS source, p.oth AS oth, p.d AS d FROM pairs
), ranked AS (
  SELECT source, oth, d,
    row_number() OVER (PARTITION BY source ORDER BY d, oth) AS rn,
    row_number() OVER (PARTITION BY source ORDER BY d DESC, oth)
      AS rf
  FROM flat
)
SELECT n.source AS source,
  n.oth AS nearest_source,
  round(n.d, 6) AS delta_min,
  f.oth AS farthest_source,
  round(f.d, 6) AS delta_max
FROM (SELECT * FROM ranked WHERE rn = 1) n
JOIN (SELECT * FROM ranked WHERE rf = 1) f USING (source)
"""


QUERIES["burrows_delta"] = q_burrows_delta
_RAW_ORACLES["burrows_delta"] = SQL_BURROWS_DELTA


def q_turning_points(spark, sf_dir):
    """Turning-points test of randomness on daily event volume
    (Kendall & Stuart 'The Advanced Theory of Statistics' vol. 3;
    Brockwell & Davis ITSF §1.6 — the cheapest IID screen in the
    residual-diagnostics toolbox: count local peaks and troughs; an
    IID series has E[T] = 2(n-2)/3 with Var = (16n-29)/90, too FEW
    turning points means positive serial correlation (the series is
    smoother than chance — exactly what durbin_watson/ljung_box then
    quantify), too MANY means negative/oscillatory structure; run
    it FIRST because it needs no moments, no ranks and no
    distributional assumptions). T is an EXACT LONG from one strict
    peak/trough fold over the <=31-day array ((y_t - y_{t-1}) *
    (y_t - y_{t+1}) > 0), the null moments are exact-integer
    formulas, z one fixed expression. 2 shuffles at any corpus
    size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__yarr", F.expr("transform(__a, s -> s.__y)")
    ).filter(F.col("n_days") > 3)
    one = one.withColumn(
        "__t",
        F.expr(
            "aggregate(sequence(2L, n_days - 1), 0L, (acc, t) ->"
            " acc + IF((element_at(__yarr, cast(t as int))"
            " - element_at(__yarr, cast(t - 1 as int)))"
            " * (element_at(__yarr, cast(t as int))"
            " - element_at(__yarr, cast(t + 1 as int))) > 0,"
            " 1L, 0L))"
        ),
    )
    nd = F.col("n_days").cast("double")
    e = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    v = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    z = (F.col("__t").cast("double") - e) / F.sqrt(v)
    return one.select(
        "n_days",
        F.col("__t").alias("n_turning"),
        _r6(e).alias("expected"),
        _r6(v).alias("variance"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z < 0.0, F.lit("too_smooth"))
        .when(z > 0.0, F.lit("too_oscillatory"))
        .otherwise(F.lit("iid_like"))
        .alias("verdict"),
    )


SQL_TURNING_POINTS = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), f AS (
  SELECT n,
    list_sum(list_transform(range(2, CAST(n AS INTEGER)), t ->
      CASE WHEN (yarr[t] - yarr[t - 1])
                * (yarr[t] - yarr[t + 1]) > 0
      THEN 1 ELSE 0 END)) AS tp
  FROM one WHERE n > 3
)
SELECT n AS n_days,
  CAST(tp AS BIGINT) AS n_turning,
  round(2.0 * CAST(n - 2 AS DOUBLE) / 3.0, 6) AS expected,
  round((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0, 6) AS variance,
  round((CAST(tp AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
    / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) AS z_stat,
  (abs((CAST(tp AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
    / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)) > 1.96)
    AS reject_5pct,
  CASE WHEN (CAST(tp AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
    < 0 THEN 'too_smooth'
       WHEN (CAST(tp AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
    > 0 THEN 'too_oscillatory'
       ELSE 'iid_like' END AS verdict
FROM f
"""

QUERIES["turning_points"] = q_turning_points
_RAW_ORACLES["turning_points"] = SQL_TURNING_POINTS


def q_difference_sign(spark, sf_dir):
    """Difference-sign test of trend on daily event volume
    (Brockwell & Davis ITSF §1.6; Kendall & Stuart — the companion
    count to turning_points: S = #{t : y_t > y_{t-1}} has
    E[S] = (n-1)/2 and Var = (n+1)/12 under IID, an excess of
    up-steps is a monotone-trend signal (the sign-only shadow of
    mann_kendall, which it cross-checks for free) while a DEFICIT
    with a flat mann_kendall flags sawtooth structure — and the
    classic caveat that strong seasonality fools this test is
    itself informative next to hourly_seasonality). S is an EXACT
    LONG from one strict-increase fold over the <=31-day array; the
    null moments are exact-integer formulas; z one fixed
    expression. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__yarr", F.expr("transform(__a, s -> s.__y)")
    ).filter(F.col("n_days") > 2)
    one = one.withColumn(
        "__s",
        F.expr(
            "aggregate(sequence(2L, n_days), 0L, (acc, t) ->"
            " acc + IF(element_at(__yarr, cast(t as int))"
            " > element_at(__yarr, cast(t - 1 as int)), 1L, 0L))"
        ),
    )
    nd = F.col("n_days").cast("double")
    e = (nd - F.lit(1.0)) / F.lit(2.0)
    v = (nd + F.lit(1.0)) / F.lit(12.0)
    z = (F.col("__s").cast("double") - e) / F.sqrt(v)
    return one.select(
        "n_days",
        F.col("__s").alias("n_up_steps"),
        _r6(e).alias("expected"),
        _r6(v).alias("variance"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z > 0.0, F.lit("upward_trend"))
        .when(z < 0.0, F.lit("downward_trend"))
        .otherwise(F.lit("no_trend"))
        .alias("verdict"),
    )


SQL_DIFFERENCE_SIGN = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), f AS (
  SELECT n,
    list_sum(list_transform(range(2, CAST(n + 1 AS INTEGER)), t ->
      CASE WHEN yarr[t] > yarr[t - 1] THEN 1 ELSE 0 END)) AS s
  FROM one WHERE n > 2
)
SELECT n AS n_days,
  CAST(s AS BIGINT) AS n_up_steps,
  round(CAST(n - 1 AS DOUBLE) / 2.0, 6) AS expected,
  round(CAST(n + 1 AS DOUBLE) / 12.0, 6) AS variance,
  round((CAST(s AS DOUBLE) - CAST(n - 1 AS DOUBLE) / 2.0)
    / sqrt(CAST(n + 1 AS DOUBLE) / 12.0), 6) AS z_stat,
  (abs((CAST(s AS DOUBLE) - CAST(n - 1 AS DOUBLE) / 2.0)
    / sqrt(CAST(n + 1 AS DOUBLE) / 12.0)) > 1.96) AS reject_5pct,
  CASE WHEN CAST(s AS DOUBLE) > CAST(n - 1 AS DOUBLE) / 2.0
         THEN 'upward_trend'
       WHEN CAST(s AS DOUBLE) < CAST(n - 1 AS DOUBLE) / 2.0
         THEN 'downward_trend'
       ELSE 'no_trend' END AS verdict
FROM f
"""

QUERIES["difference_sign"] = q_difference_sign
_RAW_ORACLES["difference_sign"] = SQL_DIFFERENCE_SIGN


def q_cox_stuart(spark, sf_dir):
    """Cox-Stuart sign test for trend on daily event volume (Cox &
    Stuart Biometrika 1955 — the long-HORIZON trend screen that
    complements difference_sign's step-level view: pair day i with
    day i + n/2 and count how often the later half wins; because
    each comparison spans half the series it is immune to the
    sawtooth/seasonal structure that fools step-wise tests, and
    with ties dropped it is an exact binomial sign test). The win
    count S+ and the non-tied pair count m are EXACT LONGS from one
    fold over the <=31-day array (c = n div 2 offset, the odd
    middle day dropped per the original paper); the normal
    approximation z = (2 S+ - m)/sqrt(m) is one fixed expression of
    exact-long casts. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__c", F.expr("n_days div 2"))
        .filter(F.col("n_days") > 3)
    )
    cmpv = (
        "element_at(__yarr, cast(i + __c as int))"
        " {op} element_at(__yarr, cast(i as int))"
    )
    one = (
        one
        .withColumn(
            "__sp",
            F.expr(
                "aggregate(sequence(1L, __c), 0L, (acc, i) ->"
                f" acc + IF({cmpv.format(op='>')}, 1L, 0L))"
            ),
        )
        .withColumn(
            "__m",
            F.expr(
                "aggregate(sequence(1L, __c), 0L, (acc, i) ->"
                f" acc + IF({cmpv.format(op='!=')}, 1L, 0L))"
            ),
        )
    )
    one = one.filter(F.col("__m") > 0)
    z = (
        (F.lit(2) * F.col("__sp") - F.col("__m")).cast("double")
        / F.sqrt(F.col("__m").cast("double"))
    )
    return one.select(
        "n_days",
        F.col("__c").alias("offset"),
        F.col("__m").alias("n_pairs"),
        F.col("__sp").alias("n_later_wins"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z > 0.0, F.lit("upward_trend"))
        .when(z < 0.0, F.lit("downward_trend"))
        .otherwise(F.lit("no_trend"))
        .alias("verdict"),
    )


SQL_COX_STUART = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), f AS (
  SELECT n, n // 2 AS c,
    list_sum(list_transform(range(1, CAST(n // 2 + 1 AS INTEGER)),
      i -> CASE WHEN yarr[i + n // 2] > yarr[i]
           THEN 1 ELSE 0 END)) AS sp,
    list_sum(list_transform(range(1, CAST(n // 2 + 1 AS INTEGER)),
      i -> CASE WHEN yarr[i + n // 2] != yarr[i]
           THEN 1 ELSE 0 END)) AS m
  FROM one WHERE n > 3
)
SELECT n AS n_days, c AS offset,
  CAST(m AS BIGINT) AS n_pairs,
  CAST(sp AS BIGINT) AS n_later_wins,
  round(CAST(2 * sp - m AS DOUBLE) / sqrt(CAST(m AS DOUBLE)), 6)
    AS z_stat,
  (abs(CAST(2 * sp - m AS DOUBLE) / sqrt(CAST(m AS DOUBLE)))
   > 1.96) AS reject_5pct,
  CASE WHEN 2 * sp > m THEN 'upward_trend'
       WHEN 2 * sp < m THEN 'downward_trend'
       ELSE 'no_trend' END AS verdict
FROM f WHERE m > 0
"""

QUERIES["cox_stuart"] = q_cox_stuart
_RAW_ORACLES["cox_stuart"] = SQL_COX_STUART


def q_bartels_rank(spark, sf_dir):
    """Bartels' rank version of the von Neumann ratio on daily event
    volume (Bartels JASA 1982 — the RANK-robust successor to the
    parametric von Neumann/Durbin-Watson family: RVN = sum (R_t -
    R_{t+1})^2 / sum (R_t - Rbar)^2 over the midranks of the daily
    volumes, so a single outlier day cannot dominate the
    numerator the way it does in durbin_watson's residual squares;
    RVN ~ 2 under randomness, below 2 = positive dependence). With
    DOUBLED midranks 2R_t = #(y_j < y_t) + #(y_j <= y_t) + 1 (exact
    integers from bounded O(n^2) folds) and 2*Rbar = n+1, BOTH sums
    are EXACT LONGS — the doubling cancels, RVN is ONE exact-long
    division, and the asymptotic variance 4(n-2)(5n^2-2n-9) /
    (5n(n+1)(n-1)^2) (Bartels 1982, eq. 6) is an exact-integer
    ratio. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = one.withColumn(
        "__yarr", F.expr("transform(__a, s -> s.__y)")
    ).filter(F.col("n_days") > 3)
    one = one.withColumn(
        "__r2",
        F.expr(
            "transform(sequence(1L, n_days), t ->"
            " aggregate(__yarr, 1L, (acc, v) -> acc"
            " + IF(v < element_at(__yarr, cast(t as int)), 2L,"
            "   IF(v = element_at(__yarr, cast(t as int)), 1L, 0L))))"
        ),
    )
    # __r2[t] = 2*midrank: lt + le + 1 = (2*lt + ties) + 1 where the
    # fold adds 2 per strictly-smaller and 1 per equal (incl. self)
    one = (
        one
        .withColumn(
            "__num",
            F.expr(
                "aggregate(sequence(1L, n_days - 1), 0L, (acc, t) ->"
                " acc + (element_at(__r2, cast(t as int))"
                " - element_at(__r2, cast(t + 1 as int)))"
                " * (element_at(__r2, cast(t as int))"
                " - element_at(__r2, cast(t + 1 as int))))"
            ),
        )
        .withColumn(
            "__den",
            F.expr(
                "aggregate(__r2, 0L, (acc, r) ->"
                " acc + (r - (n_days + 1)) * (r - (n_days + 1)))"
            ),
        )
    )
    one = one.filter(F.col("__den") > 0)
    rvn = F.col("__num").cast("double") / F.col("__den").cast(
        "double"
    )
    nd = F.col("n_days").cast("double")
    var = (
        F.lit(4.0) * (nd - 2) * (F.lit(5.0) * nd * nd - 2 * nd - 9)
    ) / (F.lit(5.0) * nd * (nd + 1) * (nd - 1) * (nd - 1))
    z = (rvn - F.lit(2.0)) / F.sqrt(var)
    return one.select(
        "n_days",
        _r6(rvn).alias("rvn"),
        _r6(var).alias("variance"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z < 0.0, F.lit("positive_dependence"))
        .when(z > 0.0, F.lit("negative_dependence"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


SQL_BARTELS_RANK = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), rr AS (
  SELECT n, yarr,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), t ->
      list_sum(list_transform(yarr, v ->
        CASE WHEN v < yarr[t] THEN 2
             WHEN v = yarr[t] THEN 1
             ELSE 0 END)) + 1) AS r2
  FROM one WHERE n > 3
), f AS (
  SELECT n,
    list_sum(list_transform(range(1, CAST(n AS INTEGER)), t ->
      (r2[t] - r2[t + 1]) * (r2[t] - r2[t + 1]))) AS num,
    list_sum(list_transform(r2, r ->
      (r - (n + 1)) * (r - (n + 1)))) AS den
  FROM rr
)
SELECT n AS n_days,
  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS rvn,
  round(4.0 * CAST(n - 2 AS DOUBLE)
    * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       - 2.0 * CAST(n AS DOUBLE) - 9.0)
    / (5.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
       * CAST(n - 1 AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
    AS variance,
  round((CAST(num AS DOUBLE) / CAST(den AS DOUBLE) - 2.0)
    / sqrt(4.0 * CAST(n - 2 AS DOUBLE)
    * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       - 2.0 * CAST(n AS DOUBLE) - 9.0)
    / (5.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
       * CAST(n - 1 AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
    AS z_stat,
  (abs((CAST(num AS DOUBLE) / CAST(den AS DOUBLE) - 2.0)
    / sqrt(4.0 * CAST(n - 2 AS DOUBLE)
    * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       - 2.0 * CAST(n AS DOUBLE) - 9.0)
    / (5.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
       * CAST(n - 1 AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) > 1.96)
    AS reject_5pct,
  CASE WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) < 2.0
         THEN 'positive_dependence'
       WHEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) > 2.0
         THEN 'negative_dependence'
       ELSE 'random' END AS verdict
FROM f WHERE den > 0
"""

QUERIES["bartels_rank"] = q_bartels_rank
_RAW_ORACLES["bartels_rank"] = SQL_BARTELS_RANK
def _daily_partial_sums(spark, sf_dir):
    """Shared 1-row frame for the partial-sum homogeneity screens:
    daily event volumes y_1..y_n (EXACT LONGS, day-ascending) plus
    tot = sum y, ssq = sum y^2, q = n*ssq - tot^2 (= n^2 * Dx^2 with
    Dx the n-denominator std) and the adjusted partial sums
    a_k = n*P_k - k*tot = n * S_k for k = 1..n-1 (S_k the classical
    cumulative deviation sum_{i<=k}(y_i - ybar)) — every quantity an
    EXACT LONG, so the downstream Buishand/SNHT statistics are fixed
    expression trees over exact integers. 2 shuffles at any corpus
    size (day agg + 1-row agg)."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn(
            "__dayarr", F.expr("transform(__a, s -> s.__day)")
        )
        .filter(F.col("n_days") > 3)
        .withColumn(
            "__tot",
            F.expr("aggregate(__yarr, 0L, (acc, v) -> acc + v)"),
        )
        .withColumn(
            "__ssq",
            F.expr(
                "aggregate(__yarr, 0L, (acc, v) -> acc + v * v)"
            ),
        )
        .withColumn(
            "__q", F.expr("n_days * __ssq - __tot * __tot")
        )
        .filter(F.col("__q") > 0)
        .withColumn(
            "__ak",
            F.expr(
                "transform(sequence(1L, n_days - 1), k ->"
                " n_days * aggregate(slice(__yarr, 1,"
                " cast(k as int)), 0L, (acc, v) -> acc + v)"
                " - k * __tot)"
            ),
        )
    )
    return one


_SQL_DAILY_PARTIAL_SUMS = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr,
    list(day ORDER BY day) AS dayarr
  FROM day
), base AS (
  SELECT n, yarr, dayarr,
    CAST(list_sum(yarr) AS BIGINT) AS tot,
    CAST(list_sum(list_transform(yarr, v -> v * v)) AS BIGINT)
      AS ssq
  FROM one WHERE n > 3
), wq AS (
  SELECT *, n * ssq - tot * tot AS qq FROM base
), ps AS (
  SELECT n, dayarr, qq,
    list_transform(range(1, CAST(n AS INTEGER)), k ->
      n * CAST(list_sum(yarr[1:k]) AS BIGINT) - k * tot) AS a
  FROM wq WHERE qq > 0
)
"""


def q_buishand_range(spark, sf_dir):
    """Buishand rescaled adjusted range test for homogeneity of
    daily event volume (Buishand J. Hydrology 1982 — the PARTIAL-SUM
    break detector that complements the rank-based pettitt_test and
    the sequential cusum_changepoint: cumulative deviations S_k from
    the global mean drift systematically away from 0 when the level
    shifts, so R = max S - min S rescaled by Dx*sqrt(n) is large
    under a break; Buishand's U adds the mean-square version that is
    more sensitive to mid-series shifts). With a_k = n*S_k EXACT
    LONGS (see _daily_partial_sums), R/(Dx sqrt(n)) = (max a - min a)
    / sqrt(n*q) and U = sum a_k^2 / (q*n*(n+1)) are each ONE
    division of exact longs; the changepoint candidate is the
    argmax-|a_k| day (first on ties, an exact-integer argmax). The
    5pct critical value 1.55 is Buishand's tabulated n=30 point for
    R/(Dx sqrt(n)). 2 shuffles at any corpus size."""
    one = _daily_partial_sums(spark, sf_dir)
    one = (
        one
        .withColumn(
            "__rng",
            F.expr(
                "greatest(array_max(__ak), 0L)"
                " - least(array_min(__ak), 0L)"
            ),
        )
        .withColumn(
            "__sa2",
            F.expr(
                "aggregate(__ak, 0L, (acc, x) -> acc + x * x)"
            ),
        )
        .withColumn(
            "__absa", F.expr("transform(__ak, x -> abs(x))")
        )
        .withColumn(
            "__cpk",
            F.expr("array_position(__absa, array_max(__absa))"),
        )
    )
    r = F.col("__rng").cast("double") / F.sqrt(
        (F.col("n_days") * F.col("__q")).cast("double")
    )
    u = F.col("__sa2").cast("double") / (
        F.col("__q") * F.col("n_days") * (F.col("n_days") + 1)
    ).cast("double")
    return one.select(
        "n_days",
        _r6(r).alias("r_stat"),
        _r6(u).alias("u_stat"),
        F.expr(
            "element_at(__dayarr, cast(__cpk as int))"
        ).alias("cp_day"),
        (r > F.lit(1.55)).alias("reject_5pct"),
        F.when(r > 1.55, F.lit("changepoint"))
        .otherwise(F.lit("homogeneous"))
        .alias("verdict"),
    )


SQL_BUISHAND_RANGE = (
    _SQL_DAILY_PARTIAL_SUMS
    + """
SELECT n AS n_days,
  round(CAST(greatest(list_max(a), 0) - least(list_min(a), 0)
    AS DOUBLE) / sqrt(CAST(n * qq AS DOUBLE)), 6) AS r_stat,
  round(CAST(list_sum(list_transform(a, x -> x * x)) AS DOUBLE)
    / CAST(qq * n * (n + 1) AS DOUBLE), 6) AS u_stat,
  CAST(dayarr[CAST(list_position(list_transform(a, x -> abs(x)),
    list_max(list_transform(a, x -> abs(x)))) AS INTEGER)]
    AS BIGINT) AS cp_day,
  (CAST(greatest(list_max(a), 0) - least(list_min(a), 0) AS DOUBLE)
    / sqrt(CAST(n * qq AS DOUBLE)) > 1.55) AS reject_5pct,
  CASE WHEN CAST(greatest(list_max(a), 0) - least(list_min(a), 0)
    AS DOUBLE) / sqrt(CAST(n * qq AS DOUBLE)) > 1.55
    THEN 'changepoint' ELSE 'homogeneous' END AS verdict
FROM ps
"""
)

QUERIES["buishand_range"] = q_buishand_range
_RAW_ORACLES["buishand_range"] = SQL_BUISHAND_RANGE


def q_snht_test(spark, sf_dir):
    """Standard Normal Homogeneity Test on daily event volume
    (Alexandersson J. Climatology 1986 — the LIKELIHOOD-flavored
    break detector in the homogeneity trio: T_k = k*z1bar^2 +
    (n-k)*z2bar^2 compares the standardized means of the two
    segments around every candidate split, so unlike buishand_range
    (max cumulative drift) and pettitt_test (rank shift) it weights
    breaks near the series ENDS most strongly — run all three and
    agreeing change days are trustworthy). With a_k = n*S_k EXACT
    LONGS, T_k collapses to n*a_k^2 / (q*k*(n-k)) — each candidate
    ONE identically-associated double expression over exact longs,
    so T0 = max_k T_k and the argmax day are bit-identical across
    engines (first-match argmax via array_position on equal
    doubles). The 5pct critical value 7.65 is the tabulated n=30
    point (Khaliq & Ouarda Int. J. Climatology 2007). 2 shuffles at
    any corpus size."""
    one = _daily_partial_sums(spark, sf_dir)
    one = (
        one
        .withColumn(
            "__tarr",
            F.expr(
                "transform(sequence(1L, n_days - 1), k ->"
                " cast(element_at(__ak, cast(k as int)) as double)"
                " * cast(element_at(__ak, cast(k as int))"
                " as double)"
                " * cast(n_days as double)"
                " / (cast(__q as double) * cast(k as double)"
                " * cast(n_days - k as double)))"
            ),
        )
        .withColumn("__t0", F.expr("array_max(__tarr)"))
        .withColumn(
            "__cpk", F.expr("array_position(__tarr, __t0)")
        )
    )
    t0 = F.col("__t0")
    return one.select(
        "n_days",
        _r6(t0).alias("t0_stat"),
        F.expr(
            "element_at(__dayarr, cast(__cpk as int))"
        ).alias("cp_day"),
        (t0 > F.lit(7.65)).alias("reject_5pct"),
        F.when(t0 > 7.65, F.lit("changepoint"))
        .otherwise(F.lit("homogeneous"))
        .alias("verdict"),
    )


SQL_SNHT_TEST = (
    _SQL_DAILY_PARTIAL_SUMS
    + """
, tk AS (
  SELECT n, dayarr,
    list_transform(range(1, CAST(n AS INTEGER)), k ->
      CAST(a[k] AS DOUBLE) * CAST(a[k] AS DOUBLE)
      * CAST(n AS DOUBLE)
      / (CAST(qq AS DOUBLE) * CAST(k AS DOUBLE)
         * CAST(n - k AS DOUBLE))) AS t
  FROM ps
)
SELECT n AS n_days,
  round(list_max(t), 6) AS t0_stat,
  CAST(dayarr[CAST(list_position(t, list_max(t)) AS INTEGER)]
    AS BIGINT) AS cp_day,
  (list_max(t) > 7.65) AS reject_5pct,
  CASE WHEN list_max(t) > 7.65 THEN 'changepoint'
       ELSE 'homogeneous' END AS verdict
FROM tk
"""
)

QUERIES["snht_test"] = q_snht_test
_RAW_ORACLES["snht_test"] = SQL_SNHT_TEST
def q_jonckheere_terpstra(spark, sf_dir):
    """Jonckheere-Terpstra test for an ORDERED trend in daily event
    volume across week-of-month groups (Jonckheere Biometrika 1954;
    Terpstra 1952; tie-corrected null variance per Hollander &
    Wolfe 'Nonparametric Statistical Methods' §6.2 — the ordered-
    alternative upgrade of kruskal_wallis: when the hypothesis is
    week1 <= week2 <= ... rather than 'some week differs', summing
    the pairwise Mann-Whitney counts over ordered group pairs
    concentrates power on the monotone alternative, the grouped
    complement of mann_kendall's pair test). DOUBLED statistic
    2J = sum over cross-group day pairs of 2*I(y_early < y_late) +
    I(tie) is an EXACT LONG from one nested fold over the <=31-day
    array; the tie-corrected variance needs only the per-element
    group-size and value-tie-count arrays g_i, c_i (exact equality
    folds; sum over elements of (g-1)(2g+5) etc. reproduces the
    group-keyed tie sums exactly), so E[J] and Var[J] are fixed
    expressions of exact longs. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn(
            "__warr",
            F.expr("transform(__a, s -> (s.__day - 1L) div 7L)"),
        )
        .filter(F.col("n_days") > 3)
        .withColumn(
            "__g",
            F.expr(
                "transform(__warr, w -> aggregate(__warr, 0L,"
                " (acc, x) -> acc + IF(x = w, 1L, 0L)))"
            ),
        )
        .withColumn(
            "__c",
            F.expr(
                "transform(__yarr, y -> aggregate(__yarr, 0L,"
                " (acc, x) -> acc + IF(x = y, 1L, 0L)))"
            ),
        )
        .withColumn(
            "__j2",
            F.expr(
                "aggregate(sequence(1L, n_days - 1), 0L,"
                " (acc, i) -> acc + aggregate("
                " sequence(i + 1, n_days), 0L, (a2, j) -> a2 +"
                " IF(element_at(__warr, cast(i as int))"
                "    < element_at(__warr, cast(j as int)),"
                "  IF(element_at(__yarr, cast(i as int))"
                "     < element_at(__yarr, cast(j as int)), 2L,"
                "   IF(element_at(__yarr, cast(i as int))"
                "      = element_at(__yarr, cast(j as int)),"
                "    1L, 0L)), 0L)))"
            ),
        )
        .withColumn(
            "__sg", F.expr("aggregate(__g, 0L, (acc, v) -> acc + v)")
        )
        .withColumn(
            "__a1",
            F.expr(
                "aggregate(__g, 0L, (acc, v) -> acc"
                " + (v - 1L) * (2L * v + 5L))"
            ),
        )
        .withColumn(
            "__b1",
            F.expr(
                "aggregate(__c, 0L, (acc, v) -> acc"
                " + (v - 1L) * (2L * v + 5L))"
            ),
        )
        .withColumn(
            "__a2",
            F.expr(
                "aggregate(__g, 0L, (acc, v) -> acc"
                " + (v - 1L) * (v - 2L))"
            ),
        )
        .withColumn(
            "__b2",
            F.expr(
                "aggregate(__c, 0L, (acc, v) -> acc"
                " + (v - 1L) * (v - 2L))"
            ),
        )
        .withColumn(
            "__a3",
            F.expr("aggregate(__g, 0L, (acc, v) -> acc + v - 1L)"),
        )
        .withColumn(
            "__b3",
            F.expr("aggregate(__c, 0L, (acc, v) -> acc + v - 1L)"),
        )
        .withColumn(
            "__ngrp",
            F.expr("size(array_distinct(__warr))"),
        )
    )
    n = F.col("n_days")
    var = (
        (
            n * (n - 1) * (2 * n + 5)
            - F.col("__a1")
            - F.col("__b1")
        ).cast("double")
        / F.lit(72.0)
        + (F.col("__a2") * F.col("__b2")).cast("double")
        / (F.lit(36) * n * (n - 1) * (n - 2)).cast("double")
        + (F.col("__a3") * F.col("__b3")).cast("double")
        / (F.lit(8) * n * (n - 1)).cast("double")
    )
    j = F.col("__j2").cast("double") / F.lit(2.0)
    e = (n * n - F.col("__sg")).cast("double") / F.lit(4.0)
    z = (j - e) / F.sqrt(var)
    one = one.filter(F.col("__ngrp") >= 2)
    return one.select(
        "n_days",
        F.col("__ngrp").cast("long").alias("n_groups"),
        _r6(j).alias("j_stat"),
        _r6(e).alias("e_j"),
        _r6(var).alias("var_j"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z > 0.0, F.lit("increasing_weeks"))
        .when(z < 0.0, F.lit("decreasing_weeks"))
        .otherwise(F.lit("no_trend"))
        .alias("verdict"),
    )


SQL_JONCKHEERE = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr,
    list((day - 1) // 7 ORDER BY day) AS warr
  FROM day
), el AS (
  SELECT n, yarr, warr,
    list_transform(warr, w -> CAST(len(list_filter(warr,
      x -> x = w)) AS BIGINT)) AS g,
    list_transform(yarr, y -> CAST(len(list_filter(yarr,
      x -> x = y)) AS BIGINT)) AS c
  FROM one WHERE n > 3
), f AS (
  SELECT n, g, c,
    CAST(len(list_distinct(warr)) AS BIGINT) AS ngrp,
    CAST(list_sum(list_transform(range(1, CAST(n AS INTEGER)), i ->
      list_sum(list_transform(
        range(i + 1, CAST(n + 1 AS INTEGER)), j ->
        CASE WHEN warr[i] < warr[j] THEN
          CASE WHEN yarr[i] < yarr[j] THEN 2
               WHEN yarr[i] = yarr[j] THEN 1 ELSE 0 END
        ELSE 0 END)))) AS BIGINT) AS j2,
    CAST(list_sum(g) AS BIGINT) AS sg,
    CAST(list_sum(list_transform(g, v ->
      (v - 1) * (2 * v + 5))) AS BIGINT) AS a1,
    CAST(list_sum(list_transform(c, v ->
      (v - 1) * (2 * v + 5))) AS BIGINT) AS b1,
    CAST(list_sum(list_transform(g, v ->
      (v - 1) * (v - 2))) AS BIGINT) AS a2,
    CAST(list_sum(list_transform(c, v ->
      (v - 1) * (v - 2))) AS BIGINT) AS b2,
    CAST(list_sum(list_transform(g, v -> v - 1)) AS BIGINT) AS a3,
    CAST(list_sum(list_transform(c, v -> v - 1)) AS BIGINT) AS b3
  FROM el
), st AS (
  SELECT n, ngrp, j2, sg,
    CAST(j2 AS DOUBLE) / 2.0 AS j,
    CAST(n * n - sg AS DOUBLE) / 4.0 AS e,
    CAST(n * (n - 1) * (2 * n + 5) - a1 - b1 AS DOUBLE) / 72.0
      + CAST(a2 * b2 AS DOUBLE)
        / CAST(36 * n * (n - 1) * (n - 2) AS DOUBLE)
      + CAST(a3 * b3 AS DOUBLE)
        / CAST(8 * n * (n - 1) AS DOUBLE) AS v
  FROM f WHERE ngrp >= 2
)
SELECT n AS n_days, ngrp AS n_groups,
  round(j, 6) AS j_stat,
  round(e, 6) AS e_j,
  round(v, 6) AS var_j,
  round((j - e) / sqrt(v), 6) AS z_stat,
  (abs((j - e) / sqrt(v)) > 1.96) AS reject_5pct,
  CASE WHEN (j - e) / sqrt(v) > 0.0 THEN 'increasing_weeks'
       WHEN (j - e) / sqrt(v) < 0.0 THEN 'decreasing_weeks'
       ELSE 'no_trend' END AS verdict
FROM st
"""

QUERIES["jonckheere_terpstra"] = q_jonckheere_terpstra
_RAW_ORACLES["jonckheere_terpstra"] = SQL_JONCKHEERE


def q_hodges_lehmann(spark, sf_dir):
    """Hodges-Lehmann location estimators on daily event volume
    (Hodges & Lehmann Ann. Math. Stat. 1963 — the ESTIMATOR
    companion of the rank tests in this tier: the one-sample
    pseudo-median is the median of the n(n+1)/2 Walsh averages
    (y_i + y_j)/2, i <= j, the location estimate whose sign-rank
    test is Wilcoxon's; the two-sample shift is the median of all
    first-half x second-half pairwise differences, the estimate
    whose test is Mann-Whitney — 29%-efficient-at-worst vs the mean
    under ANY symmetric noise, vastly more robust to the spike days
    that wreck a plain mean). Walsh sums y_i + y_j and cross-half
    differences are EXACT LONGS; each median is element_at over the
    array_sort of those longs (even-length midpoint halved — exact
    in doubles), so both estimators are bit-identical across
    engines. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .filter(F.col("n_days") > 3)
        .withColumn("__h", F.expr("n_days div 2"))
        .withColumn(
            "__walsh",
            F.expr(
                "array_sort(flatten(transform("
                " sequence(1L, n_days), i -> transform("
                " sequence(i, n_days), j ->"
                " element_at(__yarr, cast(i as int))"
                " + element_at(__yarr, cast(j as int))))))"
            ),
        )
        .withColumn(
            "__diffs",
            F.expr(
                "array_sort(flatten(transform("
                " sequence(1L, __h), i -> transform("
                " sequence(__h + 1, n_days), j ->"
                " element_at(__yarr, cast(j as int))"
                " - element_at(__yarr, cast(i as int))))))"
            ),
        )
    )

    def _med(arr):
        sz = f"size({arr})"
        return F.expr(
            f"IF({sz} % 2 = 1,"
            f" cast(element_at({arr}, cast(({sz} + 1) div 2 as int))"
            " as double),"
            f" (cast(element_at({arr}, cast({sz} div 2 as int))"
            " as double)"
            f" + cast(element_at({arr}, cast({sz} div 2 + 1 as int))"
            " as double)) / 2.0)"
        )

    pseudo = _med("__walsh") / F.lit(2.0)
    shift = _med("__diffs")
    return one.select(
        "n_days",
        F.col("__h").alias("n_first_half"),
        (F.col("n_days") - F.col("__h")).alias("n_second_half"),
        _r6(pseudo).alias("pseudo_median"),
        _r6(shift).alias("hl_shift"),
        F.when(shift > 0.0, F.lit("second_half_higher"))
        .when(shift < 0.0, F.lit("second_half_lower"))
        .otherwise(F.lit("no_shift"))
        .alias("verdict"),
    )


SQL_HODGES_LEHMANN = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), arrs AS (
  SELECT n, n // 2 AS h,
    list_sort(flatten(list_transform(
      range(1, CAST(n + 1 AS INTEGER)), i -> list_transform(
      range(i, CAST(n + 1 AS INTEGER)), j ->
      yarr[i] + yarr[j])))) AS walsh,
    list_sort(flatten(list_transform(
      range(1, CAST(n // 2 + 1 AS INTEGER)), i -> list_transform(
      range(CAST(n // 2 + 1 AS INTEGER), CAST(n + 1 AS INTEGER)),
      j -> yarr[j] - yarr[i])))) AS diffs
  FROM one WHERE n > 3
), med AS (
  SELECT n, h,
    CASE WHEN len(walsh) % 2 = 1
      THEN CAST(walsh[CAST((len(walsh) + 1) // 2 AS INTEGER)]
        AS DOUBLE)
      ELSE (CAST(walsh[CAST(len(walsh) // 2 AS INTEGER)] AS DOUBLE)
        + CAST(walsh[CAST(len(walsh) // 2 + 1 AS INTEGER)]
          AS DOUBLE)) / 2.0 END AS mw,
    CASE WHEN len(diffs) % 2 = 1
      THEN CAST(diffs[CAST((len(diffs) + 1) // 2 AS INTEGER)]
        AS DOUBLE)
      ELSE (CAST(diffs[CAST(len(diffs) // 2 AS INTEGER)] AS DOUBLE)
        + CAST(diffs[CAST(len(diffs) // 2 + 1 AS INTEGER)]
          AS DOUBLE)) / 2.0 END AS sh
  FROM arrs
)
SELECT n AS n_days,
  CAST(h AS BIGINT) AS n_first_half,
  CAST(n - h AS BIGINT) AS n_second_half,
  round(mw / 2.0, 6) AS pseudo_median,
  round(sh, 6) AS hl_shift,
  CASE WHEN sh > 0.0 THEN 'second_half_higher'
       WHEN sh < 0.0 THEN 'second_half_lower'
       ELSE 'no_shift' END AS verdict
FROM med
"""

QUERIES["hodges_lehmann"] = q_hodges_lehmann
_RAW_ORACLES["hodges_lehmann"] = SQL_HODGES_LEHMANN
def q_diebold_mariano(spark, sf_dir):
    """Diebold-Mariano equal-predictive-accuracy test on daily event
    volume, naive lag-1 vs alpha=1/2 SES one-step forecasts (Diebold
    & Mariano JBES 1995; Harvey, Leybourne & Newbold IJF 1997
    small-sample correction — the referee for the forecasting tier:
    ses_alpha_grid/holt_trend/theta_forecast PRODUCE forecasts,
    DM decides whether one's squared-error advantage over the
    competing method is distinguishable from noise given the
    loss-differential variance). With alpha = 1/2 the SES level has
    the EXACT-LONG closed form 2^(t-2) s_{t-1} = y_1 + sum y_i
    2^(i-2), so every error, loss differential d_t = e1^2 - e2^2,
    and the in-order folds for dbar and g0 are identical IEEE
    expression trees on both engines (h=1: var = g0/m; HLN factor
    sqrt((m-1)/m)). 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    e2 = (
        "(cast(element_at(__yarr, cast(t as int)) as double)"
        " - cast(element_at(__yarr, 1) + IF(t = 2L, 0L,"
        " aggregate(sequence(2L, t - 1), 0L, (acc, i) -> acc"
        " + element_at(__yarr, cast(i as int))"
        " * shiftleft(1L, cast(i - 2 as int)))) as double)"
        " / cast(shiftleft(1L, cast(t - 2 as int)) as double))"
    )
    e1sq = (
        "cast((element_at(__yarr, cast(t as int))"
        " - element_at(__yarr, cast(t - 1 as int)))"
        " * (element_at(__yarr, cast(t as int))"
        " - element_at(__yarr, cast(t - 1 as int))) as double)"
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .filter(F.col("n_days") > 3)
        .withColumn(
            "__darr",
            F.expr(
                "transform(sequence(2L, n_days), t ->"
                f" {e1sq} - {e2} * {e2})"
            ),
        )
        .withColumn("__m", F.expr("n_days - 1"))
        .withColumn(
            "__dbar",
            F.expr(
                "aggregate(__darr, cast(0.0 as double),"
                " (acc, d) -> acc + d) / cast(__m as double)"
            ),
        )
        .withColumn(
            "__g0",
            F.expr(
                "aggregate(__darr, cast(0.0 as double),"
                " (acc, d) -> acc + (d - __dbar) * (d - __dbar))"
                " / cast(__m as double)"
            ),
        )
        .filter(F.col("__g0") > 0)
    )
    m = F.col("__m").cast("double")
    dm = F.col("__dbar") / F.sqrt(F.col("__g0") / m)
    hln = dm * F.sqrt((m - 1) / m)
    return one.select(
        "n_days",
        F.col("__m").cast("long").alias("n_forecasts"),
        _r6(F.col("__dbar")).alias("mean_loss_diff"),
        _r6(dm).alias("dm_stat"),
        _r6(hln).alias("hln_stat"),
        (F.abs(hln) > F.lit(1.96)).alias("reject_5pct"),
        F.when(
            (F.abs(hln) > 1.96) & (F.col("__dbar") > 0),
            F.lit("ses_better"),
        )
        .when(
            (F.abs(hln) > 1.96) & (F.col("__dbar") < 0),
            F.lit("naive_better"),
        )
        .otherwise(F.lit("no_significant_difference"))
        .alias("verdict"),
    )


SQL_DIEBOLD_MARIANO = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), dl AS (
  SELECT n, n - 1 AS m,
    list_transform(range(2, CAST(n + 1 AS INTEGER)), t ->
      CAST((yarr[t] - yarr[t - 1]) * (yarr[t] - yarr[t - 1])
        AS DOUBLE)
      - (CAST(yarr[t] AS DOUBLE)
         - CAST(yarr[1] + coalesce(list_sum(list_transform(
             range(2, t), i -> yarr[i]
             * (CAST(1 AS BIGINT) << (i - 2)))), 0) AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << (t - 2) AS DOUBLE))
      * (CAST(yarr[t] AS DOUBLE)
         - CAST(yarr[1] + coalesce(list_sum(list_transform(
             range(2, t), i -> yarr[i]
             * (CAST(1 AS BIGINT) << (i - 2)))), 0) AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << (t - 2) AS DOUBLE)))
      AS darr
  FROM one WHERE n > 3
), db AS (
  SELECT n, m, darr,
    list_sum(darr) / CAST(m AS DOUBLE) AS dbar
  FROM dl
), g AS (
  SELECT n, m, dbar,
    list_sum(list_transform(darr, d ->
      (d - dbar) * (d - dbar))) / CAST(m AS DOUBLE) AS g0
  FROM db
)
SELECT n AS n_days, CAST(m AS BIGINT) AS n_forecasts,
  round(dbar, 6) AS mean_loss_diff,
  round(dbar / sqrt(g0 / CAST(m AS DOUBLE)), 6) AS dm_stat,
  round(dbar / sqrt(g0 / CAST(m AS DOUBLE))
    * sqrt((CAST(m AS DOUBLE) - 1) / CAST(m AS DOUBLE)), 6)
    AS hln_stat,
  (abs(dbar / sqrt(g0 / CAST(m AS DOUBLE))
    * sqrt((CAST(m AS DOUBLE) - 1) / CAST(m AS DOUBLE))) > 1.96)
    AS reject_5pct,
  CASE WHEN abs(dbar / sqrt(g0 / CAST(m AS DOUBLE))
         * sqrt((CAST(m AS DOUBLE) - 1) / CAST(m AS DOUBLE)))
         > 1.96 AND dbar > 0 THEN 'ses_better'
       WHEN abs(dbar / sqrt(g0 / CAST(m AS DOUBLE))
         * sqrt((CAST(m AS DOUBLE) - 1) / CAST(m AS DOUBLE)))
         > 1.96 AND dbar < 0 THEN 'naive_better'
       ELSE 'no_significant_difference' END AS verdict
FROM g WHERE g0 > 0
"""

QUERIES["diebold_mariano"] = q_diebold_mariano
_RAW_ORACLES["diebold_mariano"] = SQL_DIEBOLD_MARIANO


def q_pesaran_timmermann(spark, sf_dir):
    """Pesaran-Timmermann directional-accuracy test of momentum on
    daily event volume (Pesaran & Timmermann JBES 1992 — does
    yesterday's DIRECTION of change predict today's? The sign-only
    market-timing test: compare the hit rate of predicting
    direction(y_t - y_{t-1}) by direction(y_{t-1} - y_{t-2})
    against the rate expected if predicted and actual directions
    were independent, with the variance of BOTH estimated rates
    removed — the forecast-eval complement of runs_test, which asks
    the same question of the sign sequence without a predictor).
    Hit / up-actual / up-predicted counts are EXACT LONGS from one
    fold over the <=31-day array; P-hat, P*, the two variance terms
    and the PT statistic are one fixed expression tree over those
    counts. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    )
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    )
    a = (
        "IF(element_at(__yarr, cast(t as int))"
        " > element_at(__yarr, cast(t - 1 as int)), 1L, 0L)"
    )
    p = (
        "IF(element_at(__yarr, cast(t - 1 as int))"
        " > element_at(__yarr, cast(t - 2 as int)), 1L, 0L)"
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .filter(F.col("n_days") > 4)
        .withColumn(
            "__cm",
            F.expr(
                "aggregate(sequence(3L, n_days), 0L, (acc, t) ->"
                f" acc + IF({a} = {p}, 1L, 0L))"
            ),
        )
        .withColumn(
            "__ca",
            F.expr(
                "aggregate(sequence(3L, n_days), 0L, (acc, t) ->"
                f" acc + {a})"
            ),
        )
        .withColumn(
            "__cp",
            F.expr(
                "aggregate(sequence(3L, n_days), 0L, (acc, t) ->"
                f" acc + {p})"
            ),
        )
        .withColumn("__m", F.expr("n_days - 2"))
    )
    m = F.col("__m").cast("double")
    ph = F.col("__cm").cast("double") / m
    py = F.col("__ca").cast("double") / m
    px = F.col("__cp").cast("double") / m
    ps = py * px + (1 - py) * (1 - px)
    vh = ps * (1 - ps) / m
    vs = (
        (2 * py - 1) * (2 * py - 1) * px * (1 - px) / m
        + (2 * px - 1) * (2 * px - 1) * py * (1 - py) / m
        + F.lit(4.0) * py * px * (1 - py) * (1 - px) / (m * m)
    )
    pt = (ph - ps) / F.sqrt(vh - vs)
    one = one.withColumn("__gap", (vh - vs))
    one = one.filter(F.col("__gap") > 0)
    return one.select(
        "n_days",
        F.col("__m").cast("long").alias("n_predictions"),
        _r6(ph).alias("hit_rate"),
        _r6(ps).alias("p_star"),
        _r6(pt).alias("pt_stat"),
        (pt > F.lit(1.645)).alias("reject_5pct"),
        F.when(pt > 1.645, F.lit("momentum_informative"))
        .otherwise(F.lit("momentum_uninformative"))
        .alias("verdict"),
    )


SQL_PESARAN_TIMMERMANN = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), cnt AS (
  SELECT n, n - 2 AS m,
    CAST(list_sum(list_transform(range(3, CAST(n + 1 AS INTEGER)),
      t -> CASE WHEN (CASE WHEN yarr[t] > yarr[t - 1]
                      THEN 1 ELSE 0 END)
                   = (CASE WHEN yarr[t - 1] > yarr[t - 2]
                      THEN 1 ELSE 0 END)
           THEN 1 ELSE 0 END)) AS BIGINT) AS cm,
    CAST(list_sum(list_transform(range(3, CAST(n + 1 AS INTEGER)),
      t -> CASE WHEN yarr[t] > yarr[t - 1] THEN 1 ELSE 0 END))
      AS BIGINT) AS ca,
    CAST(list_sum(list_transform(range(3, CAST(n + 1 AS INTEGER)),
      t -> CASE WHEN yarr[t - 1] > yarr[t - 2] THEN 1 ELSE 0 END))
      AS BIGINT) AS cp
  FROM one WHERE n > 4
), st AS (
  SELECT n, m,
    CAST(cm AS DOUBLE) / CAST(m AS DOUBLE) AS ph,
    CAST(ca AS DOUBLE) / CAST(m AS DOUBLE) AS py,
    CAST(cp AS DOUBLE) / CAST(m AS DOUBLE) AS px
  FROM cnt
), st2 AS (
  SELECT n, m, ph,
    py * px + (1 - py) * (1 - px) AS ps,
    (py * px + (1 - py) * (1 - px))
      * (1 - (py * px + (1 - py) * (1 - px)))
      / CAST(m AS DOUBLE) AS vh,
    (2 * py - 1) * (2 * py - 1) * px * (1 - px)
      / CAST(m AS DOUBLE)
    + (2 * px - 1) * (2 * px - 1) * py * (1 - py)
      / CAST(m AS DOUBLE)
    + 4.0 * py * px * (1 - py) * (1 - px)
      / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS vs
  FROM st
)
SELECT n AS n_days, CAST(m AS BIGINT) AS n_predictions,
  round(ph, 6) AS hit_rate,
  round(ps, 6) AS p_star,
  round((ph - ps) / sqrt(vh - vs), 6) AS pt_stat,
  ((ph - ps) / sqrt(vh - vs) > 1.645) AS reject_5pct,
  CASE WHEN (ph - ps) / sqrt(vh - vs) > 1.645
       THEN 'momentum_informative'
       ELSE 'momentum_uninformative' END AS verdict
FROM st2 WHERE vh - vs > 0
"""

QUERIES["pesaran_timmermann"] = q_pesaran_timmermann
_RAW_ORACLES["pesaran_timmermann"] = SQL_PESARAN_TIMMERMANN
def q_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa over the event-type choices of each user's
    first 6 events (Fleiss Psych. Bulletin 1971 — the MULTI-rater
    generalization of cohens_kappa: treat each qualifying user as an
    item receiving R = 6 categorical 'ratings' (their first six
    event types, ts-then-event_id ordered) and measure how far the
    within-item category concentration exceeds what the global
    category mix would produce by chance; the standard screen for
    'are this cohort's early behaviors internally consistent or
    just drawn from the base rate'). P_i collapses to (sum_j
    n_ij^2 - R)/(R(R-1)) so Pbar needs only T1 = sum_i sum_j
    n_ij^2 - N*R (EXACT LONG) and Pe needs the per-category rating
    totals S_j (EXACT LONGS): kappa = (Pbar - Pe)/(1 - Pe) is one
    fixed expression tree over exact integers. Rating extraction is
    one user-keyed window; the rest is two tiny category/item aggs
    — 4 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first6 = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 6)
    )
    # the user-keyed groupBy rides the window's hash partitioning —
    # no second exchange; the exactly-6 filter is a HAVING, not a join
    per_user = (
        first6.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.collect_list("event_type").alias("__types"),
        )
        .filter(F.col("__c") == 6)
        .withColumn(
            "__sq",
            F.expr(
                "aggregate(__types, 0L, (acc, t) ->"
                " acc + size(filter(__types, x -> x = t)))"
            ),
        )
    )
    items = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__sq").cast("long").alias("__ssq"),
    )
    cats = (
        per_user.select(F.explode("__types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("__s"))
    )
    catsum = cats.agg(
        F.sum(F.col("__s") * F.col("__s")).cast("long").alias("__s2"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    one = items.crossJoin(F.broadcast(catsum)).filter(
        F.col("n_items") > 0
    )
    nn = F.col("n_items")
    r = F.lit(6)
    pbar = (F.col("__ssq") - nn * r).cast("double") / (
        nn * r * (r - 1)
    ).cast("double")
    pe = F.col("__s2").cast("double") / (nn * r * nn * r).cast(
        "double"
    )
    kappa = (pbar - pe) / (F.lit(1.0) - pe)
    return one.select(
        "n_items",
        F.lit(6).cast("long").alias("n_raters"),
        "n_categories",
        _r6(pbar).alias("p_bar"),
        _r6(pe).alias("p_e"),
        _r6(kappa).alias("kappa"),
        F.when(kappa < 0.0, F.lit("poor"))
        .when(kappa <= 0.2, F.lit("slight"))
        .when(kappa <= 0.4, F.lit("fair"))
        .when(kappa <= 0.6, F.lit("moderate"))
        .when(kappa <= 0.8, F.lit("substantial"))
        .otherwise(F.lit("almost_perfect"))
        .alias("agreement"),
    )


SQL_FLEISS_KAPPA = """
WITH ranked AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts, event_id) AS rn
  FROM events
), first6 AS (
  SELECT user_id, event_type FROM ranked WHERE rn <= 6
), ok AS (
  SELECT user_id FROM first6 GROUP BY user_id
  HAVING count(*) = 6
), nij AS (
  SELECT f.user_id, f.event_type,
    CAST(count(*) AS BIGINT) AS n
  FROM first6 f JOIN ok USING (user_id)
  GROUP BY f.user_id, f.event_type
), items AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
    CAST(sum(sq) AS BIGINT) AS ssq
  FROM (SELECT user_id, sum(n * n) AS sq FROM nij
        GROUP BY user_id)
), cats AS (
  SELECT CAST(sum(s * s) AS BIGINT) AS s2,
    CAST(count(*) AS BIGINT) AS n_categories
  FROM (SELECT event_type, sum(n) AS s FROM nij
        GROUP BY event_type)
), st AS (
  SELECT n_items, n_categories,
    CAST(ssq - n_items * 6 AS DOUBLE)
      / CAST(n_items * 6 * 5 AS DOUBLE) AS pbar,
    CAST(s2 AS DOUBLE)
      / CAST(n_items * 6 * n_items * 6 AS DOUBLE) AS pe
  FROM items, cats WHERE n_items > 0
)
SELECT n_items, CAST(6 AS BIGINT) AS n_raters, n_categories,
  round(pbar, 6) AS p_bar,
  round(pe, 6) AS p_e,
  round((pbar - pe) / (1.0 - pe), 6) AS kappa,
  CASE WHEN (pbar - pe) / (1.0 - pe) < 0.0 THEN 'poor'
       WHEN (pbar - pe) / (1.0 - pe) <= 0.2 THEN 'slight'
       WHEN (pbar - pe) / (1.0 - pe) <= 0.4 THEN 'fair'
       WHEN (pbar - pe) / (1.0 - pe) <= 0.6 THEN 'moderate'
       WHEN (pbar - pe) / (1.0 - pe) <= 0.8 THEN 'substantial'
       ELSE 'almost_perfect' END AS agreement
FROM st
"""

QUERIES["fleiss_kappa"] = q_fleiss_kappa
_RAW_ORACLES["fleiss_kappa"] = SQL_FLEISS_KAPPA


def q_icc_agreement(spark, sf_dir):
    """Intraclass correlation ICC(2,1) and ICC(3,1) over the
    users x event-index value matrix (Shrout & Fleiss Psych.
    Bulletin 1979 — the CONTINUOUS-measurement agreement
    coefficients beside the categorical fleiss_kappa: rows = users
    with >= 4 events, columns = event index 1..4, cell = that
    event's value; two-way ANOVA decomposes variance into user,
    index and residual, ICC(2,1) treats the index as a random
    effect (absolute agreement), ICC(3,1) as fixed (consistency) —
    the standard 'is a user's level reproducible across their first
    events' screen). Cell values become EXACT INTEGER CENTS, so T,
    A = sum x^2, sum R_i^2 and sum C_j^2 are EXACT LONGS and every
    mean square is a fixed expression tree over them. One user-
    keyed window + three tiny aggs — 4 shuffles at any corpus
    size."""
    k = 4
    ev = _events(spark, sf_dir).select(
        "user_id", "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cells = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "user_id",
            F.col("__rn").alias("__j"),
            (
                F.signum("value")
                * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
            ).cast("long").alias("__x"),
        )
    )
    # user-keyed groupBy rides the window partitioning (no exchange);
    # the k fixed column sums are per-user components so the whole
    # ANOVA needs ONE single-row agg — 2 shuffles total
    per_user = (
        cells.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum("__x").cast("long").alias("__ri"),
            F.sum(F.col("__x") * F.col("__x")).cast("long")
            .alias("__ai"),
            *[
                F.sum(
                    F.when(F.col("__j") == j, F.col("__x"))
                    .otherwise(F.lit(0))
                ).cast("long").alias(f"__x{j}")
                for j in range(1, k + 1)
            ],
        )
        .filter(F.col("__c") == k)
    )
    one = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("__ri") * F.col("__ri")).cast("long")
        .alias("__sr2"),
        F.sum("__ai").cast("long").alias("__a"),
        F.sum("__ri").cast("long").alias("__t"),
        *[
            F.sum(f"__x{j}").cast("long").alias(f"__c{j}")
            for j in range(1, k + 1)
        ],
    ).filter(F.col("n_users") > 1)
    one = one.withColumn(
        "__sc2",
        sum(
            (F.col(f"__c{j}") * F.col(f"__c{j}") for j in range(2, k + 1)),
            F.col("__c1") * F.col("__c1"),
        ).cast("long"),
    )
    n = F.col("n_users").cast("double")
    kd = F.lit(float(k))
    corr = F.col("__t").cast("double") * F.col("__t").cast(
        "double"
    ) / (n * kd)
    ssr = F.col("__sr2").cast("double") / kd - corr
    ssc = F.col("__sc2").cast("double") / n - corr
    sst = F.col("__a").cast("double") - corr
    sse = sst - ssr - ssc
    msr = ssr / (n - 1)
    msc = ssc / (kd - 1)
    mse = sse / ((n - 1) * (kd - 1))
    icc21 = (msr - mse) / (
        msr + (kd - 1) * mse + kd * (msc - mse) / n
    )
    icc31 = (msr - mse) / (msr + (kd - 1) * mse)
    one = one.filter(
        (F.col("__a").cast("double") - corr) > 0
    )
    return one.select(
        "n_users",
        F.lit(k).cast("long").alias("n_ratings"),
        _r6(msr / F.lit(10000.0)).alias("ms_rows"),
        _r6(msc / F.lit(10000.0)).alias("ms_cols"),
        _r6(mse / F.lit(10000.0)).alias("ms_error"),
        _r6(icc21).alias("icc_2_1"),
        _r6(icc31).alias("icc_3_1"),
        F.when(icc21 < 0.5, F.lit("poor"))
        .when(icc21 < 0.75, F.lit("moderate"))
        .when(icc21 < 0.9, F.lit("good"))
        .otherwise(F.lit("excellent"))
        .alias("reliability"),
    )


SQL_ICC_AGREEMENT = """
WITH ranked AS (
  SELECT user_id,
    CAST(sign(value) * floor(abs(value) * 100 + 0.5) AS BIGINT)
      AS x,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts, event_id) AS rn
  FROM events
), firstk AS (
  SELECT user_id, x, rn FROM ranked WHERE rn <= 4
), ok AS (
  SELECT user_id FROM firstk GROUP BY user_id
  HAVING count(*) = 4
), cells AS (
  SELECT f.user_id, f.rn AS j, f.x
  FROM firstk f JOIN ok USING (user_id)
), rs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(ri * ri) AS BIGINT) AS sr2
  FROM (SELECT user_id, sum(x) AS ri FROM cells
        GROUP BY user_id)
), cs AS (
  SELECT CAST(sum(cj * cj) AS BIGINT) AS sc2
  FROM (SELECT j, sum(x) AS cj FROM cells GROUP BY j)
), ts_ AS (
  SELECT CAST(sum(x) AS BIGINT) AS t,
    CAST(sum(x * x) AS BIGINT) AS a
  FROM cells
), st AS (
  SELECT n_users,
    CAST(sr2 AS DOUBLE) / 4.0
      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        / (CAST(n_users AS DOUBLE) * 4.0) AS ssr,
    CAST(sc2 AS DOUBLE) / CAST(n_users AS DOUBLE)
      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        / (CAST(n_users AS DOUBLE) * 4.0) AS ssc,
    CAST(a AS DOUBLE)
      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        / (CAST(n_users AS DOUBLE) * 4.0) AS sst
  FROM rs, cs, ts_ WHERE n_users > 1 AND
    CAST(a AS DOUBLE)
      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        / (CAST(n_users AS DOUBLE) * 4.0) > 0
), ms AS (
  SELECT n_users,
    ssr / (CAST(n_users AS DOUBLE) - 1) AS msr,
    ssc / 3.0 AS msc,
    (sst - ssr - ssc)
      / ((CAST(n_users AS DOUBLE) - 1) * 3.0) AS mse
  FROM st
), icc AS (
  SELECT n_users, msr, msc, mse,
    (msr - mse) / (msr + 3.0 * mse
      + 4.0 * (msc - mse) / CAST(n_users AS DOUBLE)) AS i21,
    (msr - mse) / (msr + 3.0 * mse) AS i31
  FROM ms
)
SELECT n_users, CAST(4 AS BIGINT) AS n_ratings,
  round(msr / 10000.0, 6) AS ms_rows,
  round(msc / 10000.0, 6) AS ms_cols,
  round(mse / 10000.0, 6) AS ms_error,
  round(i21, 6) AS icc_2_1,
  round(i31, 6) AS icc_3_1,
  CASE WHEN i21 < 0.5 THEN 'poor'
       WHEN i21 < 0.75 THEN 'moderate'
       WHEN i21 < 0.9 THEN 'good'
       ELSE 'excellent' END AS reliability
FROM icc
"""

QUERIES["icc_agreement"] = q_icc_agreement
_RAW_ORACLES["icc_agreement"] = SQL_ICC_AGREEMENT
def q_atkinson_hoover(spark, sf_dir):
    """Atkinson and Hoover inequality of user activity (Atkinson
    J. Econ. Theory 1970; Hoover 1936 — the welfare-theoretic
    completion of the inequality tier beside gini_concentration and
    theil_index: Atkinson(eps) states how much TOTAL activity could
    be given up with equality kept at current welfare — eps = 1 the
    geometric/arithmetic-mean gap, eps = 0.5 the sqrt-utilitarian
    version — while Hoover is the 'Robin Hood' share of events that
    would have to move between users to equalize). Computed over
    the per-user EVENT-COUNT histogram whose support is bounded by
    the maximum activity level, not the user count — the same
    scale-clean value-frame trick as theil_index: n, S and the
    Hoover numerator sum m*|n*v - S| are EXACT LONGS (|x - mu|
    cleared of the rational mu by multiplying through by n), the
    ln/sqrt folds run SEQUENTIALLY over the value-sorted array so
    both engines add in the same order. 3 shuffles at any corpus
    size."""
    ev = _events(spark, sf_dir).select("user_id")
    cnt = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__v")
    )
    h = cnt.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("__m")
    )
    one = h.agg(
        F.array_sort(
            F.collect_list(F.struct("__v", "__m"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn(
            "__n",
            F.expr(
                "aggregate(__a, 0L, (acc, s) -> acc + s.__m)"
            ),
        )
        .withColumn(
            "__s",
            F.expr(
                "aggregate(__a, 0L, (acc, s) ->"
                " acc + s.__v * s.__m)"
            ),
        )
        .filter((F.col("__n") > 1) & (F.col("__s") > 0))
        .withColumn(
            "__habs",
            F.expr(
                "aggregate(__a, 0L, (acc, s) ->"
                " acc + s.__m * abs(__n * s.__v - __s))"
            ),
        )
        .withColumn(
            "__lnsum",
            F.expr(
                "aggregate(__a, cast(0.0 as double), (acc, s) ->"
                " acc + cast(s.__m as double)"
                " * ln(cast(s.__v as double)))"
            ),
        )
        .withColumn(
            "__sqsum",
            F.expr(
                "aggregate(__a, cast(0.0 as double), (acc, s) ->"
                " acc + cast(s.__m as double)"
                " * sqrt(cast(s.__v as double)))"
            ),
        )
    )
    nd = F.col("__n").cast("double")
    sd = F.col("__s").cast("double")
    mu = sd / nd
    hoover = F.col("__habs").cast("double") / (
        F.lit(2.0) * F.col("__n").cast("double") * sd
    )
    a1 = F.lit(1.0) - F.exp(F.col("__lnsum") / nd) / mu
    a05 = F.lit(1.0) - (
        (F.col("__sqsum") / nd) * (F.col("__sqsum") / nd)
    ) / mu
    return one.select(
        F.col("__n").alias("n_users"),
        F.col("__s").alias("total_events"),
        _r6(mu).alias("mean_events"),
        _r6(hoover).alias("hoover_index"),
        _r6(a05).alias("atkinson_05"),
        _r6(a1).alias("atkinson_1"),
        F.when(hoover > 0.5, F.lit("extreme_concentration"))
        .when(hoover > 0.2, F.lit("concentrated"))
        .otherwise(F.lit("dispersed"))
        .alias("verdict"),
    )


SQL_ATKINSON_HOOVER = """
WITH cnt AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY user_id
), h AS (
  SELECT v, CAST(count(*) AS BIGINT) AS m FROM cnt GROUP BY v
), one AS (
  SELECT CAST(sum(m) AS BIGINT) AS n,
    CAST(sum(v * m) AS BIGINT) AS s,
    CAST(sum(m * abs((SELECT sum(m) FROM h) * v
      - (SELECT sum(v * m) FROM h))) AS BIGINT) AS habs,
    list_sum(list(CAST(m AS DOUBLE) * ln(CAST(v AS DOUBLE))
      ORDER BY v)) AS lnsum,
    list_sum(list(CAST(m AS DOUBLE) * sqrt(CAST(v AS DOUBLE))
      ORDER BY v)) AS sqsum
  FROM h
), st AS (
  SELECT n, s, habs, lnsum, sqsum,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu
  FROM one WHERE n > 1 AND s > 0
)
SELECT n AS n_users, s AS total_events,
  round(mu, 6) AS mean_events,
  round(CAST(habs AS DOUBLE)
    / (2.0 * CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6)
    AS hoover_index,
  round(1.0 - ((sqsum / CAST(n AS DOUBLE))
    * (sqsum / CAST(n AS DOUBLE))) / mu, 6) AS atkinson_05,
  round(1.0 - exp(lnsum / CAST(n AS DOUBLE)) / mu, 6)
    AS atkinson_1,
  CASE WHEN CAST(habs AS DOUBLE)
    / (2.0 * CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) > 0.5
    THEN 'extreme_concentration'
  WHEN CAST(habs AS DOUBLE)
    / (2.0 * CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) > 0.2
    THEN 'concentrated'
  ELSE 'dispersed' END AS verdict
FROM st
"""

QUERIES["atkinson_hoover"] = q_atkinson_hoover
_RAW_ORACLES["atkinson_hoover"] = SQL_ATKINSON_HOOVER


def q_gpd_tail_fit(spark, sf_dir):
    """Generalized-Pareto tail fit of purchase values above the
    exact p90 via L-moments (Hosking & Wallis Technometrics 1987
    peaks-over-threshold; Pickands-Balkema-de Haan says excesses
    over a high threshold are GPD — the tail-RISK companion of
    l_moments: l_moments fingerprints the WHOLE distribution, this
    fits the law of the extreme spends that drive revenue risk,
    with the closed-form L-moment estimators k = l1/l2 - 2,
    sigma = l1(1+k), xi = -k — no iteration, no MLE). Threshold is
    the exact order statistic at rank ceil(0.9 N) = (9N+9) div 10
    (integer arithmetic); excess first/second L-moments come from
    the excess-cents histogram with exact rank masses: S = sum v*t
    and K = sum v*t*(2b+t-1) (= 2 sum (i-1) x_(i)) are EXACT LONGS,
    so l1 = S/n and l2 = K/(n(n-1)) - S/n are single divisions.
    The whole chain lives on the distinct-cents histogram after one
    corpus aggregate, single-partition thereafter (l_moments
    pattern). Values in dollars (cents/100)."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        (
            F.signum("value")
            * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        ).cast("long").alias("__c")
    )
    h = ev.groupBy("__c").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    w = Window.orderBy("__c")
    rk = h.select(
        "__c", "__t",
        F.sum("__t").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("__cum"),
        F.sum("__t").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__nn"),
    )
    thr = rk.filter(
        F.expr("__cum >= (9 * __nn + 9) div 10")
    ).agg(F.min("__c").cast("long").alias("__thr"))
    exc = (
        rk.crossJoin(F.broadcast(thr))
        .filter(F.col("__c") > F.col("__thr"))
        .select(
            (F.col("__c") - F.col("__thr")).alias("__v"),
            "__t", "__nn", "__thr",
        )
    )
    wb = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    exb = exc.withColumn(
        "__b", F.coalesce(F.sum("__t").over(wb), F.lit(0)).cast("long")
    )
    one = exb.agg(
        F.max("__nn").cast("long").alias("n_purchases"),
        F.max("__thr").cast("long").alias("__thrv"),
        F.sum("__t").cast("long").alias("n_exceed"),
        F.sum(F.col("__v") * F.col("__t")).cast("long").alias("__s"),
        F.sum(
            F.col("__v") * F.col("__t")
            * (2 * F.col("__b") + F.col("__t") - 1)
        ).cast("long").alias("__k"),
    ).filter(F.col("n_exceed") > 5)
    n = F.col("n_exceed").cast("double")
    l1 = F.col("__s").cast("double") / n
    l2 = F.col("__k").cast("double") / (
        F.col("n_exceed") * (F.col("n_exceed") - 1)
    ).cast("double") - l1
    one = one.withColumn("__l1", l1).withColumn("__l2", l2).filter(
        F.col("__l2") > 0
    )
    l1 = F.col("__l1")
    l2 = F.col("__l2")
    xi = F.lit(2.0) - l1 / l2
    sigma = l1 * (F.lit(1.0) + (l1 / l2 - F.lit(2.0)))
    return one.select(
        "n_purchases",
        _r6(F.col("__thrv").cast("double") / F.lit(100.0)).alias(
            "threshold_dollars"
        ),
        "n_exceed",
        _r6(l1 / F.lit(100.0)).alias("mean_excess_dollars"),
        _r6(xi).alias("xi_hat"),
        _r6(sigma / F.lit(100.0)).alias("sigma_dollars"),
        F.when(xi > 0.05, F.lit("heavy_tail"))
        .when(xi < -0.05, F.lit("bounded_tail"))
        .otherwise(F.lit("exponential_like"))
        .alias("verdict"),
    )


SQL_GPD_TAIL_FIT = """
WITH ev AS (
  SELECT CAST(sign(value) * floor(abs(value) * 100 + 0.5)
    AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), h AS (
  SELECT c, CAST(count(*) AS BIGINT) AS t FROM ev GROUP BY c
), rk AS (
  SELECT c, t,
    CAST(sum(t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(t) OVER () AS BIGINT) AS nn
  FROM h
), thr AS (
  SELECT min(c) AS thrv FROM rk
  WHERE cum >= (9 * nn + 9) // 10
), exc AS (
  SELECT rk.c - thr.thrv AS v, rk.t, rk.nn, thr.thrv
  FROM rk, thr WHERE rk.c > thr.thrv
), exb AS (
  SELECT v, t, nn, thrv,
    CAST(coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM exc
), mom AS (
  SELECT CAST(max(nn) AS BIGINT) AS np,
    CAST(max(thrv) AS BIGINT) AS thrv,
    CAST(sum(t) AS BIGINT) AS n,
    CAST(sum(v * t) AS BIGINT) AS s,
    CAST(sum(v * t * (2 * b + t - 1)) AS BIGINT) AS k
  FROM exb
), lm AS (
  SELECT np, thrv, n,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS l1,
    CAST(k AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS l2
  FROM mom WHERE n > 5
)
SELECT np AS n_purchases,
  round(CAST(thrv AS DOUBLE) / 100.0, 6) AS threshold_dollars,
  n AS n_exceed,
  round(l1 / 100.0, 6) AS mean_excess_dollars,
  round(2.0 - l1 / l2, 6) AS xi_hat,
  round(l1 * (1.0 + (l1 / l2 - 2.0)) / 100.0, 6) AS sigma_dollars,
  CASE WHEN 2.0 - l1 / l2 > 0.05 THEN 'heavy_tail'
       WHEN 2.0 - l1 / l2 < -0.05 THEN 'bounded_tail'
       ELSE 'exponential_like' END AS verdict
FROM lm WHERE l2 > 0
"""

QUERIES["gpd_tail_fit"] = q_gpd_tail_fit
_RAW_ORACLES["gpd_tail_fit"] = SQL_GPD_TAIL_FIT
def q_getis_ord_g(spark, sf_dir):
    """Global Getis-Ord G of hourly event volume on the circular
    hour-of-day graph (Getis & Ord Geographical Analysis 1992 —
    the HOT-SPOT complement of moran_i on the same 24-cycle:
    Moran's I asks 'do neighboring hours covary around the mean?'
    and scores high for matched COLD spots too; G asks 'do HIGH
    values cluster next to high values?' — G above its expectation
    means the load peak is a contiguous block of hours (one
    scaling window), below means high hours alternate with low.
    Same unit-weight ring as moran_i so the two are directly
    comparable). G = 2 sum y_h y_{h+1} / (m1^2 - m2) is ONE
    exact-long division; the randomization variance uses the
    Getis-Ord B0..B4 moment formula with S1 = 4n, S2 = 16n,
    W = 2n and raw moments m1..m4 (EXACT LONGS), assembled in
    decimal(38,0)/HUGEINT so the ~1e22 numerator products never
    round: Var = E[G^2] - E[G]^2 with E[G] = 2/(n-1). 2 shuffles
    at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.hour(F.col("ts").cast("timestamp")).cast("long")
        .alias("__h"),
    )
    g = ev.groupBy("__h").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.array_sort(
            F.collect_list(F.struct("__h", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .filter(F.col("n_cells") > 4)
        .withColumn(
            "__num",
            F.expr(
                "2L * aggregate(sequence(1L, n_cells), 0L,"
                " (acc, i) -> acc"
                " + element_at(__yarr, cast(i as int))"
                " * element_at(__yarr,"
                " cast(IF(i = n_cells, 1L, i + 1) as int)))"
            ),
        )
        .withColumn(
            "__m1",
            F.expr("aggregate(__yarr, 0L, (acc, v) -> acc + v)"),
        )
        .withColumn(
            "__m2",
            F.expr(
                "aggregate(__yarr, 0L, (acc, v) -> acc + v * v)"
            ),
        )
        .withColumn(
            "__m3",
            F.expr(
                "aggregate(__yarr, 0L, (acc, v) ->"
                " acc + v * v * v)"
            ),
        )
        .withColumn(
            "__m4",
            F.expr(
                "aggregate(__yarr, 0L, (acc, v) ->"
                " acc + v * v * v * v)"
            ),
        )
        .withColumn("__den", F.expr("__m1 * __m1 - __m2"))
        .filter(F.col("__den") > 0)
    )
    # Getis-Ord 1992 randomization moments on the unit-weight ring:
    # W = 2n, S1 = 4n, S2 = 16n
    one = one.withColumn(
        "__eg2num",
        F.expr(
            "cast((n_cells * n_cells - 3L * n_cells + 3L)"
            " * (4L * n_cells) - n_cells * (16L * n_cells)"
            " + 3L * (2L * n_cells) * (2L * n_cells)"
            " as decimal(38,0))"
            " * cast(__m2 as decimal(38,0))"
            " * cast(__m2 as decimal(38,0))"
            " - cast((n_cells * n_cells - n_cells)"
            " * (4L * n_cells) - 2L * n_cells * (16L * n_cells)"
            " + 6L * (2L * n_cells) * (2L * n_cells)"
            " as decimal(38,0))"
            " * cast(__m4 as decimal(38,0))"
            " - cast(2L * n_cells * (4L * n_cells)"
            " - (n_cells + 3L) * (16L * n_cells)"
            " + 6L * (2L * n_cells) * (2L * n_cells)"
            " as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m2 as decimal(38,0))"
            " + cast(4L * (n_cells - 1L) * (4L * n_cells)"
            " - 2L * (n_cells + 1L) * (16L * n_cells)"
            " + 8L * (2L * n_cells) * (2L * n_cells)"
            " as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m3 as decimal(38,0))"
            " + cast(4L * n_cells - 16L * n_cells"
            " + (2L * n_cells) * (2L * n_cells)"
            " as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
            " * cast(__m1 as decimal(38,0))"
        ),
    ).withColumn(
        "__eg2den",
        F.expr(
            "cast(__den as decimal(38,0))"
            " * cast(__den as decimal(38,0))"
            " * cast(n_cells * (n_cells - 1L) * (n_cells - 2L)"
            " * (n_cells - 3L) as decimal(38,0))"
        ),
    )
    gg = F.col("__num").cast("double") / F.col("__den").cast(
        "double"
    )
    e = F.lit(2.0) / (F.col("n_cells") - 1).cast("double")
    var = (
        F.col("__eg2num").cast("double")
        / F.col("__eg2den").cast("double")
        - e * e
    )
    z = (gg - e) / F.sqrt(var)
    one = one.withColumn("__var", var).filter(F.col("__var") > 0)
    return one.select(
        "n_cells",
        _r6(gg).alias("g_stat"),
        _r6(e).alias("e_g"),
        _r6(F.col("__var")).alias("var_g"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z > 0.0, F.lit("high_values_cluster"))
        .when(z < 0.0, F.lit("high_values_disperse"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


SQL_GETIS_ORD_G = """
WITH hr AS (
  SELECT hour(ts) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY hour(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY h) AS yarr
  FROM hr
), mom AS (
  SELECT n, yarr,
    2 * CAST(list_sum(list_transform(
      range(1, CAST(n + 1 AS INTEGER)), i -> yarr[i]
      * yarr[CASE WHEN i = n THEN 1 ELSE i + 1 END]))
      AS BIGINT) AS num,
    CAST(list_sum(yarr) AS BIGINT) AS m1,
    CAST(list_sum(list_transform(yarr, v -> v * v)) AS BIGINT)
      AS m2,
    CAST(list_sum(list_transform(yarr, v -> v * v * v))
      AS BIGINT) AS m3,
    CAST(list_sum(list_transform(yarr, v -> v * v * v * v))
      AS BIGINT) AS m4
  FROM one WHERE n > 4
), dn AS (
  SELECT *, m1 * m1 - m2 AS den FROM mom
  WHERE m1 * m1 - m2 > 0
), vr AS (
  SELECT n, num, den,
    (CAST((n * n - 3 * n + 3) * (4 * n) - n * (16 * n)
       + 3 * (2 * n) * (2 * n) AS HUGEINT)
     * CAST(m2 AS HUGEINT) * CAST(m2 AS HUGEINT)
     - CAST((n * n - n) * (4 * n) - 2 * n * (16 * n)
       + 6 * (2 * n) * (2 * n) AS HUGEINT)
     * CAST(m4 AS HUGEINT)
     - CAST(2 * n * (4 * n) - (n + 3) * (16 * n)
       + 6 * (2 * n) * (2 * n) AS HUGEINT)
     * CAST(m1 AS HUGEINT) * CAST(m1 AS HUGEINT)
     * CAST(m2 AS HUGEINT)
     + CAST(4 * (n - 1) * (4 * n) - 2 * (n + 1) * (16 * n)
       + 8 * (2 * n) * (2 * n) AS HUGEINT)
     * CAST(m1 AS HUGEINT) * CAST(m3 AS HUGEINT)
     + CAST(4 * n - 16 * n + (2 * n) * (2 * n) AS HUGEINT)
     * CAST(m1 AS HUGEINT) * CAST(m1 AS HUGEINT)
     * CAST(m1 AS HUGEINT) * CAST(m1 AS HUGEINT)) AS eg2num,
    CAST(den AS HUGEINT) * CAST(den AS HUGEINT)
     * CAST(n * (n - 1) * (n - 2) * (n - 3) AS HUGEINT) AS eg2den
  FROM dn
), st AS (
  SELECT n,
    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS g,
    2.0 / CAST(n - 1 AS DOUBLE) AS e,
    CAST(eg2num AS DOUBLE) / CAST(eg2den AS DOUBLE)
      - (2.0 / CAST(n - 1 AS DOUBLE))
      * (2.0 / CAST(n - 1 AS DOUBLE)) AS v
  FROM vr
)
SELECT n AS n_cells,
  round(g, 6) AS g_stat,
  round(e, 6) AS e_g,
  round(v, 6) AS var_g,
  round((g - e) / sqrt(v), 6) AS z_stat,
  (abs((g - e) / sqrt(v)) > 1.96) AS reject_5pct,
  CASE WHEN (g - e) / sqrt(v) > 0.0 THEN 'high_values_cluster'
       WHEN (g - e) / sqrt(v) < 0.0 THEN 'high_values_disperse'
       ELSE 'random' END AS verdict
FROM st WHERE v > 0
"""

QUERIES["getis_ord_g"] = q_getis_ord_g
_RAW_ORACLES["getis_ord_g"] = SQL_GETIS_ORD_G


def q_conover_scale(spark, sf_dir):
    """Conover squared-ranks test for equality of VARIANCE between
    weekend and weekday daily event volumes (Conover & Iman 1978;
    Conover 'Practical Nonparametric Statistics' §5.3 — the rank-
    robust scale test that needs no normality, unlike bartlett_test,
    and unlike levene_test needs no F approximation: rank the
    absolute deviations from each group's own mean, sum the SQUARED
    ranks of one group, and the null moments are exact polynomial
    functions of the rank multiset — the 'is weekend load merely
    shifted, or differently VOLATILE?' screen beside welch_pairs
    which only sees the mean). Exactness: deviations are compared
    across groups after clearing both rational means — U_i =
    n2*|n1*x_i - G1| in the weekend group, n1*|n2*x_j - G2| in the
    weekday group (order-preserving EXACT LONGS); doubled midranks
    2R = #(v<u) + #(v<=u) + 1 keep every rank integer under ties,
    and T' = sum (2R)^2 over the weekend group, sum Q2 = sum (2R)^2
    and sum Q4 = sum (2R)^4 over all days make z one fixed
    expression (the 4x/16x scalings cancel in z). 2 shuffles at any
    corpus size."""
    ev = _events(spark, sf_dir).select(
        F.to_date(F.col("ts").cast("timestamp")).alias("__d"),
    )
    day = ev.groupBy("__d").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    day = day.withColumn(
        "__we",
        (F.expr("weekday(__d)") >= 5).cast("long"),
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("__d", "__we", "__y"))
        ).alias("__a"),
    )
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        .withColumn("__warr", F.expr("transform(__a, s -> s.__we)"))
        .filter(F.col("n_days") > 3)
        .withColumn(
            "__n1",
            F.expr("aggregate(__warr, 0L, (acc, w) -> acc + w)"),
        )
        .withColumn(
            "__g1",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, i) ->"
                " acc + IF(element_at(__warr, cast(i as int)) = 1L,"
                " element_at(__yarr, cast(i as int)), 0L))"
            ),
        )
        .withColumn("__n2", F.expr("n_days - __n1"))
        .withColumn(
            "__g2",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, i) ->"
                " acc + IF(element_at(__warr, cast(i as int)) = 0L,"
                " element_at(__yarr, cast(i as int)), 0L))"
            ),
        )
        .filter((F.col("__n1") > 1) & (F.col("__n2") > 1))
        .withColumn(
            "__u",
            F.expr(
                "transform(sequence(1L, n_days), i ->"
                " IF(element_at(__warr, cast(i as int)) = 1L,"
                " __n2 * abs(__n1"
                " * element_at(__yarr, cast(i as int)) - __g1),"
                " __n1 * abs(__n2"
                " * element_at(__yarr, cast(i as int)) - __g2)))"
            ),
        )
        .withColumn(
            "__r2",
            F.expr(
                "transform(__u, u -> aggregate(__u, 1L,"
                " (acc, v) -> acc + IF(v < u, 2L,"
                " IF(v = u, 1L, 0L))))"
            ),
        )
        .withColumn(
            "__t4",
            F.expr(
                "aggregate(sequence(1L, n_days), 0L, (acc, i) ->"
                " acc + IF(element_at(__warr, cast(i as int)) = 1L,"
                " element_at(__r2, cast(i as int))"
                " * element_at(__r2, cast(i as int)), 0L))"
            ),
        )
        .withColumn(
            "__q2",
            F.expr(
                "aggregate(__r2, 0L, (acc, r) -> acc + r * r)"
            ),
        )
        .withColumn(
            "__q4",
            F.expr(
                "aggregate(__r2, 0L, (acc, r) ->"
                " acc + r * r * r * r)"
            ),
        )
    )
    n = F.col("n_days").cast("double")
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    t = F.col("__t4").cast("double") / F.lit(4.0)
    et = n1 * (F.col("__q2").cast("double") / F.lit(4.0)) / n
    vt = (
        n1 * n2 / (n * (n - 1))
        * (
            F.col("__q4").cast("double") / F.lit(16.0)
            - (F.col("__q2").cast("double") / F.lit(4.0))
            * (F.col("__q2").cast("double") / F.lit(4.0)) / n
        )
    )
    z = (t - et) / F.sqrt(vt)
    one = one.withColumn("__vt", vt).filter(F.col("__vt") > 0)
    return one.select(
        "n_days",
        F.col("__n1").alias("n_weekend"),
        F.col("__n2").alias("n_weekday"),
        _r6(t).alias("t_stat"),
        _r6(et).alias("e_t"),
        _r6(F.col("__vt")).alias("var_t"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(z > 0.0, F.lit("weekend_more_variable"))
        .when(z < 0.0, F.lit("weekday_more_variable"))
        .otherwise(F.lit("equal_scale"))
        .alias("verdict"),
    )


SQL_CONOVER_SCALE = """
WITH day AS (
  SELECT date_trunc('day', ts) AS d,
    CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY date_trunc('day', ts)
), flagged AS (
  SELECT y, CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS we
  FROM day
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y) AS yarr, list(we) AS warr,
    CAST(sum(we) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN we = 1 THEN y ELSE 0 END) AS BIGINT) AS g1,
    CAST(count(*) - sum(we) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN we = 0 THEN y ELSE 0 END) AS BIGINT) AS g2
  FROM flagged
), uu AS (
  SELECT n, warr, n1, n2,
    list_transform(range(1, CAST(n + 1 AS INTEGER)), i ->
      CASE WHEN warr[i] = 1
        THEN n2 * abs(n1 * yarr[i] - g1)
        ELSE n1 * abs(n2 * yarr[i] - g2) END) AS u
  FROM one WHERE n > 3 AND n1 > 1 AND n2 > 1
), rr AS (
  SELECT n, warr, n1, n2,
    list_transform(u, x -> CAST(1 + list_sum(list_transform(u,
      v -> CASE WHEN v < x THEN 2 WHEN v = x THEN 1
           ELSE 0 END)) AS BIGINT)) AS r2
  FROM uu
), f AS (
  SELECT n, n1, n2,
    CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INTEGER)),
      i -> CASE WHEN warr[i] = 1 THEN r2[i] * r2[i]
           ELSE 0 END)) AS BIGINT) AS t4,
    CAST(list_sum(list_transform(r2, r -> r * r)) AS BIGINT)
      AS q2,
    CAST(list_sum(list_transform(r2, r -> r * r * r * r))
      AS BIGINT) AS q4
  FROM rr
), st AS (
  SELECT n, n1, n2,
    CAST(t4 AS DOUBLE) / 4.0 AS t,
    CAST(n1 AS DOUBLE) * (CAST(q2 AS DOUBLE) / 4.0)
      / CAST(n AS DOUBLE) AS et,
    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
      * (CAST(q4 AS DOUBLE) / 16.0
         - (CAST(q2 AS DOUBLE) / 4.0)
           * (CAST(q2 AS DOUBLE) / 4.0)
           / CAST(n AS DOUBLE)) AS vt
  FROM f
)
SELECT n AS n_days, n1 AS n_weekend, n2 AS n_weekday,
  round(t, 6) AS t_stat,
  round(et, 6) AS e_t,
  round(vt, 6) AS var_t,
  round((t - et) / sqrt(vt), 6) AS z_stat,
  (abs((t - et) / sqrt(vt)) > 1.96) AS reject_5pct,
  CASE WHEN (t - et) / sqrt(vt) > 0.0
         THEN 'weekend_more_variable'
       WHEN (t - et) / sqrt(vt) < 0.0
         THEN 'weekday_more_variable'
       ELSE 'equal_scale' END AS verdict
FROM st WHERE vt > 0
"""

QUERIES["conover_scale"] = q_conover_scale
_RAW_ORACLES["conover_scale"] = SQL_CONOVER_SCALE
def q_rmst(spark, sf_dir):
    """Restricted mean survival time of user lifetimes at tau = 7
    and 14 days (Royston & Parmar Stat. Med. 2013; Uno et al. JCO
    2014 — THE recommended summary when KM curves cross or
    censoring is heavy: rather than the median or a hazard ratio,
    report the AREA under the KM curve up to a clinical horizon =
    expected days survived of the first tau; here 'how much of the
    first week/fortnight does a median cohort member stay
    active?', the scalar the retention_cohorts table hints at but
    never integrates). Built on the same hourly-binned KM curve as
    survival_km (operators/survival.py kaplan_meier, 7-day
    censoring): RMST(tau) = sum_k S_k * (min(b_{k+1}, tau) -
    min(b_k, tau)) + min(b_1, tau), an in-order fold where the
    segment widths are EXACT INTEGER hours and S_k the same
    exp-sum-ln survival both engines already match bit-for-bit.
    Curve is tiny after the entity/day-keyed heavy passes."""
    from mpds_spark.operators.survival import kaplan_meier

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts"
    )
    out = kaplan_meier(
        ev, entity="entity_id", ts="ts", churn_gap_days=7.0,
        bin_seconds=3600,
    ).select("duration_bin", "km_survival")
    one = out.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.array_sort(
            F.collect_list(
                F.struct("duration_bin", "km_survival")
            )
        ).alias("__a"),
    ).filter(F.col("n_bins") > 0)
    one = (
        one
        .withColumn(
            "__bs", F.expr("transform(__a, s -> s.duration_bin)")
        )
        .withColumn(
            "__ss", F.expr("transform(__a, s -> s.km_survival)")
        )
    )

    def _rmst(tau: int):
        return F.expr(
            f"cast(least(element_at(__bs, 1), {tau}L) as double)"
            " + aggregate(sequence(1L, n_bins),"
            " cast(0.0 as double), (acc, k) -> acc"
            " + element_at(__ss, cast(k as int))"
            f" * cast(least(IF(k = n_bins, {tau}L,"
            f" element_at(__bs, cast(k + 1 as int))), {tau}L)"
            f" - least(element_at(__bs, cast(k as int)), {tau}L)"
            " as double))"
        )

    r7 = _rmst(168) / F.lit(24.0)
    r14 = _rmst(336) / F.lit(24.0)
    return one.select(
        "n_bins",
        _r6(r7).alias("rmst_7d_days"),
        _r6(r14).alias("rmst_14d_days"),
        _r6(r7 / F.lit(7.0)).alias("restricted_frac_7d"),
        F.when(r7 / F.lit(7.0) > 0.5, F.lit("retention_high"))
        .when(r7 / F.lit(7.0) > 0.2, F.lit("retention_medium"))
        .otherwise(F.lit("retention_low"))
        .alias("verdict"),
    )


SQL_RMST = """
WITH d AS (SELECT user_id AS e, epoch_us(ts) AS us FROM events),
mx AS (SELECT max(us) AS mx FROM d),
sp AS (SELECT e, min(us) AS s, max(us) AS t FROM d GROUP BY e),
sv AS (
  SELECT CAST((t - s) // 3600000000 AS BIGINT) AS day,
    CASE WHEN t <= (SELECT mx FROM mx) - 604800000000
         THEN 1 ELSE 0 END AS obs
  FROM sp
), curve AS (
  SELECT day, CAST(sum(obs) AS BIGINT) AS n_events,
    CAST(sum(1 - obs) AS BIGINT) AS n_censored
  FROM sv GROUP BY day
), risk AS (
  SELECT day, n_events, n_censored,
    CAST((SELECT sum(n_events + n_censored) FROM curve)
      - coalesce(sum(n_events + n_censored) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS n_risk
  FROM curve
), km AS (
  SELECT r1.day,
    list_sum(list(CASE WHEN r2.n_events < r2.n_risk
      THEN ln((r2.n_risk - r2.n_events)::DOUBLE / r2.n_risk::DOUBLE)
      ELSE 0.0 END ORDER BY r2.day)) AS lnsum,
    max(CASE WHEN r2.n_events = r2.n_risk THEN 1 ELSE 0 END) AS zero
  FROM risk r1 JOIN risk r2 ON r2.day <= r1.day GROUP BY r1.day
), c2 AS (
  SELECT r.day AS b,
    CASE WHEN k.zero = 1 THEN 0.0 ELSE exp(k.lnsum) END AS s
  FROM risk r JOIN km k ON k.day = r.day
), arr AS (
  SELECT CAST(count(*) AS BIGINT) AS kk,
    list(b ORDER BY b) AS bs, list(s ORDER BY b) AS ss
  FROM c2
), f AS (
  SELECT kk,
    CAST(least(bs[1], 168) AS DOUBLE)
      + list_sum(list_transform(range(1, CAST(kk + 1 AS INTEGER)),
        k -> ss[k] * CAST(least(CASE WHEN k = kk THEN 168
              ELSE bs[k + 1] END, 168)
            - least(bs[k], 168) AS DOUBLE))) AS h7,
    CAST(least(bs[1], 336) AS DOUBLE)
      + list_sum(list_transform(range(1, CAST(kk + 1 AS INTEGER)),
        k -> ss[k] * CAST(least(CASE WHEN k = kk THEN 336
              ELSE bs[k + 1] END, 336)
            - least(bs[k], 336) AS DOUBLE))) AS h14
  FROM arr WHERE kk > 0
)
SELECT kk AS n_bins,
  round(h7 / 24.0, 6) AS rmst_7d_days,
  round(h14 / 24.0, 6) AS rmst_14d_days,
  round(h7 / 24.0 / 7.0, 6) AS restricted_frac_7d,
  CASE WHEN h7 / 24.0 / 7.0 > 0.5 THEN 'retention_high'
       WHEN h7 / 24.0 / 7.0 > 0.2 THEN 'retention_medium'
       ELSE 'retention_low' END AS verdict
FROM f
"""

QUERIES["rmst"] = q_rmst
_RAW_ORACLES["rmst"] = SQL_RMST


def q_quade_test(spark, sf_dir):
    """Quade test for day-of-week effects across the month's four
    complete weeks (Quade JASA 1979 — the block-WEIGHTED upgrade of
    friedman_test: Friedman gives every block equal say; Quade
    weights each week by the rank of its within-week RANGE, so
    weeks where the weekday pattern is pronounced dominate —
    strictly more powerful for k <= 5-ish treatments and the
    right test when volume swings differ week to week). Blocks =
    weeks 1-4 (days 1-28 only; requires the full 28-day grid),
    treatments = day-of-week. Everything stays EXACT: within-block
    doubled midranks 2r (k = 7 so (k+1)/2 clears to the integer
    2r - 8), block-range doubled midranks 2Q across the 4 weeks,
    scaled scores S' = 2Q*(2r - 8) EXACT LONGS, and the statistic
    F = (b-1)*sum_j Sj'^2 / (b*sum S'^2 - sum_j Sj'^2) is ONE
    division of exact longs (all 4x/16x scalings cancel); F(6,18)
    5pct critical 2.661. 2 shuffles at any corpus size."""
    ev = _events(spark, sf_dir).select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long")
        .alias("__day"),
    ).filter(F.col("__day") <= 28)
    day = ev.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    one = day.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.array_sort(
            F.collect_list(F.struct("__day", "__y"))
        ).alias("__a"),
    ).filter(F.col("__n") == 28)
    one = (
        one
        .withColumn("__yarr", F.expr("transform(__a, s -> s.__y)"))
        # within-block doubled midranks: block of day d is indices
        # 7*((d-1) div 7)+1 .. +7
        .withColumn(
            "__r2",
            F.expr(
                "transform(sequence(1L, 28L), d ->"
                " aggregate(sequence(7L * ((d - 1) div 7L) + 1L,"
                " 7L * ((d - 1) div 7L) + 7L), 1L, (acc, m) ->"
                " acc + IF(element_at(__yarr, cast(m as int))"
                " < element_at(__yarr, cast(d as int)), 2L,"
                " IF(element_at(__yarr, cast(m as int))"
                " = element_at(__yarr, cast(d as int)), 1L, 0L))))"
            ),
        )
        .withColumn(
            "__rng",
            F.expr(
                "transform(sequence(0L, 3L), b ->"
                " array_max(slice(__yarr, cast(7 * b + 1 as int), 7))"
                " - array_min(slice(__yarr,"
                " cast(7 * b + 1 as int), 7)))"
            ),
        )
        .withColumn(
            "__q2",
            F.expr(
                "transform(__rng, r -> aggregate(__rng, 1L,"
                " (acc, v) -> acc + IF(v < r, 2L,"
                " IF(v = r, 1L, 0L))))"
            ),
        )
        # scaled scores S'_(d) = 2Q_block(d) * (2r_d - 8)
        .withColumn(
            "__sp",
            F.expr(
                "transform(sequence(1L, 28L), d ->"
                " element_at(__q2, cast((d - 1) div 7 + 1 as int))"
                " * (element_at(__r2, cast(d as int)) - 8L))"
            ),
        )
        .withColumn(
            "__aa",
            F.expr(
                "aggregate(__sp, 0L, (acc, s) -> acc + s * s)"
            ),
        )
        # treatment sums: treatment of day d is (d-1) % 7
        .withColumn(
            "__sb",
            F.expr(
                "aggregate(sequence(0L, 6L), 0L, (acc, j) ->"
                " acc + aggregate(sequence(0L, 3L), 0L,"
                " (a2, b) -> a2 + element_at(__sp,"
                " cast(7 * b + j + 1 as int)))"
                " * aggregate(sequence(0L, 3L), 0L,"
                " (a2, b) -> a2 + element_at(__sp,"
                " cast(7 * b + j + 1 as int))))"
            ),
        )
        .filter(F.expr("4L * __aa - __sb") > 0)
    )
    fstat = (F.lit(3) * F.col("__sb")).cast("double") / (
        F.lit(4) * F.col("__aa") - F.col("__sb")
    ).cast("double")
    return one.select(
        F.lit(4).cast("long").alias("n_blocks"),
        F.lit(7).cast("long").alias("n_treatments"),
        F.col("__aa").alias("a_scaled"),
        F.col("__sb").alias("b_scaled"),
        _r6(fstat).alias("f_stat"),
        (fstat > F.lit(2.661)).alias("reject_5pct"),
        F.when(fstat > 2.661, F.lit("weekday_effect"))
        .otherwise(F.lit("no_weekday_effect"))
        .alias("verdict"),
    )


SQL_QUADE_TEST = """
WITH day AS (
  SELECT day(ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE day(ts) <= 28 GROUP BY day(ts)
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    list(y ORDER BY day) AS yarr
  FROM day
), rk AS (
  SELECT yarr,
    list_transform(range(1, 29), d -> CAST(1 + list_sum(
      list_transform(range(CAST(7 * ((d - 1) // 7) + 1 AS INTEGER),
        CAST(7 * ((d - 1) // 7) + 8 AS INTEGER)), m ->
        CASE WHEN yarr[m] < yarr[d] THEN 2
             WHEN yarr[m] = yarr[d] THEN 1 ELSE 0 END))
      AS BIGINT)) AS r2,
    list_transform(range(0, 4), b ->
      list_max(yarr[7 * b + 1:7 * b + 7])
      - list_min(yarr[7 * b + 1:7 * b + 7])) AS rng
  FROM one WHERE n = 28
), qk AS (
  SELECT yarr, r2,
    list_transform(rng, r -> CAST(1 + list_sum(list_transform(rng,
      v -> CASE WHEN v < r THEN 2 WHEN v = r THEN 1
           ELSE 0 END)) AS BIGINT)) AS q2
  FROM rk
), sp AS (
  SELECT list_transform(range(1, 29), d ->
    q2[CAST((d - 1) // 7 + 1 AS INTEGER)] * (r2[d] - 8)) AS s
  FROM qk
), f AS (
  SELECT
    CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT) AS aa,
    CAST(list_sum(list_transform(range(0, 7), j ->
      list_sum(list_transform(range(0, 4), b ->
        s[7 * b + j + 1]))
      * list_sum(list_transform(range(0, 4), b ->
        s[7 * b + j + 1])))) AS BIGINT) AS sb
  FROM sp
)
SELECT CAST(4 AS BIGINT) AS n_blocks,
  CAST(7 AS BIGINT) AS n_treatments,
  aa AS a_scaled, sb AS b_scaled,
  round(CAST(3 * sb AS DOUBLE) / CAST(4 * aa - sb AS DOUBLE), 6)
    AS f_stat,
  (CAST(3 * sb AS DOUBLE) / CAST(4 * aa - sb AS DOUBLE) > 2.661)
    AS reject_5pct,
  CASE WHEN CAST(3 * sb AS DOUBLE) / CAST(4 * aa - sb AS DOUBLE)
    > 2.661 THEN 'weekday_effect'
    ELSE 'no_weekday_effect' END AS verdict
FROM f WHERE 4 * aa - sb > 0
"""

QUERIES["quade_test"] = q_quade_test
_RAW_ORACLES["quade_test"] = SQL_QUADE_TEST
def q_honore_sichel(spark, sf_dir):
    """Honore's R and Sichel's S per source (Honore 1979; Sichel
    1975 — the RARE-WORD end of the stylometry tier: yule_k scores
    repeat-rate (dominated by the most frequent words), these score
    the opposite tail — R = 100 ln N / (1 - V1/V) diverges as
    hapax share V1/V grows (rich, non-templated vocabulary), S =
    V2/V is the dis-legomena share Sichel showed is remarkably
    stable across authors and so flags machine-generated or
    boilerplate sources when it drifts; together with yule_k they
    bracket the frequency-of-frequencies spectrum from both ends).
    V, V1, V2, N are EXACT LONGS from the same one (source, word)
    aggregation as yule_k; R rides the catalog's ln precedent and
    everything else is exact-integer ratios. At 10^12 tokens both
    reduce to the word-count table. 3 shuffles at any corpus
    size."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__w"),
    )
    cells = d.groupBy("source", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    mom = cells.groupBy("source").agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long")
        .alias("v1_hapax"),
        F.sum((F.col("__c") == 2).cast("long")).cast("long")
        .alias("v2_dis"),
    ).filter(
        (F.col("vocab") > F.col("v1_hapax")) & (F.col("vocab") > 0)
    )
    nd = F.col("n_tokens").cast("double")
    vd = F.col("vocab").cast("double")
    v1 = F.col("v1_hapax").cast("double")
    r = F.lit(100.0) * F.log(nd) / (F.lit(1.0) - v1 / vd)
    s = F.col("v2_dis").cast("double") / vd
    return mom.select(
        "source",
        "n_tokens",
        "vocab",
        "v1_hapax",
        "v2_dis",
        _r6(v1 / vd).alias("hapax_share"),
        _r6(r).alias("honore_r"),
        _r6(s).alias("sichel_s"),
    ).orderBy("source")


SQL_HONORE_SICHEL = """
WITH w AS (
  SELECT source, unnest(regexp_split_to_array(trim(text),
    '\\s+')) AS word
  FROM documents
), cells AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c
  FROM w GROUP BY source, word
), mom AS (
  SELECT source,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS vocab,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS v1_hapax,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
      AS v2_dis
  FROM cells GROUP BY source
)
SELECT source, n_tokens, vocab, v1_hapax, v2_dis,
  round(CAST(v1_hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 6)
    AS hapax_share,
  round(100.0 * ln(CAST(n_tokens AS DOUBLE))
    / (1.0 - CAST(v1_hapax AS DOUBLE) / CAST(vocab AS DOUBLE)), 6)
    AS honore_r,
  round(CAST(v2_dis AS DOUBLE) / CAST(vocab AS DOUBLE), 6)
    AS sichel_s
FROM mom WHERE vocab > v1_hapax AND vocab > 0
ORDER BY source
"""

QUERIES["honore_sichel"] = q_honore_sichel
_RAW_ORACLES["honore_sichel"] = SQL_HONORE_SICHEL


def q_spiegelhalter_z(spark, sf_dir):
    """Spiegelhalter's Z calibration test for the deterministic
    length-based document classifier (Spiegelhalter Stat. Med. 1986
    — the HYPOTHESIS-TEST companion of calibration_bins: the
    reliability diagram shows WHERE the score s = min(n_chars,400)
    /400 is miscalibrated against y = [doc has >= 50 words], Z
    says WHETHER the total miscalibration exceeds what perfectly
    calibrated scores would produce by chance, using the exact
    null mean 0 and variance sum (1-2p)^2 p(1-p) of the Brier
    score). Entirely integer-exact: scaling by 400 clears every
    rational — Z = sum (400y - m)(400 - 2m) / sqrt(sum (400-2m)^2
    m (400-m)) is ONE division of EXACT LONGS (the 400^2/400^4
    scalings cancel), computed in a single corpus aggregate. 1
    shuffle at any corpus size."""
    d = load(spark, sf_dir, "documents").select(
        F.least(F.col("n_chars"), F.lit(400)).cast("long")
        .alias("__m"),
        F.when(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", "")) + 1 >= 50,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__y"),
    )
    one = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__y").cast("long").alias("__pos"),
        F.sum("__m").cast("long").alias("__sm"),
        F.sum(
            (F.lit(400) * F.col("__y") - F.col("__m"))
            * (F.lit(400) - 2 * F.col("__m"))
        ).cast("long").alias("__num"),
        F.sum(
            (F.lit(400) - 2 * F.col("__m"))
            * (F.lit(400) - 2 * F.col("__m"))
            * F.col("__m") * (F.lit(400) - F.col("__m"))
        ).cast("long").alias("__den"),
    ).filter(F.col("__den") > 0)
    z = F.col("__num").cast("double") / F.sqrt(
        F.col("__den").cast("double")
    )
    return one.select(
        "n_docs",
        _r6(
            F.col("__sm").cast("double")
            / (F.lit(400) * F.col("n_docs")).cast("double")
        ).alias("mean_pred"),
        _r6(
            F.col("__pos").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("base_rate"),
        _r6(z).alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_5pct"),
        F.when(
            F.abs(z) <= 1.96, F.lit("calibrated")
        )
        .when(z > 0.0, F.lit("underconfident_scores"))
        .otherwise(F.lit("overconfident_scores"))
        .alias("verdict"),
    )


SQL_SPIEGELHALTER_Z = """
WITH d AS (
  SELECT CAST(least(n_chars, 400) AS BIGINT) AS m,
    CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 50
      THEN 1 ELSE 0 END AS y
  FROM documents
), one AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(m) AS BIGINT) AS sm,
    CAST(sum((400 * y - m) * (400 - 2 * m)) AS BIGINT) AS num,
    CAST(sum((400 - 2 * m) * (400 - 2 * m) * m * (400 - m))
      AS BIGINT) AS den
  FROM d
)
SELECT n_docs,
  round(CAST(sm AS DOUBLE) / CAST(400 * n_docs AS DOUBLE), 6)
    AS mean_pred,
  round(CAST(pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
    AS base_rate,
  round(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)), 6)
    AS z_stat,
  (abs(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE))) > 1.96)
    AS reject_5pct,
  CASE WHEN abs(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)))
         <= 1.96 THEN 'calibrated'
       WHEN CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) > 0.0
         THEN 'underconfident_scores'
       ELSE 'overconfident_scores' END AS verdict
FROM one WHERE den > 0
"""

QUERIES["spiegelhalter_z"] = q_spiegelhalter_z
_RAW_ORACLES["spiegelhalter_z"] = SQL_SPIEGELHALTER_Z
ORACLES = {k: _rewrite_rounds(v) for k, v in _RAW_ORACLES.items()}
