"""mpds_spark — a PySpark-native point-in-time / as-of join + windowed
feature-engineering engine (backfill, lag/lead, sessionize).

Built from scratch on the pyspark.sql DataFrame API + Arrow-vectorized
pandas UDFs. Semantics re-create the reference pipeline
(lionwarriorjr/mpds: dssl/*.R, feature_extraction/*.m) — see SURVEY.md —
but the architecture is Spark-first: one range exchange per entity-keyed
pipeline leg, sorts/windows/UDFs pipelined within partitions, AQE + salting
for skew, checkpoint/lineage for resumability.

Public API (DataFrame in / DataFrame out):
    asof_join, time_since_event,
    locf, interpolate,
    derived_features, lag_lead_diff,
    sessionize, remove_short_on_intervals, unite_adjacent_on_intervals,
    event_response, interval_join,
    smoothness_pairs, interleave_split, pair_diff,
    extract_battery, robust_scale, rescale_scores
"""

from mpds_spark.session import get_spark
from mpds_spark.operators.asof import asof_join, time_since_event
from mpds_spark.operators.backfill import locf, interpolate
from mpds_spark.operators.windows import derived_features, lag_lead_diff
from mpds_spark.operators.sessionize import (
    sessionize,
    remove_short_on_intervals,
    unite_adjacent_on_intervals,
    event_response,
    interval_join,
)

__all__ = [
    "get_spark",
    "asof_join",
    "time_since_event",
    "locf",
    "interpolate",
    "derived_features",
    "lag_lead_diff",
    "sessionize",
    "remove_short_on_intervals",
    "unite_adjacent_on_intervals",
    "event_response",
    "interval_join",
]

__version__ = "0.1.0"
