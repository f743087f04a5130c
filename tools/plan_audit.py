"""Plan audit: physical-plan node inventory for every catalog query.

Usage: python tools/plan_audit.py [sf_dir] [comma,separated,names]
Prints one JSON line per query with counts of the plan nodes that matter
for 100-TB behavior (exchanges, joins by strategy, Python stages, scans),
so a reviewer can diff plan shape across rounds without reading full
explain output. Planning only — no query execution (queries whose
CONSTRUCTION is eager, e.g. iterative CC, do execute their loop).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Whole-node-name patterns (substring counting overstates: bare "Exchange"
# also matches BroadcastExchange/ReusedExchange, "Window" matches
# WindowGroupLimit). Shuffle vs broadcast exchanges are counted separately —
# only the former is a repartitioning of the big side.
NODES = {
    "ShuffleExchange": r"\bExchange (?:hash|range|Single)",
    "BroadcastExchange": r"\bBroadcastExchange\b",
    "ReusedExchange": r"\bReusedExchange\b",
    "SortMergeJoin": r"\bSortMergeJoin\b",
    "BroadcastHashJoin": r"\bBroadcastHashJoin\b",
    "ShuffledHashJoin": r"\bShuffledHashJoin\b",
    "BroadcastNestedLoopJoin": r"\bBroadcastNestedLoopJoin\b",
    "CartesianProduct": r"\bCartesianProduct\b",
    "Window": r"\bWindow\b(?!GroupLimit)",
    "WindowGroupLimit": r"\bWindowGroupLimit\b",
    "ArrowEvalPython": r"\bArrowEvalPython\b",
    "BatchEvalPython": r"\bBatchEvalPython\b",
    "FlatMapGroupsInPandas": r"\bFlatMapGroupsInPandas\b",
    "FlatMapCoGroupsInPandas": r"\bFlatMapCoGroupsInPandas\b",
    "MapInPandas": r"\bMapInPandas\b",
    "InMemoryTableScan": r"\bInMemoryTableScan\b",
    "WholeStageCodegen": r"\bWholeStageCodegen\b",
}


def main() -> int:
    from mpds_spark.queries import QUERIES
    from mpds_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(QUERIES)
    spark = get_spark(
        app_name="plan_audit", master="local[4]", shuffle_partitions=4
    )
    for name in names:
        try:
            plan = (
                QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            counts = {n: len(re.findall(p, plan)) for n, p in NODES.items()}
            out = {"query": name} | {k: v for k, v in counts.items() if v}
        except Exception as e:  # noqa: BLE001
            out = {"query": name, "error": str(e)[:200]}
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
