"""Per-query isolation bench (guide §1.4): NOT the driver gate.

Times named catalog queries with BOTH estimators on a fresh local[$CPUS]
session mirroring bench.py's config:
  - count():   the driver bench's methodology (column-pruned)
  - noop sink: computes every column of every row (isolation estimator)
and optionally dumps `.explain("formatted")` to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py q1,q2,... [--reps N] [--plans TAG] [--noop]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    names = sys.argv[1].split(",")
    reps = 1
    tag = None
    noop = False
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--plans":
            tag = args.pop(0)
        elif a == "--noop":
            noop = True

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mpds_spark.operators.util import release_scratch
    from mpds_spark.queries import QUERIES
    from mpds_spark.session import get_spark

    spark = get_spark(
        app_name="mpds_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    out = {}
    for name in names:
        fn = QUERIES[name]
        if tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{tag}.txt", "w") as fh:
                fh.write(plan)
            release_scratch()
        samples = {"count": [], "noop": []}
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples["count"].append(round(time.perf_counter() - t0, 3))
            release_scratch()
            if noop:
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples["noop"].append(round(time.perf_counter() - t0, 3))
                release_scratch()
            spark.sparkContext.setJobDescription(None)
        out[name] = samples if noop else samples["count"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
