"""Feature-spec registry + zero-temporal-leakage lint.

SURVEY §2.11/§4.2: nothing in Spark stops a user writing `lead()` into a
feature column, so feature pipelines are declared as FeatureSpecs and
compiled — the compiler REJECTS forward-looking frames for feature columns
at plan-build time (LeakageError), and only allows them for columns
declared role="label"/"eval". The registry also carries the positional
names manifest (the reference's header-array contract,
extractAccelTestV2.m:49-59), so a 435-wide layout stays reproducible and
auditable.

Frames:
    "expanding"          rowsBetween(unboundedPreceding, currentRow)
    "rows:-K"            rowsBetween(-K, 0)
    "range:-W"           rangeBetween(-W, 0) on epoch seconds
    "rows:+K" / "range:+W" / "future"   forward-looking — labels only
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds
from mpds_spark.operators.asof import LeakageError

BACKWARD_FRAMES = ("expanding", "rows:-", "range:-", "current")
FORWARD_MARKERS = ("rows:+", "range:+", "future")


@dataclass
class FeatureSpec:
    name: str
    agg: str  # sum | avg | min | max | last | count
    input_col: str
    frame: str = "expanding"
    role: str = "feature"  # feature | label | eval

    def is_forward(self) -> bool:
        return any(self.frame.startswith(m) for m in FORWARD_MARKERS)


@dataclass
class FeaturePlan:
    specs: list[FeatureSpec] = field(default_factory=list)

    def add(self, spec: FeatureSpec) -> "FeaturePlan":
        self.specs.append(spec)
        return self

    def names(self) -> list[str]:
        """The positional manifest (header contract)."""
        return [s.name for s in self.specs]

    def lint(self) -> None:
        """Reject forward-looking frames on feature columns."""
        bad = [s for s in self.specs if s.role == "feature" and s.is_forward()]
        if bad:
            raise LeakageError(
                "forward-looking frames on feature columns: "
                + ", ".join(f"{s.name}({s.frame})" for s in bad)
                + " — declare role='label' or use a backward frame."
            )

    def compile(
        self, df: DataFrame, entity: str = "entity_id", ts: str = "ts"
    ) -> DataFrame:
        """Lint, then attach every spec as a window column."""
        self.lint()
        out = df.withColumn("__ts_epoch", epoch_seconds(df, ts))
        base = Window.partitionBy(entity).orderBy("__ts_epoch")
        for s in self.specs:
            out = out.withColumn(s.name, _expr(s, base, entity))
        return out.drop("__ts_epoch")


def _agg(agg: str, col: str) -> Column:
    fns = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "last": lambda c: F.last(c, ignorenulls=True),
        "first": lambda c: F.first(c, ignorenulls=True),
    }
    return fns[agg](col)


def _expr(s: FeatureSpec, base, entity: str) -> Column:
    if s.frame == "expanding":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    elif s.frame == "current":
        return F.col(s.input_col)
    elif s.frame.startswith("rows:"):
        k = int(s.frame.split(":")[1])
        w = base.rowsBetween(k, 0) if k < 0 else base.rowsBetween(0, k)
    elif s.frame.startswith("range:"):
        # float range frames need SQL window syntax (py4j takes longs only)
        w_val = float(s.frame.split(":")[1])
        bound = (
            f"RANGE BETWEEN {abs(w_val)!r} PRECEDING AND CURRENT ROW"
            if w_val < 0
            else f"RANGE BETWEEN CURRENT ROW AND {w_val!r} FOLLOWING"
        )
        return F.expr(
            f"{s.agg}(`{s.input_col}`) OVER "
            f"(PARTITION BY `{entity}` ORDER BY __ts_epoch {bound})"
        )
    elif s.frame == "future":
        w = base.rowsBetween(1, Window.unboundedFollowing)
    else:
        raise ValueError(f"unknown frame {s.frame!r}")
    return _agg(s.agg, s.input_col).over(w)
