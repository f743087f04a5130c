"""Per-query regression report normalized for host load.

The sandbox host is shared: absolute per-query seconds swing ~1.7x between
load windows UNIFORMLY across unrelated queries. A raw ratio therefore
can't distinguish "the host was busy" from "this query regressed". This
tool divides each query's new/reference time ratio by the MEDIAN ratio
over all common queries (the host-load factor) and flags queries whose
NORMALIZED ratio exceeds the threshold — i.e. queries that got slower
relative to the rest of the catalog.

Usage:
  python tools/bench_delta.py NEW.json [REF.json] [--threshold 1.5]

REF defaults to BENCH/bench_reference.json (the recorded quiet-window
per-query times). Exit code 1 iff any regression is flagged.
"""

from __future__ import annotations

import json
import os
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d:  # driver BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d["queries"] if "queries" in d else d


def delta(new: dict[str, float], ref: dict[str, float], threshold: float):
    common = sorted(set(new) & set(ref))
    ratios = {q: new[q] / ref[q] for q in common if ref[q] > 0}
    rs = sorted(ratios.values())
    if not rs:
        return {"error": "no common queries"}
    m = len(rs)
    median = rs[m // 2] if m % 2 else (rs[m // 2 - 1] + rs[m // 2]) / 2
    norm = {q: r / median for q, r in ratios.items()}
    # flag only MATERIAL regressions: normalized ratio over threshold AND
    # at least 0.5 s of absolute excess over the load-adjusted expectation —
    # sub-second queries are noise-dominated and would flag spuriously
    excess = {q: new[q] - median * ref[q] for q in ratios}
    regressed = {
        q: round(v, 2)
        for q, v in norm.items()
        if v > threshold and excess[q] > 0.5
    }
    improved = {q: round(v, 2) for q, v in norm.items() if v < 1 / threshold}
    return {
        "n_common": len(common),
        "new_only": sorted(set(new) - set(ref)),
        "gone": sorted(set(ref) - set(new)),
        "host_load_factor": round(median, 3),
        "threshold": threshold,
        "regressed": regressed,  # slower than the catalog moved
        "improved": improved,
        "worst": max(norm, key=norm.get) if norm else None,
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1]) if "=" in a else threshold
    if not args:
        print(__doc__)
        return 2
    new = load_queries(args[0])
    ref_path = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "bench_reference.json",
    )
    ref = load_queries(ref_path)
    report = delta(new, ref, threshold)
    print(json.dumps(report))
    return 1 if report.get("regressed") else 0


if __name__ == "__main__":
    raise SystemExit(main())
