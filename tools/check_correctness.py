"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet dir,
compare row count + sorted values. Reports exact-equality (the driver hashes
values) and isclose-equality separately so float-hash risks are visible.

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    res = {"name": name, "rows_spark": len(sdf), "rows_oracle": len(odf)}
    if len(sdf) != len(odf):
        res["status"] = "ROW_MISMATCH"
        return res
    if sorted(sdf.columns) != sorted(odf.columns):
        res["status"] = f"SCHEMA_MISMATCH {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        return res
    s, o = canon(sdf), canon(odf)
    exact = True
    close = True
    bad_col = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.to_numpy(dtype=float)
            oa = ov.to_numpy(dtype=float)
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            cl = np.isclose(sa, oa, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not eq.all():
                exact = False
                if not cl.all():
                    close = False
                    bad_col = bad_col or (c, int((~cl).sum()))
        else:
            sa = sv.to_numpy()
            oa = ov.to_numpy()
            neq = sa != oa
            if neq.any():
                exact = close = False
                bad_col = bad_col or (c, int(neq.sum()))
    res["status"] = "EXACT" if exact else ("CLOSE" if close else "DIFF")
    if bad_col:
        res["bad_col"] = bad_col
    return res


def main(sf_dir: str = "/root/testdata/sf0.001", names: list[str] | None = None):
    import __spark_entry__ as entrymod
    from mpds_spark.session import get_spark

    spark = get_spark(app_name="check_correctness", master="local[8]")
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    results = []
    from mpds_spark.operators.util import release_scratch

    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "status": f"SPARK_ERROR {e}"})
            continue
        finally:
            release_scratch()
        if name not in os_:
            results.append(
                {"name": name, "status": "NO_ORACLE(rows-only)", "rows_spark": len(sdf)}
            )
            continue
        try:
            odf = duck_run(sf_dir, os_[name])
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "status": f"ORACLE_ERROR {e}"})
            continue
        results.append(compare(name, sdf, odf))
    width = max(len(r["name"]) for r in results)
    n_bad = 0
    for r in results:
        # The driver gate hashes exact values: CLOSE is a failure there, so
        # treat it as one here too (still reported separately above).
        ok = r["status"] in ("EXACT", "NO_ORACLE(rows-only)")
        n_bad += not ok
        print(
            f"{r['name']:<{width}}  {r['status']:<12} "
            f"rows={r.get('rows_spark', '?')}/{r.get('rows_oracle', '?')} "
            f"{r.get('bad_col', '')}"
        )
    spark.stop()
    return n_bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, names) else 0)
