"""Local stand-in for the driver's correctness gate.

Runs every REGISTRY query on Spark and its DuckDB oracle on the same
parquet, then compares: row count, column-name set, and values after
sorting columns by name and rows lexicographically. Exact match is the
goal (the driver hashes values); float mismatches are reported with
max-abs-delta so rounding discipline can be fixed per query.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays → tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, str), na_action="ignore").any():
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0 else v,
                    na_action="ignore",
                )
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            eq = (sv.astype(str) == dv.astype(str)).all()
        except Exception:
            eq = False
        if eq:
            continue
        try:
            sn = pd.to_numeric(sv, errors="raise")
            dn = pd.to_numeric(dv, errors="raise")
            both_nan = sn.isna() & dn.isna()
            delta = (sn - dn).abs()
            delta = delta.mask(both_nan, 0).fillna(math.inf)
            mx = float(delta.max())
            if mx == 0:
                continue
            problems.append(f"col {c}: max_abs_delta={mx:.3e}")
        except Exception:
            mism = (sv.astype(str) != dv.astype(str))
            i = int(mism.idxmax())
            problems.append(f"col {c}: value mismatch e.g. row {i}: {sv[i]!r} vs {dv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.session import session

    spark = session(app_name="verify_local")
    con = duck_connection(sf_dir)

    passed, rows_only, failed = [], [], []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.builder(spark, sf_dir)
            spdf = sdf.toPandas()
            if q.oracle is None:
                assert len(spdf) >= 0
                rows_only.append(name)
                print(f"ROWS-ONLY {name}: {len(spdf)} rows")
                continue
            dpdf = con.execute(q.oracle).df()
            problems = compare(name, spdf, dpdf)
            if problems:
                failed.append(name)
                print(f"FAIL {name}: " + "; ".join(problems))
            else:
                passed.append(name)
                print(f"PASS {name} ({len(spdf)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            if "--trace" in sys.argv:
                traceback.print_exc()
    print(f"\n== {len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} failed ==")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
