"""Local stand-in for the driver's correctness gate.

Runs each ``queries()[name]`` on Spark at sf0.01 and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from webscraper_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.astype(str)
        elif np.issubdtype(s.dtype, np.datetime64):
            s = s.astype("datetime64[us]").astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            s = s.map(lambda x: repr(float(x)) if pd.notna(x) else "NaN")
        elif np.issubdtype(s.dtype, np.integer):
            s = s.astype("int64").astype(str)
        else:
            s = s.astype(str)
        out[c] = s
    cf = pd.DataFrame(out)
    return cf.sort_values(list(cf.columns)).reset_index(drop=True)


def main(names: list[str]) -> int:
    spark = get_spark(app_name="oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = {**entrymod.queries(), **entrymod.cert_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.cert_oracle_sql()}
    if not names:
        names = list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = True
        msgs = []
        if len(sdf) != len(odf):
            ok = False
            msgs.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            msgs.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if ok:
            a, b = _canon_frame(sdf), _canon_frame(odf)
            if not a.equals(b):
                ok = False
                neq = (a != b).any(axis=1)
                diff_rows = int(neq.sum())
                msgs.append(f"values differ in {diff_rows}/{len(a)} rows")
                ex = a[neq].head(3)
                exb = b[neq].head(3)
                msgs.append(f"spark sample:\n{ex}\noracle sample:\n{exb}")
        status = "OK   " if ok else "FAIL "
        print(f"{status} {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]"
              + ("" if ok else " :: " + " | ".join(msgs)))
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
