"""Optimization-round measurement harness (bench.py is FROZEN for
measurement; this file is for iteration only, per guide §1).

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain PLANDIR] q1 q2 ...

Times each named declared query end-to-end with the noop sink (guide
§1.4), labels jobs (§1.5), and optionally writes `.explain("formatted")`
to PLANDIR/<query>.txt. With no query names, runs the full bench.py
HEADLINE list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

import __spark_entry__ as entrymod
from webscraper_spark.session import get_spark


@F.pandas_udf(T.LongType())
def _warm(x: pd.Series) -> pd.Series:
    return x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain", default=None, help="dir to write formatted plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="webscraper_spark_bench_extra", cores=cpus)
    qs = entrymod.queries()
    names = args.queries or [q for q in __import__("bench").HEADLINE]

    spark.range(1000).select(_warm(F.col("id"))).write.mode("overwrite").format("noop").save()
    entrymod._warc_fixture_files(spark, args.sf)
    entrymod._sitemap_fixture_files(spark, args.sf)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    all_t: dict[str, list[float]] = {}
    for r in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            all_t.setdefault(name, []).append(dt)
            if args.explain and r == 0:
                with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.sparkContext.setJobDescription(None)
            print(f"  {name}: {dt}s", file=sys.stderr, flush=True)
    out = {n: {"min": min(v), "samples": v} for n, v in all_t.items()}
    out["_total_min"] = round(sum(min(v) for v in all_t.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
