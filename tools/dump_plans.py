#!/usr/bin/env python
"""Dump .explain("formatted") for the given queries into plans/r15/
as <query>_<tag>.txt (tag = before/after). Serve twins get their
session-prebuilt indexes exactly like bench.py.

Usage: python tools/dump_plans.py --tag before name1 name2 ...
       python tools/dump_plans.py --tag before --all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default="/root/repo/plans/r15")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench
    from laradb_spark.session import get_spark
    import __spark_entry__ as entry_mod

    names = bench.HEADLINE if args.all else args.names
    spark = get_spark("laradb-dump-plans")
    qs = dict(entry_mod.queries())
    serve_names = {
        "ann_pq_serve", "ann_ivfpq_serve", "ann_ivfpq_res_serve",
        "hybrid_serve", "bm25_prf_serve_steady",
    }
    if any(n in serve_names for n in names):
        qs.update(bench._serve_entries(spark, [args.sf_dir]))

    os.makedirs(args.out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = f"{args.out_dir}/{name}_{args.tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {n_ex} Exchange mentions -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
