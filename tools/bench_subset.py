#!/usr/bin/env python
"""Bench a SUBSET of headline queries with bench.py's exact methodology
(warm at sf0.001, min-of-3 noop-sink runs at $SPARK_GRAFT_SF_DIR,
clearCache between runs). For fast optimize-measure loops; the recorded
artifact stays bench.py.

Usage: python tools/bench_subset.py name1 name2 ...
       python tools/bench_subset.py --runs 3 name1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from laradb_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("laradb-bench-subset")
    qs = dict(entry_mod.queries())
    serve_names = {
        "ann_pq_serve", "ann_ivfpq_serve", "ann_ivfpq_res_serve",
        "hybrid_serve", "bm25_prf_serve_steady",
    }
    if any(n in serve_names for n in names):
        qs.update(bench._serve_entries(spark, ["/root/testdata/sf0.001", sf_dir]))

    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"{timings[name]:8.3f}  {name}", flush=True)

    print(json.dumps({"queries": timings, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
