#!/usr/bin/env python
"""10× scale probe: run the top headline queries at a synthesized ~sf1.

The per-round bench runs at sf0.1; a quadratic cliff (bucket blow-up,
cluster blow-up, accidental all-pairs) can hide at one scale point. This
probe synthesizes sf1-equivalent tables by unioning ``--factor`` copies of
sf0.1 with shifted ids (text perturbed per copy so dedup workloads keep
realistic near-dup structure instead of degenerate 10×-exact duplicates),
writes them once to a scratch dir, and times the same query functions
there. Healthy = each query ≤ ~15× its sf0.1 time (linear + shuffle
overhead); a 100× blow-up means a quadratic escaped its bound.

Usage: python tools/bench_scale_probe.py [--factor 10] [--scratch /tmp/laradb_scale]
Prints one JSON line {"factor": F, "queries": {name: sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

PROBE_QUERIES = [
    "ann_sq8_fast",
    "semantic_dedup_fast",
    "decontaminate_docs",
    "corpus_frequent_ngrams",
    "sensor_covariance_events",
    "dedup_minhash_lsh_fast",
]

# Per-query context the probe JSON carries alongside the timings, so a
# reader of PROBE_r{N}.json sees WHY a ratio looks the way it does without
# cross-referencing DEVNOTES (VERDICT r11 #3).
PROBE_ANNOTATIONS = {
    "knn_label_noise_ivf": (
        "oracle-pinned k=16 — O(N²/16) pair volume by construction (the "
        "DuckDB replay needs a fixed centroid count); the production "
        "route is knn_label_noise_ivf_auto"
    ),
    "knn_label_noise_ivf_auto": (
        "production √N auto-centroids route (n_centroids=None) — "
        "~N^1.5 pair volume; the scale configuration the design ships. "
        "r13: demoted from the headline bench (VERDICT r12 #3 — inline "
        "Lloyd training cost) but kept in the per-round probe list so the "
        "parallelism-absorbed growth ratio stays a recurring artifact"
    ),
    "bm25_maintenance_cycle": (
        "the BM25 stored-index lifecycle (build 2/3 corpus -> staged "
        "append -> compact -> pruned serve) run INLINE so the driver "
        "oracle can replay it — build-time tokenize/count dominates, so "
        "the probe measures index-build linearity, not serving (the "
        "serving-only cost is hybrid_serve/bm25 bucket-pruned probes)"
    ),
    "bm25_prf_serve": (
        "RM3 pseudo-relevance feedback off a stored index, built INLINE "
        "so the driver oracle can replay it (r14) — index build dominates "
        "like bm25_maintenance_cycle; the steady-state serving cost is "
        "the separate bm25_prf_serve_steady probe entry (r15)"
    ),
    "bm25_prf_serve_steady": (
        "RM3 PRF against the PREBUILT index (r15, VERDICT r14 #4): two "
        "bucket-pruned scoring probes + the dbucket-pruned doc_tf "
        "feedback fetch — the true steady-state growth, with the build "
        "outside the timing"
    ),
}

# (table, id columns to shift) — shift keeps keys disjoint across copies.
TABLES = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
ID_OFFSET = 1_000_000_000


def synthesize(spark, factor: int, scratch: str) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(scratch, f"_SYNTH_OK_f{factor}")
    if os.path.exists(marker):
        return
    os.makedirs(scratch, exist_ok=True)
    for t, id_cols in TABLES.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(factor):
            c = base
            for idc in id_cols:
                c = c.withColumn(idc, F.col(idc) + F.lit(i * ID_OFFSET))
            if "text" in c.columns and i > 0:
                # perturb text per copy: keeps shingle/minhash/ngram
                # structure near-dup-ish rather than 10x exact duplicates
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" copy{i}")))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{scratch}/{t}.parquet")
    # remaining tables: symlink-equivalent copy of the originals the
    # queries might touch (sensor covariance only needs events, but the
    # loaders are uniform)
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        dst = f"{scratch}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copytree(f"{SRC}/{t}.parquet", dst) if os.path.isdir(
                f"{SRC}/{t}.parquet"
            ) else shutil.copy(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/laradb_scale_probe")
    ap.add_argument("--queries", default=",".join(PROBE_QUERIES))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from laradb_spark.session import get_spark

    spark = get_spark("laradb-scale-probe")
    synthesize(spark, args.factor, args.scratch)
    qs = entry_mod.queries()
    wanted = set(args.queries.split(","))
    serve_names = {
        "ann_pq_serve", "ann_ivfpq_serve", "ann_ivfpq_res_serve", "hybrid_serve",
        "bm25_prf_serve_steady",
    }
    if serve_names & wanted:
        # stored-index SERVING twins: indexes build once here (outside any
        # timing) at both the warmup SF and the synthesized scale, so the
        # probe measures steady-state search against a 10x corpus — the
        # claim that partition/bucket pruning keeps serving flat-ish
        from bench import _serve_entries

        qs.update(_serve_entries(spark, ["/root/testdata/sf0.001", args.scratch]))

    timings = {}
    for name in args.queries.split(","):
        fn = qs[name]
        # warm once at sf0.001 (codegen/worker spin-up), then time at scale
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        t0 = time.time()
        fn(spark, args.scratch).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    ann = {k: v for k, v in PROBE_ANNOTATIONS.items() if k in timings}
    print(json.dumps({"metric": "scale_probe", "factor": args.factor,
                      "base_sf": 0.1, "queries": timings, "unit": "sec",
                      "annotations": ann}))
    spark.stop()


if __name__ == "__main__":
    main()
