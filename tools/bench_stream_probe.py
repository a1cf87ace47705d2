#!/usr/bin/env python
"""Streaming-ingest scale probe: per-batch latency of the foreachBatch
ingest loops as the STORED INDEX accumulates shards.

The batch operators have 30× probes (DEVNOTES); the ingest loops'
suspected super-linear term is different — each micro-batch re-reads the
parquet index, whose part-file count grows by one (or more) per batch, so
a month-long ingest could degrade via file-listing + many-small-files
scan cost even though per-batch data is constant.

Method: feed N identical-size batches of the sf0.01 documents (ids
shifted per batch so content is novel and the index genuinely grows),
running ONE availableNow drain per batch so each batch's wall time is
measurable (constant ~stream-startup overhead included in every sample —
the DELTA across batches is the signal). Healthy = flat-ish latency;
a steady per-batch climb is the many-small-files term.

Usage: python tools/bench_stream_probe.py [--batches 8] [--loop line|curate|url|all]
Prints one JSON line per loop: {"loop": ..., "batch_sec": [...], "index_files": N}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.01"
SCRATCH = "/tmp/laradb_stream_probe"


def _batches(spark, n):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    for k in range(n):
        yield docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            "source",
            # perturb text per batch so digests/lines are genuinely novel
            F.concat(F.col("text"), F.lit(f" batchmark{k}")).alias("text"),
        )


def probe_line(spark, n):
    from pyspark.sql import types as T

    from laradb_spark.streaming.dedup import line_ingest_stream

    root = f"{SCRATCH}/line"
    shutil.rmtree(root, ignore_errors=True)
    src, idx, out, ck = (f"{root}/{d}" for d in ("in", "idx", "out", "ck"))
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    times = []
    for k, b in enumerate(_batches(spark, n)):
        b.select("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mtimes so maxFilesPerTrigger ordering is stable
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.time()
        q = line_ingest_stream(stream, idx, out, ck, max_occurrences=2)
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
    return times, len(glob.glob(f"{idx}/*.parquet"))


def probe_curate(spark, n):
    from pyspark.sql import functions as F

    from laradb_spark.pipelines.curation import train_quality_weights
    from laradb_spark.streaming.ingest import curate_ingest_stream

    root = f"{SCRATCH}/curate"
    shutil.rmtree(root, ignore_errors=True)
    src, idx, out, st, ck = (f"{root}/{d}" for d in ("in", "idx", "out", "stats", "ck"))
    os.makedirs(src)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    weights = train_quality_weights(
        docs.filter(F.col("source").isin("src0", "src1")),
        docs.filter(~F.col("source").isin("src0", "src1")),
    )
    schema = docs.select("doc_id", "source", "text").schema
    times = []
    for k, b in enumerate(_batches(spark, n)):
        b.select("doc_id", "source", "text").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.time()
        q = curate_ingest_stream(stream, weights, idx, out, st, ck)
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
    return times, len(glob.glob(f"{idx}/*.parquet"))


def probe_url(spark, n):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from laradb_spark.streaming.ingest import url_ingest_stream

    root = f"{SCRATCH}/url"
    shutil.rmtree(root, ignore_errors=True)
    src, idx, out, ck = (f"{root}/{d}" for d in ("in", "idx", "out", "ck"))
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("url", T.StringType())]
    )
    times = []
    for k, b in enumerate(_batches(spark, n)):
        urls = b.select(
            "doc_id",
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
        urls.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.time()
        q = url_ingest_stream(stream, idx, out, ck, blocked_domains=["spam.net"])
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
    return times, len(glob.glob(f"{idx}/*.parquet"))


def probe_shard(spark, n):
    from pyspark.sql import types as T

    from laradb_spark.streaming.ingest import shard_ingest_stream

    root = f"{SCRATCH}/shard"
    shutil.rmtree(root, ignore_errors=True)
    src, shards, st, ck = (f"{root}/{d}" for d in ("in", "shards", "state", "ck"))
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("e", "r"), ("t", "h")]
    times = []
    for k, b in enumerate(_batches(spark, n)):
        b.select("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.time()
        q = shard_ingest_stream(stream, merges, shards, st, ck, context_len=512)
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
    return times, len(glob.glob(f"{shards}/batch=*/*.parquet"))


def probe_fuzzy(spark, n):
    from pyspark.sql import types as T

    from laradb_spark.streaming.dedup import fuzzy_ingest_stream

    root = f"{SCRATCH}/fuzzy"
    shutil.rmtree(root, ignore_errors=True)
    src, idx, out, ck = (f"{root}/{d}" for d in ("in", "idx", "out", "ck"))
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    times = []
    for k, b in enumerate(_batches(spark, n)):
        b.select("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.time()
        q = fuzzy_ingest_stream(stream, idx, out, ck)
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
    return times, len(glob.glob(f"{idx}/sigs/*.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--loop",
        default="all",
        choices=["line", "curate", "url", "shard", "fuzzy", "all"],
    )
    args = ap.parse_args()

    from laradb_spark.session import get_spark

    spark = get_spark("stream-probe")
    probes = {
        "line": probe_line,
        "curate": probe_curate,
        "url": probe_url,
        "shard": probe_shard,
        "fuzzy": probe_fuzzy,
    }
    for name, fn in probes.items():
        if args.loop not in ("all", name):
            continue
        times, nfiles = fn(spark, args.batches)
        print(json.dumps({"loop": name, "batch_sec": times, "index_files": nfiles}))


if __name__ == "__main__":
    main()
