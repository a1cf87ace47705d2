"""CSV scan/store + SQL front door tests — the reference's Raco two-step
netflow plan (reference: opt/QueryOptimizeExecuteTest.kt:92-119,245-296;
fixture FIXTURES.md F4)."""

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from laradb_spark.sources import LaraContext, read_csv, write_csv

NETFLOW_SCHEMA = T.StructType([
    T.StructField("StartTime", T.StringType()),
    T.StructField("Dur", T.DoubleType()),
    T.StructField("Proto", T.StringType()),
    T.StructField("SrcAddr", T.StringType()),
    T.StructField("Sport", T.StringType()),
    T.StructField("Dir", T.StringType()),
    T.StructField("DstAddr", T.StringType()),
    T.StructField("Dport", T.StringType()),
    T.StructField("State", T.StringType()),
    T.StructField("sTos", T.LongType()),
    T.StructField("dTos", T.LongType()),
    T.StructField("TotPkts", T.LongType()),
    T.StructField("TotBytes", T.LongType()),
    T.StructField("SrcBytes", T.LongType()),
    T.StructField("Label", T.StringType()),
])

ROWS = [
    # StartTime,Dur,Proto,SrcAddr,Sport,Dir,DstAddr,Dport,State,sTos,dTos,TotPkts,TotBytes,SrcBytes,Label
    "2011/08/10 09:46:53.047277,3550.182373,udp,212.50.71.179,39678,  <->,147.32.84.229,13363,CON,0,0,12,875,413,flow=Background-UDP",
    "2011/08/10 09:46:53.048843,0.000883,udp,84.13.246.132,28431,  <->,147.32.84.229,13363,CON,0,0,2,135,75,flow=Background-UDP",
    "2011/08/10 09:46:53.049895,0.000326,tcp,217.163.21.35,80,  <?>,147.32.86.194,2063,FA_A,0,0,2,90,45,flow=Background",
    "not,a,valid,row",  # malformed → dropped
]


def _write_sample(tmp_path) -> str:
    p = os.path.join(str(tmp_path), "netflow.csv")
    with open(p, "w") as f:
        f.write("StartTime,Dur,Proto,SrcAddr,Sport,Dir,DstAddr,Dport,State,sTos,dTos,TotPkts,TotBytes,SrcBytes,Label\n")
        f.write("\n".join(ROWS) + "\n")
    return p


def test_netflow_two_step_plan(spark, tmp_path):
    path = _write_sample(tmp_path)
    nf = read_csv(spark, path, NETFLOW_SCHEMA, skip=1)
    # malformed row dropped (DROPMALFORMED). NB: assert on parsed rows —
    # count() prunes all columns, skipping parsing, so nothing is dropped.
    assert len(nf.collect()) == 3

    # Step 1 (reference ingest): all cols + computed RATE = TotBytes/Dur/1000
    # (reference: QueryOptimizeExecuteTest.kt:245-270, Apply with DIVIDE).
    step1 = nf.withColumn("RATE", F.col("TotBytes") / F.col("Dur") / 1000.0)
    stored = os.path.join(str(tmp_path), "netflow_stored")
    step1.write.mode("overwrite").parquet(stored)

    # Step 2: SELECT SrcAddr AS src_ip, DstAddr AS dst_ip, 1.0 AS value
    # WHERE TotBytes > 100 → CSV (reference: QueryOptimizeExecuteTest.kt:271-296,
    # the GT-on-leading-attr Select that becomes a seek range; here Catalyst
    # pushes it to the parquet scan).
    back = spark.read.parquet(stored)
    out = back.filter(F.col("TotBytes") > 100).select(
        F.col("SrcAddr").alias("src_ip"),
        F.col("DstAddr").alias("dst_ip"),
        F.lit(1.0).alias("value"),
    )
    csv_out = os.path.join(str(tmp_path), "netflow_out")
    write_csv(out, csv_out, header=True, single_file=True)

    rt = spark.read.option("header", "true").csv(csv_out)
    got = {(r.src_ip, r.dst_ip) for r in rt.collect()}
    assert got == {("212.50.71.179", "147.32.84.229"), ("84.13.246.132", "147.32.84.229")}

    # filter pushdown reached the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "TotBytes" in plan


def test_skip_multiple_rows(spark, tmp_path):
    p = os.path.join(str(tmp_path), "skip3.csv")
    with open(p, "w") as f:
        f.write("junk line 1\njunk line 2\n1,alpha\n2,beta\n")
    df = read_csv(spark, p, "id LONG, name STRING", skip=2)
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "alpha"), (2, "beta")]


def test_sql_front_door(spark, sf_dir):
    ctx = LaraContext(spark)
    ctx.register_dir(sf_dir, ["region", "nation"])
    df = ctx.sql(
        "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    rows = {r.r_name: r.n for r in df.collect()}
    assert sum(rows.values()) == 25


def test_register_lara_roundtrip(spark):
    from laradb_spark import LaraSchema, LaraTable

    ctx = LaraContext(spark)
    t = LaraTable.from_rows(
        spark, [("a", 1.0), ("b", 2.0)], LaraSchema.of([("k", "STRING")], [("v", "DOUBLE", 0.0)])
    )
    ctx.register_lara("t1", t)
    assert ctx.sql("SELECT sum(v) AS s FROM t1").collect()[0].s == 3.0
    assert ctx.lara("t1").schema.key_names == ["k"]


def test_skip_multiple_rows_struct_schema(spark, tmp_path):
    # Regression: a StructType schema through the skip>1 path must survive
    # the from_csv DDL conversion (stripped 'a:bigint' colon syntax is
    # rejected by DataType.fromDDL) — this is what a Raco FileScan passes.
    import os

    p = os.path.join(str(tmp_path), "skip2_struct.csv")
    with open(p, "w") as f:
        f.write("junk line 1\njunk line 2\n1,alpha\n2,beta\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_csv(spark, p, schema, skip=2)
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "alpha"), (2, "beta")]


def test_jsonl_roundtrip_and_dropmalformed(spark, tmp_path):
    from laradb_spark.sources import read_jsonl, write_jsonl

    p = os.path.join(str(tmp_path), "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha"}\n')
        f.write('this line is not json at all\n')
        f.write('{"id": 2, "name": "beta"}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_jsonl(spark, p, schema)
    # force full-row parse (see csv DROPMALFORMED + count() gotcha)
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "alpha"), (2, "beta")]

    out = os.path.join(str(tmp_path), "out_jsonl")
    write_jsonl(df, out, single_file=True)
    back = read_jsonl(spark, out, schema)
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "alpha"), (2, "beta")]


def test_orc_roundtrip_pushdown_and_partitioning(spark, tmp_path):
    from laradb_spark.sources import read_orc, write_orc

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "grp", "v"]
    )
    path = os.path.join(str(tmp_path), "orc_part")
    write_orc(src, path, partition_by=["grp"])
    back = read_orc(spark, path)
    assert back.count() == 3
    q = back.filter((F.col("grp") == "a") & (F.col("id") > 1)).select("id", "v")
    assert [(r.id, r.v) for r in q.collect()] == [(3, 30.0)]
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning on grp; id predicate pushed to the ORC scan
    assert "PartitionFilters: [" in plan and "grp" in plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters: [")[1].split("]")[0]


def test_delta_iceberg_stubs_raise_actionable_errors(spark, tmp_path):
    from laradb_spark.sources.formats import read_delta, read_iceberg

    with pytest.raises(RuntimeError, match="delta-spark"):
        read_delta(spark, str(tmp_path / "nope"))
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_iceberg(spark, "cat.db.t")


def test_parquet_merge_schema_across_shards(spark, tmp_path):
    """Schema drift across shards (the 100 TB reality: early shards lack
    columns later ones have): mergeSchema reads the union, old shards
    surface NULLs for the new column."""
    p = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(f"{p}/shard=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(f"{p}/shard=2")
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
    # without mergeSchema, Spark picks one file's schema — the drift test
    # documents WHY the option matters, not just that it works
    plain = spark.read.option("recursiveFileLookup", "true").parquet(p)
    assert set(plain.columns) <= {"id", "name", "score"}


def test_sorted_write_enables_rowgroup_pruning(spark, tmp_path):
    """Data layout for scan pruning: writing sorted by the filter key gives
    parquet min/max stats that let a range predicate skip row groups —
    scan output rows ≪ table rows. The same layout decision is what makes
    a 100 TB time-partitioned table cheap to range-scan."""
    p = str(tmp_path / "sorted")
    n = 100_000
    (
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
        )
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.option("parquet.block.size", 64 * 1024)  # many small row groups
        .parquet(p)
    )
    q = spark.read.parquet(p).filter((F.col("k") >= 1000) & (F.col("k") < 2000))
    assert q.count() == 1000
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(k" in pushed and "LessThan(k" in pushed
    # row-group pruning: the scan must emit far fewer rows than the table
    metrics = q._jdf.queryExecution().executedPlan().collectLeaves().apply(0).metrics()
    scan_rows = metrics.get("numOutputRows").get().value()
    assert scan_rows < n // 4, f"scan emitted {scan_rows} rows — no pruning"


def test_compact_parquet_small_files(spark, tmp_path):
    """50 tiny files → a handful at the target size; identical data."""
    from laradb_spark.sources import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartition(50).write.parquet(src)

    stats = compact_parquet(spark, src, dst, target_file_mb=1)
    assert stats["files_before"] == 50
    assert stats["files_after"] < 10
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 10_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_parquet_partitioned(spark, tmp_path):
    from laradb_spark.sources import compact_parquet

    src = str(tmp_path / "frag_part")
    dst = str(tmp_path / "comp_part")
    spark.range(2_000).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    ).repartition(30).write.partitionBy("grp").parquet(src)

    stats = compact_parquet(spark, src, dst, target_file_mb=1, partition_by=["grp"])
    assert stats["files_after"] < stats["files_before"]
    b = spark.read.parquet(dst)
    assert b.count() == 2_000
    assert {r.grp for r in b.select("grp").distinct().collect()} == {0, 1, 2}


def test_compact_parquet_partitioned_splits_large_partition(spark, tmp_path):
    """A skewed partition value must split toward the target file size:
    repartitioning on the partition cols alone would funnel every 'grp=0'
    row into ONE task → one oversized file regardless of target. The salt
    spreads each partition value over ≈ n_files/n_combos writers."""
    import glob

    from laradb_spark.sources import compact_parquet

    src = str(tmp_path / "frag_skew")
    dst = str(tmp_path / "comp_skew")
    # one dominant partition value, long random-ish payload to defeat RLE
    spark.range(60_000).select(
        F.col("id"),
        F.lit(0).alias("grp"),
        F.sha2(F.col("id").cast("string"), 256).alias("pay"),
    ).repartition(40).write.partitionBy("grp").parquet(src)

    # tiny target → n_files ≫ 1 for the single combo; without salting the
    # grp=0 directory would hold exactly one file
    compact_parquet(spark, src, dst, target_file_mb=1, partition_by=["grp"])
    files = [
        f for f in glob.glob(f"{dst}/grp=0/*")
        if not f.rsplit("/", 1)[-1].startswith(("_", "."))
    ]
    assert len(files) > 1, "large partition value was not split across files"
    b = spark.read.parquet(dst)
    assert b.count() == 60_000

    # deterministic salt path: same split behavior, but the shuffle key is
    # a hash of a stable row identity (retry-safe, SPARK-38388 caveat)
    dst2 = str(tmp_path / "comp_skew_det")
    compact_parquet(
        spark, src, dst2, target_file_mb=1, partition_by=["grp"], salt_col="id"
    )
    files2 = [
        f for f in glob.glob(f"{dst2}/grp=0/*")
        if not f.rsplit("/", 1)[-1].startswith(("_", "."))
    ]
    assert len(files2) > 1
    d = spark.read.parquet(dst2)
    assert d.count() == 60_000 and "id" in d.columns


def test_zorder_interleave_matches_python(spark):
    from laradb_spark.sources.layout import _interleave_bits

    def morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(a, b) for a in (0, 1, 5, 1000, 65535) for b in (0, 3, 777, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", _interleave_bits(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == morton(a, b), (a, b)


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """A Z-ordered layout must make a selective filter on EITHER dimension
    touch a minority of files — the whole point vs a single-column sort
    (which prunes one dimension and scatters the other)."""
    import collections

    from laradb_spark.sources.layout import write_zordered

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % 100_000).alias("x"),
        (F.col("id") * 16807 % 100_000).alias("y"),
    )
    path = str(tmp_path / "zorder")
    write_zordered(df, path, "x", "y", n_files=16)

    back = spark.read.parquet(path)
    total_files = back.select(F.input_file_name()).distinct().count()
    assert total_files >= 8

    def files_touched(cond):
        return (
            back.filter(cond).select(F.input_file_name()).distinct().count()
        )

    fx = files_touched(F.col("x") < 10_000)   # 10% slice of x
    fy = files_touched(F.col("y") < 10_000)   # 10% slice of y
    # either-dimension slice touches at most ~2/3 of the files; a plain
    # x-sort would make the y-slice touch ALL of them
    assert fx <= total_files * 2 // 3, (fx, total_files)
    assert fy <= total_files * 2 // 3, (fy, total_files)
    # data intact
    assert back.count() == n
