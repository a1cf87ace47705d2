"""Iterative graph analytics beyond the reference's D4M tables (degree /
transpose / Gram are in the workloads; connected components in
pipelines.dedup). PageRank here is FIXED-POINT: ranks are integers in
units of 1/SCALE, every step uses integral ``div``, and integer sums are
order-independent — so the result is bit-identical across engines,
partitionings, and reruns (a double-based PageRank's sums differ in the
last ulp by addend order, the hash-flake class of DEVNOTES gotcha #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank unit = 1e-12 of total mass


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count on an undirected edge list — the classic
    Graphulo/GraphBLAS sparse-matrix kernel (L·U masked by A), expressed
    as the two-join Lara ⋈ₓ composition: orient every edge low→high, then
    count paths a<b<c where (a,b),(b,c),(a,c) are all edges. Orienting
    first means each triangle is counted exactly once AND the join fan-out
    of high-degree nodes is split by direction (the standard skew guard
    for this kernel); both joins shuffle on a node key and AQE skew-split
    handles residual hubs. Returns one row: (n_triangles)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    wedge = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), on="b"
    )  # a<b<c paths
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    return (
        wedge.join(closing, on=["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, pr) after ``iters`` synchronous rounds on the directed edge
    list, in integer rank units:

        pr_0       = SCALE div N
        contrib(s) = pr_k(s) div outdeg(s)          (per-source, exact)
        pr_{k+1}   = (100-d)·pr_0 div 100 + d·Σ contrib div 100

    Dangling nodes emit nothing (their mass decays; documented, matches
    the oracle). Scale shape: N comes from a broadcast scalar subquery
    (no driver collect); each round is one shuffle-join on src plus one
    groupBy(dst); ``iters`` is small and fixed so plan growth is bounded
    (no lineage cut needed — contrast the components loop)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ncnt = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = (
        nodes.crossJoin(F.broadcast(ncnt))
        .withColumn("base", F.expr(f"{SCALE} div n"))
        .drop("n")
        .persist()  # reused every round + in the final fill
    )
    pr = base.withColumn("pr", F.col("base"))
    d = int(damping_pct)
    for _ in range(iters):
        contrib = (
            e.join(pr.select(F.col("id").alias("src"), "pr"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div outdeg")).alias("c"))
        )
        pr = (
            base.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .withColumn(
                "pr",
                F.expr(f"({100 - d} * base) div 100")
                + F.expr(f"({d} * coalesce(c, 0L)) div 100"),
            )
            .drop("c")
        )
    return pr.select("id", "pr")
