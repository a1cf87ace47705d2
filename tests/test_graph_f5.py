"""F5 graph fixture (FIXTURES.md): power-law adjacency with duplicate
edges — sum-on-ingest (reference: util/D4MTableWriter.kt:26-55 combines
duplicates with a summing combiner), degree table, transpose, and sparse
A·Aᵀ via the Lara join+agg (TableMult), all vs a NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from laradb_spark import LaraSchema, LaraTable

N_VERTS = 120
N_EDGES = 1500


@pytest.fixture(scope="module")
def edges_raw(spark):
    rng = np.random.default_rng(5)
    # power-law-ish: preferential attachment by zipf over vertex ids
    src = np.minimum(rng.zipf(1.6, N_EDGES) % N_VERTS, N_VERTS - 1)
    dst = np.minimum(rng.zipf(1.6, N_EDGES) % N_VERTS, N_VERTS - 1)
    rows = [(f"v{int(s)}", f"v{int(d)}", 1) for s, d in zip(src, dst)]
    schema = LaraSchema.of(
        [("src", "STRING"), ("dst", "STRING")], [("cnt", "LONG", 0)]
    )
    df = spark.createDataFrame(rows, schema.to_struct())
    return df, rows, schema


def _adj(rows):
    a = {}
    for s, d, c in rows:
        a[(s, d)] = a.get((s, d), 0) + c
    return a


def test_ingest_sums_duplicates(spark, edges_raw):
    df, rows, schema = edges_raw
    # sum-on-ingest: duplicates collapse via the sum monoid (MergeAgg over
    # full key set — identity op on keys, ⊕ on the duplicate multi-values)
    t = LaraTable(df, schema, check=False)
    ingested = LaraTable(
        df.groupBy("src", "dst").agg(F.sum("cnt").alias("cnt")), schema
    )
    want = _adj(rows)
    got = {(r[0], r[1]): r[2] for r in ingested.collect_sorted()}
    assert got == want
    assert len(got) < len(rows)  # duplicates existed and collapsed


def test_degree_and_transpose(spark, edges_raw):
    df, rows, schema = edges_raw
    adj = _adj(rows)
    ingested = LaraTable(
        df.groupBy("src", "dst").agg(F.sum("cnt").alias("cnt")), schema
    )
    # out-degree = agg over dst (reference materializes degree tables)
    deg = ingested.agg(["src"], {"cnt": "sum_long"})
    want_deg = {}
    for (s, _d), c in adj.items():
        want_deg[s] = want_deg.get(s, 0) + c
    assert {r[0]: r[1] for r in deg.collect_sorted()} == want_deg
    # transpose = rename/swap (reference writes an explicit -T table)
    tr = ingested.rename({"src": "dst", "dst": "src"}).sort(["src", "dst"])
    assert {(r[0], r[1]): r[2] for r in tr.collect_sorted()} == {
        (d, s): c for (s, d), c in adj.items()
    }


def test_sparse_gram_vs_numpy(spark, edges_raw):
    df, rows, schema = edges_raw
    adj = _adj(rows)
    ingested = df.groupBy("src", "dst").agg(F.sum("cnt").alias("cnt"))
    # G = A·Aᵀ over the shared dst dimension: Lara join on key prefix dst
    # (after Sort) + agg — the TableMult pattern.
    a = LaraTable(
        ingested.select(F.col("dst"), F.col("src").alias("r1"),
                        F.col("cnt").cast("double").alias("v")),
        LaraSchema.of([("dst", "STRING"), ("r1", "STRING")], [("v", "DOUBLE", 0.0)]),
    )
    b = LaraTable(
        ingested.select(F.col("dst"), F.col("src").alias("r2"),
                        F.col("cnt").cast("double").alias("v")),
        LaraSchema.of([("dst", "STRING"), ("r2", "STRING")], [("v", "DOUBLE", 0.0)]),
    )
    g = a.join(b, {"v": "multiply"}).agg(["r1", "r2"], {"v": "sum"})
    got = {(r[0], r[1]): r[2] for r in g.collect_sorted()}

    # NumPy oracle
    verts = sorted({v for e in adj for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for (s, d), c in adj.items():
        A[idx[s], idx[d]] = c
    G = A @ A.T
    want = {
        (verts[i], verts[j]): G[i, j]
        for i in range(len(verts))
        for j in range(len(verts))
        if G[i, j] != 0
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


# --- file-based ingest (reference: util/TripleFileWriter.kt:21-45) ----------

@pytest.fixture(scope="module")
def triple_files(tmp_path_factory, edges_raw):
    """The F5 edge set written in the reference's component-file format:
    one comma-delimited token stream per file (10Ar.txt/10Ac.txt shape)."""
    import os

    _df, rows, _schema = edges_raw
    d = tmp_path_factory.mktemp("triples")
    pr, pc = os.path.join(str(d), "Ar.txt"), os.path.join(str(d), "Ac.txt")
    with open(pr, "w") as f:
        f.write(",".join(s for s, _d2, _c in rows))
    with open(pc, "w") as f:
        f.write(",".join(d2 for _s, d2, _c in rows))
    return pr, pc


def test_file_ingest_edges_match_inmemory(spark, edges_raw, triple_files):
    from laradb_spark.sources import ingest_graph_files

    _df, rows, _schema = edges_raw
    tables = ingest_graph_files(spark, *triple_files)
    want = _adj(rows)
    got = {(r.row, r.col): r.v for r in tables["edge"].collect()}
    assert got == {k: float(v) for k, v in want.items()}
    # transpose mirrors the dup-summed adjacency
    got_t = {(r.row, r.col): r.v for r in tables["edge_t"].collect()}
    assert got_t == {(d, s): float(c) for (s, d), c in want.items()}


def test_file_ingest_degree_counts_triples(spark, edges_raw, triple_files):
    # degree counts one +1 per ingested triple (multi-edges counted) —
    # D4MTableWriter degreeUseValue=false default.
    from laradb_spark.sources import ingest_graph_files

    _df, rows, _schema = edges_raw
    deg = ingest_graph_files(spark, *triple_files)["degree"]
    want_out, want_in = {}, {}
    for s, d, _c in rows:
        want_out[s] = want_out.get(s, 0) + 1
        want_in[d] = want_in.get(d, 0) + 1
    got = {r.node: (r.out_deg, r.in_deg) for r in deg.collect()}
    assert got == {
        n: (want_out.get(n, 0), want_in.get(n, 0))
        for n in set(want_out) | set(want_in)
    }


def test_file_ingest_with_value_file(spark, tmp_path):
    import os

    from laradb_spark.sources import ingest_graph_files

    pr = os.path.join(str(tmp_path), "r.txt")
    pc = os.path.join(str(tmp_path), "c.txt")
    pv = os.path.join(str(tmp_path), "v.txt")
    with open(pr, "w") as f:
        f.write("a,a,b")
    with open(pc, "w") as f:
        f.write("x,x,y")
    with open(pv, "w") as f:
        f.write("2,3,5")
    edge = ingest_graph_files(spark, pr, pc, pv)["edge"]
    assert {(r.row, r.col): r.v for r in edge.collect()} == {("a", "x"): 5.0, ("b", "y"): 5.0}


def test_pagerank_fixed_point_matches_reference_loop(spark):
    """Bit-exact vs a sequential integer reference on a hand graph
    (includes a dangling node d and a two-node cycle)."""
    from laradb_spark.operators.graph import SCALE, pagerank_fixed_point

    E = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d")]
    edges = spark.createDataFrame(E, ["src", "dst"])
    got = {r.id: r.pr for r in pagerank_fixed_point(edges, iters=3).collect()}

    nodes = sorted({x for e in E for x in e})
    outdeg = {}
    for s, _ in E:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = SCALE // len(nodes)
    pr = {v: base for v in nodes}
    for _ in range(3):
        contrib = {}
        for s, t in E:
            contrib[t] = contrib.get(t, 0) + pr[s] // outdeg[s]
        pr = {v: (15 * base) // 100 + (85 * contrib.get(v, 0)) // 100 for v in nodes}
    assert got == pr
