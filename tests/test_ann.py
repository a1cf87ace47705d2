"""ANN scale paths: multi-probe LSH beats single-probe recall; IVF-flat
retrieval quality on clustered data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from laradb_spark.pipelines import similarity as sim


@pytest.fixture(scope="module")
def clustered(spark):
    # 5 gaussian clusters in 8-d: realistic retrieval structure (unlike the
    # uniform fixture, where LSH recall is inherently poor).
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 8)) * 4
    rows = []
    for i in range(200):
        c = i % 5
        rows.append((i, [float(x) for x in centers[c] + rng.normal(size=8) * 0.5]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(df):
    return df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_multiprobe_recall_improves(spark, clustered):
    q = _queries(clustered)
    exact = _pairs(sim.brute_force_topk(clustered, q, k=5))
    single = _pairs(sim.lsh_topk(clustered, q, dim=8, k=5, planes=6))
    multi = _pairs(sim.lsh_topk_multiprobe(clustered, q, dim=8, k=5, planes=6, probes=4))
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= len(exact) // 2  # decent recall on clustered data


def test_ivf_topk_recall(spark, clustered):
    q = _queries(clustered)
    exact = _pairs(sim.brute_force_topk(clustered, q, k=5))
    ivf = _pairs(sim.ivf_topk(clustered, q, n_centroids=8, n_probe=3, k=5))
    assert len(ivf) == len(exact) == 25
    assert len(ivf & exact) / len(exact) >= 0.6  # probing 3/8 lists on 5 clusters


def test_ivf_deterministic(spark, clustered):
    q = _queries(clustered)
    a = sorted(_pairs(sim.ivf_topk(clustered, q, n_centroids=8, n_probe=2, k=3)))
    b = sorted(_pairs(sim.ivf_topk(clustered, q, n_centroids=8, n_probe=2, k=3)))
    assert a == b  # no RNG anywhere — reruns identical
