"""Sensor covariance pipeline vs a NumPy oracle (reference flagship:
sensor/SensorCalc.kt:119-143; fixture shape FIXTURES.md F3)."""

import numpy as np
import pytest

from laradb_spark.sensor import (
    bin_to_nearest,
    binned_mean,
    covariance,
    diff_x,
    mean_center,
    sensor_covariance_pipeline,
)

from pyspark.sql import functions as F

BIN = 120_000
CLASSES = ["TSYS01;temperature", "HTU21D;humidity", "BMP180;pressure"]


def _gen(seed, n=4000):
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_486_380_000_000
    for i in range(n):
        t = t0 + int(rng.integers(0, 86_400_000))
        c = CLASSES[int(rng.integers(0, len(CLASSES)))]
        v = float(rng.normal(20.0 + 5 * CLASSES.index(c), 3.0))
        rows.append((t, c, v))
    return rows


@pytest.fixture(scope="module")
def tables(spark):
    schema = "t long, c string, v double"
    a = spark.createDataFrame(_gen(1), schema)
    b = spark.createDataFrame(_gen(2), schema)
    return a, b


def test_bin_rounding_rule(spark):
    # round-to-NEAREST bin (reference: SensorCalc.kt:386-393)
    df = spark.createDataFrame([(0,), (59_999,), (60_000,), (119_999,), (120_000,)], "t long")
    got = [r.tp for r in df.select(bin_to_nearest(F.col("t"), BIN)).collect()]
    assert got == [0, 0, 120_000, 120_000, 120_000]


def _oracle(a_rows, b_rows):
    """NumPy oracle: bin→mean per table, diff, mean-center, cov/(N-1)."""
    def binned(rows):
        acc = {}
        for t, c, v in rows:
            tp = t - t % BIN + (BIN if t % BIN >= BIN // 2 else 0)
            acc.setdefault((tp, c), []).append(v)
        return {k: float(np.mean(vs)) for k, vs in acc.items()}

    ma, mb = binned(a_rows), binned(b_rows)
    x = {k: ma[k] - mb[k] for k in ma.keys() & mb.keys()}
    ts = sorted({tp for tp, _ in x})
    cs = sorted({c for _, c in x})
    n = len(ts)
    cmean = {c: float(np.mean([v for (tp, cc), v in x.items() if cc == c])) for c in cs}
    u = {k: v - cmean[k[1]] for k, v in x.items()}
    cov = {}
    for c1 in cs:
        for c2 in cs:
            if c1 > c2:
                continue
            s = 0.0
            hit = False
            for tp in ts:
                if (tp, c1) in u and (tp, c2) in u:
                    s += u[(tp, c1)] * u[(tp, c2)]
                    hit = True
            # Sparse semantics: TableMult emits a (c1,c2) entry only when the
            # classes co-occur in ≥1 bin (reference: SensorCalc.kt:678-741).
            if hit:
                cov[(c1, c2)] = s / (n - 1)
    return cov


def test_covariance_pipeline_vs_numpy(spark, tables):
    a, b = tables
    got = {
        (r.c1, r.c2): r.cov
        for r in sensor_covariance_pipeline(a, b, BIN).collect()
    }
    want = _oracle([tuple(r) for r in a.collect()], [tuple(r) for r in b.collect()])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_stage_outputs_nonempty(spark, tables):
    a, b = tables
    x = diff_x(binned_mean(a, BIN), binned_mean(b, BIN))
    assert x.count() > 0
    u = mean_center(x)
    # mean-centered: per-class mean ~ 0
    mu = u.groupBy("c").agg(F.avg("v").alias("m")).collect()
    for r in mu:
        assert abs(r.m) < 1e-9
    c = covariance(u)
    # upper triangle only
    assert all(r.c1 <= r.c2 for r in c.collect())


def test_time_filter_prunes(spark, tables):
    a, b = tables
    out = sensor_covariance_pipeline(a, b, BIN, t_min=1_486_380_000_000 + 43_200_000)
    assert out.count() >= 0  # runs; filter reaches the scan (see explain)
