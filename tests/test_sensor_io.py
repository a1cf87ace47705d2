"""Raw sensor-file ingestion (reference: sensor/SensorFileAction.kt:163-190)
against a reference-shaped fixture, plus the full file→covariance path vs
the NumPy oracle."""

import os
from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from laradb_spark.sources import read_sensor_csv, sensor_covariance_from_files


def _ms(s: str) -> int:
    return int(
        datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc).timestamp() * 1000
    )


FIXTURE = [
    # date;node;class;family;value;unit (reference sample data shape)
    "2017-02-06 11:27:44.976000;coresense:3;TSYS01;temperature;8.22;NO_UNIT",
    "2017-02-06 11:27:45;coresense:3;TMP112;temperature;7.99;NO_UNIT",
    "2017-02-06 11:27:46.500000;coresense:4;HTU21D;humidity;27.48;NO_UNIT",
    "2017-02-06 11:27:47.000000;coresense:3;Chemsense ID;mac_address;5410ec38d162;NO_UNIT",  # skipped
    "short;line",  # <6 fields → skipped
    "2017-02-06 11:27:48.250000;coresense:4;SPV1840LR5H-B;intensity;notanumber;NO_UNIT",  # bad value → skipped
]


def _write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_read_sensor_csv_reference_rules(spark, tmp_path):
    p = _write(tmp_path, "aot.txt", FIXTURE)
    got = {(r.t, r.c): r.v for r in read_sensor_csv(spark, p).collect()}
    base = _ms("2017-02-06 11:27:44")
    assert got == {
        (base + 976, "TSYS01;temperature"): 8.22,
        (base + 1000, "TMP112;temperature"): 7.99,
        (base + 2500, "HTU21D;humidity"): 27.48,
    }


def test_read_sensor_csv_legacy_fraction(spark, tmp_path):
    # the reference's lenient SimpleDateFormat reads '.976000' as 976000 ms
    # (SensorFileAction.kt:17,176-177); legacy mode replicates that.
    p = _write(tmp_path, "aot.txt", FIXTURE[:1])
    r = read_sensor_csv(spark, p, legacy_fraction_ms=True).collect()[0]
    assert r.t == _ms("2017-02-06 11:27:44") + 976_000


def test_sensor_covariance_from_files_vs_numpy(spark, tmp_path):
    # Two files with the SAME classes on four aligned 1-minute bins
    # (X = meanA − meanB joins on matching (t', c)); timestamps sit exactly
    # on bin starts so round-to-nearest binning keeps them put.
    rng = np.random.default_rng(7)
    classes = ["c1;f", "c2;f", "c3;f"]
    bins = ["2017-02-06 11:%02d:00" % m for m in (10, 11, 12, 13)]
    lines_a, lines_b, series_a, series_b = [], [], {}, {}
    for cls in classes:
        series_a[cls] = np.round(rng.uniform(1, 9, len(bins)), 2)
        series_b[cls] = np.round(rng.uniform(1, 9, len(bins)), 2)
        name, fam = cls.split(";")
        for ts, va, vb in zip(bins, series_a[cls], series_b[cls]):
            lines_a.append(f"{ts}.000000;node:1;{name};{fam};{va};NO_UNIT")
            lines_b.append(f"{ts}.000000;node:2;{name};{fam};{vb};NO_UNIT")
    pa = _write(tmp_path, "a.txt", lines_a)
    pb = _write(tmp_path, "b.txt", lines_b)

    out = sensor_covariance_from_files(spark, pa, pb, bin_ms=60_000, upper_triangle=False)
    got = {(r.c1, r.c2): r.cov for r in out.collect()}

    # NumPy oracle: X = A − B (bins × classes), mean-centered, C = UᵀU/(n−1)
    X = np.stack([series_a[c] - series_b[c] for c in classes], axis=1)
    U = X - X.mean(axis=0)
    C = U.T @ U / (len(bins) - 1)
    assert len(got) == len(classes) ** 2
    for i, ci in enumerate(classes):
        for j, cj in enumerate(classes):
            assert got[(ci, cj)] == pytest.approx(C[i, j], rel=1e-9), (ci, cj)
