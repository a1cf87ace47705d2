#!/usr/bin/env python
"""Reference-fidelity benchmark: the sensor covariance pipeline timed per
stage (X/U/C), mirroring the reference's SensorCalcTimes CSV row
``opts,toX,toU,toC,total`` (reference: sensor/SensorCalc.kt:119-143;
driver sweep sensor/SensorCalcDriver.kt:54-70).

Data: synthetic two-table (t,c,v) fixture generated deterministically at a
size scaled by --rows (default ~the reference's month of AoT data shape:
~50 classes, 25 s cadence). Stages are materialized with the noop sink so
each timing covers exactly one stage's computation (X is persisted, as the
reference materializes it into a temp table).

Usage: python tools/bench_sensor.py [--rows 2000000] [--classes 50]
Emits one JSON line: {"metric": "sensor_covariance_stages", ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--classes", type=int, default=50)
    ap.add_argument("--bin-ms", type=int, default=120_000)
    ap.add_argument(
        "--from-files",
        action="store_true",
        help="write the synthetic tables as reference-format sensor CSVs "
        "first and time the ingest stage too (the reference driver's "
        "end-to-end shape: SensorFileAction parse → X → U → C)",
    )
    # Per-flag optimization toggles mirroring the reference sweep
    # (sensor/SensorCalcDriver.kt:54-70; flags SensorCalc.kt:80-103):
    # R = reuse/materialize X, S = SymmetricCovariance upper triangle,
    # Z = Multiply zero-discard. The other reference flags (A/D/E/F/M/P)
    # are Catalyst built-ins here (SURVEY §4) — nothing to toggle.
    ap.add_argument("--no-persist", action="store_true",
                    help="R off: recompute X for U and C instead of persisting")
    ap.add_argument("--no-triangle", action="store_true",
                    help="S off: emit the full c1×c2 matrix, not upper triangle")
    ap.add_argument("--no-zero-discard", action="store_true", default=True,
                    help="Z off (default: Z is off — exact-zero U entries are "
                    "vanishingly rare in float data)")
    ap.add_argument("--zero-discard", dest="no_zero_discard",
                    action="store_false", help="Z on")
    ap.add_argument("--sweep", action="store_true",
                    help="run all 8 R/S/Z combos, emit one reference-style "
                    "CSV row 'opts,toX,toU,toC,total' per combo "
                    "(SensorCalc.kt:121-130 SensorCalcTimes shape)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from laradb_spark.sensor import binned_mean, covariance, diff_x, mean_center
    from laradb_spark.session import get_spark

    spark = get_spark("bench-sensor")

    # Deterministic synthetic (t, c, v): irregular ~25 s cadence over 31
    # days (the reference's benchmark window), gaussian-ish v per class.
    t0 = 1_484_000_000_000
    span = 31 * 86_400_000

    def gen(seed: int):
        base = spark.range(args.rows).select(
            (t0 + (F.hash(F.col("id") + seed) % span + span) % span).alias("t"),
            F.concat(F.lit("class_"), (F.pmod(F.hash(F.col("id") * 31 + seed), args.classes)).cast("string")).alias("c"),
            (F.pmod(F.hash(F.col("id") * 7 + seed), 10_000) / 100.0).alias("v"),
        )
        return base

    a, b = gen(1), gen(2)

    ingest_time = None
    if args.from_files:
        import shutil
        import tempfile

        from laradb_spark.sources import read_sensor_csv

        tmp = tempfile.mkdtemp(prefix="bench_sensor_")
        try:
            # reference line shape: date;node;class;family;value;unit —
            # class_N splits into (class_N, f) so c round-trips as
            # "class;family" per SensorFileAction.kt:179
            def dump(df, name):
                line = F.concat_ws(
                    ";",
                    F.date_format(F.timestamp_millis(F.col("t")), "yyyy-MM-dd HH:mm:ss"),
                    F.lit("node:0"),
                    F.col("c"),
                    F.lit("f"),
                    F.col("v").cast("string"),
                    F.lit("NO_UNIT"),
                )
                df.select(line.alias("value")).write.mode("overwrite").text(f"{tmp}/{name}")

            dump(a, "a")
            dump(b, "b")
            t = time.time()
            a = read_sensor_csv(spark, f"{tmp}/a").select(
                "t", F.substring_index("c", ";", 1).alias("c"), "v"
            ).persist()
            b = read_sensor_csv(spark, f"{tmp}/b").select(
                "t", F.substring_index("c", ";", 1).alias("c"), "v"
            ).persist()
            a.write.format("noop").mode("overwrite").save()
            b.write.format("noop").mode("overwrite").save()
            ingest_time = round(time.time() - t, 3)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm (codegen + shuffle machinery)
    force(binned_mean(gen(3).limit(10_000), args.bin_ms))

    def run_stages(persist_r: bool, triangle_s: bool, zdiscard_z: bool) -> dict:
        times = {}
        t = time.time()
        x = diff_x(binned_mean(a, args.bin_ms), binned_mean(b, args.bin_ms))
        if persist_r:
            x = x.persist()
        force(x)
        times["toX"] = round(time.time() - t, 3)

        t = time.time()
        u = mean_center(x)
        if persist_r:
            u = u.persist()
        force(u)
        times["toU"] = round(time.time() - t, 3)

        t = time.time()
        c = covariance(u, upper_triangle=triangle_s, zero_discard=zdiscard_z)
        force(c)
        times["toC"] = round(time.time() - t, 3)
        if persist_r:
            x.unpersist()
            u.unpersist()
        times["total"] = round(sum(times.values()), 3)
        return times

    if args.sweep:
        # Reference SensorCalcTimes CSV shape: opts,toX,toU,toC,total —
        # opts spells the enabled flag letters (R/S/Z), '-' when none.
        print("opts,toX,toU,toC,total")
        for r_flag in (True, False):
            for s_flag in (True, False):
                for z_flag in (True, False):
                    st = run_stages(r_flag, s_flag, z_flag)
                    opts = "".join(
                        f for f, on in (("R", r_flag), ("S", s_flag), ("Z", z_flag)) if on
                    ) or "-"
                    print(f"{opts},{st['toX']},{st['toU']},{st['toC']},{st['total']}")
        spark.stop()
        return

    times = run_stages(
        not args.no_persist, not args.no_triangle, not args.no_zero_discard
    )
    if ingest_time is not None:
        times["ingest"] = ingest_time
        times["total"] = round(times["total"] + ingest_time, 3)
    if args.from_files:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # all stages forced above
    opts = "".join(
        f for f, off in (("R", args.no_persist), ("S", args.no_triangle),
                         ("Z", args.no_zero_discard)) if not off
    ) or "-"
    print(json.dumps({
        "metric": "sensor_covariance_stages",
        "value": times["total"],
        "unit": "sec",
        "queries": times,
        "opts": opts,
        "rows_per_table": args.rows,
        "classes": args.classes,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
