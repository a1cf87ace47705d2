#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits — tolerant of last-ulp engine differences,
        # strict enough to catch real errors.
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def check_approx_stats(con, scols: list[str], srows: list[tuple]) -> list[str]:
    """approx_stats is now oracle-certified by hash (the query emits exact
    counts plus in-plan bound booleans; the oracle states the expected
    TRUEs as literals). This bound check stays as defense in depth: a
    FALSE boolean should fail with a message that names the sketch, not
    just an anonymous hash mismatch, and the exact count is re-derived
    independently so a bug that breaks BOTH the in-plan exact and the
    boolean the same way still gets caught."""
    row = dict(zip(scols, srows[0]))
    (exact_n,) = con.sql("SELECT COUNT(DISTINCT l_orderkey) FROM lineitem").fetchall()[0]
    errs = []
    if row["exact_orders"] != exact_n:
        errs.append(f"exact_orders={row['exact_orders']} != DuckDB exact {exact_n}")
    if row["ndv_within_5pct"] is not True:
        errs.append("ndv_within_5pct is not TRUE: HLL++ rsd=0.01 sketch out of ±5%")
    if row["p50_within_rank_eps"] is not True:
        errs.append(
            "p50_within_rank_eps is not TRUE: percentile_approx outside rank ±1%"
        )
    return errs


# rows-only queries with a verifiable error bound vs exact DuckDB answers:
# name -> fn(con, spark_cols, spark_rows) returning [] when in-bounds.
BOUND_CHECKS = {
    "approx_stats": check_approx_stats,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from laradb_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    results = {}
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            # Value-discipline enforcement (workloads/__init__ docstring):
            # no DecimalType output columns. Spark 4 types decimal-literal
            # arithmetic (SUM(bigint)/100.0) as decimal(p,s); DuckDB
            # returns DOUBLE; the driver's hash stringifies the two
            # differently even when every value is numerically identical
            # (the r5 sql_front_door_q red). Fix = CAST(... AS DOUBLE).
            dec_cols = [
                f.name for f in sdf.schema.fields
                if f.dataType.typeName().startswith("decimal")
            ]
            if dec_cols:
                results[name] = {"status": "DECIMAL_OUTPUT", "cols": dec_cols}
                n_fail += 1
                print(f"✗ {name}: decimal-typed output {dec_cols} — CAST to DOUBLE (driver hash stringifies decimals differently than DuckDB doubles)")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"✗ {name}: SPARK_ERROR {str(e)[:200]}")
            continue
        if name not in oracles:
            bound_errs = None
            if name in BOUND_CHECKS:
                bound_errs = BOUND_CHECKS[name](con, scols, srows)
            if bound_errs:
                results[name] = {"status": "BOUND_FAIL", "detail": bound_errs}
                n_fail += 1
                print(f"✗ {name}: bound check failed: {bound_errs}")
            elif bound_errs == []:
                results[name] = {"status": "BOUND_CHECKED", "rows": len(srows)}
                print(f"✓ {name}: rows-only + error bounds vs exact ({len(srows)} rows, {time.time()-t0:.1f}s)")
            else:
                results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
                print(f"~ {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            # Types Spark can't emit hash fine here (fetchall → Python int)
            # but diverge under the driver's serialization (HUGEINT → float64
            # through pandas/Arrow). Fail loudly — the fix is a CAST in the
            # oracle SQL (e.g. DuckDB SUM(BIGINT) returns HUGEINT).
            # DECIMAL mirrors the Spark-side gate above: numerically equal
            # decimal/double values stringify differently under the
            # driver's hash (the r5 sql_front_door_q failure class, from
            # either side).
            unsafe = [
                f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT", "UBIGINT")
                or str(t).upper().startswith("DECIMAL")
            ]
            if unsafe:
                results[name] = {"status": "UNSAFE_ORACLE_TYPE", "cols": unsafe}
                n_fail += 1
                print(f"✗ {name}: driver-unsafe oracle column types {unsafe} — add CAST(... AS BIGINT)")
                continue
            orows = rel.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"✗ {name}: ORACLE_ERROR {str(e)[:200]}")
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        # Bound checks run IN ADDITION to the oracle hash for oracled
        # queries (pre-r8 they only ran on oracle-less ones — approx_stats
        # gaining an oracle silently dead-coded its check): a sketch
        # drifting out of bounds should fail with a message that NAMES the
        # sketch, not as an anonymous value-hash mismatch.
        if name in BOUND_CHECKS:
            problems.extend(BOUND_CHECKS[name](con, scols, srows))
        if sorted(scols_l) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols_l)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh, oh = table_hash(scols_l, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {"\x1f".join(norm_cell(c) for c in r) for r in srows}
                oset = {"\x1f".join(norm_cell(c) for c in r) for r in orows}
                s_only = list(sset - oset)[:3]
                o_only = list(oset - sset)[:3]
                problems.append(f"spark-only sample: {s_only}")
                problems.append(f"oracle-only sample: {o_only}")
        if problems:
            results[name] = {"status": "MISMATCH", "detail": problems}
            n_fail += 1
            print(f"✗ {name}: " + " | ".join(problems[:2]))
            for p in problems[2:]:
                print(f"    {p}")
        else:
            results[name] = {"status": "OK", "rows": len(srows)}
            print(f"✓ {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(json.dumps({"checked": len(results), "failed": n_fail}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
