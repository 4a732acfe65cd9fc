"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` pair
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value comparison (sorted rows,
with float tolerance only for reporting — the goal is exact match).

Usage: python scripts/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def norm_rows(cols, rows):
    # driver sorts columns by name before hashing — mimic that
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main() -> int:
    import __spark_entry__ as e
    from aggregation_duckdb_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8",
                                   "spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        # The driver's pandas canonicalizer factorizes result columns to
        # sort rows; list/map/struct cells raise "unhashable type". Be
        # strictly AS strict as the driver here: nested output types are
        # a failure even if values match — serialize them to strings.
        nested = [f.name for f in sdf.schema.fields
                  if f.dataType.typeName() in ("array", "map", "struct")]
        if nested:
            failures.append(name)
            print(f"FAIL  {name}: nested-type output columns {nested} "
                  f"would crash the driver hasher — serialize to string")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        status, detail = "PASS", ""
        if sc != oc:
            status, detail = "FAIL", f"columns differ: spark={sc} duckdb={oc}"
        elif len(sr) != len(orr):
            status, detail = "FAIL", f"row count: spark={len(sr)} duckdb={len(orr)}"
        else:
            exact = sr == orr
            if not exact:
                close = all(
                    len(x) == len(y) and all(approx_equal(a, b) for a, b in zip(x, y))
                    for x, y in zip(sr, orr))
                if close:
                    status = "NEAR"  # hash would MISMATCH — fix to exact!
                    for x, y in zip(sr, orr):
                        if x != y:
                            detail = f"first near-miss: spark={x} duckdb={y}"
                            break
                else:
                    status = "FAIL"
                    for x, y in zip(sr, orr):
                        if x != y:
                            detail = f"first diff: spark={x} duckdb={y}"
                            break
        if status != "PASS":
            failures.append(name)
        print(f"{status}  {name}: {len(sr)} rows [{time.time()-t0:.1f}s] {detail}")
    print(f"\n{len(failures)} failures of {len([n for n in qs if not ONLY or n in ONLY])}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
