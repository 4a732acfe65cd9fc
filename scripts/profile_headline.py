"""Per-entry profiling: where the bench's measured wall goes.

For each requested entry, splits one bench iteration into
  build_s   — Python/driver time constructing the DataFrame (includes
              memoized artifact builds, .fit steps, streaming drains)
  plan_s    — analysis+optimization time of the final frame (explain)
  exec_s    — .count() wall (median of N)
and reports how many Spark jobs the count fired (scheduling overhead
signal: each job is a driver round-trip + barrier).

Usage: python scripts/profile_headline.py [entry ...] [--sf DIR] [--n 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:]]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_runs = 3
names: list[str] = []
i = 0
while i < len(args):
    if args[i] == "--sf":
        sf_dir = args[i + 1]; i += 2
    elif args[i] == "--n":
        n_runs = int(args[i + 1]); i += 2
    else:
        names.append(args[i]); i += 1


def main() -> None:
    from aggregation_duckdb_spark import matrix
    from aggregation_duckdb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile", master=f"local[{cpus}]",
                      extra_confs={"spark.ui.enabled": "false"})
    sc = spark.sparkContext
    qs = matrix.queries()
    todo = names or list(qs)

    # warmup, mirroring bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    try:
        from aggregation_duckdb_spark.flagship import flagship_closure_agg
        flagship_closure_agg(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:
        print(f"# warmup skipped: {exc}", file=sys.stderr)

    out = {}
    for name in todo:
        if name not in qs:
            print(f"# skipping unknown {name}", file=sys.stderr)
            continue
        fn = qs[name]
        rec = {"build_s": [], "plan_s": [], "exec_s": [], "jobs": []}
        for r in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().optimizedPlan()  # force analysis+opt
            t2 = time.time()
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            n = df.count()
            t3 = time.time()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            rec["build_s"].append(round(t1 - t0, 3))
            rec["plan_s"].append(round(t2 - t1, 3))
            rec["exec_s"].append(round(t3 - t2, 3))
            rec["jobs"].append(j1 - j0)
            rec["rows"] = n
        out[name] = rec
        print(f"# {name}: build {rec['build_s']} plan {rec['plan_s']} "
              f"exec {rec['exec_s']} jobs {rec['jobs']} rows {n}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
