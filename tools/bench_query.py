"""Isolate and measure individual declared queries (guide §1.1/§1.4):
time each named query with the noop sink (full computation, no driver
collect), optionally dump its .explain("formatted") to a file.

Usage:
  python tools/bench_query.py [--reps N] [--plan-dir DIR] [--sf SF_DIR] q1 q2 ...

Prints one line per rep and a median per query.  Plans are written as
<plan-dir>/<query>.txt.  Job descriptions are set per query so the UI
(when enabled) attributes stages correctly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from powa_archivist_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_query", master=f"local[{cpus}]")
    # same warmup as bench.py: table footers + Python worker fork
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{args.sf}/{name}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).limit(1).collect()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    qs = entry_mod.queries()
    for qname in args.queries:
        fn = qs[qname]
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{qname} rep{i}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples.append(dt)
            print(f"{qname} rep{i}: {dt:.2f}s", flush=True)
            if args.plan_dir and i == 0:
                Path(args.plan_dir).mkdir(parents=True, exist_ok=True)
                with open(Path(args.plan_dir) / f"{qname}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        s = sorted(samples)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s)//2-1] + s[len(s)//2]) / 2
        print(f"{qname}: median {med:.2f}s min {s[0]:.2f} max {s[-1]:.2f} "
              f"n={len(s)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
