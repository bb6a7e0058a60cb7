"""Benchmark harness: run the declared query surface at a scale-factor
directory and print ONE JSON line the driver records as BENCH_r{N}.json.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Each query is forced with a full materialization (collect, result rows
discarded).  First query includes JVM/codegen warmup; a warmup pass over
a trivial read is done first so per-query numbers reflect execution, not
session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    import __spark_entry__ as entry_mod
    from powa_archivist_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")

    # warmup: touch every table once (parquet footer reads + JVM warm)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count() if name == "region" else spark.read.parquet(p).limit(1).collect()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            # noop sink: full computation of every row, no driver collect
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            print(f"bench {name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr, flush=True)
    total = round(time.time() - t_all, 3)

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
