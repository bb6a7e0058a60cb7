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
    # spawn the Python/Arrow workers once so the first mapInPandas query
    # doesn't absorb the ~5s interpreter fork into its own number
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

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

    # The driver parses the final JSON line out of a bounded (2000-char)
    # output tail, so the line MUST stay under that budget no matter how
    # many queries are declared.  Emit slowest-first with compact floats;
    # if the full dict would overflow, fold the fastest remainder into a
    # single "_rest(N)" sum.  Full per-query detail goes to BENCH_FULL.json.
    budget = 1800

    def fmt(v: float) -> float:
        return round(v, 2) if v < 10 else round(v, 1)

    # -1.0 sentinels mark errored queries; they are NOT times — keep them
    # out of the slowest-first sort and the _rest fold (summing them once
    # produced a nonsense negative "_rest" in a recorded bench line).
    errored = sorted(k for k, v in timings.items() if v < 0)
    ordered = sorted(
        ((k, v) for k, v in timings.items() if v >= 0), key=lambda kv: -kv[1]
    )
    if errored:
        print(f"bench: {len(errored)} errored queries: {errored}",
              file=sys.stderr, flush=True)
    with open(Path(__file__).resolve().parent / "BENCH_FULL.json", "w") as f:
        json.dump({"total_sec": total, "sf": sf, "errors": errored,
                   "queries": timings}, f, indent=1)

    def line_for(n_keep: int) -> str:
        q = {k: fmt(v) for k, v in ordered[:n_keep]}
        rest = ordered[n_keep:]
        if rest:
            q[f"_rest({len(rest)})"] = fmt(sum(v for _, v in rest))
        payload = {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": q,
            "sf": sf,
        }
        if errored:
            payload["_errors"] = len(errored)
        return json.dumps(payload, separators=(",", ":"))

    n_keep = len(ordered)
    out = line_for(n_keep)
    while len(out) > budget and n_keep > 1:
        n_keep -= max(1, (len(out) - budget) // 30)
        out = line_for(n_keep)
    if n_keep < len(ordered):
        print(f"bench: JSON line folds {len(ordered) - n_keep} fastest "
              f"queries into _rest; full detail in BENCH_FULL.json",
              file=sys.stderr, flush=True)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
