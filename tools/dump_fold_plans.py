"""Dump the physical plans of a declared query's heaviest SQL
executions from a Spark EVENT LOG (guide §7.2): streaming-replay
queries return a localCheckpoint stub plan, so their real plan evidence
is the per-fold statements — which the event log records verbatim in
``physicalPlanDescription``.

Runs the query once with event logging enabled (same harness as
tools/profile_jobs.py), then writes the top-N longest-running
executions' plans to --out, annotated with their wall time and an
Exchange/AQE-sub-job census.

Usage:
  python tools/dump_fold_plans.py --out plans/r13/foo_fold.txt [--top 3] q
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--out", required=True)
    ap.add_argument("--top", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="sparkev_")
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--conf spark.eventLog.enabled=true "
        "--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.dir=file://{evdir} pyspark-shell"
    )

    import __spark_entry__ as entry_mod
    from powa_archivist_spark import session as sess_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = sess_mod.get_spark("dump_fold_plans", master=f"local[{cpus}]")
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    fn = entry_mod.queries()[args.query]
    spark.sparkContext.setJobDescription(f"plan:{args.query}")
    t0 = time.time()
    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()

    execs: dict[int, dict] = {}
    njobs = 0
    for lg in sorted(Path(evdir).rglob("*")):
        if not lg.is_file() or "appstatus" in lg.name:
            continue
        for line in open(lg):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event", "")
            if e.endswith("SQLExecutionStart"):
                if ev.get("time", 0) * 1e-3 >= t0 - 0.5:
                    execs[ev["executionId"]] = {
                        "start": ev["time"],
                        "plan": ev.get("physicalPlanDescription", ""),
                    }
            elif e.endswith("SQLExecutionEnd"):
                x = execs.get(ev["executionId"])
                if x:
                    x["dur"] = (ev["time"] - x["start"]) / 1000.0
            elif e == "SparkListenerJobStart":
                njobs += 1

    ranked = sorted(
        (x for x in execs.values() if "dur" in x),
        key=lambda x: -x["dur"],
    )[: args.top]
    with open(args.out, "w") as f:
        f.write(
            f"query: {args.query}  wall {wall:.2f}s  "
            f"{len(execs)} SQL executions  {njobs} jobs\n"
            f"top {len(ranked)} executions by wall time "
            f"(plans from the Spark event log)\n"
        )
        for i, x in enumerate(ranked):
            plan = x["plan"]
            nex = len(re.findall(r"\bExchange\b", plan))
            f.write(
                f"\n{'=' * 72}\n== execution #{i}: {x['dur']:.2f}s, "
                f"{nex} Exchange nodes\n{'=' * 72}\n"
            )
            f.write(plan.rstrip() + "\n")
    print(f"wrote {args.out} (wall {wall:.2f}s, {len(execs)} executions, "
          f"{njobs} jobs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
