"""Per-stage decomposition of dedup_components' scaling (r10, VERDICT
r9 task 2): the declared query's second decade measured alpha=1.21
(sf1->sf3) and the committed linear-floor adjudication was argued, not
decomposed.  This tool times AND row-counts every stage of the
route-fixed prefix plan at two scale factors and records per-stage
exponents, so the residual above linear is attributed to a specific
stage instead of waved at the labeling floor.

Stages (seams in pipeline/dedup.py — the frames come from the library
via ``_jaccard_prefix_sets(..., stages_out=...)``, not a re-derivation,
so the decomposition measures the shipped plan):

  collapse    docs -> distinct token sets (md5 digest groupBy)
  encode      token dictionary + per-set sorted int arrays (r13 lever)
  prefix      map-side slice/posexplode of encoded arrays -> prefix rows
  collisions  prefix self-join + positional/length prunes (pre-distinct)
  cands       candidate pair .distinct()
  verify      int-array-intersect jaccard verify of candidate pairs
  cc          Shiloach-Vishkin hooking + pointer-jump label loop
  expand      member (doc -> set) join of final labels

Timing: each stage's INPUT is eagerly localCheckpointed before the
stage is timed, so a stage's wall time is its own compute, not its
upstream's.  Counts are exact and noise-free — when a stage's ROW
exponent is ~1.0 but its TIME exponent is higher, the residual is
constant-factor (shuffle width, spill), not algorithmic.

Usage: python tools/profile_components.py [base_dir] [big_dir] \
           [base_sf] [big_sf] [reps]
Defaults: .scaled/sf1 .scaled/sf3 1 3 1 -> writes BENCH_STAGES_r10.json
(reps=1) or BENCH_STAGES_r11.json (reps>1 — the r11 n>=3 MEDIAN
protocol, VERDICT r10 task 6: each stage's wall time is the median of
``reps`` fresh materializations, so the residual-above-linear claim no
longer rests on single-sample VM spread).
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def profile(spark, sf_dir: str, reps: int = 1) -> dict:
    from pyspark.sql import functions as F

    from powa_archivist_spark.pipeline import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out: dict[str, dict] = {}

    from pyspark import StorageLevel

    def timed(name: str, build):
        """Materialize ``build()`` to DISK_ONLY storage (sf3's collision
        frame OOMs the heap under deserialized in-memory retention) and
        record median-of-reps wall time + row count; returns the last
        persisted frame so the next stage starts from materialized
        input.  Every rep persists a FRESH frame (unpersist between
        reps) so no rep reads a prior rep's cache."""
        samples = []
        cp = None
        n = None
        for _ in range(reps):
            if cp is not None:
                cp.unpersist()
            t0 = time.time()
            cp = build().persist(StorageLevel.DISK_ONLY)
            n = cp.count()
            samples.append(time.time() - t0)
        out[name] = {
            "sec": round(statistics.median(samples), 2),
            "sec_samples": [round(s, 2) for s in samples],
            "rows": n,
        }
        return cp

    from powa_archivist_spark.pipeline.spread import spread

    toks = dedup.token_sets(
        spread(docs, "doc_id")).persist(StorageLevel.DISK_ONLY)
    toks.count()  # outside the decomposition: shared input

    groups = timed(
        "collapse", lambda: dedup._collapse_token_sets(toks, "doc_id")
    )
    toks.unpersist()
    # each stage composes the library's OWN stage function over the
    # previous stage's materialized output, so its wall time is
    # isolated compute — the seams are the exact functions
    # _jaccard_prefix_sets itself chains.  r14 (the deferred VERDICT
    # r12/r13 "re-profile post-spread" item): the SHIPPED plan spreads
    # the collapse/encode checkpoints back to cluster parallelism
    # before the heavy prefix/collision/verify stages (dedup.py r13,
    # commit 7f694b4) — this profiler predates that change and timed
    # 1-2-task stages AQE had coalesced by input SIZE, i.e. a
    # serialization cliff the shipped query no longer has.  The spread
    # seams below mirror _jaccard_prefix_sets exactly, so the stage
    # table measures the shipped shape.
    enc = timed("encode", lambda: dedup._encode_token_sets(
        spread(groups, "set_id").select(F.col("set_id"), "toks")))
    enc_sp = spread(enc, "set_id")
    prefix = timed("prefix", lambda: dedup._prefix_rows(enc_sp, 0.8))
    collisions = timed(
        "collisions", lambda: dedup._prefix_collisions(prefix, 0.8)
    )
    prefix.unpersist()
    cands = timed("cands", lambda: collisions.distinct())
    collisions.unpersist()
    verified = timed("verify",
                     lambda: dedup._verify_set_pairs(cands, enc_sp, 0.8))
    cands.unpersist()
    enc.unpersist()

    comp = timed("cc", lambda: dedup.connected_components(
        verified.select(F.col("a_sid").alias("a_id"),
                        F.col("b_sid").alias("b_id")),
        groups.select(F.col("set_id")),
        id_col="set_id",
    ))
    verified.unpersist()

    member = groups.select("set_id", F.explode("ids").alias("doc_id"))
    expanded = timed("expand", lambda: member.join(
        comp.select("set_id", "component"), "set_id"))
    expanded.unpersist()
    comp.unpersist()
    groups.unpersist()
    return out


def main() -> int:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".scaled" / "sf1")
    big_dir = sys.argv[2] if len(sys.argv) > 2 else str(
        REPO / ".scaled" / "sf3")
    base_sf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    big_sf = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0

    from powa_archivist_spark.session import get_spark

    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    spark = get_spark("profile_components")
    factor = big_sf / base_sf

    print(f"warming {base_dir} ...", file=sys.stderr, flush=True)
    profile(spark, base_dir)            # warm (JIT, Python workers)
    print(f"profiling {base_dir} x{reps} ...", file=sys.stderr, flush=True)
    base = profile(spark, base_dir, reps)
    print(f"profiling {big_dir} x{reps} ...", file=sys.stderr, flush=True)
    big = profile(spark, big_dir, reps)

    stages = {}
    for name in base:
        tb, rb = base[name]["sec"], base[name]["rows"]
        tg, rg = big[name]["sec"], big[name]["rows"]
        stages[name] = {
            f"sf{base_sf:g}_sec": tb,
            f"sf{base_sf:g}_sec_samples": base[name]["sec_samples"],
            f"sf{big_sf:g}_sec": tg,
            f"sf{big_sf:g}_sec_samples": big[name]["sec_samples"],
            f"sf{base_sf:g}_rows": rb,
            f"sf{big_sf:g}_rows": rg,
            "time_exponent": round(
                math.log(max(tg, 0.01) / max(tb, 0.01))
                / math.log(factor), 2),
            "rows_exponent": round(
                math.log(max(rg, 1) / max(rb, 1)) / math.log(factor), 2),
        }
        print(f"{name:10s} t {tb:7.2f} -> {tg:7.2f}  "
              f"(a={stages[name]['time_exponent']:5.2f})   "
              f"rows {rb} -> {rg} "
              f"(a={stages[name]['rows_exponent']:5.2f})",
              file=sys.stderr, flush=True)

    artifact = {
        "query": ("dedup_components (route-fixed prefix plan, r14: "
                  "shipped post-spread shape — stage inputs spread to "
                  "cluster parallelism exactly like _jaccard_prefix_sets)"),
        "protocol": ("per-stage eager-checkpoint timing, median of "
                     f"{reps} sample(s) per point + exact row counts; "
                     "exponents over "
                     f"sf{base_sf:g}->sf{big_sf:g} "
                     f"(rows_factor {factor:g})"),
        "stages": stages,
    }
    path = REPO / ("BENCH_STAGES_r14.json" if reps > 1
                   else "BENCH_STAGES_r10.json")
    path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
