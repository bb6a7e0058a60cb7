"""100x-posture bench (VERDICT r5 task 6): run the most expensive
queries at sf0.1 AND at the derived sf1 (tools/scale_testdata.py, 10x
rows), and record the per-query scaling exponent

    alpha = log(t_sf1 / t_sf0.1) / log(10)

alpha ~ 1.0 is linear (ideal for scan/agg/join work), < 1 means fixed
overhead still dominates at sf0.1, > ~1.15 is a red flag (super-linear
— the shape that breaks at 100 TB) and gets a PERF.md root-cause.

Writes BENCH_SCALING.json (committed artifact); bench.py folds it into
BENCH_FULL.json under "scaling" so the driver's artifact carries it.

Usage: python tools/bench_scaling.py [query ...]
Env:   SPARK_GRAFT_SF1_DIR (default <repo>/.scaled/sf1)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: the 10 most expensive sf0.1 queries of the r5 bench — the ones whose
#: scaling behavior decides the 100 TB story
DEFAULT_QUERIES = [
    "stream_near_dup_ledger",
    "multimodal_binary_near_dup",
    "dedup_components",
    "qualstats_snapshot_topk",
    "wait_sampling_snapshot_resolved",
    "dedup_simhash",
    "emb_semantic_dedup",
    "dedup_minhash_lsh",
    "corpus_decontam",
    "doc_fingerprints",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _components_fixed_prefix(spark, sf_dir):
    """dedup_components with the pair strategy HELD FIXED (prefix) at
    both scale factors.  The as-declared query uses strategy="probe",
    which correctly routes the 31-token sf0.1 corpus to the O(1)-verify
    bitmask path but must fall back to prefix filtering once the scaled
    corpus's vocabulary exceeds 63 — so its raw exponent measures the
    routing cliff, not the algorithm.  This variant isolates the
    algorithm's own scaling."""
    from pyspark.sql import functions as F

    from powa_archivist_spark.pipeline import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = dedup.jaccard_pairs(docs, threshold=0.8, strategy="prefix")
    comp = dedup.connected_components(pairs, docs)
    return comp.select(
        "doc_id", "component",
        (F.col("doc_id") == F.col("component")).alias("is_kept"),
    )


EXTRA_QUERIES = {
    "dedup_components[prefix-fixed]": _components_fixed_prefix,
}


def main() -> int:
    only = sys.argv[1:] or DEFAULT_QUERIES
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", str(REPO / ".scaled" / "sf1")
    )
    if not os.path.isdir(sf1_dir):
        print(f"missing {sf1_dir}; run tools/scale_testdata.py first",
              file=sys.stderr)
        return 2

    import __spark_entry__ as entry_mod
    from powa_archivist_spark.session import get_spark

    spark = get_spark("bench_scaling")
    qs = {**entry_mod.queries(), **EXTRA_QUERIES}

    def warm(sf_dir: str) -> None:
        for name in TABLES:
            p = f"{sf_dir}/{name}.parquet"
            if os.path.exists(p):
                spark.read.parquet(p).limit(1).collect()

    warm(base_dir)
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out: dict[str, dict] = {}
    for name in only:
        t_base = run(name, base_dir)
        print(f"scaling {name}: sf0.1 {t_base:.2f}s", file=sys.stderr,
              flush=True)
    warm(sf1_dir)
    for name in only:
        t_base = run(name, base_dir)         # second, warmed sample
        t_big = run(name, sf1_dir)
        alpha = math.log(t_big / t_base) / math.log(10)
        out[name] = {
            "sf0.1_sec": round(t_base, 2),
            "sf1_sec": round(t_big, 2),
            "exponent": round(alpha, 2),
        }
        print(
            f"scaling {name}: sf0.1 {t_base:.2f}s  sf1 {t_big:.2f}s  "
            f"alpha {alpha:.2f}",
            file=sys.stderr, flush=True,
        )

    path = REPO / "BENCH_SCALING.json"
    prior = {}
    if path.exists():
        with open(path) as f:
            prior = json.load(f).get("queries", {})
    rec = {
        "protocol": "n=1 warmed, alpha=log10(t_sf1/t_sf0.1)",
        "sf_base": 0.1,
        "sf_big": 1.0,
        "rows_factor": 10,
        "queries": {**prior, **out},
    }
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
