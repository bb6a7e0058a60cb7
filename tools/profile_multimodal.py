"""Per-stage decomposition of multimodal_binary_near_dup's scaling
(r11, VERDICT r10 task 1): the declared query's second decade measured
alpha=1.15 (sf1->sf3, 14.0 -> 49.5 s, n=1) and the committed
adjudication was argued ("linear by construction + session spread"),
not decomposed — the exact style the r10 dedup_components decomposition
proved wrong twice.  This tool times AND row-counts every stage of the
shipped plan at two scale factors, n>=3 samples per point with MEDIANS,
so the residual above linear is attributed to a specific stage (or
shown to be spread) instead of waved at a labeling floor.

Stages (seams in pipeline/dedup.py + pipeline/multimodal.py — each
stage composes the library's OWN factored stage function over the
previous stage's materialized output, the r10 profile_components
protocol, so the decomposition measures the shipped plan):

  shingle     payload synthesis + hex byte-shingling (map-only)
  sig         shingle explode -> md5 digest -> 32 permuted MINs (groupBy)
  bands       signature -> 8 (band, bucket) rows per doc (map-only)
  collisions  bucket self-join + a<b filter (pre-distinct)
  cands       candidate pair .distinct()
  verify      shingle-array jaccard verify of candidate pairs

Timing: each stage's INPUT is eagerly persisted before the stage is
timed (DISK_ONLY, the profile_components discipline), so a stage's wall
time is its own compute.  Counts are exact; when a stage's ROW exponent
is ~1.0 but its TIME exponent is higher, the residual is constant-
factor (shuffle width, spill, session spread), not algorithmic.

Usage: python tools/profile_multimodal.py [base_dir] [big_dir] \
           [base_sf] [big_sf] [reps]
Defaults: .scaled/sf1 .scaled/sf3 1 3 3 -> writes
BENCH_STAGES_MM_r11.json
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


def profile(spark, sf_dir: str, reps: int) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from powa_archivist_spark.pipeline import dedup, multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict[str, dict] = {}

    def timed(name: str, build):
        """Median-of-reps wall time of materializing ``build()`` to
        DISK_ONLY; returns the last persisted frame for the next stage.
        Every rep persists a FRESH frame (unpersist between reps) so no
        rep reads a prior rep's cache."""
        samples = []
        cp = None
        n = None
        for _ in range(reps):
            if cp is not None:
                cp.unpersist()
            df = build()
            t0 = time.time()
            cp = df.persist(StorageLevel.DISK_ONLY)
            n = cp.count()
            samples.append(time.time() - t0)
        out[name] = {
            "sec": round(statistics.median(samples), 2),
            "sec_samples": [round(s, 2) for s in samples],
            "rows": n,
        }
        return cp

    wp = multimodal.with_payload(docs).persist(StorageLevel.DISK_ONLY)
    wp.count()  # outside the decomposition: shared payload input

    sh = timed("shingle", lambda: multimodal.binary_shingles(wp))
    sig = timed("sig", lambda: dedup.minhash_signatures(
        wp, num_perm=32, shingle_df=sh, hash_fn="md5"))
    banded = timed("bands", lambda: dedup._band_rows(
        sig, num_perm=32, bands=8, hash_fn="md5"))
    sig.unpersist()
    collisions = timed("collisions",
                       lambda: dedup._band_collisions(banded))
    banded.unpersist()
    cands = timed("cands", lambda: collisions.distinct())
    collisions.unpersist()
    verified = timed("verify", lambda: dedup._verify_shingle_pairs(
        cands, sh, threshold=0.8))
    cands.unpersist()
    verified.unpersist()
    sh.unpersist()
    wp.unpersist()
    return out


def main() -> int:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".scaled" / "sf1")
    big_dir = sys.argv[2] if len(sys.argv) > 2 else str(
        REPO / ".scaled" / "sf3")
    base_sf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    big_sf = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    from powa_archivist_spark.session import get_spark

    spark = get_spark("profile_multimodal")
    factor = big_sf / base_sf

    print(f"warming {base_dir} ...", file=sys.stderr, flush=True)
    profile(spark, base_dir, 1)          # warm (JIT, Python workers)
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
        "query": "multimodal_binary_near_dup (byte-shingle MinHash-LSH)",
        "protocol": ("per-stage eager-persist timing, median of "
                     f"{reps} samples per point + exact row counts; "
                     f"exponents over sf{base_sf:g}->sf{big_sf:g} "
                     f"(rows_factor {factor:g})"),
        "stages": stages,
    }
    path = REPO / "BENCH_STAGES_MM_r11.json"
    path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
