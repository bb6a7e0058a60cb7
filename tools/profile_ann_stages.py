"""Per-stage decomposition of the ANN at-rest family's bench cost (r14,
VERDICT r13 task 4): `ann_ivfpq_probe_tuning` / `ann_ivfpq_at_rest` /
`ann_index_upsert` are ~9% of the bench suite and the r13 justification
for leaving them alone was prose ("build-dominated by construction").
This tool times each LIFECYCLE STEP of the three declared queries with
the same library calls the queries chain, so the seconds split into
irreducible at-rest writes vs removable work.

Each step is timed around the library call itself (the at-rest steps
are actions — table writes / collects — so no extra materialization is
added); the probe/read steps are forced with the noop sink, matching
bench.py's timing discipline.

Usage: python tools/profile_ann_stages.py [sf_dir] [reps]
Writes BENCH_STAGES_ANN_r14.json (median of reps per step).
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_once(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from powa_archivist_spark.pipeline import similarity
    from powa_archivist_spark.pipeline.queries import ANN_CELLS_TARGET, t
    from powa_archivist_spark.storage import Warehouse

    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        return r

    emb = t(spark, sf_dir, "embeddings")

    # ---- ann_ivfpq_at_rest -------------------------------------------
    scratch = tempfile.mkdtemp(prefix="annstg_pq_")
    try:
        wh = Warehouse(spark, scratch)
        build = emb.filter(F.col("vec_id") % 5 != 4)
        timed("pq_at_rest.index_build", lambda: similarity.ivfpq_index_build(
            wh, build, m=8, n_cells_target=8, n_codes_target=64))
        timed("pq_at_rest.upsert", lambda: similarity.ivfpq_upsert(
            wh, emb.filter(F.col("vec_id") % 5 == 4)))
        q = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))
        timed("pq_at_rest.probe", lambda: noop(
            similarity.ivfpq_probe(wh, q, k=10, nprobe=2)))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # ---- ann_index_upsert --------------------------------------------
    scratch = tempfile.mkdtemp(prefix="annstg_ivf_")
    try:
        wh = Warehouse(spark, scratch)
        build = emb.filter(F.col("vec_id") % 5 != 4)
        timed("ivf_upsert.build", lambda: similarity.ivf_build(
            wh, build, n_cells_target=ANN_CELLS_TARGET))
        batch = emb.filter(F.col("vec_id") % 5 == 4).unionByName(
            emb.filter(F.col("vec_id") % 50 == 0)
            .withColumn("embedding", F.reverse("embedding"))
        )
        timed("ivf_upsert.upsert", lambda: similarity.ivf_upsert(wh, batch))
        timed("ivf_upsert.summary_read", lambda: noop(
            similarity.ivf_cells(wh)
            .groupBy(F.col("cell_id").cast("long").alias("cell_id"))
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("vec_id").alias("sum_ids"),
                 F.sum(F.element_at("v", 1)).alias("sum_v0"))))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # ---- ann_ivfpq_probe_tuning --------------------------------------
    scratch = tempfile.mkdtemp(prefix="annstg_tune_")
    try:
        wh = Warehouse(spark, scratch)
        timed("probe_tuning.index_build", lambda: similarity.ivfpq_index_build(
            wh, emb, m=8, n_cells_target=8, n_codes_target=64))
        timed("probe_tuning.curve", lambda: noop(
            similarity.ivfpq_probe_tuning(
                wh, emb, query_ids=[0, 1, 2, 3, 4], k=10,
                nprobes=(1, 2, 4), m=8)))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from powa_archivist_spark.session import get_spark

    spark = get_spark("profile_ann_stages")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(1).collect()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    print("warming ...", file=sys.stderr, flush=True)
    run_once(spark, sf_dir)  # warm (JIT, Python workers)
    samples: list[dict] = []
    for i in range(reps):
        print(f"rep {i} ...", file=sys.stderr, flush=True)
        samples.append(run_once(spark, sf_dir))

    stages = {}
    for name in samples[0]:
        vals = [s[name] for s in samples]
        stages[name] = {
            "sec": round(statistics.median(vals), 3),
            "sec_samples": vals,
        }
        print(f"{name:28s} {stages[name]['sec']:7.2f}  {vals}",
              file=sys.stderr, flush=True)

    artifact = {
        "queries": ["ann_ivfpq_at_rest", "ann_index_upsert",
                    "ann_ivfpq_probe_tuning"],
        "protocol": (f"per-lifecycle-step wall timing at {sf_dir}, "
                     f"median of {reps} warm reps (one warm pass first); "
                     "probe/read steps forced with the noop sink"),
        "stages": stages,
    }
    path = REPO / "BENCH_STAGES_ANN_r14.json"
    path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
