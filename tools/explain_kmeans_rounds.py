"""Dump the INTERNAL per-round physical plans of similarity.kmeans —
the Lloyd assignment/centroid-update job and one init-round scoring job
— plus the final returned assignment plan.  The declared kmeans queries
run these jobs once per round inside the driver loop; the returned
frame's explain alone would hide them (and the streaming ledger queries
return a localCheckpoint leaf).  Committed under plans/r13/ as the
before/after evidence for the r13 kmeans restructure.

Usage: python tools/explain_kmeans_rounds.py <out_prefix> [sf_dir]
Writes <out_prefix>_lloyd_round.txt, <out_prefix>_init_round.txt and
<out_prefix>_final_assign.txt.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    out_prefix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from powa_archivist_spark.pipeline import similarity
    from powa_archivist_spark.pipeline.queries import t
    from powa_archivist_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("explain_kmeans", master=f"local[{cpus}]")
    emb = t(spark, sf_dir, "embeddings")

    # run kmeans once to capture real converged centers for the plans
    stats: dict = {}
    final = similarity.kmeans(emb, k=8, init_rounds=3, max_rounds=40,
                              stats_out=stats)
    centers = stats["centers"]
    vecs = emb.select(
        F.col("vec_id"), similarity.quantized(F.col("embedding")).alias("v")
    )

    # The per-round frames, rebuilt exactly as the kmeans loop builds
    # them (version-appropriate: pre-r13 this used a crossJoin/groupBy;
    # post-r13 the literal-centers projection).  We introspect the live
    # module so the same tool documents both versions.
    if hasattr(similarity, "_assign_driver_centers"):
        lloyd = similarity._lloyd_update_frame(vecs, centers)
        init = similarity._init_score_frame(vecs, centers)
        fassign = similarity._assign_driver_centers(
            vecs, list(enumerate(centers)), "vec_id")
    else:
        cd = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centers)],
            "cluster long, cv array<bigint>")
        assign = (
            vecs.crossJoin(F.broadcast(cd))
            .select("vec_id", "v", "cluster",
                    similarity.int_l2(F.col("v"), F.col("cv")).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min_by(F.struct(F.col("cluster"), F.col("v")),
                          F.struct(F.col("d2"), F.col("cluster"))).alias("best"))
            .select("best.cluster", "best.v")
        )
        lloyd = (
            assign.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .withColumn("cx", F.floor(F.col("sx") / F.col("n")).cast("long"))
            .groupBy("cluster")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("dim"), F.col("cx")))),
                lambda s: s.getField("cx")).alias("cv"))
        )
        init = (
            vecs.crossJoin(F.broadcast(cd))
            .select("vec_id", "v",
                    similarity.int_l2(F.col("v"), F.col("cv")).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("md"),
                 F.min_by(F.col("v"), F.col("d2")).alias("v"))
            .orderBy(F.col("md").desc(), F.col("vec_id").asc())
            .limit(4)
        )
        fassign = similarity.assign_to_centers(vecs, cd, id_col="vec_id")

    for name, df in [("lloyd_round", lloyd), ("init_round", init),
                     ("final_assign", fassign)]:
        with open(f"{out_prefix}_{name}.txt", "w") as f:
            f.write(fmt(df))
        print(f"wrote {out_prefix}_{name}.txt")
    # keep the full query's own plan too
    with open(f"{out_prefix}_returned.txt", "w") as f:
        f.write(fmt(final))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
