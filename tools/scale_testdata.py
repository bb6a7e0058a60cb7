"""Derive a larger scale-factor dataset from the driver's sf0.1 tables
for the 100x-posture bench (VERDICT r5 task 6).

The driver ships sf{0.001,0.01,0.1} only (read-only), so sfK is derived
by replicating sf0.1 K times with DISJOINT key spaces — deterministic,
seedless, and workload-shape preserving:

- every fact table's keys get a per-replica offset of (max_key + 1), so
  all FK joins stay consistent (lineitem->orders->customer, events.user
  ->customer) and group-by cardinalities scale linearly like a real
  bigger corpus;
- region/nation stay fixed (dimensions);
- documents: replica r > 0 suffixes EVERY token with ``_r{r}`` — each
  replica is an isomorphic corpus on a disjoint shingle space, so the
  near-dup pair structure scales LINEARLY (naive text replication would
  make every replica an exact dup of its original and blow the pair
  count up quadratically in K — a different workload, not a scaled one);
- embeddings: replica r applies a deterministic per-replica sign-flip
  pattern s in {-1,+1}^d.  dot(s*a, s*b) == dot(a, b) exactly, so the
  within-replica similarity geometry (near-dup pairs, kNN neighbors,
  IVF cells) is IDENTICAL, while cross-replica dots are sign-scrambled
  to ~0 — again linear scaling of the interesting structure.

Usage: python tools/scale_testdata.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=<repo>/.scaled/sf1
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else str(Path(__file__).resolve().parents[1] / ".scaled" / "sf1")
    )

    from pyspark.sql import functions as F

    from powa_archivist_spark.queries import t
    from powa_archivist_spark.session import get_spark

    spark = get_spark("scale_testdata")
    os.makedirs(out, exist_ok=True)

    def reps(df):
        return df.crossJoin(
            spark.range(k).withColumnRenamed("id", "_r").hint("broadcast")
        )

    def off(df, col):
        """Per-replica key offset of (max+1): replica 0 keeps originals."""
        m = df.agg(F.max(col)).collect()[0][0] + 1
        return F.col(col) + F.col("_r") * F.lit(m)

    def write(df, name, nfiles=32):
        df.repartition(nfiles).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"scaled {name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")

    for name in ("region", "nation"):
        t(spark, src, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    cust = t(spark, src, "customer")
    c_off = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    write(
        reps(cust).withColumn("c_custkey", off(cust, "c_custkey"))
        .drop("_r"), "customer",
    )
    supp = t(spark, src, "supplier")
    s_off = supp.agg(F.max("s_suppkey")).collect()[0][0] + 1
    write(
        reps(supp).withColumn("s_suppkey", off(supp, "s_suppkey"))
        .drop("_r"), "supplier",
    )
    part = t(spark, src, "part")
    p_off = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    write(
        reps(part).withColumn("p_partkey", off(part, "p_partkey"))
        .drop("_r"), "part",
    )
    orders = t(spark, src, "orders")
    o_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    write(
        reps(orders)
        .withColumn("o_orderkey", off(orders, "o_orderkey"))
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_r") * c_off)
        .drop("_r"), "orders",
    )
    li = t(spark, src, "lineitem")
    write(
        reps(li)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * o_off)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("_r") * p_off)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("_r") * s_off)
        .drop("_r"), "lineitem",
    )
    ev = t(spark, src, "events")
    write(
        reps(ev)
        .withColumn("event_id", off(ev, "event_id"))
        .withColumn("user_id", F.col("user_id") + F.col("_r") * c_off)
        .drop("_r"), "events",
    )
    docs = t(spark, src, "documents")
    # r11 (the multimodal_binary_near_dup stage decomposition): token
    # SUFFIXING alone makes the WORD-shingle spaces disjoint but leaves
    # BYTE windows of the payload view shared across replicas (the
    # suffix shifts, it does not scramble), so byte-level LSH candidate
    # volume measured alpha 1.76 in ROWS on the scaled corpora —
    # replication density, not algorithm.  Each replica now ALSO
    # rotates its alphanumeric characters by a per-replica shift
    # (letters mod 26, digits mod 10, distinct (l, d) pairs up to 225
    # replicas): a bijection per replica, so every replica stays a
    # perfectly isomorphic corpus (token lengths, frequencies, set
    # structure identical), while any 8-byte window containing one
    # alnum char — all of them, in word text — differs across replicas.
    # The suffix stays for cross-replica WORD disjointness (a rotated
    # token could collide with another replica's vocabulary).
    # The suffix must also be CONSTANT-LENGTH: "_r{r}" was 3 chars for
    # r < 10 and 4 from r 10 — and every token in a replica shares the
    # suffix bytes, so longer suffixes inflate within-replica byte
    # similarity (measured: 2-digit replicas produced ~2x the per-
    # replica LSH candidates of 1-digit ones; totals went super-linear
    # in K).  One base-36 char per replica (K <= 36) keeps the byte-
    # similarity inflation identical across replicas — per-replica
    # structure is then isomorphic and totals scale linearly.
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    b36 = digits + lower
    assert k <= 36, "one-char replica suffix supports K <= 36"

    def replica_text(r: int):
        sl, sd = r % 25 + 1, r % 9 + 1
        src_a = lower + upper + digits
        dst_a = (
            lower[sl:] + lower[:sl]
            + upper[sl:] + upper[:sl]
            + digits[sd:] + digits[:sd]
        )
        return F.regexp_replace(
            F.translate(F.col("text"), src_a, dst_a),
            r"(\S+)", f"$1_{b36[r]}",
        )

    txt = F.col("text")
    for r in range(k - 1, 0, -1):
        txt = F.when(F.col("_r") == r, replica_text(r)).otherwise(txt)
    write(
        reps(docs)
        .withColumn("doc_id", off(docs, "doc_id"))
        # disjoint shingle space per replica: rotate alnum chars
        # (byte-level disjointness), then suffix every token with the
        # replica's base-36 char (word-level disjointness)
        .withColumn("text", txt)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_r"), "documents",
    )
    emb = t(spark, src, "embeddings")
    write(
        reps(emb)
        .withColumn("vec_id", off(emb, "vec_id"))
        .withColumn(
            "embedding",
            F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
                # sign-flip isometry: dot products inside a replica are
                # bit-identical, cross-replica dots sign-scramble to ~0
                F.zip_with(
                    F.col("embedding"),
                    F.sequence(F.lit(0), F.size("embedding") - 1),
                    lambda x, i: (
                        x * F.when(
                            F.pmod(F.xxhash64(F.col("_r"), i), 2) == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ).cast("float"),
                )
            ),
        )
        .drop("_r"), "embeddings",
    )
    print(f"scaled dataset (K={k}) at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
