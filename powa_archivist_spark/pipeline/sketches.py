"""Frequency / cardinality sketch operators for corpus-scale profiling.

The reference keeps exact counters only (its per-entity cardinality is
bounded by what PostgreSQL exposes); profiling a 100 TB token corpus
needs sublinear summaries.  Two classic sketches, both engineered so the
final answers stay EXACT or deterministic and therefore fully
oracle-checkable:

- :func:`heavy_hitters` — Misra-Gries candidate generation per
  partition, then an exact recount of the (bounded) candidate union.
  The pigeonhole guarantee makes the candidate set a superset of every
  global heavy hitter, so the output is exactly the true answer while
  the full-vocabulary shuffle is replaced by a broadcast semi-join.
- :func:`kmv_distinct` — k-minimum-values cardinality estimate in the
  cross-engine md5 hash family (`dedup.cross_engine_hash64`), so a SQL
  oracle replays the estimate bit-for-bit; per-partition k-min buffers
  bound the shuffle to partitions x k rows per group.
- :func:`cms_counts` — Count-Min frequency estimates for a bounded
  probe watchlist; the register table is groups x d x w integers and
  merging two corpora's sketches is elementwise addition, so the
  estimate replays exactly in SQL.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import cross_engine_hash64

# 15 hex chars of md5 = 60-bit hash space
_HASH_SPACE = float(2**60)


def _nsjoin(
    left: DataFrame,
    right: DataFrame,
    cols: Sequence[str],
    how: str = "inner",
    bcast: bool = False,
) -> DataFrame:
    """Join on ``eqNullSafe`` over ``cols`` — a NULL group key is a REAL
    group (:func:`kmv_distinct`'s documented contract; Spark's groupBy
    keeps it, but a plain list-of-columns equi-join silently drops it,
    zeroing real data).  Right-side key columns are renamed before the
    join and dropped after, so the output schema matches the
    list-of-columns form exactly."""
    renamed = {c: f"__r_{c}" for c in cols}
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, renamed[c])
    if bcast:
        r = F.broadcast(r)
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(renamed[c]))
        cond = e if cond is None else (cond & e)
    out = left.join(r, cond, how)
    if how in ("left_semi", "semi", "left_anti", "anti"):
        return out
    return out.drop(*renamed.values())


def _mg_candidates(col: str, cap: int):
    """Misra-Gries over one partition's Arrow batches: keep at most
    ``cap`` counters; on overflow subtract the (cap+1)-th largest count
    from every counter and drop the non-positive ones.  Each subtraction
    round charges at least (cap+1) x d to the n_p items seen, so any
    item with true partition count > n_p / (cap+1) survives — the
    superset guarantee the exact recount relies on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                d = vals[cap]  # (cap+1)-th largest
                counters = {
                    k: v - d for k, v in counters.items() if v - d > 0
                }
        yield pd.DataFrame({col: pd.Series(list(counters), dtype="object")})

    return run


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_num: int = 1,
    threshold_den: int = 30,
) -> DataFrame:
    """EXACT items with frequency > threshold_num/threshold_den of all
    rows, found without shuffling the full value distribution: per
    partition Misra-Gries emits <= cap candidate values (cap =
    ceil(den/num)), the bounded candidate union is broadcast back as a
    semi-join filter, and only the candidates are recounted exactly.

    At 100 TB the groupBy touches just candidate rows (<= cap distinct
    keys after the semi-join), vs a full-vocabulary shuffle for the
    naive groupBy-then-filter.  The threshold is a rational and the
    boundary compare is integer (den*cnt > num*total), so results are
    engine-exact.  Output: (value, cnt, frac)."""
    cap = math.ceil(threshold_den / threshold_num)
    # candidate schema follows the column's real type — a hardcoded
    # string schema made every non-string column fail Arrow conversion
    col_type = df.schema[col].dataType.simpleString()
    cands = (
        df.select(col)
        .mapInPandas(_mg_candidates(col, cap), schema=f"{col} {col_type}")
        .distinct()
    )
    total = df.groupBy().agg(F.count("*").alias("total"))
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt") * threshold_den > F.col("total") * threshold_num
        )
        .select(
            col,
            "cnt",
            (F.col("cnt") / F.col("total")).alias("frac"),
        )
    )


def _kmv_local(group_cols: Sequence[str], k: int):
    """Per-partition k-minimum distinct hashes per group — bounds the
    shuffle to partitions x k rows per group."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if cur is None else pd.concat([cur, pdf])
            cur = (
                cur.drop_duplicates()
                .sort_values("h")
                # dropna=False: a NULL group key is a real group (Spark's
                # groupBy keeps it); pandas' default would silently drop
                # its rows here and lose the group downstream
                .groupby(list(group_cols), as_index=False, dropna=False)
                .head(k)
            )
        if cur is not None:
            yield cur

    return run


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count estimate per group: hash the key
    into the 60-bit cross-engine family, keep the k smallest distinct
    hashes per group, estimate |D| = (k-1) * 2^60 / h_(k) (exact count
    when fewer than k distinct hashes exist).

    Both stages are bounded: the local stage never holds more than k
    rows per (group, partition); the merge aggregates partitions x k
    rows per group through ``collect_list`` of bounded arrays.  Output:
    (group..., n_exact, est_distinct) — n_exact is the true distinct
    hash count, kept here so the estimate's error is visible; at real
    scale you would drop it and keep only the sketch."""
    h: Column = cross_engine_hash64(F.col(key_col))
    hashed = df.select(*group_cols, h.alias("h"))
    # no global distinct before the local stage: the per-partition
    # buffer dedupes locally and ``array_distinct`` below handles
    # cross-partition duplicates — the only full-data exchange avoided
    local = hashed.mapInPandas(
        _kmv_local(group_cols, k),
        schema=hashed.schema,
    )
    merged = local.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list("h"))), 1, k
        ).alias("mins")
    )
    n_exact = hashed.distinct().groupBy(*group_cols).agg(
        F.count("*").alias("n_exact")
    )
    m = F.size("mins")
    # least() keeps the index in range for ANSI mode; the < k branch
    # never reads it
    kth = F.element_at("mins", F.least(m, F.lit(k)))
    # null-safe group join: a NULL group key must meet its own n_exact
    # row, not vanish through an equality join
    m_a, n_a = merged.alias("m"), n_exact.alias("n")
    cond = None
    for g in group_cols:
        eq = F.col(f"m.{g}").eqNullSafe(F.col(f"n.{g}"))
        cond = eq if cond is None else (cond & eq)
    return (
        m_a.join(n_a, cond)
        .select(
            *[F.col(f"m.{g}").alias(g) for g in group_cols],
            "n_exact",
            F.when(m < k, m.cast("double"))
            .otherwise(
                F.lit(_HASH_SPACE) * (k - 1) / kth.cast("double")
            )
            .alias("est_distinct"),
        )
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    p: int = 9,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group in the cross-engine
    md5 hash family — the MERGEABLE counterpart of :func:`kmv_distinct`
    (reference analog: the exact per-entity counters the SQL schema
    keeps, e.g. powa--5.2.0.sql's per-qual occurence counts; at 100 TB
    an exact GROUP BY key is replaced by a 2^p-register sketch).

    Cross-engine determinism is engineered end to end:

    - bucket/rest split uses INTEGER ops (``% m`` / ``shiftright``) —
      never float division, which loses bits above 2^53;
    - the register rank is ``(60-p)+1 - bitlength(rest)`` with
      ``bitlength = length(bin(x))`` (both engines' ``bin`` render
      minimal binary strings, so this is integer-exact);
    - the harmonic sum is kept RATIONAL: ``S = sum(2^(R - M_j))`` over
      all m registers (empty ones contribute ``2^R``) is an exact
      BIGINT (< 2^(R+p+1) < 2^63), so the only float ops are one final
      division, one optional ``ln`` in the small-range correction, and
      a ROUND(4) that absorbs any last-ulp libm skew.

    Spark shape at scale: groupBy(group, bucket).max(rank) partial-
    aggregates map-side to <= m rows per group per partition; the final
    groupBy(group) folds m rows per group.  Registers merge by MAX, so
    the sketch is associative across partitions, days, and clusters —
    the property KMV's k-min buffer only has via re-sort.  Output keeps
    ``n_exact`` (true distinct-hash count) so the estimate's error is
    visible; at real scale you would drop it and keep only the sketch.
    """
    hashed = _hll_hashed(df, key_col, group_cols, p)
    regs = hll_registers(df, key_col, group_cols, p)
    agg = hll_estimate(regs, group_cols, p)
    n_exact = (
        hashed.select(*group_cols, "h")
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_exact"))
    )
    a_a, n_a = agg.alias("a"), n_exact.alias("n")
    cond = None
    for g in group_cols:
        eq = F.col(f"a.{g}").eqNullSafe(F.col(f"n.{g}"))
        cond = eq if cond is None else (cond & eq)
    return a_a.join(n_a, cond).select(
        *[F.col(f"a.{g}").alias(g) for g in group_cols],
        "n_exact",
        F.col("a.est_distinct").alias("est_distinct"),
    )


def _hll_hashed(df: DataFrame, key_col: str,
                group_cols: Sequence[str], p: int) -> DataFrame:
    """(group..., j, r, h) rows: bucket, register rank, raw hash."""
    m = 1 << p
    rmax = (60 - p) + 1  # rank of a zero rest (all leading zeros)
    h = cross_engine_hash64(F.col(key_col))
    rest = F.shiftright(h, p)
    rank = F.when(
        rest > 0, F.lit(rmax) - F.length(F.bin(rest))
    ).otherwise(F.lit(rmax))
    return df.select(
        *group_cols, (h % m).alias("j"), rank.alias("r"), h.alias("h")
    )


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: Sequence[str], p: int = 9) -> DataFrame:
    """The sketch STATE: (group..., j, mj) register maxima — ≤ 2^p rows
    per group, MAX-mergeable with any other register frame of the same
    (p, hash family).  This is what an at-rest profile table stores;
    :func:`hll_estimate` turns any such frame into estimates."""
    return (
        _hll_hashed(df, key_col, group_cols, p)
        .groupBy(*group_cols, "j")
        .agg(F.max("r").alias("mj"))
    )


def hll_merge(*reg_frames: DataFrame, group_cols: Sequence[str]
              ) -> DataFrame:
    """MAX-merge register frames (daily sketches -> monthly, at-rest
    table + new batch): union, one groupBy(group, j).max — associative
    and idempotent, so replaying a batch cannot inflate the sketch."""
    it = iter(reg_frames)
    u = next(it)
    for f in it:
        u = u.unionByName(f)
    return u.groupBy(*group_cols, "j").agg(F.max("mj").alias("mj"))


def hll_estimate(regs: DataFrame, group_cols: Sequence[str],
                 p: int = 9) -> DataFrame:
    """Estimates from a register frame: exact-BIGINT harmonic sum
    ``S = sum(2^(R-M_j))`` (empty registers contribute ``2^R``), one
    float division, small-range correction ``m*ln(m/zeros)``, ROUND(4)
    absorbing last-ulp libm skew (see :func:`hll_distinct`)."""
    m = 1 << p
    rmax = (60 - p) + 1
    agg = regs.groupBy(*group_cols).agg(
        # SQL expr: pyspark's shiftleft() only takes a literal shift
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - mj)")).alias(
            "s_present"
        ),
        F.count("*").alias("n_regs"),
    )
    # alpha_m * m^2 * 2^R, evaluated in THIS literal order on both
    # engines so the IEEE result is bit-identical
    c = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m) * float(
        1 << rmax
    )
    zeros = F.lit(m) - F.col("n_regs")
    s_total = (
        F.col("s_present").cast("long")
        + zeros.cast("long") * F.lit(1 << rmax)
    )
    raw = F.lit(c) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (r9, VERDICT r8 task 7)
# ---------------------------------------------------------------------------

def _bitlen(col: Column) -> Column:
    """floor(log2(x)) + 1 for x >= 1, 0 for x == 0 — no transcendental
    log (same whole-bit discipline as textstats): length of the base-2
    string.  SQL twin: ``CASE WHEN x = 0 THEN 0 ELSE length(bin(x))
    END``."""
    return F.when(col == 0, F.lit(0)).otherwise(
        F.length(F.conv(col.cast("string"), 10, 2))
    ).cast("int")


def level_sample_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Deterministic level-sampling quantile sketch (KLL-lineage
    compactor in the cross-engine md5 hash family).

    Every row is assigned a PROMOTION LEVEL by its row hash: row i
    survives level c iff ``h(i) mod 2^c == 0`` (survivors at level c+1
    are a subset of survivors at level c — the nesting KLL gets from
    its coin flips, here derived from the hash so it is deterministic,
    order-independent, and SQL-replayable).  The sketch keeps the
    survivors at the smallest level c with ``n / 2^c <= k`` — an
    expected-size-k uniform sample whose selection is a pure function
    of the data, so two engines (or two partitions of one corpus)
    agree bit-for-bit.  COMPACTION = raising c and re-filtering, which
    is how :func:`level_sample_merge` folds sketches together.

    Error: quantile estimates off a size-k uniform sample carry
    O(sqrt(1/k)) rank error — weaker than KLL's optimal bound at equal
    k, traded here for exact cross-engine replay (a randomized
    compactor cannot be oracle-checked).  n is CARRIED in the sketch,
    so the rank arithmetic downstream is exact.

    Plan: one map-side-combinable count groupBy; the per-group cut dim
    (one row per group) broadcasts back onto the corpus; the survivor
    filter is map-only.  The only corpus-sized exchange is the final
    survivor shuffle, expected <= k rows per group.

    Returns ``(group..., n, cut, value, h)`` — one row per survivor.
    ``id_col`` must be row-unique and non-NULL (the hash ties the
    sampling decision to the ROW, never the value, keeping duplicates
    unbiased)."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).alias("value"),
        cross_engine_hash64(F.col(id_col)).alias("h"),
    )
    counts = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    cuts = counts.select(
        *group_cols, "n",
        _bitlen(F.expr(f"(n - 1) div {int(k)}")).alias("cut"),
    )
    joined = _nsjoin(base, cuts, list(group_cols), bcast=True)
    return joined.filter(
        F.expr("h % shiftleft(CAST(1 AS BIGINT), cut) = 0")
    ).select(*group_cols, "n", "cut", "value", "h")


def level_sample_merge(
    sketches: Sequence[DataFrame],
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Merge level-sampling sketches over DISJOINT row sets: sum the
    populations, recompute the cut for the merged n, and re-filter the
    unioned survivors at the (never lower) merged cut — the
    deterministic compaction.  Identical to sketching the union
    directly: survivor nesting means re-filtering the union of level-
    c_i survivor sets at c_merged >= max(c_i) yields exactly the
    union's level-c_merged survivors."""
    allrows = sketches[0]
    # per-sketch group populations BEFORE the union: within one sketch
    # (n, cut) is constant per group, so distinct yields one row per
    # group; across sketches equal (group, n) rows are REAL duplicates
    # and must both count, so the union keeps them
    per_sketch_n = sketches[0].select(*group_cols, "n").distinct()
    for s in sketches[1:]:
        allrows = allrows.unionByName(s)
        per_sketch_n = per_sketch_n.unionByName(
            s.select(*group_cols, "n").distinct()
        )
    merged_n = per_sketch_n.groupBy(*group_cols).agg(
        F.sum("n").alias("n")
    )
    cuts = merged_n.select(
        *group_cols, "n",
        _bitlen(F.expr(f"(n - 1) div {int(k)}")).alias("cut"),
    )
    return (
        _nsjoin(allrows.drop("n", "cut"), cuts, list(group_cols),
                bcast=True)
        .filter(F.expr("h % shiftleft(CAST(1 AS BIGINT), cut) = 0"))
        .select(*group_cols, "n", "cut", "value", "h")
    )


def level_sample_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    percents: Sequence[int] = (50, 90, 95, 99),
) -> DataFrame:
    """Quantile profile off a level-sampling sketch: nearest-rank picks
    over the survivor sample (uniform per-group weights cancel, so the
    weighted-rank arithmetic reduces to plain ranks).  Rank for
    percentile P over m survivors is the EXACT integer
    ``(m*P + 99) div 100`` (= ceil(m*P/100) with no float round-trip).
    The window partitions by group over <= ~k survivor rows — bounded,
    never corpus-wide."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("value", "h")
    wc = Window.partitionBy(*group_cols)
    ranked = sketch.select(
        *group_cols, "n", "cut", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )
    picks = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(m * {int(p)} + 99) div 100"),
                F.col("value"),
            )
        ).alias(f"p{p}")
        for p in percents
    ]
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.max("n").alias("n_values"),
            F.max("cut").cast("int").alias("cut_level"),
            F.max("m").alias("m_survivors"),
            *picks,
        )
    )


def kmv_set_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-operation estimates between groups from KMV sketches
    alone (Beyer et al. 2007; the theta-sketch set semantics): for every
    unordered group pair estimate |A u B|, |A n B| and the Jaccard
    similarity of the groups' distinct-key sets.

    The scale story is the whole point: each group is reduced to a
    BOUNDED k-min sketch (the same two-stage local/merge shape as
    ``kmv_distinct`` — the shuffle never exceeds partitions x k rows per
    group), and the pairwise combine runs on G^2 sketch rows where G is
    the number of groups (sources), never on the corpus.  At 100 TB the
    corpus is touched exactly once, map-side.

    Estimator, on the k smallest distinct hashes U of A u B:

        est_union = (k-1) * 2^60 / U_(k)      (kth minimum; KMV)
        rho       = |{h in U : h in A_mins and h in B_mins}| / k
        est_inter = rho * est_union           (theta-sketch intersection)
        jaccard   = rho

    When the UNION holds fewer than k distinct hashes both sketches were
    unsaturated, so every hash of both sets is present and the three
    outputs are exact (modulo 60-bit hash collisions), mirroring
    ``kmv_distinct``'s m < k branch.  Hash family: the md5-based
    cross-engine 60-bit family, so a SQL oracle replays the sketch —
    production would swap in xxhash64 (see ``cross_engine_hash64``)."""
    h = cross_engine_hash64(F.col(key_col))
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(group_col).alias("g"), h.alias("h")
    )
    local = hashed.mapInPandas(_kmv_local(["g"], k), schema=hashed.schema)
    # lazy checkpoint: the self-join below references the sketch frame
    # twice, and without a materialization barrier each reference
    # re-executes the whole corpus scan (the knn_pq_topk lesson) — the
    # checkpointed frame is G bounded rows
    merged = local.groupBy("g").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list("h"))), 1, k
        ).alias("mins")
    ).localCheckpoint(eager=False)
    a, b = merged.alias("a"), merged.alias("b")
    # G sketch rows per side: the pair frame is G^2 bounded arrays —
    # broadcast, never shuffled on the corpus
    pairs = a.join(F.broadcast(b), F.col("a.g") < F.col("b.g")).select(
        F.col("a.g").alias("group_a"),
        F.col("b.g").alias("group_b"),
        F.col("a.mins").alias("ma"),
        F.col("b.mins").alias("mb"),
    )
    u_all = F.array_sort(F.array_distinct(F.concat("ma", "mb")))
    both = F.array_intersect("ma", "mb")
    calc = pairs.select(
        "group_a", "group_b",
        F.size(u_all).alias("m_all"),
        F.slice(u_all, 1, k).alias("u"),
        both.alias("both"),
    )
    m_u = F.size("u")
    kth = F.element_at("u", F.least(m_u, F.lit(k)))
    rho_n = F.size(F.array_intersect("u", "both"))
    est_union = F.when(
        F.col("m_all") < k, F.col("m_all").cast("double")
    ).otherwise(F.lit(_HASH_SPACE) * (k - 1) / kth.cast("double"))
    est_inter = F.when(
        F.col("m_all") < k, F.size("both").cast("double")
    ).otherwise(rho_n.cast("double") / k * est_union)
    jaccard = F.when(
        F.col("m_all") < k,
        F.size("both").cast("double") / F.col("m_all").cast("double"),
    ).otherwise(rho_n.cast("double") / k)
    return calc.select(
        "group_a", "group_b",
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
        jaccard.alias("est_jaccard"),
    )


def cms_counts(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    probes: DataFrame,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-Min frequency estimates per group for a bounded probe
    watchlist (Cormode & Muthukrishnan 2005) — the MERGEABLE frequency
    member of the sketch family (distinct counts: ``kmv_distinct`` /
    ``hll_distinct``; quantiles: ``level_sample_sketch``; set ops:
    ``kmv_set_overlap``).  Reference analog: the exact per-entity event
    counters powa keeps in SQL (powa--5.2.0.sql per-qual occurence
    counts); at 100 TB the exact per-key GROUP BY is replaced by a
    d x w integer register table per group.

    Build: each row is hashed once per seed row (d map-side copies,
    no pre-shuffle blowup beyond d x), bucket = h(seed, key) mod w, and
    ONE groupBy with map-side partial aggregation produces the sketch —
    the shuffle moves at most partitions x groups x d x w partial rows
    and the at-rest sketch is groups x d x w registers regardless of
    corpus size.  Merging sketches of two corpora is elementwise
    register addition (the same groupBy-sum), which is what makes the
    estimate exactly replayable by a SQL oracle.

    Probe: the watchlist is a BOUNDED input (in production a given set
    of flagged keys — the point of a CMS is answering point queries
    without a full-corpus GROUP BY over every key); it is broadcast
    against the distinct group dim, each (group, probe) pair reads its
    d registers from the broadcast sketch, and the estimate is the
    register MINIMUM.  An exact recount of only the probed keys
    (broadcast semi-join, the ``heavy_hitters`` recount pattern) is
    kept alongside so the one-sided error is visible:
    est_cnt >= exact_cnt always, with equality when no collision hits
    all d rows.  Output: (group..., key, exact_cnt, est_cnt).

    Hash family: the md5-based cross-engine 60-bit family
    (``cross_engine_hash64``) so the oracle replays registers
    bit-for-bit; production would swap in xxhash64."""
    sketch = cms_registers(df, key_col, group_cols, d, w)
    groups = df.select(*group_cols).distinct()
    est = cms_estimate(sketch, groups, probes, key_col, group_cols, d, w)
    exact = (
        df.join(F.broadcast(probes.select(key_col)), key_col, "left_semi")
        .groupBy(*group_cols, key_col)
        .agg(F.count("*").alias("exact_cnt"))
    )
    return est.join(exact, [*group_cols, key_col], "left").select(
        *group_cols,
        key_col,
        F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"),
        "est_cnt",
    )


def _cms_seeds_and_bucket(key_col: str, d: int, w: int):
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    bucket = F.pmod(
        cross_engine_hash64(F.col("seed"), F.col(key_col)), F.lit(w)
    ).alias("bucket")
    return seeds, bucket


def cms_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """One corpus pass -> the d x w additive register table per group:
    (group..., seed, bucket, cnt).  Two register frames of the same
    (d, w) merge by elementwise addition — one more groupBy-sum — which
    is what the streaming ledger fold relies on."""
    seeds, bucket = _cms_seeds_and_bucket(key_col, d, w)
    return (
        df.select(*group_cols, key_col)
        .select(*group_cols, key_col, seeds)
        .select(*group_cols, "seed", bucket)
        .groupBy(*group_cols, "seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    registers: DataFrame,
    groups: DataFrame,
    probes: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-query the register table for every (group, probe) pair:
    est = min over the d registers, 0 when a register was never hit.
    ``groups`` is the bounded group dim, ``probes`` the bounded
    watchlist — both broadcast; the register table itself is
    groups x d x w rows and broadcasts too."""
    seeds, bucket = _cms_seeds_and_bucket(key_col, d, w)
    grid = groups.crossJoin(F.broadcast(probes.select(key_col)))
    probe_regs = grid.select(*group_cols, key_col, seeds).select(
        *group_cols, key_col, "seed", bucket
    )
    return (
        _nsjoin(
            probe_regs, registers, [*group_cols, "seed", "bucket"],
            how="left", bcast=True,
        )
        .groupBy(*group_cols, key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )


def group_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    k: int = 32,
) -> DataFrame:
    """Fixed-k deterministic uniform sample per group — bottom-k by the
    cross-engine hash of the row id (the SAMPLING analog of KMV: the
    k-min property makes samples MERGEABLE, union two corpora's samples
    and re-take the bottom k to get exactly the combined corpus's
    sample).  The per-source eval-slice / debugging-sample primitive a
    curation pipeline runs; unlike ``corpus_stratified_sample``'s rate
    filter this guarantees an exact-size slice per group at any corpus
    size.

    Scale shape: the per-partition bottom-k buffer (the ``_kmv_local``
    stage) prunes to <= k rows per (group, partition) BEFORE the only
    shuffle, so the group-partitioned ranking window sees
    partitions x k rows per group, never the corpus.  Hash family: md5
    60-bit (``cross_engine_hash64``) so the oracle replays the exact
    sample membership; production would swap in xxhash64."""
    from pyspark.sql import Window

    hashed = df.select(
        *group_cols, id_col,
        cross_engine_hash64(F.col(id_col)).alias("h"),
    )
    local = hashed.mapInPandas(
        _kmv_local(group_cols, k), schema=hashed.schema
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("h").asc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", id_col)
    )


def _mg_candidates_grouped(group_cols: Sequence[str], col: str, cap: int):
    """Misra-Gries per GROUP over one partition's Arrow batches: an
    independent cap-bounded counter table per group key, same
    subtract-and-drop overflow rule as :func:`_mg_candidates` — the
    superset guarantee holds per group because each group's counters
    only ever charge that group's items."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        per_group: dict = {}
        for pdf in batches:
            vc = pdf.groupby(
                [*group_cols, col], dropna=False
            ).size()
            for key, c in vc.items():
                g, item = key[:-1], key[-1]
                counters = per_group.setdefault(g, {})
                counters[item] = counters.get(item, 0) + int(c)
                if len(counters) > cap:
                    vals = sorted(counters.values(), reverse=True)
                    d = vals[cap]
                    per_group[g] = {
                        k: v - d for k, v in counters.items() if v - d > 0
                    }
        rows = [
            (*g, item)
            for g, counters in per_group.items()
            for item in counters
        ]
        yield pd.DataFrame(rows, columns=[*group_cols, col])

    return run


def heavy_hitters_grouped(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    threshold_num: int = 1,
    threshold_den: int = 30,
) -> DataFrame:
    """EXACT per-group heavy hitters: items with frequency >
    num/den of THEIR GROUP's rows — :func:`heavy_hitters` with a group
    dimension (per-source vocabulary skew, per-language stopword
    drift).  Per partition an independent Misra-Gries table per group
    emits <= cap candidates per (group, partition); the bounded
    candidate union is broadcast back as a (group, item) semi-join
    filter and only candidates are recounted exactly against per-group
    totals.  Integer boundary compare keeps results engine-exact.
    Output: (group..., value, cnt, frac)."""
    cap = math.ceil(threshold_den / threshold_num)
    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}"
        for c in [*group_cols, col]
    )
    cands = (
        df.select(*group_cols, col)
        .mapInPandas(
            _mg_candidates_grouped(group_cols, col, cap), schema=schema
        )
        .distinct()
    )
    totals = df.groupBy(*group_cols).agg(F.count("*").alias("total"))
    counted = (
        _nsjoin(df, cands, [*group_cols, col], how="left_semi", bcast=True)
        .groupBy(*group_cols, col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        _nsjoin(counted, totals, list(group_cols), bcast=True)
        .filter(
            F.col("cnt") * threshold_den > F.col("total") * threshold_num
        )
        .select(
            *group_cols,
            col,
            "cnt",
            (F.col("cnt") / F.col("total")).alias("frac"),
        )
    )
