"""Top-K per group — qualstats constvalues rankings.

Reference: ``powa_qualstats_aggregate_constvalues_current``
(powa--5.2.0.sql:6924-6982): over one named window partition
(srvid, qualid, queryid, dbid, userid), compute 5 independent
``row_number()`` rankings (most used / most filtering / least filtering /
most executed / most err-estimate) plus window min/max of the time bounds,
then ``array_agg(... ORDER BY rank) FILTER (WHERE rank <= 20)``.

Spark: the classic window-rank-filter top-K per key; the 5 rankings share
ONE shuffle (same partition key), each adds only a sort.  The ordered
filtered array_agg becomes rank-filter + sort_array(collect_list(struct)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 20  # hardcoded FILTER (powa--5.2.0.sql:6945-6950)


def ranked_topk(
    df: DataFrame,
    group_cols: list[str],
    rankings: dict[str, Column],
    k: int = TOP_K,
    payload_cols: list[str] | None = None,
    carry_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Generic N-ranking top-K: one row per group, one ts-ordered packed
    array per ranking.

    ``rankings`` maps output column name -> ORDER BY expression.  Ties are
    broken by the payload columns for determinism (Postgres row_number is
    arbitrary under ties; we pin it).

    ``carry_aggs`` maps output column name -> aggregate expression
    evaluated over the WHOLE group (before the top-k filter) — the
    reference's ``min(mints) OVER (W)`` shape (powa--5.2.0.sql:6954).
    Riding the existing window partitioning costs no extra scan or
    join; every group keeps its rank-1 rows through the filter, so the
    final groupBy already covers every input group.
    """
    payload_cols = payload_cols or [
        c for c in df.columns if c not in group_cols
    ]
    w = Window.partitionBy(*group_cols)
    ranked = df
    tiebreak = [F.col(c) for c in payload_cols]
    for name, order in rankings.items():
        ranked = ranked.withColumn(
            f"__rank_{name}", F.row_number().over(w.orderBy(order, *tiebreak))
        )
    carry_aggs = carry_aggs or {}
    for name, agg in carry_aggs.items():
        ranked = ranked.withColumn(f"__carry_{name}", agg.over(w))
    any_kept = None
    for name in rankings:
        cond = F.col(f"__rank_{name}") <= k
        any_kept = cond if any_kept is None else (any_kept | cond)
    ranked = ranked.filter(any_kept)

    aggs = []
    for name in rankings:
        aggs.append(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col(f"__rank_{name}") <= k,
                            F.struct(
                                F.col(f"__rank_{name}").alias("rank"),
                                F.struct(*[F.col(c) for c in payload_cols]).alias(
                                    "payload"
                                ),
                            ),
                        )
                    )
                ),
                lambda x: x["payload"],
            ).alias(name)
        )
    aggs += [
        F.first(f"__carry_{name}").alias(name) for name in carry_aggs
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


def qualstats_constvalues_topk(df: DataFrame, k: int = TOP_K) -> DataFrame:
    """The reference's 6-output ranking job over pre-aggregated constvalues
    (powa--5.2.0.sql:6924-6982).

    Input columns: srvid, qualid, queryid, dbid, userid, constvalues,
    sum_occurences, sum_execution_count, sum_nbfiltered,
    mean_err_estimate_ratio, mean_err_estimate_num, mints, maxts.
    """
    group = ["srvid", "qualid", "queryid", "dbid", "userid"]
    filtered_ratio = F.when(
        F.col("sum_execution_count") == 0, F.lit(0.0)
    ).otherwise(F.col("sum_nbfiltered") / F.col("sum_execution_count"))
    # least_filtering: the reference takes the TAIL of the descending
    # ranking (`filtered_rank >= nb_lines - 20`, powa--5.2.0.sql:6947 —
    # inclusive bound, so actually 21 rows when the group is large
    # enough); this engine uses an independent ASC ranking of exactly k
    # with deterministic payload tie-breaks.  Identical membership when
    # ratios are distinct; under boundary ties the reference's pick is
    # row_number-arbitrary anyway, ours is pinned (and oracle-replayed).
    rankings = {
        "most_used": F.desc("sum_occurences"),
        "most_filtering": filtered_ratio.desc(),
        "least_filtering": filtered_ratio.asc(),
        "most_executed": F.desc("sum_execution_count"),
        # the err-estimate fields are nullable (SRC allows NULL, AVG of
        # all-NULL groups stays NULL); Postgres DESC is NULLS FIRST, so
        # the reference ranks NULL estimates at the top
        # (powa--5.2.0.sql:6959-6960) — match it, Spark desc defaults
        # NULLS LAST
        "most_errestim_ratio": F.desc_nulls_first("mean_err_estimate_ratio"),
        "most_errestim_num": F.desc_nulls_first("mean_err_estimate_num"),
    }
    payload = [
        "constvalues",
        "sum_occurences",
        "sum_execution_count",
        "sum_nbfiltered",
        "mean_err_estimate_ratio",
        "mean_err_estimate_num",
    ]
    # time bounds ride the ranking window (W2, powa--5.2.0.sql:6954) —
    # no separate bounds scan or join
    return ranked_topk(
        df, group, rankings, k=k, payload_cols=payload,
        carry_aggs={"mints": F.min("mints"), "maxts": F.max("maxts")},
    )
