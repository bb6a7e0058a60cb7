"""Exact grouped quantiles by rank arithmetic — no driver collect, no
interpolation.

The reference never computes percentiles (its UI reads min/max sketch
bands — powa--5.2.0.sql:1380-1381); corpus profiling at scale needs
them.  ``percentile_approx``/t-digest is the usual scale answer but its
result is engine-defined; this operator computes EXACT nearest-rank
quantiles with one window sort per group and integer-only target-rank
arithmetic (``rank = ceil(p*n/100) = (n*p + 99) div 100``), so results
are bit-identical across engines and fully oracle-checkable.

Cost: ONE keyed shuffle + per-group sort (the same sort every ranking
read already pays), then a conditional aggregation that collapses each
group to one row.  At 100 TB the sort is the honest price of exactness;
the t-digest path (`corpus.token_length_stats(exact=False)`) is the
sketch alternative when a ~1% error is acceptable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    percents: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """One row per group: n, min, max, and the nearest-rank p-th
    percentiles of ``value_col``.  ``tiebreak_col`` makes the sort a
    total order so equal values rank deterministically."""
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    w_all = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    aggs = [
        F.max("n").alias("n"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    for p in percents:
        target = ((F.col("n") * p) + 99) / 100  # integer ceil division
        aggs.append(
            F.max(
                F.when(
                    F.col("rn") == target.cast("long"), F.col(value_col)
                )
            ).alias(f"p{p}")
        )
    return ranked.groupBy(*group_cols).agg(*aggs)
