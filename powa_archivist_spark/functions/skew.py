"""Skew-resistant aggregation — explicit salting.

AQE's skew-join splitting (enabled in the session defaults) handles
skewed JOINS at runtime, but a skewed GROUP BY key still funnels one
key's rows into one reducer.  Salting splits each key into ``salt``
sub-keys for a partial aggregate, then combines the partials — two small
shuffles instead of one hot one.

Only worth it for algebraic aggregates (sum/count/min/max) on keys with
heavy hitters; for balanced keys the extra shuffle is pure overhead —
callers choose, like the reference chooses its physical design per
table (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (op, input column) with op in
    sum/count/min/max.  Result equals ``df.groupBy(keys).agg(...)`` for
    these algebraic ops, but no single reducer ever sees more than
    ~1/salt of a hot key's rows."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    partial_exprs = []
    for out, (op, col) in aggs.items():
        fn = F.count if op == "count" else _MERGE[op]
        partial_exprs.append(fn(col).alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = [
        _MERGE[op](f"__p_{out}").alias(out)
        for out, (op, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi join for the big x medium case where the
    medium side is too large to broadcast and one join key is hot
    enough to stall a sort-merge task.

    The big side gets a random salt in [0, salt); the medium side is
    replicated ``salt`` times (explode of a literal range) so every
    (key, salt) pair finds its match.  A hot key's rows then spread
    over ``salt`` reducers instead of one.  Result is exactly
    ``big.join(small, keys)`` — the salt never changes which rows
    match, only where they meet.

    This is the manual form of what AQE skew-join splitting does at
    runtime; explicit salting still wins when the skew is known ahead
    (no runtime re-plan, stable task sizing) or when AQE's per-shuffle
    statistics miss it (many moderately-hot keys)."""
    b = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, keys + ["__salt"]).drop("__salt")
