"""Interval-overlap join — the bin (bucketized) range join.

J11's read path (``coalesce_range && tstzrange(from, to)``,
powa--5.2.0.sql:7784-7786) overlaps stored ranges against ONE scalar
range — a plain pushed predicate (functions/packing.py).  Joining two
interval SETS against each other has no Catalyst primitive in OSS
Spark: written naively it's a cross join with an overlap filter —
O(|L|·|R|) per key.

The bin join makes it an equi-join: every interval explodes into the
coarse time bins it covers, the two sides equi-join on (key, bin) —
hash-partitionable, AQE-skew-splittable — the exact overlap predicate
refines the candidates, and duplicate pairs (intervals meeting in more
than one bin) collapse with one distinct.

Cost: shuffle of bins keyed on (key, bin).  Bin count per interval =
span/bin_width + 1, so pick ``bin_width`` near the median interval
span: too fine multiplies rows, too coarse multiplies false candidates.
A long-tail interval (span >> bin_width) fans out proportionally —
cap/split outliers upstream if the span distribution is heavy-tailed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.diff_rate import epoch_seconds


def _epoch(df: DataFrame, name: str) -> Column:
    """Epoch-seconds of an interval bound.  Bounds may be timestamp
    (LTZ *or* NTZ — callers pass raw frames that bypass the loader
    shims) or already numeric seconds; the dtype decides, because
    routing numerics through a timestamp cast would truncate to
    microseconds and saturate for values past the timestamp range."""
    dt = df.schema[name].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return epoch_seconds(F.col(name))
    return F.col(name).cast("double")


def _bins(lo_s: Column, hi_s: Column, bin_width_s: int) -> Column:
    """The bin ids [floor(lo/w) .. floor(hi/w)] an interval covers;
    inputs are epoch seconds (see :func:`_epoch`)."""
    w = F.lit(bin_width_s)
    return F.sequence(
        F.floor(lo_s / w).cast("long"), F.floor(hi_s / w).cast("long")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bin_width_s: int = 300,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with equal keys whose closed intervals
    overlap: ``l_start <= r_end AND r_start <= l_end``.  Interval bounds
    are timestamp (or numeric-seconds) columns; left columns keep their
    names, right columns are suffixed ``_r`` where they collide.

    PRECONDITION: rows must be distinct on each side (give intervals an
    id column if they aren't) — the closing ``distinct()`` that
    collapses bin-induced pair duplicates cannot tell a row that
    matched in two bins from two identical input rows, so fully
    duplicate rows would collapse to one output pair.

    ``how='inner'`` only — the bin fan-out makes outer semantics
    ambiguous; anti/semi gates compose from the inner result."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")

    collide = set(left.columns) & set(right.columns)
    r = right.select(
        *[
            F.col(c).alias(f"{c}_r") if c in collide and c not in key_cols
            else F.col(c)
            for c in right.columns
        ]
    )
    rs = f"{r_start}_r" if r_start in collide and r_start not in key_cols else r_start
    re_ = f"{r_end}_r" if r_end in collide and r_end not in key_cols else r_end

    le = left.withColumn(
        "_bin",
        F.explode(_bins(_epoch(left, l_start), _epoch(left, l_end),
                        bin_width_s)),
    )
    re = r.withColumn(
        "_bin",
        F.explode(_bins(_epoch(r, rs), _epoch(r, re_), bin_width_s)),
    )
    joined = le.join(re, [*key_cols, "_bin"]).filter(
        (F.col(l_start) <= F.col(re_)) & (F.col(rs) <= F.col(l_end))
    )
    return joined.drop("_bin").distinct()
