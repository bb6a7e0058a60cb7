"""Coalesce packing / unpacking — the reference's storage-compression core.

Packing (`powa_statements_aggregate` powa--5.2.0.sql:6002-6049; generated
variant 1490-1539): per entity, collapse N snapshot rows into ONE row
holding

- ``records``: ts-ordered array of record structs (``array_agg(record)``),
- ``(range_start, range_end)``: inclusive ``tstzrange(min(ts),max(ts),'[]')``,
- ``mins_in_range`` / ``maxs_in_range``: field-wise min/max summary structs
  (minus the no-minmax fields).

Unpacking (`powa_stat_get_activity` powa--5.2.0.sql:7765-7792): explode
``records`` of rows whose range overlaps [from,to], re-filter on ts.

Spark notes (SURVEY.md §4 watch-outs):
- Postgres gets record order from insertion order; Spark's collect_list has
  NO order guarantee -> ``sort_array`` with ``ts`` as the FIRST struct field
  imposes it (struct ordering is lexicographic by field position).
- min/max over ~35-field structs is generated from the spec, exactly like
  the reference generates the SQL text (powa--5.2.0.sql:1509-1525).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..specs import DatasourceSpec


def record_struct(spec: DatasourceSpec) -> Column:
    """ts-first record struct (ts first => sort_array orders by ts)."""
    return F.struct(F.col("ts"), *[F.col(c.name) for c in spec.counters])


def pack_exprs(spec: DatasourceSpec) -> list[Column]:
    """Aggregate expressions for the coalesce groupBy."""
    return [
        F.sort_array(F.collect_list(record_struct(spec))).alias("records"),
        F.min("ts").alias("range_start"),
        F.max("ts").alias("range_end"),
        F.struct(
            F.min("ts").alias("ts"),
            *[F.min(c.name).alias(c.name) for c in spec.minmax_counters],
        ).alias("mins_in_range"),
        F.struct(
            F.max("ts").alias("ts"),
            *[F.max(c.name).alias(c.name) for c in spec.minmax_counters],
        ).alias("maxs_in_range"),
    ]


def pack(df: DataFrame, spec: DatasourceSpec) -> DataFrame:
    """current rows -> packed history rows (one per entity)."""
    cols = ["srvid", *spec.key_names]
    return df.groupBy(*cols).agg(*pack_exprs(spec)).select(
        "srvid",
        *spec.key_names,
        "range_start",
        "range_end",
        "records",
        "mins_in_range",
        "maxs_in_range",
    )


def range_overlap(ts_from: Column, ts_to: Column) -> Column:
    """``coalesce_range && tstzrange(from, to, '[]')`` with inclusive
    (range_start, range_end) columns (powa--5.2.0.sql:7784-7786).

    This predicate is parquet min/max-stat prunable — the Spark analog of
    the reference's GiST range index (powa--5.2.0.sql:2123).
    """
    return (F.col("range_start") <= ts_to) & (F.col("range_end") >= ts_from)


def unpack(df: DataFrame, spec: DatasourceSpec,
           ts_from: Column | None = None,
           ts_to: Column | None = None) -> DataFrame:
    """packed history rows -> flat (srvid, keys, ts, counters) rows.

    With bounds: range-overlap filter BEFORE the explode (cheap, prunable),
    ts re-filter AFTER (exact) — same two-phase filter as the reference
    (powa--5.2.0.sql:7776-7789).
    """
    if ts_from is not None and ts_to is not None:
        df = df.filter(range_overlap(ts_from, ts_to))
    out = df.select(
        "srvid", *spec.key_names, F.explode("records").alias("r")
    ).select("srvid", *spec.key_names, "r.*")
    if ts_from is not None and ts_to is not None:
        out = out.filter((F.col("ts") >= ts_from) & (F.col("ts") <= ts_to))
    return out
