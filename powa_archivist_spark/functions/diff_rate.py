"""Diff (`-`) and rate (`/`) operator surface.

The reference generates, per datasource, a ``<ds>_mi`` function + a custom
``-`` operator (field-wise delta, powa--5.2.0.sql:1139-1173) and a
``<ds>_div`` function + ``/`` operator (delta / epoch-seconds, clamped to
>= 1 second, powa--5.2.0.sql:1176-1223).  powa-web applies them between
adjacent records of an entity's time series.

Spark-native equivalent: pure Catalyst column expressions applied after a
``lag()`` window — no Python UDFs, stays inside whole-stage codegen.

Counter-reset handling: the reference does NOT handle counter resets
(negative deltas after ``pg_stat_*_reset``); we optionally clamp negative
deltas to NULL (``clamp_resets=True``) which the reference UI does
implicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..specs import DatasourceSpec


def epoch_seconds(col: Column | str) -> Column:
    """Fractional-second epoch of a timestamp column, tolerant of every
    encoding the landing zone produces (TIMESTAMP_LTZ *and* TIMESTAMP_NTZ).

    ``cast(ts as double)`` throws ``DATATYPE_MISMATCH`` on TIMESTAMP_NTZ;
    casting through (LTZ) ``timestamp`` first is legal for both types and,
    under the engine's pinned-UTC session, a microsecond identity — so
    oracle hashes are unchanged.  Microseconds are exactly representable
    in a double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def epoch_micros(col: Column | str) -> Column:
    """Integer-microsecond epoch, NTZ-safe (see :func:`epoch_seconds`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def entity_window(spec: DatasourceSpec, order_cols: list[str] | None = None) -> Window:
    """Per-entity time ordering: partition by (srvid, keys), order by ts."""
    return Window.partitionBy("srvid", *spec.key_names).orderBy(
        *(order_cols or ["ts"])
    )


def _delta(cur: Column, prev: Column, clamp_resets: bool) -> Column:
    d = cur - prev
    if clamp_resets:
        return F.when(d < 0, F.lit(None)).otherwise(d)
    return d


def diff_exprs(
    spec: DatasourceSpec,
    w: Window,
    clamp_resets: bool = False,
) -> list[Column]:
    """Columns implementing ``<ds>_mi`` (powa--5.2.0.sql:1139-1173).

    ``intvl`` = seconds between consecutive snapshots; one ``<f>`` delta per
    aggregatable counter.  Rows with no predecessor get NULLs (the reference
    simply has no output pair for them).
    """
    ts_s = F.unix_timestamp(F.col("ts").cast("timestamp"))  # NTZ-safe
    out = [(ts_s - F.lag(ts_s).over(w)).cast("double").alias("intvl")]
    for c in spec.agg_counters:
        out.append(
            _delta(F.col(c.name), F.lag(c.name).over(w), clamp_resets)
            .alias(c.name)
        )
    return out


def rate_exprs(
    spec: DatasourceSpec,
    w: Window,
    clamp_resets: bool = False,
) -> list[Column]:
    """Columns implementing ``<ds>_div`` (powa--5.2.0.sql:1176-1223).

    ``sec = extract(epoch from a.ts - b.ts)``, clamped to >= 1 (reference
    clamps `CASE WHEN sec = 0 THEN 1`); per-sec fields are
    ``(a.f - b.f) / sec`` as double (numeric stays decimal).
    """
    ts_s = F.unix_timestamp(F.col("ts").cast("timestamp"))  # NTZ-safe
    raw_sec = ts_s - F.lag(ts_s).over(w)
    sec = F.when(raw_sec < 1, F.lit(1)).otherwise(raw_sec)
    out = [raw_sec.cast("long").alias("sec")]
    for c in spec.agg_counters:
        d = _delta(F.col(c.name), F.lag(c.name).over(w), clamp_resets)
        if c.dtype == "numeric":
            expr = (d / sec).cast("decimal(38,6)")
        else:
            expr = d.cast("double") / sec.cast("double")
        out.append(expr.alias(c.per_sec_name))
    return out


def with_diff(
    df: DataFrame, spec: DatasourceSpec, clamp_resets: bool = False
) -> DataFrame:
    """Entity series -> (srvid, keys, ts, intvl, deltas...)."""
    w = entity_window(spec)
    return df.select(
        "srvid", *spec.key_names, "ts", *diff_exprs(spec, w, clamp_resets)
    )


def with_rate(
    df: DataFrame, spec: DatasourceSpec, clamp_resets: bool = False
) -> DataFrame:
    """Entity series -> (srvid, keys, ts, sec, per-sec rates...)."""
    w = entity_window(spec)
    return df.select(
        "srvid", *spec.key_names, "ts", *rate_exprs(spec, w, clamp_resets)
    )
