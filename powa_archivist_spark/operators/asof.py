"""As-of join — "latest right row at-or-before each left row, per key".

The reference's nearest analog is the lateral version pick (J7:
``ORDER BY min_version DESC LIMIT 1`` per queried version,
powa--5.2.0.sql:763-778), which Postgres runs as a correlated index
probe.  At Spark scale the correlated form is a range join — O(left ×
right-per-key) row amplification through a shuffle.  This operator uses
the UNION-WINDOW shape instead: tag both sides, union them, and let one
window partitioned by key and ordered by (ts, side, seq) carry the
latest right payload forward onto every left row.

Cost: ONE shuffle of left+right keyed on the join key and a per-key
sort — the same price as any keyed window, independent of how many
right rows precede each left row.  No range-join amplification, no
per-row probe.  Skewed keys behave like any window (salt or split the
hot key upstream if one user owns a whole partition's worth of rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    right_seq_col: str | None = None,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the single most recent right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) and equal keys, or
    NULL payload columns when no such row exists (left-outer as-of).

    ``payload_cols``: right columns to carry over (default: all right
    columns except keys and ts), emitted as ``{prefix}{col}`` plus
    ``{prefix}{ts_col}`` for the matched timestamp.  ``right_seq_col``
    breaks ties between right rows sharing (key, ts) — the row with the
    LARGEST value wins; omit it only when (key, ts) is unique on the
    right or any winner is acceptable."""
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in (*key_cols, ts_col)
        ]

    # side ordering at equal ts decides <= vs <: right-before-left makes
    # a same-ts right row visible to the left row (<=); left-before-right
    # hides it (<)
    r_side, l_side = (0, 1) if not strict else (1, 0)
    seq: Column = (
        F.col(right_seq_col) if right_seq_col else F.lit(0)
    ).cast("long")

    payload = F.struct(
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(r_side).alias("_side"),
        seq.alias("_seq"),
        payload.alias("_payload"),
        *[F.lit(None).alias(c) for c in left.columns
          if c not in (*key_cols, ts_col)],
    )
    l = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("long").alias("_seq"),
        F.lit(None).cast(
            r.schema["_payload"].dataType.simpleString()
        ).alias("_payload"),
        *[c for c in left.columns if c not in (*key_cols, ts_col)],
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_left = F.col("_side") == l_side
    return (
        r.unionByName(l)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(is_left)
        .select(
            *key_cols,
            ts_col,
            *[c for c in left.columns if c not in (*key_cols, ts_col)],
            F.col(f"_match.{prefix}{ts_col}").alias(f"{prefix}{ts_col}"),
            *[
                F.col(f"_match.{prefix}{c}").alias(f"{prefix}{c}")
                for c in payload_cols
            ],
        )
    )
