"""Warehouse schema-version migration — the Spark analog of the
reference's upgrade scripts.

The reference ships one ALTER script per version step
(``powa--5.0.0--5.0.1.sql`` ... ``powa--5.1.2--5.2.0.sql``) that evolves
the PERSISTED tables when a datasource gains or loses a counter column —
e.g. 5.1.2 -> 5.2.0 rebuilds the statements history record types around
the new ``parallel_workers_*`` counters.  This repo versions its INPUTS
(sources/versions.py shims old collector payloads up to the current
spec), but the warehouse itself also needs a story: packed history rows
are array-of-struct blobs whose element type is frozen at write time, so
a spec change would otherwise strand every byte already written.

``migrate_warehouse(wh, spec_old, spec_new)`` rewrites, for one
datasource, every existing layout table to the new spec's shape:

- **added counter** -> NULL-padded everywhere it appears: flat columns in
  the ``current``/``current_db`` tables, the per-record structs inside
  the packed ``records`` arrays, and the ``mins_in_range`` /
  ``maxs_in_range`` summary structs (matching the reference's
  ``ALTER TYPE ... ADD ATTRIBUTE`` + table rewrite);
- **dropped counter** -> projected away at every one of those sites;
- **retyped counter** -> cast in place.

The transform is a single declarative expression per table (nested
``transform``/``struct`` rebuilds — no explode/re-pack shuffle, no
Python row work), so a 100 TB history migrates as one map-only rewrite
per partition.  Rewrites go through ``Warehouse.overwrite`` (staged
write + two-rename swap), and the layout version is stamped LAST, so a
crash mid-migration leaves either the old stamp with some tables already
conformed (re-running converges: conforming an already-conformed table
is the identity) or the new stamp with everything done.

A version stamp per datasource lives at ``<root>/_layout/<ds>.json`` —
the analog of the reference's extension version row — so deploys can
gate reads on ``layout_version(wh, ds)`` and re-run idempotently.

KEY changes (beyond anything the reference's upgrade scripts ever do —
they only add/drop record attributes): a DROPPED key is projected away,
leaving multiple packed rows per surviving key tuple — valid history
layout (entities already span multiple coalesce windows), so unpack
reads and re-aggregation keep working without a regroup rewrite; an
ADDED key reads NULL on pre-migration rows.  Both are covered by
tests/test_migrate.py.

Scope: the job covers the four spec-derived layout tables (current /
history and their _db twins).  The handwritten qualstats constvalues
tables, the statements dictionary, and the databases dimension are
schema-stable across reference versions (their upgrade scripts never
alter them) and would take a bespoke conform target if that ever
changes — `conform` itself is target-schema-generic.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..specs import DatasourceSpec
from ..storage import Warehouse
from .aggregate import _db_subspec


def _kind(t: T.DataType) -> str:
    if isinstance(t, T.StructType):
        return "struct"
    if isinstance(t, T.ArrayType):
        return "array"
    if isinstance(t, T.MapType):
        return "map"
    return "scalar"


def _conform_expr(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    """Rewrite ``col`` (of type ``src``) to type ``dst``: recurse through
    structs/arrays, NULL-pad fields missing from src, drop fields missing
    from dst, cast leaves.  A type-KIND change (scalar <-> array <->
    struct <-> map) has no value-preserving rewrite — it is semantically
    a drop + add under one name — so the old values conform to NULL
    rather than failing the whole migration with an un-plannable cast
    (found by the conform totality fuzz, tests/test_properties.py)."""
    if _kind(src) != _kind(dst):
        return F.lit(None).cast(dst)
    if isinstance(dst, T.StructType):
        src_fields = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in src_fields:
                parts.append(
                    _conform_expr(
                        col.getField(f.name), src_fields[f.name], f.dataType
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        # struct() of a NULL input would fabricate a non-null struct of
        # NULLs — preserve top-level nullness (mins_in_range is nullable)
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.struct(*parts)
        )
    if isinstance(dst, T.ArrayType):
        return F.transform(
            col, lambda x: _conform_expr(x, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType):
        # keys must survive UNCHANGED: any key rewrite can produce NULL
        # keys (kind change) or collisions (narrowing cast), both of
        # which abort the job at runtime (NULL_MAP_KEY /
        # DUPLICATED_MAP_KEY) — so a key-type change is treated like a
        # kind change: drop + add, old maps conform to NULL.  Values
        # conform recursively (value NULLs are legal in maps).
        if src.keyType != dst.keyType:
            return F.lit(None).cast(dst)
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.map_from_arrays(
                F.map_keys(col),
                F.transform(
                    F.map_values(col),
                    lambda v: _conform_expr(v, src.valueType, dst.valueType),
                ),
            )
        )
    return col.cast(dst)


def conform(df: DataFrame, target: T.StructType,
            keep_extra: tuple[str, ...] = ()) -> DataFrame:
    """Project ``df`` onto ``target``: matching columns conformed
    recursively, missing columns NULL.  Extra columns are DROPPED —
    that is the whole point for dropped counters/keys — except the
    explicitly named ``keep_extra`` (partition columns like
    ``range_day``, which are not part of the spec schema but must
    survive the rewrite).  Keeping all extras by default was the r5
    code-review finding: a dropped counter stayed physically present in
    the rewritten files, so later appends created mixed parquet schemas
    and the next overlap-rewrite's unionByName blew up."""
    have = {f.name: f.dataType for f in df.schema.fields}
    out = []
    for f in target.fields:
        if f.name in have:
            out.append(
                _conform_expr(F.col(f.name), have[f.name], f.dataType)
                .alias(f.name)
            )
        else:
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
    target_names = {f.name for f in target.fields}
    out += [F.col(name) for name in keep_extra
            if name in have and name not in target_names]
    return df.select(*out)


# ---------------------------------------------------------------------------
# layout-version stamps
# ---------------------------------------------------------------------------

def _stamp_path(wh: Warehouse, ds: str) -> str:
    return os.path.join(wh.root, "_layout", f"{ds}.json")


def layout_version(wh: Warehouse, ds: str) -> str | None:
    p = _stamp_path(wh, ds)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def stamp_layout_version(wh: Warehouse, ds: str, version: str) -> None:
    """Atomic write (tmp + rename) — a crash never leaves a torn stamp."""
    p = _stamp_path(wh, ds)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "datasource": ds}, f)
    os.replace(tmp, p)


# ---------------------------------------------------------------------------
# the migration job
# ---------------------------------------------------------------------------

def migrate_warehouse(
    wh: Warehouse,
    spec_old: DatasourceSpec,  # documents provenance; the rewrite only
    spec_new: DatasourceSpec,  # needs the TARGET shape (conform is total)
    to_version: str | None = None,
) -> dict[str, int]:
    """Evolve every persisted table of ``spec_old``'s datasource to
    ``spec_new``'s layout.  Returns rows rewritten per table.  Idempotent:
    conforming an already-conformed table is the identity, so a crashed
    run is safely re-run from the top."""
    if spec_old.name != spec_new.name:
        raise ValueError(
            f"migration must stay within one datasource: "
            f"{spec_old.name!r} != {spec_new.name!r}"
        )
    plan: list[tuple[str, T.StructType, list[str]]] = [
        (Warehouse.current(spec_new.name), spec_new.current_schema,
         ["srvid"]),
        (Warehouse.history(spec_new.name), spec_new.history_schema,
         ["srvid", "range_day"]),
    ]
    if spec_new.db_rollup:
        db = _db_subspec(spec_new)
        plan += [
            (Warehouse.current_db(spec_new.name), db.current_schema,
             ["srvid"]),
            (Warehouse.history_db(spec_new.name), db.history_schema,
             ["srvid", "range_day"]),
        ]
    from pyspark.sql import Observation

    rewritten: dict[str, int] = {}
    for table, target, part_by in plan:
        if not wh.exists(table):
            continue
        out = conform(wh.read(table), target, keep_extra=tuple(part_by))
        # row count observed DURING the rewrite (no second scan — the
        # migration stays one map-only pass per table, r5 code review)
        obs = Observation(f"migrate_{table}")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        wh.overwrite(out, table, partition_by=part_by)
        rewritten[table] = obs.get["rows"]
    if to_version is not None:
        stamp_layout_version(wh, spec_new.name, to_version)
    return rewritten
