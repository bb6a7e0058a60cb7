"""Landing-zone format connectors — collector drops in any interchange
format flow into the same staging contract.

The reference's remote API is fixed-shape SQL inserts into UNLOGGED
``*_src_tmp`` tables (powa--5.2.0.sql:1980-2022); a Spark landing zone
receives FILES from collectors instead, and heterogeneous collectors
ship heterogeneous formats.  Every reader here lands on
``shim_to_schema`` (sources/readers.py) — the same projection the
versioned source shims use — so column order, missing columns, and
extra columns are absorbed identically regardless of wire format:

- ``parquet``: the native format; types ride along.
- ``json`` (newline-delimited): read with the staging schema applied
  (no sampling-based inference — a cold directory or an all-null column
  must not change dtypes between batches); ISO-8601 timestamps parse
  directly.
- ``csv``: header row expected, staging schema applied for the same
  determinism; ``timestampFormat`` defaults to ISO-8601.
- ``orc``: columnar like parquet (Hive-lineage collectors); types ride
  along, schema shim absorbs layout drift.

At 100 TB the landing dir is object storage partitioned by arrival
time; these readers are also the batch halves of the streaming ingest
(readStream supports the same three formats with the same schemas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..specs import DatasourceSpec
from .readers import shim_to_schema

_FORMATS = ("parquet", "json", "csv", "orc")


def _relaxed(schema: T.StructType) -> T.StructType:
    """Reader-side variant of the staging schema: everything nullable
    (a wire file can't promise NOT NULL) and timestamps read as-is."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
    )


def read_landing(
    spark: SparkSession,
    path: str,
    spec: DatasourceSpec,
    fmt: str = "parquet",
    options: dict | None = None,
) -> DataFrame:
    """Read collector drops at ``path`` in ``fmt`` and project them onto
    ``spec``'s staging schema (cast / pad / drop via shim_to_schema).
    The result is a valid ``snapshot()`` capture or ``append_staging``
    payload, independent of the wire format."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported landing format {fmt!r}")
    opts = dict(options or {})
    reader = spark.read.options(**opts)
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "orc":
        df = reader.orc(path)
    elif fmt == "json":
        df = reader.schema(_relaxed(spec.staging_schema)).json(path)
    else:  # csv
        opts.setdefault("header", "true")
        df = (
            spark.read.options(**opts)
            .schema(_relaxed(spec.staging_schema))
            .csv(path)
        )
    return shim_to_schema(df, spec.staging_schema)
