"""powa_archivist_spark — PySpark-native re-implementation of the
capabilities of powa-team/powa-archivist (reference studied read-only at
/root/reference; SURVEY.md maps every operator).

Spark-first: declarative DataFrame plans, Catalyst optimization, parquet
partitioning by (srvid, day) — no translation of the reference's PL/pgSQL
execution."""

__version__ = "0.1.0"
