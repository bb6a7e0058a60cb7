"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator inventory (SURVEY.md §2 +
the LLM-pipeline operators); ``oracle_sql()`` the matching DuckDB SQL.
EVERY declared query has an oracle entry — the engine-specific hash
families (xxhash64 minhash / simhash / fingerprints, LSH ANN) gained
exact cross-engine oracles in round 2 by pinning a shared hash spec on
both sides.  ``tools/check_oracles.py`` replays the full surface
(row count + column set + order-insensitive value hash per query)
against any sf dir; the committed ``ORACLE_FULL.txt`` is its latest
all-query run.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from powa_archivist_spark.pipeline.queries import PIPELINE_QUERIES  # noqa: E402
from powa_archivist_spark.queries import CORE_QUERIES  # noqa: E402

_ALL = {**CORE_QUERIES, **PIPELINE_QUERIES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from powa_archivist_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in _ALL.items() if oracle is not None
    }
