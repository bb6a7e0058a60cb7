"""Full-surface oracle enforcement (ADVICE r4): every declared
(query, oracle) pair must hash-match DuckDB — in pytest, not only in the
committed ORACLE_FULL.txt artifact.

The driver's hard gate covers the first 50 ``queries()`` entries; tail
entries were previously attested only by the self-generated artifact, so
a tail regression could pass CI silently.  This module runs the WHOLE
surface at sf0.001 (small enough for the suite; the committed
ORACLE_FULL.txt remains the sf0.01 record) and fails listing every
mismatching query.

Queries without an ``oracle_sql()`` entry get the driver's weaker check:
they must still execute and the known-nonempty ones must return rows.
"""

from __future__ import annotations

import duckdb

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _fingerprint(df):
    cols = sorted(df.columns)
    d = df[cols]
    rows = sorted(
        tuple(repr(v) for v in row) for row in d.itertuples(index=False)
    )
    return len(d), tuple(cols), hash(tuple(rows))


def test_every_declared_oracle_matches_at_sf0001(spark):
    import __spark_entry__ as entry_mod

    # threads=1: duckdb's default per-core pool busy-waits and starves
    # the in-process Spark JVM (see tools/check_oracles.py)
    con = duckdb.connect(config={"threads": 1})
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures: list[str] = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001 — collect every failure
            failures.append(f"{name}: spark error: {e}")
            continue
        if name not in oracles:
            continue  # rows-only contract: executed without error
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: duckdb error: {e}")
            continue
        n1, c1, h1 = _fingerprint(sdf)
        n2, c2, h2 = _fingerprint(odf)
        if c1 != c2:
            failures.append(f"{name}: cols spark={c1} duck={c2}")
        elif n1 != n2:
            failures.append(f"{name}: rows spark={n1} duck={n2}")
        elif h1 != h2:
            failures.append(f"{name}: value hash mismatch ({n1} rows)")
    assert not failures, (
        f"{len(failures)} oracle pair(s) failed at sf0.001:\n  "
        + "\n  ".join(failures)
    )
