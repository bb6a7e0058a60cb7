"""Local stand-in for the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle at the given SF dir, compare row
count, column set, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        # repr-level compare; driver may be stricter — keep exact
        return repr(v)
    return repr(v)


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, tuple, int]:
    cols = sorted(df.columns)
    d = df[cols]
    rows = sorted(
        tuple(norm_cell(v) for v in row) for row in d.itertuples(index=False)
    )
    return len(d), tuple(cols), hash(tuple(rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from powa_archivist_spark.session import get_spark

    spark = get_spark("check_oracles")
    # threads=1: duckdb's default worker pool (one per core) busy-waits
    # and starves the Spark JVM in-process — expression-heavy queries go
    # 10-30x slower with an idle multi-threaded duckdb connection open
    con = duckdb.connect(config={"threads": 1})
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING {name}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        n1, c1, h1 = frame_fingerprint(sdf)
        n2, c2, h2 = frame_fingerprint(odf)
        status = "OK  " if (n1, c1, h1) == (n2, c2, h2) else "FAIL"
        detail = ""
        if c1 != c2:
            detail = f" cols spark={c1} duck={c2}"
        elif n1 != n2:
            detail = f" rows spark={n1} duck={n2}"
        elif h1 != h2:
            merged = sdf[sorted(sdf.columns)].merge(
                odf[sorted(odf.columns)], how="outer", indicator=True
            )
            diff = merged[merged["_merge"] != "both"]
            detail = f" value mismatch; {len(diff)} differing rows; sample:\n{diff.head(6)}"
        print(f"{status}  {name}: {n1} rows [{spark_s:.1f}s]{detail}")
        if status == "FAIL":
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
