"""Local mini-driver: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB, compare row-count + column set +
order-insensitive value hash.  Mirrors the real driver's CORRECTNESS
gate so mismatches surface before a round ends.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafka_metrics_exporter_spark.plans.oracle import (  # noqa: E402
    compare,
    register_views,
    value_hash,
    canon,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import __spark_entry__ as entry_mod
    from kafka_metrics_exporter_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    register_views(con, SF_DIR)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows, hash {value_hash(canon(sdf))}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
