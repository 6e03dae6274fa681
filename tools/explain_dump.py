"""Dump .explain("formatted") for registry queries to plans/r17/.

Usage: python tools/explain_dump.py <suffix> [query ...]
  suffix: "before" or "after" — file becomes plans/r17/<query>_<suffix>.txt
  with no query names, dumps every registered query.

Plans are captured at sf0.1 with the SAME session conf bench.py uses,
so Exchange counts / join strategies in the files match what the bench
actually executes (AQE initial plan; the bench's measured plan).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from kafka_metrics_exporter_spark.session import get_spark

    spark = get_spark(
        app_name="explain-dump",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    out_dir = os.path.join(REPO, "plans", os.environ.get("KME_PLANS_ROUND", "r17"))
    os.makedirs(out_dir, exist_ok=True)

    queries = entry_mod.queries()
    for name, fn in queries.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
