"""Per-query fn/exec profiler (round-17 measurement tool, guide §1).

Splits each query's wall time into plan CONSTRUCTION (``fn(spark,
sf_dir)`` — includes any eager work the query does, e.g. the
``_finish_cached`` promql rows and the streaming replays) and
EXECUTION (the noop write of the returned frame), steady state
(min of N after one warm pass) — the same split as the r16 checklist.

Usage:
    python tools/profile_fn.py q1 q2 ...          # fn/exec table
    python tools/profile_fn.py --cprofile q1      # cProfile of fn()
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_cprofile = "--cprofile" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from kafka_metrics_exporter_spark.session import get_spark

    spark = get_spark(
        app_name="kme-profile",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = args or list(queries)

    if do_cprofile:
        import cProfile
        import pstats

        for name in names:
            fn = queries[name]
            # warm pass so codegen/JIT don't pollute the profile
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            prof = cProfile.Profile()
            prof.enable()
            df = fn(spark, sf_dir)
            prof.disable()
            print(f"===== cProfile fn() {name} =====")
            pstats.Stats(prof).sort_stats("cumulative").print_stats(25)
            spark.catalog.clearCache()
        return

    print(f"{'query':40s} {'fn_s':>7s} {'exec_s':>7s} {'tot_s':>7s}")
    rows = []
    for name in names:
        fn = queries[name]
        best_fn = best_ex = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if i > 0:  # skip warm pass
                best_fn = min(best_fn, t1 - t0)
                best_ex = min(best_ex, t2 - t1)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        rows.append((name, best_fn, best_ex))
        print(f"{name:40s} {best_fn:7.2f} {best_ex:7.2f} {best_fn + best_ex:7.2f}")
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print("--- sorted by total ---")
    for name, f, e in rows:
        print(f"{name:40s} {f:7.2f} {e:7.2f} {f + e:7.2f}")


if __name__ == "__main__":
    main()
