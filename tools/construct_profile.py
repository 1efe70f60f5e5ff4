"""Query-CONSTRUCTION cost profiler (r17, executes VERDICT r16 "Next
round" #1's measurement contract): time ``fn(spark, sf_dir)`` alone —
no action, no noop sink — and count py4j gateway round trips during the
construction, via cProfile over every ``send_command`` frame.

The r16 #18 finding: driver-side expression construction (one py4j
round trip per Column call, ~20 ms per higher-order lambda) can cost
seconds per query before any job runs, and a cluster pays it
identically — it is serial driver latency, not data work.

Usage: python tools/construct_profile.py QUERY [QUERY ...] [--sf SF_DIR]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from platform_etl_openfda_faers_spark.plans import benchmarks
    from platform_etl_openfda_faers_spark.session import get_spark

    spark = get_spark(
        "construct-profile",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session (parquet footers, first-JVM-touch costs) with one
    # cheap construction so the first profiled query isn't charged for it
    benchmarks.SPARK_QUERIES[names[0]](spark, sf_dir)
    spark.catalog.clearCache()
    for name in names:
        fn = benchmarks.SPARK_QUERIES[name]
        prof = cProfile.Profile()
        t0 = time.monotonic()
        prof.enable()
        fn(spark, sf_dir)
        prof.disable()
        wall = time.monotonic() - t0
        st = pstats.Stats(prof)
        trips = sum(
            c[0]
            for key, c in st.stats.items()
            if "send_command" in key[2]
        )
        print(f"{name:30s} construct {wall:7.3f}s  py4j send_command {trips}")
        spark.catalog.clearCache()
        for (_id, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()


if __name__ == "__main__":
    main()
