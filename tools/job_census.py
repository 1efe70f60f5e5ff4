"""Per-query Spark-JOB census over the warm bench suite (r17, VERDICT
r16 "Next round" #3): the warm suite at sf0.1 is fixed-overhead-bound —
~0.1-0.15 s of driver latency per job — so the number of driver-blocking
jobs a query cadences through IS its local floor.  Runs each headline
query twice (warm timing discipline), counts jobs and wall for the
SECOND run, and prints a jobs-descending table.

Usage: python tools/job_census.py [sf_dir] [QUERY ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from platform_etl_openfda_faers_spark.plans import benchmarks
    from platform_etl_openfda_faers_spark.session import get_spark

    names = args[1:] or [
        *benchmarks.HEADLINE,
        *benchmarks.HEADLINE_V2_EXTRA,
        *benchmarks.HEADLINE_V3_EXTRA,
        *benchmarks.HEADLINE_V4_EXTRA,
    ]
    spark = get_spark(
        "job-census",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def jobs() -> int:
        return store.jobsList(None).size()

    def run(name: str) -> tuple[float, int]:
        fn = benchmarks.SPARK_QUERIES[name]
        j0, t0 = jobs(), time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0, jobs() - j0

    rows = []
    for name in names:
        run(name)  # warm-up iteration
        spark.catalog.clearCache()
        for (_id, rdd) in sc._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        wall, nj = run(name)
        spark.catalog.clearCache()
        for (_id, rdd) in sc._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        rows.append((nj, wall, name))
        print(f"{name:35s} jobs {nj:4d}  warm {wall:6.2f}s", flush=True)
    print("\n== jobs-descending ==")
    for nj, wall, name in sorted(rows, reverse=True):
        print(f"{name:35s} jobs {nj:4d}  warm {wall:6.2f}s")


if __name__ == "__main__":
    main()
