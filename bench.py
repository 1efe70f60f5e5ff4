"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}}.

Each query is forced to full execution with a noop sink (no driver collect
skew, no result materialization cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from platform_etl_openfda_faers_spark.plans import benchmarks  # noqa: E402
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths once so per-query numbers measure the plan,
    # not first-call JIT
    benchmarks.SPARK_QUERIES["a2_distinct_rows"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # min over iterations: measures the steady-state plan cost, not
    # first-run JIT / codegen compilation / GC noise
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in benchmarks.HEADLINE:
        fn = benchmarks.SPARK_QUERIES[name]
        best = float("inf")
        # one failing query must not sink the whole bench (r3: a single
        # analysis error -> rc=1 -> no official number for the round)
        try:
            for _ in range(iters):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — report and continue
            first_line = (str(exc).splitlines() or [""])[0]
            errors[name] = f"{type(exc).__name__}: {first_line[:200]}"
        finally:
            # cached/persisted intermediates from one query otherwise leak
            # memory pressure into the next (r3: ngram-jaccard timed 3x its
            # isolated cost mid-suite); JVM GC hint clears humongous refs
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline-queries wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # a partial total is NOT comparable to a complete one (a failing
        # slow query would read as a speedup) — flag it loudly
        "complete": not errors,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
