"""Per-stage task-time breakdown for one registry query (r6 VERDICT #4).

Runs a query once (noop sink) and prints every stage that executed with
its task count, executor run/CPU time, shuffle read/write, spill, and
input bytes — the data to decide whether a super-linear WALL ratio is a
scale-killer (bytes blowing up) or a dense-but-linear CPU cost (bytes
linear, executor time concentrated in one aggregate stage).

Usage: python tools/profile_query.py QUERY [sf_dir] [--partitions N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from platform_etl_openfda_faers_spark.plans import benchmarks  # noqa: E402
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    parts = "32"
    if "--partitions" in args:
        i = args.index("--partitions")
        parts = args[i + 1]
        del args[i : i + 2]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "profile",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": parts,
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    quant = sc._gateway.new_array(jvm.double, 0)

    def stages():
        empty = jvm.java.util.ArrayList()
        it = store.stageList(empty, False, False, quant, empty).iterator()
        while it.hasNext():
            yield it.next()

    seen = {st.stageId() for st in stages()}
    t0 = time.time()
    benchmarks.SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.time() - t0

    rows = []
    for st in stages():
        if st.stageId() in seen:
            continue
        rows.append(
            (
                st.stageId(),
                st.numCompleteTasks(),
                st.executorRunTime() / 1e3,
                st.executorCpuTime() / 1e9,
                st.shuffleReadBytes() / 1e6,
                st.shuffleWriteBytes() / 1e6,
                (st.memoryBytesSpilled() + st.diskBytesSpilled()) / 1e6,
                st.inputBytes() / 1e6,
                str(st.name())[:60],
            )
        )
    rows.sort(key=lambda r: -r[2])
    print(f"\n{name} @ {sf_dir}  wall={wall:.2f}s  shuffle.partitions={parts}")
    print(f"{'stage':>5} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
          f"{'shR_MB':>8} {'shW_MB':>8} {'spill':>6} {'in_MB':>8}  name")
    for r in rows:
        print(f"{r[0]:>5} {r[1]:>5} {r[2]:>8.1f} {r[3]:>8.1f} "
              f"{r[4]:>8.1f} {r[5]:>8.1f} {r[6]:>6.0f} {r[7]:>8.1f}  {r[8]}")
    tot_run = sum(r[2] for r in rows)
    tot_cpu = sum(r[3] for r in rows)
    print(f"total executor run {tot_run:.1f}s  cpu {tot_cpu:.1f}s  "
          f"wall {wall:.2f}s  (32 cores => ideal wall ~{tot_run / 32:.2f}s)")


if __name__ == "__main__":
    main()
