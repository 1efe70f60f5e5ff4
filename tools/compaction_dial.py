#!/usr/bin/env python
"""Measure the stored-index COMPACTION dial (VERDICT r13 #4): after N
micro-batch appends, what does serving from the fragmented index cost
vs serving from the compacted base — and how many parquet files does
compaction collapse?

Harness: the corpus (doc_id % 7 != 0) is appended as N ingest batches
in exactly the layout the streaming loop writes
(``ingest_batch=<i>/ci=<k>/part-*.parquet`` simhash64 chunk rows), then
the batch (doc_id % 7 == 0) is served from the stored index
(``corpus_index=``) median-of-3 with caches cleared, the index is
compacted with ``compact_ingest_index``, and the same serve is timed
again.  Result rows must be IDENTICAL (asserted) — the dial measures
pure file-count/listing overhead, which is the small-files cost a
production loop accumulates at cadence.

Usage: python tools/compaction_dial.py [sf_dir] [out.json] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from platform_etl_openfda_faers_spark.operators import dedup  # noqa: E402
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402
from platform_etl_openfda_faers_spark.sources.readers import (  # noqa: E402
    load_table,
    scale_out,
)
from platform_etl_openfda_faers_spark.streaming.ingest import (  # noqa: E402
    compact_ingest_index,
)


def _timed_serve(spark, batch, idx_path, iters=3):
    runs, rows = [], None
    for _ in range(iters):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.catalog.refreshByPath(idx_path)
        t0 = time.time()
        stored = spark.read.parquet(idx_path)
        res = dedup.simhash_near_duplicates_incremental64(
            batch, None, "text", "doc_id", max_hamming=3,
            max_bucket_size=64, corpus_index=stored,
        )
        res.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
        if rows is None:
            rows = res.count()
    return sorted(runs)[len(runs) // 2], runs, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        "compaction-dial",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = scale_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    batch = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    tmp = tempfile.mkdtemp(prefix="compaction_dial_")
    idx = f"{tmp}/index"
    try:
        t0 = time.time()
        for i in range(n_batches):
            dedup.simhash64_chunk_table(
                corpus.where(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i),
                "text",
                "doc_id",
            ).write.mode("overwrite").partitionBy("ci").parquet(
                f"{idx}/ingest_batch={i}"
            )
        append_s = round(time.time() - t0, 1)

        def nfiles():
            return len(
                [
                    p for p in Path(idx).rglob("*.parquet")
                    if ".compact_tmp" not in p.parts
                ]
            )

        files_before = nfiles()
        pre_m, pre_runs, pre_rows = _timed_serve(spark, batch, idx)
        t0 = time.time()
        res = compact_ingest_index(spark, idx, partition_cols=("ci",))
        compact_s = round(time.time() - t0, 1)
        post_m, post_runs, post_rows = _timed_serve(spark, batch, idx)
        assert pre_rows == post_rows, (pre_rows, post_rows)
        out = {
            "_inputs": {
                "sf_dir": sf_dir,
                "n_batches": n_batches,
                "mode": "solo",
            },
            "append_total_s": append_s,
            "files_before": files_before,
            "files_after": res["files_after"],
            "compact_s": compact_s,
            "serve_pre_s": pre_m,
            "serve_pre_runs_s": pre_runs,
            "serve_post_s": post_m,
            "serve_post_runs_s": post_runs,
            "pair_rows": pre_rows,
        }
        print(json.dumps(out, indent=1))
        if out_path:
            Path(out_path).write_text(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
