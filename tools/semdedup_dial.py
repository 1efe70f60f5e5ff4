#!/usr/bin/env python
"""Measure SemDeDup's production dial (VERDICT r9 #4): run the
``dedup_semantic_incremental`` OPERATOR at sf10 with k scaled so cells
stay bounded (k=64/128 -> ~3k/1.5k vectors per cell), and record wall
time + exact candidate volume — replacing SCALING.md's arithmetic-only
exclusion of the k=8 checkable geometry with a measured row.

Candidate volume is computed exactly from the frozen-cell assignment
(sum over cells of |cell ∩ batch| x (|cell| - 1) — the pre-DISTINCT
join row count), separately from the timed runs.  Timed runs are
mode=solo (nothing else on the box) and INCLUDE corpus-only centroid
training, matching the registry operator's cost shape; production
trains once and amortizes that term to zero (noted in SCALING.md).

Usage: python tools/semdedup_dial.py [sf_dir] [k ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from platform_etl_openfda_faers_spark.operators import similarity  # noqa: E402
from platform_etl_openfda_faers_spark.plans.benchmarks import load_emb  # noqa: E402
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf10"
    ks = [int(x) for x in sys.argv[2:]] or [64, 128]
    spark = get_spark(
        "semdedup-dial",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_emb(spark, sf_dir)
    is_new = F.col("vec_id") % 7 == 0
    new, corpus = emb.where(is_new), emb.where(~is_new)
    n_total = emb.count()
    n_batch = new.count()
    print(f"{sf_dir}: {n_total} vectors, {n_batch} in batch")

    out: dict[str, dict] = {"_inputs": {"sf_dir": sf_dir, "vectors": n_total,
                                        "batch": n_batch, "mode": "solo"}}
    for k in ks:
        cent = similarity.kmeans_centroids(corpus, k=k, iterations=2)
        combined = corpus.select(
            F.col("vec_id"),
            F.col("embedding").cast("array<double>").alias("e"),
            F.lit(False).alias("_new"),
        ).unionByName(
            new.select(
                F.col("vec_id"),
                F.col("embedding").cast("array<double>").alias("e"),
                F.lit(True).alias("_new"),
            )
        )
        cells = similarity.ivf_cells(
            combined, cent, "vec_id", "e", nprobe=1, keep=("_new",)
        )
        s = (
            cells.groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("_new").cast("long")).alias("nb"),
            )
            .agg(
                F.sum(F.col("nb") * (F.col("n") - 1)).alias("cand"),
                F.max("n").alias("max_cell"),
                F.avg("n").alias("mean_cell"),
                F.count("*").alias("cells"),
            )
            .collect()[0]
        )
        runs = []
        rows = None
        for i in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            res = similarity.semantic_near_duplicates_incremental(
                new, corpus, threshold=0.4, k=k, iterations=2
            )
            res.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 1))
            if rows is None:
                rows = res.count()
        out[str(k)] = {
            "candidates": int(s.cand),
            "cells": int(s.cells),
            "max_cell": int(s.max_cell),
            "mean_cell": round(float(s.mean_cell), 1),
            "wall_median_s": sorted(runs)[len(runs) // 2],
            "runs_s": runs,
            "result_rows": rows,
        }
        print(k, json.dumps(out[str(k)]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
