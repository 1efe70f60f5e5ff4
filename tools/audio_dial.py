#!/usr/bin/env python
"""Measure the audio landmark PRODUCTION geometry (VERDICT r10 #3):
run ``audio_spectral_peaks(window=1024)`` + ``audio_landmarks(max_dt=64)``
solo and record wall, landmark count, keyspace occupancy (rows/bucket
distribution) and cap-trim fraction — turning SCALING.md's 1.7e7-key
arithmetic into measured rows, exactly as ``semdedup_dial.py`` did for
SemDeDup's k.

Geometry rows (each mode=solo, wall = median of 3 cold runs):

- ``sf10-prod-dt16``: 500k tracks at window=1024 (511 usable bins),
  n_windows=17 so each track carries ~136 landmarks (the ~1e2
  landmarks/track the production arithmetic assumes); max_dt=64 is
  requested but the 17-window tracks realize dt <= 16, so the realized
  keyspace is 511^2 x 16 ≈ 4.2e6 keys.
- ``sf1-prod-full``: 50k tracks at n_windows=65 — the FULL dt 1..64
  fan-out (2,080 landmarks/track, ~1e8 landmark rows) over the full
  511^2 x 64 ≈ 1.67e7-key production keyspace.  This is the row that
  measures the SCALING.md claim directly: mean occupancy stays O(10)
  and the cap touches only degenerate keys.
- ``sf10-test-geom``: the registry harness geometry (window=64,
  max_dt=3, n_windows=8, 31-bin keyspace) for contrast — the
  SATURATED keyspace where the cap must trim hot keys.

Content distribution: seed = doc_id % (n_docs / 10) — ten copies per
content, the "mostly unique catalog with some duplicates" case (the
registry's %10 mega-cluster harness is the cap-stress case, kept in the
contrast row via its own seed rule).

ARITHMETIC PRE-CHECK (the standing rule — no pair-generating run
without a candidate-volume estimate): this tool generates LANDMARKS
only (peaks -> landmark keys -> occupancy stats); the quadratic match
join is deliberately out of scope, because at these occupancies its
candidate volume is ~keyspace x occupancy^2 (5e8 at sf10-prod-dt16) —
the production retrieval joins a QUERY BATCH against the stored
landmark table, never catalog x catalog (the incremental form's
contract).  Landmark-row volumes: 500k x 136 = 6.8e7 (sf10-prod-dt16),
50k x 2,080 = 1.04e8 (sf1-prod-full), 500k x 18 = 9e6 (sf10-test-geom)
— all bounded map/groupBy work.

Usage: python tools/audio_dial.py [out_json] [row-name ...]
(existing rows in out_json are preserved; named rows re-run)
"""

from __future__ import annotations

import json
import statistics
import sys

import numpy as np
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from platform_etl_openfda_faers_spark.operators import multimodal  # noqa: E402
from platform_etl_openfda_faers_spark.operators.dedup import (  # noqa: E402
    prune_df_window,
)
from platform_etl_openfda_faers_spark.plans.benchmarks import (  # noqa: E402
    load_docs,
)
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402

GEOMETRIES = [
    # name, sf_dir, window, n_windows, max_dt, content
    # content="tonal": the oracle harness — exact-bin sines whose peak
    #   bins follow per-seed ARITHMETIC CHAINS, so landmark keys
    #   concentrate on ~(bins x steps x dt) chain families regardless of
    #   the nominal keyspace.  This is, by construction, the DEGENERATE
    #   (pure-tone) content class the occupancy cap exists to trim.
    # content="noise": per-track seeded white noise — peak bins ~uniform
    #   over the rfft bins, the spectrally-diverse content class real
    #   catalogs are made of; this is the row that measures the
    #   production keyspace claim (keys ≈ nominal keyspace, occupancy ≈
    #   landmarks / keyspace, cap touches ~nothing).
    ("sf10-test-geom", "testdata/sf10", 64, 8, 3, "tonal"),
    ("sf10-prod-dt16", "testdata/sf10", 1024, 17, 64, "tonal"),
    ("sf1-prod-full", "testdata/sf1", 1024, 65, 64, "tonal"),
    ("sf10-prod-dt16-noise", "testdata/sf10", 1024, 17, 64, "noise"),
    ("sf1-prod-full-noise", "testdata/sf1", 1024, 65, 64, "noise"),
]
CAP = 64
ITERS = 3


def synthetic_wav_media_noise(df, id_col, seed_col, window, n_windows):
    """Seeded WHITE-NOISE mono PCM-16 WAVs: per-window dominant rfft
    bins are ~uniform over the bin range and independent across windows
    — the spectrally-diverse content class the production keyspace
    arithmetic assumes.  Measurement harness only (no analytic bin
    formula, so no oracle twin — the registry keeps the tonal form)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, sd in zip(pdf[id_col], pdf[seed_col]):
                rng = np.random.default_rng(int(sd))
                samples = rng.integers(
                    -8000, 8001, window * n_windows
                ).astype(np.int16)
                rows.append(
                    (int(mid), multimodal.encode_wav(samples, channels=1))
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col), F.col(seed_col)).mapInPandas(
        gen, schema=schema
    )


def landmark_pipeline(spark, sf_dir, window, n_windows, max_dt, content):
    docs = load_docs(spark, sf_dir)
    n_docs = docs.count()
    seeds = docs.select(
        "doc_id", (F.col("doc_id") % max(n_docs // 10, 1)).alias("gid")
    )
    if content == "noise":
        media = synthetic_wav_media_noise(
            seeds, "doc_id", "gid", window, n_windows
        )
    else:
        media = multimodal.synthetic_wav_media_tonal(
            seeds, "doc_id", seed_col="gid", window=window,
            n_windows=n_windows,
        )
    peaks = multimodal.audio_spectral_peaks(media, window=window)
    return multimodal.audio_landmarks(peaks, max_dt=max_dt), n_docs


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL_r11_audio_dial_sf10.json"
    spark = get_spark(
        "audio-dial",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    result: dict[str, dict] = {
        "_inputs": {
            "mode": "solo",
            "cap": CAP,
            "iters": ITERS,
            "seed_rule": "doc_id % (n_docs/10) — 10 copies per content",
            "note": (
                "wall times the peaks->landmarks pipeline to a noop sink; "
                "occupancy/cap stats computed once in a separate pass"
            ),
        }
    }
    only = set(sys.argv[2:])
    if Path(out_path).exists():
        result.update(
            {k: v for k, v in json.loads(Path(out_path).read_text()).items()
             if not k.startswith("_")}
        )
    for name, sf_dir, window, n_windows, max_dt, content in GEOMETRIES:
        if only and name not in only:
            continue
        lm, n_docs = landmark_pipeline(
            spark, sf_dir, window, n_windows, max_dt, content
        )
        # --- wall: median of ITERS cold runs of the landmark pipeline
        runs = []
        for _ in range(ITERS):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            lm.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
        # --- stats pass: landmark volume, keyspace occupancy, cap trim
        occ = lm.groupBy("a_bin", "b_bin", "dt").agg(
            F.count("*").alias("n")
        )
        stats = occ.agg(
            F.sum("n").alias("landmarks"),
            F.count("*").alias("keys_used"),
            F.mean("n").alias("occ_mean"),
            F.expr("percentile_approx(n, array(0.5, 0.9, 0.99))").alias("occ_p"),
            F.max("n").alias("occ_max"),
            F.sum(F.when(F.col("n") > CAP, F.col("n"))).alias("rows_in_hot"),
            F.sum(F.when(F.col("n") > CAP, 1).otherwise(0)).alias("hot_keys"),
        ).collect()[0]
        capped_rows = prune_df_window(
            lm, ["a_bin", "b_bin", "dt"], CAP
        ).count()
        total = stats["landmarks"]
        bins = window // 2 - 1
        result[name] = {
            "sf_dir": sf_dir,
            "content": content,
            "tracks": n_docs,
            "window": window,
            "n_windows": n_windows,
            "max_dt": max_dt,
            "realized_max_dt": min(max_dt, n_windows - 1),
            "keyspace_nominal": bins * bins * min(max_dt, n_windows - 1),
            "landmark_rows": int(total),
            "keys_used": int(stats["keys_used"]),
            "occ_mean": round(float(stats["occ_mean"]), 2),
            "occ_p50_p90_p99": [int(x) for x in stats["occ_p"]],
            "occ_max": int(stats["occ_max"]),
            "hot_keys_over_cap": int(stats["hot_keys"] or 0),
            "rows_in_hot_keys": int(stats["rows_in_hot"] or 0),
            "cap_trim_fraction": round(
                1.0 - capped_rows / total, 6
            ) if total else None,
            "wall_runs_s": runs,
            "wall_median_s": statistics.median(runs),
            "mode": "solo",
        }
        print(name, json.dumps(result[name]))
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
