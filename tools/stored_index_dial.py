#!/usr/bin/env python
"""Measure the STORED-INDEX contract's scale win (the r11 follow-through
on VERDICT r10 #4, extended to the third family per VERDICT r11 #2b):
for the stored-index families — the SimHash-64 chunk table, the IVF
cell-assignment table, and (r12) the dHash image chunk table — A/B the
incremental operator consuming a REAL parquet index vs recomputing the
corpus side, on the same box, mode=solo.

Reported per family:
  build_write_s  — the ONE-TIME ingest cost a deployment pays to compute
                   and write the partitioned index (amortized across all
                   future batches; not part of the per-batch A/B).
  recompute_s    — per-batch cost when the corpus side re-derives its
                   signatures/assignments from the raw source.
  stored_s       — per-batch cost when the corpus side is a parquet scan
                   of the stored index (decode-free / embedding-free).
  index_rows     — stored table cardinality (what future batches scan).

Timed runs are medians of 3 with cache cleared between runs; the stored
path's persisted capped tables are unpersisted after every run so no
iteration inherits another's cache.

Usage: python tools/stored_index_dial.py [sf_dir] [out.json] [families]
  families — comma list of simhash64,ivf,semantic,dhash,audio,video (default: all)
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

from platform_etl_openfda_faers_spark.operators import (  # noqa: E402
    dedup,
    multimodal,
    similarity,
)
from platform_etl_openfda_faers_spark.operators.cache import cached_deps  # noqa: E402
from platform_etl_openfda_faers_spark.sources import writers  # noqa: E402
from platform_etl_openfda_faers_spark.sources.readers import (  # noqa: E402
    load_table,
    scale_out,
)
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402


def _timed(spark, maker, iters: int = 3):
    runs, rows = [], None
    for _ in range(iters):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        res = maker()
        res.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 1))
        if rows is None:
            rows = res.count()
        for h in cached_deps(res):
            h.unpersist()
    return sorted(runs)[len(runs) // 2], runs, rows


def main() -> None:
    # --mixed (VERDICT r12 #3): the media harnesses' default content is
    # fixed-group mega-clusters, so at sf >= 1 the occupancy cap empties
    # every dHash/audio/video bucket and the stored dials measure only
    # the fold.  The mixed geometry keeps the mega-cluster head (the cap
    # still prunes it — that's the scale behavior under test) and adds a
    # SPARSE near-miss tail: per-200-id sub-groups of 4-8 docs whose
    # buckets survive the cap, so the capped pair join runs non-empty
    # at sf1/sf10.  Law-pinned against a Python replay in
    # tests/test_mixed_geometry.py.
    argv = [a for a in sys.argv[1:] if a != "--mixed"]
    mixed = "--mixed" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "testdata/sf10"
    out_path = argv[1] if len(argv) > 1 else ""
    families = set(
        (argv[2] if len(argv) > 2 else "simhash64,ivf,semantic,dhash,audio,video").split(",")
    )
    spark = get_spark(
        "stored-index-dial",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stored_index_dial_")
    out: dict[str, dict] = {"_inputs": {"sf_dir": sf_dir, "mode": "solo",
                                    "media_geometry": "mixed_tail" if mixed else "mega_cluster"}}
    try:
      if "simhash64" in families:
        # --- family 1: SimHash-64 chunk table over documents ---
        docs = scale_out(
            load_table(spark, sf_dir, "documents")
        ).select("doc_id", "text")
        new_docs = docs.where(F.col("doc_id") % 7 == 0)
        corpus_docs = docs.where(F.col("doc_id") % 7 != 0)
        sim_path = f"{tmp}/simhash64_index"
        t0 = time.time()
        writers.write_partitioned(
            dedup.simhash64_chunk_table(corpus_docs, "text", "doc_id"),
            sim_path,
            ["ci"],
        )
        sim_build = round(time.time() - t0, 1)
        sim_stored = spark.read.parquet(sim_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: dedup.simhash_near_duplicates_incremental64(
                new_docs, corpus_docs, "text", "doc_id"
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: dedup.simhash_near_duplicates_incremental64(
                new_docs, None, "text", "doc_id", corpus_index=sim_stored
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["simhash64"] = {
            "build_write_s": sim_build,
            "index_rows": sim_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "pair_rows": rec_rows,
        }
        print("simhash64", json.dumps(out["simhash64"]))

      if "ivf" in families:
        # --- family 2: IVF cell-assignment table over embeddings ---
        # ARITHMETIC PRE-CHECK (the standing rule): candidates are
        # |queries| x nprobe/k x |corpus|.  A %7 query split at sf10 is
        # ~1.15e10 pairs — a multi-hour exact-rerank.  The registry's
        # geometry (20 query vectors, the online-serving shape: small
        # batch vs big corpus) keeps it ~3e6; use exactly that.
        emb = scale_out(load_table(spark, sf_dir, "embeddings"))
        corpus = emb.where(F.col("vec_id") % 7 != 0)
        queries = emb.where(F.col("vec_id") < 20)
        cent = similarity.kmeans_centroids(corpus, k=8, iterations=2)
        # freeze trained centroids so neither timed path re-trains
        cent = spark.createDataFrame(cent.collect(), schema=cent.schema)
        ivf_path = f"{tmp}/ivf_index"
        t0 = time.time()
        writers.write_partitioned(
            similarity.ivf_index_table(corpus, cent), ivf_path, ["cell"]
        )
        ivf_build = round(time.time() - t0, 1)
        ivf_stored = spark.read.parquet(ivf_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: similarity.ivf_topk(
                corpus, queries, k=5, nprobe=3, centroids=cent
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: similarity.ivf_topk(
                None, queries, k=5, nprobe=3, centroids=cent,
                corpus_cells=ivf_stored,
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["ivf"] = {
            "build_write_s": ivf_build,
            "index_rows": ivf_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "topk_rows": rec_rows,  # 20-query serving batch
        }
        print("ivf", json.dumps(out["ivf"]))

      if "semantic" in families:
        # --- family 6 (r13, VERDICT r12 #5): semantic cells — the
        # embedding-ingest serving leg.  A/B semantic_near_duplicates_
        # incremental recomputing the corpus-side cell assignment vs
        # serving it from the STORED ivf_index_table (what the
        # emb_ingest loop maintains).  ARITHMETIC PRE-CHECK: candidates
        # are sum over cells of |batch ∩ cell| x |cell| — a %7 batch at
        # sf10 is ~4.5e9 cosines; the 200-vector ingest-batch shape
        # keeps it ~1.6e7.  Use exactly that (a micro-batch vs the big
        # corpus IS the ingest geometry).  Modulus split, not an id-range
        # one: kmeans seeds from the k LOWEST ids, so the corpus must
        # keep them.
        emb2 = scale_out(load_table(spark, sf_dir, "embeddings"))
        s_mod = max(2, emb2.count() // 200)
        s_corpus = emb2.where(F.col("vec_id") % s_mod != 1)
        s_batch = emb2.where(F.col("vec_id") % s_mod == 1)
        s_cent = similarity.kmeans_centroids(s_corpus, k=8, iterations=2)
        s_cent = spark.createDataFrame(s_cent.collect(), schema=s_cent.schema)
        sem_path = f"{tmp}/semantic_cells"
        t0 = time.time()
        writers.write_partitioned(
            similarity.ivf_index_table(s_corpus, s_cent), sem_path, ["cell"]
        )
        sem_build = round(time.time() - t0, 1)
        sem_stored = spark.read.parquet(sem_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: similarity.semantic_near_duplicates_incremental(
                s_batch, s_corpus, threshold=0.4, centroids=s_cent
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: similarity.semantic_near_duplicates_incremental(
                s_batch, None, threshold=0.4, centroids=s_cent,
                corpus_index=sem_stored,
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["semantic"] = {
            "build_write_s": sem_build,
            "index_rows": sem_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "pair_rows": rec_rows,
        }
        print("semantic", json.dumps(out["semantic"]))

      if "dhash" in families:
        # --- family 3 (r12, VERDICT r11 #2b): dHash image chunk table ---
        # The family where the stored index amortizes the MOST: the
        # corpus side of the stored run skips the Python/Arrow image
        # DECODE entirely (mapInPandas over image bytes), not just a
        # JVM signature fold.  Same geometry as the registry query:
        # perceptual BMP harness, batch = doc_id % 7 == 0.
        ids = scale_out(load_table(spark, sf_dir, "documents")).select(
            "doc_id"
        )
        if mixed:
            # head: the standard 50-group mega-cluster content; tail
            # (every 25th id): per-200-id sub-groups of 8 near-copies
            # (gids >= 50, disjoint from the head), deltas cycling 0..2
            tail = F.col("doc_id") % 25 == 0
            ids = ids.select(
                "doc_id",
                F.when(tail, F.lit(50) + (F.col("doc_id") / 200).cast("long"))
                .otherwise(F.col("doc_id") % 50)
                .alias("gid"),
                F.when(tail, (F.col("doc_id") / 25).cast("long") % 3)
                .otherwise((F.col("doc_id") / 50).cast("long") % 3)
                .alias("delta"),
            )

        def _hashes(pred):
            return multimodal.image_dhash(
                multimodal.synthetic_bmp_media_perceptual(
                    ids.where(pred), "doc_id", perturb=True,
                    seed_col="gid" if mixed else None,
                    offset_col="delta" if mixed else None,
                )
            )

        dh_path = f"{tmp}/dhash_index"
        t0 = time.time()
        writers.write_partitioned(
            multimodal.dhash_chunk_table(
                _hashes(F.col("doc_id") % 7 != 0)
            ),
            dh_path,
            ["ci"],
        )
        dh_build = round(time.time() - t0, 1)
        dh_stored = spark.read.parquet(dh_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: multimodal.dhash_near_duplicates_incremental(
                _hashes(F.col("doc_id") % 7 == 0),
                _hashes(F.col("doc_id") % 7 != 0),
                max_hamming=3,
                max_bucket_size=64,
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: multimodal.dhash_near_duplicates_incremental(
                _hashes(F.col("doc_id") % 7 == 0),
                None,
                max_hamming=3,
                max_bucket_size=64,
                corpus_index=dh_stored,
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["dhash"] = {
            "geometry": "mixed_tail" if mixed else "mega_cluster",
            "build_write_s": dh_build,
            "index_rows": dh_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "pair_rows": rec_rows,
        }
        print("dhash", json.dumps(out["dhash"]))

      if "audio" in families:
        # --- family 4 (r12): audio landmark-key table ---
        # The last heavy-fold incremental: the catalog side of the
        # stored run skips WAV synthesis/decode + FFT + the landmark
        # triangle (the 118-executor-second sf1 stage the operator's
        # cache note identifies).  Same geometry as the registry query:
        # tonal shifted-rendition harness, batch = doc_id % 7 == 0.
        a_base = scale_out(load_table(spark, sf_dir, "documents"))
        if mixed:
            # KEYSPACE-SCALED tail spacing (VERDICT r13 #5): the r12
            # fixed every-50th tail saturated the ~2.9k-key landmark
            # keyspace at sf10 (10k tail tracks -> mean occupancy ~62 ->
            # every tail bucket pruned, pair_rows 0).  The spacing now
            # follows the keyspace arithmetic in
            # multimodal.audio_tail_spacing — 50 at sf<=1 (r12 evidence
            # unchanged), 200 at sf10 — with sub-groups of 4 and
            # alternating offsets exactly as before.
            a_sp = multimodal.audio_tail_spacing(a_base.count())
            a_tail = F.col("doc_id") % a_sp == 0
            a_gid = F.when(
                a_tail,
                F.lit(1000) + (F.col("doc_id") / (4 * a_sp)).cast("long"),
            ).otherwise(F.col("doc_id") % 10)
            a_off = F.when(
                a_tail, (F.col("doc_id") / a_sp).cast("long") % 2
            ).otherwise((F.col("doc_id") / 10).cast("long") % 2)
        else:
            a_sp = None
            a_gid = F.col("doc_id") % 10
            a_off = (F.col("doc_id") / 10).cast("long") % 2
        adocs = a_base.select(
            "doc_id", a_gid.alias("gid"), a_off.alias("off")
        )

        def _peaks(pred):
            return multimodal.audio_spectral_peaks(
                multimodal.synthetic_wav_media_tonal(
                    adocs.where(pred), "doc_id", seed_col="gid",
                    offset_col="off",
                ),
                window=64,
            )

        au_path = f"{tmp}/landmark_index"
        t0 = time.time()
        writers.write_partitioned(
            multimodal.audio_landmark_table(
                _peaks(F.col("doc_id") % 7 != 0), max_dt=3
            ),
            au_path,
            ["dt"],
        )
        au_build = round(time.time() - t0, 1)
        au_stored = spark.read.parquet(au_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: multimodal.audio_landmark_matches_incremental(
                _peaks(F.col("doc_id") % 7 == 0),
                _peaks(F.col("doc_id") % 7 != 0),
                max_dt=3,
                min_matches=10,
                max_bucket_size=64,
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: multimodal.audio_landmark_matches_incremental(
                _peaks(F.col("doc_id") % 7 == 0),
                None,
                max_dt=3,
                min_matches=10,
                max_bucket_size=64,
                corpus_index=au_stored,
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["audio"] = {
            "geometry": "mixed_tail" if mixed else "mega_cluster",
            "tail_spacing": a_sp,
            "build_write_s": au_build,
            "index_rows": au_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "pair_rows": rec_rows,
        }
        print("audio", json.dumps(out["audio"]))

      if "video" in families:
        # --- family 5 (r12): video frame-chunk table ---
        # Amortizes the single heaviest fold in the repo: the container
        # walk + per-frame JPEG decode + frame dHash behind the video
        # near-dup family.  Same geometry as the registry query: grid
        # AVI harness, batch = media_id % 7 == 0; hash each side from
        # its OWN pre-split docs so the recompute path is the honest
        # production recompute (decode both sides), not the registry's
        # persisted-once harness shortcut.
        v_base = scale_out(load_table(spark, sf_dir, "documents"))
        if mixed:
            # KEYSPACE-SCALED tail spacing (r14): the 16-bit chunk
            # slices suggest a 65,536 keyspace, but the grid harness's
            # frame bits reduce the seed MOD 251 — only ~251 distinct
            # content classes exist, so a fixed every-25th tail
            # saturates the occupancy cap at sf10 (20k tail videos ->
            # ~80 rows/bucket -> pair_rows 0, measured).  Spacing now
            # follows multimodal.video_tail_spacing (25 at sf <= 1 —
            # r12 geometry unchanged — and 125 at sf10); sub-groups of
            # 8 with alternating offsets exactly as before.
            v_sp = multimodal.video_tail_spacing(v_base.count())
            v_tail = F.col("doc_id") % v_sp == 0
            v_gid = F.when(
                v_tail,
                F.lit(1000) + (F.col("doc_id") / (8 * v_sp)).cast("long"),
            ).otherwise(F.col("doc_id") % 10)
            v_off = F.when(
                v_tail, (F.col("doc_id") / v_sp).cast("long") % 2
            ).otherwise((F.col("doc_id") / 10).cast("long") % 2)
        else:
            v_sp = None
            v_gid = F.col("doc_id") % 10
            v_off = (F.col("doc_id") / 10).cast("long") % 2
        vdocs = v_base.select(
            "doc_id", v_gid.alias("gid"), v_off.alias("off")
        )

        def _vhashes(pred):
            return multimodal.video_frame_dhash(
                multimodal.synthetic_avi_media_grid(
                    vdocs.where(pred), "doc_id", seed_col="gid",
                    offset_col="off",
                )
            )

        vi_path = f"{tmp}/video_frame_index"
        t0 = time.time()
        writers.write_partitioned(
            multimodal.video_frame_chunk_table(
                _vhashes(F.col("doc_id") % 7 != 0)
            ),
            vi_path,
            ["ci"],
        )
        vi_build = round(time.time() - t0, 1)
        vi_stored = spark.read.parquet(vi_path)
        rec_m, rec_runs, rec_rows = _timed(
            spark,
            lambda: multimodal.video_near_duplicates_incremental(
                _vhashes(F.col("doc_id") % 7 == 0),
                _vhashes(F.col("doc_id") % 7 != 0),
                max_hamming=3,
                min_frames=2,
                max_bucket_size=64,
            ),
        )
        sto_m, sto_runs, sto_rows = _timed(
            spark,
            lambda: multimodal.video_near_duplicates_incremental(
                _vhashes(F.col("doc_id") % 7 == 0),
                None,
                max_hamming=3,
                min_frames=2,
                max_bucket_size=64,
                corpus_index=vi_stored,
            ),
        )
        assert rec_rows == sto_rows, (rec_rows, sto_rows)
        out["video"] = {
            "geometry": "mixed_tail" if mixed else "mega_cluster",
            "tail_spacing": v_sp,
            "build_write_s": vi_build,
            "index_rows": vi_stored.count(),
            "recompute_s": rec_m,
            "recompute_runs_s": rec_runs,
            "stored_s": sto_m,
            "stored_runs_s": sto_runs,
            "pair_rows": rec_rows,
        }
        print("video", json.dumps(out["video"]))

      print(json.dumps(out))
      if out_path:
          Path(out_path).write_text(json.dumps(out, indent=1))
          print(f"-> {out_path}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
