"""Dedup-at-ingest: the production loop that composes the STORED
signature index with Structured Streaming micro-batches (VERDICT r11 #3).

Shape: ``foreachBatch`` ingest -> near-dup check against the stored
simhash64 chunk index (``corpus_index=`` serving path — the corpus text
is NEVER re-read; each batch pays the signature fold only for its own
docs) -> append the ACCEPTED docs and their chunk rows back to the
index.  The index is the loop's only cross-batch state, so a duplicate
arriving in a later batch is caught by the index UPDATE, not by a
rescan of previously ingested documents.

Acceptance rule (declarative keep-lowest, the same canonicalization the
batch curation pipeline uses — "drop the higher id of each pair"):
a batch doc is REJECTED iff it near-dups an INDEXED doc (one accepted by
an earlier batch), or a lower-id doc in the SAME batch.  Greedy
consequence, by design: a doc whose only near-dup partner was itself
rejected (and thus never indexed) is ACCEPTED — the index holds the
canonical survivors, exactly like a batch keep-list.

Idempotency: each batch's appends land under ``ingest_batch=<id>``
partition directories with per-directory overwrite — an at-least-once
replay of a batch WITHIN the same checkpoint lineage rewrites the same
directories instead of duplicating rows (the
``write_stream_idempotent_parquet`` discipline).

THE CHECKPOINT IS LOAD-BEARING DEDUP STATE (ADVICE r12): batch ids are
monotonic only within one checkpoint lineage.  After checkpoint LOSS,
``availableNow`` re-groups all source files into fresh batch ids
(typically one big batch 0), which would rewrite ``ingest_batch=0`` but
leave the stale ``ingest_batch=1..N`` partitions from the lost lineage
in both the index and accepted paths — duplicate doc ids.  Losing the
checkpoint therefore requires clearing ``index_path`` and
``accepted_path`` too; :func:`dedup_ingest_batch` detects the telltale
regression (batch id 0 arriving while the index already holds higher
``ingest_batch=`` partitions) and fails loudly instead of corrupting
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from ..operators import dedup


def _keep_lowest_accept(
    batch: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Apply the keep-lowest acceptance rule to a batch given its
    near-dup pair list (``id_a < id_b`` rows against batch ∪ index):
    classify each pair side as batch or indexed-corpus, then a
    within-batch pair drops the higher id and a pair with an indexed doc
    drops the batch side unconditionally (the indexed doc was accepted
    first).  Pure joins — no driver loop."""
    bids = batch.select(F.col(id_col).alias("_bid")).distinct()
    fl = pairs.join(
        bids.select(
            F.col("_bid").alias("id_a"), F.lit(True).alias("_a_batch")
        ),
        ["id_a"],
        "left",
    ).join(
        bids.select(
            F.col("_bid").alias("id_b"), F.lit(True).alias("_b_batch")
        ),
        ["id_b"],
        "left",
    )
    rejected = (
        fl.select(
            F.when(
                F.col("_a_batch").isNotNull() & F.col("_b_batch").isNotNull(),
                F.greatest("id_a", "id_b"),
            )
            .when(F.col("_a_batch").isNotNull(), F.col("id_a"))
            .when(F.col("_b_batch").isNotNull(), F.col("id_b"))
            .alias(id_col)
        )
        .where(F.col(id_col).isNotNull())
        .distinct()
    )
    return batch.join(rejected, [id_col], "left_anti")


def dedup_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    accepted_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> None:
    """Process ONE ingest micro-batch against the stored signature index.

    Steps: (1) serve the near-dup check from the stored index
    (``corpus_index=`` — decode-free corpus side; first batch ever uses
    an empty corpus), (2) apply the keep-lowest acceptance rule,
    (3) append accepted docs to ``accepted_path`` and their
    ``simhash64_chunk_table`` rows to ``index_path``, both under an
    ``ingest_batch=<id>`` partition directory (idempotent replay).
    """
    spark = batch.sparkSession
    # the try guards ONLY the index read (ADVICE r12: a broader scope
    # silently swallowed AnalysisExceptions raised by the dedup operator
    # itself — a renamed index column or bad text_col/id_col would have
    # been treated as "first batch, empty corpus" and duplicates
    # accepted); operator errors must propagate loudly.
    try:
        stored = spark.read.parquet(index_path)
    except AnalysisException:
        stored = None  # no index yet: first batch ever
    if stored is not None and batch_id == 0:
        # batch id 0 with a non-empty index = checkpoint-loss replay (or
        # a reused index path): the lost lineage's ingest_batch=1..N
        # partitions would survive alongside a rewritten batch 0 and
        # duplicate doc ids — refuse instead of corrupting the corpus.
        raise ValueError(
            f"dedup ingest: batch id 0 arrived but {index_path} already "
            "holds an index — the checkpoint was lost or the index path "
            "is being reused.  The checkpoint is load-bearing dedup "
            "state: clear index_path and accepted_path before replaying "
            "from scratch."
        )
    if stored is not None:
        pairs = dedup.simhash_near_duplicates_incremental64(
            batch,
            None,
            text_col,
            id_col,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
            corpus_index=stored,
        )
    else:
        empty = spark.createDataFrame(
            [], batch.select(id_col, text_col).schema
        )
        pairs = dedup.simhash_near_duplicates_incremental64(
            batch,
            empty,
            text_col,
            id_col,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        )
    accepted = _keep_lowest_accept(batch, pairs, id_col)
    # materialize ONCE: the two writes below would otherwise re-run the
    # batch-side signature fold + index join per sink
    accepted = accepted.persist()
    try:
        accepted.write.mode("overwrite").parquet(
            f"{accepted_path}/ingest_batch={batch_id}"
        )
        dedup.simhash64_chunk_table(accepted, text_col, id_col).write.mode(
            "overwrite"
        ).partitionBy("ci").parquet(f"{index_path}/ingest_batch={batch_id}")
    finally:
        accepted.unpersist()


def start_dedup_ingest(
    docs_stream: DataFrame,
    index_path: str,
    accepted_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> StreamingQuery:
    """Wire :func:`dedup_ingest_batch` into a ``foreachBatch`` sink with
    an ``availableNow`` trigger: each run drains the currently-available
    files as micro-batches, deduping every batch against the index built
    by all earlier batches (across runs too — the checkpoint carries the
    source offsets, the index parquet carries the dedup state)."""

    def _handle(batch: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(
            batch,
            batch_id,
            index_path,
            accepted_path,
            text_col=text_col,
            id_col=id_col,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        )

    return (
        docs_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def emb_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    cells_path: str,
    accepted_path: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    score_decimals: int = 6,
) -> None:
    """Process ONE embedding ingest micro-batch against the stored IVF
    cell index — the embedding-family twin of :func:`dedup_ingest_batch`
    (VERDICT r12 #5).

    Steps: (1) semantic near-dup check served from the stored
    cell-assignment table (``corpus_index=`` — no corpus embedding
    source read; the batch pays only its own map-only assignment under
    the FROZEN ``centroids``), (2) keep-lowest acceptance, (3) append
    accepted vectors to ``accepted_path`` and their
    :func:`ivf_index_table` cell rows to ``cells_path``, both under
    ``ingest_batch=<id>`` partition directories (idempotent replay
    within one checkpoint lineage).  The centroid fingerprint rides
    every appended row, so a later serve with drifted centroids fails
    loudly.  Same checkpoint-loss guard as the text loop: the
    checkpoint is load-bearing dedup state."""
    from ..operators import similarity

    spark = batch.sparkSession
    try:
        stored = spark.read.parquet(cells_path)
    except AnalysisException:
        stored = None  # no index yet: first batch ever
    if stored is not None and batch_id == 0:
        raise ValueError(
            f"embedding ingest: batch id 0 arrived but {cells_path} "
            "already holds an index — the checkpoint was lost or the "
            "index path is being reused.  The checkpoint is load-bearing "
            "dedup state: clear cells_path and accepted_path before "
            "replaying from scratch."
        )
    if stored is not None:
        pairs = similarity.semantic_near_duplicates_incremental(
            batch,
            None,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            score_decimals=score_decimals,
            centroids=centroids,
            corpus_index=stored,
        )
    else:
        empty = spark.createDataFrame(
            [], batch.select(id_col, vec_col).schema
        )
        pairs = similarity.semantic_near_duplicates_incremental(
            batch,
            empty,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            score_decimals=score_decimals,
            centroids=centroids,
        )
    accepted = _keep_lowest_accept(batch, pairs, id_col)
    # materialize ONCE: the two writes below would otherwise re-run the
    # batch-side assignment + stored-index join per sink
    accepted = accepted.persist()
    try:
        accepted.write.mode("overwrite").parquet(
            f"{accepted_path}/ingest_batch={batch_id}"
        )
        similarity.ivf_index_table(
            accepted, centroids, id_col=id_col, vec_col=vec_col,
            score_decimals=score_decimals,
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{cells_path}/ingest_batch={batch_id}"
        )
    finally:
        accepted.unpersist()


def start_emb_ingest(
    vec_stream: DataFrame,
    cells_path: str,
    accepted_path: str,
    checkpoint: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    score_decimals: int = 6,
) -> StreamingQuery:
    """Wire :func:`emb_ingest_batch` into a ``foreachBatch`` sink with an
    ``availableNow`` trigger — the embedding-index maintenance loop:
    each run drains the currently-available vector files as
    micro-batches, semantic-dedupes every batch against the cell index
    built by all earlier batches under FROZEN centroids (trained once at
    bootstrap — retraining mid-stream would desync the stored
    assignments, which the centroid fingerprint would then catch), and
    appends accepted vectors' cell rows.  The checkpoint carries source
    offsets; the cells parquet carries the dedup state."""

    def _handle(batch: DataFrame, batch_id: int) -> None:
        emb_ingest_batch(
            batch,
            batch_id,
            cells_path,
            accepted_path,
            centroids,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            score_decimals=score_decimals,
        )

    return (
        vec_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
