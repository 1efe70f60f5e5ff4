"""Physical-plan audits: assert the *plan shape* we want at 100 TB, not
just the result — pushdown reaches the parquet scan, small dims broadcast,
the range join never degenerates to a nested loop, and per-query shuffle
counts stay bounded.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.plans import benchmarks


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    """Filter must reach the parquet scan; scan must read only the 7
    needed columns, not all 11."""
    plan = plan_of(benchmarks.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read, read
    assert "l_quantity" in read and "l_shipdate" in read, read


def test_q3_broadcasts_small_dims(spark, sf_dir):
    """Multi-join analytics: the small sides must broadcast (no shuffle of
    the fact table for dim joins)."""
    plan = plan_of(benchmarks.q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_blacklist_anti_join_is_broadcast(spark, sf_dir):
    plan = plan_of(benchmarks.j1_blacklist_anti(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """The bin trick must plan as an equi hash/sort-merge join; a naive
    range condition would show BroadcastNestedLoopJoin / CartesianProduct."""
    plan = plan_of(benchmarks.j_range_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_frames_suite_single_shuffle(spark, sf_dir):
    """All three window frames hash-partition by user_id — one Exchange
    for the whole suite (plus none for the scan)."""
    import re

    plan = plan_of(benchmarks.w_frames_suite(spark, sf_dir))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan


def test_minhash_signatures_map_only(spark, sf_dir):
    """Row-local MinHash signatures must be a map-only plan: zero
    exchanges between the scan and the signature projection."""
    from platform_etl_openfda_faers_spark.operators import dedup
    from platform_etl_openfda_faers_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures_local(docs, "text", "doc_id")
    plan = plan_of(sigs)
    assert "Exchange" not in plan, plan


def test_click_purchase_batch_plan_is_binned_equi_join(spark, sf_dir):
    """The batch attribution join must ride the binned interval join: an
    equi hash join on (user_id, time-bin), never a per-user nested re-check
    of the range conjunct (hot users degenerate to O(clicks*purchases))."""
    plan = plan_of(benchmarks.stream_interval_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "_bin" in plan, plan


def test_dedup_clusters_pair_graph_not_cartesian(spark, sf_dir):
    """The cluster edge list must come from LSH bucket co-occupancy (an
    equi-join on (table, bucket)), never an all-pairs cross join with a
    post-filter — the r3 scale-killer."""
    from platform_etl_openfda_faers_spark.operators import similarity
    from platform_etl_openfda_faers_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = similarity.cosine_near_duplicates(
        emb, threshold=0.4, id_col="vec_id", vec_col="embedding",
        n_planes=8, n_tables=4, seed=42,
    )
    plan = plan_of(pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
