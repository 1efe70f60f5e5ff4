"""Bloom-prefilter join: exactness vs the plain join, no false negatives,
bounded false-positive rate, NULL-key safety, and the 100 TB plan shape
(the getbit probe filter must run BELOW the join's shuffle)."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.operators import bloom
from platform_etl_openfda_faers_spark.plans import benchmarks
from platform_etl_openfda_faers_spark.sources.readers import load_table


def test_bloom_join_equals_plain_join(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    got = bloom.bloom_prefilter_join(
        orders, cust, probe_key="o_custkey", build_key="c_custkey"
    )
    want = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        got.columns
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0  # the fixture subset actually matches something


def test_no_false_negatives_on_build_keys(spark, sf_dir):
    """Every build-side key must pass its own filter — Bloom guarantees no
    false negatives by construction; this pins the sign-fold and the
    1-based element_at indexing."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    bitmap = bloom.build_bloom_bitmap(cust, "c_custkey")
    n_total = cust.count()
    n_pass = cust.where(
        bloom.might_contain(F.col("c_custkey"), bitmap, 1 << 17)
    ).count()
    assert n_pass == n_total


def test_false_positive_rate_bounded(spark, sf_dir):
    """Keys disjoint from the build set should almost never pass: with
    m=2^17 bits, k=5 and the fixture's ~150 build keys, the theoretical FP
    rate is << 1%; assert a loose 2% ceiling."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    bitmap = bloom.build_bloom_bitmap(cust, "c_custkey")
    # probe with keys shifted far outside the build key range
    probe = spark.range(1_000_000, 1_010_000).select(
        F.col("id").alias("k")
    )
    fp = probe.where(bloom.might_contain(F.col("k"), bitmap, 1 << 17)).count()
    assert fp / 10_000 < 0.02, fp


def test_null_keys_match_plain_join(spark):
    """NULL probe keys may or may not pass the bitmap (xxhash64 of NULL is
    seed-dependent) but must never survive the final equi-join — exactly
    like the plain join."""
    probe = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="b"), Row(k=2, v="c"), Row(k=None, v="d")]
    )
    build = spark.createDataFrame([Row(bk=1, w="x"), Row(bk=None, w="y")])
    got = bloom.bloom_prefilter_join(probe, build, probe_key="k", build_key="bk")
    assert sorted(map(tuple, got.collect())) == [(1, "a", 1, "x")]


def test_self_join_same_key_name_not_ambiguous(spark):
    """Shared lineage + identical key names: the aliasing must keep the
    join resolvable and drop the duplicated build-side key column."""
    df = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    out = bloom.bloom_prefilter_join(df, df, probe_key="k", build_key="k")
    assert out.columns.count("k") == 1
    assert out.count() == 2


def test_probe_filter_below_exchange(spark, sf_dir):
    """The whole point at 100 TB: the bitmap predicate must execute on the
    probe side BEFORE its shuffle.  Formatted-plan node ids are assigned
    bottom-up, so the getbit Filter's id must be smaller than some Exchange
    above it (broadcast disabled to force a shuffle join)."""
    import contextlib
    import io

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            benchmarks.j_bloom_prefilter(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # carve the details section into per-node slices so getbit is attributed
    # to the right Filter node
    headers = list(re.finditer(r"\((\d+)\) (\w+)", plan))
    filter_ids = []
    for i, h in enumerate(headers):
        if h.group(2) == "Filter":
            end = headers[i + 1].start() if i + 1 < len(headers) else len(plan)
            if "getbit" in plan[h.start():end]:
                filter_ids.append(int(h.group(1)))
    exchange_ids = [int(h.group(1)) for h in headers if h.group(2) == "Exchange"]
    assert filter_ids, plan
    # node ids are assigned bottom-up: the probe filter must sit below
    # (smaller id than) at least one Exchange
    assert exchange_ids and any(e > min(filter_ids) for e in exchange_ids), plan
