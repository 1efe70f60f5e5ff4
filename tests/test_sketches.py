"""Error-bound tests for the sketch family (Count-Min / GK quantiles /
freqItems).  Sketch binaries are engine-specific so there is no DuckDB
twin; the published error guarantees ARE the contract being tested."""

from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.functions import sketches
from platform_etl_openfda_faers_spark.sources.readers import load_table


def test_count_min_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(truth.values())
    eps = 0.01
    est = sketches.count_min_estimate(
        ev, "event_type", list(truth), eps=eps, confidence=0.99
    )
    for item, true_n in truth.items():
        # CMS never underestimates; overestimate bounded by eps*N w.h.p.
        assert est[item] >= true_n, item
        assert est[item] <= true_n + eps * n_total, (item, est[item], true_n)


def test_approx_quantile_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n = li.count()
    rel_err = 0.01
    got = sketches.approx_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.9], rel_err)
    for p, q in zip([0.25, 0.5, 0.9], got):
        # GK guarantee: the returned value's true rank is within rel_err*N
        # of the target rank
        rank = li.where(F.col("l_extendedprice") <= q).count()
        assert abs(rank - p * n) <= rel_err * n + 1, (p, q, rank, n)


def test_freq_items_no_false_negatives(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    support = 0.05
    truth = {
        r.event_type
        for r in ev.groupBy("event_type").count().where(F.col("count") > support * n).collect()
    }
    got = set(sketches.frequent_items(ev, ["event_type"], support)["event_type"])
    # every true heavy hitter must be present (false positives tolerated)
    assert truth <= got, (truth, got)


def test_hll_portable_within_error_bound(spark):
    """The portable HLL's estimate lands within ~3 standard errors
    (sigma ~= 1.04/sqrt(64) ~= 13%) of the true distinct count, and the
    registers/estimate are identical under repartitioning (mergeable
    max-aggregate + exact integer harmonic sum)."""
    from pyspark.sql import functions as F

    from platform_etl_openfda_faers_spark.functions.sketches import (
        hll_portable_estimate,
    )

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("k"), F.lit("g").alias("grp")
    )
    est = hll_portable_estimate(df, "k", "grp").collect()[0].hll_est
    assert abs(est / n - 1.0) < 0.4, est

    est2 = (
        hll_portable_estimate(df.repartition(17), "k", "grp")
        .collect()[0]
        .hll_est
    )
    assert est2 == est  # partition-layout independence, bit-exact


def test_kmv_estimate_bounds_and_exactness(spark):
    """KMV estimate within ~3 standard errors (sigma ~= 1/sqrt(k-2) ~= 6.3%
    at k=256) of the true cardinality; an UNFILLED sketch is exact; the
    registers are partition-layout independent (distinct + global bottom-k)."""
    from pyspark.sql import functions as F

    k = 256
    rows = [(0, i) for i in range(5000)] + [(9, i) for i in range(50)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    regs = sketches.kmv_hashes(df, "key", "grp", k=k)
    est = {r.grp: r.kmv_est for r in sketches.kmv_estimate(regs, k=k).collect()}
    assert abs(est[0] / 5000 - 1.0) < 0.2, est
    assert est[9] == 50.0  # unfilled -> exact

    regs2 = sketches.kmv_hashes(df.repartition(13), "key", "grp", k=k)
    a = sorted(map(tuple, regs.collect()))
    b = sorted(map(tuple, regs2.collect()))
    assert a == b  # layout-independent, bit-exact


def test_kmv_pair_overlap_estimates(spark):
    """Union/intersection estimates land within ~4 sigma of truth on two
    half-overlapping sets, and degenerate EXACTLY when both sketches are
    unfilled (theta = 2^60 -> the intersection sample IS the intersection)."""
    k = 256
    rows = [(0, i) for i in range(3000)] + [(1, i) for i in range(2000, 6000)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    regs = sketches.kmv_hashes(df, "key", "grp", k=k)
    ov = sketches.kmv_pair_overlap(regs, k=k).collect()[0]
    assert abs(ov.est_union / 6000 - 1.0) < 0.25, ov
    # intersection variance is higher (smaller sample below theta)
    assert abs(ov.est_inter / 1000 - 1.0) < 0.5, ov

    small = [(0, i) for i in range(100)] + [(1, i) for i in range(60, 160)]
    sdf = spark.createDataFrame(small, ["grp", "key"])
    sregs = sketches.kmv_hashes(sdf, "key", "grp", k=k)
    sov = sketches.kmv_pair_overlap(sregs, k=k).collect()[0]
    assert sov.est_a == 100.0 and sov.est_b == 100.0
    assert sov.est_union == 160.0 and sov.est_inter == 40.0
