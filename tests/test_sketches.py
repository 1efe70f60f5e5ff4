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
