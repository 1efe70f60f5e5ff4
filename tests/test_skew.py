"""Salted join / salted distinct must be invisible in results — semantics
identical to the plain operators, checked row-for-row."""

from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.operators import skew
from platform_etl_openfda_faers_spark.sources.readers import load_table


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = li.join(part, ["p_partkey"]).select("p_partkey", "l_orderkey", "p_brand")
    salted = skew.salted_join(li, part, on="p_partkey", salt=4).select(
        "p_partkey", "l_orderkey", "p_brand"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_equals_plain(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "v"]
    )
    small = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "w"])
    plain = big.join(small, ["k"], "left")
    salted = skew.salted_join(big, small, on="k", how="left", salt=4)
    assert _sorted_rows(salted.select("k", "v", "w")) == _sorted_rows(
        plain.select("k", "v", "w")
    )


def test_salted_join_duplicate_small_keys(spark):
    """Multiplicity must be preserved: 2 matches on the small side -> 2 rows."""
    big = spark.createDataFrame([(1, "a")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (1, "y")], ["k", "w"])
    out = skew.salted_join(big, small, on="k", salt=4)
    assert out.count() == 2


def test_salted_count_distinct_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    expected = _sorted_rows(
        li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("n_distinct")
        )
    )
    got = _sorted_rows(
        skew.salted_count_distinct(li, "l_returnflag", "l_orderkey", salt=4)
    )
    assert got == expected


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ approx counts stay within ~3 rsd of exact (default rsd 0.05)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 500)
    w = Window.partitionBy("l_partkey")
    both = li.select(
        "l_partkey",
        F.approx_count_distinct("l_orderkey").over(w).alias("approx"),
        F.size(F.collect_set("l_orderkey").over(w)).alias("exact"),
    ).distinct()
    bad = both.where(
        F.abs(F.col("approx") - F.col("exact")) > 0.15 * F.col("exact") + 1
    )
    assert bad.count() == 0


def test_aqe_skew_join_splits_hot_partition(spark):
    """SURVEY §7 hard part (d): demonstrate that AQE's skew-join actually
    splits a hot-key partition on this engine's session settings — the
    runtime complement to the explicit ``salted_join``.

    A 10:1-skewed big side (one hot key) sort-merge-joins a non-broadcast
    dim; with the skew thresholds scaled to the fixture size, the FINAL
    adaptive plan must carry the ``skew=true`` marker on the join and a
    ``skewed`` AQEShuffleRead.  Two operational caveats this test pins
    down: (1) the split only happens when the join's own plan executes —
    a downstream aggregate suppresses it unless
    ``forceOptimizeSkewedJoin`` is set, which is exactly when the explicit
    ``salted_join`` remains the right tool; (2) broadcast joins never
    skew-split (there is no shuffle), so the dim side must exceed the
    broadcast threshold or have it disabled.
    """
    import contextlib
    import io

    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        pad = F.sha2(F.col("id").cast("string"), 256)
        hot = spark.range(0, 150_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v"), pad.alias("pad")
        )
        tail = spark.range(0, 15_000).select(
            (F.col("id") % 1000 + 1).alias("k"),
            F.col("id").alias("v"),
            pad.alias("pad"),
        )
        big = hot.union(tail)
        small = spark.range(0, 1001).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        joined = big.join(small, ["k"]).select("k", "v", "w")
        n = len(joined.collect())  # executes THIS plan -> final AQE plan
        assert n == 165_000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead: "coalesced and skewed"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
