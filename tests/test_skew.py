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
