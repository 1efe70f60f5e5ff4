"""Unit tests: text-analysis column expressions (word n-grams, repetition
ratio) — the row-local quality-signal primitives."""

from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.functions.text import (
    repetition_ratio,
    word_ngrams,
)


def test_word_ngrams_keeps_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y"), (3, "one two three")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b a", "b a b", "a b a", "b a b"]  # multiset
    assert got[2] == []  # too short
    assert got[3] == ["one two three"]


def test_repetition_ratio_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all distinct words here now"), (3, "x")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.rr
        for r in df.select(
            "doc_id", repetition_ratio(F.col("text"), 3).alias("rr")
        ).collect()
    }
    assert got[1] == 0.5          # 4 grams, 2 distinct
    assert got[2] == 0.0          # no repeats
    assert got[3] is None         # under 3 tokens -> no signal
