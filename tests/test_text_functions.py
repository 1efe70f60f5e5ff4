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


def test_mix_allocation_threshold_portability(spark, sf_dir):
    """The property that makes corpus_mix_allocation's report row usable
    on ANY engine: per language, selecting docs by ``h <= hash_threshold``
    reproduces EXACTLY the quota-bounded prefix the operator counted —
    same kept_docs, same kept_tokens — and the selection is maximal
    (kept mass <= quota, and the next doc in hash order would exceed it).
    """
    from platform_etl_openfda_faers_spark.plans.benchmarks import (
        _MIX_SEED,
        corpus_mix_allocation,
    )
    from platform_etl_openfda_faers_spark.functions.text import (
        token_hash64,
        tokens,
    )
    from platform_etl_openfda_faers_spark.operators.cache import cached_deps

    report = corpus_mix_allocation(spark, sf_dir)
    rows = {r.lang: r for r in report.collect()}
    assert rows, "allocation must cover at least one language"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    perdoc = docs.select(
        "lang",
        F.size(F.filter(tokens(F.col("text")), lambda t: t != ""))
        .cast("long")
        .alias("n_tok"),
        token_hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SEED))
        ).alias("h"),
    ).collect()

    for lang, r in rows.items():
        pool = sorted(
            (p.h, p.n_tok) for p in perdoc if p.lang == lang
        )
        # the threshold selection == the operator's counts
        sel = [t for h, t in pool if r.hash_threshold is not None
               and h <= r.hash_threshold]
        assert len(sel) == r.kept_docs, (lang, len(sel), r.kept_docs)
        assert sum(sel) == r.kept_tokens, (lang, sum(sel), r.kept_tokens)
        # quota law: within budget, and maximal in hash order
        assert r.kept_tokens <= r.token_quota, (lang, r)
        nxt = [t for h, t in pool if r.hash_threshold is None
               or h > r.hash_threshold]
        if nxt:
            assert r.kept_tokens + nxt[0] > r.token_quota, (lang, r)
    # total kept mass tracks the 40% budget apportionment
    total = sum(r.total_tokens for r in rows.values())
    kept = sum(r.kept_tokens for r in rows.values())
    assert kept <= (2 * total) // 5
    for h in cached_deps(report):
        h.unpersist()
