"""Cache-lifetime contract (r6 VERDICT #6): every registry query that
persists intermediates must attach handles so ``unpersist_cached``
leaves the SQL cache EMPTY — no reliance on the runner's global
clearCache.  The full-registry proof runs in
``tools/check_correctness.py`` (``_cache_lifetime`` in the committed
CORRECTNESS_LOCAL JSON); this pytest pins the contract in CI on the
known-persisting representatives of each operator family.
"""

from __future__ import annotations

import pytest

from platform_etl_openfda_faers_spark.operators.cache import (
    cached_deps,
    unpersist_cached,
)

PERSISTING_QUERIES = [
    "faers_llr",                  # contingency pair table (cache_input)
    "dedup_ngram_jaccard_capped",  # pruned inverted index
    "dedup_jaccard_prefix",        # shingle arrays + prefix table
    "corpus_curation_pipeline",    # feats + survivors + pruned index
    "graph_pagerank",              # edges + node list
    "emb_pq_adc_topk",             # trained codebooks
]


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", PERSISTING_QUERIES)
def test_query_releases_all_caches_via_handles(spark, sf_dir, name):
    from platform_etl_openfda_faers_spark.plans import benchmarks

    spark.catalog.clearCache()  # isolate from other tests
    assert _sql_cache_empty(spark)
    df = benchmarks.SPARK_QUERIES[name](spark, sf_dir)
    assert len(df.collect()) > 0
    assert len(cached_deps(df)) > 0, f"{name} should attach cache handles"
    released = unpersist_cached(df)
    assert released > 0
    assert _sql_cache_empty(spark), (
        f"{name} left SQL-cached tables behind after unpersist_cached"
    )
    # second release is a safe no-op
    assert unpersist_cached(df) == 0
