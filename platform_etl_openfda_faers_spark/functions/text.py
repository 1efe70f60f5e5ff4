"""Text-analysis column expressions (beyond-reference surface).

Training-data-pipeline text ops: tokenization, token stats, language ID
(stopword-hit heuristic), quality scoring, document fingerprinting.  All are
built-in-function compositions (JVM-side, codegen-friendly) — no Python in
the hot path.  Each has an exact ANSI-SQL twin used by the DuckDB oracle, so
the semantics are pinned down to the regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small: the point is the Spark plumbing (explode /
# array_filter / argmax), not linguistic quality.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "les", "des"),
}


def tokens(c: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text.

    SQL twin: ``regexp_split_to_array(trim(lower(c)), '\\s+')``.
    """
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def stopword_hits(toks: Column, lang: str) -> Column:
    """# tokens that are stopwords of ``lang`` (with repeats — not a set op).

    SQL twin: ``len(list_filter(toks, t -> t IN (...)))``.
    """
    words = list(STOPWORDS[lang])
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def punct_count(c: Column) -> Column:
    """# punctuation chars ``.,;:!?`` — length delta after regexp strip."""
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def quality_features(c: Column) -> dict[str, Column]:
    """Quality-scoring feature set: lengths, ratios (all codegen exprs)."""
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "mean_token_len": (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / n_tok
        ),
        "punct_ratio": punct_count(c) / n_char,
        "stopword_ratio": stopword_hits(toks, "en") / n_tok,
    }


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-collapsed,
    lowercased, trimmed text.  SQL twin: ``md5(...)`` with the same regex.
    """
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)


def token_hash64(tok: Column) -> Column:
    """Portable 60-bit token hash: first 15 hex chars of md5, base-16.

    Chosen because both Spark (``conv``) and DuckDB (hex cast) can compute
    it identically — the primitive under the oracle-checkable MinHash and
    SimHash implementations.  15 hex chars < 2^60 so the bigint never
    overflows.  The Spark-only fast path is ``xxhash64`` (see dedup.py).
    """
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Row-local word n-gram array WITH duplicates (the multiset form —
    ``dedup.shingle_array`` is the distinct-set form).  Duplicates carry
    the repetition signal quality scoring needs.  This is the ONE
    sliding-window gram expression — the dedup index/set-size forms derive
    from it, so Spark and every oracle twin share a single definition.

    SQL twin: ``list_transform(generate_series(1, greatest(len(t)-n+1, 0)),
    i -> t[i] || ' ' || ... )`` over the tokens array.  The empty-string
    filter below only matters for ``n=1`` (an empty-text tokenization is
    ``['']``; for n >= 2 every gram contains a separator) — an ``n=1``
    oracle twin must add ``list_filter(.., x -> x <> '')`` to match.
    """
    toks = tokens(c)
    # guard: sequence(1, 0) would DESCEND in Spark, so short docs get an
    # explicit empty array instead
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.filter(grams, lambda s: s != "")


def repetition_ratio(c: Column, n: int = 3) -> Column:
    """Repeated-n-gram fraction: 1 - distinct/total word n-grams.

    The canonical boilerplate/spam signal of LLM corpus curation — high
    values mean the document repeats itself.  Entirely row-local (array
    exprs, no explode/shuffle): a map-only scan at any corpus size.
    NULL for documents with no n-gram (fewer than ``n`` tokens).
    """
    grams = word_ngrams(c, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    )
