"""Stratified sampling side-output (A5, J6, J7).

Reference: ``stage/StratifiedSampling.scala`` — sample 10% of significant
results and 10% of all cleaned rows, full-outer-merge their ChEMBL id sets,
pull every cleaned row for those ids, then emit the raw reports for the
sampled report ids.

Fixes two reference quirks (SURVEY §2.10): #2 — ``sample()`` is seeded here;
#4 — the reference stamps ``seriousnessdeath = lit(1)`` onto every sampled
raw report, which would make the sample unusable as pipeline input (the
death filter would drop everything); we preserve original fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample_ids(
    significant: DataFrame,
    all_clean: DataFrame,
    fraction: float = 0.1,
    seed: int = 42,
    key: str = "chembl_id",
) -> DataFrame:
    """Union-of-sampled-key-sets via full-outer join + coalesce (J6)."""
    a = significant.select(key).distinct().sample(fraction=fraction, seed=seed)
    b = all_clean.select(key).distinct().sample(fraction=fraction, seed=seed + 1)
    return (
        a.withColumnRenamed(key, "a_key")
        .join(b.withColumnRenamed(key, "b_key"), F.col("a_key") == F.col("b_key"), "full_outer")
        .select(F.coalesce(F.col("a_key"), F.col("b_key")).alias(key))
        .distinct()
    )


def sample_clean_rows(all_clean: DataFrame, sampled_ids: DataFrame, key: str = "chembl_id") -> DataFrame:
    """J7 — keep cleaned rows whose key is in the sampled id set.

    Expressed as ``left_semi`` (the reference uses an inner join against a
    deduped key list — semi-join by intent, SURVEY §2.4 J7); semi avoids
    duplicating rows if the id list ever carries duplicates and lets Spark
    broadcast the small side.
    """
    return all_clean.join(F.broadcast(sampled_ids), [key], "left_semi")


def sample_raw_reports(
    raw: DataFrame, sampled_clean: DataFrame, report_key: str = "safetyreportid"
) -> DataFrame:
    """Raw reports for the sampled report ids — original fields preserved."""
    ids = sampled_clean.select(report_key).distinct()
    return raw.join(F.broadcast(ids), [report_key], "left_semi")
