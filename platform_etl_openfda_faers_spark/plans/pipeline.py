"""End-to-end FAERS pipeline composer (reference: ``ETL.scala`` +
``stage/OpenFdaEtl.scala:16-55``).

Dataflow (SURVEY §3.2):

    load_chembl_drug_list  ─┐
    load_fda_reports ──> explode_reports ──> anti_join_blacklist ──> J2
        ──> contingency_llr (exact A/B/C/D + llr) ──> meddra codes (or stub)
        ──> persist  ──┬──> writers ("Unfiltered" stage-1 output)
                       └──> monte_carlo_filter ──> persist ──> writers

Persist placement mirrors the reference (``stage/OpenFdaEtl.scala:43,47``,
``ETL.scala:27``): stage-1 feeds both the writers and the MC stage, and the
MC stage scans its input twice (groupBy + join-back), so both are persisted
MEMORY_AND_DISK.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig, SamplingConfig
from ..operators.contingency import contingency_llr
from ..operators.drugmap import map_to_chembl
from ..operators.filters import anti_join_blacklist
from ..operators.flatten import explode_reports
from ..operators.meddra import add_meddra_codes, stub_meddra_code
from ..operators.montecarlo import monte_carlo_filter
from ..operators.sampling import (
    sample_clean_rows,
    sample_raw_reports,
    stratified_sample_ids,
)
from ..sources import readers, writers


def clean_pairs(
    reports: DataFrame, drug_list: DataFrame, blacklist: DataFrame
) -> DataFrame:
    """Cleaned (report, drug, reaction) pairs: flatten -> blacklist anti-join
    -> ChEMBL synonym map.  Shared by stage 1 and the sampling side output
    (reference: ``stage/OpenFdaEtl.scala:30-41``)."""
    pairs = explode_reports(reports)
    pairs = anti_join_blacklist(pairs, blacklist)
    return map_to_chembl(pairs, drug_list)


def open_fda_stage1(
    spark: SparkSession,
    reports: DataFrame,
    drug_list: DataFrame,
    blacklist: DataFrame,
    meddra_pt: DataFrame | None = None,
    meddra_llt: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Stage 1 ("Unfiltered"): pair stats + llr, MedDRA-enriched if given.

    ``pairs`` lets the composer pass precomputed cleaned pairs so the
    sampling side output shares the lineage instead of re-flattening.
    """
    if pairs is None:
        pairs = clean_pairs(reports, drug_list, blacklist)
    # cache_input=True: this pair lineage is a raw-JSON flatten (explode x2 +
    # anti-join + synonym join) — recomputing it four times dwarfs the cache.
    stage1 = contingency_llr(pairs, cache_input=True)
    if meddra_pt is not None and meddra_llt is not None:
        stage1 = add_meddra_codes(stage1, meddra_pt, meddra_llt)
    else:
        stage1 = stub_meddra_code(stage1)
    return stage1


def stratified_sampling_outputs(
    raw_reports: DataFrame,
    pairs: DataFrame,
    significant: DataFrame,
    sampling: SamplingConfig,
) -> tuple[DataFrame, DataFrame]:
    """The stratified-sampling side output (reference:
    ``stage/OpenFdaEtl.scala:50-53`` -> ``stage/StratifiedSampling.scala:14-41``).

    Sample ``fraction`` of significant ChEMBL ids and ``fraction`` of all
    cleaned ids, full-outer-merge the key sets (J6), pull every cleaned row
    for those ids (J7), then the raw reports for the sampled report ids —
    with ORIGINAL fields preserved (quirk #4: the reference stamps
    ``seriousnessdeath = 1`` onto every sampled report, which would make the
    sample unusable as pipeline input).

    Returns (sampled_clean, sampled_raw).
    """
    ids = stratified_sample_ids(
        significant, pairs, fraction=sampling.fraction, seed=sampling.seed
    )
    sampled_clean = sample_clean_rows(pairs, ids)
    sampled_raw = sample_raw_reports(raw_reports, sampled_clean)
    return sampled_clean, sampled_raw


def run(spark: SparkSession, config: EngineConfig) -> DataFrame:
    """Full pipeline from config paths; returns the significant-pairs result."""
    fda = config.fda
    reports = readers.load_fda_reports(spark, fda.fda_data)
    drug_list = readers.load_chembl_drug_list(spark, fda.chembl_drugs)
    blacklist = readers.load_blacklist(spark, fda.blacklist)
    meddra_pt = meddra_llt = None
    if fda.meddra_path:
        meddra_pt = readers.load_meddra_preferred_terms(
            spark, f"{fda.meddra_path}/MedAscii/pt.asc"
        )
        meddra_llt = readers.load_meddra_low_level_terms(
            spark, f"{fda.meddra_path}/MedAscii/llt.asc"
        )

    pairs = clean_pairs(reports, drug_list, blacklist)
    stage1 = open_fda_stage1(
        spark, reports, drug_list, blacklist, meddra_pt, meddra_llt, pairs=pairs
    ).persist(StorageLevel.MEMORY_AND_DISK)

    result = monte_carlo_filter(
        stage1,
        permutations=fda.montecarlo.permutations,
        percentile=fda.montecarlo.percentile,
        seed=fda.montecarlo.seed,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    if fda.output_path:
        writers.write_outputs(
            stage1, list(fda.outputs), f"{fda.output_path}/agg_by_chembl"
        )
        writers.write_outputs(
            result, list(fda.outputs), f"{fda.output_path}/agg_critval_drug"
        )

    if fda.sampling.enabled:
        sampled_clean, sampled_raw = stratified_sampling_outputs(
            reports, pairs, result, fda.sampling
        )
        if fda.output_path:
            writers.write_outputs(
                sampled_clean,
                list(fda.outputs),
                f"{fda.output_path}/sampled_clean",
            )
            writers.write_outputs(
                sampled_raw,
                list(fda.outputs),
                f"{fda.output_path}/sampled_raw_reports",
            )
    # stage1's cache is only consumed inside this function (critvals +
    # the stage-2 join + the agg_by_chembl write); result stays persisted
    # for the caller and carries its handle for caller-owned cleanup
    # (operators/cache.py contract).
    if fda.output_path:
        stage1.unpersist()
    from ..operators.cache import attach_cached

    attach_cached(result, result)
    if not fda.output_path:
        attach_cached(result, stage1)
    return result
