"""Loader + config validation tests (mirrors reference LoadersTest /
ConfigurationTest, SURVEY §5)."""

import pytest

from platform_etl_openfda_faers_spark.config import (
    FdaConfig,
    MonteCarloConfig,
    SamplingConfig,
)
from platform_etl_openfda_faers_spark.functions.normalize import normalize_term
from platform_etl_openfda_faers_spark.sources import readers, writers


def test_blacklist_loader(spark, tmp_path):
    p = tmp_path / "bl.txt"
    p.write_text("  Drug Ineffective \nOFF LABEL USE\npatient^s condition\n\n")
    bl = readers.load_blacklist(spark, str(p))
    assert bl.columns == ["reactions"]
    got = {r.reactions for r in bl.collect()}
    # lowered, trimmed, '^' mapped to apostrophe (FAERS encoding)
    assert got == {"drug ineffective", "off label use", "patient's condition"}


def test_meddra_asc_parser(spark, tmp_path):
    p = tmp_path / "pt.asc"
    p.write_text("10000001$Headache$$$X$\n10000002$Nausea and vomiting$$$Y$\n")
    pt = readers.load_meddra_preferred_terms(spark, str(p))
    got = {(r.pt_code, r.pt_name) for r in pt.collect()}
    assert got == {("10000001", "headache"), ("10000002", "nausea and vomiting")}


def test_normalize_term_parity(spark):
    df = spark.createDataFrame([("  FOO^s Bar ",)], ["t"])
    assert df.select(normalize_term(df.t).alias("n")).first().n == "foo's bar"


def test_csv_single_file_writer_honors_path(spark, tmp_path):
    # reference quirk #3: its CSV writer ignores the computed file name
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    out = str(tmp_path / "out_csv")
    writers.write_csv_single_file(df, out)
    import glob

    parts = glob.glob(f"{out}/part-*.csv.gz")
    assert len(parts) == 1  # single gzip'd part with header, at the given path


def test_config_validation():
    with pytest.raises(ValueError):
        MonteCarloConfig(permutations=0)
    with pytest.raises(ValueError):
        MonteCarloConfig(percentile=1.5)
    with pytest.raises(ValueError):
        SamplingConfig(fraction=0.0)
    with pytest.raises(ValueError):
        FdaConfig(outputs=("parquet", "xml"))
    assert FdaConfig(outputs=("parquet", "json", "csv")).montecarlo.permutations == 100
