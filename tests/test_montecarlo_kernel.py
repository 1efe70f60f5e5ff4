"""Numeric-kernel invariants (mirrors reference MathUtilsTest, SURVEY §5):
multinomial samples sum to size, vary across iterations, degenerate case."""

import numpy as np

from platform_etl_openfda_faers_spark.operators.montecarlo import (
    _critical_value,
    _drug_seed,
)


def test_multinomial_samples_sum_to_size():
    rng = np.random.default_rng(1)
    x = rng.multinomial(100, np.array([0.2, 0.3, 0.5]), size=50)
    assert (x.sum(axis=1) == 100).all()


def test_multinomial_varies_across_iterations():
    rng = np.random.default_rng(1)
    x = rng.multinomial(100, np.array([0.2, 0.3, 0.5]), size=50)
    assert len({tuple(r) for r in x}) > 1


def test_multinomial_degenerate_single_option():
    rng = np.random.default_rng(1)
    x = rng.multinomial(7, np.array([1.0]), size=10)
    assert (x == 7).all()


def test_critical_value_deterministic_per_seed():
    n_i = np.array([50.0, 30.0, 20.0, 10.0])
    a = _critical_value(40, n_i, 200, 100, 0.95, _drug_seed(42, "CHEMBL1"))
    b = _critical_value(40, n_i, 200, 100, 0.95, _drug_seed(42, "CHEMBL1"))
    c = _critical_value(40, n_i, 200, 100, 0.95, _drug_seed(42, "CHEMBL2"))
    assert a == b
    assert a != c  # independent stream per drug


def test_critical_value_positive_and_monotone_in_percentile():
    n_i = np.array([50.0, 30.0, 20.0, 10.0])
    lo = _critical_value(40, n_i, 200, 200, 0.50, _drug_seed(42, "X"))
    hi = _critical_value(40, n_i, 200, 200, 0.99, _drug_seed(42, "X"))
    assert 0 < lo <= hi


def test_critical_value_handles_zero_cells():
    # a reaction with tiny base count produces X=0 cells -> NaN/Inf zeroed
    n_i = np.array([1.0, 199.0])
    v = _critical_value(5, n_i, 200, 100, 0.95, _drug_seed(42, "X"))
    assert np.isfinite(v)
