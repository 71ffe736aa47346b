"""Differential tests: every SQL-expressible query vs its DuckDB oracle at
sf0.01 (the driver's correctness scale), plus rows-only smoke for the rest.
This mirrors CORRECTNESS_r{N}.json before the driver ever runs."""

from __future__ import annotations

import pytest

from fxa_amplitude_send_spark.plans import all_oracles, all_queries

from .oracle_compare import compare

QUERIES = all_queries()
ORACLES = all_oracles()

SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_match(spark, sf_correctness, name):
    df = QUERIES[name](spark, sf_correctness)
    problems = compare(df, ORACLES[name], sf_correctness)
    assert not problems, f"{name}: " + "; ".join(problems[:8])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
