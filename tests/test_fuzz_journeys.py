"""Differential fuzz of the paths and retention operators (pytest
slice) — random anchors/steps/directions/step-budgets/excludes/time
ranges (paths, dropoff) and cohort/return pairs × day/week × bounded/
unbounded (retention), each vs the suite's parameterized DuckDB
oracle. Bigger sweeps via fuzz_check.py.
"""

from __future__ import annotations

import os

import pytest

from ._fuzz_journeys import paths_suite, retention_suite
from ._oracle import assert_frames_match, run_oracle

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_paths_matches_oracle(spark, seed):
    spec = paths_suite.gen_spec(seed)
    sdf = paths_suite.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(paths_suite.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"paths fuzz seed={seed} spec={spec}")


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_retention_matches_oracle(spark, seed):
    spec = retention_suite.gen_spec(seed)
    sdf = retention_suite.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(retention_suite.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"retention fuzz seed={seed} spec={spec}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_attribution_matches_oracle(spark, seed):
    from ._fuzz_journeys import attribution_suite

    spec = attribution_suite.gen_spec(seed)
    sdf = attribution_suite.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(attribution_suite.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"attr fuzz seed={seed} spec={spec}")
