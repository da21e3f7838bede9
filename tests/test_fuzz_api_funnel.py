"""Differential fuzz of the funnel JSON DSL (pytest slice).

Each seed: a random funnel body (steps × window × time range × one
structural mode) through api.parse_funnel → funnel_report, compared
hash-exact against the recursive-anchor-chain DuckDB oracle emitted
from the same spec. 14 seeds = every mode twice; the bigger sweep
runs via fuzz_check.py --suite funnel.
"""

from __future__ import annotations

import os

import pytest

from . import _fuzz_funnel
from ._oracle import assert_frames_match, run_oracle

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

SEEDS = list(range(14))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzzed_funnel_matches_oracle(spark, seed):
    spec = _fuzz_funnel.gen_spec(seed)
    sdf = _fuzz_funnel.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(_fuzz_funnel.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"funnel fuzz seed={seed} spec={spec}")
