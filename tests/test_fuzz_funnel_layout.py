"""Bucketed-layout funnel differential (pytest slice).

Each seed: one random funnel spec through BOTH physical paths — raw
parquet (shuffle) and a user-bucketed table with
assume_partitioned=True (zero shuffle) — asserting hash-exact
agreement. 8 seeds = every structural mode once; the bigger sweep
runs via fuzz_check.py --suite funnel_layout.
"""

from __future__ import annotations

import os

import pytest

from . import _fuzz_funnel_layout

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

SEEDS = list(range(8))


@pytest.mark.parametrize("seed", SEEDS)
def test_layout_path_matches_shuffle_path(spark, seed):
    spec = _fuzz_funnel_layout.gen_spec(seed)
    out = _fuzz_funnel_layout.run_check(spark, SF_DIR, spec)
    assert out == {"routed": True}
