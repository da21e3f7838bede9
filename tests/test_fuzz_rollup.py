"""Seeded smoke of the rollup-routing differential fuzzer
(tests/_fuzz_rollup.py): a fixed slice of the seed space so the
routed-vs-raw seam is exercised on every pytest run; the wide sweep
runs via fuzz_check.py --suite rollup at sf0.01."""

from __future__ import annotations

import os

import pytest

from tests import _fuzz_rollup

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

# seeds 0-9 cover: 7 seg shapes, 2 activity shapes, 1 maintenance
SEEDS = list(range(10)) + [17, 23]


@pytest.mark.parametrize("seed", SEEDS)
def test_rollup_routing_differential(spark, seed):
    spec = _fuzz_rollup.gen_spec(seed)
    _fuzz_rollup.run_check(spark, SF_DIR, spec)


def test_sweep_routes_some_shapes(spark):
    """Generator sanity: a slice of the space must actually route
    (guard against drift that silently stops testing the seam)."""
    routed = sum(
        _fuzz_rollup.run_check(spark, SF_DIR, _fuzz_rollup.gen_spec(s))["routed"]
        for s in range(30, 50)
    )
    assert routed >= 3, f"only {routed}/20 shapes routed"
