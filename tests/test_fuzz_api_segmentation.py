"""Differential fuzz of the event-segmentation JSON DSL (pytest slice).

Each seed generates a random request body (time window × filters ×
breakdown × 1-3 metrics), runs it through the REAL serving path
(api.parse_event_segmentation → run_event_segmentation), and compares
against DuckDB SQL emitted independently from the same spec — the
query-level extension of the funnel kernel's hypothesis fuzz
(test_property_funnel.py). A bigger sweep runs out-of-band via
fuzz_check.py (FUZZ_r{N}.json).

Runs at sf0.001 by default; ORACLE_SF_DIR=/root/testdata/sf0.01
matches the driver's gate scale.
"""

from __future__ import annotations

import os

import pytest

from . import _fuzz_seg
from ._oracle import assert_frames_match, run_oracle

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

SEEDS = list(range(24))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzzed_segmentation_matches_oracle(spark, seed):
    spec = _fuzz_seg.gen_spec(seed)
    sdf = _fuzz_seg.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(_fuzz_seg.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"fuzz seed={seed} spec={spec}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_estimation_matches_oracle(spark, seed):
    from . import _fuzz_estimate

    spec = _fuzz_estimate.gen_spec(seed)
    sdf = _fuzz_estimate.run_spec(spark, SF_DIR, spec).toPandas()
    odf = run_oracle(_fuzz_estimate.spec_to_sql(spec), SF_DIR)
    assert_frames_match(sdf, odf, name=f"estimate fuzz seed={seed} spec={spec}")
