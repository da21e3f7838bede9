"""Differential-oracle sweep: every registered query vs DuckDB.

Runs at sf0.001 by default (fast); set ORACLE_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's correctness gate exactly.
"""

from __future__ import annotations

import os

import pytest

from optiprism_spark.registry import QUERIES

from ._oracle import check_query

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    check_query(spark, name, SF_DIR)
