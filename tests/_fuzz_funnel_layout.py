"""Differential fuzzer for the funnel BUCKETED-LAYOUT seam.

``funnel_attempts(assume_partitioned=True)`` elides the funnel's one
shuffle when events come from a user-bucketed table; its failure mode
is SILENT — wrong use (or a broken layout invariant) splits users
across partitions and undercounts conversions without erroring. This
suite replays the funnel fuzzer's random specs (same generator, same
modes: unique / non-unique / excludes / constants / breakdown /
session / last-touch / drop-off) through both physical paths:

  raw parquet  → funnel_report (repartition-by-user shuffle)
  bucketed tbl → funnel_report(assume_partitioned=True), zero shuffle

and demands hash-exact equality. The raw path is itself fuzzed
against the DuckDB machine oracle by the funnel suite, so agreement
here pins the layout path to the oracle transitively. The per-step
time metrics are integer-µs sums divided once at the end, so
exactness across partitionings is by construction (see
_report_from_attempts) — any drift is a real bug, not float noise.
"""

from __future__ import annotations

from tests import _fuzz_funnel

gen_spec = _fuzz_funnel.gen_spec

#: one bucketed copy per (process, sf_dir)
_BUCKETED: dict[str, str] = {}


def _bucketed_events(spark, sf_dir: str):
    from optiprism_spark.ingest import write_events_bucketed
    from optiprism_spark.schema import load_table

    name = _BUCKETED.get(sf_dir)
    if name is None:
        import hashlib

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        name = f"events_fuzz_layout_{tag}"
        if not spark.catalog.tableExists(name):
            import os
            import shutil

            wh = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
            write_events_bucketed(
                load_table(spark, sf_dir, "events"), name, n_buckets=8)
        _BUCKETED[sf_dir] = name
    return spark.table(name)


def run_check(spark, sf_dir: str, spec: dict) -> dict:
    from optiprism_spark.api import parse_funnel
    from optiprism_spark.operators.funnel import funnel_report
    from optiprism_spark.schema import load_table

    req = parse_funnel(_fuzz_funnel.spec_to_body(spec))
    raw = funnel_report(load_table(spark, sf_dir, "events"), req).toPandas()
    fast = funnel_report(
        _bucketed_events(spark, sf_dir), req,
        assume_partitioned=True).toPandas()
    assert sorted(raw.columns) == sorted(fast.columns), (
        f"layout seed={spec}: columns diverge")
    cols = sorted(raw.columns)
    a = raw[cols].sort_values(by=cols, key=lambda s: s.astype(str)) \
        .reset_index(drop=True)
    b = fast[cols].sort_values(by=cols, key=lambda s: s.astype(str)) \
        .reset_index(drop=True)
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        raise AssertionError(
            f"layout path diverges from shuffle path: "
            f"{diff.sum().to_dict()} differing cells; spec={spec}")
    # "routed" here = the shuffle-elided path ran (always, by design)
    return {"routed": True}
