"""Write-time co-bucketed layout for the warehouse fact tables.

The one hot query with an unavoidable shuffle on a plain parquet
layout is the fact⋈fact join (orders⋈lineitem): both sides are big,
so neither broadcasts, and Spark must exchange both on the order key
every query. The fix is the same one the events table already uses
for its sequence operators (ingest.write_events_bucketed): bucket
BOTH facts by the join key with the same bucket count at write time.
A bucketed scan then feeds the sort-merge join with its required
hash-partitioning already on disk — zero Exchange, zero Sort (the
layout is also sorted by the key), and at 100 TB the join cost is a
co-partitioned streaming merge instead of a full two-table shuffle.

The reference sidesteps fact-fact joins entirely by denormalizing at
ingest (SURVEY §2.3); this module is the Spark-native answer for the
star-schema queries the warehouse suite covers.

Routing (``order_facts``): queries do not name the layout — they ask
for the fact pair and get the bucketed tables whenever a current
build exists, raw parquet otherwise (the same automatic-routing
discipline as rollup.rollup_supports). "Current" is enforced by a
source fingerprint (file sizes + mtimes) folded into the table tag:
regenerated data at the same sf_dir changes the tag, so a stale
bucketed copy is never served — it is rebuilt under a new name.

Live feed (``append_fact`` / ``compact_fact_appends``): fresh fact
rows land as plain unordered L0 parts (cheap, no bucketing), then a
maintenance
cycle folds them into the bucketed tables via staging + rename — the
same swap discipline as ingest.compact_appends_into_bucketed — so
the Exchange-free plan survives continuous ingest without full
rebuilds. Once a fold has run, the bucketed tables are the canonical
store (raw sf_dir parquet is the bootstrap snapshot), exactly like
the events table's bucketed layout.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import threading
from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schema import load_table

#: the co-bucketed fact pair: (source table, join/bucket key)
_FACTS = (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))

#: the appendable facts and their event-time columns (membership
#: check for append_fact; the sort in the bucketed layout — not the
#: append tier — owns time locality)
_FACT_DATE_COL = {"orders": "o_orderdate", "lineitem": "l_shipdate"}

#: one bucketed build per (process, sf_dir, n_buckets, fingerprint)
_BUILT: dict[tuple[str, int, str], tuple[str, str]] = {}
#: serializes builds — concurrent server threads must not race the
#: rmtree/saveAsTable sequence for the same table
_BUILD_LOCK = threading.Lock()


def _source_fingerprint(sf_dir: str) -> str:
    """Cheap digest of the fact source files (relpath, size,
    mtime_ns). Folded into the bucketed table tag so regenerated data
    at the same sf_dir is detected: the old tables stop matching and
    a fresh build happens under a new name (ADVICE r10: an
    (sf_dir, n_buckets)-only key silently served stale buckets)."""
    h = hashlib.md5()
    for table, _ in _FACTS:
        p = os.path.join(sf_dir, f"{table}.parquet")
        files = [p]
        if os.path.isdir(p):
            files = sorted(
                os.path.join(r, f)
                for r, _dirs, fs in os.walk(p)
                for f in fs
            )
        for fp in files:
            st = os.stat(fp)
            h.update(
                f"{os.path.relpath(fp, sf_dir)}|{st.st_size}|"
                f"{st.st_mtime_ns};".encode()
            )
    return h.hexdigest()


def _table_names(sf_dir: str, n_buckets: int, fp: str) -> tuple[str, str]:
    tag = hashlib.md5(f"{sf_dir}|{n_buckets}|{fp}".encode()).hexdigest()[:10]
    return f"wh_orders_b_{tag}", f"wh_lineitem_b_{tag}"


def write_fact_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist a fact table bucketed + sorted by its join key.

    ``repartition(n_buckets, key)`` first so each bucket is exactly
    one file per write task (without it every task writes a file per
    bucket — n_tasks × n_buckets small files, the classic bucketing
    write amplification)."""
    (
        df.repartition(n_buckets, F.col(key))
        .sortWithinPartitions(*(sort_cols or (key,)))
        .write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or (key,)))
        .saveAsTable(table_name)
    )


def _warehouse_dir(spark: SparkSession) -> str:
    return spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")


def _sweep_stale_layouts(
    spark: SparkSession, wh: str, sf_dir: str, n_buckets: int,
    keep: tuple[str, str],
) -> None:
    """Garbage-collect superseded layout builds. Every build records
    {name: {sf_dir, built_at_fp}} in a sidecar manifest; a build for
    the same sf_dir with a different fingerprint supersedes the old
    tables, and builds whose source directory vanished (pytest
    tmpdirs) are dead. Without this the warehouse dir accumulates one
    orphaned orders+lineitem copy per data regeneration forever
    (observed: 155 MB across ten rounds)."""
    import json as _json

    manifest = os.path.join(wh, ".wh_layout_manifest.json")
    entries: dict[str, dict] = {}
    try:
        with open(manifest) as f:
            entries = _json.load(f)
    except (FileNotFoundError, ValueError):
        pass
    for name, info in list(entries.items()):
        if name in keep:
            continue
        # superseded: same source at the same bucket count (a
        # different bucket count for the same source is a legitimate
        # parallel layout, e.g. tests build 4 alongside 32)
        superseded = (info.get("sf_dir") == sf_dir
                      and info.get("n_buckets") == n_buckets)
        src_gone = not os.path.isdir(info.get("sf_dir", ""))
        if superseded or src_gone:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
            del entries[name]
    for name in keep:
        entries[name] = {"sf_dir": sf_dir, "n_buckets": n_buckets}
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(entries, f)
    os.replace(tmp, manifest)


def _manifest_entries(wh: str) -> dict:
    import json as _json

    try:
        with open(os.path.join(wh, ".wh_layout_manifest.json")) as f:
            return _json.load(f)
    except (FileNotFoundError, ValueError):
        return {}


def _ensure_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int
) -> tuple[str, str]:
    """Build (once) and return the co-bucketed fact table names for
    the CURRENT source data — the amortized layout cost a warehouse
    pays at load time, not per query. Lock-guarded: concurrent server
    threads serialize on the build instead of racing the
    rmtree/saveAsTable sequence.

    Restart durability: a fresh in-memory catalog does not know a
    table whose FILES survived the last process. If the sidecar
    manifest says those files are a build of this same source (same
    name = same fingerprint), they are ADOPTED — re-bucketed from the
    surviving data, not rebuilt from the raw sf_dir parquet. The
    distinction matters under a live feed: compact_fact_appends folds
    rows into the bucketed tables that exist NOWHERE else once the
    appends are cleared, so a rebuild-from-source would silently drop
    every folded row (r11 review finding). Unknown leftover dirs (no
    manifest entry) are still treated as garbage and rebuilt."""
    fp = _source_fingerprint(sf_dir)
    ck = (sf_dir, n_buckets, fp)
    hit = _BUILT.get(ck)
    if hit is not None:
        return hit
    with _BUILD_LOCK:
        hit = _BUILT.get(ck)  # double-checked under the lock
        if hit is not None:
            return hit
        o_name, l_name = _table_names(sf_dir, n_buckets, fp)
        wh = _warehouse_dir(spark)
        known = _manifest_entries(wh)
        for name, (table, key) in zip((o_name, l_name), _FACTS):
            if spark.catalog.tableExists(name):
                continue
            loc = os.path.join(wh, name)
            if name in known and os.path.isdir(loc):
                # adopt: the previous process's build of this exact
                # source (possibly including folded appends) — rewrite
                # it through a staging table so the data becomes a
                # registered bucketed managed table again
                survivor = spark.read.parquet(loc)
                adopt = f"{name}__adopt"
                spark.sql(f"DROP TABLE IF EXISTS {adopt}")
                write_fact_bucketed(survivor, adopt, key, n_buckets)
                shutil.rmtree(loc, ignore_errors=True)
                spark.sql(f"ALTER TABLE {adopt} RENAME TO {name}")
                continue
            # unknown leftover files at the location are garbage from
            # an untracked process — clear and rebuild from source
            shutil.rmtree(loc, ignore_errors=True)
            write_fact_bucketed(
                load_table(spark, sf_dir, table), name, key, n_buckets)
        _sweep_stale_layouts(spark, wh, sf_dir, n_buckets,
                             (o_name, l_name))
        _BUILT[ck] = (o_name, l_name)
        return o_name, l_name


def cobucketed_order_facts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> tuple[DataFrame, DataFrame]:
    """(orders, lineitem) co-bucketed on the order key — builds the
    layout on first use for this source data."""
    o_name, l_name = _ensure_layout(spark, sf_dir, n_buckets)
    return spark.table(o_name), spark.table(l_name)


def _layout_names_if_available(
    spark: SparkSession, sf_dir: str, n_buckets: int
) -> Optional[tuple[str, str]]:
    """One fingerprint computation for the whole routing decision
    (review finding: order_facts paid the os.walk+stat sweep twice,
    register_views three times)."""
    fp = _source_fingerprint(sf_dir)
    names = _table_names(sf_dir, n_buckets, fp)
    if (sf_dir, n_buckets, fp) in _BUILT:
        return names
    o_name, l_name = names
    if spark.catalog.tableExists(o_name) and spark.catalog.tableExists(
            l_name):
        return names
    return None


def layout_available(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> bool:
    """True when a co-bucketed build of the CURRENT source data exists
    in this session's catalog — the routing predicate (mirrors
    rollup.rollup_supports: serve the cheap layout when it answers the
    question, never build one as a side effect of a read)."""
    return _layout_names_if_available(spark, sf_dir, n_buckets) is not None


def order_facts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> tuple[DataFrame, DataFrame]:
    """Routed fact loader: the co-bucketed layout when a current build
    exists (Exchange-free fact⋈fact plans), raw parquet otherwise.
    Every decision is counted (metrics.warehouse_layout_routed_total)
    so a deployment can see when its hot joins are paying the shuffle
    the layout would elide."""
    from . import metrics

    names = _layout_names_if_available(spark, sf_dir, n_buckets)
    if names is not None:
        metrics.warehouse_layout_routed_total().inc(path="layout")
        return spark.table(names[0]), spark.table(names[1])
    metrics.warehouse_layout_routed_total().inc(path="raw")
    return (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ------------------------------------------------------ continuous ingest


def append_fact(
    spark: SparkSession, appends_path: str, table: str, df: DataFrame
) -> None:
    """Land fresh fact rows as plain parquet parts under
    ``{appends_path}/{table}/`` — the cheap write a live feed makes
    between compaction cycles. No bucketing (that cost belongs to the
    maintenance fold) and — unlike the events appends —
    NO ``partitionBy(date)``: fact batches span the table's whole
    date range (TPC-H orders cover ~2400 days), so a dt= layout
    explodes one small batch into thousands of tiny files (measured:
    12–64 s per append and a fold dominated by file listing,
    WH_FOLD_r11). The append tier is transient unordered L0; time
    locality belongs to the bucketed table's sort, not here."""
    if table not in _FACT_DATE_COL:
        raise KeyError(f"not a warehouse fact: {table!r}")
    df.write.mode("append").parquet(os.path.join(appends_path, table))


def _append_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(r, f)
        for r, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def compact_fact_appends(
    spark: SparkSession,
    sf_dir: str,
    appends_path: str,
    n_buckets: int = 32,
    clear_appends: bool = True,
) -> dict[str, int]:
    """Fold appended fact rows into the co-bucketed tables — the
    maintenance loop that keeps the Exchange-free fact⋈fact plan
    valid under continuous ingest, mirroring the events table's
    ingest.compact_appends_into_bucketed (staging table + rename swap
    because Spark cannot overwrite a table it is reading from; on a
    production lake the swap is a transactional-format commit).

    The appends snapshot is the part files listed at entry; files
    landing while the rewrite runs are neither folded nor deleted, so
    repeated cycles never lose or double-fold a row. After the first
    fold the bucketed tables are the canonical store — the raw sf_dir
    parquet is the bootstrap snapshot (same semantics as the events
    bucketed layout under live ingest).

    ``clear_appends=False`` hands folded-file lifecycle to the caller:
    the crash-recovery manifest is then not written, and the caller
    must remove (or move) the folded files before the next cycle or
    they WILL fold twice.

    Returns rows folded per table.
    """
    names = _ensure_layout(spark, sf_dir, n_buckets)
    folded: dict[str, int] = {}

    def _clear(path: str, part_files: list, with_manifest: bool) -> None:
        for fpath in part_files:
            try:
                os.remove(fpath)
            except FileNotFoundError:
                pass
        if with_manifest:
            try:
                os.remove(os.path.join(path, _FOLD_MANIFEST))
            except FileNotFoundError:
                pass
        # prune now-empty partition dirs (cosmetic)
        for r, dirs, files in list(os.walk(path, topdown=False)):
            if r != path and not dirs and not files:
                try:
                    os.rmdir(r)
                except OSError:
                    pass

    with _BUILD_LOCK:
        # phase 1 — stage every table's fold (expensive, no swaps
        # yet): readers keep seeing consistent orders+lineitem while
        # both rewrites run, and the cross-table inconsistency window
        # narrows to the back-to-back DDL swaps in phase 2 (on a
        # transactional lake the two swaps are one commit; a plain
        # metastore cannot close the window completely)
        staged = []  # (table, name, path, part_files, n)
        for name, (table, key) in zip(names, _FACTS):
            path = os.path.join(appends_path, table)
            _recover_fold(spark, name, path)
            part_files = _append_files(path)
            if not part_files:
                folded[table] = 0
                continue
            base = spark.table(name)
            appends = spark.read.parquet(*part_files)
            if "dt" in appends.columns and "dt" not in base.columns:
                appends = appends.drop("dt")
            # ONE scan of the append set: the count materializes the
            # cache the union write then reads
            appends = appends.select(*base.columns).persist()
            try:
                n = appends.count()
                if n == 0:
                    # zero-row parts would otherwise be re-listed and
                    # re-scanned by every future cycle (r11 review
                    # finding) — clear them now, no fold needed
                    if clear_appends:
                        _clear(path, part_files, with_manifest=False)
                    folded[table] = 0
                    continue
                staging = f"{name}__staging"
                spark.sql(f"DROP TABLE IF EXISTS {staging}")
                write_fact_bucketed(
                    base.unionByName(appends), staging, key, n_buckets)
                if clear_appends:
                    # crash-recovery marker, written AFTER the staged
                    # fold and BEFORE the swap, listing exactly the
                    # folded files: without it a crash between the
                    # rename and the cleanup below would leave the
                    # folded appends on disk and the next cycle would
                    # fold them AGAIN (the double-fold the events
                    # compaction's manifest exists to prevent)
                    import json as _json

                    with open(os.path.join(path, _FOLD_MANIFEST),
                              "w") as f:
                        _json.dump({"staging": staging,
                                    "files": part_files}, f)
                staged.append((table, name, path, part_files, n))
            finally:
                appends.unpersist()
        # phase 2 — swap all staged tables back-to-back (cheap DDL)
        for _table, name, _path, _files, _n in staged:
            spark.sql(f"DROP TABLE {name}")
            spark.sql(f"ALTER TABLE {name}__staging RENAME TO {name}")
        # phase 3 — retire the folded append files
        for table, _name, path, part_files, n in staged:
            if clear_appends:
                _clear(path, part_files, with_manifest=True)
            folded[table] = n
    return folded


_FOLD_MANIFEST = ".wh_fold.json"


def _recover_fold(spark: SparkSession, name: str,
                  path: Optional[str] = None) -> None:
    """Finish (or discard) an interrupted fold — the events
    compaction's recovery protocol (ingest._recover_compaction)
    applied per fact table:

    - no manifest: a bare staging table is a discarded attempt whose
      appends are intact — drop it (if main is also gone, promote:
      the staged fold is the only surviving copy).
    - manifest + main + staging: crash between manifest write and the
      swap — drop staging, keep appends (they re-fold cleanly).
    - manifest + staging only: crash between DROP and RENAME —
      promote staging, then delete exactly the folded files so the
      next cycle cannot fold them twice.
    - manifest, no staging: crash after the rename, before cleanup —
      just delete the folded files + manifest."""
    import json as _json

    staging = f"{name}__staging"
    staging_exists = spark.catalog.tableExists(staging)
    manifest = os.path.join(path, _FOLD_MANIFEST) if path else None
    if manifest is None or not os.path.exists(manifest):
        if staging_exists:
            if spark.catalog.tableExists(name):
                spark.sql(f"DROP TABLE {staging}")
            else:
                spark.sql(f"ALTER TABLE {staging} RENAME TO {name}")
        return
    with open(manifest) as f:
        info = _json.load(f)
    main_exists = spark.catalog.tableExists(name)
    if main_exists and staging_exists:
        spark.sql(f"DROP TABLE {staging}")
        os.remove(manifest)
        return
    if not main_exists and staging_exists:
        spark.sql(f"ALTER TABLE {staging} RENAME TO {name}")
    for fpath in info.get("files", ()):
        try:
            os.remove(fpath)
        except FileNotFoundError:
            pass
    os.remove(manifest)
