"""Streaming anomaly alerting — the rollup-maintenance stream grown
an alert channel.

Beyond the reference (which has neither a pre-aggregate nor an
alerting primitive): each micro-batch folds into the RollupStore
exactly as streaming/rollup.py does, then the day series for the
batch's affected dimension groups is re-read FROM THE STORE and run
through operators/alerts.anomaly_flags; newly anomalous buckets are
appended to a parquet alert log, deduplicated against already-raised
alerts by (dim, bucket) so a bucket alerts at most once no matter how
many later batches touch its neighbourhood.

Exactly-once shape: the rollup fold reuses the store's
(stream_id, batch_id) ledger (re-delivered batches no-op), and the
alert append is idempotent by construction — the anti-join against
the existing log makes a replayed append write zero new rows. A
crash between fold and alert write means the next batch's sweep
raises the alert then: at-least-once detection, exactly-once
raising.

Scale: the alert pass reads the ROLLUP (day × dims grain — megabytes
at 100 TB of raw events), never raw events; the series window is a
per-dim ordered walk over day counts, series-sized by definition.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.alerts import anomaly_flags
from ..rollup import EVENTS_COUNT_COL, ROLLUP_DT_COL, RollupStore


def streaming_rollup_alerts(
    spark: SparkSession,
    schema,
    source_dir: str,
    store: RollupStore,
    checkpoint_dir: str,
    alert_log_dir: str,
    dim: str = "event_type",
    window: int = 7,
    z_threshold: float = 3.0,
    min_periods: int = 3,
    stream_id: str = "rollup_alerts",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Maintenance + alerting stream: fold each micro-batch into the
    store, then flag spiking (dim, day) buckets of the daily event
    count into ``alert_log_dir``. Alert rows: (dim value, bucket,
    n, baseline_mean, z_score)."""

    def fold_and_alert(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        store.update(sess, batch_df, stream_id=stream_id, batch_id=batch_id)
        if not store.exists():
            return
        rollup = store.read(sess)
        series = (
            rollup.groupBy(F.col(dim), F.col(ROLLUP_DT_COL).alias("bucket"))
            .agg(F.sum(EVENTS_COUNT_COL).alias("n"))
        )
        flagged = anomaly_flags(
            series, "n", window=window, z_threshold=z_threshold,
            min_periods=min_periods, by=(dim,),
        ).filter(F.col("is_anomaly"))
        alerts = flagged.select(
            dim, "bucket", "n", "baseline_mean", "z_score")
        if os.path.isdir(alert_log_dir) and any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(alert_log_dir) for f in fs
        ):
            existing = sess.read.parquet(alert_log_dir).select(dim, "bucket")
            alerts = alerts.join(existing, [dim, "bucket"], "left_anti")
        alerts.write.mode("append").parquet(alert_log_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold_and_alert)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_drift_alerts(
    spark: SparkSession,
    schema,
    source_dir: str,
    baseline_df,
    checkpoint_dir: str,
    state_dir: str,
    alert_log_dir: str,
    col: str = "event_type",
    threshold: float = 0.25,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Categorical-drift watchdog over a landing stream: the PSI of
    ``col``'s distribution (all streamed rows so far vs a frozen
    baseline snapshot) is recomputed per micro-batch; crossing
    ``threshold`` (0.25 = the canonical "significant shift" line)
    appends one alert row (batch_id, psi) — the alarm a training-data
    pipeline wants when an SDK release changes the event mix
    mid-ingest, long before the snapshot-level drift check would see
    it.

    Exactly-once shape: each batch's histogram lands by OVERWRITE
    under ``batch_id=N`` (a re-delivered batch rewrites the same path
    — no double count), and the alert append anti-joins the log on
    batch_id, so a replay raises nothing new. State read per batch is
    the category histogram (n_categories × n_batches tiny rows), never
    raw events.
    """
    import os as _os

    from ..operators.drift import _psi_contribs

    base_path = _os.path.join(state_dir, "baseline")
    (
        baseline_df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n_expected"))
        .write.mode("overwrite").parquet(base_path)
    )
    batches_path = _os.path.join(state_dir, "batches")

    def fold(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        (
            batch_df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("category"))
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(_os.path.join(batches_path, f"batch_id={batch_id}"))
        )
        running = (
            sess.read.option("basePath", batches_path).parquet(batches_path)
            .groupBy("category").agg(F.sum("n").alias("n_actual"))
        )
        hist = (
            sess.read.parquet(base_path)
            .join(running, "category", "full_outer")
            .select(
                "category",
                F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
                F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
            )
        )
        from pyspark.sql import Window

        w = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
        psi_row = _psi_contribs(hist, "category",
                                F.count(F.lit(1)).over(w)).agg(
            F.round(F.sum("psi_contrib"), 9)).first()
        psi = psi_row[0] if psi_row else None
        if psi is None or psi < threshold:
            return
        alert = sess.createDataFrame(
            [(int(batch_id), float(psi))], "batch_id long, psi double")
        if _os.path.isdir(alert_log_dir) and any(
            f.endswith(".parquet")
            for _r, _d, fs in _os.walk(alert_log_dir) for f in fs
        ):
            existing = sess.read.parquet(alert_log_dir).select("batch_id")
            alert = alert.join(existing, "batch_id", "left_anti")
        alert.write.mode("append").parquet(alert_log_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
