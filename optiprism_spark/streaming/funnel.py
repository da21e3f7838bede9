"""Streaming funnel — continuous conversion counting over a stream.

Beyond the reference (its funnel is batch-only; streaming reduces to
re-scans, SURVEY §2.12): the greedy per-user machine's registers
(current step, per-step timestamps, completed count) live in the
Spark state store via ``applyInPandasWithState``, so conversions that
SPAN micro-batches are detected incrementally — no re-scan of
history.

Scope: exact step order, conversion window, non-unique counting.
Excludes/holding constants would ride along in the state tuple the
same way; they are omitted to keep the state schema flat. Semantics
match the batch machine (`operators/funnel._run_machine`) for
in-order streams; late/out-of-order events are handled only within a
micro-batch (sorted before applying) — a watermark-delay buffer in
the state would be the full solution.

Scale: state is O(k) per active user, partitioned by user in the
state store (RocksDB provider on a real cluster); each micro-batch
shuffles only its delta.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import EVENT_NAME_COL, EVENT_TIME_COL, EVENT_USER_COL

MAX_STEPS = 8  # flat state schema bound

_STATE_SCHEMA = T.StructType(
    [T.StructField("cur", T.IntegerType()), T.StructField("completed", T.LongType())]
    + [T.StructField(f"ts_{i}", T.LongType()) for i in range(MAX_STEPS)]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField(EVENT_USER_COL, T.LongType()),
        T.StructField("completed_total", T.LongType()),
        T.StructField("cur_step", T.IntegerType()),
    ]
)


def _machine_factory(step_names: list, window_us: int):
    k = len(step_names)

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.exists:
            st = list(state.get)
        else:
            st = [0, 0] + [None] * MAX_STEPS
        cur, completed = int(st[0]), int(st[1])
        ts_regs = st[2 : 2 + MAX_STEPS]

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("__ts_us")
        events = rows[EVENT_NAME_COL].tolist()
        tss = rows["__ts_us"].tolist()

        i = 0
        while i < len(events):
            ev, ts = events[i], int(tss[i])
            if cur > 0 and ts - ts_regs[0] > window_us:
                cur = 0  # window expired: restart, reprocess this row
                continue
            if ev == step_names[cur]:
                ts_regs[cur] = ts
                if cur == k - 1:
                    completed += 1
                    cur = 0
                else:
                    cur += 1
            i += 1

        state.update(tuple([cur, completed] + ts_regs))
        yield pd.DataFrame(
            [(user, completed, cur)],
            columns=[f.name for f in _OUTPUT_SCHEMA.fields],
        )

    return update


def streaming_funnel_counts(
    spark,
    schema,
    source_dir: str,
    step_names: list,
    window_ms: int,
) -> DataFrame:
    """Per-user running funnel state over a file stream: completed
    conversion count + current step, updated each micro-batch."""
    if len(step_names) > MAX_STEPS:
        raise ValueError(f"at most {MAX_STEPS} steps")
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .filter(F.col(EVENT_NAME_COL).isin(step_names))
        # a null ts would reach the kernel as NaN and int(NaN) kills
        # the streaming query deterministically on retries
        .filter(F.col(EVENT_TIME_COL).isNotNull())
        .withColumn("__ts_us", F.unix_micros(F.col(EVENT_TIME_COL)))
        .select(EVENT_USER_COL, EVENT_NAME_COL, "__ts_us")
    )
    return stream.groupBy(F.col(EVENT_USER_COL)).applyInPandasWithState(
        _machine_factory(list(step_names), window_ms * 1000),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
