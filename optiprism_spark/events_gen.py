"""Synthetic e-commerce event generator — the reference's events-gen
crate re-expressed Spark-native.

The reference bootstraps demo/test data with a Markov-chain session
simulator: user sessions walk an action graph with per-transition
probabilities and dwell times, drawing products and emitting typed
events (events-gen/src/generator.rs, store/transitions.rs,
store/intention.rs). This module re-derives that design:

- an action graph with weighted transitions + dwell seconds (our own
  compact chain: browse → search/deals → product → cart → checkout →
  purchase, refunds, bounces — same shape, original numbers);
- every draw is md5-derived from (seed, user, session, step), so the
  corpus is DETERMINISTIC: re-runs, cluster re-partitions, and tests
  reproduce it bit-for-bit (no rand(), matching the repo-wide rule);
- generation is distributed: users fan out via spark.range, sessions
  explode per user, and each (user, session) walk runs inside an
  Arrow-batched mapInPandas kernel — the 100 TB generation shape
  (embarrassingly parallel over sessions, no shuffle, no driver loop).

Output matches the driver events schema (event_id, ts, user_id,
event_type, value, props) so generated corpora drop into every
operator in this repo.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: action -> [(next_action, weight, dwell_seconds)]
TRANSITIONS: dict[str, list[tuple[str, float, int]]] = {
    "index": [("promotions", 0.25, 3), ("search", 0.35, 10),
              ("deals", 0.15, 8), ("bounce", 0.25, 5)],
    "promotions": [("product", 0.70, 10), ("index", 0.30, 5)],
    "deals": [("product", 0.60, 10), ("index", 0.20, 5), ("bounce", 0.20, 5)],
    "search": [("product", 0.55, 12), ("not_found", 0.15, 4),
               ("index", 0.15, 5), ("bounce", 0.15, 5)],
    "not_found": [("search", 0.60, 4), ("index", 0.40, 3)],
    "product": [("add_to_cart", 0.35, 20), ("index", 0.25, 10),
                ("search", 0.20, 8), ("bounce", 0.20, 10)],
    "add_to_cart": [("view_cart", 0.70, 5), ("product", 0.20, 10),
                    ("bounce", 0.10, 5)],
    "view_cart": [("checkout", 0.65, 8), ("index", 0.20, 5), ("bounce", 0.15, 5)],
    "checkout": [("purchase", 0.75, 30), ("view_cart", 0.15, 10),
                 ("bounce", 0.10, 10)],
    "purchase": [("end", 0.90, 5), ("refund", 0.10, 3600)],
    "refund": [("end", 1.0, 0)],
    "bounce": [("end", 1.0, 0)],
}

#: actions that emit an event row (bounce/end are terminal markers)
EMITTING = ("index", "promotions", "deals", "search", "not_found", "product",
            "add_to_cart", "view_cart", "checkout", "purchase", "refund")

N_PRODUCTS = 100
MAX_STEPS = 40

GEN_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _u(seed: str, *parts) -> float:
    """Deterministic uniform [0,1) from md5 of the draw coordinates."""
    key = ":".join([seed, *map(str, parts)]).encode()
    return int(hashlib.md5(key).hexdigest()[:8], 16) / float(1 << 32)


def _price(product_id: int) -> float:
    return round(5.0 + (product_id * 37 % 300) + (product_id % 100) / 100.0, 2)


def generate_events(
    spark: SparkSession,
    n_users: int,
    sessions_per_user: int = 2,
    seed: str = "gen",
    start_ts: str = "2024-01-01 00:00:00",
    session_gap_s: int = 7 * 24 * 3600,
) -> DataFrame:
    """Events frame for ``n_users`` deterministic e-commerce sessions.

    event_id encodes (user, session, step) — unique and stable without
    any cross-partition coordination: ``user * sessions * MAX_STEPS +
    session * MAX_STEPS + step``."""
    base = (
        spark.range(n_users)
        .select(
            F.col("id").alias("user_id"),
            F.explode(F.sequence(F.lit(0), F.lit(sessions_per_user - 1)))
            .alias("session_idx"),
        )
        .withColumn(
            "session_start",
            F.to_timestamp(F.lit(start_ts))
            + F.make_interval(secs=F.col("session_idx") * session_gap_s
                              + (F.xxhash64("user_id") % 86400).cast("double")),
        )
    )
    return _walk_sessions(base, seed, sessions_per_user)


def generate_events_skewed(
    spark: SparkSession,
    n_users: int,
    zipf_s: float = 1.1,
    head_sessions: int = 64,
    whales: dict[int, int] | None = None,
    seed: str = "gen",
    start_ts: str = "2024-01-01 00:00:00",
    session_gap_s: int = 3600,
) -> DataFrame:
    """Skewed corpus: per-user session counts follow a zipf-ish decay
    ``max(1, round(head_sessions / (user_id+1)**zipf_s))`` — a heavy
    head of power users and a long tail of one-session users — plus
    optional ``whales`` overrides ({user_id: n_sessions}) to plant
    pathological users (bot traffic) of arbitrary size.

    This is the adversarial-input generator for the scale harness:
    real event corpora are zipf-distributed over users (the
    reference's (project, user) sort order concentrates a whale into
    one range the same way a user-hash shuffle concentrates it into
    one task), so uniform-corpus measurements alone say nothing about
    straggler behavior. The (user, session) walk rows are
    ``repartition``-ed before the kernel so generation itself stays
    balanced — skew is in the DATA (one user's rows land in one task
    of any user-keyed shuffle), not in the generation job."""
    whales = whales or {}
    n_sess = F.greatest(
        F.lit(1),
        F.round(F.lit(float(head_sessions))
                / F.pow(F.col("user_id") + 1, F.lit(zipf_s))).cast("int"),
    )
    for uid, cnt in whales.items():
        n_sess = F.when(F.col("user_id") == uid, F.lit(cnt)).otherwise(n_sess)
    s_max = max([head_sessions, *whales.values()])
    base = (
        spark.range(n_users)
        .select(F.col("id").alias("user_id"))
        .withColumn("__n", n_sess)
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("session_idx"),
        )
        # spread a whale's sessions across tasks: each (user, session)
        # walk is independent, so generation is balanced even though
        # the emitted corpus is maximally skewed by user
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn(
            "session_start",
            F.to_timestamp(F.lit(start_ts))
            + F.make_interval(secs=F.col("session_idx") * session_gap_s
                              + (F.xxhash64("user_id") % 86400).cast("double")),
        )
    )
    return _walk_sessions(base, seed, s_max)


def _walk_sessions(base: DataFrame, seed: str, s_max: int) -> DataFrame:
    """Run the Markov session walk over (user_id, session_idx,
    session_start) rows; ``s_max`` is the session-count upper bound
    used for collision-free event_id packing."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("event_id", "ts", "user_id", "event_type", "value", "props")}
            for user, sess, t0 in zip(
                pdf["user_id"], pdf["session_idx"], pdf["session_start"]
            ):
                user, sess = int(user), int(sess)
                action, t, product = "index", t0, None
                for step in range(MAX_STEPS):
                    if action == "end":
                        break
                    if action in EMITTING:
                        if action == "product":
                            product = int(
                                _u(seed, user, sess, step, "prod") * N_PRODUCTS
                            )
                        props = {"session": sess}
                        value = None
                        if action in ("product", "add_to_cart", "purchase",
                                      "refund") and product is not None:
                            props["product_id"] = product
                            if action in ("purchase", "refund"):
                                value = _price(product) * (
                                    -1.0 if action == "refund" else 1.0
                                )
                        out["event_id"].append(
                            (user * s_max + sess) * MAX_STEPS + step
                        )
                        out["ts"].append(t)
                        out["user_id"].append(user)
                        out["event_type"].append(action)
                        out["value"].append(value)
                        out["props"].append(json.dumps(props, sort_keys=True))
                    # weighted transition draw
                    edges = TRANSITIONS[action]
                    total = sum(w for _, w, _ in edges)
                    u = _u(seed, user, sess, step) * total
                    acc = 0.0
                    for nxt, w, dwell in edges:
                        acc += w
                        if u < acc:
                            action = nxt
                            t = t + pd.Timedelta(seconds=dwell)
                            break
            yield pd.DataFrame(out)

    return base.mapInPandas(walk, GEN_SCHEMA)
