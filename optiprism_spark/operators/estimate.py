"""Sampled estimation mode — beyond the reference.

At 100 TB the second interactivity lever after the materialized
rollup (rollup.py) is answering exploratory queries from a SAMPLE.
The right unit to sample for behavioral analytics is the USER, not
the event: a per-event sample breaks every sequence/distinct metric
(funnels see half-journeys, DAU double-counts nothing but undercounts
incoherently), whereas a user-coherent sample keeps each kept user's
complete event stream, so funnels, retention, paths, and per-user
aggregates all stay exactly-valid conditional on the sampled
population, and additive totals scale by 1/rate.

Sampling is hash-based and deterministic (operators/assembly.unit_hash,
md5-derived — engine-independent and DuckDB-mirrorable, unlike
Spark's TABLESAMPLE / rand() which neither repeats across runs nor
reproduces in the oracle): a user is in the sample iff
``unit_hash(user_id, seed) < rate``. The same (seed, rate) therefore
selects the same users on every engine and every run — estimates are
testable by hash-equality, and a dashboard toggling 10% ↔ 100% sees
consistent populations. Plan shape: the sample predicate is one
JVM-side md5 per row evaluated AT THE SCAN (a narrow filter before
any shuffle), so every downstream exchange moves ~rate of the data —
the whole point at scale.

Scaling rules (``estimated_event_segmentation``): additive metrics
(count_events, count/active distinct groups, SUM aggregates) are
scaled by 1/rate — the classic Horvitz-Thompson estimator with equal
inclusion probability; ratio metrics (AVG/MIN/MAX/percentiles,
count_per_group, formulas) are returned UNSCALED as their
within-sample values, which are already consistent estimators of the
population ratio. Sampling error ~ 1/sqrt(rate · distinct users), so
rates below ~1e-4 of a large user base start to show on small
breakdown cells; ``rel_err_hint`` quantifies this.
"""

from __future__ import annotations

import math
import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dsl import AggFn, EventSegmentationRequest, SegQuery
from ..schema import EVENT_USER_COL
from .aggregates import _query_alias
from .assembly import unit_hash

#: kinds whose value is an additive total over users/events →
#: scaled by 1/rate
_ADDITIVE_KINDS = frozenset({
    "count_events",
    "count_unique_groups",
    "daily_active_groups",
    "weekly_active_groups",
    "monthly_active_groups",
})


def user_sample(
    events: DataFrame,
    rate: float,
    seed: str = "est",
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """Deterministic user-coherent sample: ALL events of ~``rate`` of
    users (md5-hash threshold, stable under data growth — a user's
    membership never changes as their events accumulate)."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    if rate == 1.0:
        return events
    return events.filter(unit_hash(F.col(group_col), seed) < F.lit(float(rate)))


def _is_additive(q: SegQuery) -> bool:
    if q.kind in _ADDITIVE_KINDS:
        return True
    if q.kind in ("aggregate_property", "aggregate_property_per_group"):
        # SUM totals and COUNT totals (of values / of groups) are both
        # additive over sampled users; AVG/MIN/MAX/percentiles are
        # ratio/order statistics and pass through
        return q.agg in (AggFn.SUM, AggFn.COUNT)
    return False


def estimated_event_segmentation(
    events: DataFrame,
    req: EventSegmentationRequest,
    rate: float,
    seed: str = "est",
    **kwargs,
) -> DataFrame:
    """Event segmentation over a user-coherent sample, additive
    metrics scaled to population estimates (doubles — an estimate is
    not a count). Non-additive metrics pass through as within-sample
    ratio estimates. Same output schema/column names as the exact
    runner, so chart layers need no changes."""
    from ..queries.event_segmentation import run_event_segmentation

    sampled = user_sample(events, rate, seed, req.group_col)
    out = run_event_segmentation(sampled, req, **kwargs)
    if rate == 1.0:
        # exact passthrough: no scaling, and column dtypes unchanged
        # (a dashboard toggling 100% <-> sampled keeps its schema)
        return out
    inv = 1.0 / float(rate)
    for ei, eq in enumerate(req.events):
        for qi, q in enumerate(eq.queries):
            name = _query_alias(ei, qi, q)
            if name in out.columns and _is_additive(q):
                out = out.withColumn(
                    name, (F.col(name) * F.lit(inv)).cast("double"))
    return out


#: funnel-report columns that are additive totals (scaled by 1/rate);
#: ratios and per-conversion averages are ratio estimates and pass
#: through (operators/funnel._report_from_attempts column protocol)
_FUNNEL_SCALED_RE = re.compile(
    r"^(total|completed|step\d+_(total|dropped_off|"
    r"time_to_convert(_from_start)?))$")


def estimated_funnel_report(
    events: DataFrame,
    req,
    rate: float,
    seed: str = "est",
    **kwargs,
) -> DataFrame:
    """Funnel ConversionOverTime report over a user-coherent sample.

    The funnel state machine runs on COMPLETE user streams (the
    property user_sample guarantees and a per-event sample would
    break), so within-sample conversion ratios and average
    times-to-convert are already consistent estimates and pass
    through untouched; additive columns (per-step totals, drop-off
    counts, summed conversion times) are scaled by 1/rate to
    population estimates (doubles). Same schema as funnel_report."""
    from .funnel import funnel_report

    out = funnel_report(
        user_sample(events, rate, seed, group_col=req.group_col), req,
        **kwargs)
    if rate == 1.0:
        return out
    inv = 1.0 / float(rate)
    for c in out.columns:
        if _FUNNEL_SCALED_RE.match(c):
            out = out.withColumn(c, (F.col(c) * F.lit(inv)).cast("double"))
    return out


def estimated_retention(
    events: DataFrame,
    rate: float,
    seed: str = "est",
    **retention_kwargs,
) -> DataFrame:
    """Cohort retention over a user-coherent sample: cohort_size and
    retained (additive user counts) scale by 1/rate to population
    estimates; pct is a ratio estimate and passes through — it is the
    number a retention chart actually plots, and it is unchanged by
    consistent scaling of numerator and denominator."""
    from .retention import retention

    out = retention(
        user_sample(events, rate, seed,
                    group_col=retention_kwargs.get("group_col",
                                                   EVENT_USER_COL)),
        **retention_kwargs)
    if rate == 1.0:
        return out
    inv = 1.0 / float(rate)
    for c in ("cohort_size", "retained"):
        out = out.withColumn(c, (F.col(c) * F.lit(inv)).cast("double"))
    return out


def rel_err_hint(rate: float, sampled_users: int,
                 confidence_z: float = 1.96) -> Optional[float]:
    """Approximate relative error (± fraction at the given z) of a
    scaled user-count estimate: binomial CV sqrt((1-r)/(r·N̂)) with
    N̂ = sampled_users/rate the estimated population. Returns None
    when nothing was sampled (no information, not zero error)."""
    if sampled_users <= 0:
        return None
    n_hat = sampled_users / rate
    return confidence_z * math.sqrt((1.0 - rate) / (rate * n_hat))


def estimated_growth_accounting(
    events: DataFrame,
    rate: float,
    seed: str = "est",
    **growth_kwargs,
) -> DataFrame:
    """Growth-accounting ledger over a user-coherent sample. The
    coherence is what makes this sound: a kept user keeps their WHOLE
    timeline, so their per-bucket classification (new / retained /
    resurrected / churned) is computed EXACTLY — sampling only thins
    which users are counted, and every ledger column is an additive
    user count, so all five scale by 1/rate to population estimates
    (HT, same estimator as the count/retention paths).

    One caveat inherits from the batch operator: the churn cap uses
    the SAMPLE's last observed bucket, which can precede the
    population's on very sparse tails — at practical rates the last
    bucket is shared and the reports align bucket-for-bucket."""
    from .engagement import growth_accounting

    out = growth_accounting(
        user_sample(events, rate, seed,
                    group_col=growth_kwargs.get("group_col",
                                                EVENT_USER_COL)),
        **growth_kwargs)
    if rate == 1.0:
        return out
    inv = 1.0 / float(rate)
    for c in ("new_users", "retained_users", "resurrected_users",
              "churned_users", "active_users"):
        out = out.withColumn(c, (F.col(c) * F.lit(inv)).cast("double"))
    return out
