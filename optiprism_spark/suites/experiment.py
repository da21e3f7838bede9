"""A/B experiment oracle suite (beyond the reference — it ships no
experiment readout; see operators/experiment.py).

The z-score arithmetic is mirrored expression-for-expression —
(p·(1−p))·(1/n₁+1/n_c) with the same association — so the doubles
match bit-for-bit across engines; no tolerance needed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ..dsl import EventRef, PropertyRef, QueryTime
from ..exprs import prop_col
from ..operators.experiment import experiment_report
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))

#: derived variant: the synthetic corpus carries no assignment prop,
#: so bucket the int prop k into three arms (deterministic, mirrors
#: what a real deployment puts in an $exp property)
_N_ARMS = 3


def _variant_sql() -> str:
    return ("'v' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) "
            f"% {_N_ARMS} AS VARCHAR)")


def _variant_col():
    k = prop_col(PropertyRef.json("k", "int64"))
    return F.concat(F.lit("v"), (k % _N_ARMS).cast("string"))


@query(
    "exp_view_to_purchase",
    oracle=f"""
    WITH fe AS (
      SELECT user_id, t0, variant FROM (
        SELECT user_id, ts AS t0, {_variant_sql()} AS variant,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'view'
      ) t WHERE rn = 1
    ), cm AS (
      SELECT user_id, MAX(ts) AS conv_max FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1
    ), pu AS (
      SELECT variant,
             CASE WHEN conv_max > t0 THEN 1 ELSE 0 END AS converted
      FROM fe LEFT JOIN cm USING (user_id)
    ), pv AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS cvr
      FROM pu GROUP BY 1
    ), c AS (
      SELECT n_users AS cn, n_converted AS cx, cvr AS ccvr
      FROM pv WHERE variant = 'v0'
    )
    SELECT variant, n_users, n_converted, cvr,
           CASE WHEN variant <> 'v0' THEN cvr - ccvr END AS lift,
           CASE WHEN variant <> 'v0'
                     AND sqrt((p * (1.0 - p)) * (1.0 / n_users + 1.0 / cn)) > 0
                THEN (cvr - ccvr)
                     / sqrt((p * (1.0 - p)) * (1.0 / n_users + 1.0 / cn))
           END AS z_score
    FROM (
      SELECT pv.*, c.*,
             CAST(n_converted + cx AS DOUBLE) / (n_users + cn) AS p
      FROM pv, c
    ) x
    """,
)
def exp_view_to_purchase(spark, sf_dir):
    """Three-arm experiment: first-touch assignment at the user's
    first view (variant = k % 3 over the exposure row's JSON prop),
    conversion = any purchase strictly after it; per-arm conversion
    rate, lift vs v0, pooled two-proportion z-score."""
    return experiment_report(
        load_table(spark, sf_dir, "events"),
        variant_col=_variant_col(),
        exposure_event=EventRef("view"),
        conversion_event=EventRef("purchase"),
        time=_FULL,
        control="v0",
    )


@query(
    "exp_srm_check",
    oracle=f"""
    WITH fe AS (
      SELECT user_id, variant FROM (
        SELECT user_id, {_variant_sql()} AS variant,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'view'
      ) t WHERE rn = 1
    ), c AS (
      SELECT variant, COUNT(*) AS n_users FROM fe GROUP BY 1
    ), tot AS (
      SELECT SUM(n_users) AS total, COUNT(*) AS k FROM c
    ), x AS (
      SELECT variant, n_users,
             CAST(total AS DOUBLE) * (1.0 / CAST(k AS DOUBLE))
               AS expected_users,
             round((CAST(n_users AS DOUBLE)
                    - CAST(total AS DOUBLE) * (1.0 / CAST(k AS DOUBLE)))
                   * (CAST(n_users AS DOUBLE)
                      - CAST(total AS DOUBLE) * (1.0 / CAST(k AS DOUBLE)))
                   / (CAST(total AS DOUBLE) * (1.0 / CAST(k AS DOUBLE))), 9)
               AS chi2_contrib
      FROM c, tot
    ), s AS (
      SELECT CAST(SUM(CAST(chi2_contrib AS DECIMAL(28,9))) AS DOUBLE)
               AS chi2_stat,
             COUNT(*) - 1 AS df
      FROM x
    )
    SELECT x.variant, x.n_users, x.expected_users, x.chi2_contrib,
           s.chi2_stat,
           COALESCE(s.chi2_stat > CASE s.df
             WHEN 1 THEN 10.828 WHEN 2 THEN 13.816 WHEN 3 THEN 16.266
             WHEN 4 THEN 18.467 WHEN 5 THEN 20.515 WHEN 6 THEN 22.458
             WHEN 7 THEN 24.322 WHEN 8 THEN 26.124 WHEN 9 THEN 27.877
           END, FALSE) AS srm_flag
    FROM x, s
    """,
)
def exp_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch health gate on the three-arm experiment:
    first-exposure user counts per arm vs the equal allocation, the
    chi-square statistic, and the alpha=0.001 flag. An SRM means the
    assignment mechanism is broken and every readout is invalid."""
    from ..operators.experiment import srm_check

    return srm_check(
        load_table(spark, sf_dir, "events"),
        variant_col=_variant_col(),
        exposure_event=EventRef("view"),
        time=_FULL,
    )


def _wilson_sql() -> str:
    from ..operators.experiment import Z_95

    # the constants go through VARCHAR -> DOUBLE, NOT bare literals:
    # DuckDB parses a 17-digit literal as DECIMAL(17,16) whose
    # integer mantissa exceeds 2^53, and the DECIMAL -> DOUBLE
    # conversion then double-rounds to a NEIGHBORING double (caught
    # by the sf0.001 oracle suite as a 1-ulp ci_low mismatch);
    # string -> double parsing is correctly rounded in both engines
    z = f"CAST('{Z_95!r}' AS DOUBLE)"
    z2 = f"CAST('{Z_95 * Z_95!r}' AS DOUBLE)"
    # expression structure mirrors conversion_wilson_ci verbatim
    # (same literals, same association) so the doubles match
    # bit-for-bit: denom = 1 + z²/n, center = (p + z²/(2n))/denom,
    # half = z·sqrt(p(1−p)/n + z²/(4n²))/denom
    return f"""
    WITH fe AS (
      SELECT user_id, t0, variant FROM (
        SELECT user_id, ts AS t0, {_variant_sql()} AS variant,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'view'
      ) t WHERE rn = 1
    ), cm AS (
      SELECT user_id, MAX(ts) AS conv_max FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1
    ), pu AS (
      SELECT variant,
             CASE WHEN conv_max > t0 THEN 1 ELSE 0 END AS converted
      FROM fe LEFT JOIN cm USING (user_id)
    ), pv AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS cvr
      FROM pu GROUP BY 1
    ), x AS (
      SELECT variant, n_users, n_converted, cvr,
             CAST(n_users AS DOUBLE) AS n
      FROM pv
    )
    SELECT variant, n_users, n_converted, cvr,
           ((cvr + {z2} / (2.0 * n)) / (1.0 + {z2} / n))
             - (({z} * sqrt(cvr * (1.0 - cvr) / n
                            + {z2} / (4.0 * n * n)))
                / (1.0 + {z2} / n)) AS ci_low,
           ((cvr + {z2} / (2.0 * n)) / (1.0 + {z2} / n))
             + (({z} * sqrt(cvr * (1.0 - cvr) / n
                            + {z2} / (4.0 * n * n)))
                / (1.0 + {z2} / n)) AS ci_high
    FROM x
    """


@query("exp_conversion_wilson_ci", oracle=_wilson_sql())
def exp_conversion_wilson_ci(spark, sf_dir):
    """Per-arm conversion rate with the 95% Wilson score interval
    (operators/experiment.conversion_wilson_ci) — the error bars an
    experiment UI draws next to the lift readout; Wilson rather than
    Wald so arms near 0%/100% or with few users keep honest,
    in-[0,1] bounds."""
    from ..operators.experiment import conversion_wilson_ci

    return conversion_wilson_ci(
        load_table(spark, sf_dir, "events"),
        variant_col=_variant_col(),
        exposure_event=EventRef("view"),
        conversion_event=EventRef("purchase"),
        time=_FULL,
    )
