"""Attribution semantics pinned on a hand-computed fixture. All five
models are hash-oracled in the suite; the fractional ones
(linear/time_decay/position) run a deterministic round-9 decimal
share pipeline, so hand-computed expectations here use approx at the
quantization bound."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.dsl import EventFilterSpec, EventRef, QueryTime
from optiprism_spark.operators.attribution import attribution_report

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)
WINDOW = QueryTime.between(dt.datetime(2024, 1, 1),
                           dt.datetime(2024, 1, 31, 23, 59, 59))
TOUCHES = EventRef(custom=[
    EventFilterSpec(EventRef("ad")),
    EventFilterSpec(EventRef("email")),
])


@pytest.fixture(scope="module")
def events(spark):
    def e(i, hours, user, ev, value=0.0):
        return (i, T0 + dt.timedelta(hours=hours), user, ev, value, "{}")

    rows = [
        # u1: ad(-50h), email(-2h), purchase($10) — last=email, first=ad
        e(1, -50, 1, "ad"), e(2, -2, 1, "email"), e(3, 0, 1, "purchase", 10.0),
        # u2: email(-200h: outside 7d lookback? 200h < 168h? no, 200h > 168h
        #     => OUTSIDE), purchase($5) — unattributed
        e(4, -200, 2, "email"), e(5, 0, 2, "purchase", 5.0),
        # u3: no touches, purchase($3) — unattributed
        e(6, 0, 3, "purchase", 3.0),
        # u4: ad(-1h), two purchases ($7 at 0h, $2 at +1h) — both last=ad
        e(7, -1, 4, "ad"), e(8, 0, 4, "purchase", 7.0),
        e(9, 1, 4, "purchase", 2.0),
        # u5: touch AFTER the purchase only — unattributed
        e(10, 2, 5, "ad"), e(11, 0, 5, "purchase", 4.0),
        # u6: tie ts — ad(id12) and email(id13) at the same instant,
        #     last-touch picks higher event_id (email), first lower (ad)
        e(12, -3, 6, "ad"), e(13, -3, 6, "email"),
        e(14, 0, 6, "purchase", 6.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _report(events, model):
    return {
        r["channel"]: (r["n_conversions"], r["revenue"])
        for r in attribution_report(
            events, channel_col=F.col("event_type"),
            touch_event=TOUCHES, conversion_event=EventRef("purchase"),
            time=WINDOW, model=model, lookback=dt.timedelta(days=7),
        ).collect()
    }


def test_last_touch(events):
    assert _report(events, "last_touch") == {
        "email": (2, 16.0),   # u1 ($10), u6 tie -> email ($6)
        "ad": (2, 9.0),       # u4 both purchases
        "(none)": (3, 12.0),  # u2 (outside lookback), u3, u5
    }


def test_first_touch(events):
    assert _report(events, "first_touch") == {
        "ad": (4, 25.0),      # u1 ($10), u4 ($9), u6 tie -> ad ($6)
        "(none)": (3, 12.0),
    }


def test_linear_differential(events):
    out = _report(events, "linear")
    # u1: 10 split ad/email; u4: 9 all ad; u6: 6 split ad/email
    assert out["ad"][1] == pytest.approx(5.0 + 9.0 + 3.0)
    assert out["email"][1] == pytest.approx(5.0 + 3.0)
    assert out["ad"][0] == pytest.approx(0.5 + 2.0 + 0.5)
    assert out["email"][0] == pytest.approx(0.5 + 0.5)
    assert out["(none)"] == (3.0, 12.0)
    # credit conservation: channel revenue sums to total revenue
    assert sum(v for _, v in out.values()) == pytest.approx(10 + 5 + 3 + 7 + 2 + 4 + 6)


def test_time_decay_hand_computed(events):
    """One-day half-life: u1's ad (50h old) weighs 0.5^(50/24) vs
    email (2h) at 0.5^(2/24); u4's single touch takes all; u6's tie
    (both 3h old) splits 50/50."""

    out = _report(events, "time_decay")
    w_ad = round(0.5 ** (50.0 / 24.0), 9)
    w_em = round(0.5 ** (2.0 / 24.0), 9)
    s_ad = round(w_ad / (w_ad + w_em), 9)
    s_em = round(w_em / (w_ad + w_em), 9)
    tol = 1e-8
    assert out["ad"][0] == pytest.approx(s_ad + 2.0 + 0.5, abs=tol)
    assert out["email"][0] == pytest.approx(s_em + 0.5, abs=tol)
    assert out["ad"][1] == pytest.approx(
        round(10 * s_ad, 6) + 9.0 + 3.0, abs=tol)
    assert out["email"][1] == pytest.approx(
        round(10 * s_em, 6) + 3.0, abs=tol)
    assert out["(none)"] == (3.0, 12.0)


def test_position_hand_computed(spark):
    """U-shape on a 4-touch path: 40/then 20 split across 2 middles
    (10 each)/40; 2-touch paths 50/50; 1-touch paths 100%."""
    T = dt.datetime(2024, 1, 10, 0, 0, 0)

    def e(i, hours, user, ev, value=0.0):
        return (i, T + dt.timedelta(hours=hours), user, ev, value, "{}")

    rows = [
        # u1: ad, email, ad, search -> purchase $100
        e(1, -10, 1, "ad"), e(2, -8, 1, "email"),
        e(3, -6, 1, "ad"), e(4, -4, 1, "search"),
        e(5, 0, 1, "purchase", 100.0),
        # u2: ad, email -> purchase $10 (50/50)
        e(6, -2, 2, "ad"), e(7, -1, 2, "email"),
        e(8, 0, 2, "purchase", 10.0),
        # u3: email -> purchase $7 (100%)
        e(9, -1, 3, "email"), e(10, 0, 3, "purchase", 7.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    touches = EventRef(custom=[
        EventFilterSpec(EventRef("ad")),
        EventFilterSpec(EventRef("email")),
        EventFilterSpec(EventRef("search")),
    ])
    out = {
        r["channel"]: (r["n_conversions"], r["revenue"])
        for r in attribution_report(
            events, channel_col=F.col("event_type"),
            touch_event=touches, conversion_event=EventRef("purchase"),
            time=WINDOW, model="position", lookback=dt.timedelta(days=7),
        ).collect()
    }
    tol = 1e-8
    # u1: ad first (0.4) + ad middle (0.1); u2: ad 0.5
    assert out["ad"][0] == pytest.approx(0.4 + 0.1 + 0.5, abs=tol)
    assert out["ad"][1] == pytest.approx(40 + 10 + 5, abs=tol)
    # u1: email middle (0.1); u2: email 0.5; u3: email 1.0
    assert out["email"][0] == pytest.approx(0.1 + 0.5 + 1.0, abs=tol)
    assert out["email"][1] == pytest.approx(10 + 5 + 7, abs=tol)
    # u1: search last (0.4)
    assert out["search"][0] == pytest.approx(0.4, abs=tol)
    assert out["search"][1] == pytest.approx(40.0, abs=tol)


def test_bad_model_rejected(events):
    with pytest.raises(ValueError):
        attribution_report(
            events, channel_col=F.col("event_type"),
            touch_event=TOUCHES, conversion_event=EventRef("purchase"),
            time=WINDOW, model="u_shaped")


def test_linear_conservation_on_real_data(spark):
    """On the sf0.01 corpus: every conversion's value lands somewhere
    (channels + (none) sum to the exact total), under every model."""
    from optiprism_spark.schema import load_table

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    W = QueryTime.between(dt.datetime(2024, 1, 1),
                          dt.datetime(2024, 1, 31, 23, 59, 59))
    touches = EventRef(custom=[
        EventFilterSpec(EventRef("view")),
        EventFilterSpec(EventRef("click")),
    ])
    total = events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-01"))
        & (F.col("ts") <= F.lit("2024-01-31 23:59:59"))
    ).agg(F.sum("value"), F.count(F.lit(1))).collect()[0]
    for model in ("first_touch", "last_touch", "linear", "time_decay",
                  "position"):
        rep = attribution_report(
            events, channel_col=F.col("event_type"),
            touch_event=touches, conversion_event=EventRef("purchase"),
            time=W, model=model, lookback=dt.timedelta(days=7),
        ).collect()
        # fractional models quantize each credited row's share to 9
        # decimals and its revenue to 6 (the hash-exact pipeline), so
        # conservation holds to the per-row quantization bound, not to
        # double epsilon; rel=1e-7 covers tens of thousands of rows
        assert sum(r["revenue"] for r in rep) == pytest.approx(
            total[0], rel=1e-7)
        assert sum(r["n_conversions"] for r in rep) == pytest.approx(
            total[1], rel=1e-7)


def test_touch_cap_no_op_when_under_cap(events):
    """Guard with cap >= any user's touch count is a pure no-op for
    every model (the cutoff frame is empty; the left join keeps
    everything)."""
    for model in ("last_touch", "first_touch", "linear"):
        want = _report(events, model)
        got = {
            r["channel"]: (r["n_conversions"], r["revenue"])
            for r in attribution_report(
                events, channel_col=F.col("event_type"),
                touch_event=TOUCHES, conversion_event=EventRef("purchase"),
                time=WINDOW, model=model, lookback=dt.timedelta(days=7),
                max_touches_per_user=100,
            ).collect()
        }
        assert got == want, model


def test_touch_cap_bounds_whale_and_keeps_model_side(spark):
    """A whale user with 1000 touches before one purchase: cap=5 must
    (a) bound the join fan-out to 5 rows, (b) preserve last_touch
    exactly (keep='last' retains the latest touches — the credited
    one), and (c) preserve first_touch exactly (keep='first' retains
    the earliest)."""
    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    rows = [(i, t0 - dt.timedelta(minutes=1000 - i), 9,
             "ad" if i % 2 else "email", 0.0, "{}")
            for i in range(1, 1001)]
    rows.append((2000, t0, 9, "purchase", 50.0, "{}"))
    whale = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    def rep(model, cap):
        return {
            r["channel"]: (r["n_conversions"], r["revenue"])
            for r in attribution_report(
                whale, channel_col=F.col("event_type"),
                touch_event=TOUCHES, conversion_event=EventRef("purchase"),
                time=WINDOW, model=model, lookback=dt.timedelta(days=7),
                max_touches_per_user=cap,
            ).collect()
        }

    # last touch = id 1000 (even -> email); first = id 1 (odd -> ad)
    assert rep("last_touch", 5) == _cap_free(whale, "last_touch")
    assert rep("first_touch", 5) == _cap_free(whale, "first_touch")
    # linear under the cap credits only the 5 kept touches: shares
    # sum to the one conversion, revenue to its full value
    lin = rep("linear", 5)
    assert abs(sum(v[0] for v in lin.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in lin.values()) - 50.0) < 1e-9


def _cap_free(events, model):
    return {
        r["channel"]: (r["n_conversions"], r["revenue"])
        for r in attribution_report(
            events, channel_col=F.col("event_type"),
            touch_event=TOUCHES, conversion_event=EventRef("purchase"),
            time=WINDOW, model=model, lookback=dt.timedelta(days=7),
        ).collect()
    }


def test_null_channel_is_not_none_bucket(spark):
    """A matched touch whose CHANNEL value is null is its own (null)
    group — only genuinely unattributed conversions land in '(none)'
    (r14 advice: the old coalesce conflated the two; the DuckDB
    oracle always grouped raw nulls separately)."""
    rows = [
        # u1: ad touch with a NULL channel prop, then a purchase
        (1, T0 - dt.timedelta(hours=1), 1, "ad", 0.0, "{}"),
        (2, T0, 1, "purchase", 10.0, "{}"),
        # u2: purchase with no touch at all — the real '(none)'
        (3, T0, 2, "purchase", 5.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    for model in ("last_touch", "first_touch", "linear",
                  "time_decay", "position"):
        got = {
            r["channel"]: r["revenue"]
            for r in attribution_report(
                events,
                # a channel expression that is NULL on the touch row
                channel_col=F.get_json_object(F.col("props"), "$.ch"),
                touch_event=TOUCHES,
                conversion_event=EventRef("purchase"),
                time=WINDOW, model=model,
                lookback=dt.timedelta(days=7),
            ).collect()
        }
        assert got == {None: 10.0, "(none)": 5.0}, (model, got)


def test_time_decay_rejects_nonpositive_half_life(events):
    """halfLifeDays=0 would make the decay exponent age/0 (NaN weight
    surviving F.greatest); negative inverts the decay. Both fail
    loudly (the server maps ValueError to a 400)."""
    for bad in (dt.timedelta(0), dt.timedelta(days=-1)):
        with pytest.raises(ValueError, match="half_life must be positive"):
            attribution_report(
                events, channel_col=F.col("event_type"),
                touch_event=TOUCHES, conversion_event=EventRef("purchase"),
                time=WINDOW, model="time_decay",
                lookback=dt.timedelta(days=7), half_life=bad)
    # other models ignore half_life entirely — a zero must NOT trip
    attribution_report(
        events, channel_col=F.col("event_type"),
        touch_event=TOUCHES, conversion_event=EventRef("purchase"),
        time=WINDOW, model="linear",
        lookback=dt.timedelta(days=7), half_life=dt.timedelta(0))
