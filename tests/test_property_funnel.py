"""Property-based tests of the funnel state machine (`_run_machine`)
— the pure-Python kernel, fuzzed with hypothesis over random event
sequences. The reference only stubs fuzzing (query/fuzz/); here the
invariants actually run:

- an exact in-window k-step sequence always converts
- attempts never overlap and never exceed the event count
- completed conversions are monotone under event-stream append
  (non-unique mode): more data can never lose a conversion
- unique mode emits at most one completed conversion
- window violations never produce a completed attempt whose span
  exceeds the window
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from optiprism_spark.operators.funnel import _run_machine

K = 3
WINDOW_US = 1_000_000  # 1s


def run(labels, ts, window_us=WINDOW_US, unique=False, k=K):
    """labels: per-event step index (0..k-1) or -1 (irrelevant rows are
    pre-filtered out in the real operator, so -1 never matches)."""
    ts = np.asarray(ts, dtype=np.int64)
    steps = [np.array([l == i for l in labels]) for i in range(k)]
    return _run_machine(
        ts, steps, excludes=[], consts=[], step_orders=["exact"] * k,
        window_us=window_us, k=k, flt=None, unique=unique,
    )


# strictly increasing timestamps with random gaps
_ts_gaps = st.lists(st.integers(min_value=1, max_value=600_000), min_size=0, max_size=40)
_labels = st.lists(st.integers(min_value=0, max_value=K - 1), min_size=0, max_size=40)


def _mk(ts_gaps, labels):
    n = min(len(ts_gaps), len(labels))
    ts = np.cumsum(np.asarray(ts_gaps[:n], dtype=np.int64))
    return list(labels[:n]), ts


@settings(max_examples=300, deadline=None)
@given(_ts_gaps, _labels)
def test_attempts_bounded_and_completions_valid(ts_gaps, labels):
    labels, ts = _mk(ts_gaps, labels)
    out = run(labels, ts)
    assert len(out) <= len(labels)  # each attempt consumes ≥1 matching row
    for steps_completed, done, sts in out:
        assert 1 <= steps_completed <= K
        assert done == (steps_completed == K)
        # recorded per-step timestamps are non-decreasing and in-window
        seen = [t for t in sts if t is not None]
        assert seen == sorted(seen)
        assert len(seen) == steps_completed
        if done:
            assert seen[-1] - seen[0] <= WINDOW_US


@settings(max_examples=300, deadline=None)
@given(_ts_gaps, _labels)
def test_append_monotone_completions(ts_gaps, labels):
    """Appending events never loses a completed conversion (non-unique)."""
    labels, ts = _mk(ts_gaps, labels)
    if len(labels) < 2:
        return
    cut = len(labels) // 2
    full = sum(1 for s, d, _ in run(labels, ts) if d)
    prefix = sum(1 for s, d, _ in run(labels[:cut], ts[:cut]) if d)
    assert full >= prefix


@settings(max_examples=300, deadline=None)
@given(_ts_gaps, _labels)
def test_unique_mode_single_conversion(ts_gaps, labels):
    labels, ts = _mk(ts_gaps, labels)
    completed = [a for a in run(labels, ts, unique=True) if a[1]]
    assert len(completed) <= 1


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=400_000))
def test_clean_sequence_always_converts(gap_us):
    """0,1,2 within the window always completes exactly once."""
    ts = np.array([0, gap_us, 2 * gap_us], dtype=np.int64)
    out = run([0, 1, 2], ts)
    assert [(s, d) for s, d, _ in out] == [(3, True)]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=WINDOW_US + 1, max_value=10 * WINDOW_US))
def test_out_of_window_never_completes(gap_us):
    ts = np.array([0, gap_us, gap_us + 1], dtype=np.int64)
    out = run([0, 1, 2], ts)
    assert all(not d for _, d, _ in out)
