"""Property-based check (hypothesis) of the streaming sessionize state
function (streaming/sessions.py, vectorized in r5): driven DIRECTLY with
a fake GroupState — no Spark — so hypothesis can sweep thousands of
event layouts cheaply.  Properties:

* CHUNKING-INVARIANCE: however the (time-ordered) event stream is cut
  into micro-batches, the closed sessions equal the naive
  single-pass reference.
* TIMER-INVARIANCE: whether or not Spark's event-time timer fires
  between two batches (it may — the watermark race is real), the final
  session set is identical; a timeout-closed session's sentinel must
  preserve the per-user ordinal.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from distributed_spatial_index_spark.streaming.sessions import (
    _make_session_fn,
)


class FakeState:
    """Duck-typed pyspark.sql.streaming.state.GroupState — exactly the
    surface _make_session_fn touches."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self._wm = 0
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None
        self.timeout_ts = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts

    def getCurrentWatermarkMs(self):
        return self._wm


def _drive(events, cuts, gap_ms, fire_timers):
    """Feed the time-ordered ``events`` through the state fn in chunks
    split at ``cuts``; optionally fire the event-time timer between
    batches exactly when Spark would (watermark = max event time seen,
    0-second lateness; fires when it passes the registered timeout).
    Ends with the stream-end timeout that closes the open session.
    Returns the closed sessions as (session_id, n, start, end)."""
    fn = _make_session_fn(gap_ms)
    state = FakeState()
    out = []
    bounds = [0] + sorted(cuts) + [len(events)]
    chunks = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ]
    wm = 0
    for chunk in chunks:
        if (
            fire_timers
            and state.exists
            and state.timeout_ts is not None
            and wm > state.timeout_ts
        ):
            state.hasTimedOut = True
            state._wm = wm
            out.extend(fn((7,), iter([]), state))
            state.hasTimedOut = False
        state._wm = wm
        pdf = pd.DataFrame(
            {"tms": chunk, "event_id": range(len(chunk))}
        )
        out.extend(fn((7,), iter([pdf]), state))
        wm = max(wm, max(chunk))
    if state.exists and state.get[1] != -1:  # open session remains
        state.hasTimedOut = True
        state._wm = wm + gap_ms + 1
        out.extend(fn((7,), iter([]), state))
    rows = pd.concat(out, ignore_index=True)
    return sorted(
        map(
            tuple,
            rows[["session_id", "n_events", "start_ts", "end_ts"]]
            .itertuples(index=False),
        )
    )


def _naive(events, gap_ms):
    sessions, cur = [], [events[0]]
    for t in events[1:]:
        if t - cur[-1] > gap_ms:
            sessions.append(cur)
            cur = [t]
        else:
            cur.append(t)
    sessions.append(cur)
    return sorted(
        (i + 1, len(s), s[0], s[-1]) for i, s in enumerate(sessions)
    )


deltas_st = st.lists(st.integers(0, 12), min_size=1, max_size=40)


@settings(max_examples=300, deadline=None)
@given(
    deltas=deltas_st,
    cuts=st.lists(st.integers(0, 40), max_size=6),
    gap_ms=st.integers(1, 8),
    fire_timers=st.booleans(),
)
def test_sessionize_state_fn_matches_naive(deltas, cuts, gap_ms, fire_timers):
    events, t = [], 1000
    for d in deltas:
        t += d
        events.append(t)
    cuts = [c for c in cuts if c < len(events)]
    got = _drive(events, cuts, gap_ms, fire_timers)
    assert got == _naive(events, gap_ms)


@settings(max_examples=100, deadline=None)
@given(deltas=deltas_st, cuts=st.lists(st.integers(0, 40), max_size=6),
       gap_ms=st.integers(1, 8))
def test_timer_firing_never_changes_sessions(deltas, cuts, gap_ms):
    events, t = [], 1000
    for d in deltas:
        t += d
        events.append(t)
    cuts = [c for c in cuts if c < len(events)]
    assert _drive(events, cuts, gap_ms, True) == _drive(
        events, cuts, gap_ms, False
    )
