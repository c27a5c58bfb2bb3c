"""Streaming gap-based sessionization: applyInPandasWithState with
EVENT-TIME TIMEOUT — the remaining keyed-state machinery the segment
former (NoTimeout) doesn't exercise.

Semantics mirror operators/windows.sessionize exactly: per user, events
sorted by (ts, event_id); a gap > ``gap_minutes`` closes the session;
session_id is the 1-based per-user ordinal.  A session closes either
because a later event for the same user arrives past the gap (emitted in
that invocation) or because the event-time watermark passes
``last_event + gap`` (emitted by the timeout callback — Spark's state
timeout IS the session-gap timer).

Parity with the batch form is proven in tests/test_streaming.py on a
time-ordered replay; the replay must push the watermark past the last
session's gap (two trailing flush batches) so every open session times
out before the stream ends.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_ts long, end_ts long"
)
# (ordinal of the OPEN session, its start, last event time, its event count)
_STATE_SCHEMA = "ordinal long, start_ts long, last_ts long, n_events long"


def _make_session_fn(gap_ms: int, idle_ttl_ms: int | None = None):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple[int, int, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is final.
            # KEEP the state row (start_ts = -1 sentinel) — it carries the
            # per-user session ordinal, which must survive session closure
            # or the next session's id would restart at 1.
            ordinal, start_ts, last_ts, n = state.get
            if start_ts == -1:
                # second (TTL) timeout on an already-closed sentinel: the
                # user has been idle past idle_ttl — evict the state row.
                # (Only reachable with idle_ttl_ms set; the no-TTL mode
                # never re-arms a timeout on a sentinel.)
                state.remove()
            else:
                out.append((user_id, ordinal, n, start_ts, last_ts))
                state.update((ordinal, -1, last_ts, 0))
                if idle_ttl_ms is not None:
                    # arm the idle sweep: if no event arrives before
                    # last_ts + idle_ttl, the sentinel row is removed above
                    state.setTimeoutTimestamp(
                        max(last_ts + idle_ttl_ms,
                            state.getCurrentWatermarkMs() + 1)
                    )
                # else: no new timeout — the sentinel stays quiet (and
                # resident) until the user's next event
        else:
            pdf = pd.concat(list(batches), ignore_index=True)
            pdf = pdf.sort_values(["tms", "event_id"])
            if state.exists:
                ordinal, start_ts, last_ts, n = state.get
                if start_ts == -1:
                    start_ts, last_ts, n = None, None, 0
            else:
                ordinal, start_ts, last_ts, n = 0, None, None, 0
            # Vectorized gap split (no per-event Python loop): an event
            # OPENS a session when it follows its predecessor — the
            # carry-in last_ts for the first event — by more than the gap;
            # cumsum of those breaks numbers the batch's sessions, with
            # segment 0 (only possible with an open carry-in) extending
            # the carried session.  Every segment but the last closes in
            # this invocation; the last becomes the new open state.
            ts = pdf["tms"].to_numpy(np.int64)
            if len(ts):
                prev0 = last_ts if start_ts is not None else ts[0] - gap_ms - 1
                prev = np.concatenate(([prev0], ts[:-1]))
                seg = np.cumsum((ts - prev) > gap_ms)
                if start_ts is not None and seg[0] != 0:
                    # the carried-in open session got NO events this batch
                    # (the first event already broke the gap): it closes
                    # here with its carried stats
                    out.append((user_id, ordinal, n, start_ts, last_ts))
                uniq, first, counts = np.unique(
                    seg, return_index=True, return_counts=True
                )
                for j in range(len(uniq) - 1):  # closed sessions only
                    s = int(uniq[j])
                    out.append((
                        user_id,
                        ordinal + s,
                        int(counts[j]) + (n if s == 0 else 0),
                        start_ts if s == 0 else int(ts[first[j]]),
                        int(ts[first[j] + counts[j] - 1]),
                    ))
                j, s = len(uniq) - 1, int(uniq[-1])
                start_ts = start_ts if s == 0 else int(ts[first[j]])
                n = int(counts[j]) + (n if s == 0 else 0)
                ordinal, last_ts = ordinal + s, int(ts[-1])
            state.update((ordinal, start_ts, last_ts, n))
            # fire when the watermark passes the session gap; Spark requires
            # a timeout strictly beyond the current watermark
            state.setTimeoutTimestamp(
                max(last_ts + gap_ms, state.getCurrentWatermarkMs() + 1)
            )

        yield pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "start_ts", "end_ts"],
        )

    return fn


def streaming_sessionize(
    event_stream: DataFrame, gap_minutes: int = 30,
    idle_ttl_minutes: int | None = None,
) -> DataFrame:
    """event_stream(user_id, event_id, ts timestamp) -> closed sessions
    (user_id, session_id, n_events, start_ts, end_ts), epoch-ms longs,
    identical to operators/windows.sessionize on the same events.

    ``idle_ttl_minutes``: when set, a user idle past the TTL (event time,
    measured from their last event) has their sentinel state row EVICTED,
    so the state store is bounded by the active-user count instead of the
    all-time user count.  A user returning BEYOND the TTL restarts at
    session_id 1 (the ordinal went with the row) — that is the documented
    trade for bounded state; returning WITHIN the TTL preserves ordinals
    exactly.  Default None keeps the unbounded exact-ordinal semantics
    (bit-identical to the batch twin on any replay)."""
    prepared = event_stream.withWatermark("ts", "0 seconds").select(
        "user_id", "event_id", F.col("ts"),
        F.unix_millis(F.col("ts")).alias("tms"),
    )
    ttl_ms = None if idle_ttl_minutes is None else idle_ttl_minutes * 60_000
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes * 60_000, ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
