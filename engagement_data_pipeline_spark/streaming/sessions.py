"""Streaming sessionization — the custom stateful operator path
(brief §"Structured Streaming": applyInPandasWithState).

State per user = the one OPEN session (start, end, n). Each
micro-batch folds its events into that state in time order; a gap
larger than the timeout CLOSES the current session (emitted
downstream, append mode) and opens a new one. Replayed history
through availableNow therefore converges to exactly the batch
`operators/sessions.py:sessionize` result for every closed session —
which is what the test asserts.

Scale: state is O(users) rows of 3 scalars; the Arrow transfer moves
each micro-batch's rows once; grouping hashes on the user key like
any shuffle. Event-time ordering within a batch is handled by the
sort inside the kernel; cross-batch disorder follows source file
order (for out-of-order sources, put a watermark + sort upstream or
widen the gap).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events bigint")
STATE_SCHEMA = "start timestamp, end timestamp, n bigint"


def _make_kernel(gap_minutes: int):
    gap = pd.Timedelta(minutes=gap_minutes)

    def fold_sessions(key, pdfs, state: GroupState):
        (user_id,) = key
        events = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, end, n = state.get
            start, end = pd.Timestamp(start), pd.Timestamp(end)
        else:
            start = end = None
            n = 0
        closed = []
        for ts in events["ts"]:
            if start is None:
                start = end = ts
                n = 1
            elif ts - end > gap:
                closed.append((user_id, start, end, n))
                start = end = ts
                n = 1
            else:
                end = max(end, ts)
                n += 1
        state.update((start.to_pydatetime(), end.to_pydatetime(), int(n)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"])

    return fold_sessions


def streaming_sessionize(stream: DataFrame, user_col: str = "user_id",
                         gap_minutes: int = 30) -> DataFrame:
    """Append-mode stream of CLOSED sessions per user. The stream must
    have columns (`user_col`, ts: timestamp)."""
    return stream.groupBy(user_col).applyInPandasWithState(
        _make_kernel(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
