"""Custom stateful streaming operators (SURVEY.md §2 A3/A4 in true
streaming form).

``streaming_lww_latest`` keeps, per ``doc_id``, the highest
``op_sequence`` event seen so far and emits one updated row per key per
micro-batch — arbitrary stateful processing via
``applyInPandasWithState`` (Arrow-batched; state is a single scalar per
key). State is bounded by an EVENT-TIME TIMEOUT tied to the watermark:
a key idle for ``state_ttl_ms`` past the watermark has its state
removed, so state size is O(recently-active keys), not O(all keys ever
seen). After removal a very-late event for that key re-emits into the
changelog, which is safe: the downstream sink merge still enforces the
global LWW floor via its ``op_sequence`` comparison — this operator's
state is a dedup optimization, not the correctness boundary.

This is the operator to reach for when the sink needs a *changelog* of
net-effect updates instead of full-batch merges — e.g. feeding a
downstream cache. The batch engine path (SnapshotSink) does not use it:
its single LWW aggregation is cheaper when the whole batch lands in one
merge anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id string, op_sequence long, op string, n_tok long, event_ts timestamp"
)
STATE_SCHEMA = "max_seq long"


def streaming_lww_latest(
    events: DataFrame,
    watermark_delay: str = "10 minutes",
    state_ttl_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """events (streaming DF with the CDC envelope) → changelog of
    net-new latest versions per key. State: one int64 per active key,
    expired ``state_ttl_ms`` past the event-time watermark.

    The stateful function is a nested closure ON PURPOSE: cloudpickle
    serializes local functions by value, so Python workers need no
    import of this package (module-level functions pickle by reference
    and fail on workers without ``--py-files``/PYTHONPATH)."""

    # Arrow hands the worker SESSION-TIMEZONE-NAIVE timestamps; a bare
    # .timestamp() would read them as UTC, offsetting the armed timeout
    # from the watermark clock by the tz offset (ADVICE round 2) —
    # capture the session tz driver-side into the closure and localize
    session_tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def _latest_per_key(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # watermark passed the TTL — drop the key
            state.remove()
            return
        (doc_id,) = key
        max_seq = state.get[0] if state.exists else -1
        best = None
        for pdf in pdfs:  # Arrow batches for this key in this micro-batch
            cand = pdf.loc[pdf["op_sequence"].idxmax()]
            if cand["op_sequence"] > max_seq:
                max_seq = int(cand["op_sequence"])
                best = cand
        if best is None:  # everything in this batch was stale — no output
            return
        state.update((max_seq,))
        # re-arm expiry relative to max(watermark, this event's time):
        # in the FIRST micro-batch the watermark is still 0, and arming
        # against it would expire every batch-1 key at batch 2 (epoch
        # 1970 + TTL) regardless of activity — the event's own time is
        # the correct floor until the watermark catches up
        ts = pd.Timestamp(best["event_ts"])
        if ts.tzinfo is None:
            ts = ts.tz_localize(session_tz, ambiguous=True, nonexistent="shift_forward")
        event_ms = int(ts.timestamp() * 1000)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), event_ms) + state_ttl_ms
        )
        yield pd.DataFrame(
            {
                "doc_id": [doc_id],
                "op_sequence": [max_seq],
                "op": [best["op"]],
                "n_tok": [None if pd.isna(best["n_tok"]) else int(best["n_tok"])],
                "event_ts": [best["event_ts"]],
            }
        )

    return (
        events.withWatermark("event_ts", watermark_delay)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _latest_per_key,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
