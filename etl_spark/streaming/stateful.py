"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference guarantees per-key apply ordering and at-least-once delivery
(apply.rs:249-300 progress tracking; architecture.md:119-136 "duplicates
resolved by key+sequence at destinations"). The sinks here already dedup by
``event_seq`` at merge time; this module provides the IN-STREAM variant: a
per-key high-watermark state that drops replayed or out-of-order change
events before they reach any sink — the shape to use when a destination is
append-only or too dumb to merge (webhooks, message buses).

Spark shape: ``groupBy(key).applyInPandasWithState`` — state is the
reference's ``EventSequenceKey {commit_lsn, tx_ordinal}`` (event.rs:323-344)
as two longs, Arrow-batched, managed by the streaming state store. At
cluster scale the state is partitioned by key hash across executors and
checkpointed incrementally; with the RocksDB state store provider it spills
off-heap, so the operator holds 10⁹ keys without executor-memory pressure.
No driver-side anything.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [StructField("max_commit_lsn", LongType()), StructField("max_tx_ordinal", LongType())]
)


def dedup_apply(
    pdfs: Iterator[pd.DataFrame],
    state,
    commit_col: str = "commit_lsn",
    ordinal_col: str = "tx_ordinal",
) -> Iterator[pd.DataFrame]:
    """The per-group dedup kernel (module-level so unit/property tests can
    drive it with a fake GroupState — no streaming query needed).

    Invariants (property-tested): emitted sequences are strictly
    increasing across the group's whole lifetime; nothing emits twice;
    an exact replay of already-seen batches emits nothing.
    """
    c0, o0 = state.get if state.exists else (-1, -1)
    start = (c0, o0)
    for pdf in pdfs:
        fresh = pdf[
            (pdf[commit_col] > c0) | ((pdf[commit_col] == c0) & (pdf[ordinal_col] > o0))
        ].sort_values([commit_col, ordinal_col])
        # same sequence delivered twice inside one batch → keep first
        fresh = fresh[~fresh[[commit_col, ordinal_col]].duplicated(keep="first")]
        if len(fresh):
            tail = fresh.iloc[-1]
            c0, o0 = int(tail[commit_col]), int(tail[ordinal_col])
            yield fresh
    if (c0, o0) > start:
        state.update((c0, o0))


def dedup_by_sequence(
    events: DataFrame,
    key_cols: list[str],
    commit_col: str = "commit_lsn",
    ordinal_col: str = "tx_ordinal",
) -> DataFrame:
    """Exactly-once-ify an at-least-once change stream, per key.

    Emits each group's events strictly in ``(commit_lsn, tx_ordinal)``
    order and drops any event at or below the group's high watermark —
    replays from a restarted producer, duplicated batches, and
    out-of-order stragglers all die here. State survives across
    micro-batches (and restarts, via the checkpoint), so a later replay of
    an already-applied batch is filtered even though it arrives fresh.

    Output schema = input schema, unchanged.
    """
    out_schema = events.schema

    def apply(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return dedup_apply(pdfs, state, commit_col, ordinal_col)

    return events.groupBy(*key_cols).applyInPandasWithState(
        apply,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful sessionization with EVENT-TIME TIMEOUT (X100): the
# applyInPandasWithState shape for session semantics the built-in
# session_window can't express (custom close rules, per-session running
# state, explicit timeout emission). Sessions close two ways:
#   'gap'     — the key's next event arrives more than gap_us later
#               (within a batch, or across batches via the carried state);
#   'timeout' — the watermark passes last_event + gap with no new data
#               (GroupStateTimeout.EventTimeTimeout) — the streaming
#               analog of the reference's slot-idle eviction.
# State per key is one open session (4 scalars); the state store hash-
# partitions keys across executors and RocksDB spills off-heap at scale.
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("max_v", DoubleType()),
])

_SESSION_COLS = ["user_id", "start_us", "end_us", "n_events", "max_value", "closed_by"]


def session_apply(
    key: tuple, pdfs: Iterator[pd.DataFrame], state, gap_us: int
) -> Iterator[pd.DataFrame]:
    """Per-key session kernel (module-level for fake-state unit tests).

    Vectorized gap split: sessions are ``cumsum(diff(us) > gap)`` groups
    over the key's sorted batch, folded onto the carried open session.
    Emits CLOSED sessions only; the open tail stays in state with its
    timeout re-armed at ``last + gap`` event time.
    """
    import numpy as np

    (uid,) = key
    if state.hasTimedOut:
        start, last, n, mx = state.get
        state.remove()
        yield pd.DataFrame(
            [[uid, start, last, n, mx, "timeout"]], columns=_SESSION_COLS
        )
        return
    data = pd.concat(list(pdfs))
    us = data["us"].to_numpy(dtype="int64")
    vals = data["value"].to_numpy(dtype="float64")
    order = np.argsort(us, kind="stable")
    us = us[order]
    vals = vals[order]
    # batch gap-groups as intervals [start, last, n, max]; each is
    # internally gap-connected by construction. Group bounds come from
    # one diff + reduceat pass — O(events), never O(groups x events):
    # at 10^9 keys the kernel's per-key cost is the scale limit, so no
    # per-group boolean masks.
    intervals: list[list] = []
    if len(us):
        starts = np.concatenate(([0], np.flatnonzero(np.diff(us) > gap_us) + 1))
        ends = np.concatenate((starts[1:], [len(us)]))
        # nanmax semantics, vectorized: remap ONLY NaNs to -inf before the
        # reduce (np.nan_to_num would also clamp genuine ±inf to ±1.8e308);
        # then restore NaN for all-NaN groups — counted exactly, so a
        # group whose true max IS -inf still reports -inf, not NaN
        nan_mask = np.isnan(vals)
        maxes = np.maximum.reduceat(np.where(nan_mask, -np.inf, vals), starts)
        all_nan = np.add.reduceat(nan_mask.astype(np.int64), starts) == (ends - starts)
        maxes = np.where(all_nan, np.nan, maxes)
        intervals = [
            [int(us[s]), int(us[e - 1]), int(e - s), float(mx)]
            for s, e, mx in zip(starts, ends, maxes)
        ]
    # fold the carried open session in as one more interval, then
    # sweep-merge by start. A late (within-watermark) group may land
    # INSIDE or BEFORE the carried session — folding groups onto the state
    # in batch order would move the session end backwards (re-arming the
    # timeout early) or split on a batch-internal gap the carried interval
    # actually covers; the interval merge handles both, because a
    # gap-connected interval reaches any point within gap of its bounds.
    if state.exists:
        intervals.append(list(state.get))
    intervals.sort(key=lambda iv: (iv[0], iv[1]))
    merged: list[list] = []
    for iv in intervals:
        if merged and iv[0] - merged[-1][1] <= gap_us:
            top = merged[-1]
            top[1] = max(top[1], iv[1])
            top[2] += iv[2]
            top[3] = max(top[3], iv[3])
        else:
            merged.append(list(iv))
    closed = [[uid, m_[0], m_[1], m_[2], m_[3], "gap"] for m_ in merged[:-1]]
    if merged:
        cur = merged[-1]
        state.update(tuple(cur))
        # re-arm: event-time timeout at last + gap, clamped above the
        # current watermark (Spark rejects timestamps at/below it)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((cur[1] + gap_us) // 1000, wm_ms + 1))
    if closed:
        yield pd.DataFrame(closed, columns=_SESSION_COLS)


def sessionize_stateful(
    events: DataFrame,
    gap_us: int,
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming custom sessionization: group by user, fold batches into
    the per-key open-session state, emit closed sessions (append mode).
    ``events`` must carry a watermark on ``time_col`` — the timeout clock.
    """
    from pyspark.sql.types import StringType

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
        StructField("closed_by", StringType()),
    ])

    def apply(key, pdfs, state):
        return session_apply(key, pdfs, state, gap_us)

    return events.groupBy("user_id").applyInPandasWithState(
        apply,
        outputStructType=out_schema,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
