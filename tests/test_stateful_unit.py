"""Property tests for the stateful-dedup kernel (no streaming query —
the reference property-tests its ordering/dedup invariants the same way,
value_roundtrip.rs-style: generate adversarial inputs, assert invariants).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_spark.streaming.stateful import dedup_apply


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def run_batches(batches, state):
    emitted = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["commit_lsn", "tx_ordinal"]).astype("int64")
        for out in dedup_apply(iter([pdf]), state):
            emitted.extend([tuple(r) for r in out.itertuples(index=False)])
    return emitted


seqs = st.tuples(st.integers(0, 5), st.integers(0, 3))
batches_strat = st.lists(st.lists(seqs, min_size=0, max_size=8), min_size=1, max_size=6)


@given(batches_strat)
@settings(max_examples=200, deadline=None)
def test_emitted_strictly_increasing_and_unique(batches):
    emitted = run_batches(batches, FakeState())
    assert emitted == sorted(set(emitted)), emitted


@given(batches_strat)
@settings(max_examples=200, deadline=None)
def test_full_replay_emits_nothing(batches):
    state = FakeState()
    run_batches(batches, state)
    assert run_batches(batches, state) == []


@given(batches_strat)
@settings(max_examples=200, deadline=None)
def test_emits_exactly_the_running_maxima(batches):
    # reference semantics: an event is applied iff it advances the group's
    # high watermark at its arrival moment (architecture.md:119-136)
    emitted = run_batches(batches, FakeState())
    # expectation: per batch, the sorted fresh sequences above the running
    # watermark, watermark advancing as they emit
    wm, expect = (-1, -1), []
    for batch in batches:
        for s in sorted(set(batch)):
            if s > wm:
                expect.append(s)
                wm = s
    assert emitted == expect


def test_empty_batch_keeps_state():
    state = FakeState()
    run_batches([[(1, 0)]], state)
    run_batches([[]], state)
    assert state.get == (1, 0)


class FakeSessionState:
    def __init__(self, timed_out=False, value=None, wm_ms=0):
        self._v = tuple(value) if value else None
        self.hasTimedOut = timed_out
        self._wm = wm_ms
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _sess(pdfs, state, gap=100):
    import pandas as pd

    from etl_spark.streaming.stateful import session_apply

    out = list(session_apply((7,), iter(pdfs), state, gap))
    return pd.concat(out) if out else None


def test_session_kernel_gap_splits_and_state_fold():
    import pandas as pd

    # batch 1: two gap-separated sessions; the second stays open in state
    st = FakeSessionState()
    out = _sess([pd.DataFrame({"us": [0, 50, 300], "value": [1.0, 5.0, 2.0]})], st)
    assert out[["start_us", "end_us", "n_events", "max_value", "closed_by"]
               ].values.tolist() == [[0, 50, 2, 5.0, "gap"]]
    assert st.get == (300, 300, 1, 2.0)
    # re-armed at max((last+gap)//1000, wm+1) = max(0, 1)
    assert st.timeout_ms == 1
    # batch 2 continues the open session (gap ≤ 100), then a far event
    # closes it
    out2 = _sess([pd.DataFrame({"us": [380, 900], "value": [9.0, 1.0]})], st)
    assert out2.values.tolist() == [[7, 300, 380, 2, 9.0, "gap"]]
    assert st.get == (900, 900, 1, 1.0)


def test_session_kernel_timeout_emission():
    import pandas as pd

    st = FakeSessionState(timed_out=True, value=(10, 60, 3, 4.5))
    out = _sess([], st)
    assert out.values.tolist() == [[7, 10, 60, 3, 4.5, "timeout"]]
    assert st.removed


def test_session_kernel_timeout_clamped_above_watermark():
    import pandas as pd

    st = FakeSessionState(wm_ms=10_000)
    _sess([pd.DataFrame({"us": [5_000_000], "value": [1.0]})], st)  # last+gap ≪ wm
    assert st.timeout_ms == 10_001  # clamped above the current watermark


def test_session_kernel_late_event_never_moves_end_backwards():
    import pandas as pd

    # carried open session [1000, 2000]; a LATE within-watermark event at
    # us=1500 arrives in the next batch — folding must keep end at 2000
    # (not move it back to 1500, which would re-arm the timeout early) and
    # an even-earlier event must extend the start downward
    st = FakeSessionState(value=(1000, 2000, 2, 3.0))
    out = _sess([pd.DataFrame({"us": [950, 1500], "value": [7.0, 1.0]})], st)
    assert out is None  # still open — nothing closed
    assert st.get == (950, 2000, 4, 7.0)
    # timeout re-armed at (true last)+gap, not the late event's time
    assert st.timeout_ms == max((2000 + 100) // 1000, 1)


@given(
    st.lists(st.integers(0, 3000), min_size=1, max_size=40),
    st.integers(10, 200),
    st.data(),
)
@settings(max_examples=120, deadline=None)
def test_session_sweep_merge_matches_bruteforce(times, gap, data):
    """Property: for ANY partition of the (sorted) stream into batches —
    including trailing events delivered one batch late and intra-batch
    disorder — the sweep-merge kernel's closed sessions plus the final
    open state equal the single-pass sessionization of the full stream.
    (Late delivery is bounded to one batch: an event can never arrive
    after a sweep that closed its session, matching the watermark
    contract that gates the real stream.)"""
    times = sorted(times)
    # ground truth: split the sorted stream where the gap exceeds `gap`
    truth = []
    cur = [times[0], times[0], 1]
    for t in times[1:]:
        if t - cur[1] <= gap:
            cur = [cur[0], t, cur[2] + 1]
        else:
            truth.append(tuple(cur))
            cur = [t, t, 1]
    truth.append(tuple(cur))

    # batches: contiguous chunks, then move each boundary's trailing
    # events one batch forward, then shuffle within each batch
    n_cuts = data.draw(st.integers(0, min(4, len(times) - 1)))
    cuts = sorted(data.draw(
        st.lists(st.integers(1, len(times) - 1), min_size=n_cuts,
                 max_size=n_cuts, unique=True)
    )) if n_cuts else []
    chunks = []
    prev = 0
    for c in cuts + [len(times)]:
        chunks.append(list(times[prev:c]))
        prev = c
    for i in range(len(chunks) - 1):
        k = data.draw(st.integers(0, min(2, len(chunks[i]) - 1)))
        if k:
            moved, chunks[i] = chunks[i][-k:], chunks[i][:-k]
            chunks[i + 1] = moved + chunks[i + 1]
    chunks = [c for c in chunks if c]
    for c in chunks:
        data.draw(st.randoms()).shuffle(c)

    from etl_spark.streaming.stateful import session_apply

    state = FakeSessionState()
    emitted = []
    for batch in chunks:
        pdf = pd.DataFrame({"us": batch, "value": [float(t % 7) for t in batch]})
        for out in session_apply((1,), iter([pdf]), state, gap):
            emitted.extend(
                (r.start_us, r.end_us, r.n_events) for r in out.itertuples()
            )
    if state.exists:
        s0, s1, n, _mx = state.get
        emitted.append((s0, s1, n))
    assert sorted(emitted) == sorted(truth), (times, gap, chunks)


def test_session_kernel_max_preserves_infinity(spark_noop=None):
    """ADVICE r9 regression (stateful.py): np.nan_to_num(nan=-inf) also
    clamps genuine +/-inf to +/-1.8e308 — a group whose true max IS
    infinite must report it. Only NaNs are remapped before the reduce;
    all-NaN groups still report NaN (exact nanmax semantics)."""
    import math

    import pandas as pd

    inf = float("inf")
    # +inf survives the reduce
    st1 = FakeSessionState()
    out1 = _sess([pd.DataFrame({"us": [0, 50, 300], "value": [1.0, inf, 2.0]})], st1)
    assert out1["max_value"].tolist() == [inf]
    # a group of only -inf reports -inf (NOT the all-NaN NaN sentinel,
    # NOT -1.8e308)
    st2 = FakeSessionState()
    out2 = _sess([pd.DataFrame({"us": [0, 50, 300], "value": [-inf, -inf, 2.0]})], st2)
    assert out2["max_value"].tolist() == [-inf]
    # an all-NaN group still reports NaN
    st3 = FakeSessionState()
    nan = float("nan")
    out3 = _sess([pd.DataFrame({"us": [0, 50, 300], "value": [nan, nan, 2.0]})], st3)
    assert math.isnan(out3["max_value"].tolist()[0])
