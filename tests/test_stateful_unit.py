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
