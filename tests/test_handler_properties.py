"""Property tests for the pandas state handlers' pure fold logic —
BATCH-SPLIT INDEPENDENCE: however a key's event sequence is sliced into
micro-batches, the final state (and for monotone handlers, the emitted
set) must equal the one-shot computation. This is the invariant that
makes the streaming operators' DuckDB oracles valid at ANY batch count,
and it runs without a SparkSession (pure handler + fake GroupState).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_state_provider_spark.streaming.stateful import (
    ewma_handler,
    make_quota_handler,
)


class FakeGroupState:
    """The slice of the GroupState API the NoTimeout handlers touch."""

    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        assert self._val is not None
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    @property
    def hasTimedOut(self):
        return False


def _run_batches(handler, batches):
    state = FakeGroupState()
    emitted = []
    for pdfs in batches:
        emitted.extend(handler((1,), iter(pdfs), state))
    return state, emitted


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_ewma_fold_batch_split_independent(vals, cuts):
    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(range(len(vals)), unit="s"),
            "event_id": range(len(vals)),
            "value": vals,
        }
    )
    # one-shot fold
    one_state, _ = _run_batches(ewma_handler, [[rows]])
    # arbitrary prefix splits (sorted unique cut points)
    points = sorted({c for c in cuts if 0 < c < len(vals)})
    chunks, prev = [], 0
    for c in points + [len(vals)]:
        chunks.append([rows.iloc[prev:c]])
        prev = c
    split_state, _ = _run_batches(ewma_handler, chunks)
    assert split_state.get == one_state.get  # bit-exact, not approx


@given(
    n_rows=st.integers(min_value=0, max_value=60),
    cap=st.integers(min_value=1, max_value=20),
    cut=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=60, deadline=None)
def test_quota_admits_first_n_regardless_of_split(n_rows, cap, cut):
    rows = pd.DataFrame(
        {
            "source": ["s"] * n_rows,
            "doc_id": range(n_rows),
            "n_chars": [10] * n_rows,
        }
    )
    handler = make_quota_handler(cap)
    cut = min(cut, n_rows)
    _, emitted = _run_batches(
        handler, [[rows.iloc[:cut]], [rows.iloc[cut:]]]
    )
    out = (
        pd.concat(emitted)
        if emitted
        else pd.DataFrame(columns=["source", "doc_id", "quota_pos"])
    )
    assert list(out["doc_id"]) == list(range(min(cap, n_rows)))
    assert list(out["quota_pos"]) == list(
        range(1, min(cap, n_rows) + 1)
    )


@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=500, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_cusum_state_batch_split_independent(vals, cuts):
    from spark_state_provider_spark.streaming.stateful import (
        make_cusum_handler,
    )

    handler = make_cusum_handler(6000, 100000)
    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(range(len(vals)), unit="s"),
            "event_id": range(len(vals)),
            "value": vals,
        }
    )
    one_state, _ = _run_batches(handler, [[rows]])
    points = sorted({c for c in cuts if 0 < c < len(vals)})
    chunks, prev = [], 0
    for c in points + [len(vals)]:
        chunks.append([rows.iloc[prev:c]])
        prev = c
    split_state, _ = _run_batches(handler, chunks)
    assert split_state.get == one_state.get
