"""Property test for the streaming sessionization state algebra.

``stream_sessionize``'s correctness rests on one claim: folding events
into gap-mergeable fragments is ASSOCIATIVE and COMMUTATIVE, so the
final state is independent of how the stream slices and orders
arrivals.  The Spark plumbing (handler, state encoding, state-store
reader) is oracle-certified end-to-end by the ``stream_sessionize``
registry query; this suite pins the algebra itself — pure numpy, no
Spark session — over randomized event sets, partitionings, and fold
orders, against the direct single-pass sessionization of the sorted
event list.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrle_spark.streaming.sessionize_stream import (
    _batch_fragments,
    _merge_fragments,
)

GAP = 100


def _sessions_direct(ts: list[int], gap: int) -> list[list[int]]:
    """Reference: sessionize the fully sorted event list in one pass."""
    return _batch_fragments(np.asarray(sorted(ts), dtype=np.int64), gap)


events_strategy = st.lists(
    st.integers(min_value=0, max_value=5_000), min_size=1, max_size=200
)


@settings(max_examples=200, deadline=None)
@given(
    ts=events_strategy,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_batches=st.integers(min_value=1, max_value=8),
)
def test_fragment_fold_is_order_independent(ts, seed, n_batches):
    rng = np.random.default_rng(seed)
    arr = np.asarray(ts, dtype=np.int64)
    # random partition into micro-batches, folded in random order —
    # the adversarial arrival pattern a file stream can produce
    assign = rng.integers(0, n_batches, size=len(arr))
    frags: list[list[int]] = []
    for b in rng.permutation(n_batches):
        batch = arr[assign == b]
        if len(batch):
            frags.extend(_batch_fragments(batch, GAP))
        frags = _merge_fragments(frags, GAP)
    assert frags == _sessions_direct(ts, GAP)


@settings(max_examples=100, deadline=None)
@given(ts=events_strategy)
def test_fragment_counts_conserve_events(ts):
    frags = _merge_fragments(
        _batch_fragments(np.asarray(ts, dtype=np.int64), GAP), GAP
    )
    assert sum(f[2] for f in frags) == len(ts)
    # fragments are disjoint beyond the gap and start-sorted
    for a, b in zip(frags, frags[1:]):
        assert b[0] > a[1] + GAP
    for s, e, _ in frags:
        assert s <= e


def test_exact_gap_boundary_joins():
    # an inter-event gap of exactly GAP stays in ONE session (the batch
    # oracle's rule is `gap > GAP_US` starts a new session)
    assert _sessions_direct([0, GAP], GAP) == [[0, GAP, 2]]
    assert _sessions_direct([0, GAP + 1], GAP) == [[0, 0, 1], [GAP + 1, GAP + 1, 1]]
