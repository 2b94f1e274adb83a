"""Property-based tests for the RLE core, porting the reference's test
strategy (/root/reference/tests/test_hypothesis.py, tests/hypothesis_helper.py)
with the vendored dense oracle standing in for R/S4Vectors.

Reference properties ported:
- differential binary ops vs oracle (test_hypothesis.py:38-88)
- commutativity of + and * (test_hypothesis.py:91-113)
- inverses (a+b)-b == a and (a/b)*b == a on positive ints (:116-170)
- coverage differential (test_hypothesis_coverage.py:45-84)
- slice subsetting differential (test_subset_coverage.py:40-75)
plus engine-specific invariants: encode∘decode identity, length
preservation, defragment idempotence.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrle_spark import Rle
from pyrle_spark.kernels import rlecore as k

from tests import oracle_rle as oracle

MAX_EXAMPLES = int(__import__("os").environ.get("PYRLE_MAX_EXAMPLES", "100"))

# Mirrors tests/hypothesis_helper.py:25-33 — integer values because float
# equality vs an independent oracle is fragile; runs bounded lower here
# (1e4 not 1e7) because the dense oracle materializes vectors.
runs_st = st.integers(min_value=1, max_value=10_000)
values_st = st.integers(min_value=-10_000, max_value=10_000)
pos_values_st = st.integers(min_value=1, max_value=10_000)


@st.composite
def rle_pairs(draw, positive=False):
    n = draw(st.integers(min_value=1, max_value=20))
    vs = pos_values_st if positive else values_st
    runs = draw(st.lists(runs_st, min_size=n, max_size=n))
    values = draw(st.lists(vs, min_size=n, max_size=n))
    return np.array(runs, dtype=np.int64), np.array(values, dtype=np.float64)


@st.composite
def two_rles(draw, positive=False):
    return draw(rle_pairs(positive)), draw(rle_pairs(positive))


@st.composite
def same_length_triple(draw):
    """Mirrors runlengths_same_length_integers (hypothesis_helper.py:62-69)."""
    n = draw(st.integers(min_value=1, max_value=15))
    runs = draw(st.lists(runs_st, min_size=n, max_size=n))
    v1 = draw(st.lists(pos_values_st, min_size=n, max_size=n))
    v2 = draw(st.lists(pos_values_st, min_size=n, max_size=n))
    return (
        np.array(runs, dtype=np.int64),
        np.array(v1, dtype=np.float64),
        np.array(v2, dtype=np.float64),
    )


# ---------------------------------------------------------------- differential


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(pair=two_rles())
def test_binary_ops_match_oracle(op, pair):
    (r1, v1), (r2, v2) = pair
    a = Rle(r1, v1)
    b = Rle(r2, v2)
    got = {"add": a + b, "sub": a - b, "mul": a * b}[op]
    exp_runs, exp_vals = oracle.binary_op_dense(op, a.runs, a.values, b.runs, b.values)
    assert np.array_equal(got.runs, exp_runs), (got.runs, exp_runs)
    assert np.allclose(got.values, exp_vals, equal_nan=True)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(two_rles())
def test_div_matches_oracle_dense(pair):
    (r1, v1), (r2, v2) = pair
    a = Rle(r1, v1)
    b = Rle(r2, v2)
    got = a / b
    n = max(a.length, b.length)
    exp = oracle.binary_op_dense("div", a.runs, a.values, b.runs, b.values)
    # compare decoded vectors: run boundaries may differ where the
    # constructor's 1e-5 merge kicks in on float quotients
    got_dense = oracle.dense(got.runs, got.values)
    exp_dense = oracle.dense(*exp)
    assert got.length == n
    assert np.allclose(got_dense, exp_dense, equal_nan=True, atol=1e-4)


# ---------------------------------------------------------------- algebraic


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(two_rles())
def test_add_commutative(pair):
    (r1, v1), (r2, v2) = pair
    a, b = Rle(r1, v1), Rle(r2, v2)
    assert (a + b).equals(b + a)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(two_rles())
def test_mul_commutative(pair):
    (r1, v1), (r2, v2) = pair
    a, b = Rle(r1, v1), Rle(r2, v2)
    assert (a * b).equals(b * a)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(same_length_triple())
def test_add_sub_inverse(triple):
    runs, v1, v2 = triple
    a, b = Rle(runs, v1), Rle(np.random.default_rng(0).permutation(runs), v2)
    res = (a + b) - b
    assert np.allclose(
        oracle.dense(res.runs, res.values),
        oracle.dense(a.runs, a.values, res.length),
        equal_nan=True,
    )


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(same_length_triple())
def test_div_mul_inverse(triple):
    runs, v1, v2 = triple
    a, b = Rle(runs, v1), Rle(runs, v2)
    res = (a / b) * b
    assert np.allclose(
        oracle.dense(res.runs, res.values),
        oracle.dense(a.runs, a.values, res.length),
        rtol=1e-9,
    )


# ---------------------------------------------------------------- encode/decode


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=400))
def test_encode_decode_identity(xs):
    arr = np.array(xs, dtype=np.float64)
    runs, values = k.find_runs(arr)
    assert np.array_equal(k.decode_runs(runs, values), arr)
    # no adjacent equal values, no zero runs, length preserved
    assert (runs > 0).all()
    assert not (values[1:] == values[:-1]).any()
    assert runs.sum() == len(arr)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(rle_pairs())
def test_defragment_idempotent(pair):
    r, v = pair
    a = Rle(r, v).defragment()
    b = a.defragment()
    assert a.equals(b)


# ---------------------------------------------------------------- subsetting


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(rle_pairs(), st.integers(0, 300), st.integers(1, 300))
def test_slice_matches_dense(pair, start, diff):
    r, v = pair
    a = Rle(r, v)
    end = start + diff
    got = a[start:end]
    exp = oracle.dense(a.runs, a.values)[start:end]
    assert np.allclose(oracle.dense(got.runs, got.values), exp, equal_nan=True)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(rle_pairs(), st.lists(st.integers(0, 400), min_size=1, max_size=20))
def test_getlocs_matches_dense(pair, locs):
    r, v = pair
    a = Rle(r, v)
    locs = np.sort(np.array(locs, dtype=np.int64))
    got = a.getlocs(locs)
    d = oracle.dense(a.runs, a.values)
    exp = np.array([d[i] if i < len(d) else 0.0 for i in locs])
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=50, deadline=None)
@given(
    rle_pairs(),
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(1, 100)),
        min_size=1,
        max_size=8,
    ),
)
def test_getitems_matches_loop_oracle(pair, queries):
    r, v = pair
    a = Rle(r, v)
    starts = np.array([s for s, _ in queries], dtype=np.int64)
    ends = starts + np.array([d for _, d in queries], dtype=np.int64)
    ids, qs, qe, runs, vals = k.getitems(a.runs, a.values, starts, ends)
    got = list(zip(ids.tolist(), qs.tolist(), qe.tolist(), runs.tolist(), vals.tolist()))
    exp = oracle.getitems_loop(a.runs, a.values, starts, ends)
    # clamp oracle query bounds the same way (positions past total emit nothing)
    assert got == [(i, int(starts[i]), int(ends[i]), rr, vv) for i, _, _, rr, vv in exp]


# ---------------------------------------------------------------- coverage


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_coverage_matches_dense(intervals):
    starts = np.array([s for s, _ in intervals], dtype=np.int64)
    ends = starts + np.array([d for _, d in intervals], dtype=np.int64)
    positions = np.concatenate([starts, ends])
    deltas = np.concatenate([np.ones(len(starts)), -np.ones(len(starts))])
    runs, values = k.coverage(positions, deltas)
    size = int(ends.max())
    exp = oracle.coverage_dense(starts, ends, size=size)
    got = oracle.dense(runs, values)
    assert len(got) == size
    assert np.allclose(got, exp)
    # step function invariants
    assert (runs > 0).all()
    assert runs.sum() == size


# ---------------------------------------------------------------- shift


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(rle_pairs(), st.integers(-50, 50))
def test_shift_matches_dense(pair, dist):
    r, v = pair
    a = Rle(r, v)
    got = a.shift(dist) if dist != 0 else a
    d = oracle.dense(a.runs, a.values)
    if dist >= 0:
        exp = np.concatenate([np.zeros(dist), d])[: len(d)]
    else:
        # slice to the original length: a shift beyond the vector is
        # all-fill, not a longer vector
        exp = np.concatenate([d[-dist:], np.zeros(-dist)])[: len(d)]
    assert got.length == a.length
    assert np.allclose(oracle.dense(got.runs, got.values), exp, equal_nan=True)
