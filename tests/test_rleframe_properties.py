"""The reference's algebraic battery, run THROUGH the distributed path:
RleFrame ops on multi-key inputs (incl. keys missing on one side — the
zero-extension rule) differentially compared against the vendored dense
oracle (tests/oracle_rle.py, the R/S4Vectors stand-in).

The kernel-level battery (test_rle_properties.py) proves the numpy
kernels; this file proves the Spark plumbing around them — full-outer
key alignment, Arrow round trips, blocked layout — preserves the same
algebra.  One seeded multi-key frame per run keeps it to a handful of
Spark jobs instead of one per hypothesis example; each key IS an
independent random example (properties: test_hypothesis.py:38-170)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark.operators.rleframe import RleFrame, _keyed_schema

from tests import oracle_rle as oracle

N_KEYS = 24
SEED = 20260817


def _random_rles(rng, keys, positive=False):
    out = {}
    for key in keys:
        n = int(rng.integers(1, 16))
        runs = rng.integers(1, 500, n).astype(np.int64)
        lo = 1 if positive else -1000
        values = rng.integers(lo, 1000, n).astype(np.float64)
        out[key] = (runs, values)
    return out


def _frame(spark, rles):
    rows = [(key, r.tolist(), v.tolist()) for key, (r, v) in rles.items()]
    df = spark.createDataFrame(rows, schema=_keyed_schema(["key"]))
    return RleFrame(df, ["key"])


@pytest.fixture(scope="module")
def sides(spark):
    rng = np.random.default_rng(SEED)
    all_keys = [f"k{i:02d}" for i in range(N_KEYS)]
    # keys 0-1 only on side A, 2-3 only on side B → zero-extension paths
    a = _random_rles(rng, [k for k in all_keys if k not in ("k02", "k03")])
    b = _random_rles(rng, [k for k in all_keys if k not in ("k00", "k01")])
    return a, b, _frame(spark, a), _frame(spark, b)


def _oracle_binary(op, a, b, key):
    """Dense-oracle result for one key under the RleFrame alignment rule:
    a missing side is a zero-Rle of the present side's length."""
    ra, va = a.get(key, (None, None))
    rb, vb = b.get(key, (None, None))
    if ra is None:
        total = int(np.sum(rb))
        ra, va = np.array([total], dtype=np.int64), np.array([0.0])
    if rb is None:
        total = int(np.sum(ra))
        rb, vb = np.array([total], dtype=np.int64), np.array([0.0])
    return oracle.binary_op_dense(op, ra, va, rb, vb)


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_distributed_binary_matches_dense_oracle(sides, op):
    a, b, fa, fb = sides
    got = fa._apply_or_binary(fb, op).to_rledict()
    for key in sorted(set(a) | set(b)):
        er, ev = _oracle_binary(op, a, b, key)
        g = got[key]
        np.testing.assert_allclose(
            oracle.dense(g.runs, g.values),
            oracle.dense(er, ev),
            equal_nan=True,
            err_msg=f"{op}/{key}",
        )


def test_distributed_add_commutative(sides):
    _, _, fa, fb = sides
    ab = (fa + fb).to_rledict()
    ba = (fb + fa).to_rledict()
    assert set(ab.keys()) == set(ba.keys())
    for key in ab.keys():
        np.testing.assert_allclose(
            oracle.dense(ab[key].runs, ab[key].values),
            oracle.dense(ba[key].runs, ba[key].values),
            err_msg=key,
        )


def test_distributed_mul_commutative(sides):
    _, _, fa, fb = sides
    ab = (fa * fb).to_rledict()
    ba = (fb * fa).to_rledict()
    for key in ab.keys():
        np.testing.assert_allclose(
            oracle.dense(ab[key].runs, ab[key].values),
            oracle.dense(ba[key].runs, ba[key].values),
            err_msg=key,
        )


def test_distributed_add_sub_inverse(sides):
    """(a + b) - b == a zero-extended to the result length
    (test_hypothesis.py:116-140 through the cluster path)."""
    a, b, fa, fb = sides
    res = ((fa + fb) - fb).to_rledict()
    for key in res.keys():
        ra, va = a.get(key, (np.array([], dtype=np.int64), np.array([])))
        got = oracle.dense(res[key].runs, res[key].values)
        want = oracle.dense(ra, va, length=len(got))
        np.testing.assert_allclose(got, want, err_msg=key)


def test_distributed_div_mul_inverse(spark):
    """(a / b) * b == a on positive integers (test_hypothesis.py:142-170)."""
    rng = np.random.default_rng(SEED + 1)
    keys = [f"p{i}" for i in range(8)]
    a = _random_rles(rng, keys, positive=True)
    b = _random_rles(rng, keys, positive=True)
    fa, fb = _frame(spark, a), _frame(spark, b)
    res = ((fa / fb) * fb).to_rledict()
    for key in keys:
        ra, va = a[key]
        got = oracle.dense(res[key].runs, res[key].values)
        want = oracle.dense(ra, va, length=len(got))
        # beyond min(len) the inverse is 0/0*0 = nan*0 = nan — compare
        # only the overlap where both sides were defined, like the
        # reference property does
        n = min(int(np.sum(ra)), int(np.sum(b[key][0])), len(got))
        np.testing.assert_allclose(got[:n], want[:n], err_msg=key)


def test_distributed_eq_matches_driver_layer(sides):
    """Comparison through the cluster path == the driver-compat Rle
    path per key on identical multi-key input (NaN-extension rules
    included; note RleDict.__eq__ itself is the collection-bool quirk,
    so the driver twin is built per key with explicit zero-Rles for
    missing keys, matching methods.py:104-111)."""
    a, b, fa, fb = sides
    from pyrle_spark.rle import Rle

    def mk(r, v):
        rle = Rle.__new__(Rle)
        rle.runs, rle.values = np.copy(r), np.copy(v)
        return rle

    got = fa.compare(fb, "eq").to_rledict()
    for key in sorted(set(a) | set(b)):
        ra, va = a.get(key, (None, None))
        rb, vb = b.get(key, (None, None))
        if ra is None:
            ra, va = np.array([int(np.sum(rb))], dtype=np.int64), np.array([0.0])
        if rb is None:
            rb, vb = np.array([int(np.sum(ra))], dtype=np.int64), np.array([0.0])
        want = mk(ra, va) == mk(rb, vb)
        np.testing.assert_array_equal(got[key].runs, want.runs, err_msg=key)
        np.testing.assert_array_equal(got[key].values, want.values, err_msg=key)


def test_blocked_layer_same_algebra(sides):
    """The whole battery's core identity also holds through the BLOCKED
    layout: rechunk → op → unchunk equals the unblocked op exactly for
    integer-valued inputs."""
    a, b, fa, fb = sides
    got = (fa.rechunk(256) + fb.rechunk(256)).unchunk().to_rledict()
    want = (fa + fb).to_rledict()
    assert set(got.keys()) == set(want.keys())
    for key in got.keys():
        np.testing.assert_array_equal(got[key].runs, want[key].runs, err_msg=key)
        np.testing.assert_array_equal(got[key].values, want[key].values, err_msg=key)
