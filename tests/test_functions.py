"""Tests for the training-data pipeline functions: oracle differentials
run at sf0.001 (the full matrix also runs in tools/check_oracle.py at
sf0.01); multimodal stub contract checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark.functions import multimodal, registry

from tests.conftest import SF_SMALL
from tests.test_relational_oracle import _canon


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_function_matches_oracle(spark, ducks, name):
    got = _canon(registry.QUERIES[name](spark, SF_SMALL).toPandas())
    exp = _canon(ducks.sql(registry.ORACLE_SQL[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            assert np.allclose(
                g.astype(float), e.astype(float), rtol=1e-9, equal_nan=True
            ), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(g, e, check_dtype=False, obj=f"{name}.{c}")


def test_decode_image_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_fake_features_deterministic():
    a = multimodal.fake_image_features(b"hello world")
    b = multimodal.fake_image_features(b"hello world")
    assert np.array_equal(a, b)
    assert a.sum() == len(b"hello world")
    assert len(a) == multimodal.N_BINS
