"""Differential tests: every relational operator vs its duckdb oracle at
sf0.001 — the same comparison the driver's correctness gate performs
(row count, column names, sorted values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark.operators import relational

from tests.conftest import SF_SMALL


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_query_matches_oracle(spark, ducks, name):
    got = _canon(relational.QUERIES[name](spark, SF_SMALL).toPandas())
    exp = _canon(ducks.sql(relational.ORACLE_SQL[name]).df())
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


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
