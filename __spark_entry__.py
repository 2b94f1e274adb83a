"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: RLE-encode documents.lang at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — duckdb-runnable ANSI SQL twins, column-name aligned.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyrle_spark.operators import relational

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.rle_encode_lang(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    # unconditional: a broken import inside functions/ must FAIL the
    # contract loudly, not silently shrink the query registry to the
    # relational subset (bench.py imports it unconditionally too)
    from pyrle_spark.functions import registry as fn_registry

    out.update(fn_registry.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per queries() key (omitted keys → rows-only check)."""
    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    from pyrle_spark.functions import registry as fn_registry

    out.update(fn_registry.ORACLE_SQL)
    return out
