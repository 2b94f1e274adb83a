"""Combined query/oracle registry for the functions package."""

from __future__ import annotations

from pyrle_spark.functions import (
    dedup,
    events,
    lm,
    multimodal,
    quantize,
    similarity,
    sketch,
    text,
    web,
)

QUERIES = {}
ORACLE_SQL = {}
for mod in (text, dedup, similarity, multimodal, sketch, quantize, web, events, lm):
    QUERIES.update(mod.QUERIES)
    ORACLE_SQL.update(mod.ORACLE_SQL)
