"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and sorted values
(numeric columns within 1e-9 relative tolerance; exact otherwise).

Usage: python tools/check_oracle.py [name ...]
       SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 \
       SPARK_GRAFT_ORACLE_JSON=CORRECTNESS_r03_sf01.json \
           python tools/check_oracle.py      # driver-file-shaped artifact
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from pyrle_spark.operators.relational import TABLES  # noqa: E402
from pyrle_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("bool"):
            df[c] = df[c].astype(bool)
        elif str(df[c].dtype).startswith("datetime64"):
            # Spark toPandas gives ns, duckdb gives us — same instants
            # must not fail the dtype-strict equals
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"row count differs: spark={len(got)} duckdb={len(exp)}")
        return problems
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            ok = np.allclose(
                gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True
            )
            exact = np.array_equal(
                gv.astype(float).to_numpy(),
                ev.astype(float).to_numpy(),
                equal_nan=True,  # NaN == NaN here, or every NaN column warns
            )
            if not ok:
                problems.append(f"column {c}: values differ beyond tolerance")
            elif not exact:
                problems.append(
                    f"column {c}: WARNING float values close but not bit-equal "
                    f"(value-hash would mismatch)"
                )
        else:
            if not gv.equals(ev):
                bad = (gv != ev).to_numpy().nonzero()[0][:3]
                problems.append(
                    f"column {c}: mismatch at rows {bad.tolist()}: "
                    f"spark={gv.iloc[bad].tolist()} duckdb={ev.iloc[bad].tolist()}"
                )
    return problems


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd name must not silently skip everything and exit 0
        print(f"unknown query name(s): {sorted(unknown)}")
        print(f"valid names: {sorted(queries)}")
        return 2
    failures = 0
    records: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark {type(exc).__name__}: {exc}"[:400],
            }
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle, rows-only check)")
            records[name] = {
                "rows_match": True, "schema_match": None, "hash_match": None,
                "spark_rows": len(got), "oracle_rows": None, "err": None,
            }
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(got), "oracle_rows": None,
                "err": f"duckdb {type(exc).__name__}: {exc}"[:400],
            }
            failures += 1
            continue
        problems = compare(got, exp)
        dt = time.time() - t0
        hard = [p for p in problems if not p.startswith("column") or "WARNING" not in p]
        records[name] = {
            "rows_match": len(got) == len(exp),
            "schema_match": sorted(got.columns) == sorted(exp.columns),
            "hash_match": not problems,  # bit-equal incl. float warnings
            "spark_rows": len(got),
            "oracle_rows": len(exp),
            "err": "; ".join(problems)[:400] if hard else None,
        }
        if hard:
            print(f"FAIL  {name} ({dt:.1f}s, {len(got)} rows)")
            for p in problems:
                print(f"      - {p}")
            failures += 1
        else:
            note = "; ".join(p for p in problems if "WARNING" in p)
            print(f"ok    {name} ({dt:.1f}s, {len(got)} rows){' | ' + note if note else ''}")
    out_json = os.environ.get("SPARK_GRAFT_ORACLE_JSON")
    if out_json:
        if only and os.path.exists(out_json):
            # partial refresh: merge the rows just run into the existing
            # artifact (new queries certified without re-running all)
            with open(out_json) as f:
                prior = json.load(f)
            prior.update(records)
            records = prior
        with open(out_json, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {out_json} ({len(records)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
