"""Headline benchmark: one JSON line for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

- q_encode_webtext: generate deterministic webtext sized to the scale
  factor and run the full block-encode pipeline (the north-rule metric;
  also reports encode GB/s and compression ratio)
- q_verify_decode: checksum-verify every encoded block (full decode)
- four relational headliners from the oracle-checked operator suite

Output: {"metric": "...", "value": total_sec, "unit": "sec",
         "queries": {...}, "sf": ..., plus encode_gb_per_s /
         compression_ratio / ref_rle_ratio extras}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyrle_spark.functions import registry as fn_registry  # noqa: E402
from pyrle_spark.operators import relational  # noqa: E402
from pyrle_spark.plans.encode_job import (  # noqa: E402
    EncodeConfig,
    decode_table,
    encode_parquet_dir,
    verify_checksums,
)
from pyrle_spark.session import get_spark  # noqa: E402
from pyrle_spark.sources.webtext import generate_webtext  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# tmpfs scratch: don't let the single virtual disk's writeback throttle
# the measurement (cluster storage bandwidth scales with nodes)
SCRATCH = "/dev/shm/pyrle_bench" if os.path.isdir("/dev/shm") else None
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WEBTEXT_COLS = ["url", "warc_ts", "html", "text", "lang"]


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def reference_rle_bytes(spark, n_rows: int) -> int:
    """Compressed size the *reference's* data model would produce on the
    same columns: int64 runs + float64 values per run (pyrle stores both
    at full width, /root/reference/pyrle/rle.py:146-147); string columns
    enter that model as dictionary codes, so their dictionary bytes are
    charged too.  Computed exactly on a sample block, scaled."""
    import numpy as np
    import pyarrow as pa

    from pyrle_spark.codecs.rle_codec import exact_find_runs

    sample_n = min(n_rows, 50_000)
    pdf = generate_webtext(spark, sample_n, n_partitions=8).toPandas()
    total = 0
    for col in WEBTEXT_COLS:
        s = pdf[col]
        if s.dtype == object:
            codes, uniques = s.factorize()
            runs, _ = exact_find_runs(codes.astype(np.int64))
            dict_bytes = int(
                sum(len(x if isinstance(x, bytes) else str(x).encode()) for x in uniques)
            )
            total += len(runs) * 16 + dict_bytes
        else:
            vals = s.to_numpy()
            if np.issubdtype(vals.dtype, np.datetime64):
                vals = vals.astype("datetime64[us]").astype(np.int64)
            runs, _ = exact_find_runs(vals)
            total += len(runs) * 16
    return int(total * (n_rows / sample_n))


def main() -> None:
    sf = _sf_of(SF_DIR)
    # Encode phase is measured at TWO slot counts — 3/4 of the cores
    # (python codec workers leave headroom for the JVM scan/Arrow-IPC
    # threads) and all cores — and the best wins: which one measures
    # faster flips with the host's CPU-steal weather, and the bench
    # should report the machine's capability, not the weather.  The
    # relational phase (pure JVM, whole-stage codegen) uses all cores in
    # its own session afterwards.
    slot_options = sorted({max(8, (CPUS * 3) // 4) if CPUS > 8 else CPUS, CPUS})
    enc_slots = slot_options[0]
    # this session is reused by the first loop iteration → same config
    # (shuffle partitions pinned to slots) as the sessions the loop builds
    spark = get_spark("bench_encode", cpus=enc_slots, shuffle_partitions=enc_slots)
    # The timed encode runs AT LEAST BASELINE.md's measured-ceiling
    # configuration (4M rows ≈ 3.4 GB) for any sf ≥ 0.1 — 6M·sf rows
    # when that is larger — so encode_gb_per_s in BENCH_r*.json is
    # comparable to the baseline number: at sf-sized inputs (600k rows
    # at sf0.1) per-job fixed costs (job scheduling, Arrow worker round
    # trips) dominate and the figure under-reports the machine by >2×.
    # Relational queries still run at the sf directory.  Override for
    # quick local iteration with SPARK_GRAFT_ENCODE_ROWS.  The scan
    # split confs set below deliberately stay for the verify pass in the
    # same (short-lived, stopped right after) session.
    n_rows = int(os.environ.get("SPARK_GRAFT_ENCODE_ROWS", "0")) or max(
        int(6_000_000 * sf), 20_000, 4_000_000 if sf >= 0.1 else 0
    )
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    if SCRATCH:
        os.makedirs(SCRATCH, exist_ok=True)
    out_dir = tempfile.mkdtemp(prefix="bench_enc_", dir=SCRATCH)
    shutil.rmtree(out_dir, ignore_errors=True)
    # BENCH/BASELINE.md's exact block configuration (32768 rows/block →
    # 122 blocks at 4M rows), fixed and independent of the slot count so
    # every measured session encodes the identical job.  Swept locally:
    # 32768 beats 16384 / 49152 / 62500 / 83334 at both slot counts
    # (enough blocks for balanced waves, large enough to amortize
    # per-block Arrow/codec overhead).
    block_rows = 32_768 if n_rows >= 1_000_000 else max(4096, -(-n_rows // 96))
    # setup (untimed): materialize the webtext table to parquet — the
    # timed job then measures read → shuffle-to-blocks → encode → write,
    # the realistic end-to-end encode pass over an existing table
    src_dir = tempfile.mkdtemp(prefix="bench_src_", dir=SCRATCH)
    shutil.rmtree(src_dir, ignore_errors=True)
    generate_webtext(spark, n_rows, block_rows=block_rows).write.parquet(src_dir)
    f_sizes = [
        os.path.getsize(os.path.join(src_dir, f))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    ]
    summary = None
    # BENCH/scaling.py's alternated best-of discipline (r02 verdict task
    # #2): visit each slot count TWICE, interleaved, 2 warm reps per
    # visit — a host CPU-steal burst that spans one visit cannot define
    # any slot count's number, and the full per-rep wall list is
    # recorded so the spread is part of the artifact, not folklore.
    wall_runs: dict[int, list[float]] = {s: [] for s in slot_options}
    src_files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    for slots in slot_options * 2:
        if spark is None:
            spark = get_spark("bench_encode", cpus=slots, shuffle_partitions=slots)
        # scan split = one block file, for the JVM-side VERIFY pass only
        # (the timed encode is file-direct since r3: the workers read the
        # parquet themselves — see encode_parquet_dir — so the raw bytes
        # never pay the JVM scan + Arrow-IPC double transfer)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(f_sizes)))
        spark.conf.set("spark.sql.files.openCostInBytes", str(max(f_sizes)))
        # warm-up (untimed): one small encode pass through the identical
        # read→encode→write path; first use pays one-time JVM JIT +
        # python-worker spawn (~10s) that a long-running cluster never sees
        warm_dir = tempfile.mkdtemp(prefix="bench_warm_", dir=SCRATCH)
        shutil.rmtree(warm_dir, ignore_errors=True)
        encode_parquet_dir(
            spark,
            src_dir,
            warm_dir,
            EncodeConfig(
                columns=WEBTEXT_COLS, block_rows=block_rows, block_aligned=True,
                input_presorted=True,
            ),
            files=src_files[: min(4, len(src_files))],
        )
        verify_checksums(spark, warm_dir)
        shutil.rmtree(warm_dir, ignore_errors=True)
        # Best-of-all-reps per slot count: the sandbox VM sees bursty
        # host CPU steal that can inflate an arbitrary run 3-4×; the
        # minimum of the warm runs reports the machine's actual
        # capability, and every rep's wall is recorded.  Output identity
        # across every run and slot count is separately asserted (same
        # bytes_out, checksums green).
        for rep in range(2):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            # source written one file per block → file-direct encode:
            # the JVM plans (footer pass, resume join, commit), the Arrow
            # workers stream parquet → codecs → parquet
            s = encode_parquet_dir(
                spark,
                src_dir,
                out_dir,
                EncodeConfig(
                    columns=WEBTEXT_COLS, block_rows=block_rows, block_aligned=True,
                    input_presorted=True,
                ),
                files=src_files,
            )
            dt = round(time.time() - t0, 3)
            if "q_encode_webtext" not in queries or dt < queries["q_encode_webtext"]:
                queries["q_encode_webtext"] = dt
            # encode_gb_per_s uses the Spark-job wall (s["wall_s"]) — the
            # same basis as BENCH/BASELINE.md's scaling harness — while
            # q_encode_webtext reports the full end-to-end call including
            # manifest/lineage writing
            wall_runs[slots].append(round(s["wall_s"], 3))
            if (
                "encode_wall_s" not in extras
                or s["wall_s"] < extras["encode_wall_s"]
            ):
                extras["encode_wall_s"] = round(s["wall_s"], 3)
                extras["encode_slots"] = slots
            if summary is not None and s["bytes_out"] != summary["bytes_out"]:
                raise AssertionError("encode output differs between runs")
            summary = s

            t0 = time.time()
            res = verify_checksums(spark, out_dir)
            dt = round(time.time() - t0, 3)
            queries["q_verify_decode"] = min(
                queries.get("q_verify_decode", dt), dt
            )
            assert res["bad"] == 0, res

            # selective single-column decode: the columnar claim is that
            # projecting one column reads ONE column's blocks (the scan
            # filters `column = 'lang'` down to parquet), not the table.
            # Timed against the full decode the checksum pass just paid.
            t0 = time.time()
            n_dec = decode_table(spark, out_dir, columns=["lang"]).count()
            dt = round(time.time() - t0, 3)
            assert n_dec == n_rows, (n_dec, n_rows)
            queries["q_decode_one_col"] = min(
                queries.get("q_decode_one_col", dt), dt
            )
        spark.stop()
        spark = None

    extras["encode_gb_per_s"] = round(
        summary["bytes_in"] / 1e9 / extras["encode_wall_s"], 4
    )
    extras["encode_total_gb_per_s"] = round(
        summary["bytes_in"] / 1e9 / queries["q_encode_webtext"], 4
    )
    # spread across ALL recorded reps (both slot counts, both visits):
    # median + [worst, best] GB/s plus the raw walls — the number
    # BASELINE.md states is the one this harness reproduces, and the
    # weather is visible in the artifact instead of explaining it away
    all_walls = sorted(w for ws in wall_runs.values() for w in ws)
    mid = len(all_walls) // 2
    median_wall = (
        all_walls[mid]
        if len(all_walls) % 2
        else (all_walls[mid - 1] + all_walls[mid]) / 2
    )
    extras["encode_wall_runs"] = {str(k): v for k, v in wall_runs.items()}
    extras["encode_gb_per_s_median"] = round(
        summary["bytes_in"] / 1e9 / median_wall, 4
    )
    extras["encode_gb_per_s_spread"] = [
        round(summary["bytes_in"] / 1e9 / max(all_walls), 4),
        round(summary["bytes_in"] / 1e9 / min(all_walls), 4),
    ]
    extras["compression_ratio"] = round(
        summary["bytes_in"] / max(summary["bytes_out"], 1), 3
    )
    # decode side of the headline: full decode+crc throughput over the
    # RAW (reconstructed) bytes, and the selective-projection factor —
    # one column out of five should cost a small fraction of the full
    # decode, or the "columnar" in columnar_encode is marketing
    extras["decode_gb_per_s"] = round(
        summary["bytes_in"] / 1e9 / queries["q_verify_decode"], 4
    )
    extras["selective_decode_speedup"] = round(
        queries["q_verify_decode"] / max(queries["q_decode_one_col"], 1e-9), 2
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(src_dir, ignore_errors=True)

    # relational phase: pure-JVM whole-stage-codegen queries want every
    # core — fresh session at full parallelism (first rep warms its JIT,
    # best-of-3 reports the warm number)
    spark = get_spark("bench_relational", cpus=CPUS)
    ref_bytes = reference_rle_bytes(spark, n_rows)
    extras["ref_rle_ratio"] = round(ref_bytes / max(summary["bytes_out"], 1), 3)
    extras["bytes_in"] = summary["bytes_in"]
    extras["bytes_out"] = summary["bytes_out"]

    def q_rleframe_add(spark, sf_dir):
        # the production distributed keyed path: per-key coverage of the
        # events table (two interval sets) merged with the run-aligned
        # add kernel inside grouped Arrow passes
        from pyrle_spark.operators.rleframe import RleFrame

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        iv = ev.select(
            "event_type",
            (F.col("event_id") % 997).alias("Start"),
            (F.col("event_id") % 997 + 1 + F.col("user_id") % 49).alias("End"),
        )
        a = RleFrame.from_intervals(
            iv.filter(F.col("event_type") == "click"), key_cols=("event_type",)
        )
        b = RleFrame.from_intervals(
            iv.filter(F.col("event_type") == "view").withColumn(
                "event_type", F.lit("click")
            ),
            key_cols=("event_type",),
        )
        return (a + b).df.select("event_type", F.size("runs").alias("n_runs"))

    from pyspark.sql import functions as F  # noqa: E402

    # the filtered-group-by headliner times the PUSHDOWN, not the table
    # build: encode the n_chars-clustered documents table once here,
    # outside the timed region (the registry fixture re-encodes per call
    # because the oracle gate needs a self-contained query)
    import tempfile as _tempfile

    from pyrle_spark.operators.relational import _fixture_ordered, load
    from pyrle_spark.plans.compressed import group_count_where
    from pyrle_spark.plans.encode_job import encode_table

    _gw_dir = _tempfile.mkdtemp(prefix="bench_gwhere_")
    encode_table(
        spark,
        _fixture_ordered(
            load(spark, SF_DIR, "documents"),
            ["lang", "n_chars"],
            key_cols=("n_chars",),
        ),
        _gw_dir,
        EncodeConfig(columns=["lang", "n_chars"], order_col="_seq", block_rows=64),
    )

    def q_compressed_group_where(spark, sf_dir):
        return group_count_where(spark, _gw_dir, "lang", "n_chars", 150, 350)

    for rep in range(3):
        for name, fn in (
            ("rle_encode_lang", relational.QUERIES["rle_encode_lang"]),
            ("coverage_events", relational.QUERIES["coverage_events"]),
            ("rle_add_step", relational.QUERIES["rle_add_step"]),
            # the algebraic rewrite of the same operation (coverage of
            # unioned deltas): one shuffle instead of the full
            # coverage+fill pipeline — both reported so the win is visible
            ("rle_add_fused", relational.QUERIES["rle_add_fused"]),
            ("getitems_range", relational.QUERIES["getitems_range"]),
            ("rleframe_add", q_rleframe_add),
            # the 100 TB-relevant dedup family: banded LSH candidate
            # generation over per-doc MinHash signatures
            ("minhash_lsh_pairs", fn_registry.QUERIES["minhash_lsh_pairs"]),
            # exact-substring span dedup via content-defined anchors —
            # the df-capped equi-join shape that replaces suffix arrays
            ("duplicate_spans", fn_registry.QUERIES["duplicate_spans"]),
            # ALP float codec end-to-end over lineitem prices (encode +
            # bit-exact decode + value-level audit per block)
            ("alp_roundtrip_price", relational.QUERIES["alp_roundtrip_price"]),
            # broadcast-dim star join + ordered top-k (TPC-H Q3 shape)
            ("tpch_q3_shipping", relational.QUERIES["tpch_q3_shipping"]),
            # fact-fact sort-merge + per-order distinct aggregates (the
            # EXISTS/NOT-EXISTS rewrite, TPC-H Q21 shape)
            ("tpch_q21_waiting_suppliers",
             relational.QUERIES["tpch_q21_waiting_suppliers"]),
            # filtered grouped counts with three-tier pushdown below
            # decode (zone prune / containment / code mask) over the
            # pre-encoded table — times the query, not the encode
            ("compressed_group_where", q_compressed_group_where),
        ):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            queries[f"q_{name}"] = min(queries.get(f"q_{name}", dt), dt)
    shutil.rmtree(_gw_dir, ignore_errors=True)

    # local query-engine comparator: time each headliner's DuckDB oracle
    # twin on the same parquet and record spark_s / duckdb_s.  At sf0.1
    # DuckDB wins most queries (Spark pays a fixed per-query planning +
    # task-launch overhead that DuckDB's in-process engine doesn't; the
    # crossover flips at the scale where one node no longer holds the
    # data — see BASELINE.md) — the RATIO TREND across rounds, not its
    # absolute level, is the regression signal.
    duckdb_s: dict = {}
    ratios: dict = {}
    try:
        import duckdb

        import __spark_entry__ as entry

        osql = entry.oracle_sql()
        con = duckdb.connect()
        con.execute(f"SET threads TO {CPUS}")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            p = os.path.join(SF_DIR, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for qname in list(queries):
            key = qname[2:] if qname.startswith("q_") else qname
            sql = osql.get(key)
            if not sql:
                continue  # engine-internal headliner: no SQL twin
            best = None
            for _ in range(3):
                t0 = time.time()
                con.sql(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            duckdb_s[qname] = round(best, 3)
            ratios[qname] = round(queries[qname] / max(best, 1e-9), 2)
        con.close()
    except Exception as ex:  # comparator must never fail the bench
        duckdb_s = {"error": str(ex)[:200]}
        ratios = {}  # drop partial ratios: timings behind them were discarded

    # ---- full TPC-H comparator (r4 verdict task #4) + sf1 point (#3) ----
    # The headliner comparator above covers 2 of the TPC-H family; the
    # regression trend needs all of them.  And at sf0.1 (~130 MB) the
    # ratios are fixed-overhead-dominated, so the same family runs again
    # on a deterministic 10× fact-scaled synthesis (tpch_scale.py) — the
    # two points make the crossover trend BASELINE.md tracks measurable.
    def _register_views(con, sf_dir):
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.isdir(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{p}/*.parquet')"
                )
            elif os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )

    def _compare_family(names, sf_dir, osql, spark_reps=2, duck_reps=2):
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {CPUS}")
        _register_views(con, sf_dir)
        block: dict = {}
        for qname in names:
            fn = relational.QUERIES.get(qname) or fn_registry.QUERIES.get(qname)
            sql = osql.get(qname)
            if fn is None or sql is None:
                continue
            row: dict = {}
            best = None
            # compressed-domain queries re-encode their table per call
            # (self-contained oracle fixtures) — one rep, the number is
            # encode-dominated and reps would double bench wall for no
            # comparator signal
            reps = 1 if qname.endswith("_compressed") else spark_reps
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row["spark_s"] = round(best, 3)
            best = None
            for _ in range(duck_reps):
                t0 = time.time()
                con.sql(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row["duckdb_s"] = round(best, 3)
            row["ratio"] = round(row["spark_s"] / max(row["duckdb_s"], 1e-9), 2)
            block[qname] = row
        con.close()
        return block

    tpch_block: dict = {}
    sf1_block: dict = {}
    if os.environ.get("SPARK_GRAFT_TPCH_COMPARE", "1") != "0":
        try:
            import __spark_entry__ as entry

            osql = entry.oracle_sql()
            tpch_names = sorted(
                n for n in relational.QUERIES if n.startswith("tpch_")
            )
            tpch_block = _compare_family(tpch_names, SF_DIR, osql)
            # sf1: 10× fact-scaled TPC-H synthesis on tmpfs (idempotent,
            # deterministic — reused across bench runs in one boot).  The
            # compressed-domain queries re-encode per call and their
            # oracles scan raw parquet (not an engine-vs-engine ratio),
            # so the sf1 family is the 22 batch queries.
            from pyrle_spark.sources.tpch_scale import scale_tpch

            sf1_dir = os.path.join(SCRATCH or tempfile.gettempdir(), "pyrle_sf1")
            scale_tpch(spark, SF_DIR, sf1_dir, factor=10)
            batch_tpch = [
                n for n in tpch_names if not n.endswith("_compressed")
            ]
            # plus the RLE-algebra / events headliners: the engine's own
            # operator families get the same two-point trend as TPC-H
            # (documents/events are fact-scaled in the synthesis too)
            sf1_family = batch_tpch + [
                "rle_encode_lang", "coverage_events", "rle_add_step",
                "rle_add_fused", "getitems_range",
            ]
            sf1_block = _compare_family(sf1_family, sf1_dir, osql)
            sf1_block = {
                "sf": sf * 10,
                "dir": sf1_dir,
                "queries": sf1_block,
            }
        except Exception as ex:  # comparator must never fail the bench
            tpch_block = {"error": str(ex)[:200]}
            sf1_block = {"error": str(ex)[:200]}

    out = {
        "metric": "pyrle_spark headline (encode+decode+relational)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": CPUS,
        "duckdb_s": duckdb_s,
        "spark_vs_duckdb": ratios,
        "tpch": tpch_block,
        "sf1": sf1_block,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
