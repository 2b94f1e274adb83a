"""spark-submit entry point for the encode job (north-rule deployment
shape: ``spark-submit --py-files pyrle_spark.zip BENCH/submit_encode.py``).

Arguments: <source_parquet_dir> <output_table_dir> [block_rows]
           [aligned | aligned_presorted | file_direct]

``aligned_presorted`` additionally skips the in-partition sort (the
source files are one-per-block and already ordered by doc_seq — the
shape an Iceberg ingest lands); the encode kernel verifies the claim
per block and fails loudly if it is false.

``file_direct`` (the fastest path, bench default since r3) requires the
same block-aligned presorted layout and routes through
``encode_parquet_dir``: the JVM plans (footer-stats pass, resume
anti-join, snapshot commit) while the Arrow workers stream
parquet → codecs → parquet — no raw byte crosses the JVM↔Python socket.

The script only uses the already-created SparkSession (spark-submit owns
master/conf), so the same file runs unchanged on a real cluster:

    spark-submit --master yarn --num-executors 4N \\
        --driver-memory 8g --executor-memory 8g \\
        --py-files pyrle_spark.zip BENCH/submit_encode.py s3://... s3://...

(In local mode pass --driver-memory 8g — the single JVM hosts every
task's parquet writer; spark-submit's 1g default is too small for
32 concurrent block writers.)

Build the zip with:  python BENCH/make_pyfiles_zip.py
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    src = sys.argv[1]
    out = sys.argv[2]
    block_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    mode = sys.argv[4] if len(sys.argv) > 4 else ""
    aligned = mode.startswith("aligned")
    presorted = mode == "aligned_presorted"

    spark = SparkSession.builder.appName("pyrle_spark_encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyrle_spark.plans.encode_job import (
        EncodeConfig,
        encode_parquet_dir,
        encode_table,
    )

    df = spark.read.parquet(src)
    columns = [c for c in df.columns if not c.startswith(("doc_seq", "sort_", "host_"))]
    if mode == "file_direct":
        summary = encode_parquet_dir(
            spark,
            src,
            out,
            EncodeConfig(
                columns=columns,
                order_col="doc_seq",
                block_rows=block_rows,
                block_aligned=True,
                input_presorted=True,
            ),
        )
    else:
        summary = encode_table(
            spark,
            df,
            out,
            EncodeConfig(
                columns=columns,
                order_col="doc_seq",
                block_rows=block_rows,
                block_aligned=aligned,
                input_presorted=presorted,
            ),
        )
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "snapshot": summary["snapshot_id"],
                "bytes_in": summary["bytes_in"],
                "bytes_out": summary["bytes_out"],
                "wall_s": summary["wall_s"],
            }
        )
    )


if __name__ == "__main__":
    main()
