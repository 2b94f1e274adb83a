"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is
stubbed (``decode_image`` raises ``NotImplementedError``; a deterministic
fake feature extractor stands in) — but the Spark-side plumbing is real
and tested: binary column in, schema-stable feature rows out, vectorized
batch processing, no per-row Python objects beyond the batch boundary.

``byte_histogram`` is the oracle-checked operator: the Pandas-UDF path
(payload → decoded codepoints → numpy bincount) must agree with a
pure-relational duckdb twin (explode positions + ascii()%16) — proving
the binary batch plumbing computes the same thing the SQL algebra does.
(Codepoints, not raw utf-8 bytes: a multibyte char contributes ONE
histogram entry in the SQL form, so the UDF must count the same units.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BINS = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode.  PNG decodes for real — pure numpy + stdlib
    zlib (``functions/png.py``), no imaging library needed — covering
    the 8-bit gray/RGB/RGBA non-interlaced subset a pipeline generates
    and the web's lossless standard.  Other formats (JPEG's DCT stack
    needs a real library) still raise at this clearly-marked seam."""
    from pyrle_spark.functions.png import _SIG, decode_png

    if bytes(payload[:8]) == _SIG:
        return decode_png(bytes(payload))
    raise NotImplementedError(
        "non-PNG image decoding needs an imaging library (e.g. Pillow); "
        "wire it in here — the surrounding Spark plumbing is ready"
    )


def fake_image_features(payload: bytes, n_bins: int = N_BINS) -> np.ndarray:
    """Deterministic stand-in feature extractor: histogram of byte values
    mod n_bins — vectorized, stable across runs and partitionings."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr % n_bins, minlength=n_bins).astype(np.int64)


def _codepoint_hist(payload: bytes, n_bins: int = N_BINS) -> np.ndarray:
    """Histogram of (codepoint % n_bins) over the utf-8 payload —
    vectorized via a utf-32 reinterpretation, no per-char Python."""
    cps = np.frombuffer(
        payload.decode("utf-8").encode("utf-32-le"), dtype=np.uint32
    )
    return np.bincount(cps % n_bins, minlength=n_bins).astype(np.int64)


def byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bin histogram of (codepoint % 16) over the text
    payload treated as an opaque binary column — computed in a Pandas UDF
    batch loop (the multimodal hot path shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = []
            bins = []
            counts = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hist = _codepoint_hist(bytes(payload))
                nz = np.nonzero(hist)[0]
                ids.extend([doc_id] * len(nz))
                bins.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "bin": bins, "cnt": counts})

    return docs.mapInPandas(extract, "doc_id long, bin int, cnt long")


_BYTE_HISTOGRAM_SQL = """
WITH pos AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
)
SELECT doc_id, CAST(ascii(substr(text, i, 1)) % 16 AS INT) AS bin, count(*) AS cnt
FROM pos GROUP BY doc_id, bin
"""


def fake_resize(payload: bytes, h: int, w: int) -> bytes:
    """Deterministic stand-in for image resize: the real pipeline would
    decode → interpolate → re-encode; this produces an h*w-byte payload
    that is a pure function of (payload, h, w), so batch shape, schema,
    and determinism are testable without an imaging library."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return bytes(h * w)
    # nearest-neighbor index mapping onto the flat byte stream — the same
    # sampling arithmetic a real resize kernel uses, minus the codec
    idx = (np.arange(h * w, dtype=np.int64) * len(arr)) // (h * w)
    return arr[idx].tobytes()


def resize_png(payload: bytes, h: int, w: int) -> bytes:
    """REAL image resize for PNG payloads: decode (pure-numpy PNG),
    nearest-neighbor resample (``src_y = (y·H)//h`` — the standard
    floor mapping, pure index gather), re-encode.  Deterministic and
    closed-form certifiable (see ``image_resize_stats``)."""
    from pyrle_spark.functions.png import encode_png

    img = decode_image(payload)
    H, W = img.shape[0], img.shape[1]
    ys = (np.arange(h, dtype=np.int64) * H) // h
    xs = (np.arange(w, dtype=np.int64) * W) // w
    return encode_png(img[ys][:, xs])


def resize_images(
    df: DataFrame, payload_col: str = "payload", h: int = 8, w: int = 8
) -> DataFrame:
    """Batch image resize over ``mapInPandas``: binary in → binary out
    plus (height, width) metadata columns.  PNG payloads take the REAL
    decode → nearest-neighbor → re-encode path (:func:`resize_png`);
    other formats keep the deterministic :func:`fake_resize` stand-in.
    The Spark plumbing — Arrow batches, schema, vectorized loop per
    batch — is the production shape either way."""
    other = [c for c in df.columns if c != payload_col]
    # preserve each passthrough column's REAL type (url strings, binary
    # sidecars) — hardcoding long breaks Arrow conversion at runtime
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {types[c]}" for c in other]
        + ["resized binary, height int, width int"]
    )

    from pyrle_spark.functions.png import _SIG

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in other}
            out["resized"] = [
                resize_png(bytes(p), h, w)
                if bytes(p)[:8] == _SIG
                else fake_resize(bytes(p), h, w)
                for p in pdf[payload_col]
            ]
            out["height"] = h
            out["width"] = w
            yield pd.DataFrame(out)

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    every_n: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing: treat the binary payload as a
    frame-striped container (``frame_bytes`` per frame), keep every
    ``every_n``-th frame, emit one row per sampled frame with its index —
    the exploded long-format a downstream feature extractor consumes.
    The container parse is the deterministic stand-in; a real demuxer
    slots into the same loop."""
    other = [c for c in df.columns if c != payload_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {types[c]}" for c in other] + ["frame_idx int, frame binary"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = {c: [] for c in other}
            idxs = []
            frames = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                n_frames = max(len(payload) // frame_bytes, 0)
                for fi in range(0, n_frames, every_n):
                    for c in other:
                        keys[c].append(row[c])
                    idxs.append(fi)
                    frames.append(
                        payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    )
            yield pd.DataFrame({**keys, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, out_schema)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata for an opaque binary column: byte length + a
    leading-byte tag (the magic-number sniff in real pipelines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        # decode FIRST, then take the first character: substring on the
        # raw bytes would split a multibyte lead byte into U+FFFD
        F.ascii(F.substring(F.decode("payload", "utf-8"), 1, 1)).alias(
            "magic_byte"
        ),
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       ascii(substr(text, 1, 1)) AS magic_byte
FROM documents
"""


PAYLOAD_BLOCK = 64  # bytes per profiled block


def payload_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second, independent certification of the binary-payload path (r02
    verdict task #7): an exact per-64-byte-block byte profile — n_bytes,
    distinct byte values, modal byte count, and the order-independent
    integer checksum Σ(byte value) — computed on RAW BYTES in the Arrow
    batch loop (``np.frombuffer`` on the payload, no text decode), while
    :func:`byte_histogram` certifies the codepoint view.  The duckdb twin
    reconstructs every byte from ``hex(encode(text))`` pairs, so the two
    engines must agree byte-for-byte at block granularity; all outputs
    are integers, so the value hash is exact by construction (no float
    rounding seam).  A real image/audio feature extractor consumes the
    same (payload → per-block ndarray stats) shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blks, nb, ndv, mode, bsum = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                for b in range(0, max(len(arr), 1), PAYLOAD_BLOCK):
                    v = arr[b : b + PAYLOAD_BLOCK]
                    if len(v) == 0:
                        continue
                    counts = np.bincount(v, minlength=256)
                    ids.append(doc_id)
                    blks.append(b // PAYLOAD_BLOCK)
                    nb.append(len(v))
                    ndv.append(int((counts > 0).sum()))
                    mode.append(int(counts.max()))
                    bsum.append(int(v.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "block_idx": blks,
                    "n_bytes": nb,
                    "ndv_bytes": ndv,
                    "mode_cnt": mode,
                    "byte_sum": bsum,
                }
            )

    return docs.mapInPandas(
        profile,
        "doc_id long, block_idx int, n_bytes int, ndv_bytes int, "
        "mode_cnt int, byte_sum long",
    )


_PAYLOAD_BLOCK_STATS_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents WHERE length(text) > 0
), pos AS (
  SELECT doc_id, h, unnest(generate_series(1, n)) AS i FROM b
), byte AS (
  SELECT doc_id, CAST((i - 1) // {PAYLOAD_BLOCK} AS INT) AS block_idx,
         (strpos('0123456789ABCDEF', substr(h, 2 * i - 1, 1)) - 1) * 16
       + (strpos('0123456789ABCDEF', substr(h, 2 * i, 1)) - 1) AS v
  FROM pos
), per_val AS (
  SELECT doc_id, block_idx, v, count(*) AS c FROM byte GROUP BY 1, 2, 3
)
SELECT doc_id, block_idx, CAST(sum(c) AS INT) AS n_bytes,
       CAST(count(*) AS INT) AS ndv_bytes, CAST(max(c) AS INT) AS mode_cnt,
       CAST(sum(v * c) AS BIGINT) AS byte_sum
FROM per_val GROUP BY doc_id, block_idx
"""


def payload_run_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third independent certification of the binary-payload path, this
    time through the engine's own core primitive: an exact RUN-LENGTH
    profile of each payload's codepoint stream (``exact_find_runs``, the
    same kernel the RLE codec uses), aggregated per language — documents
    profiled, total codepoints, total runs, and the longest single run.
    The duckdb twin derives runs relationally via gaps-and-islands
    (position − row_number per (doc, value)), so the vectorized numpy
    kernel and the SQL algebra must agree run-for-run.  All outputs are
    integers: the value hash is exact by construction."""
    from pyrle_spark.codecs.rle_codec import exact_find_runs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.length("text") > 0)
        .select("lang", F.encode("text", "utf-8").alias("payload"))
    )

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            langs, chars, runs_n, run_max = [], [], [], []
            for lang, payload in zip(pdf["lang"], pdf["payload"]):
                cps = np.frombuffer(
                    bytes(payload).decode("utf-8").encode("utf-32-le"),
                    dtype=np.uint32,
                ).astype(np.int64)
                runs, _ = exact_find_runs(cps)
                langs.append(lang)
                chars.append(len(cps))
                runs_n.append(int(len(runs)))
                run_max.append(int(runs.max()) if len(runs) else 0)
            yield pd.DataFrame(
                {
                    "lang": langs,
                    "n_chars": chars,
                    "n_runs": runs_n,
                    "max_run": run_max,
                }
            )

    per_doc = docs.mapInPandas(
        profile, "lang string, n_chars long, n_runs long, max_run long"
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_runs").alias("sum_runs"),
        F.max("max_run").alias("max_run"),
    )


_PAYLOAD_RUN_PROFILE_SQL = """
WITH pos AS (
  SELECT doc_id, lang, unnest(generate_series(1, length(text))) AS i, text
  FROM documents WHERE length(text) > 0
), ch AS (
  SELECT doc_id, lang, i, ascii(substr(text, i, 1)) AS v FROM pos
), isl AS (
  SELECT doc_id, lang,
         i - row_number() OVER (PARTITION BY doc_id, v ORDER BY i) AS grp, v
  FROM ch
), runs AS (
  SELECT doc_id, lang, count(*) AS run_len
  FROM isl GROUP BY doc_id, lang, grp, v
), per_doc AS (
  SELECT doc_id, lang, sum(run_len) AS n_chars, count(*) AS n_runs,
         max(run_len) AS max_run
  FROM runs GROUP BY doc_id, lang
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_runs) AS BIGINT) AS sum_runs,
       CAST(max(max_run) AS BIGINT) AS max_run
FROM per_doc GROUP BY lang
"""


def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the Arrow batch plumbing, certified by
    a closed-form pixel rule: per document, a deterministic RGB image
    (h = 8 + d%5, w = 8 + d%7; flat pixel byte i = (31·d + 7·i) mod 256)
    is PNG-ENCODED into a binary column in one ``mapInPandas`` stage,
    then a SECOND stage — seeing only the payload bytes — runs
    :func:`decode_image` (the pure-numpy PNG decoder) and emits pixel
    stats.  The DuckDB oracle evaluates the pixel rule directly
    (``generate_series`` — no PNG anywhere), so any byte the
    encode→Arrow→decode path mangles diverges the sums.  This is the
    multimodal pipeline's decode hot-path shape with the decoder no
    longer stubbed.

    Scale shape: embarrassingly parallel over documents; payloads live
    only inside their Arrow batch, never on the driver."""
    from pyrle_spark.functions.png import encode_png

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 8 + d % 5, 8 + d % 7
                n = h * w * 3
                px = (
                    (31 * d + 7 * np.arange(n, dtype=np.int64)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = docs.mapInPandas(gen, "doc_id long, payload binary")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                h, w, c = img.shape
                flat = img.reshape(-1).astype(np.int64)
                idx = np.arange(len(flat), dtype=np.int64)
                rows.append(
                    (
                        int(d),
                        h,
                        w,
                        c,
                        int(flat.sum()),
                        int((idx * flat).sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width", "channels",
                    "px_sum", "px_weighted",
                ],
            )

    return imgs.mapInPandas(
        stats,
        "doc_id long, height int, width int, channels int, "
        "px_sum long, px_weighted long",
    )


_IMAGE_DECODE_STATS_SQL = """
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 5 AS height,
         8 + doc_id % 7 AS width
  FROM documents
), px AS (
  SELECT doc_id, height, width, i,
         (31 * doc_id + 7 * i) % 256 AS p
  FROM dims, unnest(generate_series(0, height * width * 3 - 1)) AS t(i)
)
SELECT doc_id, CAST(height AS INT) AS height, CAST(width AS INT) AS width,
       3 AS channels,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(sum(i * p) % 1000000007 AS BIGINT) AS px_weighted
FROM px GROUP BY doc_id, height, width
"""


def encode_wav(samples: "np.ndarray", sample_rate: int = 16_000) -> bytes:
    """Canonical 44-byte-header PCM16 mono WAV from an int16 sample
    array — pure struct, no audio library."""
    import struct

    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    n = len(pcm)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm
    )


def decode_audio(payload: bytes) -> tuple:
    """Real audio decode for PCM WAV (RIFF little-endian, 16-bit,
    uncompressed) — chunk walk + ``np.frombuffer``, no audio library.
    Returns (samples int16 ndarray, sample_rate).  Compressed codecs
    (mp3/aac/ogg) still raise at this clearly-marked seam."""
    import struct

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "non-WAV audio decoding needs an audio library; wire it in "
            "here — the surrounding Spark plumbing is ready"
        )
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, rate, _, _, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or depth != 16 or channels != 1:
                raise NotImplementedError(
                    f"only PCM16 mono WAV supported (fmt={fmt}, "
                    f"depth={depth}, channels={channels})"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def encode_y4m(frames: list, w: int, h: int, fps: str = "25:1") -> bytes:
    """Minimal YUV4MPEG2 (Y4M) writer: text stream header + per-frame
    ``FRAME`` markers + raw 4:2:0 planar payloads — the uncompressed
    interchange container ffmpeg pipelines speak, zero dependencies.
    Each frame must be ``w*h*3//2`` bytes (``w``/``h`` even)."""
    fsz = w * h * 3 // 2
    out = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C420\n".encode()]
    for fr in frames:
        b = bytes(fr)
        if len(b) != fsz:
            raise ValueError(f"frame is {len(b)} bytes, expected {fsz}")
        out.append(b"FRAME\n")
        out.append(b)
    return b"".join(out)


def demux_y4m(payload: bytes) -> tuple:
    """Real video demux for Y4M: parse the stream header (W/H/C tags),
    split on ``FRAME`` markers, return (frames, w, h) with each frame a
    raw 4:2:0 byte array.  Compressed containers (mp4/webm need a real
    demuxer+codec) still raise at this clearly-marked seam."""
    b = bytes(payload)
    if not b.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "non-Y4M video demuxing needs a media library; wire it in "
            "here — the surrounding Spark plumbing is ready"
        )
    nl = b.index(b"\n")
    w = h = None
    colorspace = "C420"
    for tok in b[:nl].split()[1:]:
        t = tok.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"only 4:2:0 supported, got {colorspace}")
    fsz = w * h * 3 // 2
    frames = []
    pos = nl + 1
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = b.index(b"\n", pos)  # frame headers may carry parameters
        start = fnl + 1
        frames.append(np.frombuffer(b[start : start + fsz], dtype=np.uint8))
        if len(frames[-1]) != fsz:
            raise ValueError("truncated frame payload")
        pos = start + fsz
    return frames, w, h


def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video demux through the Arrow plumbing, certified by a
    closed-form frame rule: per document a deterministic Y4M clip
    (W = 4+2·(d%3), H = 4+2·(d%2), 3+d%4 frames; frame f byte i =
    (31·d + 13·f + 7·i) mod 256) is muxed into a binary column; a
    second stage — seeing only container bytes — runs
    :func:`demux_y4m`, keeps every 2nd frame (the sampling shape a
    feature extractor consumes), and emits one row per sampled frame
    with its byte stats.  The oracle evaluates the rule directly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + 2 * (d % 3), 4 + 2 * (d % 2)
                fsz = w * h * 3 // 2
                frames = [
                    (
                        (31 * d + 13 * f + 7 * np.arange(fsz, dtype=np.int64))
                        % 256
                    ).astype(np.uint8)
                    for f in range(3 + d % 4)
                ]
                payloads.append(encode_y4m(frames, w, h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    clips = docs.mapInPandas(gen, "doc_id long, payload binary")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, w, h = demux_y4m(bytes(payload))
                for fi in range(0, len(frames), 2):
                    v = frames[fi].astype(np.int64)
                    idx = np.arange(len(v), dtype=np.int64)
                    rows.append(
                        (
                            int(d), fi, w, h,
                            int(v.sum()),
                            int((idx * v).sum() % 1_000_000_007),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "byte_sum", "byte_weighted",
                ],
            )

    return clips.mapInPandas(
        stats,
        "doc_id long, frame_idx int, width int, height int, "
        "byte_sum long, byte_weighted long",
    )


_VIDEO_FRAME_STATS_SQL = """
WITH dims AS (
  SELECT doc_id,
         4 + 2 * (doc_id % 3) AS w,
         4 + 2 * (doc_id % 2) AS h,
         3 + doc_id % 4 AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, h, f
  FROM dims, unnest(generate_series(0, nf - 1)) AS t(f)
  WHERE f % 2 = 0
), px AS (
  SELECT doc_id, w, h, f, i,
         (31 * doc_id + 13 * f + 7 * i) % 256 AS v
  FROM fr, unnest(generate_series(0, w * h * 3 // 2 - 1)) AS t(i)
)
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(sum(v) AS BIGINT) AS byte_sum,
       CAST(sum(i * v) % 1000000007 AS BIGINT) AS byte_weighted
FROM px GROUP BY doc_id, f, w, h
"""


def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the Arrow plumbing, certified by a
    closed-form sample rule: per document a deterministic PCM16 clip
    (n = 64 + d%37 samples; sample i = ((31·d + 7·i) mod 4096) − 2048)
    is WAV-encoded into a binary column in one stage; a second stage —
    seeing only RIFF bytes — runs :func:`decode_audio` and emits the
    energy-style stats (Σ|s|, Σs² mod p, zero-crossing count) a quality
    filter computes.  The DuckDB oracle evaluates the rule directly; any
    byte the encode→Arrow→decode path mangles diverges the sums."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 64 + d % 37
                s = ((31 * d + 7 * np.arange(n, dtype=np.int64)) % 4096) - 2048
                payloads.append(encode_wav(s.astype(np.int16)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    clips = docs.mapInPandas(gen, "doc_id long, payload binary")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = decode_audio(bytes(payload))
                v = s.astype(np.int64)
                rows.append(
                    (
                        int(d),
                        len(v),
                        rate,
                        int(np.abs(v).sum()),
                        int((v * v).sum() % 1_000_000_007),
                        int(((v[:-1] < 0) != (v[1:] < 0)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "sum_abs", "sum_sq", "zero_crossings",
                ],
            )

    return clips.mapInPandas(
        stats,
        "doc_id long, n_samples int, sample_rate int, sum_abs long, "
        "sum_sq long, zero_crossings long",
    )


_AUDIO_DECODE_STATS_SQL = """
WITH dims AS (
  SELECT doc_id, 64 + doc_id % 37 AS n FROM documents
), sm AS (
  SELECT doc_id, n, i,
         (31 * doc_id + 7 * i) % 4096 - 2048 AS s
  FROM dims, unnest(generate_series(0, n - 1)) AS t(i)
)
SELECT doc_id, CAST(max(n) AS INT) AS n_samples, 16000 AS sample_rate,
       CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
       CAST(sum(s * s) % 1000000007 AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN i > 0 AND ((s < 0) <>
              ((31 * doc_id + 7 * (i - 1)) % 4096 - 2048 < 0))
            THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM sm GROUP BY doc_id
"""


def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full REAL multimodal hot path — decode → nearest-neighbor
    resample → re-encode → decode — certified end-to-end: per document
    the same closed-form source image as :func:`image_decode_stats`,
    pushed through :func:`resize_images` (PNG path) to a fixed 6×6, then
    the RESIZED payload decodes and its pixel stats must equal the
    oracle's direct evaluation of the nearest-neighbor index arithmetic
    (``src_y = (y·H)//6``) over the pixel rule — DuckDB never sees a
    PNG byte.  Every stage crosses a real binary Arrow column."""
    from pyrle_spark.functions.png import encode_png

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 8 + d % 5, 8 + d % 7
                n = h * w * 3
                px = (
                    (31 * d + 7 * np.arange(n, dtype=np.int64)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_png(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = docs.mapInPandas(gen, "doc_id long, payload binary")
    resized = resize_images(imgs, "payload", h=6, w=6)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["resized"]):
                img = decode_image(bytes(payload))
                flat = img.reshape(-1).astype(np.int64)
                idx = np.arange(len(flat), dtype=np.int64)
                rows.append(
                    (
                        int(d),
                        img.shape[0],
                        img.shape[1],
                        int(flat.sum()),
                        int((idx * flat).sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "height", "width", "px_sum", "px_weighted"],
            )

    return resized.mapInPandas(
        stats,
        "doc_id long, height int, width int, px_sum long, px_weighted long",
    )


_IMAGE_RESIZE_STATS_SQL = """
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 5 AS H,
         8 + doc_id % 7 AS W
  FROM documents
), outpx AS (
  SELECT doc_id,
         i,
         -- out index i = (y*6 + x)*3 + ch; nearest-neighbor source
         -- byte = ((((y*H)//6)*W + (x*W)//6)*3 + ch
         (31 * doc_id
          + 7 * ((((i // 18) * H) // 6 * W + ((i // 3) % 6 * W) // 6) * 3
                 + i % 3)) % 256 AS p
  FROM dims, unnest(generate_series(0, 6 * 6 * 3 - 1)) AS t(i)
)
SELECT doc_id, 6 AS height, 6 AS width,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(sum(i * p) % 1000000007 AS BIGINT) AS px_weighted
FROM outpx GROUP BY doc_id
"""


QUERIES = {
    "byte_histogram": byte_histogram,
    "multimodal_meta": multimodal_meta,
    "payload_block_stats": payload_block_stats,
    "payload_run_profile": payload_run_profile,
    "image_decode_stats": image_decode_stats,
    "image_resize_stats": image_resize_stats,
    "audio_decode_stats": audio_decode_stats,
    "video_frame_stats": video_frame_stats,
}

ORACLE_SQL = {
    "byte_histogram": _BYTE_HISTOGRAM_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "payload_block_stats": _PAYLOAD_BLOCK_STATS_SQL,
    "payload_run_profile": _PAYLOAD_RUN_PROFILE_SQL,
    "image_decode_stats": _IMAGE_DECODE_STATS_SQL,
    "image_resize_stats": _IMAGE_RESIZE_STATS_SQL,
    "audio_decode_stats": _AUDIO_DECODE_STATS_SQL,
    "video_frame_stats": _VIDEO_FRAME_STATS_SQL,
}
