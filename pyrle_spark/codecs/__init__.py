"""Codec registry: encode/decode any pyarrow Array bit-identically.

Top-level API:
- :func:`encode_array` — stats pass → auto-select → encode, with a raw
  fallback guarantee (never worse than raw + small metadata overhead).
- :func:`encode_with` — force a specific codec.
- :func:`decode_array` — Encoded → pyarrow Array, bit-identical.

Codecs: rle, dict, for, delta, bitpack, fsst, raw, plus an orthogonal
zstd wrapper (``+zstd`` suffix) for high-entropy buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyrle_spark.codecs.base import (
    Encoded,
    arrow_to_payload,
    is_varwidth,
    payload_to_arrow,
    str_to_type,
    type_to_str,
)
from pyrle_spark.codecs.bitpack import BitpackCodec, DeltaCodec, ForCodec
from pyrle_spark.codecs.dictionary import DictCodec
from pyrle_spark.codecs.fsst import FsstCodec
from pyrle_spark.codecs.rawcodec import HAVE_ZSTD, RawCodec, ZstdCodec
from pyrle_spark.codecs.rle_codec import RleCodec
from pyrle_spark.codecs.selector import choose_fixed, choose_var, column_stats

__all__ = ["encode_array", "encode_with", "decode_array", "Encoded", "CODEC_NAMES"]

CODEC_NAMES = ["rle", "dict", "for", "delta", "bitpack", "fsst", "raw", "zstd"]


def _encode_payload(codec: str, kind: str, payload):
    if kind == "fixed":
        table = {
            "rle": RleCodec.encode,
            "for": ForCodec.encode,
            "delta": DeltaCodec.encode,
            "bitpack": BitpackCodec.encode,
            "raw": RawCodec.encode_fixed,
        }
        if codec not in table:
            raise ValueError(f"codec {codec} not applicable to fixed-width data")
        return table[codec](payload)
    offsets, data = payload
    table = {
        "dict": DictCodec.encode_var,
        "fsst": FsstCodec.encode,
        "raw": RawCodec.encode_var,
    }
    if codec not in table:
        raise ValueError(f"codec {codec} not applicable to var-width data")
    return table[codec](offsets, data)


def _decode_payload(codec: str, kind: str, meta: dict, buffers: dict):
    if kind == "fixed":
        table = {
            "rle": RleCodec.decode,
            "for": ForCodec.decode,
            "delta": DeltaCodec.decode,
            "bitpack": BitpackCodec.decode,
            "raw": RawCodec.decode_fixed,
        }
        return table[codec](meta, buffers)
    table = {
        "dict": DictCodec.decode_var,
        "fsst": FsstCodec.decode,
        "raw": RawCodec.decode_var,
    }
    return table[codec](meta, buffers)


def _buffers_size(buffers: dict) -> int:
    return sum(len(b) for b in buffers.values())


def encode_with(
    codec: str, arr: pa.Array, zstd: bool = False, stats: dict | None = None
) -> Encoded:
    """Encode with an explicit codec (optionally zstd-wrapping buffers)."""
    kind, payload, validity = arrow_to_payload(arr)
    meta, buffers = _encode_payload(codec, kind, payload)
    name = codec
    if zstd and HAVE_ZSTD:
        meta, buffers = ZstdCodec.wrap(meta, buffers)
        name = f"{codec}+zstd"
    meta["kind"] = kind
    if stats:
        meta["stats"] = stats
    if validity is not None:
        buffers["validity"] = np.packbits(validity).tobytes()
        meta["has_validity"] = True
    return Encoded(
        codec=name,
        arrow_type=type_to_str(arr.type),
        n_rows=len(arr),
        meta=meta,
        buffers=buffers,
    )


def decode_array(enc: Encoded) -> pa.Array:
    """Encoded → pyarrow Array, bit-identical to the original."""
    meta, buffers = enc.meta, enc.buffers
    codec = enc.codec
    if codec.endswith("+zstd"):
        codec = codec[: -len("+zstd")]
        meta, buffers = ZstdCodec.unwrap(meta, buffers)
    validity = None
    if meta.get("has_validity"):
        validity = np.unpackbits(
            np.frombuffer(buffers["validity"], dtype=np.uint8), count=enc.n_rows
        ).astype(bool)
        buffers = {k: v for k, v in buffers.items() if k != "validity"}
    kind = meta["kind"]
    payload = _decode_payload(codec, kind, meta, buffers)
    return payload_to_arrow(kind, payload, validity, enc.arrow_type)


def encode_array(arr: pa.Array, zstd_threshold: float = 0.9) -> Encoded:
    """Stats-driven auto-encode with raw-size guarantee.

    Picks the codec from one stats pass; if the encoded buffers are not
    smaller than raw, falls back to raw.  High-entropy var-width chunks
    (encoded/raw > ``zstd_threshold``) get the zstd wrapper when
    available (html-style binary payloads).
    """
    kind, payload, validity = arrow_to_payload(arr)
    stats = column_stats(kind, payload)
    t = arr.type
    if kind == "fixed":
        codec = choose_fixed(stats, np.asarray(payload).dtype.kind)
    else:
        codec = choose_var(stats)
    enc = encode_with(codec, arr, stats=stats)
    raw_size = (
        len(payload) * payload.dtype.itemsize
        if kind == "fixed"
        else int(payload[0][-1]) + 8 * len(payload[0])
    )
    if codec != "raw" and _buffers_size(enc.buffers) >= raw_size:
        enc = encode_with("raw", arr, stats=stats)
        codec = "raw"
    if (
        kind == "var"
        and HAVE_ZSTD
        and raw_size > 0
        and _buffers_size(enc.buffers) / raw_size > zstd_threshold
    ):
        z = encode_with(codec, arr, zstd=True, stats=stats)
        if _buffers_size(z.buffers) < _buffers_size(enc.buffers):
            enc = z
    return enc
