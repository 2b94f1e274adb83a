"""Raw (identity) and zstd-wrapped codecs — the guaranteed-correct
fallbacks the selector compares everything against.

``raw``  — payload bytes stored verbatim (fixed: value bits; var:
delta-packed offsets + data bytes).
``zstd`` — raw buffers compressed with pyarrow's bundled zstd
(general-purpose entropy backstop for high-entropy columns like html).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyrle_spark.codecs.bitpack import DeltaCodec

__all__ = ["RawCodec", "ZstdCodec", "HAVE_ZSTD"]

try:
    pa.Codec("zstd")
    HAVE_ZSTD = True
except Exception:  # pragma: no cover - environment without zstd
    HAVE_ZSTD = False


class RawCodec:
    name = "raw"

    @staticmethod
    def encode_fixed(payload: np.ndarray):
        meta = {"n": len(payload), "dtype": payload.dtype.str, "kind": "fixed"}
        return meta, {"data": np.ascontiguousarray(payload).tobytes()}

    @staticmethod
    def decode_fixed(meta: dict, buffers: dict) -> np.ndarray:
        return np.frombuffer(buffers["data"], dtype=np.dtype(meta["dtype"]))

    @staticmethod
    def encode_var(offsets: np.ndarray, data: bytes):
        off_meta, off_buf = DeltaCodec.encode(np.asarray(offsets, np.int64))
        meta = {"n": len(offsets) - 1, "offsets_meta": off_meta, "kind": "var"}
        return meta, {"data": data, "offsets": off_buf["packed"]}

    @staticmethod
    def decode_var(meta: dict, buffers: dict):
        offsets = DeltaCodec.decode(meta["offsets_meta"], {"packed": buffers["offsets"]})
        return offsets, buffers["data"]


class ZstdCodec:
    name = "zstd"
    # measured on webtext text/html buffers: level 3 is ~8% smaller than
    # level 1 at near-identical speed; level 6 costs 3× CPU for <1% more
    level = 3

    @classmethod
    def wrap(cls, meta: dict, buffers: dict):
        """Compress every buffer of an inner encoding."""
        codec = pa.Codec("zstd", compression_level=cls.level)
        out = {}
        sizes = {}
        for k, v in buffers.items():
            sizes[k] = len(v)
            out[k] = codec.compress(v, asbytes=True)
        meta = dict(meta)
        meta["zstd_sizes"] = sizes
        return meta, out

    @staticmethod
    def unwrap(meta: dict, buffers: dict):
        # only buffers recorded in zstd_sizes were compressed; buffers
        # attached after wrap() (the validity bitmap) pass through as-is
        sizes = meta["zstd_sizes"]
        out = {
            k: (
                pa.decompress(
                    v, decompressed_size=sizes[k], codec="zstd", asbytes=True
                )
                if k in sizes
                else v
            )
            for k, v in buffers.items()
        }
        inner = dict(meta)
        inner.pop("zstd_sizes")
        return inner, out
