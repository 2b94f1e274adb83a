"""Dictionary codec for var-width (string/binary) and low-cardinality
fixed-width columns.

Var-width path uses Arrow's vectorized ``dictionary_encode`` (first-
occurrence code assignment, C++ side), then stores:
- codes   → RLE-on-codes when runs are long (sorted/clustered data,
  e.g. ``lang`` after sort) else FoR+bitpack;
- dictionary → concatenated bytes + delta-packed offsets.

Fixed-width path uses np.unique (sorted dictionary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyrle_spark.codecs.bitpack import DeltaCodec, ForCodec
from pyrle_spark.codecs.rle_codec import RleCodec, exact_find_runs

__all__ = ["DictCodec"]


def _encode_codes(codes: np.ndarray):
    """Pick rle vs bitpack for the code stream by exact cost."""
    runs, _ = exact_find_runs(codes)
    # rle payload ≈ runs + values at code width; bitpack ≈ n * code width
    if len(runs) * 2 < len(codes):
        meta, buf = RleCodec.encode(codes)
        return "rle", meta, buf
    meta, buf = ForCodec.encode(codes)
    return "for", meta, {"packed": buf["packed"]}


def _decode_codes(mode: str, meta: dict, buffers: dict) -> np.ndarray:
    if mode == "rle":
        return RleCodec.decode(meta, buffers)
    return ForCodec.decode(meta, buffers)


class DictCodec:
    name = "dict"

    # ---------------------------------------------------------------- var-width

    @staticmethod
    def encode_var(offsets: np.ndarray, data: bytes):
        """Encode (offsets, data) string payload via arrow dictionary."""
        arr = pa.Array.from_buffers(
            pa.large_binary(),
            len(offsets) - 1,
            [None, pa.py_buffer(np.ascontiguousarray(offsets, np.int64).tobytes()),
             pa.py_buffer(data)],
        )
        denc = arr.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        dictionary = denc.dictionary
        dict_offsets = np.frombuffer(
            dictionary.buffers()[1], dtype=np.int64, count=len(dictionary) + 1
        )
        dict_data = bytes(dictionary.buffers()[2] or b"")[: int(dict_offsets[-1])]
        mode, cmeta, cbuf = _encode_codes(codes)
        off_meta, off_buf = DeltaCodec.encode(dict_offsets)
        meta = {
            "n": len(codes),
            "n_dict": len(dictionary),
            "codes_mode": mode,
            "codes_meta": cmeta,
            "dict_offsets_meta": off_meta,
        }
        buffers = {"dict_data": dict_data, "dict_offsets": off_buf["packed"]}
        for k, v in cbuf.items():
            buffers[f"codes_{k}"] = v
        return meta, buffers

    @staticmethod
    def decode_var(meta: dict, buffers: dict):
        cbuf = {
            k[len("codes_") :]: v for k, v in buffers.items() if k.startswith("codes_")
        }
        codes = _decode_codes(meta["codes_mode"], meta["codes_meta"], cbuf)
        dict_offsets = DeltaCodec.decode(
            meta["dict_offsets_meta"], {"packed": buffers["dict_offsets"]}
        )
        dict_data = np.frombuffer(buffers["dict_data"], dtype=np.uint8)
        lens = np.diff(dict_offsets)
        out_lens = lens[codes]
        out_offsets = np.zeros(len(codes) + 1, dtype=np.int64)
        np.cumsum(out_lens, out=out_offsets[1:])
        # gather: for each row, copy dictionary slice — vectorized via repeat
        starts = dict_offsets[codes]
        total = int(out_offsets[-1])
        if total:
            # index ramp: for row i, dict positions starts[i] .. starts[i]+len-1
            reps = np.repeat(starts, out_lens) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(out_offsets[:-1], out_lens)
            )
            out_data = dict_data[reps].tobytes()
        else:
            out_data = b""
        return out_offsets, out_data

    # ---------------------------------------------------------------- fixed-width

    @staticmethod
    def encode_fixed(payload: np.ndarray):
        orig_dtype = None
        if payload.dtype.kind == "f":
            # dictionary on the BIT PATTERNS, not the float values:
            # np.unique would collapse distinct NaN payloads (and order
            # -0.0/0.0 by value), breaking the bit-identical contract
            orig_dtype = payload.dtype.str
            payload = np.ascontiguousarray(payload).view(
                np.uint32 if payload.dtype.itemsize == 4 else np.uint64
            )
        uniques, codes = np.unique(payload, return_inverse=True)
        mode, cmeta, cbuf = _encode_codes(codes.astype(np.int64))
        meta = {
            "n": len(codes),
            "n_dict": len(uniques),
            "codes_mode": mode,
            "codes_meta": cmeta,
            "dict_dtype": uniques.dtype.str,
        }
        if orig_dtype:
            meta["orig_dtype"] = orig_dtype
        buffers = {"dict_data": np.ascontiguousarray(uniques).tobytes()}
        for k, v in cbuf.items():
            buffers[f"codes_{k}"] = v
        return meta, buffers

    @staticmethod
    def decode_fixed(meta: dict, buffers: dict) -> np.ndarray:
        cbuf = {
            k[len("codes_") :]: v for k, v in buffers.items() if k.startswith("codes_")
        }
        codes = _decode_codes(meta["codes_mode"], meta["codes_meta"], cbuf)
        uniques = np.frombuffer(buffers["dict_data"], dtype=np.dtype(meta["dict_dtype"]))
        out = uniques[codes]
        if "orig_dtype" in meta:
            out = out.view(np.dtype(meta["orig_dtype"]))
        return out
