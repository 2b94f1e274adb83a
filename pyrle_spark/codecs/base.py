"""Codec infrastructure: the Encoded container, Arrow <-> numpy payload
bridging, and type round-tripping.

Every codec encodes an ``pyarrow.Array`` into named byte buffers + JSON
metadata and decodes back **bit-identical** (the north-rule contract:
``decode(encode(col)) == col`` byte-for-byte per value, nulls preserved).

Physical payload shapes:
- fixed-width primitives (int*/uint*/float*/bool/timestamp/date) → one
  numpy array (+ optional validity bool array)
- var-width (string/large_string/binary/large_binary) → (offsets int64,
  data bytes) (+ validity)

This generalizes the reference's two-array (runs,values) model
(/root/reference/pyrle/rle.py:139-147) to arbitrary column types.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

__all__ = ["Encoded", "arrow_to_payload", "payload_to_arrow", "type_to_str", "str_to_type"]


@dataclass
class Encoded:
    """Self-describing encoded column chunk."""

    codec: str
    arrow_type: str
    n_rows: int
    meta: dict = field(default_factory=dict)
    buffers: dict = field(default_factory=dict)  # name -> bytes

    @property
    def nbytes(self) -> int:
        return sum(len(b) for b in self.buffers.values()) + len(
            json.dumps(self.meta)
        )

    def buffers_as_bytes(self) -> dict:
        """Buffers coerced to bytes (numpy views → one copy at the edge)."""
        return {
            k: (v.tobytes() if isinstance(v, np.ndarray) else bytes(v))
            for k, v in self.buffers.items()
        }

    def to_row(self) -> dict:
        """Flatten for transport in a DataFrame row
        (codec, arrow_type, n_rows, meta json, map<string,binary>)."""
        return {
            "codec": self.codec,
            "arrow_type": self.arrow_type,
            "n_rows": self.n_rows,
            "meta": json.dumps(self.meta, separators=(",", ":")),
            "buffers": self.buffers_as_bytes(),
        }

    @classmethod
    def from_row(cls, row: dict) -> "Encoded":
        return cls(
            codec=row["codec"],
            arrow_type=row["arrow_type"],
            n_rows=int(row["n_rows"]),
            meta=json.loads(row["meta"]),
            buffers=dict(row["buffers"]),
        )


# ------------------------------------------------------------------ type strings

_SIMPLE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
}


def type_to_str(t: pa.DataType) -> str:
    return str(t)


def str_to_type(s: str) -> pa.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("timestamp["):
        inner = s[len("timestamp[") : -1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    raise ValueError(f"unsupported arrow type string: {s}")


# ------------------------------------------------------------------ payloads

_VARWIDTH = (pa.types.is_string, pa.types.is_large_string, pa.types.is_binary,
             pa.types.is_large_binary)


def is_varwidth(t: pa.DataType) -> bool:
    return any(f(t) for f in _VARWIDTH)


def _validity(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return np.asarray(arr.is_valid())


def arrow_to_payload(arr: pa.Array):
    """Array → (kind, payload, validity).

    kind "fixed": payload = numpy array (nulls zero-filled).
    kind "var":   payload = (offsets int64, data bytes) (null slots empty).
    """
    t = arr.type
    validity = _validity(arr)
    if is_varwidth(t):
        # normalize to large (int64 offsets) for one code path
        la = arr.cast(pa.large_binary() if pa.types.is_binary(t) or
                      pa.types.is_large_binary(t) else pa.large_string())
        if la.null_count:
            la = la.fill_null(b"" if pa.types.is_large_binary(la.type) else "")
        buf_offsets = np.frombuffer(la.buffers()[1], dtype=np.int64,
                                    count=len(la) + 1 + la.offset)[la.offset:]
        data = la.buffers()[2]
        lo = int(buf_offsets[0])
        offsets = (buf_offsets - lo).astype(np.int64)
        if data is not None:
            data_np = np.frombuffer(data, dtype=np.uint8, count=lo + int(offsets[-1]))[
                lo:
            ]  # zero-copy view
        else:
            data_np = np.zeros(0, dtype=np.uint8)
        return "var", (offsets, data_np), validity
    n = len(arr)
    if pa.types.is_boolean(t):
        bits = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        vals = np.unpackbits(bits, count=n + arr.offset, bitorder="little")[
            arr.offset :
        ].astype(np.uint8)
    else:
        if pa.types.is_timestamp(t):
            np_dtype = np.int64
        elif pa.types.is_date32(t):
            np_dtype = np.int32
        else:
            np_dtype = np.dtype(t.to_pandas_dtype())
        vals = np.frombuffer(arr.buffers()[1], dtype=np_dtype, count=n + arr.offset)[
            arr.offset :
        ]
    if validity is not None and n:
        # null-slot contents are semantically free (masked out on decode);
        # forward-fill them so they never fragment runs or widen deltas
        valid_idx = np.where(validity, np.arange(n), -1)
        np.maximum.accumulate(valid_idx, out=valid_idx)
        if valid_idx[0] < 0:
            first = np.nonzero(validity)[0]
            fill_idx = int(first[0]) if len(first) else 0
            valid_idx = np.where(valid_idx < 0, fill_idx, valid_idx)
        vals = vals[valid_idx]
    return "fixed", vals, validity


def _validity_buffer(validity: np.ndarray | None):
    if validity is None:
        return None
    return pa.py_buffer(np.packbits(validity, bitorder="little").tobytes())


def payload_to_arrow(kind: str, payload, validity, arrow_type: str) -> pa.Array:
    """Inverse of :func:`arrow_to_payload`, restoring the logical type and
    null bitmap by direct buffer construction (no value-mangling round
    trips — bit-identity is the contract)."""
    t = str_to_type(arrow_type)
    vbuf = _validity_buffer(validity)
    if kind == "var":
        offsets, data = payload
        binaryish = pa.types.is_binary(t) or pa.types.is_large_binary(t)
        base = pa.large_binary() if binaryish else pa.large_string()
        arr = pa.Array.from_buffers(
            base,
            len(offsets) - 1,
            [vbuf, pa.py_buffer(np.ascontiguousarray(offsets, np.int64).tobytes()),
             pa.py_buffer(data)],
        )
        return arr.cast(t)
    n = len(payload)
    if pa.types.is_boolean(t):
        bits = np.packbits(payload.astype(bool), bitorder="little")
        return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(bits.tobytes())])
    if pa.types.is_timestamp(t):
        phys = np.ascontiguousarray(payload, np.int64)
    elif pa.types.is_date32(t):
        phys = np.ascontiguousarray(payload, np.int32)
    else:
        phys = np.ascontiguousarray(payload, t.to_pandas_dtype())
    return pa.Array.from_buffers(t, n, [vbuf, pa.py_buffer(phys.tobytes())])
