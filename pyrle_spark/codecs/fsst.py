"""FSST-style string compression, from scratch and fully vectorized.

A simplified Fast Static Symbol Table (Boncz, Neumann, Leis: "FSST:
Fast Random Access String Compression", VLDB 2020 — public paper; no
code consulted): a 255-entry symbol table learned per chunk maps byte
sequences to 1-byte codes; code 255 escapes a literal byte.

v1 restricts symbols to lengths 1 and 2, which keeps both encode and
decode pure-numpy vectorized (no per-byte Python):

- **train**: count byte-pair and single-byte frequencies on a bounded
  sample; grant codes to every present single byte, remaining budget to
  the most frequent pairs.
- **encode**: classic greedy longest-match. Vectorized via the
  runs-of-matches trick: within every maximal run of consecutive
  matchable pair positions the greedy scanner provably takes positions
  s, s+2, s+4, …, so the selection is computed with repeat/arange
  arithmetic instead of a scan.  Pairs never cross string boundaries.
- **decode**: symbol expansion by scatter; escapes located with the same
  runs parity argument (a maximal run of 0xFF bytes always starts with
  an escape, and the escape/literal alternation survives string
  boundaries because escape+literal pairs never split across strings).

Worst case output = input size (every present byte has a code) unless a
chunk has >255 distinct bytes, where rare bytes pay 2× via escapes —
the auto-selector falls back to raw/zstd when FSST doesn't win.
"""

from __future__ import annotations

import numpy as np

from pyrle_spark.codecs.bitpack import DeltaCodec

__all__ = ["FsstCodec", "train", "encode_buffer", "decode_buffer"]

ESCAPE = 255
_MAX_SAMPLE = 1 << 16


def _run_starts_lens(mask: np.ndarray):
    """(starts, lengths) of maximal runs of True in a bool array."""
    n = len(mask)
    if n == 0 or not mask.any():
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    change = np.flatnonzero(mask[1:] != mask[:-1]).astype(np.int64) + 1
    bounds = np.concatenate(([0], change, [n]))
    if mask[0]:
        starts, ends = bounds[0:-1:2], bounds[1::2]
    else:
        starts, ends = bounds[1:-1:2], bounds[2::2]
    return starts, ends - starts


def _alternating_positions(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Positions s, s+2, s+4, … within each run — flat, vectorized."""
    counts = (lens + 1) // 2
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    ramp = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return np.repeat(starts, counts) + 2 * ramp


def train(data: np.ndarray, offsets: np.ndarray) -> dict:
    """Learn the symbol table from a bounded prefix sample.

    Returns {"sym_len","sym_first","sym_second"} uint8[256] arrays;
    code 255 is the escape (sym_len 0).
    """
    sample = data[:_MAX_SAMPLE]
    n = len(sample)
    single_counts = np.bincount(sample, minlength=256)
    pair_counts = np.zeros(65536, dtype=np.int64)
    if n >= 2:
        pairs = (sample[:-1].astype(np.int32) << 8) | sample[1:]
        # drop pairs that span string boundaries
        bounds = offsets[1:-1]
        bounds = bounds[(bounds > 0) & (bounds < n)]
        valid = np.ones(n - 1, dtype=bool)
        valid[bounds - 1] = False
        pair_counts = np.bincount(pairs[valid], minlength=65536)
    present = np.nonzero(single_counts)[0]
    order = present[np.argsort(single_counts[present], kind="stable")[::-1]]
    n_singles = min(len(order), 255)
    budget = 255 - n_singles
    top_pairs = np.argsort(pair_counts, kind="stable")[::-1][:budget]
    top_pairs = top_pairs[pair_counts[top_pairs] >= 4]
    sym_len = np.zeros(256, dtype=np.uint8)
    sym_first = np.zeros(256, dtype=np.uint8)
    sym_second = np.zeros(256, dtype=np.uint8)
    code = 0
    for p in top_pairs:
        sym_len[code] = 2
        sym_first[code] = p >> 8
        sym_second[code] = p & 0xFF
        code += 1
    for b in order[:n_singles]:
        sym_len[code] = 1
        sym_first[code] = b
        code += 1
    return {"sym_len": sym_len, "sym_first": sym_first, "sym_second": sym_second}


def _tables(table: dict):
    sym_len, sym_first, sym_second = (
        table["sym_len"],
        table["sym_first"],
        table["sym_second"],
    )
    pair_code = np.full(65536, -1, dtype=np.int32)
    single_code = np.full(256, -1, dtype=np.int32)
    two = np.nonzero(sym_len == 2)[0]
    one = np.nonzero(sym_len == 1)[0]
    pair_code[(sym_first[two].astype(np.int32) << 8) | sym_second[two]] = two
    single_code[sym_first[one]] = one
    return pair_code, single_code


def encode_buffer(data: np.ndarray, offsets: np.ndarray, table: dict):
    """Encode the concatenated string buffer → (new_data, new_offsets)."""
    pair_code, single_code = _tables(table)
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), offsets.astype(np.int64).copy()
    if n >= 2:
        pairs16 = data[:-1].astype(np.uint16)
        pairs16 <<= 8
        pairs16 |= data[1:]
        pmatch = pair_code[pairs16] >= 0
        bounds = offsets[1:-1]
        bounds = bounds[(bounds > 0) & (bounds < n)]
        pmatch[bounds - 1] = False
    else:
        pairs16 = np.zeros(0, dtype=np.uint16)
        pmatch = np.zeros(0, dtype=bool)
    starts, lens = _run_starts_lens(pmatch)
    taken = _alternating_positions(starts, lens)
    is_pair = np.zeros(n, dtype=bool)
    is_pair[taken] = True
    covered = np.zeros(n, dtype=bool)
    covered[taken + 1] = True
    single_pos = ~is_pair & ~covered
    in_table = single_code[data] >= 0
    out_len = np.zeros(n, dtype=np.int64)
    out_len[is_pair] = 1
    out_len[single_pos & in_table] = 1
    out_len[single_pos & ~in_table] = 2
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    if len(taken):
        out[out_off[taken]] = pair_code[pairs16[taken]]
    sp = np.nonzero(single_pos & in_table)[0]
    out[out_off[sp]] = single_code[data[sp]]
    ep = np.nonzero(single_pos & ~in_table)[0]
    out[out_off[ep]] = ESCAPE
    out[out_off[ep] + 1] = data[ep]
    new_offsets = out_off[offsets]
    return out, new_offsets


def decode_buffer(enc: np.ndarray, enc_offsets: np.ndarray, table: dict):
    """Inverse of :func:`encode_buffer` → (data, offsets)."""
    sym_len = table["sym_len"].astype(np.int64)
    sym_first, sym_second = table["sym_first"], table["sym_second"]
    n = len(enc)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), enc_offsets.astype(np.int64).copy()
    is255 = enc == ESCAPE
    starts, lens = _run_starts_lens(is255)
    esc = _alternating_positions(starts, lens)
    is_esc = np.zeros(n, dtype=bool)
    is_esc[esc] = True
    is_lit = np.zeros(n, dtype=bool)
    is_lit[esc + 1] = True
    is_code = ~is_esc & ~is_lit
    out_len = np.zeros(n, dtype=np.int64)
    out_len[is_lit] = 1
    cp = np.nonzero(is_code)[0]
    out_len[cp] = sym_len[enc[cp]]
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    lp = np.nonzero(is_lit)[0]
    out[out_off[lp]] = enc[lp]
    out[out_off[cp]] = sym_first[enc[cp]]
    cp2 = cp[sym_len[enc[cp]] == 2]
    out[out_off[cp2] + 1] = sym_second[enc[cp2]]
    offsets = out_off[enc_offsets]
    return out, offsets


class FsstCodec:
    name = "fsst"

    @staticmethod
    def encode(offsets: np.ndarray, data):
        d = (
            np.asarray(data, dtype=np.uint8)
            if isinstance(data, np.ndarray)
            else np.frombuffer(data, dtype=np.uint8)
        )
        offs = np.asarray(offsets, dtype=np.int64)
        table = train(d, offs)
        enc, new_offsets = encode_buffer(d, offs, table)
        off_meta, off_buf = DeltaCodec.encode(new_offsets)
        meta = {"n": len(offs) - 1, "offsets_meta": off_meta}
        buffers = {
            "data": enc.tobytes(),
            "offsets": off_buf["packed"],
            "symbols": np.concatenate(
                [table["sym_len"], table["sym_first"], table["sym_second"]]
            ).tobytes(),
        }
        return meta, buffers

    @staticmethod
    def decode(meta: dict, buffers: dict):
        syms = np.frombuffer(buffers["symbols"], dtype=np.uint8)
        table = {
            "sym_len": syms[:256],
            "sym_first": syms[256:512],
            "sym_second": syms[512:768],
        }
        enc_offsets = DeltaCodec.decode(
            meta["offsets_meta"], {"packed": buffers["offsets"]}
        )
        enc = np.frombuffer(buffers["data"], dtype=np.uint8)
        data, offsets = decode_buffer(enc, enc_offsets, table)
        return offsets, data.tobytes()
