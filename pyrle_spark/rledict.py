"""`RleDict` — keyed collection of Rles, API-compatible with the reference.

Mirrors ``/root/reference/pyrle/rledict.py`` (class RleDict) and
``/root/reference/pyrle/methods.py`` (coverage, binary_operation,
to_ranges): a dict mapping ``chromosome`` or ``(chromosome, strand)``
keys to :class:`pyrle_spark.rle.Rle`, with full-outer key alignment for
binary ops and interval-coverage construction.

This is the *driver-side* compat layer (the reference itself is a
single-machine library).  The distributed analog over a Spark DataFrame
is :class:`pyrle_spark.operators.rleframe.RleFrame`, which shares these
exact semantics via the same kernels.
"""

from __future__ import annotations

import re
from numbers import Number

import numpy as np
import pandas as pd

from pyrle_spark.kernels import rlecore as k
from pyrle_spark.rle import Rle

__all__ = ["RleDict", "coverage_from_intervals", "natsort_key"]

_NAT_SPLIT = re.compile(r"(\d+)")


def natsort_key(key):
    """Natural-sort key (reference uses `natsorted` throughout,
    e.g. rledict.py:153,336): 'chr2' < 'chr10'.  Tokens are tagged
    (0, int) / (1, str) so mixed numeric/alphabetic key sets — Ensembl
    '1', '2', 'X', 'MT' — compare like natsorted's (numbers first)
    instead of raising int-vs-str TypeError."""
    parts = key if isinstance(key, tuple) else (key,)
    out = []
    for p in parts:
        out.append(
            tuple(
                (0, int(tok), "") if tok.isdigit() else (1, 0, tok)
                for tok in _NAT_SPLIT.split(str(p))
                if tok != ""
            )
        )
    return out


def coverage_from_intervals(df: pd.DataFrame, value_col: str | None = None) -> Rle:
    """Interval table → step-function Rle (``methods.py:139-156``).

    +value events at Start, -value at End, stable position sort, then the
    coverage kernel.  ``value_col=None`` means unit weights.
    """
    if value_col:
        values = df[value_col].to_numpy(np.float64)
    else:
        values = np.ones(len(df), dtype=np.float64)
    positions = np.concatenate(
        [df["Start"].to_numpy(np.int64), df["End"].to_numpy(np.int64)]
    )
    deltas = np.concatenate([values, -values])
    runs, vals = k.coverage(positions, deltas)
    return Rle(runs, vals)


def _zero_rle_like(rle: Rle) -> Rle:
    """Zero-valued Rle of the same logical length (methods.py:104-111)."""
    return Rle([rle.length], [0.0]) if rle.length else Rle()


class RleDict:
    """Keyed collection of Rles.

    Construct from a dict of Rles, or from an interval DataFrame
    ``(Chromosome, Start, End[, Strand][, value_col])`` via per-key
    coverage (``rledict.py:133-180``).
    """

    def __init__(self, data=None, stranded: bool = False, value_col: str | None = None):
        if data is None:
            self.rles: dict = {}
        elif isinstance(data, dict):
            self.rles = dict(data)
        elif isinstance(data, pd.DataFrame):
            keys = ["Chromosome", "Strand"] if stranded else ["Chromosome"]
            groups = {}
            for key, sub in data.groupby(keys, sort=False):
                key = key if stranded else (key[0] if isinstance(key, tuple) else key)
                groups[key] = coverage_from_intervals(sub, value_col)
            self.rles = {
                key: groups[key] for key in sorted(groups, key=natsort_key)
            }
        else:
            raise TypeError(f"cannot build RleDict from {type(data)}")

    # -- key plumbing -------------------------------------------------------------
    @property
    def stranded(self) -> bool:
        """Keys are (chromosome, strand) tuples (rledict.py:698-703)."""
        return bool(self.rles) and isinstance(next(iter(self.rles)), tuple)

    def keys(self):
        return list(self.rles.keys())

    def values(self):
        return list(self.rles.values())

    def items(self):
        return list(self.rles.items())

    def __iter__(self):
        return iter(self.rles.items())

    def __len__(self) -> int:
        return len(self.rles)

    def add(self, other):
        return self.__add__(other)

    def sub(self, other):
        return self.__sub__(other)

    def mul(self, other):
        return self.__mul__(other)

    def div(self, other):
        return self.__truediv__(other)

    def __getitem__(self, key):
        # missing str key → empty Rle; missing tuple key → Rle([1],[0]) —
        # the reference's inconsistent defaults, kept deliberately
        # (rledict.py:254 vs :298-299)
        if isinstance(key, int):
            raise KeyError("integer keys not supported (rledict.py:232-233)")
        if isinstance(key, pd.DataFrame):
            # interval-table subset (the PyRanges branch of the reference,
            # rledict.py:256-296, duck-typed here on the DataFrame shape):
            # per-key batch range extraction, missing keys skipped
            if key.empty:
                return pd.DataFrame(
                    columns="Chromosome Start End ID Run Value".split()
                )
            group_cols = (
                ["Chromosome", "Strand"]
                if self.stranded and "Strand" in key.columns
                else ["Chromosome"]
            )
            frames = []
            for gk, sub in key.groupby(group_cols, sort=False):
                gk = gk if len(group_cols) == 2 else (
                    gk[0] if isinstance(gk, tuple) else gk
                )
                if gk not in self.rles:
                    continue
                rle = self.rles[gk]
                ids, starts, ends, runs, values = k.getitems(
                    rle.runs,
                    rle.values,
                    sub["Start"].to_numpy(np.int64),
                    sub["End"].to_numpy(np.int64),
                )
                df = pd.DataFrame(
                    {"Start": starts, "End": ends, "ID": ids,
                     "Run": runs, "Value": values}
                )
                if isinstance(gk, tuple):
                    df.insert(0, "Chromosome", gk[0])
                    df["Strand"] = gk[1]
                else:
                    df.insert(0, "Chromosome", gk)
                frames.append(df)
            if not frames:
                return pd.DataFrame(
                    columns="Chromosome Start End ID Run Value".split()
                )
            return pd.concat(frames, ignore_index=True)
        if isinstance(key, tuple):
            return self.rles.get(key, Rle([1], [0]))
        if key in ("+", "-") and self.stranded:
            return RleDict(
                {kk: v for kk, v in self.rles.items() if kk[1] == key}
            )
        return self.rles.get(key, Rle())

    def __setitem__(self, key, value):
        self.rles[key] = value

    def __contains__(self, key):
        return key in self.rles

    # -- equality: whole-collection boolean (rledict.py:188-198) -------------------
    def __eq__(self, other) -> bool:
        if not isinstance(other, RleDict):
            return NotImplemented
        if set(self.rles) != set(other.rles):
            return False
        return all(self.rles[k_].equals(other.rles[k_]) for k_ in self.rles)

    __hash__ = None

    # -- binary ops: full-outer key alignment (methods.py:68-120) ------------------
    def _merge_strands(self) -> "RleDict":
        """Collapse (chrom, strand) keys to chrom by adding strands
        (methods.py:43-55)."""
        out: dict = {}
        for (chrom, _), rle in self.rles.items():
            out[chrom] = out[chrom] + rle if chrom in out else rle
        return RleDict(out)

    def _binary(self, other, op: str) -> "RleDict":
        if isinstance(other, Number):
            return RleDict(
                {kk: rle._binary(other, op) for kk, rle in self.rles.items()}
            )
        self_, other_ = self, other
        # strandedness reconciliation: merge strands on the stranded side
        # when the two sides disagree (methods.py:58-65,90-91)
        if self_.stranded and not other_.stranded:
            self_ = self_._merge_strands()
        elif other_.stranded and not self_.stranded:
            other_ = other_._merge_strands()
        both = set(self_.rles) & set(other_.rles)
        only_self = set(self_.rles) - set(other_.rles)
        only_other = set(other_.rles) - set(self_.rles)
        out = {}
        for kk in both:
            out[kk] = self_.rles[kk]._binary(other_.rles[kk], op)
        for kk in only_self:
            out[kk] = self_.rles[kk]._binary(_zero_rle_like(self_.rles[kk]), op)
        for kk in only_other:
            out[kk] = _zero_rle_like(other_.rles[kk])._binary(other_.rles[kk], op)
        return RleDict({kk: out[kk] for kk in sorted(out, key=natsort_key)})

    def __add__(self, other):
        return self._binary(other, "add")

    def __radd__(self, other):
        return self._binary(other, "add")

    def __sub__(self, other):
        return self._binary(other, "sub")

    def __mul__(self, other):
        return self._binary(other, "mul")

    def __rmul__(self, other):
        return self._binary(other, "mul")

    def __truediv__(self, other):
        return self._binary(other, "div")

    def __rsub__(self, other):
        # reference form: per-key `other - rle` (rledict.py:320-321)
        return RleDict({kk: other - rle for kk, rle in self.rles.items()})

    def __rtruediv__(self, other):
        return RleDict({kk: other / rle for kk, rle in self.rles.items()})

    @property
    def chromosomes(self):
        """Natural-sorted chromosome names (rledict.py:608-618)."""
        cs = {k[0] if isinstance(k, tuple) else k for k in self.rles}
        return sorted(cs, key=natsort_key)

    def add_pseudocounts(self, pseudo: float = 0.01) -> None:
        """Replace zero values with ``pseudo``, in place.

        The reference implementation (rledict.py:418-420) crashes — it
        calls ``.loc`` on a numpy array; this is the working version of
        its documented intent (values==0 → pseudo), same mutate-in-place,
        returns-None contract.
        """
        for rle in self.rles.values():
            rle.values[rle.values == 0] = pseudo

    def to_csv(self, f, sep: str = "\t") -> None:
        """Write the keyed run table as CSV (rledict.py:705-706)."""
        self.to_table().to_csv(f, sep=sep, index=False)

    # -- apply family (rledict.py:422-606) -----------------------------------------
    def apply(self, f, **kwargs):
        """Quirk kept: RleDict.apply *always* defragments, ignoring any
        defragment kwarg (rledict.py:480)."""
        return RleDict(
            {kk: f(rle.copy()).defragment() for kk, rle in self.rles.items()}
        )

    def apply_values(self, f, defragment: bool = True, **kwargs):
        return RleDict(
            {
                kk: rle.apply_values(f, defragment=defragment)
                for kk, rle in self.rles.items()
            }
        )

    def apply_runs(self, f, defragment: bool = True, **kwargs):
        return RleDict(
            {
                kk: rle.apply_runs(f, defragment=defragment)
                for kk, rle in self.rles.items()
            }
        )

    def defragment(self):
        return RleDict({kk: rle.defragment() for kk, rle in self.rles.items()})

    def numbers_only(self, **kwargs):
        return RleDict({kk: rle.numbers_only(**kwargs) for kk, rle in self.rles.items()})

    def shift(self, **kwargs):
        return RleDict({kk: rle.shift(**kwargs) for kk, rle in self.rles.items()})

    def copy(self):
        return RleDict({kk: rle.copy() for kk, rle in self.rles.items()})

    def make_strands_same_length(self, fill_value: float = 0.0) -> "RleDict":
        """Pad the shorter strand per chromosome (rledict.py:650-676)."""
        if not self.stranded:
            return self.copy()
        out = {}
        chroms = {c for c, _ in self.rles}
        for c in chroms:
            plus = self.rles.get((c, "+"))
            minus = self.rles.get((c, "-"))
            maxlen = max(
                plus.length if plus else 0, minus.length if minus else 0
            )
            for strand, rle in (("+", plus), ("-", minus)):
                if rle is None:
                    continue
                if rle.length < maxlen:
                    rle = Rle(
                        np.append(rle.runs, maxlen - rle.length),
                        np.append(rle.values, fill_value),
                    )
                out[(c, strand)] = rle
        return RleDict({kk: out[kk] for kk in sorted(out, key=natsort_key)})

    # -- decode to intervals (methods.py:159-213, rledict.py:708-742) ---------------
    def to_ranges(self) -> pd.DataFrame:
        """Decode runs to interval rows ``(Chromosome, Start, End, Score
        [, Strand])``; merges equal-value neighbors, drops Score==0 rows."""
        frames = []
        for kk in sorted(self.rles, key=natsort_key):
            rle = self.rles[kk]
            if len(rle.runs) == 0:
                continue
            starts = np.concatenate(([0], np.cumsum(rle.runs)[:-1]))
            ends = np.cumsum(rle.runs)
            # merge consecutive equal values (methods.py:203-207)
            vals = rle.values
            new_grp = np.concatenate(([True], vals[1:] != vals[:-1]))
            grp_idx = np.nonzero(new_grp)[0]
            grp_end_idx = np.concatenate((grp_idx[1:] - 1, [len(vals) - 1]))
            df = pd.DataFrame(
                {
                    "Start": starts[grp_idx],
                    "End": ends[grp_end_idx],
                    "Score": vals[grp_idx],
                }
            )
            df = df[df.Score != 0]
            if isinstance(kk, tuple):
                df.insert(0, "Chromosome", kk[0])
                df["Strand"] = kk[1]
            else:
                df.insert(0, "Chromosome", kk)
            frames.append(df)
        if not frames:
            return pd.DataFrame(columns=["Chromosome", "Start", "End", "Score"])
        return pd.concat(frames, ignore_index=True)

    def to_table(self) -> pd.DataFrame:
        """Concat per-key (Runs, Values) frames with key columns
        (rledict.py:744-758)."""
        frames = []
        for kk in sorted(self.rles, key=natsort_key):
            df = self.rles[kk].to_frame()
            if isinstance(kk, tuple):
                df.insert(0, "Strand", kk[1])
                df.insert(0, "Chromosome", kk[0])
            else:
                df.insert(0, "Chromosome", kk)
            frames.append(df)
        if not frames:
            return pd.DataFrame(columns=["Chromosome", "Runs", "Values"])
        return pd.concat(frames, ignore_index=True)

    def __repr__(self) -> str:
        keys = sorted(self.rles, key=natsort_key)
        return f"RleDict with {len(keys)} keys: {keys[:6]}{'…' if len(keys) > 6 else ''}"

    __str__ = __repr__
