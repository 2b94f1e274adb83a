"""`Rle` — run-length-encoded vector, API-compatible with the reference.

A thin object layer over :mod:`pyrle_spark.kernels.rlecore`.  This class
is (a) the user-facing single-vector API (same surface as the reference's
``pyrle.Rle``, ``/root/reference/pyrle/rle.py``), and (b) the vendored
oracle the test suite compares the distributed operators against.

All heavy lifting is in the vectorized kernels; nothing here loops per
element.  The distributed analog is :class:`pyrle_spark.rledict.RleFrame`.
"""

from __future__ import annotations

from numbers import Number

import numpy as np
import pandas as pd

from pyrle_spark.kernels import rlecore as k

__all__ = ["Rle"]


class Rle:
    """Run-length encoded float64 vector: parallel ``runs``/``values`` arrays.

    Semantics mirror the reference (``pyrle/rle.py:67-167``): runs int64,
    values float64, zero-length runs dropped, near-equal adjacent values
    merged, binary ops zero-extend the shorter operand.
    """

    __slots__ = ("runs", "values")

    def __init__(self, runs=None, values=None):
        if runs is not None and values is not None:
            self.runs, self.values = k.normalize(runs, values)
        elif runs is not None:
            # single argument = raw values; RLE-encode (rle.py:161-163)
            self.runs, self.values = k.find_runs(np.asarray(runs))
            self.values = np.asarray(self.values, dtype=np.float64)
        else:
            self.runs = np.array([], dtype=np.int64)
            self.values = np.array([], dtype=np.float64)

    # -- construction helpers -------------------------------------------------
    @classmethod
    def from_array(cls, arr) -> "Rle":
        return cls(arr)

    def copy(self) -> "Rle":
        return Rle(np.copy(self.runs), np.copy(self.values))

    # -- size ------------------------------------------------------------------
    def __len__(self) -> int:
        """Number of runs (rle.py:429-436)."""
        return len(self.runs)

    @property
    def length(self) -> int:
        """Logical vector length = sum(runs) (rle.py:917-943)."""
        return int(np.sum(self.runs))

    # -- arithmetic --------------------------------------------------------------
    def _binary(self, other, op: str) -> "Rle":
        if isinstance(other, Number):
            scalar_ops = {
                "add": lambda v: v + other,
                "sub": lambda v: v - other,
                "mul": lambda v: v * other,
                "div": lambda v: v / other,
            }
            return Rle(self.runs, scalar_ops[op](self.values))
        runs, values = k.binary_op(op, self.runs, self.values, other.runs, other.values)
        out = Rle.__new__(Rle)
        out.runs, out.values = runs, values
        return out

    def __add__(self, other):
        return self._binary(other, "add")

    def __radd__(self, other):
        return self._binary(other, "add")

    def __sub__(self, other):
        return self._binary(other, "sub")

    def __rsub__(self, other):
        if isinstance(other, Number):
            return Rle(self.runs, other - self.values)
        return NotImplemented

    def __mul__(self, other):
        return self._binary(other, "mul")

    def __rmul__(self, other):
        return self._binary(other, "mul")

    def __truediv__(self, other):
        return self._binary(other, "div")

    def __rtruediv__(self, other):
        if isinstance(other, Number):
            return Rle(self.runs, other / self.values)
        return NotImplemented

    def __neg__(self):
        """Negate values, runs unchanged (rle.py:524-549)."""
        return Rle(self.runs, -self.values)

    # -- comparisons (0/1-valued Rles, like the reference; rle.py:248-276) ------
    def _cmp(self, other, op: str) -> "Rle":
        if isinstance(other, Number):
            return Rle(
                self.runs, np.where(k._CMP_FNS[op](self.values, other), 1.0, 0.0)
            ).defragment()
        out = Rle.__new__(Rle)
        out.runs, out.values = k.compare_op(
            op, self.runs, self.values, other.runs, other.values
        )
        return out

    def __eq__(self, other):  # noqa: D105 — NaN-extension per rle.py:272
        return self._cmp(other, "eq")

    def __ne__(self, other):
        return self._cmp(other, "ne")

    def __lt__(self, other):
        return self._cmp(other, "lt")

    def __le__(self, other):
        return self._cmp(other, "le")

    def __gt__(self, other):
        return self._cmp(other, "gt")

    def __ge__(self, other):
        return self._cmp(other, "ge")

    __hash__ = None  # mirrors reference: defining __eq__ makes Rle unhashable

    def equals(self, other: "Rle") -> bool:
        """Structural equality (used by tests; reference RleDict.__eq__ analog:
        rledict.py:188-198 — array_equal runs, allclose(equal_nan) values)."""
        return np.array_equal(self.runs, other.runs) and np.allclose(
            self.values, other.values, equal_nan=True
        )

    # -- numpy ufunc passthrough (rle.py:203-246): applied to values, no defrag -
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__":
            return NotImplemented
        args = [x.values if isinstance(x, Rle) else x for x in inputs]
        out = Rle.__new__(Rle)
        out.runs = np.copy(self.runs)
        out.values = ufunc(*args, **kwargs).astype(np.float64)
        return out

    # -- apply family (rle.py:747-872) -------------------------------------------
    def apply_values(self, f, defragment: bool = True) -> "Rle":
        out = Rle.__new__(Rle)
        out.runs = np.copy(self.runs)
        out.values = np.asarray(f(np.copy(self.values)), dtype=np.float64)
        return out.defragment() if defragment else out

    def apply_runs(self, f, defragment: bool = True) -> "Rle":
        out = Rle.__new__(Rle)
        out.runs = np.asarray(f(np.copy(self.runs)), dtype=np.int64)
        out.values = np.copy(self.values)
        return out.defragment() if defragment else out

    def apply(self, f, defragment: bool = True):
        result = f(self.copy())
        if defragment and isinstance(result, Rle):
            return result.defragment()
        return result

    # -- normalization ------------------------------------------------------------
    def defragment(self) -> "Rle":
        """Merge near-equal adjacent runs; -0.0 → 0.0 (rle.py:879-915)."""
        out = Rle.__new__(Rle)
        out.runs, out.values = k.defragment(self.runs, self.values)
        return out

    def numbers_only(self, nan=0.0, posinf=2147483647, neginf=-2147483648) -> "Rle":
        """NaN/±inf → finite sentinels, then defragment (rle.py:961-998)."""
        return Rle(
            self.runs,
            np.nan_to_num(self.values, nan=nan, posinf=posinf, neginf=neginf),
        ).defragment()

    # -- aggregations (faithful quirks) ---------------------------------------------
    def mean(self) -> float:
        """sum(values)/sum(runs) — NOT run-weighted, despite the reference
        docstring's claim; formula reproduced verbatim (rle.py:945-959)."""
        return float(np.sum(self.values) / self.length)

    def weighted_mean(self) -> float:
        """The run-weighted mean the reference docstring *describes* —
        offered as the corrected variant."""
        return float(np.sum(self.values * self.runs) / self.length)

    def std(self) -> float:
        """sqrt( (sum(values - mean))**2 / (length-1) ) — the square sits
        outside the sum in the reference; reproduced verbatim (rle.py:1097-1113)."""
        s = np.sum(self.values - self.mean()) ** 2
        return float(np.sqrt(s / (self.length - 1)))

    # -- shift / indexing --------------------------------------------------------------
    def shift(self, dist: int = 1, preserve_length: bool = True, fill: float = 0.0) -> "Rle":
        out = Rle.__new__(Rle)
        out.runs, out.values = k.shift_rle(
            self.runs, self.values, dist, preserve_length, fill
        )
        return out

    def __getitem__(self, val):
        if isinstance(val, int):
            return float(k.getlocs(self.runs, self.values, np.array([val]))[0])
        if isinstance(val, slice):
            start = val.start or 0
            # reference quirk kept verbatim (rle.py:283-284: `end =
            # val.stop or length`): stop=0 is FALSY, so r[0:0] returns
            # the FULL vector, not an empty Rle
            stop = val.stop or self.length
            runs, values = k.getitem_slice(self.runs, self.values, start, stop)
            return Rle(runs, values)
        if isinstance(val, pd.DataFrame):
            intype = val.dtypes["Start"]
            ids, starts, ends, runs, values = k.getitems(
                self.runs,
                self.values,
                val.Start.to_numpy(np.int64),
                val.End.to_numpy(np.int64),
            )
            return pd.DataFrame(
                {"Start": starts, "End": ends, "ID": ids, "Run": runs, "Value": values}
            ).astype({"Start": intype, "End": intype})
        locs = np.sort(np.asarray(val, dtype=np.int64))
        return k.getlocs(self.runs, self.values, locs)

    def getlocs(self, locs) -> np.ndarray:
        return k.getlocs(self.runs, self.values, np.asarray(locs, dtype=np.int64))

    # -- interchange ------------------------------------------------------------------
    def to_array(self) -> np.ndarray:
        return k.decode_runs(self.runs, self.values)

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame({"Runs": self.runs, "Values": self.values})

    def to_csv(self, **kwargs):
        return self.to_frame().to_csv(**kwargs)

    def __repr__(self) -> str:
        n = len(self.runs)
        head = min(n, 5)
        rs = ", ".join(str(int(r)) for r in self.runs[:head]) + ("…" if n > head else "")
        vs = ", ".join(f"{v:g}" for v in self.values[:head]) + ("…" if n > head else "")
        return (
            f"Rle(runs=[{rs}], values=[{vs}]) "
            f"length {self.length} containing {n} elements"
        )

    __str__ = __repr__
