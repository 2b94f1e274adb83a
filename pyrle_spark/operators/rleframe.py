"""RleFrame — the distributed RleDict: a DataFrame of one RLE per key.

Schema: ``(key columns ..., runs array<bigint>, values array<double>)``.
The reference's dict-of-Rle (rledict.py:37-131) becomes rows; its
full-outer key alignment for binary ops (methods.py:68-120) becomes a
full-outer join; its per-key ray parallelism (rledict.py:155-176)
becomes Spark tasks.  The run/value kernels are the same vectorized
numpy as the driver-side compat layer (pyrle_spark.kernels.rlecore), so
both layers share exact semantics — including the zero-extension and
normalization quirks.

Per-key work runs in Arrow-batched UDFs; each key's arrays live in one
row, so a binary op is a *row-local* kernel call after the join — no
second shuffle.  Keys are chromosome-scale (few, large); hot-key skew in
keyed construction is mitigated by the two-phase event pre-aggregation
(events collapse per (key, pos) before the per-key kernel).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyrle_spark.kernels import rlecore as k
from pyrle_spark.rle import Rle
from pyrle_spark.rledict import RleDict

__all__ = ["RleFrame"]

_RLE_SCHEMA_SUFFIX = "runs array<bigint>, values array<double>"


def _keyed_schema(key_cols):
    keys = ", ".join(f"{c} string" for c in key_cols)
    return f"{keys}, {_RLE_SCHEMA_SUFFIX}"


class RleFrame:
    def __init__(self, df: DataFrame, key_cols=("key",)):
        self.df = df
        self.key_cols = list(key_cols)

    # ------------------------------------------------------------ construction

    @classmethod
    def from_intervals(
        cls,
        df: DataFrame,
        key_cols=("Chromosome",),
        start_col: str = "Start",
        end_col: str = "End",
        value_col: str | None = None,
    ) -> "RleFrame":
        """Interval coverage per key (methods.py:139-156 distributed).

        Two phases: (1) relational event pre-aggregation — explode each
        interval to ±value boundary events and sum per (key, position);
        this is the map-side collapse that blunts hot-key skew; (2) one
        grouped Arrow pass building the per-key step function with the
        exact reference kernel (coverage.pyx:28-81 semantics)."""
        key_cols = list(key_cols)
        val = F.col(value_col).cast("double") if value_col else F.lit(1.0)
        ev = df.select(
            *key_cols, F.col(start_col).alias("pos"), val.alias("d")
        ).unionAll(
            df.select(*key_cols, F.col(end_col).alias("pos"), (-val).alias("d"))
        )
        agg = ev.groupBy(*key_cols, "pos").agg(F.sum("d").alias("d"))

        def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            tbl = pa.Table.from_batches(list(batches))
            if tbl.num_rows == 0:
                return
            pdf = tbl.to_pandas()
            keys = tuple(pdf.iloc[0][c] for c in key_cols)
            runs, values = k.coverage(
                pdf["pos"].to_numpy(np.int64), pdf["d"].to_numpy(np.float64)
            )
            runs, values = k.normalize(runs, values)
            out = {c: [v] for c, v in zip(key_cols, keys)}
            out["runs"] = [runs]
            out["values"] = [values]
            yield pa.RecordBatch.from_pydict(out)

        keyed = agg.groupBy(*key_cols).applyInArrow(
            build, _keyed_schema(key_cols)
        )
        return cls(keyed, key_cols)

    @classmethod
    def from_rledict(cls, spark: SparkSession, rd: RleDict) -> "RleFrame":
        rows = []
        for key, rle in rd.items():
            key_t = key if isinstance(key, tuple) else (key,)
            rows.append((*key_t, rle.runs.tolist(), rle.values.tolist()))
        stranded = rd.stranded
        key_cols = ["Chromosome", "Strand"] if stranded else ["Chromosome"]
        df = spark.createDataFrame(rows, schema=_keyed_schema(key_cols))
        return cls(df, key_cols)

    def to_rledict(self) -> RleDict:
        out = {}
        for row in self.df.collect():
            key = tuple(row[c] for c in self.key_cols)
            if len(key) == 1:
                key = key[0]
            rle = Rle.__new__(Rle)
            rle.runs = np.array(row["runs"], dtype=np.int64)
            rle.values = np.array(row["values"], dtype=np.float64)
            out[key] = rle
        return RleDict(out)

    # ------------------------------------------------------------ binary ops

    def _binary(self, other: "RleFrame", op: str) -> "RleFrame":
        """Full-outer key alignment + row-local merge kernel
        (methods.py:80-120 distributed).  Missing side → zero-Rle of the
        present side's length (methods.py:104-111)."""
        a = self.df.select(
            *self.key_cols,
            F.col("runs").alias("runs_a"),
            F.col("values").alias("values_a"),
        )
        b = other.df.select(
            *self.key_cols,
            F.col("runs").alias("runs_b"),
            F.col("values").alias("values_b"),
        )
        joined = a.join(b, on=self.key_cols, how="full_outer")
        key_cols = self.key_cols

        def merge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                pdf = batch.to_pandas()
                out_runs, out_vals = [], []
                for _, row in pdf.iterrows():
                    ra, va = row["runs_a"], row["values_a"]
                    rb, vb = row["runs_b"], row["values_b"]
                    if ra is None:
                        total = int(np.sum(rb))
                        ra, va = (np.array([total]), np.array([0.0])) if total else (
                            np.array([], dtype=np.int64),
                            np.array([], dtype=np.float64),
                        )
                    if rb is None:
                        total = int(np.sum(ra))
                        rb, vb = (np.array([total]), np.array([0.0])) if total else (
                            np.array([], dtype=np.int64),
                            np.array([], dtype=np.float64),
                        )
                    args = (
                        np.asarray(ra, dtype=np.int64),
                        np.asarray(va, dtype=np.float64),
                        np.asarray(rb, dtype=np.int64),
                        np.asarray(vb, dtype=np.float64),
                    )
                    if op.startswith("cmp_"):
                        runs, values = k.compare_op(op[len("cmp_"):], *args)
                    else:
                        runs, values = k.binary_op(op, *args)
                    out_runs.append(runs)
                    out_vals.append(values)
                data = {c: pdf[c] for c in key_cols}
                data["runs"] = out_runs
                data["values"] = out_vals
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(data), preserve_index=False
                )

        out = joined.mapInArrow(merge, _keyed_schema(key_cols))
        return RleFrame(out, key_cols)

    def __add__(self, other):
        return self._apply_or_binary(other, "add")

    def __sub__(self, other):
        return self._apply_or_binary(other, "sub")

    def __mul__(self, other):
        return self._apply_or_binary(other, "mul")

    def __truediv__(self, other):
        return self._apply_or_binary(other, "div")

    def _apply_or_binary(self, other, op):
        if isinstance(other, (int, float)):
            fn = {
                "add": lambda v: v + other,
                "sub": lambda v: v - other,
                "mul": lambda v: v * other,
                "div": lambda v: v / other,
            }[op]
            return self.apply_values(fn)
        return self._binary(other, op)

    # ------------------------------------------------------------ element ops

    def apply_values(self, fn, defragment: bool = True) -> "RleFrame":
        """Vectorized values-map per key (rle.py:747-802 distributed)."""
        key_cols = self.key_cols

        def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                pdf = batch.to_pandas()
                runs_out, vals_out = [], []
                for _, row in pdf.iterrows():
                    runs = np.asarray(row["runs"], dtype=np.int64)
                    values = fn(np.asarray(row["values"], dtype=np.float64))
                    if defragment:
                        runs, values = k.defragment(runs, values)
                    runs_out.append(runs)
                    vals_out.append(np.asarray(values, dtype=np.float64))
                data = {c: pdf[c] for c in key_cols}
                data["runs"] = runs_out
                data["values"] = vals_out
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(data), preserve_index=False
                )

        return RleFrame(self.df.mapInArrow(run, _keyed_schema(key_cols)), key_cols)

    def defragment(self) -> "RleFrame":
        return self.apply_values(lambda v: v, defragment=True)

    def _rowwise(self, fn) -> "RleFrame":
        """Map (runs, values) → (runs, values) per key row in one Arrow pass."""
        key_cols = self.key_cols

        def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                pdf = batch.to_pandas()
                runs_out, vals_out = [], []
                for _, row in pdf.iterrows():
                    runs, values = fn(
                        np.asarray(row["runs"], dtype=np.int64),
                        np.asarray(row["values"], dtype=np.float64),
                    )
                    runs_out.append(np.asarray(runs, dtype=np.int64))
                    vals_out.append(np.asarray(values, dtype=np.float64))
                data = {c: pdf[c] for c in key_cols}
                data["runs"] = runs_out
                data["values"] = vals_out
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(data), preserve_index=False
                )

        return RleFrame(self.df.mapInArrow(run, _keyed_schema(key_cols)), key_cols)

    def shift(self, dist: int = 1, preserve_length: bool = True, fill: float = 0.0):
        """Logical-vector shift per key (rle.py:1000-1095 distributed)."""
        return self._rowwise(
            lambda r, v: k.shift_rle(r, v, dist, preserve_length, fill)
        )

    def numbers_only(self, nan=0.0, posinf=2147483647, neginf=-2147483648):
        """NaN/±inf → finite sentinels + defragment (rle.py:961-998)."""
        return self._rowwise(
            lambda r, v: k.numbers_only(r, v, nan=nan, posinf=posinf, neginf=neginf)
        )

    def compare(self, other: "RleFrame", op: str) -> "RleFrame":
        """Comparison → 0/1-valued RLEs with the reference's NaN/zero
        extension rules (rle.py:248-276 distributed)."""
        out = self._binary(other, f"cmp_{op}")
        return out

    def __eq__(self, other):  # noqa: D105
        if isinstance(other, RleFrame):
            return self.compare(other, "eq")
        return NotImplemented

    __hash__ = None

    def __lt__(self, other):
        return self.compare(other, "lt")

    def __le__(self, other):
        return self.compare(other, "le")

    def __gt__(self, other):
        return self.compare(other, "gt")

    def __ge__(self, other):
        return self.compare(other, "ge")

    def getlocs(self, locs) -> DataFrame:
        """Point lookups per key: value of the run covering each position
        (getitem.pyx:89-109 distributed).  ``locs`` is a python list
        applied to every key."""
        key_cols = self.key_cols
        locs_arr = np.sort(np.asarray(locs, dtype=np.int64))

        def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                pdf = batch.to_pandas()
                frames = []
                for _, row in pdf.iterrows():
                    vals = k.getlocs(
                        np.asarray(row["runs"], dtype=np.int64),
                        np.asarray(row["values"], dtype=np.float64),
                        locs_arr,
                    )
                    f = pd.DataFrame({"loc": locs_arr, "value": vals})
                    for c in key_cols:
                        f[c] = row[c]
                    frames.append(f[[*key_cols, "loc", "value"]])
                if frames:
                    yield pa.RecordBatch.from_pandas(
                        pd.concat(frames, ignore_index=True), preserve_index=False
                    )

        keys_schema = ", ".join(f"{c} string" for c in key_cols)
        return self.df.mapInArrow(run, f"{keys_schema}, loc long, value double")

    def make_strands_same_length(self, fill_value: float = 0.0) -> "RleFrame":
        """Pad the shorter strand per chromosome (rledict.py:650-676):
        window max of lengths per chromosome, conditional pad run."""
        if "Strand" not in self.key_cols:
            return self
        chrom = [c for c in self.key_cols if c != "Strand"]
        length = F.aggregate("runs", F.lit(0).cast("long"), lambda a, x: a + x)
        w = W.partitionBy(*chrom)
        df = self.df.withColumn("_len", length).withColumn(
            "_maxlen", F.max("_len").over(w)
        )
        pad = F.col("_maxlen") - F.col("_len")
        df = df.select(
            *self.key_cols,
            F.when(pad > 0, F.concat("runs", F.array(pad)))
            .otherwise(F.col("runs"))
            .alias("runs"),
            F.when(pad > 0, F.concat("values", F.array(F.lit(fill_value))))
            .otherwise(F.col("values"))
            .alias("values"),
        )
        return RleFrame(df, self.key_cols)

    # ------------------------------------------------------------ decode

    def to_ranges(self) -> DataFrame:
        """Decode to interval rows (methods.py:159-213 distributed as pure
        relational algebra): posexplode + window prefix sums, merge equal
        neighbours, drop zero scores."""
        ex = self.df.select(
            *self.key_cols,
            F.posexplode(F.arrays_zip("runs", "values")).alias("idx", "rv"),
        ).select(
            *self.key_cols,
            "idx",
            F.col("rv.runs").alias("run"),
            F.col("rv.values").alias("score"),
        )
        w = W.partitionBy(*self.key_cols).orderBy("idx")
        pos = ex.select(
            *self.key_cols,
            "idx",
            "score",
            (F.sum("run").over(w) - F.col("run")).alias("start"),
            F.sum("run").over(w).alias("end"),
        )
        # merge adjacent equal scores (gaps-and-islands)
        chg = F.when(
            F.lag("score").over(w).isNull()
            | (F.lag("score").over(w) != F.col("score")),
            1,
        ).otherwise(0)
        grp = pos.withColumn("grp", F.sum(chg).over(w))
        return (
            grp.groupBy(*self.key_cols, "grp")
            .agg(
                F.min("start").alias("Start"),
                F.max("end").alias("End"),
                F.first("score").alias("Score"),
            )
            .filter(F.col("Score") != 0)
            .select(*self.key_cols, "Start", "End", "Score")
        )

    # ------------------------------------------------------------ aggregates

    def stats(self) -> DataFrame:
        """Per-key aggregates incl. the reference's faithful quirks
        (unweighted mean rle.py:945-959) — pure array expressions."""
        length = F.aggregate("runs", F.lit(0).cast("long"), lambda a, x: a + x)
        vsum = F.aggregate("values", F.lit(0.0), lambda a, x: a + x)
        wsum = F.aggregate(
            F.zip_with("runs", "values", lambda r, v: r.cast("double") * v),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return self.df.select(
            *self.key_cols,
            F.size("runs").alias("n_runs"),
            length.alias("length"),
            (vsum / length).alias("mean_quirk"),
            (wsum / length).alias("weighted_mean"),
        )

    def getitems(self, intervals: DataFrame) -> DataFrame:
        """Batch range extraction (getitem.pyx:201-325 distributed):
        broadcast the query intervals, run the vectorized searchsorted
        kernel per key row.  Output (key..., Start, End, ID, Run, Value)."""
        key_cols = self.key_cols
        q = intervals.groupBy(*key_cols).agg(
            F.collect_list("Start").alias("q_starts"),
            F.collect_list("End").alias("q_ends"),
            F.collect_list("ID").alias("q_ids"),
        )
        joined = self.df.join(F.broadcast(q), on=key_cols, how="inner")

        def extract(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                pdf = batch.to_pandas()
                frames = []
                for _, row in pdf.iterrows():
                    order = np.argsort(np.asarray(row["q_starts"]), kind="stable")
                    starts = np.asarray(row["q_starts"], dtype=np.int64)[order]
                    ends = np.asarray(row["q_ends"], dtype=np.int64)[order]
                    qids = np.asarray(row["q_ids"], dtype=np.int64)[order]
                    ids, qs, qe, runs, vals = k.getitems(
                        np.asarray(row["runs"], dtype=np.int64),
                        np.asarray(row["values"], dtype=np.float64),
                        starts,
                        ends,
                    )
                    f = pd.DataFrame(
                        {
                            "Start": qs,
                            "End": qe,
                            "ID": qids[ids],
                            "Run": runs,
                            "Value": vals,
                        }
                    )
                    for c in key_cols:
                        f[c] = row[c]
                    frames.append(f[[*key_cols, "Start", "End", "ID", "Run", "Value"]])
                if frames:
                    yield pa.RecordBatch.from_pandas(
                        pd.concat(frames, ignore_index=True), preserve_index=False
                    )

        keys_schema = ", ".join(f"{c} string" for c in key_cols)
        return joined.mapInArrow(
            extract,
            f"{keys_schema}, Start long, End long, ID long, Run long, Value double",
        )
