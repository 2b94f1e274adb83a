"""Unit tests pinning the reference's documented behavior and quirks.

Each test cites the reference file:line whose behavior it pins
(/root/reference/pyrle/...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyrle_spark import Rle
from pyrle_spark.kernels import rlecore as k
from pyrle_spark.rledict import RleDict, coverage_from_intervals, natsort_key


def test_constructor_docstring_examples():
    # rle.py:95-133
    r = Rle([1, 2, 1, 5], [0, 2.1, 3, 4])
    assert list(r.runs) == [1, 2, 1, 5]
    assert list(r.values) == [0, 2.1, 3, 4]
    r2 = Rle([1, 1, 1, 0, 0, 2, 2, 3, 4, 2])
    assert list(r2.runs) == [3, 2, 2, 1, 1, 1]
    assert list(r2.values) == [1, 0, 2, 3, 4, 2]
    d = r - r2
    assert list(d.runs) == [1, 2, 1, 1, 2, 1, 1, 1]
    assert np.allclose(d.values, [-1, 1.1, 3, 4, 2, 1, 0, -2])


def test_constructor_drops_zero_runs():
    # rle.py:150-153
    r = Rle([1, 0, 2, 0], [5, 6, 7, 8])
    assert list(r.runs) == [1, 2]
    assert list(r.values) == [5, 7]


def test_constructor_merges_close_values():
    # isclose pre-check + 1e-5 abs merge (rle.py:155, coverage.pyx:127-129)
    r = Rle([1, 1, 1], [1.0, 1.0 + 1e-7, 2.0])
    assert list(r.runs) == [2, 1]
    # but pairs not np.isclose never trigger the merge pass at all:
    r2 = Rle([1, 1], [0.0, 1e-6])  # |0 - 1e-6| > atol(1e-8) + rtol*1e-6
    assert list(r2.runs) == [1, 1]


def test_nan_and_inf_merge_rules():
    # coverage.pyx:120-125: NaN==NaN and ±inf==±inf merge in defragment
    r = Rle.__new__(Rle)
    r.runs = np.array([1, 1, 1, 1], dtype=np.int64)
    r.values = np.array([np.nan, np.nan, np.inf, np.inf])
    d = r.defragment()
    assert list(d.runs) == [2, 2]
    assert np.isnan(d.values[0]) and d.values[1] == np.inf


def test_negative_zero_canonicalized():
    # rle.py:914
    r = Rle.__new__(Rle)
    r.runs = np.array([1, 2], dtype=np.int64)
    r.values = np.array([-0.0, 5.0])
    d = r.defragment()
    assert not np.signbit(d.values[0])


def test_zero_extension_alignment():
    # rle.py:17-31 + docstring example rle.py:112-121
    r1 = Rle([1, 2], [0, 1])
    r2 = Rle([2, 2], [2, 3])
    s = r1 + r2
    assert list(s.runs) == [1, 1, 1, 1]
    assert list(s.values) == [2, 3, 4, 3]


def test_div_by_zero_ieee_rules():
    # rle.pyx:244-252: x/0 = ±inf via copysign product, 0/0 = NaN
    a = Rle([1, 1, 1], [1, -1, 0])
    b = Rle([3], [0])
    q = a / b
    d = k.decode_runs(q.runs, q.values)
    assert d[0] == np.inf and d[1] == -np.inf and np.isnan(d[2])


def test_div_kernel_selection_shorter_divisor():
    # rle.py:740-743: shorter divisor → zero-extension → zeroes kernel
    a = Rle([4], [8])
    b = Rle([2], [2])
    q = a / b
    d = k.decode_runs(q.runs, q.values)
    assert list(d[:2]) == [4, 4] and d[2] == np.inf and d[3] == np.inf


def test_mean_is_unweighted_quirk():
    # rle.py:945-959: sum(values)/sum(runs), NOT run-weighted
    r = Rle([1, 2, 1], [1, 2, 3])
    assert r.mean() == 1.5
    assert r.weighted_mean() == (1 + 2 * 2 + 3) / 4


def test_std_square_outside_sum_quirk():
    # rle.py:1097-1113
    r = Rle([1, 2, 1], [1, 2, 3])
    assert abs(r.std() - 0.8660254037844386) < 1e-12


def test_numbers_only_float32_sentinel_quirk():
    # rle.py:961-998 + the C-float cast in coverage.pyx: docstring output
    # shows 2147483648.0 for the +inf sentinel
    r = Rle([1, 2, 1, 2, 1], [-np.inf, 1, np.nan, 1, np.inf])
    no = r.numbers_only()
    assert list(no.values) == [-2147483648.0, 1.0, 0.0, 1.0, 2147483648.0]
    assert list(no.runs) == [1, 2, 1, 2, 1]


def test_eq_returns_01_rle_with_nan_extension():
    # rle.py:248-276: == extends with NaN (not 0) and returns 0/1 Rle
    a = Rle([2], [1])
    b = Rle([3], [1])
    e = a == b
    # positions 0-1 equal → 1.0; position 2 compares 1 vs NaN → 0.0
    assert list(k.decode_runs(e.runs, e.values)) == [1.0, 1.0, 0.0]
    lt = Rle([2], [1]) < Rle([2], [2])
    assert list(k.decode_runs(lt.runs, lt.values)) == [1.0, 1.0]


def test_comparison_zero_extension():
    # < extends with 0 (rle.py:400-466): trailing 0 vs 2 → 0 < 2 → 1
    lt = Rle([1], [1]) < Rle([2], [2])
    assert list(k.decode_runs(lt.runs, lt.values)) == [1.0, 1.0]


def test_shift_docstring_examples():
    r = Rle([3, 2, 1], [1, -1, 2])
    a = r.shift(2, preserve_length=False, fill=np.nan)
    assert list(a.runs) == [2, 3, 2, 1] and np.isnan(a.values[0])
    b = r.shift(2)
    assert list(b.runs) == [2, 3, 1] and list(b.values) == [0, 1, -1]
    c = r.shift(-2, fill=np.nan)
    assert list(c.runs) == [1, 2, 1, 2]
    d = r.shift(-4, preserve_length=False)
    assert list(d.runs) == [1, 1] and list(d.values) == [-1, 2]


def test_getitem_point_slice_batch():
    r = Rle([3, 2, 1], [1, -1, 2])
    assert r[0] == 1.0 and r[4] == -1.0 and r[5] == 2.0
    s = r[1:5]
    assert list(s.runs) == [2, 2] and list(s.values) == [1, -1]
    out = r[pd.DataFrame({"Start": [0, 4], "End": [6, 5]})]
    assert list(out.ID) == [0, 0, 0, 1]
    assert list(out.Run) == [3, 2, 1, 1]
    # past-the-end point lookup yields 0 (getitem.pyx zero-init)
    assert r[100] == 0.0


def test_length_vs_len():
    # rle.py:429-436 vs :917-943
    r = Rle([3, 2, 1], [1, -1, 2])
    assert len(r) == 3
    assert r.length == 6


def test_apply_family():
    r = Rle([2, 2], [1, 2])
    doubled = r.apply_values(lambda v: v * 2)
    assert list(doubled.values) == [2, 4]
    stretched = r.apply_runs(lambda x: x * 3)
    assert list(stretched.runs) == [6, 6]
    # ufunc passthrough does NOT defragment (rle.py:203-246): values equal
    # only after the ufunc stay as separate runs
    rt = np.abs(Rle([1, 1], [-4.0, 4.0]))
    assert list(rt.runs) == [1, 1] and list(rt.values) == [4.0, 4.0]


# ----------------------------------------------------------------- RleDict


def _intervals(chroms, starts, ends, strands=None):
    d = {"Chromosome": chroms, "Start": starts, "End": ends}
    if strands:
        d["Strand"] = strands
    return pd.DataFrame(d)


def test_rledict_coverage_construction():
    # rledict.py:133-180 + methods.py:139-156
    df = _intervals(["chr1", "chr1", "chr2"], [0, 2, 1], [4, 6, 3])
    rd = RleDict(df)
    assert list(rd["chr1"].runs) == [2, 2, 2]
    assert list(rd["chr1"].values) == [1, 2, 1]
    assert list(rd["chr2"].runs) == [1, 2]
    assert list(rd["chr2"].values) == [0, 1]


def test_rledict_missing_key_defaults():
    # rledict.py:254 vs :298-299 — inconsistent defaults kept deliberately
    rd = RleDict({"chr1": Rle([2], [1])})
    assert rd["chrX"].length == 0
    rd2 = RleDict({("chr1", "+"): Rle([2], [1])})
    missing = rd2[("chr9", "-")]
    assert list(missing.runs) == [1] and list(missing.values) == [0]


def test_rledict_full_outer_key_alignment():
    # methods.py:68-111: key only in one side → op against zero-Rle
    a = RleDict({"chr1": Rle([2], [1]), "chr2": Rle([3], [5])})
    b = RleDict({"chr1": Rle([2], [10]), "chr3": Rle([2], [7])})
    s = a + b
    assert set(s.keys()) == {"chr1", "chr2", "chr3"}
    assert list(s["chr1"].values) == [11]
    assert list(s["chr2"].values) == [5]
    assert list(s["chr3"].values) == [7]


def test_rledict_strand_merge_on_mixed_strandedness():
    # methods.py:43-65,90-91
    stranded = RleDict({("chr1", "+"): Rle([2], [1]), ("chr1", "-"): Rle([2], [2])})
    plain = RleDict({"chr1": Rle([2], [10])})
    s = stranded + plain
    assert s.keys() == ["chr1"]
    assert list(s["chr1"].values) == [13]


def test_rledict_to_ranges_drops_zero_scores():
    # methods.py:159-213
    rd = RleDict({"chr1": Rle([2, 3, 1], [0, 2, 0])})
    out = rd.to_ranges()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.Chromosome, row.Start, row.End, row.Score) == ("chr1", 2, 5, 2.0)


def test_rledict_whole_collection_eq():
    # rledict.py:188-198
    a = RleDict({"chr1": Rle([2], [1])})
    b = RleDict({"chr1": Rle([2], [1])})
    c = RleDict({"chr1": Rle([2], [2])})
    assert a == b
    assert not (a == c)


def test_make_strands_same_length():
    # rledict.py:650-676
    rd = RleDict({("chr1", "+"): Rle([5], [1]), ("chr1", "-"): Rle([2], [3])})
    out = rd.make_strands_same_length()
    assert out[("chr1", "-")].length == 5
    assert list(out[("chr1", "-")].values) == [3, 0]


def test_natsort_ordering():
    keys = ["chr10", "chr2", "chr1", "chrX"]
    assert sorted(keys, key=natsort_key) == ["chr1", "chr2", "chr10", "chrX"]


def test_rledict_int_key_rejected():
    rd = RleDict({"chr1": Rle([2], [1])})
    with pytest.raises(KeyError):
        rd[0]


def test_coverage_value_col():
    df = pd.DataFrame({"Start": [0, 2], "End": [4, 6], "Value": [2.0, 3.0]})
    r = coverage_from_intervals(df, "Value")
    assert list(k.decode_runs(r.runs, r.values)) == [2, 2, 5, 5, 3, 3]


def test_rledict_reflected_scalar_ops():
    """Reference rledict.py:320-324: scalar - / scalar ÷ broadcast per key."""
    rd = RleDict({"c1": Rle([2, 2], [1.0, 4.0])})
    assert list((10 - rd)["c1"].values) == [9.0, 6.0]
    assert list((8 / rd)["c1"].values) == [8.0, 2.0]


def test_rledict_chromosomes_property():
    rd = RleDict({("chr10", "+"): Rle([1], [1]), ("chr2", "-"): Rle([1], [1])})
    assert rd.chromosomes == ["chr2", "chr10"]
    rd2 = RleDict({"chrM": Rle([1], [1]), "chr1": Rle([1], [1])})
    assert rd2.chromosomes == ["chr1", "chrM"]


def test_add_pseudocounts_fixed_semantics():
    """The reference's own add_pseudocounts crashes (rledict.py:418-420
    calls .loc on a numpy array); ours implements the documented intent."""
    rd = RleDict({"c": Rle([2, 3], [0.0, 2.0])})
    assert rd.add_pseudocounts(0.25) is None
    assert list(rd["c"].values) == [0.25, 2.0]


def test_rledict_to_csv_roundtrip(tmp_path):
    rd = RleDict({"c1": Rle([2, 1], [1.0, 2.0]), "c2": Rle([3], [4.0])})
    p = tmp_path / "rd.tsv"
    rd.to_csv(str(p))
    back = pd.read_csv(p, sep="\t")
    assert list(back.columns) == ["Chromosome", "Runs", "Values"]
    assert back["Runs"].sum() == 6


def test_str_aliases_repr():
    r = Rle([1], [1.0])
    assert str(r) == repr(r)
    rd = RleDict({"c": r})
    assert str(rd) == repr(rd)


def test_rledict_interval_dataframe_subset():
    """Batch range extraction through RleDict[interval table]
    (reference rledict.py:256-296): per-key getitems, clipped runs
    tagged with query ID, missing chromosomes skipped."""
    rd = RleDict({"chr1": Rle([3, 3], [1.0, 2.0]), "chr2": Rle([4], [5.0])})
    q = pd.DataFrame(
        {"Chromosome": ["chr1", "chr1", "chr2", "chr9"],
         "Start": [0, 2, 1, 0], "End": [2, 5, 3, 1]}
    )
    out = rd[q]
    assert list(out.columns) == ["Chromosome", "Start", "End", "ID", "Run", "Value"]
    assert "chr9" not in set(out["Chromosome"])
    chr1 = out[out.Chromosome == "chr1"]
    # query [2,5) over runs (3,1.0),(3,2.0): 1 from the first run, 2 from the second
    assert list(chr1[chr1.ID == 1][["Run", "Value"]].itertuples(index=False)) == [
        (1, 1.0), (2, 2.0),
    ]
    rds = RleDict({("chr1", "+"): Rle([2], [7.0])})
    qs = pd.DataFrame(
        {"Chromosome": ["chr1"], "Strand": ["+"], "Start": [0], "End": [2]}
    )
    assert rds[qs]["Strand"].iloc[0] == "+"
    assert rd[pd.DataFrame(columns=["Chromosome", "Start", "End"])].empty


def test_compare_thresholds_normalized_difference():
    """The reference's __eq__ thresholds the CONSTRUCTED difference Rle
    (rle.py:248-276): Rle(diff) normalization merges near-zero runs into
    their exact-zero neighbors (the isclose/1e-5 rule) BEFORE np.where.
    compare_op must do the same, or adjacent -1e-9 / 0.0 diffs split
    into different 0/1 runs than the reference."""
    import numpy as np

    from pyrle_spark.kernels import rlecore as k

    r1, v1 = np.array([1, 1]), np.array([5.0, 1000.0])
    r2, v2 = np.array([1, 1]), np.array([5.000000001, 1000.0])
    runs, vals = k.compare_op("eq", r1, v1, r2, v2)
    # diff = [-1e-9, 0.0] merges under the constructor rule into one run
    # valued -1e-9 (first value wins, coverage.pyx:127-129), so the
    # whole range thresholds as NOT-equal — without the normalize the
    # second position would incorrectly report equal ([1,1]/[0,1])
    assert list(runs) == [2] and list(vals) == [0.0]


def test_natsort_mixed_numeric_alpha_keys():
    """Ensembl-style key sets mix bare numbers and letters ('1','X','MT'):
    natsort must order them like natsorted (numbers first) instead of
    raising int-vs-str TypeError."""
    from pyrle_spark.rledict import RleDict, natsort_key

    assert sorted(["1", "X", "2", "MT", "10"], key=natsort_key) == [
        "1", "2", "10", "MT", "X",
    ]
    rd = RleDict({"X": Rle([2], [1.0]), "1": Rle([2], [2.0])})
    rd2 = RleDict({"2": Rle([2], [3.0])})
    out = rd + rd2  # crashes without the tagged-token key
    assert set(out.keys()) == {"1", "2", "X"}


def test_slice_stop_zero_reference_quirk():
    """Reference rle.py:283-284: `end = val.stop or length` — stop=0 is
    falsy, so r[0:0] returns the FULL vector, not an empty Rle."""
    r = Rle([2, 3], [1.0, 2.0])
    assert r[0:0] == r
    assert r[1:0] == r[1:]
