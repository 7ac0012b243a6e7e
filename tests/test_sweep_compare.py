"""Unit tests for the sweep comparison kernel (tools/sweep_compare.py).

The sweep simulates the external driver's value-hash gate; these pin
the two failure modes a naive comparator has (and that an earlier
version of the tool actually had):

- a float64 cast equating distinct int64 values above 2**53
  (64-bit hash ids differ in the low bits the cast rounds away);
- array-typed columns whose FIRST row is NULL (a row-0-only type
  probe crashes sort_values on unhashable lists).
"""

import numpy as np
import pandas as pd
import pytest

from tools.sweep_compare import compare_col, norm


def test_int64_above_2_53_not_equated_by_float_cast():
    a = pd.Series([2**53 + 0], dtype="int64")
    b = pd.Series([2**53 + 1], dtype="int64")
    # float64 cast would make these equal — the comparator must not.
    assert float(a[0]) == float(b[0])
    with pytest.raises(AssertionError, match="int values differ"):
        compare_col("q", "id", a, b)


def test_equal_int64_hash_ids_pass():
    a = pd.Series([-(2**62) + 7, 2**61 + 3], dtype="int64")
    compare_col("q", "id", a, a.copy())


def test_float_nan_equals_nan_but_ulp_differs():
    a = pd.Series([1.0, np.nan])
    compare_col("q", "x", a, a.copy())
    b = pd.Series([np.nextafter(1.0, 2.0), np.nan])
    with pytest.raises(AssertionError, match="values differ"):
        compare_col("q", "x", a, b)


def test_int_vs_float_mix_uses_bitexact_float_path():
    a = pd.Series([3], dtype="int64")
    compare_col("q", "x", a, pd.Series([3.0]))
    with pytest.raises(AssertionError):
        compare_col("q", "x", a, pd.Series([3.0000001]))


def test_string_fallback_exact():
    compare_col("q", "s", pd.Series(["a", None]), pd.Series(["a", None]))
    with pytest.raises(AssertionError, match="str differ"):
        compare_col("q", "s", pd.Series(["a"]), pd.Series(["A"]))


def test_norm_handles_null_first_row_array_column():
    df = pd.DataFrame(
        {"k": [2, 1, 3], "v": [None, [1.0, 2.0], np.array([0.5])]}
    )
    out = norm(df)
    # sorted by column name then values; arrays stringified, NULL kept
    assert list(out.columns) == ["k", "v"]
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].tolist() == ["[1.0, 2.0]", "None", "[0.5]"]


def test_norm_sorts_rows_and_columns_deterministically():
    g = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    w = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    ng, nw = norm(g), norm(w)
    assert list(ng.columns) == list(nw.columns) == ["a", "b"]
    assert ng.equals(nw)


def test_bench_compare_cross_protocol_warns(tmp_path, capsys=None):
    """bench_compare must warn when comparing artifacts measured under
    different methodologies (ADVICE r9) and stay silent same-protocol;
    unstamped artifacts load as protocol 1. Also (VERDICT r10 #6):
    a side without a loadavg stamp is LOAD-BLIND and must be flagged;
    stamped sides print their [start, end] pair."""
    import json
    import os
    import subprocess
    import sys

    # ADVICE r10: derive the repo root from __file__ so the test passes
    # when pytest is launched from outside the repo root.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    q = {"queries": {"q": 1.0}}
    a.write_text(json.dumps(q))  # unstamped -> v1, no loadavg
    b.write_text(json.dumps({**q, "protocol": 2, "loadavg": [0.3, 1.1]}))
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True, text=True, cwd=repo,
    )
    assert "cross-protocol" in out.stdout and out.returncode == 0
    assert "LOAD-BLIND" in out.stdout  # a.json has no stamp
    assert "start 0.3, end 1.1" in out.stdout  # b.json's pair surfaced
    b.write_text(json.dumps(q))  # both v1 -> no warning
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True, text=True, cwd=repo,
    )
    assert "cross-protocol" not in out.stdout and out.returncode == 0
    assert out.stdout.count("LOAD-BLIND") == 2  # both sides unstamped


def test_bench_compare_infers_protocol_from_round_number(tmp_path):
    """ADVICE r10 #5: historical artifacts stay immutable — an
    UNSTAMPED artifact named for round >= 9 loads as protocol 2 (the
    r9 close already ran the v2 methodology, bench.py just didn't
    stamp it until r10), so comparing it against a stamped-v2 artifact
    must NOT warn; a pre-r9 round-named artifact still loads as v1."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    q = {"queries": {"q": 1.0}}
    r9 = tmp_path / "BENCH_LOCAL_r09.json"   # unstamped, round 9 -> v2
    r8 = tmp_path / "BENCH_LOCAL_r08.json"   # unstamped, round 8 -> v1
    r11 = tmp_path / "BENCH_LOCAL_r11.json"  # stamped v2
    r9.write_text(json.dumps(q))
    r8.write_text(json.dumps(q))
    r11.write_text(json.dumps({**q, "protocol": 2}))
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(r9), str(r11)],
        capture_output=True, text=True, cwd=repo,
    )
    assert "cross-protocol" not in out.stdout and out.returncode == 0
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(r8), str(r11)],
        capture_output=True, text=True, cwd=repo,
    )
    assert "cross-protocol" in out.stdout and out.returncode == 0
