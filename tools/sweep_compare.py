"""Comparison kernel for the strict oracle sweep (importable, no Spark).

Shared by ``tools/verify_sweep.py`` and unit-tested directly in
``tests/test_sweep_compare.py`` — the sweep simulates the external
driver's value-hash gate, so a comparator bug here means silent false
passes. Rules (ordered, strictest applicable wins):

- both integer dtypes → exact int64 compare (a float64 cast would
  silently equate distinct values above 2^53, e.g. 64-bit hash ids);
- any float involved  → bit-exact float64 compare (equal_nan: NULLs
  surface as NaN);
- everything else     → exact string compare.
"""

import numpy as np
import pandas as pd


def norm(df):
    """Column-name-sorted, value-sorted, index-reset copy; array cells
    (list/ndarray) are stringified so sorting and comparison work."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Scan the WHOLE column: row 0 may be NULL while later rows
        # hold arrays (a row-0-only probe crashes sort_values).
        if df[c].map(lambda v: isinstance(v, (np.ndarray, list))).any():
            df[c] = df[c].map(
                lambda v: str([float(x) for x in v])
                if isinstance(v, (np.ndarray, list))
                else str(v)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_col(name, c, a, b):
    """Assert Series ``a`` (Spark) equals ``b`` (oracle) for column ``c``."""
    if pd.api.types.is_integer_dtype(a) and pd.api.types.is_integer_dtype(b):
        assert np.array_equal(
            a.astype("int64").values, b.astype("int64").values
        ), f"col {c} int values differ"
        return
    if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
        try:
            assert np.array_equal(
                a.astype("float64").values,
                b.astype("float64").values,
                equal_nan=True,
            ), f"col {c} values differ"
            return
        except (ValueError, TypeError):
            pass  # non-castable mix → string compare
    assert a.astype(str).equals(b.astype(str)), f"col {c} str differ"
