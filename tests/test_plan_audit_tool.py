"""The plan-audit detector (tools/plan_audit.py) is itself logic worth
pinning: a false negative silently voids the 'no global windows
anywhere' claim in SCALE.md. Pure string-level tests — no Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from plan_audit import _top_level_args, global_windows  # noqa: E402

FRAME = "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"


def test_partitioned_window_is_clean():
    line = f"Window [rank() windowspecdefinition(uid#1L, ts#2 ASC NULLS FIRST, {FRAME})]"
    assert global_windows(line) == []


def test_global_window_detected():
    line = f"Window [rank() windowspecdefinition(ts#2 ASC NULLS FIRST, {FRAME})]"
    assert len(global_windows(line)) == 1


def test_second_spec_on_line_not_masked():
    line = (
        f"Window [sum(x#9L) windowspecdefinition(uid#1L, ts#2 ASC NULLS FIRST, {FRAME}), "
        f"rank() windowspecdefinition(ts#2 ASC NULLS FIRST, {FRAME})]"
    )
    assert len(global_windows(line)) == 1


def test_comma_bearing_order_expression_classifies():
    # partitioned: CASE order key with internal commas must not split
    part = (
        "Window [rank() windowspecdefinition(uid#1L, "
        f"CASE WHEN in(a#3, b#4) THEN 1 END ASC NULLS FIRST, {FRAME})]"
    )
    assert global_windows(part) == []
    # global: same comma-bearing key with no partition column
    glob = (
        "Window [rank() windowspecdefinition("
        f"CASE WHEN in(a#3, b#4) THEN 1 END ASC NULLS FIRST, {FRAME})]"
    )
    assert len(global_windows(glob)) == 1


def test_partition_only_spec_is_clean():
    line = f"Window [count(1) windowspecdefinition(uid#1L, {FRAME})]"
    assert global_windows(line) == []


def test_top_level_args_respects_nesting():
    assert _top_level_args("a#1, f(b#2, c#3) ASC NULLS LAST, d#4") == [
        "a#1",
        "f(b#2, c#3) ASC NULLS LAST",
        "d#4",
    ]
