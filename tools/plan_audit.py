"""Registry-wide physical-plan audit: the scale invariants, checked on
EVERY registered query, not just the hand-picked ones in
tests/test_plan_quality.py.

Invariants (violations = the plans that die first at 100 TB):

- no ``CartesianProduct`` anywhere (scalar attachments must plan as
  broadcast nested-loop, pair generation as equi-joins);
- no unpartitioned window: a ``windowspecdefinition`` whose argument
  list holds only ordering specs funnels the whole input through ONE
  task — the repo's global-rank formulation (operators/windows.py)
  exists precisely to avoid this.

Writes PLAN_AUDIT_r<N>.json ({query: {cartesian, global_windows}}),
prints violations, exits nonzero if any. Run from the repo root:

    python tools/plan_audit.py            # sf0.001 plans, ~3 min

Notes: building a plan never executes it EXCEPT for the eagerly-trained
operators (k-means / IVF / PQ codebooks — documented in their
modules), which run their small training jobs; this is why the audit
uses the sf0.001 tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

from tensei_agent_spark.queries import REGISTRY  # noqa: E402
from tensei_agent_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.environ.get("PLAN_AUDIT_OUT", "PLAN_AUDIT_r04.json")

WINDOW_SPEC = re.compile(r"windowspecdefinition\((.*?)specifiedwindowframe")
ORDER_SUFFIXES = (
    "ASC NULLS FIRST",
    "ASC NULLS LAST",
    "DESC NULLS FIRST",
    "DESC NULLS LAST",
)


def _top_level_args(s: str) -> list[str]:
    """Split a rendered argument list at top-level commas only —
    ordering expressions may themselves contain commas (CASE, calls)."""
    args, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return [a for a in args if a]


def global_windows(plan: str) -> list[str]:
    """Window specs whose argument list holds only ordering expressions
    (no partition columns). Checks EVERY windowspecdefinition on a
    line — one Window operator can carry several specs, and a
    partitioned first spec must not mask a global second one."""
    bad = []
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        for m in WINDOW_SPEC.finditer(line):
            args = _top_level_args(m.group(1).rstrip(", "))
            if args and all(
                a.rstrip().endswith(ORDER_SUFFIXES) for a in args
            ):
                bad.append(line.strip()[:160])
                break
    return bad


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Spark truncates long operator renderings ("... N more fields"),
    # which could cut a windowspecdefinition before its ordering
    # suffixes and let a global window silently escape the regex
    # detector. Raise the limit so plans render in full.
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    report: dict[str, dict] = {}
    violations = []
    t_all = time.time()
    for name, q in REGISTRY.items():
        t0 = time.time()
        try:
            df = q.build(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            report[name] = {"error": repr(exc)[:200]}
            violations.append(f"{name}: build failed {exc!r}")
            continue
        cart = "CartesianProduct" in plan
        gw = global_windows(plan)
        report[name] = {
            "cartesian": cart,
            "global_windows": gw,
            "sec": round(time.time() - t0, 2),
        }
        if cart:
            violations.append(f"{name}: CartesianProduct")
        for line in gw:
            violations.append(f"{name}: global window: {line}")
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf": SF,
                "queries": len(report),
                "violations": violations,
                "detail": report,
            },
            f,
            indent=1,
        )
    print(f"{len(report)} plans audited in {time.time()-t_all:.0f}s; "
          f"{len(violations)} violation(s)")
    for v in violations:
        print(" ", v)
    print(f"wrote {OUT}")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
