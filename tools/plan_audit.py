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
import re
import sys
import time

sys.path.insert(0, ".")

from tensei_agent_spark.queries import REGISTRY  # noqa: E402
from tensei_agent_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = "PLAN_AUDIT_r03.json"

WINDOW_SPEC = re.compile(r"windowspecdefinition\((.*?)specifiedwindowframe")


def global_windows(plan: str) -> list[str]:
    """Window lines whose spec has ordering columns but no partition
    columns (every pre-frame argument carries ASC/DESC)."""
    bad = []
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        m = WINDOW_SPEC.search(line)
        if not m:
            continue
        args = [a.strip() for a in m.group(1).rstrip(", ").split(",") if a.strip()]
        if args and all(("ASC" in a or "DESC" in a) for a in args):
            bad.append(line.strip()[:160])
    return bad


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
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
