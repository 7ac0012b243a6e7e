"""Dump per-query `.explain("formatted")` plans for an optimization round.

Usage:
    python tools/dump_round_plans.py <out_dir> <suffix> <query> [query ...]

Writes `<out_dir>/<query>_<suffix>.txt` for each query — the evidence
files the optimization judge diffs (`plans/r11/<q>_before.txt` vs
`..._after.txt`). Run from the tree whose plans you want (the round's
base commit in a scratch worktree for `before`, HEAD for `after`) with
the same $SPARK_GRAFT_SF_DIR so the two dumps are comparable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tensei_agent_spark.queries import REGISTRY
from tensei_agent_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-round")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"SKIP {name}: not in this tree's registry", flush=True)
            continue
        df = q.build(spark, DEFAULT_SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {DEFAULT_SF_DIR}\n\n")
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
