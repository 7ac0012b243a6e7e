"""Compare two driver bench artifacts (BENCH_r{N}.json) per query.

Usage: python tools/bench_compare.py BENCH_r02.json BENCH_r03.json

Prints per-query seconds, the ratio, and flags regressions above 1.5x
(the round-over-round budget VERDICT r2 set) — but only when the
absolute slowdown also clears a noise floor (0.75 s), because this
box's sub-2 s queries jitter ±0.5 s run-to-run even behind the
round_close load-settle gate: the r9 close measured untouched
q1/q3 at 1.66×/1.53× and an immediate isolated re-run put both back
at their 3-round historical values. A ratio above 3× flags
regardless of the floor — an order-of-magnitude blowup on a cheap
query is a plan change, not jitter. Queries present in only one
round are listed separately — bench-set growth is expected, silent
drops are not.
"""

from __future__ import annotations

import json
import os
import re
import sys

# First round whose close ran the v2 methodology (full per-query
# warm-up pass + best-of-3 + load<1.5 settle gate): round 9
# (75de002 "Final round-9 close artifacts behind the tightened settle
# gate"). bench.py only started STAMPING the version in r10 (79a8b59),
# so r9 artifacts are v2-measured but unstamped.
_V2_FIRST_ROUND = 9


def _infer_protocol(path: str) -> int:
    """Protocol for an UNSTAMPED artifact, from its round number.

    ADVICE r10 #5: historical artifacts are immutable — the r9
    methodology cutoff lives here in the loader, never as a
    retro-edit of the committed JSON. ``BENCH*_r{N}.json`` with
    N >= 9 was measured under v2 (see _V2_FIRST_ROUND); anything
    earlier, or a file without a round suffix, loads as v1."""
    m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
    return 2 if m and int(m.group(1)) >= _V2_FIRST_ROUND else 1


def load(
    path: str,
) -> tuple[dict[str, float], set[str], int, list | None, float | None]:
    """Return (ok_queries, failed, protocol_version, loadavg, steal).

    A -1.0 value is bench.py's failure sentinel; those names go into
    the failed set instead of being silently dropped, so a query that
    regresses from a timing to an outright failure is still visible to
    the exit-code decision below. Artifacts without a ``protocol``
    stamp fall back to the round-number inference in
    ``_infer_protocol`` (v2 from r9 on, else v1).
    ``loadavg`` is bench.py's [start, end] 1-min load pair (r10+,
    e59e50d); None for artifacts that predate it — those comparisons
    are LOAD-BLIND and annotated as such by main()."""
    with open(path) as f:
        d = json.load(f)
    parsed = d.get("parsed", d)
    q = parsed.get("queries", {})
    ok = {k: float(v) for k, v in q.items() if v >= 0}
    failed = {k for k, v in q.items() if v < 0}
    proto = int(parsed.get("protocol", _infer_protocol(path)))
    return ok, failed, proto, parsed.get("loadavg"), parsed.get(
        "cpu_steal_pct"
    )


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a_path, b_path = sys.argv[1], sys.argv[2]
    (a, _a_failed, a_proto, a_load, a_steal) = load(a_path)
    (b, b_failed, b_proto, b_load, b_steal) = load(b_path)
    if a_proto != b_proto:
        print(
            f"WARNING: cross-protocol comparison (v{a_proto} vs "
            f"v{b_proto}) — per-query deltas conflate methodology "
            "changes (warm-up, sampling, settle gate) with engine "
            "changes; trust direction only, not magnitude (ADVICE r9)."
        )
    # Load evidence (VERDICT r10 #6): the r10 driver bench ran at
    # loadavg 3→9 and was unusable as a trendline point. Surface each
    # side's [start, end] pair; a side without one is LOAD-BLIND — a
    # co-tenant spike there is forensically invisible, so flag it.
    for path, la in ((a_path, a_load), (b_path, b_load)):
        if la is None:
            print(
                f"WARNING: {path} carries no loadavg stamp — "
                "LOAD-BLIND side; a co-tenant spike during that run "
                "is undetectable (trust deltas accordingly)."
            )
        else:
            print(f"loadavg {path}: start {la[0]}, end {la[1]}")
    # Hypervisor steal evidence (r11): this box is a Firecracker guest;
    # host CPU steal (18%+ measured under load on an idle guest) is
    # invisible to loadavg and explains the round-over-round ±8-19%
    # total wander on identical plans. A side without the stamp is
    # STEAL-BLIND; a >5-point gap between sides means the deltas are
    # box-weather, not engine changes.
    for path, st in ((a_path, a_steal), (b_path, b_steal)):
        if st is None:
            print(
                f"WARNING: {path} carries no cpu_steal_pct stamp — "
                "STEAL-BLIND side; hypervisor contention during that "
                "run is undetectable from inside the guest."
            )
        else:
            print(f"cpu_steal_pct {path}: {st}")
    if a_steal is not None and b_steal is not None and abs(
        a_steal - b_steal
    ) > 5.0:
        print(
            f"WARNING: steal gap {abs(a_steal - b_steal):.1f} points "
            "between sides — per-query deltas reflect host contention; "
            "trust direction only, not magnitude."
        )
    shared = sorted(set(a) & set(b), key=lambda k: -b[k])
    regressions = []
    print(f"{'query':35s} {a_path:>14s} {b_path:>14s}  ratio")
    for k in shared:
        r = b[k] / a[k] if a[k] else float("inf")
        is_reg = (r > 1.5 and b[k] - a[k] > 0.75) or r > 3.0
        flag = "  <-- REGRESSION" if is_reg else ""
        if is_reg:
            regressions.append(k)
        print(f"{k:35s} {a[k]:14.3f} {b[k]:14.3f}  {r:5.2f}{flag}")
    # A query that was green in the old round but FAILED (-1.0) or
    # vanished in the new round is the worst regression of all.
    for k in sorted(set(a) - set(b)):
        why = "FAILED" if k in b_failed else "missing"
        regressions.append(k)
        print(f"{k:35s} {a[k]:14.3f} {'—':>14s}  {why}  <-- REGRESSION")
    # ...and a query that is NEW this round and already failing must
    # not slip through just because it has no old timing to compare.
    for k in sorted(b_failed - set(a)):
        regressions.append(k)
        print(f"{k:35s} {'—':>14s} {'—':>14s}  NEW+FAILED  <-- REGRESSION")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"added in {b_path}: {only_b}")
    print(
        f"shared total: {sum(a[k] for k in shared):.2f}s -> "
        f"{sum(b[k] for k in shared):.2f}s; {len(regressions)} regression(s)"
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
