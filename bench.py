"""Headline benchmark: run the bench-tagged queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully executed (collected to a count via ``write noop`` —
we use ``count()`` on the final plan so results are materialized but not
shipped to the driver).
"""

from __future__ import annotations

import json
import os
import time

from tensei_agent_spark.cache import release_all
from tensei_agent_spark.queries import REGISTRY
from tensei_agent_spark.session import DEFAULT_SF_DIR, get_spark


def _cpu_ticks() -> list[int] | None:
    """Aggregate jiffies from ``/proc/stat``'s first line, or None.

    Column 8 (0-based 7) is *steal*: time this guest's vCPUs were
    runnable but the hypervisor ran someone else. This box is a
    Firecracker microVM — host-level contention is invisible to
    ``os.getloadavg()`` and ``ps`` inside the guest (measured here:
    18% steal under full 32-core load on an otherwise idle guest),
    so the loadavg stamp alone cannot explain run-to-run wander.
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return [int(x) for x in parts[1:]]
    except (OSError, ValueError):
        return None


def _steal_pct(before: list[int] | None, after: list[int] | None):
    """(steal%, busy%) of total ticks over the bracket, or (None, None).

    Read steal relative to busy, not to total: the bench is not
    CPU-saturated end-to-end (driver-only phases, small stages), steal
    only accrues while vCPUs are runnable, and idle ticks dilute both.
    steal/(busy+steal) approximates the share of *demanded* cycles the
    host withheld. Neither number sees host memory-bandwidth or cache
    contention — a slow run with low steal is still possible.
    """
    if before is None or after is None:
        return None, None
    delta = [b - a for a, b in zip(before, after)]
    total = sum(delta[:8])  # user..steal; guest cols double-count user
    if total <= 0:
        return None, None
    busy = total - delta[3] - delta[4]  # minus idle, iowait (incl. steal)
    if busy <= 0:
        return None, round(100.0 * busy / total, 1)
    # ADVICE r11: divide by BUSY, as the docstring says — the /total
    # form diluted demanded-cycle steal ~4x at the bench's ~25% duty
    # cycle, and put the stamp in different units from steal_probe.py
    # and round_close's 5% gate (both busy-relative).
    return round(100.0 * delta[7] / busy, 1), round(
        100.0 * busy / total, 1
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("tensei-agent-spark-bench")
    spark.sparkContext.setLogLevel("WARN")
    # The global-rank/offset helpers (operators/windows.py) run ONE
    # intentional unpartitioned window over the O(shuffle-partitions)-row
    # groupBy(_pid) stats frame; WindowExec warns "No Partition Defined"
    # for it on every run. The warning is correct for data windows but
    # noise for this bounded frame (the plan audit separates the two —
    # tools/plan_audit.py), so silence just that logger here.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # log4j2 API not reachable: warnings are cosmetic anyway

    bench_names = [n for n, q in REGISTRY.items() if q.bench]
    # Warm-up pass: run every bench query once at the tiny warm SF
    # before any timing. A single cheap-query warm-up leaves the heavy
    # paths (higher-order shingle lambdas, codegen'd window/join
    # shapes, Arrow batches) cold for their own first timed run —
    # JIT/Janino first-run overhead measured ~0.7s on
    # dedup_ngram_jaccard_fast alone (3.2s fresh vs 2.35s steady).
    # Warming at sf0.001 compiles the same generated classes (plan
    # shapes are SF-invariant) in seconds without touching the timed
    # data; the timed best-of-3 below then measures steady state, per
    # standard JVM benchmarking practice. Falls back to the old
    # single-query warm-up when no warm dir exists.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    warm_failed: list[str] = []
    full_warmup = os.path.isdir(warm_dir) and os.path.abspath(
        warm_dir
    ) != os.path.abspath(sf_dir)
    if full_warmup:
        for name in bench_names:
            try:
                REGISTRY[name].build(spark, warm_dir).count()
            except Exception:
                # Must not block the timing run — but silently degraded
                # warm-up skews every first timed sample with zero
                # trace (ADVICE r9), so count and report below.
                warm_failed.append(name)
        release_all()
        spark.catalog.clearCache()
        if warm_failed:
            print(
                f"bench: warm-up FAILED for {len(warm_failed)}/"
                f"{len(bench_names)} queries (cold first timed runs): "
                f"{warm_failed}",
                flush=True,
            )
    else:
        REGISTRY[bench_names[0]].build(spark, sf_dir).count()

    load_before = round(os.getloadavg()[0], 2)
    ticks_before = _cpu_ticks()
    timings: dict[str, float] = {}
    for name in bench_names:
        best = float("inf")
        try:
            # Best-of-3: this box has co-tenant load spikes (the same
            # query measured 5s-28s across runs), and JVM/GC jitter
            # dominates the sub-2s queries — a third sample materially
            # stabilizes the recorded number for both.
            runs = 0
            while runs < 3:
                t0 = time.perf_counter()
                df = REGISTRY[name].build(spark, sf_dir)
                df.count()  # materialize the whole plan, rows stay off the driver
                best = min(best, time.perf_counter() - t0)
                runs += 1
            timings[name] = round(best, 4)
        except Exception as exc:  # one broken query must not kill the line
            print(f"bench: {name} failed: {exc!r}", flush=True)
            timings[name] = -1.0
        # Inter-query hygiene: drop this query's persisted intermediates
        # and nudge the JVM to collect before the next timing starts.
        # Without it a heavy neighbor's cache blocks + garbage inflate
        # the next query (ann_cosine_topk_fast measured 4.0s after the
        # 13s jaccard pipeline vs 1.0s standalone).
        release_all()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(t for t in timings.values() if t > 0), 4)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Methodology version stamp (ADVICE r9): cross-protocol
        # comparisons conflate protocol changes with engine changes.
        # v1 = single cheap-query warm-up (r1-r8 artifacts, implicit);
        # v2 = full per-query sf0.001 warm-up pass + best-of-3 (r9+).
        # Stamp what actually RAN (ADVICE r10): the no-warm-dir
        # fallback is v1 regardless of code version, and a PARTIAL
        # warm-up (warm_failed non-empty → cold first timed runs for
        # those queries) is not the v2 methodology either — downgrade
        # so the stamp never over-claims. The load<1.5 settle gate is
        # round_close's, NOT this script's: an ad-hoc `python bench.py`
        # run is un-settled even at protocol 2 (the loadavg field below
        # is the evidence trail for that).
        "protocol": 2 if (full_warmup and not warm_failed) else 1,
        # Contamination marker (r10): the round_close settle gate only
        # guards the bench START — a co-tenant spike arriving mid-run
        # inflated one r10 close sample ~25% across UNTOUCHED queries.
        # Recording the 1-min loadavg at both ends makes such a sample
        # identifiable in the artifact instead of forensically. The
        # bench's own 32-thread work raises loadavg too, so read the
        # pair as a delta, not an absolute.
        "loadavg": [load_before, round(os.getloadavg()[0], 2)],
    }
    # Hypervisor contamination marker (r11): percent of the timed
    # region's CPU stolen by the host (None off-Linux). The entire
    # r9-r11 "co-tenant wave" (±8-19% total wander across runs with
    # IDENTICAL plans and an idle guest) is host steal: a bench run on
    # a 0.07-loadavg guest still measured 18.4% steal under load and
    # came in 19% over the round's close number. Comparisons between
    # artifacts with materially different steal are box-weather, not
    # engine changes (tools/bench_compare.py annotates this).
    steal, busy = _steal_pct(ticks_before, _cpu_ticks())
    if steal is not None:
        payload["cpu_steal_pct"] = steal
        payload["cpu_busy_pct"] = busy
    if warm_failed:
        payload["warmup_failed"] = warm_failed
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
