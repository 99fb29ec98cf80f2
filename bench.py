#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE COMPACT JSON line (total, canaries, worst-10 queries); the FULL
per-query map is written to ``BENCH_local.json`` beside this script.

Execution is forced with a noop write (full JVM-side materialisation,
no driver collect), so timings measure the engine, not result transfer.

Output discipline (r5 post-mortem: Spark console-progress output pushed
the metric line out of the driver's bounded tail capture, losing the
round's only parseable record):
  * ``spark.ui.showConsoleProgress`` is forced off for the session;
  * the metric JSON is printed AFTER ``spark.stop()`` as the final
    stdout line, flushed;
  * the same JSON is additionally written to ``BENCH_local.json``
    beside this script, so a bounded tail capture can never lose it.

The metric line carries ``canary_ratio``: wall time of a fixed cheap
triplet (tpch_q6, tpch_q1, dedup_exact — pure-scan, hash-agg and
shuffle-dedup canaries) divided by their recorded uncontended
steady-state total.  A ratio near 1 means the run was clean; >>1 means
host contention inflated EVERY number this run and per-query spikes
should be read against it (SCALE.md "contention canaries").
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from dask_ms_spark.cache import release_caches  # noqa: E402

# Headline set: every declared query (the full driver contract).
# Set SPARK_GRAFT_BENCH_QUERIES=q1,q2 to restrict.
HEADLINE: list[str] | None = None

# Uncontended steady-state wall (sec, local[32], sf0.1) for the canary
# triplet.  Re-baselined round 8 from the mean of the two CLEAN
# full-suite runs of the session (probe spread < 0.1 and no per-query
# spikes; the first derivation naively took the median of three runs,
# two of which carried contention bursts, and read a quiet machine as
# 0.8).  The two clean runs agreed to 1%: q6 0.322/0.323,
# q1 1.179/1.162, dedup_exact 0.762/0.735.  Update only from runs
# whose three probes agree within ~0.1.
CANARY_STEADY = {"tpch_q6": 0.323, "tpch_q1": 1.171,
                 "dedup_exact": 0.748}

# Per-query wall budget (sec): queries exceeding it are LOGGED to
# stderr and the run continues — a tripwire for suite-growth and
# contention, not a gate.
QUERY_BUDGET = float(os.environ.get("SPARK_GRAFT_BENCH_QUERY_BUDGET",
                                    "15"))

# Passes over the full suite (r9 verdict item 3: same-code runs
# disagreed up to 6x on individual queries — per-query transients the
# interleaved canary cannot see).  Each pass runs the whole suite in
# order, so a transient hits DIFFERENT queries in each pass; the
# published per-query timing is the MEDIAN across passes and the
# per-query spread (max/min) is published alongside, making sub-2x
# regressions attributable.  value stays the median PASS wall, so it
# remains apples-to-apples with the single-pass rounds.
PASSES = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))

# Targeted re-passes (r10 verdict item 1: two passes cannot outvote a
# transient that hits one of them — 23/166 queries spread >1.3x on a
# canary-clean run, 86% vs the 95% reproducibility bar).  After the
# full passes, queries whose two closest samples disagree >1.3x are
# re-timed — ONLY those — up to this many extra times, so every
# published median ends up corroborated by a second sample within
# 1.3x (or is demonstrably bimodal after 2 extra samples, which the
# corroboration field then says out loud).  Cost is bounded by the
# noisy subset, not the suite.
TARGET_PASSES = max(0, int(os.environ.get(
    "SPARK_GRAFT_BENCH_TARGET_PASSES", "2")))
REPRO_BAR = 1.3


def _corroboration(samples: list[float]) -> float:
    """min adjacent ratio of the sorted samples — 'the two CLOSEST
    samples agree within this factor'.  This is the right
    trustworthiness measure for a published MEDIAN: max/min spread
    stays inflated forever once one transient sample exists, while
    the median itself is solid as soon as two samples corroborate."""
    ss = sorted(samples)
    if len(ss) < 2:
        return 1.0
    return min(b / max(a, 1e-9) for a, b in zip(ss, ss[1:]))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sf encoded in the dir name, e.g. .../sf0.1
    tail = os.path.basename(sf_dir.rstrip("/"))
    sf = float(tail[2:]) if tail.startswith("sf") else None

    from dask_ms_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("dask-ms-spark-bench", extra_conf={
        # progress bars corrupt bounded stdout captures (see module
        # docstring); the bench is non-interactive by definition
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    names = [q for q in only.split(",") if q] or HEADLINE or list(queries)
    timings: dict[str, float] = {}

    # Warm the JVM, parquet reader, codegen and shuffle paths so the
    # first measured query does not absorb session startup.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().write.format("noop") \
        .mode("overwrite").save()
    # Warm the Python worker pool too: the first Arrow/Python exchange
    # pays daemon + worker spawn for every core (~5-10 s on 32); that
    # cost belongs to session setup, not to whichever mapInPandas
    # query happens to run first.
    def _ident(it):
        yield from it
    spark.range(1000, numPartitions=int(os.environ.get(
        "SPARK_GRAFT_CPUS", os.cpu_count() or 4))) \
        .mapInPandas(_ident, "id long").count()

    # Warm-up pass 2: run each benched query once at a tiny scale
    # factor so whole-stage-codegen compilation and JVM C2 JIT of
    # every plan shape happen outside the timed loop (measured: the
    # first execution of the minhash/md5 family costs ~6 s of
    # compile+JIT regardless of input size; steady state is the
    # number that scales with data).  Standard JVM benchmarking
    # practice; disable with SPARK_GRAFT_BENCH_WARM_BUDGET=0.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_WARM_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"))
    warm_budget = float(
        os.environ.get("SPARK_GRAFT_BENCH_WARM_BUDGET", "180"))
    if warm_budget > 0 and os.path.isdir(warm_dir):
        t_warm = time.time()
        for name in names:
            if time.time() - t_warm > warm_budget:
                break
            try:
                queries[name](spark, warm_dir).write.format("noop") \
                    .mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                # the timed loop will surface real failures; still log
                # so a warm-only failure is visible when debugging
                first = (str(exc).splitlines() or [""])[0]
                print(f"warmup {name}: {type(exc).__name__}: "
                      f"{first[:200]}", file=sys.stderr)
            release_caches()

    jvm_system = getattr(getattr(spark, "_jvm", None), "System", None)
    jvm_runtime = None
    if jvm_system is not None:
        try:
            jvm_runtime = spark._jvm.Runtime.getRuntime()
        except Exception:  # noqa: BLE001 — py4j bridge variations
            jvm_runtime = None

    gc_calls = {"n": 0}

    def maybe_gc():
        """Driver GC fires Spark's ContextCleaner (releases broadcast
        and shuffle blocks — the r9 heap-drift guard), but each
        System.gc() is a full-heap pause the suite pays ~20x per
        pass.  r11: skip it while the heap is comfortable; the guard
        still fires under the pressure it exists for.  r12 (ADVICE):
        ContextCleaner also reclaims DISK-side shuffle files and
        off-heap state the heap gauge cannot see, so every 8th call
        (~64 queries) forces one GC unconditionally as the disk-side
        backstop."""
        if jvm_system is None:
            return
        gc_calls["n"] += 1
        if jvm_runtime is not None and gc_calls["n"] % 8 != 0:
            used = jvm_runtime.totalMemory() - jvm_runtime.freeMemory()
            if used < 0.25 * jvm_runtime.maxMemory():
                return
        jvm_system.gc()

    def host_probe() -> float:
        """Out-of-JVM host-speed probe: a fixed numpy workload timed
        in the DRIVER python process (r12: seven definitive attempts
        showed probes decaying 0.95 -> 1.2 within runs, and the
        Spark-side canary cannot distinguish host CPU throttle from
        JVM aging — GC/code-cache/ContextCleaner state.  A python
        matmul shares the host but none of the JVM, so if host_probes
        rise with the canaries the host is throttling; if only the
        canaries rise the JVM is aging)."""
        import numpy as _np

        a = _np.arange(160000, dtype=_np.float64).reshape(400, 400)
        a = a / 1.0e9
        t0 = time.time()
        for _ in range(8):
            a = a @ a
            a = a / max(float(a[0, 0]), 1.0e-9)
        return round(time.time() - t0, 4)

    def canary_probe() -> float:
        """PROBE FORMULA: wall-clock of the fixed canary triplet run
        now, divided by the triplet's recorded steady-state sum
        (CANARY_STEADY) — 1.0 means the host is at baseline speed,
        2.0 means everything currently runs 2x slow.  Probes run
        OUTSIDE the timed loop, interleaved at 5 points across the
        suite, so a contention BURST during the run is visible even
        when the in-suite canary queries happened to dodge it."""
        t0 = time.time()
        for cname in CANARY_STEADY:
            queries[cname](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        return round((time.time() - t0)
                     / sum(CANARY_STEADY.values()), 3)

    # >=5 interleaved probes per pass (r8 verdict item 4): quartile
    # positions; keyed by the query INDEX they precede so
    # bench_compare can normalise each query by its nearest probe.
    probe_points = sorted({(len(names) * k) // 4 for k in (1, 2, 3)}
                          - {0, len(names)})
    samples: dict[str, list[float]] = {n: [] for n in names}
    probes_by_pass: list[dict[str, float]] = []
    host_by_pass: list[dict[str, float]] = []
    pass_walls: list[float] = []

    for p in range(PASSES):
        pass_probes = {"q0": canary_probe()}
        pass_host = {"q0": host_probe()}
        t_pass0 = time.time()
        for i, name in enumerate(names):
            if i in probe_points:
                t_pause = time.time()
                pass_probes[f"q{i}"] = canary_probe()
                pass_host[f"q{i}"] = host_probe()
                t_pass0 += time.time() - t_pause  # probe isn't suite time
            fn = queries[name]
            # isolate queries: persisted frames from earlier queries
            # would otherwise hold executor memory and skew later
            # timings.  release_caches() frees exactly the library's
            # scoped persists (a user-facing driver does the same, or
            # uses cache_scope())
            release_caches()
            if i % 8 == 0:
                maybe_gc()
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                t1 = round(time.time() - t0, 3)
                samples[name].append(t1)
                if t1 > QUERY_BUDGET:
                    print(f"[bench] pass {p} {name} over budget: "
                          f"{t1:.1f}s > {QUERY_BUDGET:.0f}s",
                          file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                samples[name].append(-1.0)
                print(f"[bench] pass {p} {name} FAILED: {e}",
                      file=sys.stderr)
        pass_walls.append(round(time.time() - t_pass0, 3))
        pass_probes[f"q{len(names)}"] = canary_probe()
        pass_host[f"q{len(names)}"] = host_probe()
        probes_by_pass.append(pass_probes)
        host_by_pass.append(pass_host)

    import statistics as _st

    # targeted re-passes: re-time ONLY the queries whose closest two
    # samples still disagree > REPRO_BAR (r10 verdict item 1) — a
    # transient that hit one of two full passes gets outvoted by the
    # third sample; a genuine bimodal stays uncorroborated and says so
    target_probes: list[float] = []
    for tp in range(TARGET_PASSES if PASSES > 1 else 0):
        noisy = [n for n in names
                 if all(s >= 0 for s in samples[n])
                 and _corroboration(samples[n]) > REPRO_BAR]
        if not noisy:
            break
        target_probes.append(canary_probe())
        print(f"[bench] targeted pass {tp}: re-timing "
              f"{len(noisy)} uncorroborated queries", file=sys.stderr)
        for i, name in enumerate(noisy):
            release_caches()
            if i % 8 == 0:
                maybe_gc()
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                samples[name].append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                samples[name].append(-1.0)
                print(f"[bench] targeted pass {tp} {name} FAILED: "
                      f"{e}", file=sys.stderr)

    # published per-query timing: median of the successful samples;
    # any failed pass is sticky (-1) so failures cannot hide behind a
    # green pass
    timings = {}
    spread = {}
    corrob = {}
    for name, ss in samples.items():
        good = [s for s in ss if s >= 0]
        if len(good) < len(ss) or not good:
            timings[name] = -1.0
            continue
        timings[name] = round(_st.median(good), 3)
        spread[name] = round(max(good) / max(min(good), 1e-9), 3)
        corrob[name] = round(_corroboration(good), 3)
    repro = (round(sum(1 for v in corrob.values() if v <= REPRO_BAR)
                   / len(corrob), 3) if corrob else None)
    if repro is not None and repro < 0.95 and PASSES > 1:
        print(f"[bench] per-query reproducibility {repro:.0%} "
              f"< 95% corroborated within {REPRO_BAR}x — treat "
              f"per-query deltas with suspicion", file=sys.stderr)
    total = round(_st.median(pass_walls), 3)
    # merged probe set for bench_compare's nearest-probe lookup:
    # median across passes at each probe index
    probe_keys = sorted({k for pp in probes_by_pass for k in pp},
                        key=lambda k: int(k[1:]))
    probes = {k: round(_st.median([pp[k] for pp in probes_by_pass
                                   if k in pp]), 3)
              for k in probe_keys}

    # ONE formula everywhere (r8 verdict item 4 — the in-suite-timing
    # ratio and the probe ratios used different denominators and read
    # differently): canary_ratio IS the median probe; spread is
    # max-min.  The in-suite triplet ratio is reported alongside for
    # cross-checking, under its own name.
    import statistics

    probe_vals = list(probes.values())
    canary_ratio = round(statistics.median(probe_vals), 3)
    canary_spread = round(max(probe_vals) - min(probe_vals), 3)
    canary_insuite = (round(
        sum(timings.get(k, 0.0) for k in CANARY_STEADY)
        / sum(CANARY_STEADY.values()), 3)
        if all(timings.get(k, -1.0) >= 0 for k in CANARY_STEADY)
        else None)

    metric = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "canary_ratio": canary_ratio,
        "canary_spread": canary_spread,
        "canary_insuite": canary_insuite,
        "canary_probes": probes,
        "canary_formula": ("probe = wall(triplet now) / steady_sum"
                           f"({round(sum(CANARY_STEADY.values()), 3)}s); "
                           "canary_ratio = median(probes); keys = query"
                           " index the probe preceded"),
        "query_order": names,
        "passes": PASSES,
        "pass_walls": pass_walls,
        "value_semantics": ("median pass wall; queries = per-query "
                            "median across passes"),
        "query_samples": samples,
        "query_spread": spread,
        "query_corroboration": corrob,
        "corroboration_semantics": (
            "min adjacent ratio of sorted samples — the two closest "
            "samples agree within this factor; repro_within_1_3 is "
            "the fraction corroborated <= 1.3 (spread stays max/min "
            "over ALL samples incl. outvoted transients)"),
        "target_pass_probes": [round(p, 3) for p in target_probes],
        "repro_within_1_3": repro,
        "canary_probes_by_pass": probes_by_pass,
        # out-of-JVM host probes (raw seconds of a fixed numpy
        # workload in the driver python, same keys as canary_probes):
        # rising WITH the canaries = host throttle; flat while
        # canaries rise = JVM aging (GC / code cache / cleaner)
        "host_probes_by_pass": host_by_pass,
    }
    # file artifact first (FULL per-query map): survives any
    # stdout-capture truncation.  r12 (r11 verdict item 6): only a
    # builder-flagged DEFINITIVE run overwrites the committed
    # BENCH_local.json; any other invocation (the driver's per-round
    # run) writes a round-stamped, gitignored sibling so a driver run
    # can no longer dirty the working tree over the committed record.
    if os.environ.get("SPARK_GRAFT_BENCH_DEFINITIVE", "") == "1":
        artifact = "BENCH_local.json"
    else:
        stamp = "latest"
        try:
            with open(os.path.join(ROOT, "PROGRESS.jsonl")) as fh:
                lines = fh.read().strip().splitlines()
            stamp = f"r{json.loads(lines[-1])['round']}"
        except Exception:  # noqa: BLE001 — no progress file: keep latest
            pass
        artifact = f"BENCH_local.{stamp}.json"
    with open(os.path.join(ROOT, artifact), "w") as fh:
        fh.write(json.dumps(metric) + "\n")
    # The printed line must survive a BOUNDED tail capture (r6
    # post-mortem: a 169-query JSON line overflowed the driver's
    # window and parsed as null).  Print a COMPACT final line — total,
    # canaries, failures, worst-10 queries — and leave the full map to
    # the BENCH_local.json artifact.
    worst = dict(sorted(
        ((k, v) for k, v in timings.items() if v >= 0),
        key=lambda kv: -kv[1])[:10])
    failed = sorted(k for k, v in timings.items() if v < 0)
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "failed": failed[:10],
        "canary_ratio": canary_ratio,
        "canary_spread": canary_spread,
        "canary_insuite": canary_insuite,
        "canary_probes": probes,
        "passes": PASSES,
        "pass_walls": pass_walls,
        "repro_within_1_3": repro,
        "queries": worst,
        "full_artifact": artifact,
    }
    line = json.dumps(compact)
    # stop Spark BEFORE printing so no JVM output can follow the line
    spark.stop()
    print(line, flush=True)
    return 0 if all(v >= 0 for v in timings.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
