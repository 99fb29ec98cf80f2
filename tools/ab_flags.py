#!/usr/bin/env python
"""Interleaved A/B of module-level plan-shape flags.

    python tools/ab_flags.py MODULE FLAG[,FLAG2] q1 [q2 ...] \
        [--repeats N] [--sf DIR]

Runs each named registry query with the flag(s) set False (variant A)
and True (variant B), strictly alternating A/B within one session so
host-speed drift hits both variants equally (the only trustworthy
instrument on a bursty host — see OPTIMIZATION_r12.md "Method").
Prints one JSON line with per-variant medians per query.
"""

import argparse
import importlib
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dask_ms_spark.cache import release_caches  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("module")
    ap.add_argument("flags")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    mod = importlib.import_module(args.module)
    flags = args.flags.split(",")
    for fl in flags:
        if not hasattr(mod, fl):
            print(f"no flag {fl} on {args.module}", file=sys.stderr)
            return 2

    from dask_ms_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("dask-ms-spark-ab", extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    queries.update({k: v for k, v in entrymod.demoted_queries().items()
                    if k not in queries})

    def set_flags(val: bool):
        for fl in flags:
            setattr(mod, fl, val)

    # warmup: codegen/JIT both variants at sf0.001
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")),
                            "sf0.001")
    spark.read.parquet(os.path.join(args.sf, "nation.parquet")).count()
    for val in (False, True):
        set_flags(val)
        for n in args.names:
            try:
                queries[n](spark, warm_dir).write.format("noop") \
                    .mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"warm {n} ({val}): {e}", file=sys.stderr)
            release_caches()

    samples: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in args.names}
    for rep in range(args.repeats):
        for n in args.names:
            for label, val in (("A", False), ("B", True)):
                set_flags(val)
                release_caches()
                t0 = time.time()
                try:
                    queries[n](spark, args.sf).write.format("noop") \
                        .mode("overwrite").save()
                    samples[n][label].append(round(time.time() - t0, 3))
                except Exception as e:  # noqa: BLE001
                    samples[n][label].append(-1.0)
                    print(f"{n} {label} FAILED: {e}", file=sys.stderr)
    set_flags(True)
    out = {}
    for n in args.names:
        med = {}
        for label in ("A", "B"):
            good = [s for s in samples[n][label] if s >= 0]
            med[label] = round(statistics.median(good), 3) if good else -1
        out[n] = {"A_false": med["A"], "B_true": med["B"],
                  "ratio_B_over_A": (round(med["B"] / med["A"], 3)
                                     if med["A"] > 0 else None),
                  "samples": samples[n]}
    spark.stop()
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
