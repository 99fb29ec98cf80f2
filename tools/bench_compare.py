#!/usr/bin/env python
"""Compare two bench JSON files with canary normalization.

Raw per-query wall times on a shared host are dominated by external
contention (measured this repo: uniform ~2-3x inflation with host load
>4; SCALE.md "Measurement notes").  This tool divides out that noise:
the ratio of the CANARY set (cheap, stable, code-untouched queries)
between the two runs estimates the host-speed ratio, every per-query
ratio is normalized by it, and only queries whose NORMALIZED ratio
exceeds the threshold are flagged as real regressions.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]

Accepts either the raw bench stdout line or the driver's BENCH_r*.json
wrapper ({"parsed": {...}}).
"""

import json
import statistics
import sys

CANARIES = ["tpch_q6", "tpch_q1", "dedup_exact", "projection",
            "filter_pushdown"]


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        d = json.loads(text)  # pretty-printed driver wrapper
    except json.JSONDecodeError:
        # bench stdout: last parseable JSON line after progress bars
        d = None
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if d is None:
            raise SystemExit(f"{path}: no JSON found")
    if "parsed" in d:
        d = d["parsed"]
    return d


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_d, new_d = load(sys.argv[1]), load(sys.argv[2])
    old, new = old_d["queries"], new_d["queries"]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    common = [q for q in new if q in old and old[q] > 0 and new[q] > 0]

    def probe_norm(d: dict):
        """Per-query host-speed factor from the run's interleaved
        canary probes (bench.py canary_formula): each query divides by
        the probe nearest its position in query_order.  Requires the
        r9+ artifact fields (canary_probes keyed q<idx> + query_order);
        returns None for older records."""
        probes = d.get("canary_probes") or {}
        order = d.get("query_order") or []
        pts = {}
        for k, v in probes.items():
            if isinstance(k, str) and k.startswith("q") and k[1:].isdigit():
                pts[int(k[1:])] = v
        if not pts or not order:
            return None
        pos = {q: i for i, q in enumerate(order)}
        keys = sorted(pts)

        def factor(q):
            i = pos.get(q)
            if i is None:
                return statistics.median(pts.values())
            nearest = min(keys, key=lambda k: abs(k - i))
            return pts[nearest]

        return factor

    fo, fn_ = probe_norm(old_d), probe_norm(new_d)
    if fo and fn_:
        mode = "nearest-probe"
        def host_factor(q):
            return fn_(q) / fo(q)
    else:
        # legacy records: single host-speed ratio from the shared
        # canary queries' in-suite timings
        canaries = [q for q in CANARIES if q in common]
        ratio = (statistics.median(new[q] / old[q] for q in canaries)
                 if canaries else 1.0)
        mode = f"canary-median ({canaries})"
        def host_factor(q):
            return ratio
    if not common:
        print("0 common queries between the two records — "
              "nothing to compare")
        return 0
    sample = statistics.median(host_factor(q) for q in common)
    print(f"normalization: {mode}; median host-speed factor "
          f"{sample:.2f}x (new/old)")

    rows = []
    for q in common:
        raw = new[q] / old[q]
        norm = raw / host_factor(q)
        rows.append((norm, raw, q))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] > threshold]
    print(f"{len(common)} common queries; "
          f"{len(flagged)} above {threshold:.2f}x normalized")

    # r11 (r10 verdict item 1): every flagged delta is labeled REAL
    # or TRANSIENT-SUSPECT from the runs' own published per-query
    # noise.  The noise floor for a query is the worse of the two
    # runs' corroboration (r11 artifacts: min adjacent sample ratio;
    # fallback: max/min spread for r10 artifacts).  A claimed
    # regression SMALLER than its own noise floor is suppressed from
    # the exit code — it is unattributable by construction, the
    # r10 phrase_boilerplate bisection class.
    # Spread-derived floors (legacy r10 artifacts without
    # query_corroboration) stay inflated forever once one outvoted
    # transient sample exists, so an uncapped spread floor could
    # suppress a genuine clean regression of similar size (ADVICE
    # r11).  Cap such floors and say which kind fed the verdict;
    # corroboration floors are used as-is.
    SPREAD_FLOOR_CAP = 2.0

    def noise_for(q):
        floors = []
        spread_based = False
        for d in (old_d, new_d):
            cb = d.get("query_corroboration")
            if cb is None:
                cb = d.get("query_spread") or {}
                f = cb.get(q, 1.0)
                if f > SPREAD_FLOOR_CAP:
                    f = SPREAD_FLOOR_CAP
                spread_based = True
            else:
                f = cb.get(q, 1.0)
            floors.append(f)
        return max(floors), spread_based

    if any(d.get("query_corroboration") is None
           and d.get("query_spread") for d in (old_d, new_d)):
        print(f"note: one record lacks query_corroboration — its "
              f"noise floors fall back to max/min spread (less "
              f"trustworthy: inflated forever by a single outvoted "
              f"transient), capped at {SPREAD_FLOOR_CAP:.1f}x")

    real = []
    for norm, raw, q in flagged:
        floor, spread_based = noise_for(q)
        kind = "spread-based, capped" if spread_based \
            else "corroboration"
        if floor >= norm:
            label = (f"TRANSIENT-SUSPECT (noise floor {floor:.2f}x "
                     f"[{kind}] >= claimed {norm:.2f}x — suppressed)")
        else:
            label = "REAL" + (f" (noise floor {floor:.2f}x [{kind}])"
                              if floor > 1.05 else "")
            real.append(q)
        print(f"  REGRESSION? {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"(raw {raw:.2f}x, normalized {norm:.2f}x) [{label}]")
    improved = [r for r in rows if r[0] < 1 / threshold]
    for norm, raw, q in sorted(improved):
        print(f"  improved    {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"(normalized {norm:.2f}x)")
    if flagged:
        print(f"{len(real)} real / {len(flagged) - len(real)} "
              f"transient-suspect (suppressed)")
    return 1 if real else 0


if __name__ == "__main__":
    raise SystemExit(main())
