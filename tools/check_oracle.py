#!/usr/bin/env python
"""Driver-emulating correctness harness: runs every __spark_entry__
query against its DuckDB oracle and compares row count, column names,
and order-insensitive values.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # kill -0.0 vs 0.0 and tiny fp noise beyond round()
        return round(val + 0.0, 9)
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    try:
        import decimal

        if isinstance(val, decimal.Decimal):
            return round(float(val), 9)
    except Exception:
        pass
    return val


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # emulate the driver: plain session, no engine tuning
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {e}"
            print(f"[{name}] SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            print(f"[{name}] rows-only: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"DUCK ERROR: {e}"
            print(f"[{name}] DUCK ERROR: {str(e)[:200]}")
            continue
        sc, sr = frame_rows(scols, srows)
        dc, dr = frame_rows(dcols, drows)
        status = []
        if sc != dc:
            status.append(f"COLS {sc} != {dc}")
        if len(sr) != len(dr):
            status.append(f"NROWS {len(sr)} != {len(dr)}")
        elif sc == dc and sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            ex = next((a, b) for a, b in zip(sr, dr) if a != b)
            status.append(f"VALUES {bad}/{len(sr)} differ, e.g. {ex}")
        verdict = "OK" if not status else "; ".join(status)
        results[name] = verdict
        print(f"[{name}] {verdict} ({len(sr)} rows, {time.time()-t0:.1f}s)")

    n_ok = sum(1 for v in results.values() if v == "OK")
    print(f"\n{n_ok}/{len(results)} MATCH")
    spark.stop()
    return 0 if all(v == "OK" or v.startswith("rows-only")
                    for v in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
