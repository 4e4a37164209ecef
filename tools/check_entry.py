"""Local stand-in for the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and an order-insensitive value multiset. Usage:
    python tools/check_entry.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from ucuddle_search_engine_spark.session import get_spark  # noqa: E402
from ucuddle_search_engine_spark.sources.testdata import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return repr(v)


def as_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    # an arg is the sf dir if it's a path ("/" in it) or a bare scale name
    # like "sf0.01" (resolved under /root/testdata); everything else is a
    # query-name filter
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    only = set()
    for a in args:
        if "/" in a:
            sf_dir = a
        elif a.startswith("sf") and Path(f"/root/testdata/{a}").is_dir():
            sf_dir = f"/root/testdata/{a}"
        else:
            only.add(a)
    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only check: {len(srows)} rows")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sms = as_multiset(scols, [[r[c] for c in scols] for r in srows])
        dms = as_multiset(dcols, drows)
        ok_vals = sms == dms
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(f"{name}: {status} (rows {len(srows)}/{len(drows)}, cols_ok={ok_cols}, vals_ok={ok_vals})")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"  spark cols: {sorted(scols)}\n  duck cols:  {sorted(dcols)}")
            for i, (a, b) in enumerate(zip(sms, dms)):
                if a != b:
                    print(f"  first diff at {i}:\n   spark {a}\n   duck  {b}")
                    break
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
