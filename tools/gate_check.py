"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, then compares row count, column-name
set, and the order-insensitive multiset of row values (columns sorted
by name — the driver's comparison shape).

Usage: python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import datetime

sys.path.insert(0, ".")

import duckdb  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return bool(v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        sm = rows_multiset(scols, srows)
        om = rows_multiset(ocols, orows)
        ok = ok_cols and sm == om
        status = "OK  " if ok else "FAIL"
        print(
            f"{status}  {name}: spark {len(srows)} rows / oracle {len(orows)}"
            f" cols={'=' if ok_cols else f'{scols} vs {ocols}'} [{time.time()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if ok_cols:
                s_only = [r for r in sm if r not in om][:3]
                o_only = [r for r in om if r not in sm][:3]
                print("      spark-only:", s_only)
                print("      oracle-only:", o_only)
    print("\n%d/%d compared queries OK" % (len(qs) - len(failures), len(qs)))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
