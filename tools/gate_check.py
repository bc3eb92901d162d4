"""Local replica of the driver's correctness gate — EXACT comparison.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, then compares the way the driver does
(reconstructed from CORRECTNESS_r01.json evidence):

* both results go through pandas (``toPandas()`` / ``.df()``),
* schema = sorted column names AND pandas dtypes (a tz-aware
  timestamp, or a DuckDB HUGEINT that lands as float64, is a schema
  mismatch even when the values "look" equal),
* values = order-insensitive multiset of rows with columns sorted by
  name, compared EXACTLY — no float rounding, no tz stripping, and
  int 5 != float 5.0 (round-1 lesson: the old gate rounded to 9 dp
  and stripped tz, so it passed three queries the driver failed),
* any list/array/dict cell is an immediate FAIL (the driver's
  canonicalizer dies on unhashable cells — CORRECTNESS_r01
  multimodal_features err).

Usage: python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import duckdb  # noqa: E402


def cell_key(v):
    """Type-tagged canonical cell value. Tags keep int/float/bool/str
    apart so representation drift can't alias to a value match."""
    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        raise TypeError(f"unhashable cell (driver canonicalizer would die): {type(v)}")
    if v is None:
        return ("n",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        if pd.isna(v):
            return ("n",)
        return ("f", repr(float(v)))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("t", str(v))  # keeps tz offset in the string
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if v is pd.NaT:
        return ("n",)
    return (type(v).__name__, str(v))


def canon(df: pd.DataFrame):
    """(schema, sorted row multiset) in the driver's comparison shape."""
    df = df.reindex(sorted(df.columns), axis=1)
    schema = [(c, str(df[c].dtype)) for c in df.columns]
    rows = sorted(
        tuple(cell_key(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return schema, rows


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
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            try:
                canon(sdf)
            except TypeError as e:
                print(f"FAIL  {name}: rows-only check would still die: {e}")
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        try:
            s_schema, s_rows = canon(sdf)
            o_schema, o_rows = canon(odf)
        except TypeError as e:
            print(f"FAIL  {name}: {e}")
            failures.append(name)
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = s_schema == o_schema
        hash_ok = s_rows == o_rows
        ok = rows_ok and schema_ok and hash_ok
        status = "OK  " if ok else "FAIL"
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(odf)}"
            f" schema={'ok' if schema_ok else 'MISMATCH'}"
            f" hash={'ok' if hash_ok else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if not schema_ok:
                print("      spark :", s_schema)
                print("      oracle:", o_schema)
            if schema_ok and not hash_ok:
                s_only = [r for r in s_rows if r not in o_rows][:2]
                o_only = [r for r in o_rows if r not in s_rows][:2]
                print("      spark-only:", s_only)
                print("      oracle-only:", o_only)
    n_run = len(qs if not only else [q for q in qs if q in only])
    print("\n%d/%d compared queries OK" % (n_run - len(failures), n_run))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
