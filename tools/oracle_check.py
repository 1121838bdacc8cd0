"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, comparing row count, sorted column names, and an
order-insensitive value hash.

Canonicalization deliberately mirrors the driver's: BOTH result sets are
round-tripped through pandas (Spark via ``toPandas()``, DuckDB via ``.df()``)
before hashing, so pandas dtype coercions that the driver sees — DuckDB
HUGEINT ``sum()`` → float64, int-with-NULL → float64, unhashable list cells
crashing ``sort_values`` — show up here too (r01 shipped 3 hash mismatches
this harness's former ``fetchall()`` path could not reproduce).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm_val(v):
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def canon(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    all columns (this is where unhashable list cells crash, as they do in the
    driver), values then normalized for hashing."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return cols, [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def value_hash(rows) -> str:
    lines = sorted("\x01".join(norm_val(v) for v in r) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from seq2kg_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            scols, srows = canon(spdf)
        except Exception as ex:
            print(f"FAIL {name}: spark/canon error: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
            dcols, drows = canon(dpdf)
        except Exception as ex:
            print(f"FAIL {name}: duckdb/canon error: {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_n = len(srows) == len(drows)
        ok_c = scols == dcols
        sh, dh = value_hash(srows), value_hash(drows)
        ok_h = sh == dh
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} "
              f"cols={'=' if ok_c else f'{scols} vs {dcols}'} "
              f"hash={'=' if ok_h else f'{sh} vs {dh}'}")
        if status == "FAIL":
            failures.append(name)
            if not ok_h and ok_n and ok_c and len(srows) <= 100000:
                sset = {tuple(norm_val(v) for v in r) for r in srows}
                dset = {tuple(norm_val(v) for v in r) for r in drows}
                for x in list(sset - dset)[:3]:
                    print("   spark-only:", x)
                for x in list(dset - sset)[:3]:
                    print("   duck-only: ", x)
    spark.stop()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
