"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, comparing row count, sorted column names, and an
order-insensitive value hash (values stringified with repr-normalized
floats).  Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def norm_val(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if v is None:
        return "NULL"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_val(r[i]) for i in order) for r in rows
    )
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
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            drel = con.sql(oracles[name])
            drows = drel.fetchall()
            dcols = drel.columns
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
        ok_h = sh == dh
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} "
              f"cols={'=' if ok_c else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"hash={'=' if ok_h else f'{sh} vs {dh}'}")
        if status == "FAIL":
            failures.append(name)
            if not ok_h and ok_n and ok_c and len(srows) <= 100000:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(norm_val(r[i]) for i in order_s) for r in srows}
                dset = {tuple(norm_val(r[i]) for i in order_d) for r in drows}
                for x in list(sset - dset)[:3]:
                    print("   spark-only:", x)
                for x in list(dset - sset)[:3]:
                    print("   duck-only: ", x)
    spark.stop()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
