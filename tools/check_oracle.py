"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin on DuckDB, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalized). Usage:  python tools/check_oracle.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from mmkg_rag_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(srows)} rows ({el:.1f}s)")
            if not srows and name not in ("simhash_near_dup",):
                print(f"     WARN {name}: empty result")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} ({el:.1f}s)")
            if "value-hash mismatch" in problems and srows and drows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ss = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in srows)
                dd = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"     spark : {a[:200]}")
                        print(f"     duckdb: {b[:200]}")
                        break
        else:
            print(f"PASS {name}: {len(srows)} rows ({el:.1f}s)")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
