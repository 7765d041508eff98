"""Mini-driver: run every queries() entry against its oracle_sql() twin and
compare row count, column names, and an order-insensitive value hash —
a local replica of the driver's CORRECTNESS gate so mismatches surface
before the round boundary.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"OK? {name}: rows={len(s_rows)} (no oracle, rows-only)")
            continue
        try:
            rel = con.sql(ORACLE_SQL[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh = value_hash(s_rows, s_cols)
            dh = value_hash(d_rows, d_cols)
            if sh != dh:
                problems.append("value-hash mismatch")
                s_set = set(
                    tuple(norm_cell(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i]))
                    for r in s_rows
                )
                d_set = set(
                    tuple(norm_cell(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i]))
                    for r in d_rows
                )
                only_s = list(s_set - d_set)[:3]
                only_d = list(d_set - s_set)[:3]
                problems.append(f"spark-only={only_s} duck-only={only_d}")
        dt = time.time() - t0
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"PASS {name} ({dt:.1f}s): rows={len(s_rows)}")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
