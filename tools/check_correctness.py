"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf parquet tables; compares row count, sorted
column names, and an order-insensitive value hash (rows canonically
stringified, sorted, md5'd).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: repr of round-trip float
        return repr(v)
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), sorted(cols), h


DRIVER_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_violations(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs whose type the driver's value
    hasher canonicalizes differently from any Spark output type.
    Shared with tests/test_oracle_types.py so every new oracle gets
    swept."""
    rows = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    return [
        (r[0], r[1])
        for r in rows
        if any(r[1].upper().startswith(t) for t in DRIVER_UNSAFE_TYPES)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            s_fp = frame_fingerprint(scols, srows)
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={s_fp[0]} (no oracle — rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            o_fp = frame_fingerprint(ocols, orows)
            # Round-3 lesson: fetchall() yields Python ints, so this
            # mirror is structurally blind to DuckDB's SUM(BIGINT) →
            # HUGEINT widening (Arrow decimal128) that the DRIVER's
            # hasher canonicalizes differently from Spark's int64 —
            # 5 driver-gate hash fails that all passed here. Assert
            # the oracle's declared types are driver-safe instead.
            bad = oracle_type_violations(con, oracles[name])
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        if bad:
            print(
                f"FAIL {name}: driver-unsafe oracle column types {bad} "
                "(DuckDB HUGEINT/DECIMAL hash-canonicalizes differently "
                "from Spark int64 — CAST the column AS BIGINT/DOUBLE)"
            )
            failures += 1
            continue
        status = "PASS" if s_fp == o_fp else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: spark(rows={s_fp[0]}, cols={s_fp[1]}, h={s_fp[2][:10]}) "
            f"oracle(rows={o_fp[0]}, cols={o_fp[1]}, h={o_fp[2][:10]}) "
            f"[{time.time() - t0:.1f}s]"
        )
        if status == "FAIL" and s_fp[0] == o_fp[0] and s_fp[1] == o_fp[1]:
            # value mismatch: show a few differing rows for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ls = sorted("\x1f".join(canon_cell(r[i]) for i in order_s) for r in srows)
            lo = sorted("\x1f".join(canon_cell(r[i]) for i in order_o) for r in orows)
            diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
            for a, b in diffs:
                print(f"    spark : {a[:200]}")
                print(f"    oracle: {b[:200]}")
    import threading

    # teardown watchdog: a hung spark.stop() (observed after large
    # sessions) must not stall the caller — results are already printed
    import sys as _sys
    _sys.stdout.flush()
    _t = threading.Thread(target=spark.stop, daemon=True)
    _t.start(); _t.join(timeout=60)
    if _t.is_alive():
        os._exit(1 if failures else 0)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
