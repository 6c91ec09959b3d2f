"""Oracle output-type sweep: every DuckDB oracle twin must emit only
driver-safe column types.

Round-3 regression class: DuckDB widens ``SUM(BIGINT)`` to HUGEINT
(Arrow decimal128(38,0)) while Spark emits int64; the driver's value
hasher canonicalizes the two differently, so an un-cast SUM-derived
oracle column hash-fails the gate even when every value is equal
(5 of 79 queries in round 3, all sharing this one root cause). The
local mirror fetches via ``fetchall()`` (Python ints) and cannot see
it — this sweep asserts on the DECLARED types instead, so a new
oracle can't reintroduce the drift.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, oracle_type_violations

SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_oracle_types_driver_safe(con, spark):
    # one test sweeping every oracle (oracle_sql() builds Column
    # expressions internally, so it needs the session fixture active)
    import __spark_entry__ as entrymod

    violations = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        bad = oracle_type_violations(con, sql)
        if bad:
            violations[name] = bad
    assert not violations, (
        f"oracles emit driver-unsafe types {violations}: DuckDB "
        "HUGEINT/DECIMAL hash-canonicalizes differently from Spark "
        "int64 — CAST the column AS BIGINT (or DOUBLE)"
    )
