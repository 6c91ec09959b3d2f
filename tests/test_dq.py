"""Data-quality gate: one-scan summary/violations, NULL predicate
counts as a violation (IS NOT TRUE semantics) on both engines."""

import duckdb
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.dq import (
    dq_summary,
    dq_summary_sql,
    dq_violations,
    dq_violations_sql,
)

def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "id_not_null": F.col("id").isNotNull(),
        "v_positive": F.col("v") > 0,
    }


RULES_SQL = {
    "id_not_null": "id IS NOT NULL",
    "v_positive": "v > 0",
}


def _df(spark):
    return spark.createDataFrame(
        [("a", 1), ("b", -1), (None, 2), ("d", None)],
        "id string, v int",
    )


def test_dq_summary_null_is_violation(spark):
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_frac)
        for r in dq_summary(_df(spark), _rules()).collect()
    }
    # row ('d', NULL): v > 0 is NULL -> violation
    assert got == {
        "id_not_null": (4, 1, 0.25),
        "v_positive": (4, 2, 0.5),
    }


def test_dq_violations_rows_and_rule_lists(spark):
    out = dq_violations(_df(spark), _rules(), ["id", "v"])
    got = {
        (r.id, r.v): list(r.failed_rules) for r in out.collect()
    }
    assert got == {
        ("b", -1): ["v_positive"],
        (None, 2): ["id_not_null"],
        ("d", None): ["v_positive"],
    }


def test_dq_sql_twins_match_spark(spark):
    rel = "SELECT * FROM t"
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a', 1), ('b', -1), "
        "(NULL, 2), ('d', NULL)) AS v(id, v)"
    )
    s = con.execute(dq_summary_sql(rel, RULES_SQL)).fetchall()
    got = {r[0]: (r[1], r[2], r[3]) for r in s}
    want = {
        r.rule: (r.n_rows, r.n_violations, r.violation_frac)
        for r in dq_summary(_df(spark), _rules()).collect()
    }
    assert got == want

    v = con.execute(dq_violations_sql(rel, RULES_SQL, ["id", "v"])).fetchall()
    got_v = {(r[0], r[1]): r[2] for r in v}
    want_v = {
        (r.id, r.v): r.failed_rules
        for r in dq_violations(_df(spark), _rules(), ["id", "v"])
        .select("id", "v", F.array_join("failed_rules", ",").alias("failed_rules"))
        .collect()
    }
    assert got_v == want_v
