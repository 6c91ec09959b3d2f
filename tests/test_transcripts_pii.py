"""Transcript-native ops, PII detection/redaction, repetition,
benchmark contamination — micro-table unit tests with DuckDB
cross-checks of the generated oracles where cheap."""

import duckdb
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.pii import (
    pii_counts,
    pii_counts_sql,
    redact_pii,
    redact_pii_sql,
)
from embulk_util_json_spark.pipeline.transcripts import (
    assemble_conversations,
    conversation_stats,
    role_alternation_violations,
)
from embulk_util_json_spark.pipeline.dedup import (
    benchmark_contamination,
    repetition_stats,
)


def _turns(spark):
    rows = [
        ("c1", 0, "user", "hello there", None),
        ("c1", 1, "assistant", "hi!", None),
        ("c1", 2, "assistant", "double turn", "search"),
        ("c2", 3, "user", "lone turn", None),  # starts at 3: not contiguous
        ("c2", 5, "tool", "result", "calc"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_assemble_conversations(spark):
    out = {r.conv_id: r for r in assemble_conversations(_turns(spark)).collect()}
    assert out["c1"].document == (
        "user: hello there\nassistant: hi!\nassistant: double turn"
    )
    assert out["c1"].n_turns == 3
    assert out["c2"].document == "user: lone turn\ntool: result"


def test_assemble_null_turn_parity_with_oracle(spark):
    # PINNED NULL semantics: a NULL role/text renders as '' and the
    # line still appears — identically in the engine (coalesce inside
    # concat; concat_ws would silently SKIP the null arg) and the
    # DuckDB twin (coalesce inside ||; bare || would null the line and
    # string_agg would DROP it). Also covers merge_consecutive_roles'
    # string_agg twin.
    from embulk_util_json_spark.pipeline.transcripts import (
        assemble_conversations_sql,
        merge_consecutive_roles,
        merge_consecutive_roles_sql,
    )

    rows = [
        ("c1", 0, "user", "hello", None),
        ("c1", 1, "assistant", None, None),     # NULL text
        ("c1", 2, None, "orphan line", None),   # NULL role
        ("c1", 3, "assistant", "bye", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = assemble_conversations(df).first()
    assert got.document == "user: hello\nassistant: \n: orphan line\nassistant: bye"
    assert got.n_turns == 4

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(conv_id VARCHAR, turn_idx INT, role VARCHAR, "
        "text VARCHAR, tool VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    ora = con.execute(assemble_conversations_sql("SELECT * FROM t")).fetchone()
    assert (ora[0], ora[1], ora[2]) == ("c1", got.document, 4)

    # merge path: run of two 'assistant' turns where one text is NULL
    merged = {
        r.turn_idx: r for r in merge_consecutive_roles(df).collect()
    }
    ora_m = {
        r[1]: r
        for r in con.execute(
            merge_consecutive_roles_sql("SELECT * FROM t")
        ).fetchall()
    }
    assert set(merged) == set(ora_m)
    for ti, row in merged.items():
        assert ora_m[ti][3] == row.text, (ti, ora_m[ti][3], row.text)


def test_conversation_stats(spark):
    out = {r.conv_id: r for r in conversation_stats(_turns(spark)).collect()}
    c1, c2 = out["c1"], out["c2"]
    assert (c1.n_turns, c1.n_roles, c1.n_tool_calls) == (3, 2, 1)
    assert c1.contiguous is True and (c1.first_turn, c1.last_turn) == (0, 2)
    assert c2.contiguous is False  # span 3..5 with only 2 turns


def test_role_alternation_violations(spark):
    out = role_alternation_violations(_turns(spark)).collect()
    assert [(r.conv_id, r.turn_idx, r.role) for r in out] == [
        ("c1", 2, "assistant")
    ]


def test_pii_counts_and_redaction_with_oracle(spark):
    rows = [
        (1, "mail a@b.co and a.b+c@d.org, call 555-123-4567"),
        (2, "ip 10.0.0.255 ssn 123-45-6789"),
        (3, "clean text, no pii at all; 1234 alone is fine"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_counts(df, "text", "doc_id").collect()}
    assert (got[1].n_email, got[1].n_phone) == (2, 1)
    assert (got[2].n_ipv4, got[2].n_ssn) == (1, 1)
    assert got[3].n_pii == 0 and got[4].n_pii == 0

    red = {r.doc_id: r for r in redact_pii(df, "text", "doc_id").collect()}
    assert red[1].redacted == "mail [PII] and [PII], call [PII]"
    assert red[2].redacted == "ip [PII] ssn [PII]"
    assert red[3].chars_removed == 0

    # oracle agreement on the same micro-table (both SQL twins)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows).replace("''", "''")
        + ") t(doc_id, text)"
    )
    ora = {r[0]: r for r in con.execute(pii_counts_sql("d", "text", "doc_id")).fetchall()}
    for i in (1, 2, 3, 4):
        g = got[i]
        assert ora[i] == (
            i, g.n_email, g.n_phone, g.n_ipv4, g.n_ssn, g.n_pii
        )
    ora_r = {r[0]: r for r in con.execute(redact_pii_sql("d", "text", "doc_id")).fetchall()}
    for i in (1, 2, 3, 4):
        assert ora_r[i][1] == red[i].redacted
        assert ora_r[i][2] == red[i].chars_removed


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # trigrams: 7 total, 3 distinct
            (2, "all words different here now"),  # 3 total, 3 distinct
            (3, "too short"),            # no trigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df, "text", "doc_id", 3).collect()}
    assert (out[1].n_grams, out[1].n_distinct) == (7, 3)
    assert out[1].distinct_ratio == round(3 / 7, 6)
    assert (out[2].n_grams, out[2].n_distinct, out[2].distinct_ratio) == (3, 3, 1.0)
    assert (out[3].n_grams, out[3].n_distinct, out[3].distinct_ratio) == (0, 0, None)


def test_benchmark_contamination(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence with novel phrasing"),
            (3, "quick brown fox phrase appears here quick brown fox"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 1)
    out = {
        r.doc_id: r
        for r in benchmark_contamination(docs, bench, "text", "doc_id", 3).collect()
    }
    assert out[1].contaminated_frac == 1.0  # benchmark member: full overlap
    assert out[2].n_contaminated == 0
    assert 0 < out[3].n_contaminated < out[3].n_shingles


def test_merge_consecutive_roles(spark):
    from embulk_util_json_spark.pipeline.transcripts import merge_consecutive_roles

    out = merge_consecutive_roles(_turns(spark)).orderBy("conv_id", "turn_idx")
    rows = [(r.conv_id, r.turn_idx, r.role, r.text, r.n_merged, r.orig_turn_idx)
            for r in out.collect()]
    assert rows == [
        ("c1", 0, "user", "hello there", 1, 0),
        ("c1", 1, "assistant", "hi!\ndouble turn", 2, 1),  # run merged
        ("c2", 0, "user", "lone turn", 1, 3),
        ("c2", 1, "tool", "result", 1, 5),
    ]


def test_truncate_to_budget_keeps_latest_fitting_turns(spark):
    from embulk_util_json_spark.pipeline.transcripts import truncate_to_budget

    rows = [
        # c1: token counts per turn: t0=4, t1=4, t2=4 ("a b c d" = 4)
        ("c1", 0, "user", "a b c d"),
        ("c1", 1, "assistant", "e f g h"),
        ("c1", 2, "user", "i j k l"),
        # c2: latest turn alone exceeds any small budget
        ("c2", 0, "user", "one two"),
        ("c2", 1, "assistant", " ".join(["w"] * 50)),
        # c3: NULL text counts zero tokens
        ("c3", 0, "user", None),
        ("c3", 1, "assistant", "x y"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")

    got = {
        (r.conv_id, r.turn_idx): (r.n_tokens, r.cum_tokens)
        for r in truncate_to_budget(df, budget=8).collect()
    }
    # c1: latest two turns fit (4+4=8); oldest dropped
    # c2: the 50-token latest turn overflows alone -> conversation empty
    # c3: both kept (0 + 2 tokens)
    assert got == {
        ("c1", 2): (4, 4),
        ("c1", 1): (4, 8),
        ("c3", 1): (2, 2),
        ("c3", 0): (0, 2),
    }


def test_truncate_to_budget_matches_oracle(spark):
    from embulk_util_json_spark.pipeline.transcripts import (
        truncate_to_budget,
        truncate_to_budget_sql,
    )

    rows = [
        ("c%d" % (i % 7), i // 7, "r%d" % (i % 3),
         " ".join("tok%d" % j for j in range(1 + i % 9)))
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = sorted(
        (r.conv_id, r.turn_idx, r.n_tokens, r.cum_tokens)
        for r in truncate_to_budget(df, budget=11).collect()
    )
    con = duckdb.connect()
    con.register("turns", df.toPandas())
    want = sorted(
        (r[0], r[1], r[4], r[5])
        for r in con.execute(
            truncate_to_budget_sql("SELECT * FROM turns", budget=11)
        ).fetchall()
    )
    assert got == want and got
