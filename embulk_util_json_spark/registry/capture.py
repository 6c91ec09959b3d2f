"""Auto-split from __spark_entry__.py (round 5): JSON pointer capture / flatten / variant parity queries (reference operators R1-R10)

Part of the driver registry package — every ``_q_*`` callable is a
``(spark, sf_dir) -> DataFrame`` query and every ``_ORACLE_*`` /
``*_oracle`` value is its DuckDB ANSI-SQL twin. See
``__spark_entry__.queries()`` for the graded registry order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from .common import *  # noqa: F401,F403 — shared fixtures/oracle fragments


def _q_lww_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins winner per user over the raw events table
    (aggregation-based LWW with map-side partial combine)."""
    from embulk_util_json_spark.operators.lww import lww_agg

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return lww_agg(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


_ORACLE_LWW_LATEST = """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        FROM events
    ) WHERE rn = 1
"""


def _q_capture_pointers_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity pointer capture over the events.props JSON
    column: missing pointer → SQL NULL, whole-doc pointer '/' →
    canonical minified JSON."""
    from embulk_util_json_spark.operators.capture import extract_parity
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select("event_id", "props")
    spec = CaptureSpec.compile(["/k", "/", "/missing"], ["k", "whole", "missing"])
    out = extract_parity(ev, "props", spec)
    return out.select(
        F.col("event_id"), F.col("k"), F.col("whole"), F.col("missing")
    )


_ORACLE_CAPTURE_PARITY = """
    SELECT event_id,
           CAST(json_extract(props, '/k') AS VARCHAR) AS k,
           CAST(json_extract(props, '$') AS VARCHAR) AS whole,
           CAST(json_extract(props, '/missing') AS VARCHAR) AS missing
    FROM events
"""


def _q_capture_typed_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed capture (pruned from_json, whole-stage codegen): top-level
    member extracted and cast."""
    from embulk_util_json_spark.operators.capture import capture_typed
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select("event_id", "props")
    spec = CaptureSpec.compile(["/k"], ["k"])
    return capture_typed(ev, "props", spec, casts={"k": "long"}).select("event_id", "k")


_ORACLE_CAPTURE_TYPED = """
    SELECT event_id, CAST(json_extract(props, '/k') AS BIGINT) AS k
    FROM events
"""


def _q_flatten_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array flattening (explode(from_json(array<string>))) composed
    with typed capture — R3∘R5 on a constructed two-element array."""
    from embulk_util_json_spark.operators.capture import capture_typed
    from embulk_util_json_spark.operators.flatten import flatten_typed
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit('[{"i":0,"p":'), "props", F.lit('},{"i":1,"p":'), "props", F.lit("}]")
        ).alias("doc"),
    )
    flat = flatten_typed(ev, "doc", 1)
    spec = CaptureSpec.compile(["/i", "/p/k"], ["i", "k"])
    return capture_typed(flat, "doc", spec, casts={"i": "int", "k": "long"}).select(
        "event_id", "i", "k"
    )


_ORACLE_FLATTEN = """
    SELECT event_id, i, k FROM (
        SELECT event_id, 0 AS i, CAST(json_extract(props, '/k') AS BIGINT) AS k FROM events
        UNION ALL
        SELECT event_id, 1 AS i, CAST(json_extract(props, '/k') AS BIGINT) AS k FROM events
    )
"""


def _q_capture_direct_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-member fast path (json_tuple): the Spark analogue of the
    reference's CapturingDirectMemberNameList dispatch-and-skip;
    missing member → SQL NULL."""
    from embulk_util_json_spark.operators.capture import capture_json_tuple

    ev = _read(spark, sf_dir, "events").select("event_id", "props")
    out = capture_json_tuple(ev, "props", ["k", "absent"], ["k", "absent"])
    return out.select("event_id", "k", "absent")


_ORACLE_CAPTURE_DIRECT = """
    SELECT event_id,
           CAST(json_extract(props, '/k') AS VARCHAR) AS k,
           CAST(json_extract(props, '/absent') AS VARCHAR) AS absent
    FROM events
"""


def _q_capture_with_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root re-pointing composed with capture (R2∘R5): wrap props under
    'ex', re-root at /ex, capture a member and the whole re-rooted doc."""
    from embulk_util_json_spark.operators.capture import extract_parity
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit('{"ex":'), "props", F.lit("}")).alias("doc"),
    )
    spec = CaptureSpec.compile(["/k", "/"], ["k", "whole"])
    out = extract_parity(ev, "doc", spec, root="/ex")
    return out.select("event_id", "k", "whole")


_ORACLE_CAPTURE_ROOT = """
    SELECT event_id,
           CAST(json_extract(props, '/k') AS VARCHAR) AS k,
           CAST(json_extract(props, '$') AS VARCHAR) AS whole
    FROM events
"""


def _q_capture_auto_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic strategy selection (CapturingPointers.java:145-165):
    a pointer set mixing a decimal segment and a member name at one
    level ('/a/1/k' + '/a/c') has no single pruned from_json schema,
    so capture_typed transparently routes to the Arrow parity engine —
    same public API, same typed output contract."""
    from embulk_util_json_spark.operators.capture import capture_typed
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit('{"a":{"1":'), "props", F.lit(',"c":7}}')).alias("doc"),
    )
    spec = CaptureSpec.compile(["/a/1/k", "/a/c"], ["k", "c"])
    assert spec.requires_parity_engine()  # the shape forces the fallback
    out = capture_typed(ev, "doc", spec, casts={"k": "long", "c": "int"})
    return out.select("event_id", "k", "c")


_ORACLE_CAPTURE_AUTO = """
    SELECT event_id,
           CAST(json_extract(props, '/k') AS BIGINT) AS k,
           7 AS c
    FROM events
"""


def _q_capture_multidoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenated-document stream (reference R1: '{...}{...}' on one
    parser → one value per readJsonValue call): the parity engine
    splits the stream and captures per document, tagging _doc_seq."""
    from embulk_util_json_spark.operators.capture import extract_parity
    from embulk_util_json_spark.plans.capture_spec import CaptureSpec

    ev = _read(spark, sf_dir, "events").select(
        "event_id", F.concat("props", "props").alias("doc")
    )
    spec = CaptureSpec.compile(["/k"], ["k"])
    out = extract_parity(ev, "doc", spec)
    return out.select(
        "event_id", F.col("_doc_seq").cast("int").alias("doc_seq"), "k"
    )


_ORACLE_CAPTURE_MULTIDOC = """
    SELECT event_id, doc_seq, CAST(json_extract(props, '/k') AS VARCHAR) AS k
    FROM events, (SELECT 0 AS doc_seq UNION ALL SELECT 1) docs
"""


def _q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-tree passthrough as Spark 4 VariantType (SURVEY §1.4's
    ideal mapping of the reference's JsonValue): PERMISSIVE parse_json
    once, typed sub-field access via variant_get (pushable, no
    re-parse per expression), canonical whole-doc via to_json."""
    from embulk_util_json_spark.functions.variant import (
        to_variant,
        variant_pointer_get,
    )

    ev = _read(spark, sf_dir, "events").select("event_id", "props")
    v = to_variant("props")
    return ev.select(
        "event_id",
        variant_pointer_get(v, "/k", "long").alias("k"),
        F.to_json(v).alias("whole"),
    )


_ORACLE_VARIANT = """
    SELECT event_id,
           CAST(json_extract(props, '/k') AS BIGINT) AS k,
           CAST(json(props) AS VARCHAR) AS whole
    FROM events
"""


def _q_capture_root_multimatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-match root re-pointing (R2 multi-match,
    TestJsonParser.java:169-178): even event_ids carry a duplicate 'm'
    key (two matches per document), odd a single one. The hybrid
    root_typed_multi keeps single-match rows on the get_json_object
    fast path and routes only duplicate-key rows through the parity
    engine."""
    from embulk_util_json_spark.operators.flatten import root_typed_multi

    k = F.get_json_object("props", "$.k").cast("long")
    ev = (
        _read(spark, sf_dir, "events")
        .withColumn("_k", k)
        .filter(F.col("_k").isNotNull())
    )
    dup = F.concat(
        F.lit('{"m":{"v":'), F.col("_k").cast("string"),
        F.lit('},"m":{"v":'), (F.col("_k") + 1).cast("string"), F.lit("}}"),
    )
    single = F.concat(
        F.lit('{"m":{"v":'), F.col("_k").cast("string"), F.lit("}}")
    )
    docs = ev.select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, dup).otherwise(single).alias("doc"),
    )
    return root_typed_multi(docs, "doc", "/m").select("event_id", "doc")


_ORACLE_ROOT_MULTIMATCH = """
    WITH k AS (
        SELECT event_id, CAST(json_extract(props, '/k') AS BIGINT) AS k
        FROM events
        WHERE json_extract(props, '/k') IS NOT NULL
    )
    SELECT event_id, '{"v":' || CAST(k AS VARCHAR) || '}' AS doc FROM k
    UNION ALL
    SELECT event_id, '{"v":' || CAST(k + 1 AS VARCHAR) || '}' AS doc
    FROM k WHERE event_id % 2 = 0
"""


__all__ = [
    "_q_lww_latest_event_per_user",
    "_ORACLE_LWW_LATEST",
    "_q_capture_pointers_parity",
    "_ORACLE_CAPTURE_PARITY",
    "_q_capture_typed_members",
    "_ORACLE_CAPTURE_TYPED",
    "_q_flatten_capture",
    "_ORACLE_FLATTEN",
    "_q_capture_direct_members",
    "_ORACLE_CAPTURE_DIRECT",
    "_q_capture_with_root",
    "_ORACLE_CAPTURE_ROOT",
    "_q_capture_auto_route",
    "_ORACLE_CAPTURE_AUTO",
    "_q_capture_multidoc",
    "_ORACLE_CAPTURE_MULTIDOC",
    "_q_variant_extract",
    "_ORACLE_VARIANT",
    "_q_capture_root_multimatch",
    "_ORACLE_ROOT_MULTIMATCH",
]
