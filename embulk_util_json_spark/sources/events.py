"""Change-event envelope parsing (the CDC analogue of the reference's
capture stage).

An event is one JSON document:

    {"op":"insert|update|delete","ts":"<iso8601>",
     "data":{"conv_id":..,"turn_idx":..,"role":..,"text":..,"tool":..,
             ...possibly new fields appearing mid-stream...}}

``parse_change_events`` is the scale path: ONE ``from_json`` with the
full envelope schema (every field is consumed, so Catalyst keeps a
single JVM-side parse per row inside whole-stage codegen — the exact
Spark analogue of the reference's single-pass capture, SURVEY.md §2.1
R5). No Python runs per row.

Schema evolution: unknown ``data`` members are *not* lost — a second
pass over the same parsed text is avoided by capturing ``data`` also
as ``map<string,string>`` in the same from_json schema... which Spark
cannot do in one schema; instead we gate the extras capture behind
``discover_extra_fields`` (an O(batch) aggregate collecting the set of
unseen keys) and only when new keys exist do we add typed columns.
New fields land as string columns (additive; old rows NULL), matching
FIXTURES.md T7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

BASE_DATA_FIELDS: list[tuple[str, T.DataType]] = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
]

KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["ts", "seq"]
EXTRAS_COL = "_extras"


def envelope_schema(extra_fields: list[str] | None = None) -> T.StructType:
    data_fields = [T.StructField(n, t) for n, t in BASE_DATA_FIELDS]
    data_fields += [T.StructField(n, T.StringType()) for n in (extra_fields or [])]
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("data", T.StructType(data_fields)),
        ]
    )


def discover_extra_fields(events: DataFrame, json_col: str = "event_json") -> list[str]:
    """Distinct ``data`` member names beyond the base schema.

    One aggregate over the batch: parse ``data`` as map<string,string>
    (keys only are retained), flatten, distinct. The result is a tiny
    driver-side list (bounded by schema width, not data size), so
    collect() here is safe at any scale.
    """
    base = {n for n, _ in BASE_DATA_FIELDS}
    rows = (
        events.select(
            F.explode(
                F.map_keys(
                    F.from_json(
                        F.get_json_object(F.col(json_col), "$.data"),
                        T.MapType(T.StringType(), T.StringType()),
                    )
                )
            ).alias("k")
        )
        .filter(~F.col("k").isin(*base))
        .distinct()
        .collect()
    )
    return sorted(r.k for r in rows)


TABLE_COL = "_table"


def parse_change_events_single_pass(
    events: DataFrame,
    json_col: str = "event_json",
    seq_col: str = "seq",
    with_table: bool = False,
) -> DataFrame:
    """Single-pass envelope parse for the hot replay path: ONE
    ``from_json`` with ``data`` as ``map<string,string>`` — typed base
    columns are cast out of the map, and unknown members are retained
    in an ``_extras`` map column instead of being discovered by a
    separate pre-pass over the batch. (Spark coerces non-string map
    values to their JSON text, so nothing is lost; nested values stay
    as canonical JSON strings.)

    Schema evolution becomes metadata-only: the sink observes the set
    of extra keys during its write job (an ``observe`` aggregate — no
    additional scan) and declares them in the manifest; ``read()``
    materializes them as string columns. Old rows read NULL. This
    halves the JSON-parse work per batch versus discover-then-parse
    and removes one Spark job per micro-batch.

    ``with_table=True`` additionally extracts the envelope's optional
    top-level ``table`` member into a ``_table`` column (multiplexed
    CDC streams — Debezium-style topic routing; events without it
    read NULL). Same single parse; the extra struct field is free.
    """
    env_fields = [
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
    if with_table:
        env_fields.insert(0, T.StructField("table", T.StringType()))
    schema = T.StructType(env_fields)
    # Two-step projection: materialize the parsed struct under ONE
    # alias, then extract fields from it in a second select. Inlining
    # from_json per output column defeats Catalyst's common-
    # subexpression elimination and re-parses the JSON once per column
    # (measured 3× slower at 2M rows).
    parsed = events.select(
        F.col(seq_col).cast("long").alias("seq"),
        F.from_json(F.col(json_col), schema).alias("_e"),
    )
    base = [n for n, _ in BASE_DATA_FIELDS]
    cols = [
        F.col("_e.op").alias("op"),
        F.to_timestamp(F.col("_e.ts")).alias("ts"),
        F.col("seq"),
    ]
    if with_table:
        cols.insert(0, F.col("_e.table").alias(TABLE_COL))
    for name, dtype in BASE_DATA_FIELDS:
        cols.append(F.col("_e.data")[name].cast(dtype).alias(name))
    cols.append(
        F.map_filter(F.col("_e.data"), lambda k, _v: ~k.isin(*base)).alias(EXTRAS_COL)
    )
    return parsed.select(*cols)


def to_native_json(
    changes: DataFrame,
    table: str | None = None,
) -> DataFrame:
    """Canonical change rows → ``(seq, event_json)`` native envelopes
    — the CDC-OUT exporter closing the wire-format loop: every wire
    writer (``debezium.to_debezium_json`` / ``to_maxwell_json`` /
    ``canal.to_canal_json``) consumes native envelopes, so
    ``read_changes`` → ``to_native_json`` → ``to_<format>_json``
    publishes a table's incremental change feed in any supported
    format, and ``parse_<format>_events`` round-trips it losslessly
    (µs timestamps via a 6-digit fractional-second rendering).

    ``changes``: op, ts, seq + the canonical data fields (extras in
    the ``_extras`` map ride along via ``map_concat``). ``table``
    stamps multi-table envelopes for the routing demux. Pure
    projection — ``to_json`` over a struct, stays in codegen."""
    pairs = []
    for name, _ in BASE_DATA_FIELDS:
        if name in changes.columns:
            pairs += [F.lit(name), F.col(name).cast("string")]
    data = F.create_map(*pairs)
    if EXTRAS_COL in changes.columns:
        data = F.map_concat(data, F.coalesce(
            F.col(EXTRAS_COL), F.create_map().cast("map<string,string>")
        ))
    fields = [
        F.col("op").alias("op"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        data.alias("data"),
    ]
    if table is not None:
        fields.insert(0, F.lit(table).alias("table"))
    return changes.select(
        F.col("seq").cast("long").alias("seq"),
        F.to_json(F.struct(*fields)).alias("event_json"),
    )


def parse_change_events(
    events: DataFrame,
    json_col: str = "event_json",
    seq_col: str = "seq",
    extra_fields: list[str] | None = None,
) -> DataFrame:
    """events(seq, event_json) → typed change rows.

    Output columns: op, ts (timestamp), seq, conv_id, turn_idx, role,
    text, tool [, extra fields as strings]. Malformed envelopes yield
    NULL fields (PERMISSIVE) and can be quarantined by filtering
    ``op IS NULL`` — the reference's row-skippable JsonParseException
    taxonomy (JsonParseException.java:24-43).
    """
    schema = envelope_schema(extra_fields)
    # Two-step projection — see parse_change_events_single_pass: one
    # aliased from_json, field extraction in a second select (single
    # JVM-side parse per row under whole-stage codegen).
    parsed = events.select(
        F.col(seq_col).cast("long").alias("seq"),
        F.from_json(F.col(json_col), schema).alias("_e"),
    )
    cols = [
        F.col("_e.op").alias("op"),
        F.to_timestamp(F.col("_e.ts")).alias("ts"),
        F.col("seq"),
    ]
    for name, _ in BASE_DATA_FIELDS:
        cols.append(F.col("_e.data")[name].alias(name))
    for name in extra_fields or []:
        cols.append(F.col("_e.data")[name].alias(name))
    return parsed.select(*cols)
