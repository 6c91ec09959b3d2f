"""Dynamic-tree JSON as Spark 4 VariantType, plus sample-based schema
inference.

SURVEY.md §1.4 names VariantType as the ideal Spark mapping of the
reference's dynamic ``JsonValue`` tree (``JsonValueParser.java`` hands
back untyped values; columns are carved out by pointer capture).
Variant is the engine-native version of the same idea: a binary-encoded
dynamic value with typed sub-field access (``variant_get``) that
Catalyst can push into the scan — at 100 TB this beats re-parsing JSON
text per query, and Parquet shredding keeps hot fields columnar.

Semantics notes (vs the parity engine):

- ``try_parse_json`` is PERMISSIVE: malformed input → SQL NULL,
  mirroring the row-skippable ``JsonParseException``
  (JsonParseException.java:24-43). ``parse_json`` is the FAILFAST twin.
- Variant objects canonicalize with **sorted keys** and last-wins
  duplicates — canonical-JSON comparisons against insertion-ordered
  engines must account for that (the parity engine preserves document
  order and duplicate keys; use it when those distinctions matter).
- ``infer_json_schema`` is the batch-source analogue of the
  reference's "guess" flow (embulk's guess plugins sample the head of
  the stream): infer a typed schema from a bounded sample, then apply
  it with one pruned ``from_json`` at full scale. The sample collect
  is driver-side by design — metadata-sized, never the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..plans.pointer import split_pointer


def to_variant(doc: Column | str, permissive: bool = True) -> Column:
    """Parse a JSON text column into a VariantType column.

    PERMISSIVE (default): malformed → NULL; FAILFAST: raise."""
    c = F.col(doc) if isinstance(doc, str) else doc
    return F.try_parse_json(c) if permissive else F.parse_json(c)


def variant_pointer_get(v: Column, pointer: str, sql_type: str = "variant") -> Column:
    """``variant_get`` addressed by JSON Pointer instead of JSON path
    (the engine's pointer dialect everywhere — RFC 6901, ``~0``/``~1``
    escapes validated by ``split_pointer``)."""
    parts = ["$"]
    for tok in split_pointer(pointer):
        if tok.isdigit():
            parts.append(f"[{tok}]")
        else:
            parts.append("." + tok)
    return F.variant_get(v, "".join(parts), sql_type)


def variant_schema(v: Column) -> Column:
    """Per-row merged schema string of a variant column
    (``schema_of_variant``) — the observability hook for drift
    detection on a dynamic stream."""
    return F.schema_of_variant(v)


def infer_json_schema(
    spark: SparkSession,
    df: DataFrame,
    doc_col: str,
    sample_rows: int = 1000,
) -> T.StructType:
    """Infer a typed schema for a JSON text column from a bounded
    sample, via Spark's own JSON reader (the same inference
    ``spark.read.json`` applies to files). Use the result as the
    ``from_json`` schema for the full-scale pass::

        schema = infer_json_schema(spark, df, "doc")
        typed = df.withColumn("v", F.from_json("doc", schema))

    The ``limit(sample_rows)`` collect is driver-side metadata work
    (embulk guess samples a buffer head the same way); the inferred
    schema then runs distributed.
    """
    sample = [
        r[0]
        for r in df.select(doc_col).filter(F.col(doc_col).isNotNull())
        .limit(sample_rows).collect()
    ]
    if not sample:
        return T.StructType([])
    reader_df = spark.read.json(spark.sparkContext.parallelize(sample, 1))
    fields = [f for f in reader_df.schema.fields if not f.name.startswith("_corrupt")]
    return T.StructType(fields)
