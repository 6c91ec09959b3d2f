"""Root re-pointing + depth-N array flattening as Catalyst transforms.

The built-in (scale) variants of the reference's source filters
(R2/R3/R4 in SURVEY.md §2.1). Composition order is pinned: root first,
then flatten (JsonValueParser.java:176-195,
TestJsonValueParser.java:147-156).

- ``root_typed``   — single-match root re-pointing via
  ``get_json_object`` (streams inside the JVM; non-matching rows
  become NULL and are dropped, TestJacksonFilter.java:35-53).
  Multiple-match-per-document semantics need the parity engine
  (``operators.capture.extract_parity``).
- ``flatten_typed`` — ``explode(from_json(col, array<string>))``
  applied N times. ``from_json`` to an array type yields NULL for a
  non-array and ``explode`` drops NULL rows — exactly the reference's
  "non-array at flatten depth yields nothing"
  (FlattenJsonArrayFilter.java:41-43,
  TestFlattenJsonArrayFilter.java:88-91). Elements pass through as
  JSON text (array<string> read), so nesting composes.

Both stay entirely inside whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..plans.pointer import split_pointer


def pointer_to_json_path(pointer: str) -> str:
    """JSON Pointer → Spark ``get_json_object`` path (``/a/1/b`` → ``$.a[1].b``).

    Only simple member/index segments are expressible; names containing
    ``.``, ``[``, ``'`` or RFC 6901 escapes need the parity engine.
    """
    parts = ["$"]
    for tok in split_pointer(pointer):
        if tok.isdigit():
            parts.append(f"[{tok}]")
        elif any(ch in tok for ch in ".[]'\"*"):
            raise ValueError(f"segment {tok!r} not expressible as a JSON path")
        else:
            parts.append("." + tok)
    return "".join(parts)


def root_typed(df: DataFrame, doc_col: str, root: str, drop_misses: bool = True) -> DataFrame:
    """Re-root each document at ``root`` (first match).

    NOTE: ``get_json_object`` returns scalar strings *unquoted*; for
    object/array sub-documents (the CDC envelope case) the result is
    valid JSON text. Scalar re-roots that must stay JSON-encoded go
    through the parity engine.
    """
    path = pointer_to_json_path(root)
    out = df.withColumn(doc_col, F.get_json_object(F.col(doc_col), path))
    if drop_misses:
        out = out.filter(F.col(doc_col).isNotNull())
    return out


def flatten_typed(df: DataFrame, doc_col: str, depth: int) -> DataFrame:
    """Flatten top-level JSON arrays to ``depth``; one output row per
    emitted document, document order preserved within each input row."""
    if depth < 1:
        raise ValueError("depth must be >= 1 (FlattenJsonArrayFilter.java:28-30)")
    out = df
    for _ in range(depth):
        out = out.withColumn(
            doc_col,
            F.explode(F.from_json(F.col(doc_col), T.ArrayType(T.StringType()))),
        )
    return out
