"""Root re-pointing + depth-N array flattening as Catalyst transforms.

The built-in (scale) variants of the reference's source filters
(R2/R3/R4 in SURVEY.md §2.1). Composition order is pinned: root first,
then flatten (JsonValueParser.java:176-195,
TestJsonValueParser.java:147-156).

- ``root_typed``   — single-match root re-pointing via
  ``get_json_object`` (streams inside the JVM; non-matching rows
  become NULL and are dropped, TestJacksonFilter.java:35-53).
- ``root_typed_multi`` — full multiple-match semantics (duplicate
  keys) at JVM speed for the common case: a codegen'd duplicate-key
  detector routes only degenerate rows to the parity engine.
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


def root_typed_multi(df: DataFrame, doc_col: str, root: str) -> DataFrame:
    """Root re-pointing with full multiple-match semantics
    (JsonValueParser.java:183, TestJsonParser.java:169-178: duplicate
    object keys along the pointer path each yield a match), without
    paying the Python parity engine on every row.

    Spark's JSON built-ins cannot observe duplicate keys at all
    (Jackson map semantics: last wins), so true multi-match is
    JVM-inexpressible. Hybrid plan instead:

    - a codegen'd detector counts textual occurrences of each pointer
      segment as an object key (``"seg"\\s*:`` via ``regexp_count``).
      A document can only multi-match if some segment key appears ≥2
      times, so count ≤ 1 ⇒ the ``get_json_object`` fast path is
      exact. The detector may over-trigger (same-named keys at other
      depths, quoted text lookalikes) — that only routes extra rows to
      the slow path, never drops a match;
    - flagged rows (rare: duplicate keys are tolerated-but-degenerate
      JSON) run the Arrow parity engine's ``repoint``, emitting one
      row per match, then rejoin via union.

    At 100 TB the detector is one vectorized regexp per segment inside
    the scan stage; the Python stage sees only the degenerate rows.
    Output contract matches ``root_typed`` (typed text, misses
    dropped, malformed dropped)."""
    from ..plans.capture_spec import CaptureSpec
    from .capture import extract_parity

    tokens = split_pointer(root)
    if not tokens:
        # '/' re-roots at the whole document: exactly one match per
        # doc, multi-match impossible — the fast path is exact for
        # every row (previously cond stayed None and filter(~None)
        # raised TypeError).
        return root_typed(df, doc_col, root)
    name_keys = list(dict.fromkeys(tokens))  # digit keys can duplicate too
    cond = None
    for tok in name_keys:
        # \Q..\E: literal-quote the segment inside the Java regex
        pat = '"\\Q' + tok + '\\E"\\s*:'
        c = F.regexp_count(F.col(doc_col), F.lit(pat)) >= 2
        cond = c if cond is None else (cond | c)
    # A key spelled WITH a JSON escape (e.g. "seg" for "seg") is
    # invisible to the literal counters above, so a disguised
    # duplicate would ride the fast path and its extra matches would
    # be dropped. Route any row containing an escape-bearing quoted
    # string immediately followed by ':' (i.e. an escaped KEY —
    # values can't precede a colon in well-formed JSON) to the parity
    # engine, which matches on DECODED key names. Over-triggers only
    # (escaped keys are rare; extra rows just take the slow path).
    escaped_key = (
        F.regexp_count(
            F.col(doc_col),
            F.lit(r'"(?:[^"\\]|\\.)*\\(?:[^"\\]|\\.)*"\s*:'),
        )
        >= 1
    )
    cond = cond | escaped_key
    fast = root_typed(df.filter(~cond), doc_col, root)

    spec = CaptureSpec.compile([], ["_rooted"])
    slow = extract_parity(
        df.filter(cond), doc_col, spec, root=root, errors="skip"
    )
    # parity cells are canonical JSON; convert to the typed (unquoted
    # scalar / raw JSON container) representation JVM-side. JSON null
    # at the root is dropped, mirroring the fast path's drop_misses
    # (get_json_object yields SQL NULL for it).
    typed_cell = F.from_json(
        F.concat(F.lit("["), F.col("_rooted"), F.lit("]")), "array<string>"
    ).getItem(0)
    out_cols = [
        typed_cell.alias(c) if c == doc_col else F.col(c) for c in df.columns
    ]
    slow_out = slow.select(*out_cols).filter(F.col(doc_col).isNotNull())
    return fast.unionByName(slow_out)


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
