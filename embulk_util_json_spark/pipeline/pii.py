"""PII detection and redaction — standard training-data hygiene ops,
pure codegen'd regexp expressions (zero Python in the hot path).

Patterns are deliberately written in the Java-regex ∩ RE2 common
subset (no lookbehind/lookahead, no backreferences) so the DuckDB
oracle applies the *identical* pattern text: the generated ``*_sql``
twins below keep both engines bit-equal, the same discipline as
``pipeline/text.py``.

Scale notes: each op is a single narrow projection over the text
column — pipelined with the scan, no shuffle, no UDF. Counting uses
``regexp_count``; redaction uses ``regexp_replace`` (both whole-stage
codegen). At 100 TB this is the cheapest class of operator in the
pipeline; the only care needed is pattern complexity (all patterns
below are linear-time under RE2 and non-pathological for Java's
backtracker: no nested quantifiers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java ∩ RE2 subset. \b is supported by both (RE2 supports \b ASCII
# word boundaries; DuckDB RE2 build includes it).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# +country? 3-3-4 with common separators; anchored on word boundaries.
PHONE_RE = r"\b(\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"
IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b"
)
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
    "ssn": SSN_RE,
}

REDACTION_TOKEN = "[PII]"


def pii_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII hit counts per category plus a total — the
    filtering signal (drop or quarantine docs above a threshold)."""
    cols: list[Column] = [F.col(id_col)]
    total = None
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("int")
        cols.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.cast("int").alias("n_pii"))
    return df.select(*cols)


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Replace every PII match with ``[PII]``. Order matters: SSN
    before phone (a 3-2-4 SSN is not phone-shaped, but keep the
    substitution chain deterministic and mirrored in SQL); each
    substitution is one codegen'd regexp pass."""
    red = F.col(text_col)
    for name in PII_PATTERNS:  # insertion order, mirrored in the oracle
        red = F.regexp_replace(red, PII_PATTERNS[name], REDACTION_TOKEN)
    return df.select(
        F.col(id_col),
        red.alias("redacted"),
        (F.length(text_col) - F.length(red)).cast("int").alias("chars_removed"),
    )


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def pii_counts_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB oracle — identical pattern constants."""
    cols = [id_col]
    parts = []
    for name, pat in PII_PATTERNS.items():
        expr = (
            f"CAST(length(regexp_extract_all({text_col}, "
            f"'{_sql_quote(pat)}')) AS INTEGER)"
        )
        cols.append(f"{expr} AS n_{name}")
        parts.append(expr)
    cols.append("CAST(" + " + ".join(parts) + " AS INTEGER) AS n_pii")
    return f"SELECT {', '.join(cols)} FROM {table}"


def redact_pii_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB oracle — same substitution chain, global flag."""
    red = text_col
    for name in PII_PATTERNS:
        red = (
            f"regexp_replace({red}, '{_sql_quote(PII_PATTERNS[name])}', "
            f"'{REDACTION_TOKEN}', 'g')"
        )
    return f"""
        SELECT {id_col}, {red} AS redacted,
               CAST(length({text_col}) - length({red}) AS INTEGER)
                   AS chars_removed
        FROM {table}
    """
