"""Text analysis operators: token counting, quality scoring,
language ID, document fingerprinting.

Everything here is pure ``pyspark.sql.functions`` (whole-stage
codegen; no Python on the hot path) and arithmetic is constructed to
be bit-reproducible in ANSI SQL (DuckDB oracle): integer counts,
IEEE-exact divisions of exact integers, and away-from-zero rounding —
so the driver's value-hash comparison holds exactly.

Scale notes (100 TB): every operator is a narrow per-row projection —
no shuffle, no UDF, fully pipelined with the parquet scan; column
pruning reaches the reader (only ``text`` + id are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Shared constants — the DuckDB oracle SQL is generated from these so
# engine and oracle can never drift.
HASH_PRIME = 2147483647  # 2^31 - 1, keeps rolling-hash state < 2^31
TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"  # BPE-ish pre-tokenizer split

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr": ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "ce"),
}
CJK_RE = "[\\u4e00-\\u9fff]"  # Java regex (Spark)
CJK_RE_SQL = "[\\x{4e00}-\\x{9fff}]"  # RE2 (DuckDB)
LANG_ORDER = ("de", "en", "es", "fr")  # tie-break: first strictly-max wins


WORD_RE = "\\S+"


def _n_words(text: Column) -> Column:
    """Whitespace-token count as ONE codegen'd regexp scan — array
    higher-order functions (split + filter) run interpreted
    (CodegenFallback), so counting via `\\S+` is both faster and
    engine-portable (DuckDB: len(regexp_extract_all))."""
    return F.regexp_count(text, F.lit(WORD_RE))


def _stop_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of any stopword, with multiplicity, as ONE regexp
    alternation scan over the lowercased text (word-boundary
    anchored)."""
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def token_stats(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Per-document token statistics: char count, whitespace-token
    count, and a BPE-ish regex token count (letters-run | digit |
    punctuation, the classic GPT-2 pre-tokenizer shape)."""
    t = F.col(text_col)
    return df.select(
        *id_cols,
        F.length(t).alias("n_chars"),
        _n_words(t).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Heuristic document-quality score in [0,1]: length saturation,
    word-count saturation, stopword ratio, alphabetic ratio. All four
    terms are ratios of exact integers → the weighted sum is IEEE-
    deterministic; rounded to 6 dp for stable comparison."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = _n_words(t)
    stop_hits = _stop_hits(t, STOPWORDS["en"])
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * word_score
        + F.lit(0.2) * stop_ratio
        + F.lit(0.2) * alpha_ratio
    )
    return df.select(
        *id_cols,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """N-gram/stopword language ID heuristic: per-language stopword
    hit counts over lowercased whitespace tokens, plus a CJK-script
    character count (weight 2) for zh. Prediction = first language in
    (zh, then LANG_ORDER) whose score is strictly greater than all
    later ones; all-zero → 'und'."""
    t = F.col(text_col)
    scores = {lang: _stop_hits(t, STOPWORDS[lang]).cast("long") for lang in LANG_ORDER}
    scores["zh"] = F.size(F.regexp_extract_all(t, F.lit(CJK_RE), 0)) * F.lit(2)

    ordered = ["zh", *LANG_ORDER]
    best = F.greatest(*[scores[l] for l in ordered])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in ordered:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(
        *id_cols,
        pred.alias("lang_pred"),
        best.cast("int").alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash
    (base 31, mod 2^31-1) over the character codes of the normalized
    text (lowercased, whitespace collapsed). Pure codegen — the
    per-char loop is a Catalyst ``aggregate`` over ``split``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    codes = F.transform(F.split(norm, ""), lambda c: F.ascii(c).cast("long"))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % HASH_PRIME,
    )
    return df.select(*id_cols, fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Oracle-SQL generators (DuckDB) — same constants, same arithmetic.
# ---------------------------------------------------------------------------


def _sql_n_words(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{WORD_RE}'))"


def _sql_stop_hits(text: str, words: tuple[str, ...]) -> str:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return f"len(regexp_extract_all(lower({text}), '{pat}'))"


def token_stats_sql(table: str, text_col: str, id_cols: list[str]) -> str:
    ids = ", ".join(id_cols)
    return f"""
        SELECT {ids},
               CAST(length({text_col}) AS INTEGER) AS n_chars,
               CAST({_sql_n_words(text_col)} AS INTEGER) AS n_words,
               CAST(len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS INTEGER) AS n_tokens
        FROM {table}
    """


def quality_score_sql(table: str, text_col: str, id_cols: list[str]) -> str:
    ids = ", ".join(id_cols)
    return f"""
        WITH base AS (
            SELECT {ids},
                   CAST(length({text_col}) AS BIGINT) AS n_chars,
                   CAST({_sql_n_words(text_col)} AS BIGINT) AS n_words,
                   CAST({_sql_stop_hits(text_col, STOPWORDS["en"])} AS BIGINT) AS stop_hits,
                   CAST(length(regexp_replace({text_col}, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha
            FROM {table}
        )
        SELECT {ids},
               CAST(n_chars AS INTEGER) AS n_chars,
               CAST(n_words AS INTEGER) AS n_words,
               ROUND(
                   0.3 * LEAST(n_chars / 500.0, 1.0)
                 + 0.3 * LEAST(n_words / 100.0, 1.0)
                 + 0.2 * (CASE WHEN n_words > 0 THEN stop_hits / CAST(n_words AS DOUBLE) ELSE 0.0 END)
                 + 0.2 * (CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END),
               6) AS quality
        FROM base
    """


def lang_id_sql(table: str, text_col: str, id_cols: list[str]) -> str:
    ids = ", ".join(id_cols)
    hit_exprs = {
        lang: f"CAST({_sql_stop_hits(text_col, STOPWORDS[lang])} AS BIGINT)"
        for lang in LANG_ORDER
    }
    hit_exprs = {"zh": f"CAST(2 * len(regexp_extract_all({text_col}, '{CJK_RE_SQL}')) AS BIGINT)", **hit_exprs}
    ordered = ["zh", *LANG_ORDER]
    score_cols = ",\n".join(f"{hit_exprs[l]} AS s_{l}" for l in ordered)
    best = "GREATEST(" + ", ".join(f"s_{l}" for l in ordered) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in ordered
    ) + " END"
    return f"""
        WITH scored AS (SELECT {ids}, {score_cols} FROM {table})
        SELECT {ids}, {case} AS lang_pred, CAST({best} AS INTEGER) AS lang_score
        FROM scored
    """


def fingerprint_sql(table: str, text_col: str, id_cols: list[str]) -> str:
    ids = ", ".join(id_cols)
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"""
        SELECT {ids},
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split({norm}, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % {HASH_PRIME}
               ) AS fingerprint
        FROM {table}
    """
