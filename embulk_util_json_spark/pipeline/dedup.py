"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash — the standard near-duplicate stack of a training-data
pipeline, built Spark-first:

- all hashing is md5-based (bit-stable across engines → DuckDB oracle
  can reproduce it exactly; unlike xxhash64, md5 exists in both);
- shingling/minhashing are Catalyst higher-order functions over the
  token array (whole-stage codegen, zero Python);
- candidate generation is a *bucket equi-join* (LSH bands / SimHash
  bands), never an all-pairs cross join — the O(n²) step is confined
  to rows sharing a bucket, which is what makes 100 TB feasible;
- verification (exact Jaccard / Hamming) runs only on candidates.

Scale notes: the band-bucket join shuffles on (band, signature) —
high-cardinality keys, no skew concentration; AQE handles residual
bucket skew. Signatures are computed once per doc (per-row projection
pipelined with the scan).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

HASH_PRIME = 2147483647  # 2^31 - 1

# Persisted intermediates (shared shingle/gram frames) registered here
# so long-lived sessions can reclaim executor storage: the returned
# pair/cluster plans still REFERENCE the caches lazily, so the
# operators themselves can't unpersist before the caller materializes.
# Call :func:`release_caches` after materializing results (bench.py
# does, per query); unreleased frames are harmless in short-lived jobs.
_LIVE_CACHES: list[DataFrame] = []


def _persist_tracked(frame: DataFrame, eager: bool = True) -> DataFrame:
    """persist + register for :func:`release_caches`. ``eager``
    materializes immediately — a lazy persist lets downstream consumer
    stages launch concurrently, each recomputing the plan while racing
    to populate the cache (pure overhead on the shared-shingle paths)."""
    frame = frame.persist()
    if eager:
        frame.count()
    _LIVE_CACHES.append(frame)
    return frame


def release_caches() -> int:
    """Unpersist every intermediate this module cached since the last
    release; returns how many were freed. Safe to call at any time —
    an un-materialized consumer just recomputes."""
    n = 0
    while _LIVE_CACHES:
        frame = _LIVE_CACHES.pop()
        try:
            frame.unpersist()
            n += 1
        except Exception:
            pass
    return n


def norm_text(text: Column) -> Column:
    """Canonical text: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def _md5_32(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative long — the portable
    shingle/word hash (same value from DuckDB's md5)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def _md5_60(c: Column) -> Column:
    """First 60 bits of md5 as a long — join-key hash for shingles
    (8-byte keys shuffle/join ~3× cheaper than 30-char strings;
    collision odds at 60 bits are negligible, and the DuckDB oracle
    applies the identical hash so the gate stays exact)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _shingle_array(text: Column, n: int) -> Column:
    """Distinct word n-grams of the normalized text, as strings.

    NOTE: array higher-order functions are CodegenFallback
    (interpreted); prefer ``_gram_rows`` (posexplode + window lead,
    fully codegen'd) on hot paths — it produces the same grams."""
    words = F.split(norm_text(text), " ")
    k = F.size(words) - (n - 1)
    grams = F.when(k > 0, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def _gram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, gram) word n-grams as ROWS — the codegen'd shingle path:
    posexplode the words, window-lead the next n-1 words per document,
    concat. Same gram strings as ``_shingle_array``. ``distinct=False``
    keeps every occurrence (repetition statistics need multiplicity)."""
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(norm_text(F.col(text_col)), " ")).alias("_pos", "_w"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_w")] + [F.lead("_w", j).over(w) for j in range(1, n)]
    grams = words.select(
        F.col(id_col),
        F.when(
            parts[-1].isNotNull(), F.concat_ws(" ", *parts)
        ).alias("gram"),
    )
    grams = grams.filter(F.col("gram").isNotNull())
    return grams.distinct() if distinct else grams


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate grouping on md5 of normalized text. Returns one
    row per document with its group's canonical (min) id and size.

    Plan: one hash-shuffle on the 128-bit fingerprint (uniform keys,
    map-side partial agg) + a broadcast-back join is avoided by
    computing group stats with a window-free self-agg-join on fp.
    """
    fp = df.select(
        F.col(id_col), F.md5(norm_text(F.col(text_col))).alias("fingerprint")
    )
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return fp.join(groups, "fingerprint").select(
        id_col,
        "fingerprint",
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
        F.col("group_size").cast("int").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact pairwise over shingle-sharing candidates)
# ---------------------------------------------------------------------------


def shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_df_frac: float | None = None,
    _grams: DataFrame | None = None,
) -> DataFrame:
    """(id, shingle) exploded distinct word n-grams, keyed by their
    60-bit md5 hash (see ``_md5_60``).

    ``max_df_frac``: stop-shingle filtering — drop shingles whose
    document frequency exceeds ``ceil(frac × n_docs)``. Ubiquitous
    shingles contribute ~nothing to near-dup discrimination but
    quadratic cost to the inverted-index join (every doc pair sharing
    a stop-shingle becomes a candidate); dropping them is the shingle
    analogue of stopword removal and standard in web-dedup pipelines.
    The DuckDB oracle applies the identical cap.

    ``_grams``: precomputed (preferably persisted) ``_gram_rows``
    output to reuse — the text scan + n-gram explode is the dominant
    cost of every shingle consumer, so callers that need grams more
    than once (signature + df-cap + verify) compute them one time."""
    grams = _grams if _grams is not None else _gram_rows(df, text_col, id_col, n)
    sh = grams.select(F.col(id_col), _md5_60(F.col("gram")).alias("shingle"))
    if max_df_frac is None:
        return sh
    # sh feeds both the df-frequency pass and the filtered join below —
    # persist eagerly (see _persist_tracked) and register for release.
    sh = _persist_tracked(sh)
    n_docs = df.select(id_col).distinct().count()
    cap = math.ceil(max_df_frac * n_docs)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    keep = F.broadcast(dfreq.filter(F.col("_df") <= cap).select("shingle"))
    return sh.join(keep, "shingle").select(id_col, "shingle")


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1
    shingle, filtered to ≥ threshold. The self-join runs on the
    shingle key (inverted index), so only genuinely-overlapping pairs
    are ever materialized — not an all-pairs product. With
    ``max_df_frac``, Jaccard is over the stop-shingle-filtered sets
    (see ``shingles``)."""
    # sh is consumed three times (sizes agg + both sides of the
    # inverted-index self-join): persist eagerly so the explode +
    # df-cap join run once; registered for release_caches().
    sh = _persist_tracked(shingles(df, text_col, id_col, n, max_df_frac))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", F.col("common").cast("int").alias("common"), "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash function: h_j(x) = (a_j*x + b_j)
    mod P. a odd → bijective mod 2^32 inputs; values small enough that
    a*x + b < 2^63 for x < 2^32."""
    return [(2 * j + 1, (j * j * 12345 + 6789) % HASH_PRIME) for j in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    _grams: DataFrame | None = None,
) -> DataFrame:
    """Width-K MinHash signature per document as array<long>, computed
    in one codegen'd projection (no explode/shuffle): for each hash j,
    min over the doc's shingle hashes of (a_j*x+b_j) mod P. Empty
    shingle set → NULL signature. ``_grams`` reuses precomputed
    ``_gram_rows`` output (see ``shingles``)."""
    # Codegen'd path: exploded gram rows → ONE hash aggregation with K
    # min() expressions (map-side partial combine). Array higher-order
    # functions would run interpreted (CodegenFallback) and re-hash
    # every shingle K times. Docs with no shingles (< n words) simply
    # have no rows → restored as NULL signature via left join.
    grams = _grams if _grams is not None else _gram_rows(df, text_col, id_col, n)
    xs = grams.select(F.col(id_col), _md5_32(F.col("gram")).alias("_x"))
    x = F.col("_x")
    sigs = xs.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * x + F.lit(b)) % HASH_PRIME).alias(f"_mh{j}")
            for j, (a, b) in enumerate(_minhash_params(num_hashes))
        ]
    )
    sig = F.array(*[F.col(f"_mh{j}") for j in range(num_hashes)])
    sigs = sigs.select(F.col(id_col), sig.alias("minhash"))
    return df.select(id_col).distinct().join(sigs, id_col, "left")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float | None = 0.5,
    max_df_frac: float | None = None,
) -> DataFrame:
    """LSH candidate pairs: split the K-wide signature into `bands`
    bands of K/bands rows; docs agreeing on ANY full band are
    candidates (bucket equi-join on (band_idx, band_signature)).
    With verify_threshold, candidates are verified with exact n-gram
    Jaccard and filtered; output (id_a, id_b, jaccard).
    """
    rows_per_band = num_hashes // bands
    # ONE gram explode shared by the signature pass and (when
    # verifying) the shingle inverted index — previously computed up
    # to three times. Persisted (lazily: the signature aggregation is
    # the first and dominant consumer, so there is no concurrent-stage
    # race to warm it) and registered for release_caches().
    grams = _persist_tracked(_gram_rows(df, text_col, id_col, n), eager=False)
    sigs = minhash_signatures(
        df, text_col, id_col, n, num_hashes, _grams=grams
    ).filter(F.col("minhash").isNotNull())
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("minhash")[bi * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bsig"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bsig")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bsig") == F.col("b.bsig")),
        )
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Exact-Jaccard verification restricted to the LSH candidates:
    # broadcast the (small) candidate set into the shingle inverted
    # index instead of materializing Jaccard for every shingle-sharing
    # pair in the corpus (which is quadratic in hot shingles).
    # max_df_frac additionally drops stop-shingles from the verify
    # space (signatures keep the full set — recall side untouched).
    # Eager (was lazy with no materializing count — inconsistent with
    # the rationale above) and release-tracked. Note shingles() itself
    # caches its inner pre-df-cap frame when max_df_frac is set; both
    # registrations free on the same release_caches() call.
    sh = _persist_tracked(
        shingles(df, text_col, id_col, n, max_df_frac, _grams=grams)
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    common = (
        F.broadcast(cand)
        .join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash over word hashes: bit p of the signature is
    1 iff sum over words of (+1 if word-hash bit p else -1) > 0.
    One codegen'd projection; duplicate words count once (distinct),
    making the signature a pure set function like the minhash path.

    ``bits`` ≤ 60: the portable md5-prefix hash yields 60 usable bits
    (and bit 63 of a signed long can't be set by a positive literal).
    Wider signatures matter at scale — band-bucket width is
    2^(bits/bands), and candidate volume is quadratic in bucket
    occupancy (see ``simhash_pairs``)."""
    if bits > 60:
        raise ValueError("simhash supports at most 60 bits (md5-prefix hash)")
    # Codegen'd path: exploded distinct words → ONE hash aggregation
    # with `bits` sum() vote expressions; the signature is assembled
    # from the votes in a follow-up projection. (Array HOFs would run
    # interpreted — CodegenFallback — and re-hash per bit position.)
    word_hash = _md5_32 if bits <= 32 else _md5_60
    words = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(norm_text(F.col(text_col)), " "))
        ).alias("_w"),
    ).select(F.col(id_col), word_hash(F.col("_w")).alias("_h"))
    h = F.col("_h")
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, p).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{p}")
            for p in range(bits)
        ]
    )
    sig = None
    for p in range(bits):
        term = (
            F.when(F.col(f"_v{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        )
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into `bands`
    contiguous bit-bands; by pigeonhole any pair with Hamming
    distance < bands shares a band → bucket equi-join on (band, band
    bits), then exact Hamming (bit_count of xor) filter.

    Scale note: candidate volume per band ≈ n²/2^(bits/bands) — at
    60k docs, 32/4 (8-bit bands, 256 buckets) materializes ~28M
    candidate pairs while 60/4 (15-bit bands, 32768 buckets) is ~220k;
    prefer the widest signature the hash supports (60)."""
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sigs = simhash(df, text_col, id_col, bits)
    banded = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.bkey")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")),
        )
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Repetition + benchmark contamination (n-gram machinery reuse)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Within-document repetition: total vs distinct word n-grams and
    their ratio — the standard boilerplate/loop detector (low distinct
    ratio ⇒ repeated blocks; used as a drop filter alongside quality
    scores). One shuffle (count + count-distinct per doc, map-side
    partial); docs with < n words report 0/0 and NULL ratio."""
    grams = _gram_rows(df, text_col, id_col, n, distinct=False)
    counts = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_grams"),
        F.countDistinct("gram").cast("int").alias("n_distinct"),
    )
    out = df.select(id_col).distinct().join(counts, id_col, "left")
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0))
    n_distinct = F.coalesce(F.col("n_distinct"), F.lit(0))
    return out.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.when(
            n_grams > 0, F.round(n_distinct / n_grams.cast("double"), 6)
        ).alias("distinct_ratio"),
    )


def top_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus-level n-gram frequency table, top-k: total occurrences
    and document frequency per gram — the vocabulary/boilerplate
    profile of a corpus (the high-DF grams are what stop-shingle caps
    and boilerplate filters key on).

    Plan: one gram explode, ONE hash aggregation keyed by gram
    (map-side combined count + count-distinct), then a global top-k
    via TakeOrdered (orderBy+limit — no full sort materializes).
    (gram, n_occurrences, n_docs) with the (count desc, gram asc)
    total order making the k-boundary deterministic."""
    grams = _gram_rows(df, text_col, id_col, n, distinct=False)
    agg = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    return agg.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)


def top_ngrams_sql(
    table: str, text_col: str, id_col: str, n: int = 3, k: int = 20
) -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        WITH g AS (
            SELECT {id_col}, {gram} AS gram
            FROM (SELECT {id_col}, string_split({_sql_norm(text_col)}, ' ') AS w
                  FROM {table}),
                 UNNEST(range(1, len(w) - {n - 2})) AS t(i)
        ),
        c AS (
            SELECT gram, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT {id_col}) AS n_docs
            FROM g GROUP BY gram
        )
        SELECT gram, n_occurrences, n_docs
        FROM c ORDER BY n_occurrences DESC, gram ASC LIMIT {k}
    """


def benchmark_contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: fraction of each document's
    distinct n-gram shingles that appear anywhere in the benchmark
    corpus ``bench`` (same text column) — the decontamination gate a
    training pipeline runs against eval sets before training.

    Plan: the benchmark shingle set is distinct-reduced and
    broadcast (eval suites are tiny next to the corpus — exactly the
    broadcast-dim shape); the corpus side is one shingle explode +
    one per-doc aggregation. No shuffle touches the benchmark side.
    """
    doc_sh = shingles(df, text_col, id_col, n)
    bench_sh = F.broadcast(
        _gram_rows(bench, text_col, id_col, n)
        .select(_md5_60(F.col("gram")).alias("shingle"))
        .distinct()
    )
    hits = (
        doc_sh.join(bench_sh.withColumn("_hit", F.lit(1)), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias("n_contaminated"),
        )
    )
    return hits.select(
        F.col(id_col),
        "n_shingles",
        "n_contaminated",
        F.round(
            F.col("n_contaminated") / F.col("n_shingles").cast("double"), 6
        ).alias("contaminated_frac"),
    )


def repetition_stats_sql(table: str, text_col: str, id_col: str, n: int = 3) -> str:
    """DuckDB oracle: same gram construction WITHOUT distinct."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        WITH g AS (
            SELECT {id_col}, {gram} AS gram
            FROM (SELECT {id_col}, string_split({_sql_norm(text_col)}, ' ') AS w
                  FROM {table}),
                 UNNEST(range(1, len(w) - {n - 2})) AS t(i)
        ),
        c AS (
            SELECT {id_col}, CAST(COUNT(*) AS INTEGER) AS n_grams,
                   CAST(COUNT(DISTINCT gram) AS INTEGER) AS n_distinct
            FROM g GROUP BY {id_col}
        )
        SELECT d.{id_col},
               COALESCE(c.n_grams, 0) AS n_grams,
               COALESCE(c.n_distinct, 0) AS n_distinct,
               CASE WHEN COALESCE(c.n_grams, 0) > 0
                    THEN ROUND(c.n_distinct / CAST(c.n_grams AS DOUBLE), 6)
               END AS distinct_ratio
        FROM (SELECT DISTINCT {id_col} FROM {table}) d
        LEFT JOIN c USING ({id_col})
    """


def benchmark_contamination_sql(
    table: str, bench_table: str, text_col: str, id_col: str, n: int = 3
) -> str:
    """DuckDB oracle; ``bench_table`` may be any parenthesized query
    with the same (id, text) columns."""
    return f"""
        WITH doc_sh AS ({_sql_shingles(table, text_col, id_col, n)}),
        bench_sh AS (
            SELECT DISTINCT shingle
            FROM ({_sql_shingles(bench_table, text_col, id_col, n)})
        )
        SELECT d.{id_col},
               CAST(COUNT(*) AS INTEGER) AS n_shingles,
               CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS INTEGER) AS n_contaminated,
               ROUND(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS contaminated_frac
        FROM doc_sh d LEFT JOIN bench_sh b USING (shingle)
        GROUP BY d.{id_col}
    """


# ---------------------------------------------------------------------------
# Cluster assignment (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def cc_alternating_star(
    pairs: DataFrame, max_iters: int = 20
) -> tuple[DataFrame, int]:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    the edge set itself is rewritten each round until it is a forest
    of stars whose centers are the component minima. Converges in
    O(log² n) rounds vs min-label propagation's O(diameter) — on
    chainy components (transcript near-dup chains: A≈B≈C≈…) the
    round count, and with it the shuffle count, collapses.

    Returns ``(star, rounds)``: ``star`` is (node, root) for every
    non-root node of a component (roots/isolated nodes are absent —
    they label themselves), ``rounds`` is the number of
    large+small-star rounds executed.

    Iteration hygiene: each round's edge set is ``localCheckpoint``ed
    (materialize + lineage truncation — without it round k replays
    rounds 1..k-1 and the plan grows without bound); convergence is
    an EXACT check (count equality + empty set difference), both jobs
    over star-sized frames."""
    e = (
        pairs.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias("u"),
            F.least(F.col("id_a"), F.col("id_b")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_prev = e.count()
    rounds = 0
    converged = n_prev == 0
    for _ in range(max_iters):
        if converged:
            break
        rounds += 1
        # large-star: each node u connects its LARGER neighbors to
        # m(u) = min(Γ(u) ∪ {u}); output is canonical (big, small)
        # because b > a ≥ m.
        nbrs = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        mins = nbrs.groupBy("a").agg(F.min("b").alias("mb")).select(
            "a", F.least(F.col("mb"), F.col("a")).alias("m")
        )
        large = (
            nbrs.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the (big → small) edges: each node u re-points
        # its smaller neighbors (and itself) at its minimum neighbor.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        n_new = small.count()
        if n_new == n_prev and small.subtract(e).limit(1).count() == 0:
            converged = True
        e = small
        n_prev = n_new
    if not converged:
        import warnings

        warnings.warn(
            f"cc_alternating_star: did not converge in {max_iters} "
            "rounds; labels may be incomplete",
            RuntimeWarning,
            stacklevel=2,
        )
    return e, rounds


def cc_min_label(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iters: int = 20
) -> tuple[DataFrame, int]:
    """Legacy min-label propagation (kept as the O(diameter)
    reference; ``cc_alternating_star`` is the default). Each round,
    every node takes the min of its own and its neighbors' labels.
    Returns ``(labels(node, label), rounds)``.

    Iteration hygiene (the 100×-scale essentials): ``edges`` — whose
    lineage contains the expensive LSH/verify pair job — is persisted
    and materialized ONCE before the loop, and every round's labels
    are ``localCheckpoint``ed (cache + lineage truncation; without it
    round k recomputes rounds 1..k-1)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    edges.count()  # materialize: run the pair job exactly once
    labels = df.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neighbor_labels = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        import warnings

        warnings.warn(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_iters} iterations; labels may be incomplete for "
            f"components with diameter > {max_iters}",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels, rounds


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iters: int = 20,
    algorithm: str = "alternating_star",
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every
    document gets ``cluster_id`` = the minimum doc id reachable through
    pair edges (the canonical "keep one per cluster" dedup step).

    ``algorithm``: ``"alternating_star"`` (default — O(log² n)
    rounds, see :func:`cc_alternating_star`) or ``"min_label"``
    (O(diameter) reference, :func:`cc_min_label`). Identical labels
    either way; the pair job inside ``pairs``' lineage runs once in
    both (materialized before iterating)."""
    if algorithm == "alternating_star":
        star, _rounds = cc_alternating_star(pairs, max_iters)
        return (
            df.select(F.col(id_col).alias("node"))
            .join(
                star.select(F.col("u").alias("node"), F.col("v").alias("label")),
                "node",
                "left",
            )
            .select(
                F.col("node").alias(id_col),
                F.coalesce(F.col("label"), F.col("node")).alias("cluster_id"),
            )
        )
    if algorithm != "min_label":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    labels, _rounds = cc_min_label(df, pairs, id_col, max_iters)
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def dup_clusters_sql(table: str, id_col: str, pairs_sql: str) -> str:
    """DuckDB oracle: transitive min-label via WITH RECURSIVE (set
    semantics UNION terminates the fixpoint), then min per node."""
    return f"""
        WITH RECURSIVE
        pairs AS ({pairs_sql}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach (node, label) AS (
            SELECT {id_col}, {id_col} FROM {table}
            UNION
            SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS {id_col}, MIN(label) AS cluster_id
        FROM reach GROUP BY node
    """


# ---------------------------------------------------------------------------
# Oracle-SQL generators (DuckDB)
# ---------------------------------------------------------------------------


def _sql_norm(text: str) -> str:
    return f"regexp_replace(lower(trim({text})), '\\s+', ' ', 'g')"


def _sql_md5_32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def _sql_shingles(
    table: str,
    text_col: str,
    id_col: str,
    n: int,
    max_df_frac: float | None = None,
    hashed: bool = True,
) -> str:
    """CTE text producing (id, shingle) distinct word n-grams, with the
    same optional stop-shingle df-cap as the Spark side. ``hashed``
    keys shingles by their 60-bit md5 (the Spark join key); pass False
    where the raw gram string is needed (minhash signature hashing)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    key = f"CAST(('0x' || substr(md5({gram}), 1, 15)) AS BIGINT)" if hashed else gram
    base = f"""
        SELECT DISTINCT {id_col}, {key} AS shingle
        FROM (SELECT {id_col}, string_split({_sql_norm(text_col)}, ' ') AS w FROM {table}),
             UNNEST(range(1, len(w) - {n - 2})) AS t(i)
    """
    if max_df_frac is None:
        return base
    return f"""
        SELECT {id_col}, shingle FROM ({base}) sh0
        WHERE shingle IN (
            SELECT shingle FROM ({base}) GROUP BY shingle
            HAVING COUNT(*) <= CAST(CEIL({max_df_frac} *
                (SELECT COUNT(DISTINCT {id_col}) FROM {table})) AS BIGINT)
        )
    """


def exact_dup_groups_sql(table: str, text_col: str, id_col: str) -> str:
    return f"""
        WITH fp AS (
            SELECT {id_col}, md5({_sql_norm(text_col)}) AS fingerprint FROM {table}
        ),
        g AS (
            SELECT fingerprint, MIN({id_col}) AS canonical_id,
                   COUNT(*) AS group_size
            FROM fp GROUP BY fingerprint
        )
        SELECT fp.{id_col}, fp.fingerprint, g.canonical_id,
               fp.{id_col} <> g.canonical_id AS is_dup,
               CAST(g.group_size AS INTEGER) AS group_size
        FROM fp JOIN g USING (fingerprint)
    """


def jaccard_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df_frac: float | None = None,
) -> str:
    return f"""
        WITH sh AS ({_sql_shingles(table, text_col, id_col, n, max_df_frac)}),
        sizes AS (SELECT {id_col}, COUNT(*) AS sz FROM sh GROUP BY {id_col}),
        common AS (
            SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(common AS INTEGER) AS common,
               ROUND(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.{id_col} = id_a
        JOIN sizes sb ON sb.{id_col} = id_b
        WHERE common / CAST(sa.sz + sb.sz - common AS DOUBLE) >= {threshold}
    """


def minhash_lsh_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
    max_df_frac: float | None = None,
) -> str:
    rows_per_band = num_hashes // bands
    params = _minhash_params(num_hashes)
    hash_rows = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(params))
    band_selects = " UNION ALL ".join(
        "SELECT {id_col}, {bi} AS band, ".format(id_col=id_col, bi=bi)
        + " || '-' || ".join(
            f"CAST(mh[{bi * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + " AS bsig FROM sigs"
        for bi in range(bands)
    )
    jac = jaccard_pairs_sql(
        table, text_col, id_col, n, threshold=0.0, max_df_frac=max_df_frac
    )
    return f"""
        WITH sh AS ({_sql_shingles(table, text_col, id_col, n, hashed=False)}),
        hx AS (SELECT {id_col}, {_sql_md5_32('shingle')} AS x FROM sh),
        hf (j, a, b) AS (VALUES {hash_rows}),
        mins AS (
            SELECT {id_col}, j, MIN((a * x + b) % {HASH_PRIME}) AS mh
            FROM hx CROSS JOIN hf GROUP BY {id_col}, j
        ),
        sigs AS (
            SELECT {id_col}, list(mh ORDER BY j) AS mh FROM mins GROUP BY {id_col}
        ),
        banded AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bsig = b.bsig AND a.{id_col} < b.{id_col}
        ),
        jac AS ({jac})
        SELECT cand.id_a, cand.id_b, jac.jaccard
        FROM cand JOIN jac ON cand.id_a = jac.id_a AND cand.id_b = jac.id_b
        WHERE jac.jaccard >= {verify_threshold}
    """


def simhash_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> str:
    if bits > 60:
        raise ValueError("simhash supports at most 60 bits (md5-prefix hash)")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    hash_expr = (
        _sql_md5_32("w")
        if bits <= 32
        else "CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)"
    )
    band_selects = " UNION ALL ".join(
        f"SELECT {id_col}, simhash, {bi} AS band, "
        f"(simhash >> {bi * band_bits}) & {mask} AS bkey FROM sigs"
        for bi in range(bands)
    )
    return f"""
        WITH words AS (
            SELECT {id_col},
                   unnest(list_distinct(string_split({_sql_norm(text_col)}, ' '))) AS w
            FROM {table}
        ),
        wh AS (SELECT {id_col}, {hash_expr} AS h FROM words),
        votes AS (
            SELECT {id_col}, p,
                   SUM(CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM wh CROSS JOIN UNNEST(range({bits})) AS t(p)
            GROUP BY {id_col}, p
        ),
        sigs AS (
            SELECT {id_col},
                   CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY {id_col}
        ),
        banded AS ({band_selects}),
        pairs AS (
            SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
                   bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bkey = b.bkey AND a.{id_col} < b.{id_col}
        )
        SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
        FROM pairs WHERE hamming <= {max_hamming}
    """
