"""Text analysis for training-data pipelines.

Language-ID (script + stopword heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace
+ a BPE-ish regex splitter), and document fingerprinting (min-k of
shingle hashes — a winnowing-style sketch). All built-in-function
expressions; deterministic and oracle-reproducible.

Helpers take the *column name* (not a Column) and accept an optional
pre-split ``words`` Column: ``text_stats``/``quality_score`` project
``split(text)`` ONCE and feed it to every stat — splitting a 100 TB
text column seven times is pure waste, and Catalyst does not CSE
across higher-order-function lambdas.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread

STOPWORDS_EN = ("the", "a", "of", "and", "is", "to", "in")

#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
#: symbols (a simplified GPT-2-style pre-split pattern). This is the
#: portable (RE2-safe) form the DuckDB oracle uses.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: Java-engine variant with possessive quantifiers — same matches
#: (the alternation's character classes are disjoint, so no
#: backtracking path can change a match), ~10% faster on Java's
#: backtracking engine, which is the single biggest cost of
#: text_stats after the fingerprint fix.
_BPE_SPLIT_RE_JAVA = r"[A-Za-z]++|[0-9]++|[^A-Za-z0-9\\s]"


def _words(c: str, words: Optional[Column]) -> Column:
    return words if words is not None else F.split(F.col(c), " ")


def ws_token_count(c: str, words: Optional[Column] = None) -> Column:
    return F.size(_words(c, words))


def bpe_token_count(c: str) -> Column:
    # regexp_count: no token-array materialization just to size() it.
    # (Measured: 3 separate per-class regexp_counts are 4.6x SLOWER
    # than this single alternation — don't "simplify" that way.)
    return F.expr(f"regexp_count({c}, '{_BPE_SPLIT_RE_JAVA}')")


def stopword_ratio(c: str, stopwords=STOPWORDS_EN, words: Optional[Column] = None) -> Column:
    in_list = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(_words(c, words), lambda t: F.array_contains(in_list, t)))
    return hits.cast("double") / ws_token_count(c, words).cast("double")


def punct_ratio(c: str) -> Column:
    # regexp_count(1-char class) == the replace-then-length-diff the
    # oracle uses, without materializing the stripped string
    punct = F.regexp_count(F.col(c), F.lit(r"[^\w\s]"))
    # nullif guard: empty docs must yield null, not a div-by-zero error
    return punct.cast("double") / F.nullif(F.length(F.col(c)), F.lit(0)).cast("double")


def mean_word_len(c: str, words: Optional[Column] = None) -> Column:
    """Sum of word lengths / word count (exact int arithmetic + one
    division)."""
    total = F.aggregate(_words(c, words), F.lit(0), lambda acc, w: acc + F.length(w))
    return total.cast("double") / ws_token_count(c, words).cast("double")


def lang_guess(c: str, stop_threshold: float = 0.05, words: Optional[Column] = None) -> Column:
    """Tiny deterministic language-ID: CJK script detection, else an
    English stopword-ratio threshold."""
    has_cjk = F.col(c).rlike("[\\u4e00-\\u9fff]")
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(stopword_ratio(c, words=words) >= stop_threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-shingles from a pre-split words array.

    Built as ``concat_ws(try_element_at(words, i), ..., i+n-1)`` per
    position instead of ``array_join(slice(words, i, n))``: measured
    ~7x faster (the slice allocates a fresh n-array per position,
    2k+ allocations per document), with BYTE-IDENTICAL output —
    try_element_at past the end yields null and concat_ws skips
    nulls, exactly matching slice's short tail on sub-n-word docs.
    This is the hot inner loop of the text family at 100 TB; keep it
    allocation-free."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(words, i + F.lit(k)) for k in range(n)],
            ),
        )
    )


def fingerprint(c: str, n: int = 3, keep: int = 4, words: Optional[Column] = None) -> Column:
    """Min-k sketch: the `keep` smallest md5 digests of the word
    n-shingles, concatenated — equal for near-identical docs."""
    hashes = F.array_sort(F.transform(shingles_from_words(_words(c, words), n), F.md5))
    return F.array_join(F.slice(hashes, 1, keep), "")


#: PII redaction patterns, applied IN ORDER (emails first so their
#: domains can't later half-match the IP pattern). Every pattern is
#: written in the common subset of Java regex and RE2 — no
#: backreferences, no lookaround — so the DuckDB oracle applies the
#: character-identical patterns. Replacement tokens avoid `$`/`\\`
#: (special in one engine's replacement syntax each).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(c: Column) -> Column:
    """Chained regexp_replace over PII_PATTERNS — pure codegen string
    ops, no shuffle, linear scans per pattern. At 100 TB this is the
    shape you want: a narrow map over the text column, trivially
    partition-parallel, with column pruning keeping everything else
    out of the scan."""
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_redact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, redacted text) — emails, dashed/dotted phone numbers and
    IPv4 literals replaced by typed placeholder tokens."""
    return spread(docs).select(
        F.col(id_col), redact_pii(F.col(text_col)).alias("redacted"))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    # spread: per-char regex + per-shingle md5 is the most CPU-dense
    # map in the repo; a compact parquet (one row group per file) caps
    # scan parallelism at n_files no matter the split size, so small
    # inputs run one-core without this. No-op once splits >= cores.
    c = text_col
    docs = spread(docs)
    with_words = docs.selectExpr(
        f"`{id_col}`", f"`{c}`", f"split(`{c}`, ' ') AS __w")
    # every stat as SQL text in ONE selectExpr (guide §7.3): the
    # eight helper Column trees were ~800 py4j round-trips per call.
    # Each string is the character-identical expression the helpers
    # build (same int seeds, D-suffixed double literals, same
    # regex text after SQL-escape doubling).
    sw_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + ")"
    swr = (f"cast(size(filter(__w, t -> array_contains({sw_arr}, t)))"
           " as double) / cast(size(__w) as double)")
    cjk = "'[\\\\u4e00-\\\\u9fff]'"
    shingles = ("array_distinct(transform("
                "sequence(1, greatest(size(__w) - 2, 1)), "
                "i -> concat_ws(' ', try_element_at(__w, i), "
                "try_element_at(__w, i + 1), try_element_at(__w, i + 2))))")
    return with_words.selectExpr(
        f"`{id_col}`",
        f"length(`{c}`) AS n_chars",
        "size(__w) AS n_tokens",
        f"regexp_count(`{c}`, '{_BPE_SPLIT_RE_JAVA}') AS n_bpe_tokens",
        "cast(aggregate(__w, 0, (acc, w) -> acc + length(w)) as double)"
        " / cast(size(__w) as double) AS mean_word_len",
        f"{swr} AS stopword_ratio",
        f"cast(regexp_count(`{c}`, '[^\\\\w\\\\s]') as double)"
        f" / cast(nullif(length(`{c}`), 0) as double) AS punct_ratio",
        f"CASE WHEN `{c}` RLIKE {cjk} THEN 'zh'"
        f" WHEN {swr} >= 0.05D THEN 'en' ELSE 'unk' END AS lang_guess",
        f"array_join(slice(array_sort(transform({shingles}, s -> md5(s)))"
        ", 1, 4), '') AS fingerprint",
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  keep_cols: tuple = ()) -> DataFrame:
    """Composite [0,1] quality score from length/stopword/word-length
    signals (deterministic: exact ratios combined linearly).

    ``keep_cols``: extra input columns carried through to the output
    (between id and score). The score is 1:1 per row, so callers that
    need sibling columns should pass them here instead of joining the
    score frame back to the input on ``id_col`` — that join is a full
    shuffle of the corpus purely to reattach columns the projection
    already had."""
    c = text_col
    with_words = spread(docs).select(
        F.col(id_col), *[F.col(k) for k in keep_cols],
        F.col(c), F.split(F.col(c), " ").alias("__w"))
    w = F.col("__w")
    length_ok = (F.length(F.col(c)) >= 64) & (F.length(F.col(c)) <= 100000)
    sw = stopword_ratio(c, words=w)
    mwl = mean_word_len(c, w)
    score = (
        length_ok.cast("double") * 0.4
        + F.when(sw.between(0.01, 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(mwl.between(2.0, 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return with_words.select(F.col(id_col), *[F.col(k) for k in keep_cols],
                             score.alias("quality_score"))


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_dup_word_frac: float = 0.9,
) -> DataFrame:
    """Gopher-style document quality rules [Rae et al. 2021, public]:
    word-count bounds, mean word length bounds, symbol-to-word ratio
    (# and ellipsis), fraction of words containing an alphabetic
    character, and a word-repetition fraction (the fixture-friendly
    stand-in for Gopher's duplicate line/paragraph fractions — same
    signal, works on single-line docs too). Emits the per-rule
    metrics plus the composite ``keep`` flag.

    All pure column expressions over ONE split(text) projection — at
    100 TB this is a narrow map stage, no shuffle, no Python."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    mwl = mean_word_len(text_col, words=words)
    t = F.col(text_col)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words.cast("double")
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words.cast("double")
    )
    dup_word_frac = F.lit(1.0) - (
        F.size(F.array_distinct(words)).cast("double") / n_words.cast("double")
    )
    keep = (
        n_words.between(min_words, max_words)
        & mwl.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio < max_symbol_word_ratio)
        & (alpha_frac > min_alpha_word_frac)
        & (dup_word_frac < max_dup_word_frac)
    )
    return spread(docs).select(
        F.col(id_col),
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        dup_word_frac.alias("dup_word_frac"),
        keep.alias("keep"),
    )


def repeated_ngram_stats(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repeated-shingle exposure: of each document's
    DISTINCT word n-shingles, how many also occur in at least one
    OTHER document — the boilerplate/template diagnostic (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL
    2022 measures exactly this corpus-repeated n-gram mass) that
    ranks candidates for span-level dedup where whole-doc MinHash
    (operators/dedup.py) sees only globally-similar pairs.

    Returns (id_col, n_shingles, n_repeated, repeated_fraction);
    ``repeated_fraction`` = n_repeated / n_shingles rounded to 9
    decimals. Counting is doc-frequency at SHINGLE grain, so a
    shingle repeated many times INSIDE one document does not count as
    corpus-repeated.

    Scale shape: explode → distinct (doc, shingle-HASH) pairs → one
    partial-aggregated doc-frequency count at shingle grain → a
    shuffle join of pairs to counts → per-doc aggregate. Everything
    is JVM expressions (the shingling kernel is
    `shingles_from_words`); hot shingles ("of the and") skew the
    join's shuffle — AQE's skew-join splitting handles exactly this
    shape, and the doc-frequency aggregate itself is immune
    (map-side combine collapses hot keys before the exchange).

    r15: the shingle travels through the exchanges as
    ``xxhash64(shingle)`` (8 bytes) instead of the space-joined
    string (~20-40 bytes) — the dominant shuffle's bytes drop ~3-4x.
    A 64-bit collision would under/over-count one shingle's doc
    frequency; at S distinct shingles the chance ANY collision exists
    is ~S²/2⁶⁵ (≈3e-3 even at S=10¹⁰), far below every other
    approximation in the pipeline. The registered oracle compares
    OUTPUTS (counts), which are collision-free-identical to the
    string formulation, so no DuckDB hash mirroring is needed.
    """
    sid = F.col(id_col)
    # pre-project the split: Catalyst does NOT common-subexpression-
    # eliminate split(text) inside transform() lambdas, so an inline
    # split re-tokenizes the document per element access (3 per
    # position) — measured 10x slower at sf0.1 than materializing the
    # words array once per row. Repartition the compact (doc, words)
    # frame to full parallelism before the ~50x shingle expansion —
    # same pre-expansion exchange as repeated_spans (r16): the explode
    # otherwise inherits the scan's input splits and can serialize
    # onto a handful of cores.
    with_words = docs.select(
        sid, _words(text_col, None).alias("__w")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    # NOT persisted: measured at sf1, materializing the shingle rows
    # costs as much as the recompute it saves — AQE's exchange reuse
    # already shares the heavy shuffle between the df-count and the
    # join-back (unlike dedup's signatures frame, whose k minhash
    # columns are genuinely expensive to recompute)
    # r17 (guide §2.4): `shingles_from_words` is array_distinct per
    # doc, so the exploded (doc, shingle-hash) rows are ALREADY
    # distinct — the former .distinct() was a full exchange at the
    # widest grain of the query that deduplicated nothing (its only
    # observable effect would be collapsing an intra-doc 64-bit hash
    # collision, the same ~S²/2⁶⁵ caveat the hashing itself already
    # carries). And the join only needs the BOOLEAN "doc-frequency
    # ≥ 2", which min(doc) != max(doc) answers without distinct-count
    # machinery: the flag aggregate's map-side partials are (h, min,
    # max) — combinable to distinct-h grain per input partition.
    # Exchanges: 4 → 3 (flag agg on h, pairs re-keyed on h for the
    # join, final per-doc aggregate).
    pairs = with_words.select(
        sid, F.explode(shingles_from_words(F.col("__w"), n)).alias("__s"),
    ).select(sid, F.xxhash64("__s").alias("__h"))
    flags = pairs.groupBy("__h").agg(
        (F.min(sid) != F.max(sid)).alias("__rep"))
    return (
        pairs.join(flags, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("__rep").cast("long")).alias("n_repeated"),
            F.round(
                F.sum(F.col("__rep").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("repeated_fraction"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 3,
    min_run: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level duplicate extraction: maximal runs of consecutive
    shingle POSITIONS whose word n-shingle occurs in ≥2 distinct
    documents — the actionable output behind `repeated_ngram_stats`
    (Lee et al. ACL'22 remove exactly these repeated windows;
    whole-doc MinHash can't see a shared boilerplate paragraph inside
    otherwise-different documents).

    Returns (id_col, start_word, end_word, n_positions): 1-based
    inclusive word coordinates — a run of positions i..j with
    n-shingles covers words i..j+n−1 — so a caller can slice the
    repeated window straight out of ``split(text, ' ')``.
    ``min_run`` drops isolated single-shingle hits (three common
    words in a row is noise; Lee et al. use ~50-token runs at corpus
    scale).

    Scale shape: positional explode (one row per shingle position) →
    distinct (doc, shingle) doc-frequency aggregate at shingle grain
    (map-side combinable, hot shingles collapse before the exchange)
    → semi-join positions against corpus-repeated shingles (AQE
    skew-safe) → gaps-and-islands per document: row_number over a
    (doc, pos) window — DOC-grain partitions, never corpus-grain —
    and a final (doc, island) aggregate. All JVM expressions.

    r15: both shingle exchanges (the doc-frequency distinct and the
    position semi-join — together the query's dominant shuffles)
    carry ``xxhash64(shingle)`` int64 keys instead of space-joined
    strings: ~3-4x fewer shuffle bytes on `text_repeated_spans`, the
    most expensive headline entry. A collision (any-pair chance
    ~S²/2⁶⁵ over S distinct shingles) could mark one unique shingle
    position as repeated; the registered oracle pins the OUTPUT spans,
    which are identical to the string formulation absent a collision.
    """
    from pyspark.sql import Window

    sid = F.col(id_col)
    # pre-project the split (same CSE rationale as repeated_ngram_stats:
    # an inline split re-tokenizes per lambda element access, 10x)
    # … and REPARTITION the compact (doc, words) frame to full
    # parallelism BEFORE the ~50x positional expansion (r16): the
    # explode inherits the scan's input splits, and a coarse split
    # (one small parquet file locally; a fat row-group on a cluster)
    # serializes the whole expansion onto a handful of cores. Moving
    # 1x data to spread 50x work is the standard pre-expansion
    # exchange; both shingle branches below reuse the one exchange
    # (ReusedExchange). Measured at 10x data: 7.9 s → 2.4 s, SF1
    # ratio 4.8x → ~1.6x.
    # r16 (optimization round): the compact (doc, words) frame is
    # persisted — both shingle branches (positional explode and the
    # doc-frequency distinct) substitute to one InMemoryRelation
    # (plans/r16/text_repeated_spans_after.txt: single scan chain),
    # where the unpersisted shape physically duplicated
    # scan→split→repartition→explode under the broadcast side
    # (…_before.txt: two `Scan parquet`). 1x-corpus materialization,
    # the same discipline as the LSH base-signature persist; measured
    # 1.64 s → 1.36 s at sf0.1. (The r15 sf1 verdict against
    # persisting applied to the EXPLODED shingle rows — ~50x corpus;
    # the words frame is input-sized.)
    from ._util import track_persist

    with_words = track_persist(docs.select(
        sid, _words(text_col, None).alias("__w")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism))
    words = F.col("__w")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    pos_shingles = with_words.select(
        sid,
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(
                        " ",
                        *[F.try_element_at(words, i + F.lit(k))
                          for k in range(n)],
                    ).alias("s"),
                ),
            )
        ).alias("ps"),
    ).select(sid, F.col("ps.pos").alias("pos"),
             F.xxhash64(F.col("ps.s")).alias("__h"))
    # the doc-frequency side shares pos_shingles' explode (r16 — the
    # r15 measurement that favoured a separate position-free kernel
    # inverted once the pre-expansion repartition landed: one explode
    # kernel, and the partial aggregate collapses doc-locally exactly
    # where array_distinct used to).
    # r17 (guide §2.4): the filter only asks "≥2 DISTINCT docs", and
    # min(doc) != max(doc) answers it exactly — so the former
    # distinct() on (doc, shingle) + groupBy(shingle) count (TWO
    # exchanges over the deduped shingle grain) is ONE plain
    # aggregate keyed on the shingle hash: map-side partials carry
    # (h, min, max) — combinable to distinct-h grain per input
    # partition — and a single exchange on h remains. Same repeated
    # set: a shingle occurs in ≥2 distinct docs iff its min and max
    # doc ids differ.
    corpus_repeated = (
        pos_shingles.groupBy("__h")
        .agg(F.min(sid).alias("__mn"), F.max(sid).alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("__h")
    )
    hits = pos_shingles.join(corpus_repeated, "__h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "__grp")
        .agg(
            # long coordinates: DuckDB's generate_series positions are
            # BIGINT — keep the cross-engine schema identical
            F.min("pos").cast("long").alias("start_word"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("end_word"),
            F.count(F.lit(1)).alias("n_positions"),
        )
        .filter(F.col("n_positions") >= min_run)
        .drop("__grp")
    )


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 3,
    min_run: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level dedup TRANSFORM (the Lee et al. ACL'22 treatment):
    cut every corpus-repeated window found by `repeated_spans` out of
    the document, keeping the unique remainder. Returns
    (id_col, text_clean, n_words, n_removed): ``text_clean`` is the
    document with covered words dropped; docs with no repeated spans
    pass through verbatim (n_removed = 0).

    Scale shape: `repeated_spans`'s plan (shingle-grain doc-frequency
    + doc-grain islands) plus ONE doc-grain aggregation of the span
    list and ONE join back to the corpus on its id — the span frame
    is tiny (only documents with ≥min_run repeated runs appear), so
    the join broadcasts in practice and the corpus is never shuffled.
    The cut itself is a JVM higher-order filter (position ∉ any
    span) — no UDFs.
    """
    spans = repeated_spans(docs, n=n, min_run=min_run,
                           text_col=text_col, id_col=id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_word", "end_word")).alias("__spans"))
    with_words = docs.select(
        F.col(id_col), _words(text_col, None).alias("__w"))
    joined = with_words.join(per_doc, id_col, "left")
    spans_col = F.coalesce(
        F.col("__spans"),
        F.expr("array()").cast(
            "array<struct<start_word:bigint,end_word:bigint>>"),
    )
    # F.filter's index is 0-based; span coordinates are 1-based words
    kept = F.filter(
        "__w",
        lambda w, i: ~F.exists(
            spans_col,
            lambda s: (i + F.lit(1) >= s["start_word"])
            & (i + F.lit(1) <= s["end_word"]),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.size("__w").cast("long").alias("n_words"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_removed"),
    )
