"""Text-analysis oracle suite over the `documents` table."""

from __future__ import annotations

from ..operators.text import quality_score, text_stats
from ..registry import query
from ..schema import load_table

_STOP_LIST = "'the', 'a', 'of', 'and', 'is', 'to', 'in'"
_SW_RATIO = (
    f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_LIST}))) AS DOUBLE)"
    " / CAST(len(string_split(text, ' ')) AS DOUBLE)"
)


@query(
    "text_stats_all",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
           {_SW_RATIO} AS stopword_ratio,
           CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
             / CAST(NULLIF(length(text), 0) AS DOUBLE) AS punct_ratio,
           CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
                WHEN {_SW_RATIO} >= 0.05 THEN 'en'
                ELSE 'unk' END AS lang_guess,
           array_to_string(list_sort(list_transform(
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))),
             s -> md5(s)))[1:4], '') AS fingerprint
    FROM documents
    """,
)
def text_stats_all(spark, sf_dir):
    """Token counts (whitespace + BPE-ish regex), word-length and
    stopword/punctuation ratios, language guess, min-k fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return text_stats(docs)


#: SQL mirror of operators/text.quality_score — shared with the
#: dedup suite's survivor-by-quality oracle (same literal, same IEEE
#: addition order as the Spark expression)
QUALITY_SQL = f"""(CASE WHEN length(text) BETWEEN 64 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN {_SW_RATIO} BETWEEN 0.01 AND 0.6 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN
                CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 2.0 AND 12.0
              THEN 0.3 ELSE 0.0 END)"""


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           {QUALITY_SQL} AS quality_score
    FROM documents
    """,
)
def text_quality_scores(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs)


@query(
    "text_lang_distribution",
    oracle=f"""
    SELECT lang, COUNT(*) AS n, {{sw}} FROM (
      SELECT lang, text FROM documents
    ) GROUP BY 1
    """.replace("{sw}", "CAST(SUM(CASE WHEN " + _SW_RATIO + " >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_en_guess"),
)
def text_lang_distribution(spark, sf_dir):
    """Declared-language distribution + how many docs the heuristic
    would flag as English."""
    from pyspark.sql import functions as F

    from ..operators.text import stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((stopword_ratio("text") >= 0.05).cast("long")).alias("n_en_guess"),
    )


def _pii_sql() -> str:
    """Build the oracle's chained regexp_replace from the SAME pattern
    tuples the operator applies (operators/text.PII_PATTERNS) — the
    patterns live in the Java-regex ∩ RE2 common subset, so the
    character-identical strings run in both engines."""
    from ..operators.text import PII_PATTERNS

    expr = (
        "text || ' Contact user' || doc_id || '@example.com or 10.'"
        " || doc_id % 256 || '.3.7 tel 555-123-4567.'"
    )
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


@query(
    "text_pii_redact",
    oracle=f"SELECT doc_id, {_pii_sql()} AS redacted FROM documents",
)
def text_pii_redact(spark, sf_dir):
    """PII redaction: emails / dashed-or-dotted phone numbers / IPv4
    literals → typed placeholders, as chained codegen regexp_replace
    (narrow map, no shuffle). The synthetic corpus carries no PII, so
    the query plants a deterministic doc_id-derived email+IP+phone
    tail per document first — the oracle does the identical injection,
    and the redacted output differs from the input on EVERY row, so a
    broken pattern cannot hide behind a no-op match (non-hollow by
    construction)."""
    from pyspark.sql import functions as F

    from ..operators.text import pii_redact

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".3.7 tel 555-123-4567."),
        ),
    )
    return pii_redact(docs)


_GQ_WORDS = "string_split(text, ' ')"
_GQ_MWL = (f"CAST(list_sum(list_transform({_GQ_WORDS}, w -> length(w))) AS DOUBLE)"
           f" / CAST(len({_GQ_WORDS}) AS DOUBLE)")
_GQ_SYM = ("(CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)"
           " + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE)/3)"
           f" / CAST(len({_GQ_WORDS}) AS DOUBLE)")
_GQ_ALPHA = (f"CAST(len(list_filter({_GQ_WORDS}, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)"
             f" / CAST(len({_GQ_WORDS}) AS DOUBLE)")
_GQ_DUP = f"1.0 - CAST(len(list_distinct({_GQ_WORDS})) AS DOUBLE) / CAST(len({_GQ_WORDS}) AS DOUBLE)"


@query(
    "text_gopher_quality",
    oracle=f"""
    SELECT doc_id,
           len({_GQ_WORDS}) AS n_words,
           {_GQ_MWL} AS mean_word_len,
           {_GQ_SYM} AS symbol_word_ratio,
           {_GQ_ALPHA} AS alpha_word_frac,
           {_GQ_DUP} AS dup_word_frac,
           (len({_GQ_WORDS}) BETWEEN 50 AND 100000
            AND {_GQ_MWL} BETWEEN 3.0 AND 10.0
            AND {_GQ_SYM} < 0.1
            AND {_GQ_ALPHA} > 0.8
            AND {_GQ_DUP} < 0.9) AS keep
    FROM documents
    """,
)
def text_gopher_quality(spark, sf_dir):
    """Gopher-rule quality filters (word bounds, mean word length,
    symbol ratio, alpha-word fraction, word-repetition) with the
    composite keep flag — every rule differentially checked."""
    from ..operators.text import gopher_quality

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality(docs)


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled greedy-BPE trainer in pure DuckDB SQL: each of the
    ``n_merges`` iterations is one CTE pair — ``t{i}`` picks the argmax
    adjacent pair (count desc, a asc, b asc — the operator's exact
    tie-break, with the cnt>=2 early-stop expressed as HAVING so later
    iterations no-op once training stops) and ``w{i}`` rewrites every
    vocab word via a ``list_reduce`` fold. The fold encodes the symbol
    list as a chr(31)-joined string (the corpus is printable ASCII, so
    the separator can't collide); "merge leftmost non-overlapping" is
    exactly "append b to the accumulator iff the accumulator's last
    symbol equals a" — a merged symbol a||b can never equal a (b is
    non-empty), so a fresh merge can never chain, matching the Spark
    fold's open/closed flag (operators/bpe.py `_merge_expr`)."""
    merge_fold = """
      CASE WHEN t.a IS NULL THEN syms
      ELSE string_split(
        list_reduce(syms, (acc, x) -> CASE
          WHEN x = t.b AND (acc = t.a OR ends_with(acc, chr(31) || t.a))
          THEN acc || t.b
          ELSE acc || chr(31) || x END),
        chr(31))
      END"""
    sql = """WITH w0 AS (
      SELECT word, n, list_append(string_split(word, ''), '</w>') AS syms
      FROM (
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
      )
    )"""
    for i in range(1, n_merges + 1):
        sql += f""",
    t{i} AS (
      SELECT p['a'] AS a, p['b'] AS b
      FROM (
        SELECT unnest(list_transform(syms[1:len(syms)-1],
                      (s, i) -> struct_pack(a := s, b := syms[i+1]))) AS p, n
        FROM w{i-1}
      )
      GROUP BY 1, 2
      HAVING sum(n) >= 2
      ORDER BY sum(n) DESC, a ASC, b ASC
      LIMIT 1
    ),
    w{i} AS (
      SELECT word, n, {merge_fold} AS syms
      FROM w{i-1} LEFT JOIN t{i} t ON true
    )"""
    return sql + f"""
    SELECT word, n, len(syms) AS n_syms,
           array_to_string(syms, ' ') AS segmentation
    FROM w{n_merges}"""


@query("text_bpe_segments", oracle=_bpe_oracle_sql(8))
def text_bpe_segments(spark, sf_dir):
    """Distributed BPE tokenizer training over the corpus: 8 greedy
    merges from character splits, returning every vocab word's final
    segmentation (word, n, n_syms). Deterministic: the argmax
    tie-break is (count desc, a asc, b asc)."""
    from pyspark.sql import functions as F

    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _, seg = bpe_train(docs, n_merges=8)
    return seg.select(
        "word", "n", F.size("syms").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("segmentation"),
    )


@query(
    "text_repeated_ngram_stats",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(w) - 2, 1)),
        i -> array_to_string(w[i:i+2], ' ')))) AS s
      FROM w
    ),
    cnt AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN cnt.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeated,
           round(CAST(SUM(CASE WHEN cnt.df >= 2 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 9) AS repeated_fraction
    FROM sh JOIN cnt USING (s)
    GROUP BY 1
    """,
)
def text_repeated_ngram_stats(spark, sf_dir):
    """Per-document corpus-repeated 3-shingle exposure (the Lee et
    al. span-dedup diagnostic): distinct (doc, shingle) pairs, one
    doc-frequency aggregate at shingle grain, join back, per-doc
    fraction — all JVM expressions over the shared shingling kernel
    (operators/text.repeated_ngram_stats)."""
    from ..operators.text import repeated_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    return repeated_ngram_stats(docs, n=3)


@query(
    "text_repeated_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ps AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(w) - 2, 1))) AS pos,
             unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> array_to_string(w[i:i+2], ' '))) AS s
      FROM w
    ),
    rep AS (
      SELECT s FROM (SELECT DISTINCT doc_id, s FROM ps)
      GROUP BY s HAVING COUNT(*) >= 2
    ),
    hits AS (SELECT ps.doc_id, ps.pos FROM ps JOIN rep USING (s)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hits
    )
    SELECT doc_id, MIN(pos) AS start_word, MAX(pos) + 2 AS end_word,
           COUNT(*) AS n_positions
    FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 2
    """,
)
def text_repeated_spans(spark, sf_dir):
    """Span-level duplicate windows (Lee et al. ACL'22): maximal runs
    of ≥2 consecutive positions whose 3-shingle recurs in another
    document, as 1-based inclusive word coordinates — the slice list
    a span-dedup pass removes. Positional explode → shingle-grain
    doc-frequency → semi-join → doc-grain gaps-and-islands
    (operators/text.repeated_spans)."""
    from ..operators.text import repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans(docs, n=3, min_run=2)


@query(
    "text_remove_repeated_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ps AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(w) - 2, 1))) AS pos,
             unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> array_to_string(w[i:i+2], ' '))) AS s
      FROM w
    ),
    rep AS (
      SELECT s FROM (SELECT DISTINCT doc_id, s FROM ps)
      GROUP BY s HAVING COUNT(*) >= 2
    ),
    hits AS (SELECT ps.doc_id, ps.pos FROM ps JOIN rep USING (s)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hits
    ),
    sp AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + 2 AS e
      FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 2
    ),
    spans AS (
      SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans
      FROM sp GROUP BY doc_id
    )
    SELECT w.doc_id,
           COALESCE(array_to_string(list_filter(w.w, (x, i) ->
             spans.spans IS NULL OR len(list_filter(spans.spans,
               p -> i >= p.s AND i <= p.e)) = 0), ' '), '') AS text_clean,
           CAST(len(w.w) AS BIGINT) AS n_words,
           CAST(len(w.w) - len(list_filter(w.w, (x, i) ->
             spans.spans IS NULL OR len(list_filter(spans.spans,
               p -> i >= p.s AND i <= p.e)) = 0)) AS BIGINT) AS n_removed
    FROM w LEFT JOIN spans USING (doc_id)
    """,
)
def text_remove_repeated_spans(spark, sf_dir):
    """Span-level dedup applied: corpus-repeated windows cut out of
    each document, unique remainder kept (the Lee et al. treatment —
    whole-doc MinHash keeps one boilerplate copy PER near-dup
    cluster; this removes every copy of a shared paragraph across
    otherwise-unrelated docs). One tiny doc-grain span join onto the
    corpus; the cut is a JVM higher-order filter
    (operators/text.remove_repeated_spans)."""
    from ..operators.text import remove_repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_spans(docs, n=3, min_run=2)
