"""Dataset-assembly oracle suite: deterministic splits, stratified
samples, and sequence packing over `documents`.

Every assignment is md5-hash-derived (operators/assembly.unit_hash),
so DuckDB reproduces splits/samples/packs bit-for-bit with the same
hex-prefix arithmetic the dedup suite uses. Split thresholds are
embedded via ``repr`` of the SAME Python-accumulated floats the
operator compares against — cumulative weights like 0.8+0.1 are not
exactly 0.9 in binary, and the oracle must cut at the identical
double.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.assembly import (
    dataset_split,
    pack_sequences,
    stratified_sample_exact,
    stratified_sample_fraction,
)
from ..registry import query
from ..schema import load_table
from .text import QUALITY_SQL as _QUALITY_SQL

#: mirrors operators/assembly.unit_hash(key, seed)
def _u_sql(key: str, seed: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || {key}), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )


_WEIGHTS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def _split_case_sql() -> str:
    acc = 0.0
    arms = []
    for name, w in _WEIGHTS[:-1]:
        acc += w
        arms.append(f"WHEN u < {acc!r} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{_WEIGHTS[-1][0]}' END"


@query(
    "asm_split_train_val_test",
    oracle=f"""
    SELECT doc_id, {_split_case_sql()} AS split
    FROM (SELECT doc_id, {_u_sql('doc_id', 'split')} AS u FROM documents)
    """,
)
def asm_split_train_val_test(spark, sf_dir):
    """Hash-stable 80/10/10 split: a per-row projection (no shuffle,
    no rand()) whose assignment never changes as the corpus grows."""
    docs = load_table(spark, sf_dir, "documents")
    return dataset_split(docs, _WEIGHTS).select("doc_id", "split")


@query(
    "asm_sample_fraction_by_lang",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             {_u_sql("COALESCE(lang, chr(0)) || chr(31) || CAST(doc_id AS VARCHAR)", 'sample')} AS u
      FROM documents
    ) WHERE u < 0.25
    """,
)
def asm_sample_fraction_by_lang(spark, sf_dir):
    """~25% per language stratum by hash threshold — the shuffle-free
    sampling shape that survives 100 TB (pure filter; the stratum is
    part of the hash key so draws are independent across strata)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_fraction(docs, ["lang"], 0.25).select("doc_id", "lang")


@query(
    "asm_stratified_sample_exact",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_u_sql('doc_id', 'sample')}, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def asm_stratified_sample_exact(spark, sf_dir):
    """Exactly 20 docs per language, chosen in deterministic hash
    order (one row_number window per stratum)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_exact(docs, ["lang"], 20).select("doc_id", "lang")


@query(
    "asm_pack_sequences",
    oracle="""
    SELECT doc_id, n_tokens, bucket,
           bucket * 1099511627776 + CAST(floor(start / 512.0) AS BIGINT) AS pack_id,
           start % 512 AS pack_offset
    FROM (
      SELECT doc_id, n_tokens, bucket,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start
      FROM (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 32 AS bucket
        FROM documents
      )
    )
    """,
)
def asm_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing into 512-token packs across
    32 hash buckets (md5 id hash — string-id safe, bucket << 40 pack
    namespace) — packing is parallel across buckets (one shuffle on
    bucket id), never globally ordered."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512, n_buckets=32)


@query(
    "asm_chunk_documents",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (SELECT doc_id, ws,
                 unnest(range(0, greatest(len(ws) - 17, 0) + 1, 48)) AS g
          FROM w)
    SELECT doc_id,
           CAST(g / 48 AS INT) AS chunk_idx,
           array_to_string(ws[g + 1 : g + 64], ' ') AS chunk_text,
           len(ws[g + 1 : g + 64]) AS chunk_words
    FROM c
    """,
)
def asm_chunk_documents(spark, sf_dir):
    """Overlapping 64-word chunks with 16-word overlap (stride 48) —
    the document→training-sequence chunking step; row expansion, no
    shuffle."""
    from ..operators.assembly import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_words=64, overlap=16)


def _pipeline_oracle() -> str:
    from .text import _GQ_ALPHA, _GQ_DUP, _GQ_MWL, _GQ_SYM, _GQ_WORDS

    keep = (f"(len({_GQ_WORDS}) BETWEEN 50 AND 100000"
            f" AND {_GQ_MWL} BETWEEN 3.0 AND 10.0"
            f" AND {_GQ_SYM} < 0.1 AND {_GQ_ALPHA} > 0.8 AND {_GQ_DUP} < 0.9)")
    return f"""
    WITH base AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
               {keep} AS keep
        FROM documents)
      WHERE rn = 1 AND keep
    ), s AS (
      SELECT doc_id, text, {_split_case_sql()} AS split
      FROM (SELECT doc_id, text, {_u_sql('doc_id', 'split')} AS u FROM base)
    ), t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 8 AS bucket
      FROM s WHERE split = 'train'
    ), p AS (
      SELECT doc_id,
             bucket * 1099511627776
               + CAST(floor(start / 512.0) AS BIGINT) AS pack_id,
             start % 512 AS pack_offset
      FROM (
        SELECT doc_id, bucket,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS start
        FROM t)
    )
    SELECT s.doc_id, s.split, p.pack_id, p.pack_offset
    FROM s LEFT JOIN p USING (doc_id)
    """


@query("asm_training_pipeline", oracle=_pipeline_oracle())
def asm_training_pipeline(spark, sf_dir):
    """The end-to-end assembly pipeline COMPOSED: Gopher quality
    filter -> exact-dedup survivors -> deterministic split -> train
    split packed into 512-token packs (8 hash buckets). Each stage is
    individually oracle-checked elsewhere; this query checks the
    composition — stage boundaries (semi-joins on the original ids,
    packing only the train split) are where pipelines silently
    diverge."""
    from ..operators.dedup import exact_dedup
    from ..operators.text import gopher_quality

    docs = load_table(spark, sf_dir, "documents")
    keep = gopher_quality(docs).filter("keep").select("doc_id")
    survivors = exact_dedup(docs).select("doc_id")
    base = (
        docs.join(keep, "doc_id", "left_semi")
        .join(survivors, "doc_id", "left_semi")
    )
    s = dataset_split(base, _WEIGHTS)
    packed = pack_sequences(
        s.filter(F.col("split") == "train"), budget=512, n_buckets=8
    ).select("doc_id", "pack_id", "pack_offset")
    return s.select("doc_id", "split").join(packed, "doc_id", "left")


#: token-budget mixture targets for the registered query: src1 is
#: over-asked (saturates at rate 1 at small SF), the others sample —
#: both branches of LEAST(1, t/a) stay exercised at every scale
_MIX_TARGETS = {"src0": 700.0, "src1": 99000.0, "src2": 400.0}
_MIX_VALUES = ", ".join(
    f"('{s}', {t!r})" for s, t in sorted(_MIX_TARGETS.items()))


@query(
    "asm_mixture_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    avail AS (SELECT source, CAST(SUM(n) AS BIGINT) AS a FROM toks GROUP BY 1),
    rates AS (
      SELECT v.source, LEAST(1.0, v.t / avail.a) AS rate
      FROM (VALUES {_MIX_VALUES}) v(source, t)
      JOIN avail USING (source)
    )
    SELECT t.doc_id, t.source, CAST(t.n AS INT) AS n_tokens
    FROM toks t JOIN rates r USING (source)
    WHERE {_u_sql('t.doc_id', 'mix')} < r.rate
    """,
)
def asm_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling (the data-mixing step of a
    training pipeline): one availability aggregate -> tiny broadcast
    rates table -> pure hash filter at the scan. Membership is
    hash-stable per document and the corpus itself is never
    shuffled.

    The availability aggregate and the filter pass both need the
    per-doc token count, and text tokenization is the dominant
    per-row cost — project to the compact (doc_id, source, n_tokens)
    frame once and persist it (guide §8: decide on a lightweight
    ~16-byte/row proxy instead of tokenizing the corpus twice); both
    of mixture_sample's passes read the materialized proxy."""
    from ..operators._util import track_persist
    from ..operators.assembly import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    compact = track_persist(
        docs.select("doc_id", "source", toks.alias("n_tokens")))
    return mixture_sample(
        compact, _MIX_TARGETS, token_col=F.col("n_tokens"),
    ).select("doc_id", "source", "n_tokens")


@query(
    "asm_mixture_rates",
    oracle=f"""
    WITH toks AS (
      SELECT source, len(string_split(text, ' ')) AS n FROM documents
    ),
    avail AS (SELECT source, CAST(SUM(n) AS BIGINT) AS a FROM toks GROUP BY 1)
    SELECT v.source,
           COALESCE(avail.a, 0) AS available_tokens,
           v.t AS target_tokens,
           CASE WHEN avail.a IS NULL OR avail.a = 0 THEN 0.0
                ELSE LEAST(1.0, v.t / avail.a) END AS rate,
           GREATEST(0.0, v.t - CAST(COALESCE(avail.a, 0) AS DOUBLE))
             AS deficit_tokens
    FROM (VALUES {_MIX_VALUES}) v(source, t)
    LEFT JOIN avail USING (source)
    """,
)
def asm_mixture_rates(spark, sf_dir):
    """The mixture-rate plan itself: per-source availability, keep
    rate, and the deficit a saturated source cannot deliver — the
    frame a pipeline inspects to rebalance weights before sampling."""
    from ..operators.assembly import mixture_rates

    docs = load_table(spark, sf_dir, "documents")
    return mixture_rates(docs, _MIX_TARGETS)


@query(
    "asm_mixture_sample_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    j AS (
      SELECT tk.doc_id, tk.source, tk.n, v.tgt,
             SUM(tk.n) OVER (
               PARTITION BY tk.source
               ORDER BY {_u_sql('tk.doc_id', 'mix')}, tk.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM toks tk JOIN (VALUES {_MIX_VALUES}) v(source, tgt)
        ON v.source = tk.source
    )
    SELECT doc_id, source, CAST(cum AS BIGINT) AS cum_tokens
    FROM j WHERE (cum - n) < tgt
    """,
)
def asm_mixture_sample_exact(spark, sf_dir):
    """Exact-budget mixture: greedy prefix in deterministic hash
    order per source — delivers within one document of each target
    (the saturated source keeps everything). One per-source ordering
    window; prefer asm_mixture_sample's pure filter at scale."""
    from ..operators.assembly import mixture_sample_exact

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample_exact(docs, _MIX_TARGETS).select(
        "doc_id", "source", "cum_tokens")


@query(
    "asm_importance_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {{Q}} AS quality_score
      FROM documents
    ), probs AS (
      SELECT doc_id, source, quality_score,
             LEAST(1.0, quality_score / 0.7) AS keep_prob
      FROM scored
    )
    SELECT doc_id, source, quality_score, keep_prob,
           1.0 / keep_prob AS ht_weight
    FROM probs
    WHERE {_u_sql('doc_id', 'importance')} < keep_prob
    """.replace("{Q}", _QUALITY_SQL),
)
def asm_importance_sample(spark, sf_dir):
    """Quality-weighted soft filter: docs at or above quality 0.7
    always survive, weaker docs proportionally; kept rows carry
    keep_prob and the Horvitz-Thompson reweight so downstream counts
    stay unbiased. Pure per-row hash filter, zero shuffles."""
    from ..operators._util import track_persist
    from ..operators.assembly import importance_sample
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    # the score is 1:1 per doc — carry `source` through the scoring
    # projection instead of joining the score frame back to the
    # corpus (that join was a full doc-table shuffle to reattach one
    # column the scan already had)
    #
    # r17: persist the compact (doc_id, source, quality_score) proxy
    # (~24 B/row, text dropped). Without the barrier the sample
    # filter's keep_prob predicate is pushed below the scoring
    # projection and Catalyst INLINES the whole score expression into
    # it — every row paid ~6 split(text) passes in the filter plus
    # the projection's own scoring (guide §4.4's duplication, JVM
    # flavor; the r16 mixture-sample §22 pattern is the fix).
    scored = track_persist(quality_score(docs, keep_cols=("source",)))
    return importance_sample(
        scored, F.col("quality_score"), pivot=0.7)


@query(
    "asm_curriculum_phases",
    oracle=f"""
    WITH e AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(n_chars > q1 AS INT) + CAST(n_chars > q2 AS INT)
             + CAST(n_chars > q3 AS INT) AS phase,
           {_u_sql('doc_id', 'curriculum')} AS shuffle_key
    FROM documents, e
    """,
)
def asm_curriculum_phases(spark, sf_dir):
    """Length-curriculum assignment: equi-depth quartile of document
    length (short -> long is the classic easy -> hard schedule) plus
    a deterministic intra-phase shuffle key. Edges are one 1-row
    broadcast aggregate -- the corpus is never shuffled."""
    from ..operators.assembly import curriculum_phases

    docs = load_table(spark, sf_dir, "documents")
    return curriculum_phases(docs, "n_chars", n_phases=4)


@query(
    "asm_training_pipeline_weighted",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, n_chars, {{Q}} AS quality_score FROM documents
    ), probs AS (
      SELECT doc_id, n_chars,
             LEAST(1.0, quality_score / 0.7) AS keep_prob
      FROM scored
    ), kept AS (
      SELECT doc_id, n_chars, keep_prob, 1.0 / keep_prob AS ht_weight
      FROM probs WHERE {_u_sql('doc_id', 'importance')} < keep_prob
    ), surv AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1
    ), base AS (
      SELECT k.* FROM kept k JOIN surv USING (doc_id)
    ), s AS (
      SELECT doc_id, n_chars, keep_prob, ht_weight,
             {_split_case_sql()} AS split
      FROM (SELECT b.*, {_u_sql('doc_id', 'split')} AS u FROM base b)
    ), e AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM s
    )
    SELECT doc_id, split, keep_prob, ht_weight,
           CAST(n_chars > q1 AS INT) + CAST(n_chars > q2 AS INT)
             + CAST(n_chars > q3 AS INT) AS phase,
           {_u_sql('doc_id', 'curriculum')} AS shuffle_key
    FROM s, e
    """.replace("{Q}", _QUALITY_SQL),
)
def asm_training_pipeline_weighted(spark, sf_dir):
    """The r14 pipeline composition: quality-weighted soft filter
    (HT-reweighted, never a hard cut) -> exact-dedup survivors ->
    deterministic split -> curriculum phases whose quantile edges are
    computed over the SURVIVING corpus (the population the trainer
    actually sees). Every stage is individually oracled; this checks
    the stage boundaries under the new sampling ops."""
    from ..operators._util import track_persist
    from ..operators.assembly import curriculum_phases, importance_sample
    from ..operators.dedup import exact_dedup
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    # score is 1:1 per doc: project `n_chars` through instead of a
    # corpus self-join, and persist the compact scored proxy so the
    # pushed-down sample filter reads the cached score instead of
    # re-inlining the text folds (see asm_importance_sample)
    scored = track_persist(quality_score(docs, keep_cols=("n_chars",)))
    kept = importance_sample(scored, F.col("quality_score"), pivot=0.7)
    survivors = exact_dedup(docs).select("doc_id")
    base = kept.join(survivors, "doc_id", "left_semi")
    s = dataset_split(base, _WEIGHTS)
    cur = curriculum_phases(s, "n_chars", n_phases=4)
    return s.select("doc_id", "split", "keep_prob", "ht_weight").join(
        cur.select("doc_id", "phase", "shuffle_key"), "doc_id")


@query(
    "asm_token_histogram",
    oracle="""
    SELECT lang,
           CAST(FLOOR(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) / 32) * 32
                AS BIGINT) AS token_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def asm_token_histogram(spark, sf_dir):
    """Token-budget planning surface: documents and total BPE-ish
    tokens per (lang, 32-token length bucket) — the availability
    histogram a mixture/curriculum design reads before setting rates
    (how much short-vs-long data each language actually has). One
    scan, the same single-alternation regexp_count the text-stats
    tier uses (no token-array materialization), one groupBy."""
    from ..operators.text import bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    n_tok = bpe_token_count("text")
    return (
        docs.groupBy(
            "lang",
            (F.floor(n_tok / 32) * 32).cast("long").alias("token_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).cast("long").alias("total_tokens"),
        )
    )
