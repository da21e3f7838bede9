"""Dedup oracle suite over the `documents` table.

Every query here — including the full MinHash → LSH banding →
exact-Jaccard-verify pipeline — has an exact DuckDB oracle: hashes
are md5 hex strings on both sides (see operators/dedup.py), so even
the LSH candidate sets match bit-for-bit.
"""

from __future__ import annotations

from ..operators.dedup import (
    MINHASH_P,
    exact_dedup,
    jaccard_pairs,
    minhash_params,
    minhash_signatures,
    simhash,
)
from ..registry import query
from ..schema import load_table
from .text import QUALITY_SQL as _QUALITY_SQL

#: shared shingle CTEs (word 3-shingles, distinct per doc)
_SHINGLES = """
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(w) - 2, 1)),
        i -> array_to_string(w[i:i+2], ' ')))) AS s
      FROM w
    )
"""

#: per-shingle 32-bit hash + affine permutations — mirrors
#: operators/dedup.minhash_signatures exactly (int64 arithmetic both
#: engines)
_XS = """
    agg AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY 1),
    xs AS (
      SELECT doc_id, list_transform(
        ss, s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS xs
      FROM agg
    )
"""


def _sig_sql(j: int) -> str:
    a, b = minhash_params(j + 1)[j]
    return f"list_min(list_transform(xs, x -> ({a} * x + {b}) % {MINHASH_P}))"


@query(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, dup_count FROM (
      SELECT doc_id,
             COUNT(*) OVER (PARTITION BY md5(text)) AS dup_count,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_survivors(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "dup_count")


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES},
    {_XS}
    SELECT doc_id,
           {_sig_sql(0)} AS sig_0,
           {_sig_sql(1)} AS sig_1,
           {_sig_sql(2)} AS sig_2,
           {_sig_sql(3)} AS sig_3
    FROM xs
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, k=4)


#: full MinHash(k=8) → 4-band LSH → exact-Jaccard-verify pipeline as a
#: CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — shared by the
#: pair query and the connected-components clustering oracle
_LSH_PAIR_CTES = f"""{_SHINGLES},
    {_XS},
    sigs AS (
      SELECT doc_id, {", ".join(f"{_sig_sql(j)} AS s{j}" for j in range(8))}
      FROM xs
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band, "
          f"CAST(s{2 * b} AS VARCHAR) || ',' || CAST(s{2 * b + 1} AS VARCHAR) AS key "
          "FROM sigs"
          for b in range(4)
      )}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
       AND a.doc_id < b.doc_id
    ),
    szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) AS jaccard
      FROM cand c
      JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN szs sa ON sa.doc_id = c.doc_a
      JOIN szs sb ON sb.doc_id = c.doc_b
      WHERE CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) >= 0.6
    )"""


@query(
    "dedup_lsh_near_pairs",
    oracle=f"""
    WITH {_LSH_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
)
def dedup_lsh_near_pairs(spark, sf_dir):
    """Full near-dup pipeline: MinHash(k=8) → 4-band LSH candidates →
    exact-Jaccard verification at 0.6 — single corpus scan (the
    shingle/signature base frame is persisted and reused by both the
    banding and verification joins)."""
    from ..operators.dedup import lsh_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return lsh_near_dup_pairs(docs, threshold=0.6, k=8, bands=4)


@query(
    "dedup_lsh_incremental_pairs",
    oracle=f"""
    WITH {_LSH_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    WHERE doc_a >= 400 OR doc_b >= 400
    """,
)
def dedup_lsh_incremental_pairs(spark, sf_dir):
    """Ingest-batch near-dup against a settled signature store: docs
    with id >= 400 arrive as the batch, ids < 400 are the settled
    corpus represented ONLY by its (id, shingles, signatures) store —
    the corpus text is never re-shingled. Must equal the full
    pipeline's pair set restricted to pairs touching the batch, which
    is exactly what the oracle computes."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _base_signatures, lsh_incremental_pairs

    docs = load_table(spark, sf_dir, "documents")
    store = _base_signatures(
        docs.filter(F.col("doc_id") < 400), 8, 3, "text", "doc_id")
    pairs, _ = lsh_incremental_pairs(
        docs.filter(F.col("doc_id") >= 400), store, threshold=0.6,
        k=8, bands=4)
    return pairs


@query(
    "dedup_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIR_CTES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u
    ),
    comp AS (SELECT u AS doc_id, MIN(r) AS component FROM reach GROUP BY 1)
    SELECT doc_id, component,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size
    FROM comp
    """,
)
def dedup_neardup_clusters(spark, sf_dir):
    """Near-dup clustering: the LSH pair pipeline (same parameters as
    `dedup_lsh_near_pairs`) collapsed into connected components via
    iterative min-label propagation; the component id (min doc id) is
    the dedup survivor. Oracle computes the same closure with a
    recursive CTE (transitive min-reachability)."""
    from ..operators.dedup import neardup_clusters

    docs = load_table(spark, sf_dir, "documents")
    return neardup_clusters(docs, threshold=0.6, k=8, bands=4)


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES},
    szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) AS jaccard
    FROM inter i
    JOIN szs sa ON sa.doc_id = i.doc_a
    JOIN szs sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) >= 0.5
    """,
)
def dedup_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard pairs via inverted-index join — the
    differential-oracle baseline (``candidates="all"`` opt-in; the
    function's default routes through LSH candidates, whose registered
    query is `dedup_lsh_near_pairs`)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.5, candidates="all")


_BITS = 16
_VOTES = ",\n           ".join(
    f"SUM(((h >> {j}) & 1) * 2 - 1) AS v{j}" for j in range(_BITS)
)
_FP = " + ".join(f"(CASE WHEN v{j} > 0 THEN (1 << {j}) ELSE 0 END)" for j in range(_BITS))


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
    votes AS (SELECT doc_id, {_VOTES} FROM h GROUP BY 1)
    SELECT doc_id, CAST({_FP} AS BIGINT) AS simhash FROM votes
    """,
)
def dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, bits=_BITS)


@query(
    "dedup_decontaminate",
    oracle=f"""
    WITH {_SHINGLES},
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 53 = 0),
    train AS (SELECT doc_id, s FROM sh WHERE doc_id % 53 <> 0)
    SELECT doc_id, COUNT(*) AS n_contaminated
    FROM train JOIN bench USING (s)
    GROUP BY 1
    HAVING COUNT(*) >= 2
    """,
)
def dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing ≥2 distinct
    word 3-shingles with the benchmark slice (docs with id % 53 == 0
    stand in for an eval set). The benchmark shingle set broadcasts;
    the corpus side's only wide op is the per-doc overlap count."""
    from pyspark.sql import functions as F

    from ..operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    train = docs.filter(F.col("doc_id") % 53 != 0)
    return decontaminate(train, bench, n=3, min_overlap=2)


@query(
    "dedup_cluster_survivors_quality",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIR_CTES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.u
    ),
    comp AS (SELECT u AS doc_id, MIN(r) AS component FROM reach GROUP BY 1),
    sized AS (
      SELECT doc_id, component,
             COUNT(*) OVER (PARTITION BY component) AS cluster_size
      FROM comp
    ),
    q AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality_score FROM documents
    ),
    winners AS (
      SELECT doc_id, component, cluster_size, quality_score FROM (
        SELECT s.doc_id, s.component, s.cluster_size, q.quality_score,
               row_number() OVER (
                 PARTITION BY s.component
                 ORDER BY q.quality_score DESC, s.doc_id) AS rn
        FROM sized s JOIN q USING (doc_id)
      ) WHERE rn = 1
    )
    SELECT * FROM winners
    UNION ALL
    SELECT q.doc_id, q.doc_id AS component,
           CAST(1 AS BIGINT) AS cluster_size, q.quality_score
    FROM q WHERE q.doc_id NOT IN (SELECT doc_id FROM comp)
    """,
)
def dedup_cluster_survivors_quality(spark, sf_dir):
    """Quality-aware dedup: per near-dup cluster keep the
    HIGHEST-quality member (text.quality_score; id tiebreak) instead
    of the lowest id; singletons survive trivially. The survivor
    election is one row_number window at cluster grain."""
    from ..operators.dedup import neardup_survivors_by_quality

    docs = load_table(spark, sf_dir, "documents")
    return neardup_survivors_by_quality(docs, threshold=0.6, k=8, bands=4)


@query(
    "dedup_contamination_matrix",
    oracle=f"""
    WITH {_SHINGLES},
    meta AS (SELECT doc_id, source, lang FROM documents),
    bench AS (
      SELECT DISTINCT m.lang AS eval_lang, sh.s
      FROM sh JOIN meta m USING (doc_id) WHERE sh.doc_id % 53 = 0
    ),
    train AS (
      SELECT sh.doc_id, m.source, sh.s
      FROM sh JOIN meta m USING (doc_id) WHERE sh.doc_id % 53 <> 0
    ),
    per_doc AS (
      SELECT t.doc_id, t.source, b.eval_lang, COUNT(*) AS ov
      FROM train t JOIN bench b USING (s)
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= 2
    )
    SELECT source, eval_lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contaminated_docs
    FROM per_doc GROUP BY 1, 2
    """,
)
def dedup_contamination_matrix(spark, sf_dir):
    """Per-(training source, eval slice) contamination counts — which
    vendor feed leaked which benchmark (docs with id % 53 == 0 stand
    in for eval sets, sliced by lang). Eval shingles broadcast; the
    corpus reduces at (doc, source, slice) grain
    (operators/dedup.contamination_matrix)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import contamination_matrix

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0).withColumnRenamed(
        "lang", "eval_lang")
    train = docs.filter(F.col("doc_id") % 53 != 0)
    return contamination_matrix(train, bench, "source", "eval_lang",
                                n=3, min_overlap=2)
