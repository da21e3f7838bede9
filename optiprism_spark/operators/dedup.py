"""Document deduplication — exact and near-dup, 100 TB-grade.

Beyond the reference's surface (BASELINE.json north star): the
operators an LLM-training-data pipeline needs over a `documents`
table. Everything here is declarative Spark SQL — shingling, MinHash,
LSH banding and SimHash are built from `split/transform/slice/md5`
higher-order functions, so the whole pipeline stays inside
whole-stage codegen; no Python UDFs anywhere.

Portability note: hashes are md5 hex strings (not Spark's xxhash64 /
murmur) so signatures are engine-independent — the DuckDB oracle
reproduces them bit-for-bit. MinHash takes the *lexicographic min* of
seed-prefixed md5 hex digests, avoiding hex→int conversions entirely.

Scale notes:
- exact_dedup: one shuffle on the content hash.
- minhash_signatures: per-row array expressions only — no shuffle.
- lsh_candidate_pairs: explode k/r band keys per doc (cheap), shuffle
  on band key; the self-join output is bounded by bucket sizes, the
  standard LSH trade-off. Hot buckets (boilerplate docs) are the skew
  risk → AQE skew-join handles it; callers can also cap bucket size.
- jaccard verification joins only the candidate pairs, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def shingles_expr(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-shingles, JVM-side:
    transform(sequence(...), i -> concat_ws(' ', slice(words, i, n)))."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))))"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: the lowest id per md5(text) wins.
    Returns the surviving rows + group size."""
    from pyspark.sql import Window

    h = F.md5(F.col(text_col))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("__h")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 8, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """k-permutation MinHash: sig_j = min over shingles of
    md5('<j>:' || shingle) (hex-string min). Pure per-row expressions."""
    out = spread(docs).select(F.col(id_col), shingles_expr(text_col, n).alias("__sh"))

    def hasher(j: int):
        # NB: must be a 1-arg lambda — a second (defaulted) parameter
        # would make F.transform pass the array index into it
        prefix = F.lit(f"{j}:")
        return lambda s: F.md5(F.concat(prefix, s))

    sig_cols = [
        F.array_min(F.transform(F.col("__sh"), hasher(j))).alias(f"sig_{j}")
        for j in range(k)
    ]
    return out.select(id_col, *sig_cols)


def lsh_candidate_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: k/bands rows per band; docs sharing any band key
    become a candidate pair (doc_a < doc_b)."""
    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    sigs = minhash_signatures(docs, k, n, text_col, id_col)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[F.col(f"sig_{b * r + i}") for i in range(r)])).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(band_keys).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    candidates: DataFrame = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs.

    Without candidates: inverted-index self-join on shingles (only
    docs sharing ≥1 shingle are compared — never n²). With candidates
    (e.g. from LSH): verification is two equi-joins carrying each
    doc's shingle array + an `array_intersect` per pair — the big
    exploded self-join never happens, so cost scales with the
    candidate count, not with shingle co-occurrence."""
    if candidates is not None:
        sh_map = spread(docs).select(F.col(id_col), shingles_expr(text_col, n).alias("sh"))
        out = (
            candidates.join(
                sh_map.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a"
            )
            .join(
                sh_map.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b"
            )
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
                F.size("sh_a").alias("sz_a"),
                F.size("sh_b").alias("sz_b"),
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.col("inter").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
                ).alias("jaccard"),
            )
        )
        return out.filter(F.col("jaccard") >= F.lit(threshold))

    sh = spread(docs).select(F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= F.lit(threshold))


def simhash(
    docs: DataFrame, bits: int = 16,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: per token a 60-bit md5-derived integer;
    each output bit is the sign of the vote sum over tokens."""
    tok = spread(docs).select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).withColumn("h", F.expr("cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint)"))
    votes = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{j}")
        for j in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))
