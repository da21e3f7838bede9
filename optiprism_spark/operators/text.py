"""Text analysis for training-data pipelines.

Language-ID (script + stopword heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace
+ a BPE-ish regex splitter), and document fingerprinting (min-k of
shingle hashes — a winnowing-style sketch). All built-in-function
expressions; deterministic and oracle-reproducible.

Helpers take the *column name* (not a Column): several lean on
``F.expr`` higher-order lambdas where the name is embedded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "is", "to", "in")

#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
#: symbols (a simplified GPT-2-style pre-split pattern)
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_token_count(c: str) -> Column:
    return F.size(F.split(F.col(c), " "))


def bpe_token_count(c: str) -> Column:
    return F.size(F.expr(f"regexp_extract_all({c}, '{BPE_SPLIT_RE}', 0)"))


def stopword_ratio(c: str, stopwords=STOPWORDS_EN) -> Column:
    lst = ", ".join(f"'{w}'" for w in stopwords)
    hits = F.expr(f"size(filter(split({c}, ' '), t -> t IN ({lst})))")
    return hits.cast("double") / ws_token_count(c).cast("double")


def punct_ratio(c: str) -> Column:
    punct = F.length(F.col(c)) - F.length(F.regexp_replace(F.col(c), r"[^\w\s]", ""))
    return punct.cast("double") / F.length(F.col(c)).cast("double")


def mean_word_len(c: str) -> Column:
    """Sum of word lengths / word count (exact int arithmetic + one
    division)."""
    total = F.expr(f"aggregate(split({c}, ' '), 0, (acc, w) -> acc + length(w))")
    return total.cast("double") / ws_token_count(c).cast("double")


def lang_guess(c: str, stop_threshold: float = 0.05) -> Column:
    """Tiny deterministic language-ID: CJK script detection, else an
    English stopword-ratio threshold."""
    has_cjk = F.col(c).rlike("[\\u4e00-\\u9fff]")
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(stopword_ratio(c) >= stop_threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def fingerprint(c: str, n: int = 3, keep: int = 4) -> Column:
    """Min-k sketch: the `keep` smallest md5 digests of the word
    n-shingles, concatenated — equal for near-identical docs."""
    from .dedup import shingles_expr

    hashes = F.array_sort(F.transform(shingles_expr(c, n), F.md5))
    return F.array_join(F.slice(hashes, 1, keep), "")


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = text_col
    return docs.select(
        F.col(id_col),
        F.length(F.col(c)).alias("n_chars"),
        ws_token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        mean_word_len(c).alias("mean_word_len"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite [0,1] quality score from length/stopword/word-length
    signals (deterministic: exact ratios combined linearly)."""
    c = text_col
    length_ok = (F.length(F.col(c)) >= 64) & (F.length(F.col(c)) <= 100000)
    sw = stopword_ratio(c)
    mwl = mean_word_len(c)
    score = (
        length_ok.cast("double") * 0.4
        + F.when(sw.between(0.01, 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(mwl.between(2.0, 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(F.col(id_col), score.alias("quality_score"))
