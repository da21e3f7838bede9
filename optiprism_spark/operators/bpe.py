"""Distributed BPE tokenizer training (byte-pair encoding merges).

`text.bpe_token_count` counts tokens with a FIXED pre-tokenizer; this
module learns the merge table itself from the corpus — the training
half of a tokenizer pipeline, beyond anything the reference ships
(its scope ends at product analytics; training-data tooling is this
repo's extension mandate).

Algorithm (Sennrich et al. 2016, the standard greedy BPE): start from
character-split words, repeatedly count adjacent symbol pairs weighted
by word frequency, merge the globally most frequent pair everywhere,
n_merges times.

Scale shape — the part that matters at 100 TB:

- The corpus is reduced ONCE to the distinct-word frequency frame
  (one shuffle on word). Everything iterative happens on the VOCAB,
  which is orders of magnitude smaller than the corpus and shrinks
  further via `min_count` pruning — the same reduction every real BPE
  trainer makes; here the vocab frame itself stays distributed
  instead of being collected to one machine.
- Each iteration is one distributed pair-count aggregation (explode
  adjacent pairs → groupBy → sum, map-side combined) plus a driver
  collect of exactly ONE row (the argmax pair) — bounded by
  construction, never data-sized.
- The merge rewrite is a JVM-side `aggregate` fold over each word's
  symbol array (no Python). Lineage is cut with localCheckpoint every
  `checkpoint_every` rounds, the same discipline as
  `dedup.connected_components` — 50 chained transforms would
  otherwise stack an unbounded plan.
- Words that can no longer contain the merged pair are NOT pruned
  (any pair can become frequent later); the vocab frame is persisted
  once per checkpoint window instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import spread, track_persist

#: end-of-word sentinel (paper's </w>): lets merges distinguish
#: word-final from word-internal occurrences
EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n) distinct-word frequencies — the one corpus-sized
    reduction; everything after operates on this frame."""
    out = (
        spread(docs)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def _char_split(word_col) -> "F.Column":
    """word → [c1, c2, ..., ck, EOW] (regex splits between chars;
    filter drops the empty edge artifacts)."""
    return F.concat(
        F.filter(F.split(word_col, ""), lambda c: c != ""),
        F.array(F.lit(EOW)),
    )


def _merge_expr(a: str, b: str, src: str = "syms") -> str:
    """SQL fold that rewrites one symbol array (``src`` — an array
    expression, so batched merges chain fold-of-fold), merging every
    LEFTMOST-first non-overlapping (a, b) into a||b — the paper's
    greedy left-to-right replacement (after a merge, the new symbol
    cannot chain with the next element in the same pass)."""
    def q(s: str) -> str:
        # Spark SQL string literals treat backslash as an escape char;
        # escape it FIRST, then the quote — a symbol like '\\' would
        # otherwise emit an unterminated literal (ParseException) and
        # '\n' would silently match the wrong character
        return s.replace("\\", "\\\\").replace("'", "''")

    qa, qb = q(a), q(b)
    return f"""
    aggregate(
      {src},
      named_struct('acc', cast(array() as array<string>), 'open', false),
      (st, x) -> if(
        st.open and x = '{qb}',
        named_struct('acc', concat(slice(st.acc, 1, size(st.acc) - 1),
                                   array('{qa}' || '{qb}')),
                     'open', false),
        named_struct('acc', concat(st.acc, array(x)), 'open', x = '{qa}')),
      st -> st.acc
    )"""


def _batchable_prefix(topk: list, remaining: int, truncated: bool) -> list:
    """The prefix of a stale top-K pair-count collection that the
    SEQUENTIAL greedy trainer is guaranteed to pick, in this order,
    without recounting (guide §7.3: each recount is a driver round
    trip; batching applies several merges per collect).

    Soundness, candidate by candidate (stale = counts collected
    before any of this batch's merges):

    - The collection is the globally sorted prefix under the full
      tie-break (cnt DESC, a ASC, b ASC), so every uncollected pair
      ranks strictly after ``topk[-1]`` and every collected one is
      exactly ordered.
    - Applying merge (a, b) changes EXACTLY these counts: (x, a)
      decreases (only at "x a b" sites), (b, y) decreases (only at
      "a b y" sites), (a, b) itself is consumed, and pairs involving
      the new symbol a||b are created. Every other pair — including
      (a, y≠b) and (x≠a, b), whose sites a merge never touches — is
      untouched, so sharing a symbol with an applied merge is NOT by
      itself disqualifying; only the four patterns above are. A
      created (x, a||b) / (a||b, y) occurrence requires an "x a b" /
      "a b y" site, so its count is bounded by the stale count of
      (x, a) / (b, y) — read off the same collection, or < topk[-1]
      count if uncollected.
    - The string a||b can COLLIDE with a pre-existing symbol (e.g.
      "abc" from ("a","bc") after ("ab","c"), or a merge assembling
      the EOW marker from punctuation) — then stale pairs referencing
      it GAIN occurrences, bounded by stale(pair) + the creation
      bound. The ceiling is therefore additive: spawn bound plus the
      largest stale count referencing a||b (c_last-bounded when the
      collection was truncated).
    - Candidate k is therefore the next sequential argmax when (1) it
      shares no symbol (including created ones) with an applied
      merge — its own count is then exact, and every decreased pair
      ranked above it was applied — and (2) its count strictly
      exceeds the running ceiling on every pair the applied merges
      could have created or grown (strict, so no tie-break against
      an unknown new symbol can occur).

    Stops (never skips) at the first unprovable candidate — the next
    collect round recounts honestly."""
    applied: list = []
    lefts: set = set()     # a_j of applied merges: (x, a_j) decreased
    rights: set = set()    # b_j of applied merges: (b_j, y) decreased
    created: set = set()   # a_j||b_j: created/grown pairs, unknown count
    ceil_new = 0
    c_last = topk[-1]["cnt"] if topk else 0
    floor = c_last if truncated else 0
    for row in topk:
        a, b, cnt = row["p"]["a"], row["p"]["b"], row["cnt"]
        if cnt < 2:
            break
        if applied:
            if (b in lefts or a in rights
                    or a in created or b in created
                    or (a + b) in created):
                break
            if cnt <= ceil_new:
                break
        applied.append((a, b))
        if len(applied) >= remaining:
            break
        lefts.add(a)
        rights.add(b)
        created.add(a + b)
        s = a + b
        # pairs the merge can create: (x, a||b) at "x a b" sites —
        # bounded by stale (x, a); (a||b, y) at "a b y" sites —
        # bounded by stale (b, y)
        spawn = max([r["cnt"] for r in topk
                     if r["p"]["b"] == a or r["p"]["a"] == b] + [floor])
        # pairs the merge can GROW (symbol-string collision): stale
        # pairs already referencing the string a||b
        grow = max([r["cnt"] for r in topk
                    if r["p"]["a"] == s or r["p"]["b"] == s] + [floor])
        ceil_new = max(ceil_new, spawn + grow)
    return applied


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_count: int = 1,
    checkpoint_every: int = 10,
    batch_k: int = 1024,
) -> tuple[list, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, segmented)``: the ordered merge list
    ``[(a, b), ...]`` and the (word, n, syms) frame holding every
    vocab word's final segmentation — join the corpus's words through
    it to tokenize (`bpe_segment_table`), or count tokens without
    re-segmenting. Stops early when no pair occurs twice.

    ``batch_k``: each collect round fetches the top-``batch_k`` pairs
    (still one tiny driver transfer — pair rows are a few symbols
    each) and applies the provably-sequential prefix of them
    (`_batchable_prefix`) as chained merge folds in ONE rewrite pass
    — identical merges and vocab to the one-merge-per-round loop,
    several-fold fewer driver round trips and materializations
    (guide §7.3). The default is sized so early char-level rounds
    (alphabet² + learned symbols distinct pairs) usually collect the
    COMPLETE count table: a truncated collection forces the batch
    ceiling to assume an uncollected pair just below the cutoff,
    which mostly serializes the batch. ``batch_k=1`` restores the
    strict one-per-round loop."""
    state = track_persist(word_counts(docs, text_col, min_count).select(
        "word", "n", _char_split(F.col("word")).alias("syms")
    ))
    merges: list = []
    rounds = 0
    while len(merges) < n_merges:
        topk = (
            state.select(
                "n",
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (s, i) -> struct(s as a, syms[i + 1] as b))"
                ).alias("ps"),
            )
            .select("n", F.explode("ps").alias("p"))
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
            .limit(batch_k)
            .collect()  # the globally sorted top-K prefix — tiny
        )
        if not topk or topk[0]["cnt"] < 2:
            break
        batch = _batchable_prefix(
            topk, n_merges - len(merges), truncated=len(topk) == batch_k)
        merges.extend(batch)
        src = "syms"
        for a, b in batch:
            src = _merge_expr(a, b, src)
        nxt = state.withColumn("syms", F.expr(src))
        rounds += 1
        if rounds % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = track_persist(nxt)
        nxt.count()  # materialize before dropping the parent cache
        state.unpersist()
        state = nxt
    return merges, state


def bpe_segment_table(segmented: DataFrame) -> DataFrame:
    """(word, tokens) lookup from a `bpe_train` state frame — broadcast
    or shuffle-join the corpus's exploded words through it to tokenize;
    unseen words fall back to character splits downstream."""
    return segmented.select("word", F.col("syms").alias("tokens"))


def bpe_token_counts(
    docs: DataFrame,
    segmented: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Per-doc learned-BPE token counts: explode words, join the
    segment table, sum sizes. Unseen words count as their character
    length + 1 (the char-split fallback).

    ``broadcast_vocab``: force-broadcast the segment table. Only set
    it when the vocab is known-capped (a trained tokenizer's is; a
    min_count=1 vocab over a web corpus is distinct-word sized —
    billions of rows — and force-broadcasting it would OOM the
    driver). Default leaves the join strategy to Spark/AQE, which
    broadcasts small tables on its own."""
    words = spread(docs).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    seg = bpe_segment_table(segmented)
    if broadcast_vocab:
        seg = F.broadcast(seg)
    joined = words.join(seg, "word", "left").select(
        id_col,
        F.coalesce(
            F.size("tokens"), F.length("word") + F.lit(1)
        ).alias("k"),
    )
    return joined.groupBy(id_col).agg(F.sum("k").alias("n_bpe_tokens"))
