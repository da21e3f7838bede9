"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the scale path. Both are
declarative: the dot products run as `aggregate`/`zip_with`
higher-order expressions inside codegen — no Python.

Scale notes:
- brute force is O(|Q| · N): fine when the query set is broadcast-
  small; the N-side stays partition-parallel and never shuffles.
- LSH variant buckets vectors by sign-bit sketch (deterministic
  md5-seeded hyperplanes), then searches only same-bucket pairs;
  recall/cost tuned by the number of planes. At 100 TB this is the
  difference between a cross join and a bucketed equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread
from .sizing import hyperplane_bands, ivf_params, lsh_planes, validate_ann_params


def _auto_planes(planes, embeddings: DataFrame) -> int:
    """Resolve planes="auto" from corpus size (sizing.lsh_planes);
    numeric values pass through validated. The count is parquet-
    footer metadata — no data scan."""
    if planes == "auto":
        planes = lsh_planes(embeddings.count())
    validate_ann_params(planes=planes)
    return planes


def _auto_ivf(n_centroids, nprobe, embeddings: DataFrame) -> tuple[int, int]:
    """Resolve n_centroids/nprobe="auto" (sizing.ivf_params:
    n_centroids ~ sqrt N)."""
    if n_centroids == "auto" or nprobe == "auto":
        p = ivf_params(embeddings.count())
        if n_centroids == "auto":
            n_centroids = p["n_centroids"]
        if nprobe == "auto":
            nprobe = min(p["nprobe"], n_centroids)
    validate_ann_params(n_centroids=n_centroids, nprobe=nprobe)
    return n_centroids, nprobe


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold — deterministic summation order.

    Measured against a statically-unrolled 64-term getItem expression
    on 2M pairs: the fold wins (9.7 s vs 15.5 s single-task) — the
    unrolled tree blows past codegen method limits and falls back to
    interpreted evaluation of a 64-deep Add chain with per-element
    ANSI bounds checks. Pair-stage throughput comes from partition
    parallelism (see `spread` at the call sites), not from unrolling."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot_sql(a: str, b: str) -> str:
    """SQL-text twin of _dot (same fold, same 0.0D double seed) —
    parsed-SQL construction because each Python-lambda fold costs
    ~15 py4j round-trips to build (guide §7.3)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
            "(acc, x) -> acc + x)")


def _norm_sql(a: str) -> str:
    """SQL-text twin of _norm."""
    return f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + x * x))"


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    (query_id, neighbor_id, rank, sim): rank by similarity desc with
    neighbor-id tie-break; self-matches excluded. The broadcast hint
    keeps the big side shuffle-free."""
    from pyspark.sql import Window

    # norms are loop-invariant across the |Q|·N pair fan-out: fold
    # each side's norm ONCE below the join (a projection the join
    # cannot inline upward), so each pair costs one dot + one divide
    # instead of three interpreted array folds. Same doubles: same
    # dot fold, same sqrt-of-squares norms, same multiply order.
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("__qn", _norm(F.col("qv")))
    # pair-stage parallelism must scale with the |Q|·N comparison
    # count, not the input file layout: a small-but-dense corpus
    # parquet arrives as one partition and would pin the whole
    # comparison loop to one core (measured 32× on local[32])
    e = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ev")
    ).withColumn("__en", _norm(F.col("ev")))
    sims = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id",
                    f"{_dot_sql('qv', 'ev')} / (__qn * __en) AS sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def hyperplane_bucket(vec: Column, planes: int = 4, offset: int = 0) -> Column:
    """Deterministic sign-bit sketch: plane p's component d is
    md5-derived in [-0.5, 0.5); bucket = sum of sign bits.
    ``offset`` shifts the plane seed (plane p hashes as ``offset+p``)
    so banded callers draw INDEPENDENT hyperplane sets per band while
    offset=0 callers keep their historical buckets.

    The projection iterates the vector ITSELF (transform with index),
    not a fixed-dim sequence: zip_with against sequence(0, dim-1)
    null-padded any vector shorter than dim, nulling the fold and
    collapsing EVERY vector into bucket 0 — the LSH join silently
    became the quadratic cross join it exists to avoid. This also
    matches the DuckDB oracle, which folds over the actual list.

    Built from the passed ``vec`` Column (not a fixed column name) so
    any caller frame works — e.g. embedding_near_pairs exposes av/bv.

    Kept as a HOF fold, NOT a statically-unrolled getItem chain: a
    256-term unrolled projection measured ~3× slower end-to-end at
    sf0.1 (the chain exceeds codegen method limits and drops to
    interpreted Add nodes with per-element ANSI bounds checks — see
    the `_dot` note). Per-ROW sketch cost is O(N), never the
    bottleneck; partition parallelism covers it.
    """
    def _component(p):
        # NB: higher-order lambdas must take EXACTLY the arity Spark
        # expects (2 for transform-with-index) — close over p
        def f(x, i):
            h = F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{p}:"), i.cast("string"))), 1, 8),
                16, 10,
            ).cast("double")
            return x * (h / F.lit(4294967296.0) - F.lit(0.5))

        return f

    bucket = F.lit(0)
    for p in range(planes):
        comp = F.aggregate(
            F.transform(vec, _component(offset + p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    exact: bool = False,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (doc_a, doc_b, sim) with
    doc_a < doc_b and cosine >= threshold.

    The DEFAULT path is hyperplane-LSH bucketed: both sides are
    bucketed by the deterministic sign-bit sketch and only same-bucket
    pairs are compared — a bucketed equi-join instead of a cross join,
    at the cost of missing near-dups that straddle a hyperplane. This
    is the only shape that survives 100 TB; ``exact=True`` opts into
    the O(N²) id-inequality self-join, which exists as the correctness
    baseline (differential oracle) and for small inputs only.

    Norms are hoisted into the per-ROW projections (N sqrt-folds, not
    N² — the division `dot/(na·nb)` is float-identical to computing
    cosine per pair, so oracle hashes are unchanged)."""
    # BOTH sides spread: the pair stage's work is Σ bucket² (or N²
    # exact), so its parallelism cannot be inherited from the input
    # file layout. At toy scale the planner auto-broadcasts one side
    # (sub-threshold stats) — spreading both guarantees the STREAMED
    # side has ≥ defaultParallelism partitions whichever it picks; at
    # 100 TB neither side is broadcastable and this degrades to the
    # shuffle join on the bucket key, where the scan is already
    # parallel and spread() is a no-op. No forced broadcast hints: a
    # corpus self-join side must never carry one.
    if exact:
        a = spread(embeddings).select(
            F.col(id_col).alias("doc_a"), _as_double(F.col(vec_col)).alias("av")
        ).withColumn("na", _norm(F.col("av")))
        b = spread(embeddings).select(
            F.col(id_col).alias("doc_b"), _as_double(F.col(vec_col)).alias("bv")
        ).withColumn("nb", _norm(F.col("bv")))
        joined = a.join(b, F.col("doc_a") < F.col("doc_b"))
    else:
        from ._util import track_persist

        planes = _auto_planes(planes, embeddings)
        # ONE persisted (id, v, norm, bucket) frame feeds both join
        # sides — the per-row sketch (planes folds over the vector)
        # and the corpus scan would otherwise run twice per call,
        # exactly the doubled cost the IVF path documents avoiding
        base = track_persist(
            spread(embeddings).select(
                F.col(id_col).alias("__id"),
                _as_double(F.col(vec_col)).alias("__v"),
            )
            .withColumn("__n", _norm(F.col("__v")))
            .withColumn("__bkt", hyperplane_bucket(F.col("__v"), planes))
        )
        a = base.select(
            F.col("__id").alias("doc_a"), F.col("__v").alias("av"),
            F.col("__n").alias("na"), "__bkt")
        b = base.select(
            F.col("__id").alias("doc_b"), F.col("__v").alias("bv"),
            F.col("__n").alias("nb"), "__bkt")
        joined = a.join(b, "__bkt").filter(F.col("doc_a") < F.col("doc_b"))
    sim = F.expr(f"{_dot_sql('av', 'bv')} / (na * nb)")
    return (
        joined.select("doc_a", "doc_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("doc_a", "doc_b", F.round("sim", 6).alias("sim"))
    )


def _coarse_centroids(
    embeddings: DataFrame, n_centroids: int, id_col: str, vec_col: str,
    method: str = "sample",
) -> DataFrame:
    """Coarse quantizer for the IVF index: (centroid_id, cv).

    - ``sample`` (default): lowest-id vectors — deterministic, which is
      what the cross-engine oracle needs.
    - ``kmeans``: pyspark.ml KMeans (fixed seed) — trained centroids
      give far better recall at the same nprobe; the IVF plan shape
      (assign → probe → bucketed join → re-rank) is identical, so the
      swap is invisible to callers."""
    if method == "sample":
        return (
            embeddings.orderBy(id_col).limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), _as_double(F.col(vec_col)).alias("cv"))
        )
    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = embeddings.select(
            array_to_vector(_as_double(F.col(vec_col))).alias("features")
        )
        model = KMeans(k=n_centroids, seed=7, maxIter=20).fit(feats)
        spark = embeddings.sparkSession
        rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        return spark.createDataFrame(rows, "centroid_id long, cv array<double>")
    raise ValueError(f"unknown centroid method {method!r}")


def _assign_to_centroids(
    df: DataFrame, cent: DataFrame, id_alias: str, vec_alias: str, n: int,
    id_col: str, vec_col: str, keep_norm: bool = False,
) -> DataFrame:
    """nearest-n centroids by cosine (tie-break: lowest centroid id).

    n == 1 (the corpus-side assignment — the BIG side at scale) is a
    pure per-row argmax fold over the broadcast centroid array: NO
    shuffle, no window — the corpus's only shuffle stays the
    downstream join on centroid_id. The fold walks centroids in
    ascending-id order with a strict ``>``, so the first maximum wins
    — float-identical to the rank-1 row of the window formulation
    (same cosine fold, same tie-break), which the DuckDB oracle uses.
    (An unrolled literal-centroid `greatest()` variant measured ~3×
    slower — giant expression trees fall out of codegen; see
    `hyperplane_bucket`.)

    n > 1 (query-side nprobe — the small side) keeps the broadcast
    join + per-vector rank window.

    Strength reduction (guide §1.2 step 2 — per-task work): cosine =
    dot/(‖v‖·‖c‖), and both norms are loop-invariant across the
    centroid walk — ‖v‖ per input row, ‖c‖ per centroid. They are
    computed ONCE (row norm in a prior projection, centroid norms
    inside the broadcast struct) and each per-centroid sim is built
    by `transform` exactly once before the argmax fold compares it —
    the previous fold's when(cosine > …, struct(cosine, …)) shape
    evaluated every cosine twice and re-folded both norms per
    centroid (6 interpreted array folds per centroid per row vs 1
    dot now). The doubles are identical: same dot fold, same
    sqrt-of-squares norms, same multiply/divide order, same strict->
    first-maximum-wins walk in ascending centroid order.

    ``keep_norm``: also return the row norm as ``__vn`` so downstream
    re-rank stages reuse it instead of re-folding the array."""
    from pyspark.sql import Window

    base = df.selectExpr(
        f"`{id_col}` AS `{id_alias}`",
        f"transform(`{vec_col}`, x -> cast(x AS double)) AS `{vec_alias}`",
    ).selectExpr(
        "*", f"{_norm_sql(f'`{vec_alias}`')} AS __vn")
    norm_cols = ["__vn"] if keep_norm else []
    if n == 1:
        cents = cent.selectExpr(
            f"struct(centroid_id, cv, {_norm_sql('cv')} AS cn) AS c"
        ).agg(F.expr("sort_array(collect_list(c)) AS __cents"))
        sims = (
            "transform(__cents, c -> struct("
            f"{_dot_sql(f'`{vec_alias}`', 'c.cv')} / (__vn * c.cn) AS sim, "
            "c.centroid_id AS cid))"
        )
        best = F.expr(
            f"aggregate({sims}, "
            "struct(CAST('-Infinity' AS DOUBLE) AS sim, "
            "CAST(NULL AS BIGINT) AS cid), "
            "(acc, s) -> CASE WHEN s.sim > acc.sim THEN s ELSE acc END)"
        )
        # coalesce to a sentinel so the column is NON-NULLABLE: the
        # downstream equi-join on centroid_id infers isnotnull(key)
        # and pushes it THROUGH this projection into the broadcast
        # join condition — re-evaluating the whole argmax fold a
        # second time per corpus row (visible in the before plans'
        # `Join condition: isnotnull(aggregate(...))`). A non-null
        # key constant-folds that filter away. The sentinel can
        # never fire: any non-empty centroid array yields a real
        # cid (the first element beats the -inf seed, NaN included
        # — NaN sorts greatest), and an empty quantizer only arises
        # from an empty corpus, which has no rows to assign.
        return (
            base.join(F.broadcast(cents))
            .withColumn("centroid_id",
                        F.coalesce(best["cid"], F.lit(-1).cast("long")))
            .select(id_alias, vec_alias, "centroid_id", *norm_cols)
        )
    w = Window.partitionBy(id_alias).orderBy(F.desc("__csim"), F.asc("centroid_id"))
    return (
        base.join(F.broadcast(
            cent.selectExpr("*", f"{_norm_sql('cv')} AS __cn")))
        .selectExpr(
            "*",
            f"{_dot_sql(f'`{vec_alias}`', 'cv')} / (__vn * __cn) AS __csim")
        .withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") <= n)
        .select(id_alias, vec_alias, "centroid_id", *norm_cols)
    )


def ivf_assign(
    embeddings: DataFrame, cent: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """The IVF index frame: (id, v double[], n norm, centroid_id) —
    every vector assigned to its nearest coarse centroid. Persisted as
    a table, this IS the inverted file; `embedding_near_pairs_ivf`
    builds it per call, `embedding_incremental_pairs_ivf` appends to
    it batch by batch. spread() BEFORE the assignment keeps the frame
    — and the within-bucket pair join that dominates (Σ bucket²) —
    partition-parallel regardless of the input file layout."""
    # the assignment fold already computed the row norm once —
    # keep it as `n` instead of re-folding the array (same
    # sqrt-of-squares expression, same double)
    return _assign_to_centroids(
        spread(embeddings), cent, id_col, "v", 1, id_col, vec_col,
        keep_norm=True,
    ).withColumnRenamed("__vn", "n")


def embedding_incremental_pairs_ivf(
    new_embeddings: DataFrame,
    store: "DataFrame | None",
    cent: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket=None,
) -> "tuple[DataFrame, DataFrame]":
    """Incremental embedding near-dup: compare an ingest batch against
    the settled corpus's persisted IVF index WITHOUT re-quantizing the
    corpus — the vector twin of `dedup.lsh_incremental_pairs`.

    ``store`` is a prior `ivf_assign` frame (None = cold start);
    ``cent`` is the SAME persisted quantizer the store was built with
    — reusing it is what makes old and new assignments comparable.
    Returns ``(pairs, new_assigned)``: near-dup pairs involving >= 1
    new vector, and the assignment rows to append to the store.

    Scale shape: the store is first semi-joined on the batch's
    distinct centroid ids (broadcast — at most n_centroids values),
    so the bucketed pair join touches only store buckets the batch
    lands in; per-batch cost follows the batch and its bucket sizes,
    never the corpus. ``max_bucket`` keeps full-pipeline semantics:
    a probed centroid contributes its complete bucket (store + batch
    rows), so the observed size is the true bucket size and oversized
    buckets are dropped wholesale exactly as the full run drops them."""
    from ._util import track_persist

    new_assigned = track_persist(ivf_assign(new_embeddings, cent, id_col, vec_col))
    if store is None:
        probed = new_assigned
    else:
        new_cids = new_assigned.select("centroid_id").distinct()
        probed = store.join(F.broadcast(new_cids), "centroid_id").unionByName(
            new_assigned
        )
    if max_bucket is not None:
        from ._util import cap_buckets

        probed = cap_buckets(probed, ("centroid_id",), max_bucket)
        new_side = new_assigned.join(
            probed.select("centroid_id").distinct().hint("broadcast"),
            "centroid_id", "left_semi")
    else:
        new_side = new_assigned
    a = new_side.select(
        F.col(id_col).alias("__ida"), F.col("v").alias("av"),
        F.col("n").alias("na"), "centroid_id",
    )
    b = probed.select(
        F.col(id_col).alias("__idb"), F.col("v").alias("bv"),
        F.col("n").alias("nb"), "centroid_id",
    )
    sim = F.expr(f"{_dot_sql('av', 'bv')} / (na * nb)")
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("doc_a"),
            F.greatest("__ida", "__idb").alias("doc_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()  # new x new pairs arrive in both orders; the dot
        # product is term-order-identical either way, so (a, b, sim)
        # is bitwise-duplicated and distinct() is exact
        .select("doc_a", "doc_b", F.round("sim", 6).alias("sim"))
    )
    return pairs, new_assigned


def embedding_near_pairs_banded(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bands="auto",
    rows_per_band="auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded (OR-amplified) hyperplane LSH near-duplicate pairs —
    the recall-sound evolution of `embedding_near_pairs`.

    Single-table hyperplane LSH has recall p_plane^planes for a pair
    at the threshold angle: at near-dup thresholds and the plane
    counts a large corpus needs, that is 15–25% — three of four true
    near-dups silently missed. Banding fixes it the same way MinHash
    banding does: B independent bands of r planes each; a pair is a
    candidate if it collides in ANY band, recall 1−(1−p_plane^r)^B,
    sized to a target (sizing.hyperplane_bands) from corpus count +
    threshold. Per-band buckets are smaller (target ~64 rows vs the
    single table's ~1024), so total candidate work B·N·target is
    comparable while recall goes from a coin flip to ≥90%. Measured
    at sf0.01 (threshold 0.40, 12 total planes both ways): banded
    4×3 recall 0.695 vs single-table 0.017 against the exact O(N²)
    baseline (tests/test_pipeline_ops.py). The sizing targets
    NEAR-DUP thresholds (≥0.9); at loose thresholds the band count
    clamps and recall is bounded by the LSH family itself — no
    hyperplane scheme separates 0.4-cosine pairs well.

    Plan shape: ONE persisted (id, v, norm, buckets[B]) frame —
    B·r sign-bit folds per row, computed once — posexploded to
    (band, bucket) keys on both sides of a bucketed equi-join (never
    all-pairs); a pair colliding in several bands is deduplicated
    AFTER the threshold filter (same sim in every occurrence, so the
    groupBy shuffles only surviving (id, id, sim) triples, not
    vectors). Candidate generation stays an equi-join at any scale.
    """
    from ._util import track_persist

    if bands == "auto" or rows_per_band == "auto":
        sized = hyperplane_bands(embeddings.count(), threshold)
        bands = sized["bands"] if bands == "auto" else bands
        rows_per_band = (
            sized["rows_per_band"] if rows_per_band == "auto" else rows_per_band)
    if bands < 1 or rows_per_band < 1:
        raise ValueError(f"bands/rows_per_band must be >= 1, got {bands}/{rows_per_band}")

    base = track_persist(
        spread(embeddings).select(
            F.col(id_col).alias("__id"),
            _as_double(F.col(vec_col)).alias("__v"),
        )
        .withColumn("__n", _norm(F.col("__v")))
        .withColumn(
            "__bkts",
            F.array(*[
                hyperplane_bucket(
                    F.col("__v"), rows_per_band, offset=b * rows_per_band)
                for b in range(bands)
            ]),
        )
    )
    keyed = base.select(
        "__id", "__v", "__n",
        F.posexplode("__bkts").alias("__band", "__bkt"),
    )
    a = keyed.select(
        F.col("__id").alias("doc_a"), F.col("__v").alias("av"),
        F.col("__n").alias("na"), "__band", "__bkt")
    b = keyed.select(
        F.col("__id").alias("doc_b"), F.col("__v").alias("bv"),
        F.col("__n").alias("nb"), "__band", "__bkt")
    sim = F.expr(f"{_dot_sql('av', 'bv')} / (na * nb)")
    return (
        a.join(b, ["__band", "__bkt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("sim").alias("sim"))
        .select("doc_a", "doc_b", F.round("sim", 6).alias("sim"))
    )


def _pairs_from_assignment(assigned: DataFrame, threshold: float,
                           id_col: str) -> DataFrame:
    """The within-bucket pair join over an (id, v, n, centroid_id)
    assignment frame — shared by the per-call and store-routed IVF
    near-dup paths, so routed ≡ per-call is equality of inputs, not
    of two implementations."""
    a = assigned.select(
        F.col(id_col).alias("doc_a"), F.col("v").alias("av"),
        F.col("n").alias("na"), "centroid_id",
    )
    # NO static join-strategy hint here (r17: a forced shuffle_hash
    # hint was tried and REVERTED — it beat sort-merge by ~12% on the
    # 10× corpus, where SMJ sorts both vector-payload sides, but a
    # hint outranks the planner's broadcast choice, so on any corpus
    # whose persisted assignment fits the broadcast threshold it
    # replaced a broadcast join with a full two-sided shuffle:
    # measured 0.55 → 2.6 s at sf0.1, a 4.7× regression). The
    # size-adaptive answer is AQE's runtime SMJ→SHJ rewrite
    # (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold,
    # session.py): small assignments broadcast exactly as before,
    # and at scale the planned sort-merge is converted to a
    # shuffled-hash join at runtime — the payload sorts disappear —
    # whenever every post-shuffle partition fits the local hash map,
    # which the max_bucket cap upstream keeps true (guide §3.1).
    b = assigned.select(
        F.col(id_col).alias("doc_b"), F.col("v").alias("bv"),
        F.col("n").alias("nb"), "centroid_id",
    )
    sim = F.expr(f"{_dot_sql('av', 'bv')} / (na * nb)")
    return (
        a.join(b, "centroid_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("doc_a", "doc_b", F.round("sim", 6).alias("sim"))
    )


def embedding_near_pairs_ivf(
    embeddings: "DataFrame | None",
    threshold: float = 0.9,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "sample",
    persist_assignment: bool = True,
    max_bucket=None,
    store=None,
) -> DataFrame:
    """IVF-bucketed near-dup pairs — the scale path for all-pairs
    similarity: assign every vector to its nearest coarse centroid,
    then compare only within-bucket pairs (a bucketed self-join; work
    drops from N² to Σ bucket²). Near-identical vectors land in the
    same bucket with high probability, straddlers are the recall
    trade-off (probe >1 centroid to shrink it).

    ``persist_assignment`` (default True) materializes the (id, vec,
    centroid) frame so BOTH sides of the self-join read it instead of
    re-running the quantizer twice — at scale the assignment is a
    persisted index table; the persist is tracked, call
    `_util.unpersist_tracked()` to free executor storage in a
    long-lived session.

    ``max_bucket`` (int or "auto"): drop centroid buckets larger than
    the cap BEFORE the self-join — the same degenerate-cluster guard
    as the text-LSH path (`dedup._banded_pairs`): one dense cluster
    (zero vectors, near-identical spam embeddings) makes the Σ bucket²
    join quadratic in that cluster's size; the 10×-scale harness
    (scale_check.py) is what flagged the hazard. "auto" resolves via
    sizing.max_bucket_default(N, n_centroids). Default None keeps full
    recall (and the fixture-sized oracle hashes) for small corpora.

    ``store`` (operators/ivf_store.IvfStore): serve from the DURABLE
    index instead of building one per call — the assignment frame is
    read from the store's current generation (the SAME doubles the
    per-call path would compute, round-tripped losslessly through
    parquet, so results are bit-identical) and the quantizer is never
    touched. "auto" sizing resolves from the pointer's corpus count —
    no raw scan at all. ``embeddings``/``n_centroids``/``centroids``
    are ignored when routed; ``embeddings`` may be None."""
    from ._util import track_persist

    if store is not None:
        from pyspark.sql import SparkSession

        spark = (embeddings.sparkSession if embeddings is not None
                 else SparkSession.getActiveSession())
        info = store.info()
        assigned = store.assignment(spark).select(
            F.col(store.id_col).alias(id_col), "v", "n", "centroid_id")
        if max_bucket == "auto":
            from .sizing import max_bucket_default

            max_bucket = max_bucket_default(
                info["count"], info["n_centroids"])
    else:
        if n_centroids == "auto" or max_bucket == "auto":
            # ONE metadata count serves both sizing rules (was two
            # separate count jobs — guide §1.2: don't compute things
            # twice)
            n_rows = embeddings.count()
        if n_centroids == "auto":
            n_centroids = ivf_params(n_rows)["n_centroids"]
        validate_ann_params(n_centroids=n_centroids, nprobe=1)
        if max_bucket == "auto":
            from .sizing import max_bucket_default

            max_bucket = max_bucket_default(n_rows, n_centroids)
        cent = _coarse_centroids(
            embeddings, n_centroids, id_col, vec_col, centroids)
        assigned = ivf_assign(embeddings, cent, id_col, vec_col)
    # TWO persist points, each at a genuine reuse boundary (guide §5):
    #
    # 1. BEFORE the bucket cap, only when the assignment was BUILT
    #    here: cap_buckets consumes `assigned` twice (bucket-size
    #    count + the anti-joined main frame), and without this persist
    #    the count branch re-ran the ENTIRE quantizer+assignment chain
    #    from parquet (the r17 before plan showed two full
    #    scan→spread→argmax subtrees). A store-ROUTED assignment is a
    #    cheap memoized parquet read — caching it buys nothing and the
    #    cap's count+anti-join would re-run on both self-join sides
    #    (measured 0.18 → 0.84 s on the indexed query when r17 first
    #    moved the single persist before the cap).
    # 2. AFTER the cap, always: the pair self-join consumes the capped
    #    frame twice; this is the persist the routed path (and r16)
    #    always had. When both fire, the post-cap cache materializes
    #    from the pre-cap cache — the quantizer still runs once.
    #    Call `_util.unpersist_tracked()` after consuming the result
    #    to release both.
    if persist_assignment and store is None and max_bucket is not None:
        assigned = track_persist(assigned)
    if max_bucket is not None:
        from ._util import cap_buckets

        assigned = cap_buckets(assigned, ("centroid_id",), max_bucket)
    if persist_assignment:
        assigned = track_persist(assigned)
    return _pairs_from_assignment(assigned, threshold, id_col)


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "sample",
    store=None,
) -> DataFrame:
    """IVF-Flat approximate top-k: a coarse quantizer assigns every
    vector to its nearest centroid (one inverted list per centroid);
    each query probes only the ``nprobe`` nearest lists and re-ranks
    exactly within them.

    Centroids here are a deterministic sample (lowest ``n_centroids``
    ids) rather than trained k-means — the *plumbing* (assign → probe
    → bucketed join → re-rank) is the scale-relevant part: the big
    side shuffles once on centroid id, the centroid table broadcasts,
    and the per-query candidate set shrinks by ~nprobe/n_centroids.
    Pass ``centroids="kmeans"`` for trained centroids — better recall,
    identical plan shape.

    ``store`` (operators/ivf_store.IvfStore): the serving path — the
    corpus-side assignment and the quantizer are READ from the
    durable index; only the (tiny) query side is assigned per call.
    Per-query cost becomes probe-only, flat in corpus maintenance
    cadence; "auto" nprobe resolves from the pointer's corpus count.
    ``embeddings`` may be None when routed."""
    from pyspark.sql import Window

    from ._util import track_persist

    validate_ann_params(k=k)
    if store is not None:
        from pyspark.sql import SparkSession

        spark = (embeddings.sparkSession if embeddings is not None
                 else SparkSession.getActiveSession())
        info = store.info()
        if nprobe == "auto":
            nprobe = min(ivf_params(info["count"])["nprobe"],
                         info["n_centroids"])
        validate_ann_params(nprobe=nprobe)
        cent = track_persist(store.centroids(spark))
        # the store persists each vector's norm `n` next to `v` —
        # the re-rank divides by it instead of re-folding the array
        # per candidate pair (same double: n was computed by the
        # same sqrt-of-squares fold at build time, parquet
        # round-trips doubles losslessly)
        e = store.assignment(spark).select(
            F.col(store.id_col).alias("neighbor_id"),
            F.col("v").alias("ev"), F.col("n").alias("__en"),
            "centroid_id")
        q = _assign_to_centroids(
            queries, cent, "query_id", "qv", nprobe, id_col, vec_col,
            keep_norm=True,
        ).withColumnRenamed("__vn", "__qn")
        # no pair-dedup needed: the store's assignment holds each
        # corpus vector in exactly ONE inverted list (rn=1), so a
        # (query, neighbor) pair can match at most one probed
        # centroid — a dropDuplicates here was a full shuffle +
        # aggregate of the candidate set for rows that were already
        # unique (guide §2.4: a distinct on already-unique data)
        sims = (
            e.join(F.broadcast(q), "centroid_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .selectExpr("query_id", "neighbor_id",
                        f"{_dot_sql('qv', 'ev')} / (__qn * __en) AS sim")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        return (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim"))
        )
    n_centroids, nprobe = _auto_ivf(n_centroids, nprobe, embeddings)
    # persist the centroid table: it is derived from the full corpus
    # (TakeOrdered sample or a KMeans fit) and consumed by BOTH the
    # corpus-side and query-side assignments — unpersisted, each side
    # re-executes that full-corpus derivation
    cent = track_persist(
        _coarse_centroids(embeddings, n_centroids, id_col, vec_col, centroids)
    )
    e = _assign_to_centroids(
        spread(embeddings), cent, "neighbor_id", "ev", 1, id_col, vec_col,
        keep_norm=True,
    ).withColumnRenamed("__vn", "__en")
    q = _assign_to_centroids(
        queries, cent, "query_id", "qv", nprobe, id_col, vec_col,
        keep_norm=True,
    ).withColumnRenamed("__vn", "__qn")
    # no pair-dedup needed: the corpus side is assigned with n=1
    # (exactly one centroid per neighbor), so each (query, neighbor)
    # pair arises from at most one centroid match — see the routed
    # branch above. Norms ride along from the assignment stage, so
    # the re-rank is one dot + one divide per candidate.
    sims = (
        e.join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id",
                    f"{_dot_sql('qv', 'ev')} / (__qn * __en) AS sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    hyperplane bucket (same sign-sketch), then exact cosine re-rank."""
    from pyspark.sql import Window

    # norms hoisted below the join (once per row, not per pair) —
    # same doubles as cosine-per-pair, see cosine_topk
    def with_bucket(df, id_alias, vec_alias, norm_alias):
        return (
            df.select(F.col(id_col).alias(id_alias), _as_double(F.col(vec_col)).alias("__v"))
            .withColumn("bucket", hyperplane_bucket(F.col("__v"), planes))
            .withColumn(norm_alias, _norm(F.col("__v")))
            .withColumnRenamed("__v", vec_alias)
        )

    planes = _auto_planes(planes, embeddings)
    validate_ann_params(k=k)
    q = with_bucket(queries, "query_id", "qv", "__qn")
    e = with_bucket(spread(embeddings), "neighbor_id", "ev", "__en")
    sims = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id",
                    f"{_dot_sql('qv', 'ev')} / (__qn * __en) AS sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
