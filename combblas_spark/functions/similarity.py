"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; a MULTI-TABLE
random-hyperplane LSH variant as the scale path — candidates meet in an
equi-join on (table, bucket) keys and are unioned across tables
(OR-of-ANDs banding, the vector analogue of MinHash-LSH band joins in
functions.dedup), so cost is O(pairs within capped buckets), never
O(n^2). A per-bucket candidate cap bounds the quadratic in-bucket join
against skewed buckets (at 10^9 vectors a popular bucket would
otherwise hold ~10^7 rows). All arithmetic via JVM higher-order
functions (zip_with/aggregate); no Python in the row path.

The hyperplanes are a pure function of (seed, table, n_planes, dim), so
an external oracle can reproduce bucket assignments bit-for-bit by
embedding the same constants (see __spark_entry__._lsh_planes_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from combblas_spark.portable import pround


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos) — k rows per query.

    Cross join + window rank; the small side (queries) is broadcast.
    Deterministic tie-break on neighbor id. Self-matches excluded.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", pround(F.col("cos")).alias("cos"))
    )


def lsh_planes(seed: int, n_planes: int, dim: int):
    """The seeded hyperplane matrix (n_planes x dim) — one place so the
    engine and any external oracle embed IDENTICAL constants."""
    import numpy as np

    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: (id, bucket) where bucket packs the sign
    bits of n_planes seeded random projections.

    The planes come from lsh_planes(seed, ...) — a deterministic
    function of the seed only, so resume-stable and oracle-replayable.
    """
    planes = lsh_planes(seed, n_planes, dim)
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = F.aggregate(
            F.zip_with(v, w, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, t: acc + t,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return vectors.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_table_assignments(
    vectors: DataFrame,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    per_bucket_cap: int | None = None,
) -> DataFrame:
    """(id, tbl, bucket) across ``n_tables`` independent hash tables
    (table t uses seed+t), optionally capped to ``per_bucket_cap`` ids
    per (tbl, bucket).

    The cap keeps the in-bucket self-join quadratic bounded under bucket
    skew; members are kept by md5(id) order — a deterministic
    pseudo-random sample expressible identically in ANSI SQL (so capped
    results stay oracle-checkable).
    """
    tabs = []
    for t in range(n_tables):
        b = hyperplane_lsh_buckets(vectors, n_planes, seed + t, id_col, vec_col, dim)
        tabs.append(b.withColumn("tbl", F.lit(t)))
    out = tabs[0]
    for t in tabs[1:]:
        out = out.unionByName(t)
    if per_bucket_cap is not None:
        w = Window.partitionBy("tbl", "bucket").orderBy(
            F.md5(F.col("id").cast("string").cast("binary")), F.col("id"))
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_bucket_cap)
            .drop("_rk")
        )
    return out.select("id", "tbl", "bucket")


def lsh_candidate_pairs(
    vectors: DataFrame,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    per_bucket_cap: int | None = None,
) -> DataFrame:
    """Distinct undirected candidate pairs (id_a < id_b) that co-bucket
    in AT LEAST ONE table — the OR-of-ANDs banding step.

    This is the scale discipline: candidates are generated by n_tables
    equi-joins on (tbl, bucket) and deduped BEFORE any cosine is
    computed, so each surviving pair pays for exactly one exact
    verification regardless of how many tables it collided in.
    """
    # materialize: the self-join references the (windowed, capped) table
    # assignments on both sides — checkpoint so the hyperplane scoring
    # and per-bucket cap window run once
    tb = lsh_table_assignments(
        vectors, n_tables, n_planes, seed, id_col, vec_col, dim, per_bucket_cap
    ).localCheckpoint(eager=True)
    a, c = tb.alias("a"), tb.alias("c")
    return (
        a.join(c, (F.col("a.tbl") == F.col("c.tbl"))
               & (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.id") < F.col("c.id")))
        .select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        .distinct()
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    n_tables: int = 4,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    per_bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    The DEFAULT is the EXACT all-pairs path (recall 1.0) so existing
    callers never silently lose pairs; opt into use_lsh=True — the
    100-TB scale path — at the call site (as the driver's
    q_embedding_neardups does). LSH restricts candidates to pairs
    co-bucketed in >=1 of ``n_tables`` hyperplane tables with exact
    per-candidate cosine verification; recall < 1 by construction
    (measured >= 0.7 in tests/test_functions.py). Round 2 briefly
    flipped the default to LSH — reverted per ADVICE r2 (silent
    behavior change behind an unchanged signature).
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if use_lsh:
        pairs = lsh_candidate_pairs(
            vectors, n_tables, n_planes, seed, id_col, vec_col, dim, per_bucket_cap)
    else:
        ids = v.select("id")
        a, c = ids.alias("a"), ids.alias("c")
        pairs = a.join(c, F.col("a.id") < F.col("c.id")).select(
            F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
    return (
        pairs
        .join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select("id_a", "id_b",
                pround(cosine(F.col("va"), F.col("vb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_topk(
    vectors: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    per_bucket_cap: int | str | None = "auto",
) -> DataFrame:
    """Approximate all-pairs top-k: multi-table banded LSH candidates
    (union over n_tables, deduped), exact cosine per candidate, window
    top-k per query. Recall grows with n_tables (OR) and falls with
    n_planes (AND) — the standard LSH tuning knobs. per_bucket_cap
    bounds the in-bucket quadratic against bucket skew.

    per_bucket_cap="auto" (default) sizes the cap to 8x the EXPECTED
    bucket size (n / 2^n_planes, floor 128): measured at 1M vectors /
    12 planes (BENCH.md r4 ANN recall table), a cap BELOW the mean
    bucket destroys recall (cap 128 = 0.5x mean -> recall 0.12; 2x mean
    -> 0.61; 8x mean -> 0.97 at 4 tables) while still bounding skewed
    buckets' quadratic. A fixed cap cannot be right across scales —
    the old fixed default of 128 silently binds the MEAN bucket once
    n > 128 * 2^n_planes. Pass an int to pin it, None to uncap.

    Validity bound (measured at 10M vectors, BENCH.md r5): on naturally
    CLUSTERED embeddings the skewed buckets ARE the true neighbors, so
    the cap must also stay >= the expected neighborhood/cluster size —
    "auto" holds while 8n/2^n_planes >= cluster_size (10M/12 planes:
    auto 19531 > ~9.8k cluster -> recall 0.98-0.9985) and fails when
    raising n_planes pushes it below (10M/16 planes: auto 1220 < ~9.8k
    -> recall 0.53; cap 12000 or None both -> 0.995). When you raise
    n_planes to cut candidate cost, pin the cap at >= your expected
    cluster size instead of trusting "auto".
    """
    if per_bucket_cap == "auto":
        n = vectors.count()
        per_bucket_cap = max(128, (8 * n) >> n_planes)
    pairs = lsh_candidate_pairs(
        vectors, n_tables, n_planes, seed, id_col, vec_col, dim, per_bucket_cap)
    directed = pairs.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id")
    ).unionByName(pairs.select(
        F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id")))
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    scored = (
        directed
        .join(v.select(F.col("id").alias("query_id"), F.col("v").alias("qv")), "query_id")
        .join(v.select(F.col("id").alias("neighbor_id"), F.col("v").alias("nv")), "neighbor_id")
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", pround(F.col("cos")).alias("cos"))
    )


def ivf_centroids_and_assignments(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic Lloyd k-means.

    Init: the ``n_centroids`` vectors with the smallest
    md5(id) (a deterministic pseudo-random sample; TakeOrdered top-n,
    never a full sort), cid assigned in that md5 order. Per Lloyd
    iteration: assign every vector to the argmax-cosine centroid
    (cosine ROUNDED to 6dp before comparison, ties by cid — the
    rounding makes the comparison stable across engines whose
    double-sum orders differ), then recompute centroids as the
    per-component mean, ROUNDED to 6dp (same reason). A centroid that
    loses all members keeps its previous value.

    Returns (centroids(cid, cv), assignments(id, cid)). Centroids are
    driver-small (n_centroids rows) and broadcast into every
    assignment join; assignment cost is n_vectors * n_centroids dots
    per iteration — never quadratic in n_vectors. All vector math is
    JVM higher-order functions.
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    seedc = (
        v.withColumn("h", F.md5(F.col("id").cast("string").cast("binary")))
        .orderBy("h", "id").limit(n_centroids)
    )
    from combblas_spark.operators.indexing import zip_with_index
    cids = zip_with_index(
        seedc.select("id", "h"), [F.col("h").asc(), F.col("id").asc()],
        ["id"], pos_col="cid")
    cent = (
        cids.join(v, "id")
        .select("cid", F.transform("v", lambda x: pround(x.cast("double"))).alias("cv"))
    )

    def _assign(c):
        scored = (
            v.crossJoin(F.broadcast(c))
            .select("id", "cid",
                    pround(cosine(F.col("v"), F.col("cv"))).alias("cosr"))
        )
        return scored.groupBy("id").agg(
            F.min_by(F.struct("cid"), F.struct(-F.col("cosr"), F.col("cid"))).alias("b")
        ).select("id", F.col("b.cid").alias("cid"))

    for _ in range(iters):
        assign = _assign(cent)
        comp = (
            assign.join(v, "id")
            .select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos").agg(pround(F.avg(F.col("x").cast("double"))).alias("m"))
        )
        newc = (
            comp.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select("cid", F.transform("s", lambda t: t["m"]).alias("nv"))
        )
        cent = (
            cent.join(newc, "cid", "left")
            .select("cid", F.coalesce("nv", "cv").alias("cv"))
        )
    # inverted lists are built against the FINAL quantizer (faiss-style)
    return cent, _assign(cent)


def ivf_topk(
    vectors: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_list_cap: int | None = None,
) -> DataFrame:
    """IVF approximate all-pairs top-k — the inverted-file counterpart
    to lsh_topk: a deterministic k-means coarse quantizer partitions
    the corpus into ``n_centroids`` inverted lists; each vector probes
    its ``nprobe`` nearest centroids and brute-forces only those
    lists' members. Exact cosine per candidate, window top-k per
    query (ranked on the full double, output rounded 6dp — same
    contract as lsh_topk / brute_force_topk).

    Scale shape: centroids broadcast; candidate generation is an
    equi-join on cid (shuffle keyed on cid); the in-list quadratic is
    bounded by list sizes and optionally by ``per_list_cap`` (members
    kept by md5(id) order — the same deterministic skew guard as the
    LSH per_bucket_cap). At 10^9 vectors with sqrt-scaled n_centroids
    the per-list work is ~n^{3/2}/nprobe, never n^2.
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cent, assign = ivf_centroids_and_assignments(
        vectors, n_centroids, iters, id_col, vec_col)
    if per_list_cap is not None:
        w = Window.partitionBy("cid").orderBy(
            F.md5(F.col("id").cast("string").cast("binary")), F.col("id"))
        assign = (
            assign.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_list_cap).drop("_rk")
        )
    probes = (
        v.crossJoin(F.broadcast(cent))
        .select("id", "cid",
                pround(cosine(F.col("v"), F.col("cv"))).alias("cosr"))
    )
    pw = Window.partitionBy("id").orderBy(F.col("cosr").desc(), F.col("cid").asc())
    probes = (
        probes.withColumn("_rk", F.row_number().over(pw))
        .filter(F.col("_rk") <= nprobe)
        .select(F.col("id").alias("query_id"), "cid")
    )
    cands = (
        probes.join(assign.select(F.col("id").alias("neighbor_id"), "cid"), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    scored = (
        cands
        .join(v.select(F.col("id").alias("query_id"), F.col("v").alias("qv")), "query_id")
        .join(v.select(F.col("id").alias("neighbor_id"), F.col("v").alias("nv")), "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", pround(F.col("cos")).alias("cos"))
    )


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.85,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the deterministic
    k-means coarse quantizer shared with ``ivf_topk``, then compare
    pairs ONLY within a cluster; a vector is dropped when any
    smaller-id vector in its cluster has cosine >= ``threshold``
    (greedy keep-lowest-id — the same deterministic keep-first rule as
    functions.text.dedup_paragraphs; cosine rounded 6dp before the
    comparison so the decision replays bit-stably in the oracle).

    Returns (id, cid, kept) for EVERY input vector.

    Scale shape: never an all-pairs join — the quadratic is confined to
    clusters (equi-join on cid), so with sqrt-scaled ``n_centroids``
    the pair work is ~n^{3/2}/nc like ivf_topk's in-list scan; the
    quantizer itself is n*nc broadcast dots per Lloyd iteration. The
    paper's pipeline at 100 TB is exactly this: cluster once, dedup
    within clusters, tune ``threshold`` per modality.
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    _, assign = ivf_centroids_and_assignments(
        vectors, n_centroids, iters, id_col, vec_col)
    m = v.join(assign, "id")
    dups = (
        m.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "cid")
        .join(m.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "cid"),
              "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(pround(cosine(F.col("va"), F.col("vb"))) >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assign.join(dups.withColumn("_dup", F.lit(True)), "id", "left")
        .select("id", "cid", F.col("_dup").isNull().alias("kept"))
    )


# ------------------------------------- token-space cosine (inverted index)

def tf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_cos: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Sparse cosine similarity join over TF (term-frequency) vectors —
    the token-space companion to the set-based Jaccard joins in
    functions.dedup, and the classic "more-like-this" primitive.

    Returns (id_a, id_b, dot, cos) with id_a < id_b and cos >= min_cos,
    where dot = sum_t tf_a(t)*tf_b(t) over shared tokens and
    cos = dot / sqrt(|a|^2 * |b|^2). dot and both squared norms are
    INTEGERS (exact under any aggregation order), so the rounded cosine
    is bit-portable across engines — the same integer-moments trick the
    assortativity/transitivity oracles use.

    Scale design (100 TB corpus):
    - Never an all-pairs product: documents meet through an INVERTED
      INDEX equi-join on the token key (term-at-a-time), so cost is
      sum_t df(t)^2, not n^2 — the sparse-SpGEMM shape (A^T A on the
      doc x token TF matrix, same plan family as operators/spgemm).
    - ``max_df`` drops tokens appearing in more than that many docs
      BEFORE the self-join (stopwords are the token-space hubs: one
      token with df=10^6 alone contributes 5*10^11 pairs). This is the
      standard AllPairs/tf-idf practice and the exact analogue of the
      co-citation hub cap in algorithms/linkanalysis.
    - Norms are computed over the KEPT tokens only, so cos stays a true
      cosine in the pruned space (<=1.0 always).
    - The pair aggregate is a partial+final hash agg: map-side combine
      absorbs same-partition token collisions before the shuffle.
    """
    from combblas_spark.functions.text import word_tokens

    if not 0.0 < min_cos <= 1.0:
        raise ValueError(f"min_cos must be in (0, 1], got {min_cos}")
    tf = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(word_tokens(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        if max_df < 2:
            raise ValueError(f"max_df must be >= 2, got {max_df}")
        keep = (
            tf.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df).select("tok")
        )
        tf = tf.join(keep, "tok", "left_semi")
    tf = tf.persist()
    norms = tf.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = tf.select(F.col("tok"), F.col("id").alias("id_a"), F.col("tf").alias("_ta"))
    b = tf.select(F.col("tok"), F.col("id").alias("id_b"), F.col("tf").alias("_tb"))
    dots = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_ta") * F.col("_tb")).alias("dot"))
    )
    out = (
        dots.join(norms.withColumnRenamed("id", "id_a")
                       .withColumnRenamed("n2", "_na"), "id_a")
        .join(norms.withColumnRenamed("id", "id_b")
                   .withColumnRenamed("n2", "_nb"), "id_b")
        .select(
            "id_a", "id_b", "dot",
            pround(
                F.col("dot").cast("double")
                / F.sqrt((F.col("_na") * F.col("_nb")).cast("double"))).alias("cos"),
        )
        .where(F.col("cos") >= min_cos)
    )
    return out


def kcenter_select(embs: DataFrame, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Greedy k-center (farthest-point traversal, Gonzalez 1985)
    coreset selection — the diversity-sampling primitive for training-
    data curation: the selected k embeddings 2-approximate the optimal
    k-center cover, so downstream dedup/curriculum code can treat them
    as maximally-spread exemplars. Returns (pos, vec_id, d2): selection
    order (0-based), the chosen id, and the squared euclidean distance
    to the previously-selected set at selection time (0.0 for the
    seed), rounded 6dp.

    Deterministic: seed = smallest id; ties on distance break to the
    smaller id. Bit-portable: d2 is composed as
    (dot(a,a) + dot(b,b)) - 2*dot(a,b) with the same left-fold dot
    product the ANN operators use, so the DuckDB twin (list_dot_product
    has the same fold order) matches to the bit and the argmax picks
    the same point.

    Scale shape: k supersteps, each ONE scan computing a running
    elementwise min against a broadcast single center and ONE argmax
    (orderBy-limit-1, a tree reduce — no global sort materializes).
    State is (id, vec, mind) — linear; nothing pairwise. The k
    collected rows are scalars, the same convergence-read pattern as
    pagerank's delta. For k in the thousands you'd batch centers per
    pass (k-center++ style); this operator targets exemplar-scale k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _sqdist(v: Column, center: list[float]) -> Column:
        c = F.array(*[F.lit(float(x)) for x in center])
        return (_dot(v, v) + _dot(c, c)) - F.lit(2.0) * _dot(v, c)

    pts = embs.select(F.col(id_col).cast("long").alias("id"),
                      F.col(vec_col).alias("v"))
    seed = pts.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("kcenter_select: empty input")
    chosen = [(0, seed[0]["id"], 0.0)]
    center = list(seed[0]["v"])
    state = pts.where(F.col("id") != seed[0]["id"]).withColumn(
        "mind", _sqdist(F.col("v"), center))
    from combblas_spark.runtime.plans import superstep_checkpoint

    for pos in range(1, k):
        top = state.orderBy(F.desc("mind"), "id").limit(1).collect()
        if not top:
            break  # fewer than k distinct points
        chosen.append((pos, top[0]["id"], top[0]["mind"]))
        center = list(top[0]["v"])
        state = superstep_checkpoint(
            state.where(F.col("id") != top[0]["id"])
            .withColumn("mind", F.least("mind", _sqdist(F.col("v"), center))),
            pos)
    # round in-engine (F.round), not in Python: python round() is
    # banker's rounding, the engines' ROUND is half-away — the twin
    # applies the same in-engine ROUND
    return embs.sparkSession.createDataFrame(
        chosen, "pos int, vec_id long, d2 double"
    ).select("pos", "vec_id", pround("d2").alias("d2"))


def quantize_embeddings(embs: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization of an embedding column — the storage
    path for ANN at crawl scale (4x smaller than float32; FAISS's SQ8):
    per-dimension corpus min/max define a linear grid, each value maps
    to code = floor((x - min_d) / (max_d - min_d) * 255) clamped to
    [0, 255] (degenerate dimensions with max = min code to 0). Returns
    (id_col, codes: array<int>) with codes in dimension order.

    Scale shape: one posexplode + map-side-combinable per-dimension
    min/max agg (collapses to n_dims rows), one broadcast join back,
    one per-vector reassembly agg. All arithmetic is single IEEE ops
    mirrored in the DuckDB twin — floor/least of exact doubles, so
    codes are bit-portable.
    """
    e = embs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    s = e.groupBy("d").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("x") - F.col("mn"))
                    / (F.col("mx") - F.col("mn")) * F.lit(255.0)),
            F.lit(255).cast("long"),
        ).cast("int"))
    return (
        e.join(F.broadcast(s), "d")
        .select("id", "d", code.alias("code"))
        .groupBy("id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("d", "code"))),
            lambda st: st["code"]).alias("codes"))
        .select(F.col("id").alias(id_col), "codes")
    )


def mutual_topk_pairs(topk: DataFrame) -> DataFrame:
    """Mutual-nearest-neighbor pairs from any (query_id, neighbor_id,
    cos) top-k table (the brute_force_topk / lsh_topk / ivf_topk output
    schema): (id_a, id_b, cos) with id_a < id_b kept only when BOTH
    directions appear in the top-k — the reciprocal-match (MNN)
    criterion, the high-precision pair rule for semantic-dedup anchors
    and cross-batch alignment (Haghverdi et al. 2018's MNN notion,
    applied to a document-embedding corpus).

    One self-equi-join of the top-k table on the reversed (query,
    neighbor) key — candidate-sized, never corpus-squared (the
    quadratic part, if any, lives in how the caller built the top-k:
    brute force at small n, LSH/IVF at scale). cos is taken from the
    a->b row; cosine is symmetric and both engines round identically,
    so the direction choice is value-neutral.
    """
    t2 = topk.select(F.col("query_id").alias("neighbor_id"),
                     F.col("neighbor_id").alias("query_id"))
    return (
        topk.join(t2, ["query_id", "neighbor_id"], "left_semi")
        .where(F.col("query_id") < F.col("neighbor_id"))
        .select(F.col("query_id").alias("id_a"),
                F.col("neighbor_id").alias("id_b"), "cos")
    )
