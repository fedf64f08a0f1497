"""Deterministic corpus sampling for training-data pipelines.

Hash-based Bernoulli sampling: a row is kept iff a 32-bit counter hash
of its key falls under rate * 2^32. Unlike DataFrame.sample this is
(a) reproducible across runs, Spark versions, partitionings and
engines (the DuckDB oracle shares the md5 formula bit-for-bit), and
(b) STABLE under corpus growth — a document's keep/drop decision never
changes when other documents are added, which is what makes sampled
eval sets and ablation subsets comparable across crawl snapshots.
Stratified variant applies a per-stratum rate so small languages /
sources are not washed out by uniform sampling.

Pure Column expressions — the sample is a filter pushed onto the scan,
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from combblas_spark.portable import pround

_BUCKETS = 1 << 32


def sample_hash(key: Column, salt: str = "sample") -> Column:
    """32-bit deterministic hash in [0, 2^32): first 8 md5 hex digits
    of 'salt:key' — the same counter-hash idiom as walks._pick (DuckDB
    twin: ('0x' || substr(md5(...), 1, 8))::BIGINT)."""
    s = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with probability ``rate``, decided by the hash of
    its key alone (exact same subset on every run and every engine)."""
    return df.where(sample_hash(F.col(key_col), salt) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. upweight low-resource
    languages): ``rates`` maps stratum value -> keep rate; strata not
    listed get ``default_rate``. The rate lookup folds into ONE chained
    CASE expression — still a scan-level filter, no join needed for a
    small stratum domain."""
    cutoff = F.lit(int(default_rate * _BUCKETS))
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == value
        lit = F.lit(int(rate * _BUCKETS))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    cutoff = cutoff if expr is None else expr.otherwise(cutoff)
    return df.where(sample_hash(F.col(key_col), salt) < cutoff)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its
    own ``weight`` column (clamped to [0, 1]) — e.g. keep documents in
    proportion to a quality score (the DCLM/FineWeb resampling move).
    Decision = hash(key) < weight * 2^32, so it inherits every
    determinism property of deterministic_sample: reproducible across
    engines/partitionings and stable under corpus growth. Still a pure
    scan-level filter — the weight expression rides along in the same
    projection, no shuffle."""
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.where(
        sample_hash(F.col(key_col), salt).cast("double") < w * float(_BUCKETS))


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    buckets: int = 256,
    smoothing: float = 1.0,
    doc_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
    materialize: bool = True,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): score every
    document by how much its hashed-unigram distribution looks like the
    TARGET slice (rows where ``is_target``) vs the whole corpus:

        weight(d) = mean over token occurrences t in d of
                    ln( p_target(bucket(t)) / p_corpus(bucket(t)) )

    with add-``smoothing`` estimates over ``buckets`` hash buckets.
    Returns (id, n_tokens, logratio); empty/token-free docs get
    logratio 0.0. Rank by logratio (or feed exp(logratio) through
    weighted_sample) to select corpus data that matches a high-quality
    target domain.

    Determinism/scale: tokens are the shared word_tokens rule
    (functions/text.py — lowercase alphanumeric runs), the bucket hash
    is the md5 counter-hash idiom (SQL-replayable), and the bucket
    tables are ``buckets`` rows — broadcast into the per-token join, so
    the whole operator is two token-level aggregations plus one
    broadcast join; nothing quadratic, no windows.
    """
    from combblas_spark.functions.text import word_tokens

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if smoothing <= 0:
        # zero smoothing divides by zero on an empty target slice and
        # sends never-seen-in-target buckets to ln(0) = -inf
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    from pyspark.storagelevel import StorageLevel

    # the token stream feeds TWO aggregations (bucket stats, then the
    # per-doc score join) — persist it so the corpus is tokenized and
    # hashed once, not twice (the DuckDB twin MATERIALIZEs tb for the
    # same reason)
    toks = docs.select(
        F.col(doc_col).alias("id"),
        is_target.alias("_t"),
        F.explode(word_tokens(F.col(text_col))).alias("tok"),
    ).select(
        "id", "_t",
        (sample_hash(F.col("tok"), salt) % buckets).alias("b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats = toks.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
    )
    totals = stats.agg(
        F.sum("cr").alias("_nr"), F.sum("ct").alias("_nt"))
    s = float(smoothing)
    lm = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.log(
                ((F.col("ct") + s) / (F.col("_nt") + s * buckets))
                / ((F.col("cr") + s) / (F.col("_nr") + s * buckets))
            ).alias("_lr"),
        )
    )
    scored = (
        toks.join(F.broadcast(lm), "b")
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"),
             pround(F.avg("_lr")).alias("logratio"))
    )
    out = (
        docs.select(F.col(doc_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("logratio", F.lit(0.0)).alias("logratio"),
        )
    )
    if not materialize:
        # leave the plan inspectable (explain audit); toks stays
        # registered — caller consumes promptly
        return out
    try:
        return out.localCheckpoint(eager=True)
    finally:
        toks.unpersist()


def per_group_cap(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group quota: keep at most ``k`` rows per group
    (the C4-style head-domain suppression — without it the biggest
    hosts dominate the corpus). Survivors are the k smallest by
    (hash(key), key) — a uniform random-but-reproducible choice, NOT
    first-k-in-scan-order, so the kept subset is partition-invariant
    and stable across runs.

    Scale: one window rank per group. For the pathological single
    giant group a window is still a single-partition sort of that
    group; at the 100 TB design point hosts are many and Zipf-ish, so
    the rank parallelizes across groups — the same skew profile as
    every groupBy here. (A two-phase hash-agg top-k would avoid the
    sort but loses the exact rank tie-break the oracle checks.)"""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = sample_hash(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def mix_to_budget(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Token-budget source mixing (the Pile/Dolma mixture stage): given
    target mixture ``weights`` (stratum -> share of the budget) and a
    total ``budget_tokens``, derive each stratum's deterministic keep
    rate

        rate_s = min(1.0, (budget * w_s) / tokens_s)

    and apply the stable counter-hash Bernoulli filter. Strata not in
    ``weights`` (and token-free strata) are dropped. Returns the kept
    rows of ``docs`` unchanged.

    In expectation the kept corpus has ~budget*w_s tokens per stratum,
    capped at the stratum's full size (an under-resourced stratum
    cannot be upsampled by a filter — it is kept whole; the documented
    remedy at mixture time is epoch repetition, not row duplication
    here). Decisions depend only on (salt, doc id), so growing other
    strata never flips a document — snapshots stay comparable.

    Bit-portability: the per-stratum totals are exact integer aggs
    (collected — the stratum domain is small by construction); rate
    and cutoff are composed with the identical IEEE ops in the DuckDB
    twin (min, one division, one multiply, floor). The filter itself
    is the shared md5 counter hash — a scan-level predicate, zero
    shuffle at apply time.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    from combblas_spark.functions.text import word_tokens

    totals = {
        r["s"]: int(r["t"])
        for r in docs.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(F.size(word_tokens(F.col(text_col)))).alias("t"))
        .collect()
    }
    expr = None
    for stratum, w in sorted(weights.items()):
        t = totals.get(stratum, 0)
        rate = 0.0 if t == 0 else min(1.0, (budget_tokens * w) / t)
        cond = F.col(stratum_col) == stratum
        cut = F.lit(int(rate * _BUCKETS))
        expr = F.when(cond, cut) if expr is None else expr.when(cond, cut)
    if expr is None:
        return docs.where(F.lit(False))
    cutoff = expr.otherwise(F.lit(0))
    return docs.where(sample_hash(F.col(id_col), salt) < cutoff)
