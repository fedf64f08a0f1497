"""Deterministic HyperLogLog distinct-count sketches.

The cardinality sibling of the ANF Flajolet-Martin neighborhood
sketches (algorithms/anf.py): per-key approximate distinct counts in
one pass with a fixed 2^p-register budget, mergeable by register-wise
max (Flajolet et al. 2007). CombBLAS exposes reduction sketches
through Reduce/EstimateNNZ-style aggregates; at crawl scale the HLL
shape is what replaces COUNT(DISTINCT url) per host — the exact
distinct needs a full shuffle of the values, the sketch shuffles 2^p
small integers per key.

Determinism / bit-portability contract (what makes the DuckDB oracle
twin exact): the hash is md5-derived (not Spark's private xxhash), the
register is a string-length computation on bin(), the register merge
is MAX (order-free), and the harmonic-mean denominator sums 64 exact
powers of two — every partial sum is a multiple of 2^-27 bounded by
64, i.e. representable in < 34 bits, so the double sum is EXACT in any
aggregation order. No ln/exp/pow anywhere (raw HLL estimate, no
small-range linear-counting correction — documented, deterministic,
and twin-exact; accuracy vs exact counts is pytest-asserted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from combblas_spark.portable import pround

HLL_P = 6  # 2^6 = 64 registers; standard error 1.04/sqrt(64) ~ 13%


def _hash32(val: Column) -> Column:
    """First 32 bits of md5 as a long — identical to DuckDB's
    ('0x' || substr(md5(v), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(val.cast("string").cast("binary")), 1, 8),
                  16, 10).cast("long")


def hll_register_rank(val: Column, p: int = HLL_P) -> tuple[Column, Column]:
    """(register index, rank) for one value: the top ``p`` hash bits
    pick the register, the rank is the 1-based position of the first
    set bit in the remaining ``32 - p`` bits (all-zero -> 32 - p + 1).
    bin() returns the minimal binary string in both engines, so
    rank = width - length(bin(rest)) + 1 with a zero guard."""
    w = 32 - p
    h = _hash32(val)
    idx = F.shiftright(h, w)
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rest)) + 1)
    return idx, rank


def hll_distinct(df: DataFrame, key_col: str, val_col: str,
                 p: int = HLL_P) -> DataFrame:
    """Per-key HLL distinct-count estimate of ``val_col``. Returns
    (key_col, distinct_est) with the raw HLL estimate rounded to 6dp.

    Scale shape: one map-side-combinable groupBy((key, idx)).max —
    duplicate values collapse in the map phase, the shuffle carries at
    most 2^p rows per key — then a 2^p-row-per-key re-aggregation.
    The register grid is completed by a broadcast crossJoin with the
    2^p indices so absent registers count as rank 0 (the HLL spec),
    costing keys x 2^p tiny rows. Merging more data later is the same
    groupBy-max — the sketch is a CRDT.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    alpha_mm = (0.7213 / (1.0 + 1.079 / m)) * m * m
    idx, rank = hll_register_rank(F.col(val_col), p)
    regs = (
        df.select(F.col(key_col).alias("_k"), idx.alias("_i"), rank.alias("_r"))
        .groupBy("_k", "_i").agg(F.max("_r").alias("_r"))
    )
    spark = df.sparkSession
    grid = (
        df.select(F.col(key_col).alias("_k")).distinct()
        .crossJoin(F.broadcast(spark.range(m).select(F.col("id").alias("_i"))))
    )
    return (
        grid.join(regs, ["_k", "_i"], "left")
        .select("_k", F.coalesce("_r", F.lit(0)).alias("_r"))
        .groupBy("_k")
        .agg(F.sum(F.lit(1.0)
                   / F.expr("shiftleft(cast(1 as bigint), _r)").cast("double"))
             .alias("_s"))
        .select(F.col("_k").alias(key_col),
                pround(F.lit(alpha_mm) / F.col("_s")).alias("distinct_est"))
    )


# ------------------------------------------------------------- count-min

CMS_D = 4    # hash rows; P(overcount > 2e/w * N) <= e^-d
CMS_W = 256  # buckets per row; additive error ~ 2N/w at 1 - e^-d


def cms_bucket(val: Column, row: Column | int, w: int = CMS_W) -> Column:
    """Row-salted bucket index: md5("row:value") folded to 32 bits,
    mod w. _hash32 is non-negative, so % == pmod and the DuckDB twin
    is ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 8))
    ::BIGINT % w."""
    r = F.lit(row) if isinstance(row, int) else row
    return _hash32(F.concat_ws(":", r.cast("string"), val.cast("string"))) % w


def cms_sketch(df: DataFrame, val_col: str,
               d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch of the multiset ``df[val_col]``: (row, bucket,
    cnt) with d*w rows total. The frequency sibling of hll_distinct:
    HLL answers "how many distinct", CMS answers "how often is THIS
    one" with a one-sided (>=) error bound, in fixed d*w space.

    Scale shape: the d-way row fan-out is a broadcast crossJoin (no
    shuffle), and the groupBy((row, bucket)).count is map-side
    combinable, so the shuffle carries at most d*w rows per input
    partition regardless of input size. Merging sketches from more
    data (or from a stream) is cnt-sum on (row, bucket) — a CRDT,
    same contract as the HLL register max-merge.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    spark = df.sparkSession
    rows = F.broadcast(spark.range(d).select(F.col("id").cast("int").alias("row")))
    return (
        df.select(F.col(val_col).alias("_v"))
        .crossJoin(rows)
        .groupBy("row", cms_bucket(F.col("_v"), F.col("row"), w).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, val_col: str,
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Point-frequency estimates for every distinct probe value:
    (val_col, est) with est = min over the d probed registers —
    always >= the true count, never under. The sketch side is d*w
    rows, so it broadcasts; the probe side stays distributed."""
    spark = probes.sparkSession
    rows = F.broadcast(spark.range(d).select(F.col("id").cast("int").alias("row")))
    keyed = (
        probes.select(F.col(val_col).alias("_v")).distinct()
        .crossJoin(rows)
        .withColumn("bucket", cms_bucket(F.col("_v"), F.col("row"), w))
    )
    return (
        keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("_v")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(F.col("_v").alias(val_col), "est")
    )


def bloom_build(df: DataFrame, val_col: str = "v", m_words: int = 8,
                k: int = 3) -> DataFrame:
    """Bloom filter over a value column as a tiny (word_idx, bits)
    table: k bit positions per value from the md5 counter-hash
    (pos_j = H(j || ':' || v) % 63*m_words — 63 usable bits per word:
    bit 63 would make DuckDB raise on 1<<63 where Spark silently wraps
    to min-long, the engine/oracle divergence class events_graph guards
    against), words OR-merged. bit_or
    is a CRDT — the filter is identical under ANY partitioning,
    duplication, or merge order, which is what makes it buildable
    map-side at corpus scale and bit-identical to the DuckDB twin.
    False-positive rate ~ (1 - e^{-kn/m})^k; size the filter with
    m_words >> k*n/64 or accept the documented FP rate.

    The scale story: membership against a benchmark/blocklist becomes
    a BROADCAST of m_words longs instead of an equi-join against the
    full benchmark table — the standard decontamination fast path,
    with the exact join reserved for the bloom hits.
    """
    if m_words < 1 or k < 1:
        raise ValueError(
            f"bloom_build: m_words and k must be >= 1, got {m_words}, {k}")
    m_bits = m_words * 63
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    staged = df.select(F.col(val_col).cast("string").alias("v")) \
        .where(F.col("v").isNotNull()).select("v", j)
    key = F.concat_ws(":", F.col("j").cast("string"), F.col("v"))
    pos = (F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10)
           .cast("long") % m_bits)
    # SQL-expr mask: F.shiftleft only takes a literal shift count, the
    # shiftleft SQL function accepts a column
    return (
        staged.select(pos.alias("pos"))
        .select(F.expr("CAST(pos / 63 AS BIGINT)").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(pos % 63 AS INT))").alias("_m"))
        .groupBy("word_idx").agg(F.bit_or("_m").alias("bits"))
    )


def bloom_contains(df: DataFrame, val_col: str, bloom: DataFrame,
                   m_words: int = 8, k: int = 3,
                   out_col: str = "bloom_hit") -> DataFrame:
    """Membership probe against a bloom_build filter (built with the
    SAME m_words and k): appends ``out_col`` (true = possibly member,
    false = definitely not). The filter joins as a broadcast of
    m_words rows; per row the probe is k hash evaluations + a
    bool_and — no benchmark-sized join.

    DISTINCT-ROWS CONTRACT (ADVICE r4): the k probes re-aggregate by
    ``*df.columns``, so input rows that are duplicated across EVERY
    column collapse to ONE output row — "append a column" semantics
    hold only for distinct-row inputs (every registry/pipeline caller
    keys rows by a unique doc/shingle id). Callers with genuine
    full-row duplicates must add a unique key column first (e.g.
    ``monotonically_increasing_id``) and drop it after.
    """
    m_bits = m_words * 63
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    probes = df.select("*", j)
    key = F.concat_ws(":", F.col("j").cast("string"),
                      F.col(val_col).cast("string"))
    pos = (F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10)
           .cast("long") % m_bits)
    probes = probes.select(*df.columns, pos.alias("pos")).select(
        *df.columns, F.expr("CAST(pos / 63 AS BIGINT)").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CAST(pos % 63 AS INT))").alias("_m"))
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m")) != 0)
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn("_h", hit.cast("int"))
        .groupBy(*df.columns)
        .agg((F.min("_h") == 1).alias(out_col))
    )
