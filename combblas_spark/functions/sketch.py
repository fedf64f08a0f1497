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
                F.round(F.lit(alpha_mm) / F.col("_s"), 6).alias("distinct_est"))
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
