"""URL canonicalization and duplicate-URL grouping.

The first dedup pass every web pipeline runs BEFORE any content-level
dedup: collapse URL variants (fragment, tracking params, default port,
case of scheme/host, trailing slashes) to one canonical form, so the
same page fetched under five spellings is stored and processed once.
At Common-Crawl scale this is the cheapest dedup there is — a pure
codegen projection plus one hash aggregate keyed on the canonical
string; no joins, no Python.

Canonical rule (applied in order):
  1. strip the fragment (``#...``),
  2. lowercase the scheme and authority (host[:port]) — the path and
     query keep their case (paths ARE case-sensitive),
  3. drop a default port (``:80`` for http, ``:443`` for https),
  4. remove ``utm_*`` tracking query parameters,
  5. strip trailing slashes.

Dialect note: every regex is Java-regex + RE2 compatible and every
replacement is a CONSTANT — capture-group replacements are deliberately
avoided because the syntax diverges (``$1`` in Java vs ``\\1`` in RE2),
which would silently desync the DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from combblas_spark.portable import pround

# scheme://authority prefix (everything before the first /, ? or #
# after the scheme separator)
_PREFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
# the same scheme://authority grammar with the authority captured —
# ONE copy of the rule for every host-keyed op (the DuckDB twins
# mirror the literal by design)
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# ...and with the path captured
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def host_of(url: Column) -> Column:
    """Lowercased authority (host[:port]) of a URL."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rule; pure Column ops."""
    u = F.regexp_replace(url, "#.*$", "")                      # 1. fragment
    prefix = F.lower(F.regexp_extract(u, _PREFIX_RE, 0))       # 2. case
    rest = F.substring(u, F.length(prefix) + F.lit(1), F.lit(2_147_483_647))
    prefix = (
        F.when(prefix.startswith("https://") & prefix.endswith(":443"),
               F.substring(prefix, F.lit(1), F.length(prefix) - 4))
        .when(prefix.startswith("http://") & prefix.endswith(":80"),
              F.substring(prefix, F.lit(1), F.length(prefix) - 3))
        .otherwise(prefix)                                     # 3. port
    )
    u = F.concat(prefix, rest)
    # 4. utm_* params: mid-list (&utm_x=v), then leading-with-successor
    # (?utm_x=v& -> ?), then lone (?utm_x=v$) — constant replacements
    u = F.regexp_replace(u, "&utm_[A-Za-z0-9_]*=[^&#]*", "")
    u = F.regexp_replace(u, "[?]utm_[A-Za-z0-9_]*=[^&#]*&", "?")
    u = F.regexp_replace(u, "[?]utm_[A-Za-z0-9_]*=[^&#]*$", "")
    return F.regexp_replace(u, "/+$", "")                      # 5. slashes


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group URL variants by canonical form: one row per canonical URL
    with n_variants (distinct raw spellings) and rep_url (the
    lexicographically smallest raw spelling — a deterministic fetch
    representative). One projection + one hash aggregate; the map-side
    combine absorbs same-partition variants before the shuffle."""
    return (
        df.select(F.col(url_col).alias("_u"),
                  canonicalize_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count_distinct("_u").alias("n_variants"),
             F.min("_u").alias("rep_url"))
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """Redirect-chain resolution — the crawl-frontier op after URL
    canonicalization: follow each page's redirect to its final target.

    ``edges`` is a redirect multigraph (src, dst); a page's redirect is
    its MINIMUM dst (deterministic single-successor rule — real crawls
    keep one Location header per fetch; on the synthetic multigraph the
    min is the reproducible stand-in). Pages with no out-edge are FINAL.
    Returns (id, target, looped): the absorbing page reached within
    ``max_hops`` hops, or — when the chain is still unresolved after
    the cap (a redirect loop, or a chain longer than any real client
    follows; browsers cap at ~20) — the current chain position with
    looped = true.

    Pointer DOUBLING with absorbing terminals: t_0(v) = f(v) (self for
    finals), t_{k+1}(v) = t_k(t_k(v)) — ceil(log2(max_hops)) self-joins
    total resolve every chain of length <= max_hops, the same
    SpMV/Extract composition as FastSV's grandparent step
    (operators/indexing.py vector_extract; reference CC.h:1384 family).
    Each round is ONE vertex-sized equi-join: the 10^12-page frontier
    costs ~4 joins, not 16 sequential gathers.
    """
    if max_hops < 1:
        raise ValueError(f"resolve_redirects: max_hops must be >= 1, got {max_hops}")
    from combblas_spark.graph import vertices

    verts = vertices(edges)
    f = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("t"))
    )
    t = (
        verts.join(f, "id", "left")
        .select("id", F.coalesce("t", F.col("id")).alias("t"))
        .localCheckpoint(eager=True)
    )
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        nxt = t.select(F.col("id").alias("t"), F.col("t").alias("_tt"))
        t = t.join(nxt, "t").select("id", F.col("_tt").alias("t"))
        t = t.localCheckpoint(eager=True)
    final = t.select(F.col("t").alias("id")).distinct() \
        .join(f, "id", "left_semi")  # targets that still redirect = unresolved
    return (
        t.join(final.select(F.col("id").alias("t"), F.lit(True).alias("_l")),
               "t", "left")
        .select("id", F.col("t").alias("target"),
                F.coalesce("_l", F.lit(False)).alias("looped"))
    )


def path_rollup(df: DataFrame, url_col: str = "url",
                max_depth: int = 5) -> DataFrame:
    """URL path-hierarchy rollup — page counts per (host, path-prefix)
    subtree, the crawl-analytics view behind 'which sections of this
    site did we crawl and how deep': every page contributes one count
    to each of its path prefixes up to ``max_depth`` segments.
    Returns (host, depth, prefix, n_pages) where prefix is the
    slash-joined first ``depth`` segments.

    Scale shape: host/path split is a codegen projection; the prefix
    fan-out is ≤ max_depth rows per page (array-side transform over a
    MATERIALIZED segment column — the per-element re-evaluation
    lesson), collapsed by one map-side-combinable groupBy. No window,
    no Python.
    """
    if max_depth < 1:
        raise ValueError(f"path_rollup: max_depth must be >= 1, got {max_depth}")
    url = F.col(url_col)
    host = host_of(url)
    path = F.regexp_extract(url, _PATH_RE, 1)
    staged = df.select(
        host.alias("host"),
        F.filter(F.split(path, "/"), lambda s: s != F.lit("")).alias("_segs"),
    )
    segs = F.col("_segs")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.least(F.size(segs), F.lit(max_depth))),
        lambda d: F.struct(
            d.cast("long").alias("depth"),
            F.array_join(F.slice(segs, 1, d), "/").alias("prefix"),
        ),
    )
    return (
        staged.where(F.size(segs) >= 1)
        .select("host", F.explode(prefixes).alias("p"))
        .groupBy("host", "p.depth", "p.prefix")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def mirror_hosts(pages: DataFrame, url_col: str = "url",
                 text_col: str = "text", min_shared: int = 2,
                 max_df: int = 16) -> DataFrame:
    """Mirror-site detection — host pairs serving >= ``min_shared``
    identical pages (by content fingerprint): the host-granularity
    dedup every crawl runs to collapse example.com / example.org
    mirrors before content-level dedup ever sees their pages.
    Returns (host_a, host_b, shared, frac) with host_a < host_b and
    frac = shared / min(distinct fingerprints per host) — containment,
    so a small full mirror of a big site still scores ~1.0.

    Scale shape: the pair join is on the content fingerprint with a
    host-frequency cap (``max_df`` — a fingerprint served by half the
    web is boilerplate, not mirroring, and would explode one join
    key); candidate work per fingerprint is bounded by max_df^2.
    Identical df-capped-join shape as chunk_dedup_pairs / winnow_pairs.
    """
    from combblas_spark.functions.text import fingerprint

    if min_shared < 1:
        raise ValueError(
            f"mirror_hosts: min_shared must be >= 1, got {min_shared}")
    if max_df < 2:
        raise ValueError(f"mirror_hosts: max_df must be >= 2, got {max_df}")
    host = host_of(F.col(url_col))
    hf = pages.select(host.alias("host"),
                      fingerprint(F.col(text_col)).alias("fp")).distinct() \
        .localCheckpoint(eager=True)
    nh = hf.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
    rare = (
        hf.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df).select("fp")
    )
    keyed = hf.join(rare, "fp")
    a = keyed.select("fp", F.col("host").alias("host_a"))
    b = keyed.select("fp", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b").agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    na = nh.select(F.col("host").alias("host_a"), F.col("_n").alias("_na"))
    nb = nh.select(F.col("host").alias("host_b"), F.col("_n").alias("_nb"))
    return (
        pairs.join(na, "host_a").join(nb, "host_b")
        .select("host_a", "host_b", "shared",
                pround(F.col("shared").cast("double")
                        / F.least("_na", "_nb").cast("double")).alias("frac"))
    )
