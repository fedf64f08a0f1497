"""Synthetic Common-Crawl-style pages table + HTML->text/link extraction.

BASELINE.json input_hint: the engine's primary input is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``; edges are extracted from html via VECTORIZED pandas/
Arrow UDFs with a per-row invariant: extracted text byte-identical per
url to a pure-Python reference extractor. This module provides

* ``reference_extract_text`` / ``reference_extract_links`` — the pure
  Python oracle (one row at a time),
* ``extract_pages_udf`` columns — the Arrow-batched pandas-UDF twin,
* ``generate_pages`` — the deterministic seeded fixture (FIXTURES.md §1),
* ``pages_to_edges`` — pages -> (src_url, dst_url) -> dense-id edge
  table, the analogue of ReadGeneralizedTuples' label->id pass
  (SpParMat.cpp:3895).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from combblas_spark.graph import relabel_to_dense_ids
from combblas_spark.sources.rmat import rmat_pandas

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)
_HREF_RE = re.compile(r'<a href="([^"]*)"')
_ANCHOR_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')


def _anchor_term(i: int, j: int) -> str:
    """Deterministic anchor text for the link page i -> page j: a
    target-topic term most of the time, an alternate vocabulary from
    every third source — so a target's anchor profile is a non-trivial
    multiset (the aggregation under test is not constant-per-target)."""
    return f"t{j % 23}" if i % 3 else f"x{j % 7}"


# ----------------------------------------------------------- reference oracle

def reference_extract_text(html: bytes) -> str:
    """Pure-Python reference extractor: title + paragraphs joined by \\n.

    This is the per-row byte-identity oracle (input_hint). Kept
    deliberately regex-simple so the vectorized twin is provably
    identical.
    """
    s = html.decode("utf-8")
    parts = []
    m = _TITLE_RE.search(s)
    if m:
        parts.append(m.group(1))
    parts.extend(_PARA_RE.findall(s))
    return "\n".join(parts)


def reference_extract_links(html: bytes) -> list[str]:
    """Pure-Python reference link extractor (ordered hrefs)."""
    return _HREF_RE.findall(html.decode("utf-8"))


def reference_extract_anchors(html: bytes) -> list[tuple]:
    """Pure-Python reference anchor extractor: ordered (href, term)."""
    return _ANCHOR_RE.findall(html.decode("utf-8"))


# ------------------------------------------------------- vectorized twin UDFs

@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched twin of reference_extract_text (no per-row Python at
    the Spark API surface; pandas vectorized str ops inside)."""
    s = html.apply(lambda b: b.decode("utf-8"))
    raw_title = s.str.extract(_TITLE_RE.pattern, flags=re.S, expand=False)
    has_title = raw_title.notna()     # from the same extract — no second
    title = raw_title.fillna("")      # regex pass, no pandas group warning
    paras = s.str.findall(_PARA_RE.pattern, flags=re.S)
    joined = paras.str.join("\n")
    # branch on the paragraph LIST being empty, not the joined STRING:
    # title + one empty <p></p> must yield "T\n" ("\n".join(["T", ""]))
    # like the reference, not bare "T" (review finding r4 — the old
    # joined=="" condition dropped the trailing newline there)
    n_paras = paras.str.len()
    out = title.where(~has_title | (n_paras == 0), title + "\n" + joined)
    out = out.where(has_title, joined)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched twin of reference_extract_links."""
    return html.apply(lambda b: b.decode("utf-8")).str.findall(_HREF_RE.pattern)


@F.pandas_udf(T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("term", T.StringType()),
])))
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched twin of reference_extract_anchors."""
    found = html.apply(lambda b: b.decode("utf-8")).str.findall(_ANCHOR_RE.pattern)
    return found.apply(lambda lst: [{"href": h, "term": t} for h, t in lst])


def anchor_term_index(pages: DataFrame) -> DataFrame:
    """Per-target anchor-term index — the classic search-ranking signal
    (what the web says a page is about): explode every (href, term)
    anchor and count term occurrences per target url. One explode + one
    groupBy; the decode stays Arrow-batched."""
    a = pages.select(F.explode(extract_anchors_udf(F.col("html"))).alias("a"))
    return (
        a.select(F.col("a.href").alias("url"), F.col("a.term").alias("term"))
        .groupBy("url", "term").agg(F.count(F.lit(1)).alias("n"))
    )


# ----------------------------------------------------------------- generator

def _url(i: int, n_sites: int) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_sites: int = 10,
    out_links_per_page: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic seeded pages table (FIXTURES.md §1).

    Out-links of page i are the dst endpoints of RMAT edges
    {i*L .. i*L+L-1} mapped into the page-id space — so the derived link
    graph equals the RMAT fixture by construction. Built with
    mapInPandas over spark.range: scales linearly, no driver
    materialization.
    """
    import numpy as np

    scale = max(1, (n_pages - 1).bit_length())
    parts = num_partitions or spark.sparkContext.defaultParallelism
    L = out_links_per_page

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            # vectorized link sampling for the whole batch
            eids = (ids[:, None] * L + np.arange(L)[None, :]).ravel()
            _, dsts = rmat_pandas(eids.astype(np.int64), scale, seed)
            dsts = (dsts % n_pages).reshape(len(ids), L)
            for k, i in enumerate(ids):
                i = int(i)
                text_i = f"page {i} body word{i % 7} word{i % 13} tail{i % 3}"
                links = [int(j) for j in dsts[k] if int(j) != i]
                html = (
                    f"<html><head><title>Page {i}</title></head>"
                    f"<body><p>{text_i}</p>"
                    + "".join(
                        f'<a href="{_url(j, n_sites)}">{_anchor_term(i, j)}</a>'
                        for j in links)
                    + "</body></html>"
                ).encode("utf-8")
                rows.append(
                    {
                        "url": _url(i, n_sites),
                        "warc_ts": pd.Timestamp("2025-01-01T00:00:00Z") + pd.Timedelta(seconds=i),
                        "html": html,
                        "text": reference_extract_text(html),
                        "lang": "en" if i % 10 != 0 else "de",
                    }
                )
            yield pd.DataFrame(rows)

    base = spark.range(0, n_pages, numPartitions=parts)
    return base.mapInPandas(
        gen, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


# ------------------------------------------------------------ pages -> edges

def extract_link_edges(pages: DataFrame) -> DataFrame:
    """pages -> (src_url, dst_url) via the vectorized link extractor."""
    return (
        pages.select("url", F.explode(extract_links_udf(F.col("html"))).alias("dst_url"))
        .select(F.col("url").alias("src_url"), "dst_url")
    )


HOST_RE = r"^https?://([^/]+)"


def host_link_graph(pages: DataFrame, drop_self: bool = True) -> DataFrame:
    """Host-level contraction of the page link graph: (src_host,
    dst_host, weight) where weight = number of page-level links.

    The standard Common-Crawl coarsening (page graph -> host graph,
    cf. the CC host-level webgraph releases): host parse is a JVM
    regexp Column, the contraction is one groupBy — the Galerkin
    triple-product R A R^T of operators/spgemm.py specialised to the
    0/1 host-membership R, fused into the extraction so page-level
    edges never materialize wide. drop_self removes intra-host links
    (the usual convention for host-graph analyses)."""
    url_edges = extract_link_edges(pages)
    hosts = url_edges.select(
        F.regexp_extract("src_url", HOST_RE, 1).alias("src_host"),
        F.regexp_extract("dst_url", HOST_RE, 1).alias("dst_host"),
    )
    if drop_self:
        hosts = hosts.filter(F.col("src_host") != F.col("dst_host"))
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def pages_to_edges(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full ingestion: html -> links -> url dictionary -> dense-id edges.

    Returns (edges(src,dst), url_dict(id,label)). The dictionary join is
    the ReadGeneralizedTuples analogue (SpParMat.cpp:3895).
    """
    return relabel_to_dense_ids(extract_link_edges(pages), ("src_url", "dst_url"))
