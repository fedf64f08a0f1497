"""End-to-end north-star pipeline: synthetic Common-Crawl-style pages
-> Arrow-UDF link extraction -> dense-id edge table -> PageRank + CC,
validated against numpy on the same extracted edges (BASELINE.json
north_star shape, in miniature)."""

import numpy as np
from pyspark.sql import functions as F

from combblas_spark.algorithms import connected_components, pagerank
from combblas_spark.graph import build_graph
from combblas_spark.sources.pages import generate_pages, pages_to_edges


def test_pages_to_pagerank_end_to_end(spark):
    pages = generate_pages(spark, n_pages=400)
    edges, url_dict = pages_to_edges(pages)
    g = build_graph(edges).persist()

    rows = g.collect()
    n = url_dict.count()
    assert n >= 400  # every page url present (plus any link-only urls)

    # numpy oracle on the SAME extracted edges
    A = np.zeros((n, n))
    for r in rows:
        A[r["src"], r["dst"]] = 1.0
    outdeg = A.sum(axis=1)
    alpha = 0.85
    r_np = np.full(n, 1.0 / n)
    for _ in range(200):
        dang = r_np[outdeg == 0].sum()
        inflow = (A / np.where(outdeg[:, None] > 0, outdeg[:, None], 1.0)).T @ r_np
        nxt = (1 - alpha) / n + alpha * (inflow + dang / n)
        if np.abs(nxt - r_np).sum() < 1e-12:
            r_np = nxt
            break
        r_np = nxt

    got = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-12).collect()}
    assert len(got) == n
    for i in range(n):
        assert abs(got[i] - r_np[i]) < 1e-6  # north rule: allclose 1e-6

    # CC exact vs union-find on the same edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = find(r["src"]), find(r["dst"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    expected = {i: find(i) for i in range(n)}
    # normalize: component label = min member id
    comp_min = {}
    for i, c in expected.items():
        comp_min.setdefault(c, i)
    expected = {i: comp_min[c] for i, c in expected.items()}

    got_cc = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    assert got_cc == expected
    g.unpersist()
