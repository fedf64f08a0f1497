"""Web-page ingestion tests: byte-identity of the vectorized extractor
vs the pure-Python reference (BASELINE.json input_hint per-row
invariant), link-graph derivation, RMAT generator determinism."""

from pyspark.sql import functions as F

from combblas_spark.sources.pages import (
    generate_pages, reference_extract_text, reference_extract_links,
    extract_text_udf, extract_links_udf, pages_to_edges, extract_link_edges,
)
from combblas_spark.sources.rmat import rmat_edges
from combblas_spark.graph import build_graph, relabel_to_dense_ids


def test_extractor_byte_identity(spark):
    """The Arrow-UDF extractor must be byte-identical per url to the
    pure-Python reference extractor (input_hint)."""
    pages = generate_pages(spark, n_pages=100, n_sites=7).persist()
    got = pages.select(
        "url", "html",
        extract_text_udf(F.col("html")).alias("udf_text"),
        F.col("text").alias("stored_text"),
    ).collect()
    assert len(got) == 100
    for r in got:
        ref = reference_extract_text(bytes(r["html"]))
        assert r["udf_text"] == ref, f"udf != reference for {r['url']}"
        assert r["stored_text"] == ref
    # adversarial shapes (r4 review: title + empty <p></p> must keep the
    # trailing newline "T\n" = "\n".join(["T", ""]))
    hard = [
        (0, b"<title>T</title><p></p>"),
        (1, b"<title>T</title>"),
        (2, b"<p></p>"),
        (3, b""),
        (4, b"<p>a</p><p></p><p>b</p>"),
        (5, b"<title></title><p>x</p>"),
    ]
    hdf = spark.createDataFrame(hard, "url long, html binary")
    for r in hdf.select("url", "html",
                        extract_text_udf(F.col("html")).alias("t")).collect():
        assert r["t"] == reference_extract_text(bytes(r["html"])), r["url"]


def test_link_extractor_identity(spark):
    pages = generate_pages(spark, n_pages=50).persist()
    got = pages.select("url", "html", extract_links_udf(F.col("html")).alias("links")).collect()
    for r in got:
        assert list(r["links"]) == reference_extract_links(bytes(r["html"]))


def test_anchor_extractor_identity(spark):
    """Anchor (href, term) pairs: Arrow UDF == pure-Python reference;
    the per-target index matches a Counter over the reference."""
    from collections import Counter

    from combblas_spark.sources.pages import (
        anchor_term_index, extract_anchors_udf, reference_extract_anchors)

    pages = generate_pages(spark, n_pages=60, n_sites=5).persist()
    got = pages.select(
        "url", "html", extract_anchors_udf(F.col("html")).alias("an")).collect()
    want = Counter()
    for r in got:
        ref = reference_extract_anchors(bytes(r["html"]))
        assert [(a["href"], a["term"]) for a in r["an"]] == ref
        want.update(ref)
    idx = {(r["url"], r["term"]): r["n"] for r in anchor_term_index(pages).collect()}
    assert idx == dict(want) and len({t for _, t in idx}) > 1


def test_pages_to_edges_roundtrip(spark):
    pages = generate_pages(spark, n_pages=64, n_sites=4).persist()
    edges, url_dict = pages_to_edges(pages)
    ne = edges.count()
    assert ne > 0
    # every edge endpoint resolves back to a url in the dictionary
    nd = url_dict.count()
    assert edges.agg(F.max("src")).collect()[0][0] < nd
    assert edges.agg(F.max("dst")).collect()[0][0] < nd
    # dictionary ids are dense 0..nd-1
    ids = [r["id"] for r in url_dict.select("id").collect()]
    assert sorted(ids) == list(range(nd))
    # edges by label == edges by id mapped back
    by_label = {(r["src_url"], r["dst_url"]) for r in extract_link_edges(pages).collect()}
    lookup = {r["id"]: r["label"] for r in url_dict.collect()}
    by_id = {(lookup[r["src"]], lookup[r["dst"]]) for r in edges.collect()}
    assert by_id == by_label


def test_rmat_deterministic_across_partitioning(spark):
    a = sorted((r["src"], r["dst"]) for r in rmat_edges(spark, 6, 4, seed=9, num_partitions=2).collect())
    b = sorted((r["src"], r["dst"]) for r in rmat_edges(spark, 6, 4, seed=9, num_partitions=7).collect())
    assert a == b
    c = sorted((r["src"], r["dst"]) for r in rmat_edges(spark, 6, 4, seed=10).collect())
    assert a != c


def test_rmat_skew(spark):
    """RMAT with the Graph500 initiator must be skewed (hub vertices)."""
    g = build_graph(rmat_edges(spark, 8, 8, seed=1))
    degs = g.groupBy("src").count().orderBy(F.col("count").desc()).limit(1).collect()
    n_src = g.select("src").distinct().count()
    avg = g.count() / n_src
    assert degs[0]["count"] > 4 * avg  # heavy hitter exists


def test_build_graph_semantics(spark):
    raw = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (1, 1, 5.0), (2, 0, 1.0)],
        "src long, dst long, val double")
    g = {(r["src"], r["dst"]): r["val"] for r in build_graph(raw).collect()}
    assert g == {(0, 1): 3.0, (2, 0): 1.0}  # summed dup, dropped loop
    gs = {(r["src"], r["dst"]): r["val"]
          for r in build_graph(raw, symmetrize=True).collect()}
    assert gs == {(0, 1): 3.0, (1, 0): 3.0, (2, 0): 1.0, (0, 2): 1.0}


def test_relabel_deterministic(spark):
    e = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("a", "b")], "src_url string, dst_url string")
    edges, d = relabel_to_dense_ids(e)
    lookup = {r["label"]: r["id"] for r in d.collect()}
    assert lookup == {"a": 0, "b": 1, "c": 2}  # sorted-label order
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(1, 0), (2, 0), (0, 1)}


def test_relabel_dictionary_plan_is_python_free(spark):
    """The label->id dictionary (ReadGeneralizedTuples analogue) is the
    mandated 100-TB ingestion path: its physical plan must contain no
    Python evaluation node (VERDICT r2 — the round-2 RDD zipWithIndex
    pickled every row through a Python worker)."""
    e = spark.createDataFrame(
        [(f"u{i}", f"u{(i * 7) % 50}") for i in range(200)],
        "src_url string, dst_url string")
    _, d = relabel_to_dense_ids(e)
    plan = d._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"Python stage in dictionary plan:\n{plan}"
    # the physical plan's checkpoint leaf prints as Scan ExistingRDD for
    # JVM and Python RDDs alike — the JVM lineage is where a Python
    # stage would actually show (PythonRDD)
    lineage = d._jdf.queryExecution().toRdd().toDebugString()
    assert "PythonRDD" not in lineage, f"PythonRDD in lineage:\n{lineage}"


def test_relabel_parallelism_invariant(spark):
    """Same label->id mapping regardless of input partitioning (the
    checkpointed sort pins partition boundaries between the count pass
    and the offset pass)."""
    rows = [(f"u{(i * 13) % 97}", f"u{(i * 29) % 97}") for i in range(300)]
    e = spark.createDataFrame(rows, "src_url string, dst_url string")
    _, d1 = relabel_to_dense_ids(e.repartition(1))
    _, d17 = relabel_to_dense_ids(e.repartition(17))
    m1 = {r["label"]: r["id"] for r in d1.collect()}
    m17 = {r["label"]: r["id"] for r in d17.collect()}
    assert m1 == m17
    assert sorted(m1.values()) == list(range(len(m1)))


def test_bucketed_edge_table_roundtrip_and_exchange_free_plans(spark, tmp_path):
    """write_bucketed_edges persists the hash-bucketed CSR-run layout
    (north star: 'hash-partitioned CSR-block tables'); on reload, joins
    and aggs on the bucket key must read the edge side with NO exchange
    and NO sort — only the vector moves (the cold-load analogue of the
    in-loop regime partitioning in pagerank.py/components.py)."""
    from combblas_spark.sources.io import read_bucketed_edges, write_bucketed_edges

    e = spark.createDataFrame(
        [(i % 23, (i * 7) % 23, float(i % 5)) for i in range(400)],
        "src long, dst long, val double",
    )
    write_bucketed_edges(e, "t_bkt_edges", buckets=4, key="src",
                         path=str(tmp_path / "tbl"))
    try:
        t = read_bucketed_edges(spark, "t_bkt_edges")
        # round-trip: same edge multiset
        assert sorted(map(tuple, t.collect())) == sorted(map(tuple, e.collect()))

        def final_plan(df):
            df.collect()
            s = df._jdf.queryExecution().executedPlan().toString()
            return s.split("+- == Initial Plan ==")[0]

        # aggregation on the bucket key: zero exchanges anywhere
        agg = t.groupBy("src").agg(F.sum("val").alias("s"))
        p = final_plan(agg)
        assert "Bucketed: true" in p
        assert "Exchange" not in p, p

        # SpMV-shaped join on the bucket key (force SMJ so the shuffle
        # shape is visible): exactly ONE exchange and ONE sort — both on
        # the vector side; the bucketed edge scan feeds the join bare.
        vec = spark.createDataFrame(
            [(i, float(i)) for i in range(23)], "src long, r double")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = t.join(vec, "src").select("dst", (F.col("val") * F.col("r")).alias("c"))
            p = final_plan(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in p, p
        assert p.count("Exchange hashpartitioning") == 1, p
        assert p.count("Sort ") == 1, p
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_edges")


def test_pagerank_edge_layout_over_bucketed_table(spark, tmp_path):
    """pagerank(edge_layout="src") over a bucketed-by-src table must give
    identical ranks to the default path (layout only affects placement),
    in both regimes."""
    from combblas_spark.algorithms.pagerank import pagerank
    from combblas_spark.sources.io import read_bucketed_edges, write_bucketed_edges

    e = spark.createDataFrame(
        [(i % 13, (i * 5 + 1) % 13, 1.0) for i in range(60)],
        "src long, dst long, val double",
    ).groupBy("src", "dst").agg(F.lit(1.0).alias("val"))
    write_bucketed_edges(e, "t_bkt_pr", buckets=4, key="src",
                         path=str(tmp_path / "prtbl"))
    try:
        t = read_bucketed_edges(spark, "t_bkt_pr")
        ref = {r["id"]: r["rank"] for r in pagerank(e, n_iter=8).collect()}
        for bmax in (0, 8_000_000):  # shuffle + broadcast regimes
            got = {
                r["id"]: r["rank"]
                for r in pagerank(t, n_iter=8, broadcast_max_vertices=bmax,
                                  edge_layout="src").collect()
            }
            assert got.keys() == ref.keys()
            for k in ref:
                assert abs(got[k] - ref[k]) < 1e-12
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_pr")


def test_cc_assume_symmetric_layout_over_bucketed_table(spark, tmp_path):
    """connected_components(assume_symmetric, edge_layout) over a
    bucketed symmetric adjacency matches the default path in both
    regimes."""
    from combblas_spark.algorithms.components import connected_components
    from combblas_spark.graph import symmetrize
    from combblas_spark.sources.io import read_bucketed_edges, write_bucketed_edges

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6), (6, 0), (7, 8)],
        "src long, dst long",
    ).withColumn("val", F.lit(1.0))
    write_bucketed_edges(symmetrize(e), "t_bkt_cc", buckets=4, key="src",
                         path=str(tmp_path / "cctbl"))
    try:
        t = read_bucketed_edges(spark, "t_bkt_cc")
        ref = {r["id"]: r["comp"] for r in connected_components(e).collect()}
        for bmax in (0, 8_000_000):
            got = {
                r["id"]: r["comp"]
                for r in connected_components(
                    t, broadcast_max_vertices=bmax,
                    assume_symmetric=True, edge_layout="src").collect()
            }
            assert got == ref
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_cc")


def test_trustrank_host_ranking(spark):
    """End-to-end webspam-demotion pipeline: synthetic pages -> host
    contraction -> weighted personalized PageRank on trusted seeds.
    Values are oracle-checked by the driver gate; here: probability
    mass conserved, all hosts ranked, seeds carry the restart floor."""
    from pyspark.sql import functions as F

    from combblas_spark.algorithms.pagerank import pagerank
    from combblas_spark.sources.pages import generate_pages, host_link_graph

    pages = generate_pages(spark, n_pages=120)
    hg = host_link_graph(pages).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"),
        F.col("weight").cast("double").alias("val"))
    seeds = ["site0.example", "site5.example"]
    tele = spark.createDataFrame([(h, 1.0) for h in seeds], ["id", "t"])
    r = pagerank(hg, n_iter=8, weighted=True, teleport=tele).collect()
    trust = {row["id"]: row["rank"] for row in r}
    assert len(trust) == 10
    assert abs(sum(trust.values()) - 1.0) < 1e-9
    # seeds keep at least the (1-alpha)*t restart floor
    for h in seeds:
        assert trust[h] >= (1 - 0.85) * 0.5 - 1e-12
