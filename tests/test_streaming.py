"""Structured Streaming: incremental edge-table maintenance.

Drops event-batch parquet files into a stream source dir, drains with
availableNow, and checks the merged edge table equals the batch build
over the union — the streaming twin of the SpParMat-ctor
duplicate-summing semantics (SpParMat.h:85-86). Also verifies the
delta-log sink's two scale properties: replayed micro-batches are
idempotent (at-least-once foreachBatch), and compaction rewrites ONLY
touched bucket partitions, never the whole table.
"""

import datetime as dt
import os

from pyspark.sql import functions as F

from combblas_spark.graph import HASH_C, build_graph
from combblas_spark.streaming import (
    compact_edge_table,
    read_edge_table,
    run_edge_merge,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, dt.datetime(2025, 1, 1, 0, 0, s), uid, "click", 1.0, "{}")
         for eid, s, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _expected(spark, rows, nv):
    raw = _events(spark, rows).select(
        F.col("user_id").alias("src"),
        ((F.col("event_id") * F.lit(HASH_C)) % F.lit(nv)).alias("dst"),
    )
    return {(r["src"], r["dst"]): r["val"] for r in build_graph(raw).collect()}


def test_stream_merge_equals_batch_build(spark, tmp_path):
    nv = 16
    src_dir = str(tmp_path / "in")
    table = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")

    batch1 = [(i, i % 60, i % nv) for i in range(40)]
    batch2 = [(100 + i, i % 60, (i * 3) % nv) for i in range(40)]
    _events(spark, batch1).write.mode("append").parquet(src_dir)

    q = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q.awaitTermination(120)

    _events(spark, batch2).write.mode("append").parquet(src_dir)
    q2 = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q2.awaitTermination(120)

    got = {(r["src"], r["dst"]): r["val"]
           for r in read_edge_table(spark, table).collect()}
    assert got == _expected(spark, batch1 + batch2, nv)

    # compaction must not change the logical view
    n = compact_edge_table(spark, table)
    assert n >= 1
    after = {(r["src"], r["dst"]): r["val"]
             for r in read_edge_table(spark, table).collect()}
    assert after == got


def test_stream_dedup_replayed_events(spark, tmp_path):
    """The same event file content replayed (new file, same event_ids)
    must not double-count within the watermark."""
    nv = 16
    src_dir = str(tmp_path / "in")
    table = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")

    rows = [(i, i % 60, i % nv) for i in range(30)]
    _events(spark, rows).write.mode("append").parquet(src_dir)
    _events(spark, rows).write.mode("append").parquet(src_dir)  # replay

    q = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q.awaitTermination(120)

    got = {(r["src"], r["dst"]): r["val"]
           for r in read_edge_table(spark, table).collect()}
    assert got == _expected(spark, rows, nv)


def test_replayed_micro_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: applying the SAME batch_id twice
    must leave the table unchanged (delta dir overwritten in place)."""
    nv = 16
    table = str(tmp_path / "edges")
    sums = (
        spark.createDataFrame([(1, 2, 3.0), (4, 5, 1.0)], "src long, dst long, val double")
        .withColumn("bucket", F.pmod(F.hash("src"), F.lit(32)))
    )
    path = os.path.join(table, "delta", "batch=7")
    sums.write.mode("overwrite").parquet(path)
    sums.write.mode("overwrite").parquet(path)  # replay of batch 7
    got = {(r["src"], r["dst"]): r["val"]
           for r in read_edge_table(spark, table).collect()}
    assert got == {(1, 2): 3.0, (4, 5): 1.0}


def test_compaction_rewrites_only_touched_buckets(spark, tmp_path):
    """A delta touching one src bucket must not rewrite other base
    bucket partitions (dynamic partition overwrite, O(delta) not
    O(table))."""
    nv = 16
    table = str(tmp_path / "edges")

    def delta(batch_id, rows):
        df = (
            spark.createDataFrame(rows, "src long, dst long, val double")
            .withColumn("bucket", F.pmod(F.hash("src"), F.lit(32)))
        )
        df.write.mode("overwrite").parquet(
            os.path.join(table, "delta", f"batch={batch_id}"))

    # base over many buckets
    delta(0, [(s, (s + 1) % nv, 1.0) for s in range(nv)])
    assert compact_edge_table(spark, table) == 1
    base = os.path.join(table, "base")
    before = {d: os.path.getmtime(os.path.join(base, d))
              for d in os.listdir(base) if d.startswith("bucket=")}
    assert len(before) > 2

    # one more delta touching a single src (single bucket)
    delta(1, [(3, 9, 5.0)])
    assert compact_edge_table(spark, table) == 1
    after = {d: os.path.getmtime(os.path.join(base, d))
             for d in os.listdir(base) if d.startswith("bucket=")}
    changed = {d for d in before if after[d] != before[d]}
    assert len(changed) == 1  # exactly the touched bucket rewritten

    got = {(r["src"], r["dst"]): r["val"]
           for r in read_edge_table(spark, table).collect()}
    assert got[(3, 9)] == 5.0
    assert got[(0, 1)] == 1.0
    # double compaction is a no-op
    assert compact_edge_table(spark, table) == 0


def test_compaction_crash_window_cannot_double_count(spark, tmp_path):
    """ADVICE r2: a crash AFTER writing new bucket data but BEFORE the
    manifest commit must leave the logical view unchanged — the next
    reader/compactor stays on the old manifest, deltas unabsorbed.
    Simulated by running the data-write phase effects (orphan version
    dir) without the manifest swap."""
    nv = 16
    table = str(tmp_path / "edges")

    def delta(batch_id, rows):
        df = (
            spark.createDataFrame(rows, "src long, dst long, val double")
            .withColumn("bucket", F.pmod(F.hash("src"), F.lit(32)))
        )
        df.write.mode("overwrite").parquet(
            os.path.join(table, "delta", f"batch={batch_id}"))

    delta(0, [(1, 2, 3.0), (4, 5, 1.0)])
    assert compact_edge_table(spark, table) == 1
    before = {(r["src"], r["dst"]): r["val"]
              for r in read_edge_table(spark, table).collect()}

    delta(1, [(1, 2, 2.0)])
    mid = {(r["src"], r["dst"]): r["val"]
           for r in read_edge_table(spark, table).collect()}
    assert mid[(1, 2)] == 5.0

    # simulate a compaction that crashed after writing the folded bucket
    # but before the manifest rename: an ORPHAN version dir exists
    import json
    import shutil
    man = json.load(open(os.path.join(table, "_manifest.json")))
    (k, v), = [(k, v) for k, v in man["bucket_versions"].items()
               if os.path.exists(os.path.join(table, "base", f"bucket={k}"))][:1]
    bdir = os.path.join(table, "base", f"bucket={k}")
    shutil.copytree(os.path.join(bdir, f"v={v}"),
                    os.path.join(bdir, f"v={v + 1}"))  # orphan, not committed

    # readers: unchanged (manifest still points at v, delta 1 unabsorbed)
    crash = {(r["src"], r["dst"]): r["val"]
             for r in read_edge_table(spark, table).collect()}
    assert crash == mid

    # recovery compaction absorbs delta 1 exactly once, skipping the
    # orphan version number, and the view is still correct
    assert compact_edge_table(spark, table) == 1
    after = {(r["src"], r["dst"]): r["val"]
             for r in read_edge_table(spark, table).collect()}
    assert after == mid
    assert after[(4, 5)] == before[(4, 5)] == 1.0

    # replay of an absorbed batch: ignored and swept
    delta(0, [(1, 2, 3.0), (4, 5, 1.0)])
    replay = {(r["src"], r["dst"]): r["val"]
              for r in read_edge_table(spark, table).collect()}
    assert replay == after
    assert compact_edge_table(spark, table) == 0
    assert not os.path.exists(os.path.join(table, "delta", "batch=0"))


def test_stateful_vertex_stats_across_restarts(spark, tmp_path):
    """applyInPandasWithState running totals must (a) match the batch
    engine's per-src count/sum over the union of all events, and (b)
    carry state ACROSS A QUERY RESTART via the checkpoint — the
    streaming half of the resumability requirement."""
    from combblas_spark.streaming import run_vertex_stats

    nv = 16
    src_dir = str(tmp_path / "in")
    out = str(tmp_path / "stats")
    ck = str(tmp_path / "ck")

    # HASH_C % 16 == 1, so dst == event_id % nv: offset the user ids so
    # no event is a self-loop and every key appears in BOTH batches
    batch1 = [(i, i % 60, (i + 1) % nv) for i in range(40)]
    batch2 = [(100 + i, i % 60, (i + 3) % nv) for i in range(40)]

    _events(spark, batch1).write.mode("append").parquet(src_dir)
    q = run_vertex_stats(spark, src_dir, out, ck, n_vertices=nv)
    q.awaitTermination(120)

    _events(spark, batch2).write.mode("append").parquet(src_dir)
    q2 = run_vertex_stats(spark, src_dir, out, ck, n_vertices=nv)  # RESTART
    q2.awaitTermination(120)

    # latest emitted row per src = current running totals
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["src"])
        if cur is None or r["out_degree"] > cur[0]:
            latest[r["src"]] = (r["out_degree"], r["weight_sum"])

    expected = {}
    all_events = _events(spark, batch1 + batch2).collect()
    for e in all_events:
        src, dst = e["user_id"], (e["event_id"] * HASH_C) % nv
        if src == dst:
            continue
        c, w = expected.get(src, (0, 0.0))
        expected[src] = (c + 1, w + e["value"])

    assert set(latest) == set(expected)
    for s in expected:
        assert latest[s][0] == expected[s][0], s
        assert abs(latest[s][1] - expected[s][1]) < 1e-9, s
    # restart really continued (batch-2 keys show cumulative counts
    # greater than their batch-2-only contribution where applicable)
    b1_counts = {}
    for e in _events(spark, batch1).collect():
        src, dst = e["user_id"], (e["event_id"] * HASH_C) % nv
        if src != dst:
            b1_counts[src] = b1_counts.get(src, 0) + 1
    carried = [s for s in latest
               if b1_counts.get(s, 0) > 0 and latest[s][0] > b1_counts[s]]
    assert carried, "no key accumulated across the restart"


# ------------------------------------------------- streaming corpus ingestion

def test_corpus_ingest_stream(spark, tmp_path):
    """Two arriving files -> two micro-batches: batch 0 drops its
    within-batch exact dup and low-quality doc; batch 1's near-dup of a
    batch-0 survivor is dropped by the INCREMENTAL prefix-filter check
    (batch x corpus only); replaying a batch by hand is idempotent."""
    from combblas_spark.streaming.corpus import (
        ingest_batch, read_corpus, run_corpus_ingest)

    base = "the quick brown fox jumps over a lazy dog near the old red barn"
    q = dict(min_words=3, max_words=100, min_mean_word_len=2.0,
             max_mean_word_len=8.0)
    b0 = [(0, base),
          (1, base),                                   # exact dup of 0
          (2, "too short"),                            # quality reject
          (3, "a completely different first document about the web crawling world")]
    b1 = [(10, base + " extra"),                       # near-dup of corpus 0
          (11, "an entirely fresh second batch document on the data engines")]
    inp, corp, ckpt = (str(tmp_path / d) for d in ("in", "corpus", "ck"))
    spark.createDataFrame(b0, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(inp)
    run_corpus_ingest(spark, inp, corp, ckpt, threshold=0.5,
                      quality_kwargs=q, max_files_per_trigger=1) \
        .awaitTermination(120)
    got0 = {r["doc_id"] for r in read_corpus(spark, corp).collect()}
    assert got0 == {0, 3}
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(inp)
    run_corpus_ingest(spark, inp, corp, ckpt, threshold=0.5,
                      quality_kwargs=q, max_files_per_trigger=1) \
        .awaitTermination(120)
    got = {r["doc_id"] for r in read_corpus(spark, corp).collect()}
    assert got == {0, 3, 11}                           # 10 dropped vs corpus
    # at-least-once replay: re-run batch 1 by hand with the same id
    ingest_batch(spark, spark.createDataFrame(b1, "doc_id long, text string"),
                 1, corp, threshold=0.5, quality_kwargs=q)
    got2 = {r["doc_id"] for r in read_corpus(spark, corp).collect()}
    assert got2 == got


def test_corpus_legacy_batches_backfilled(spark, tmp_path):
    """A corpus with PRE-SIDECAR batches (dirs 0-1, sidecars deleted)
    plus one sidecar-format batch (2): the next ingest must still
    reject near-dups of the LEGACY batches, not just of batch 2 —
    the r4 review found the old fallback went dead once any sidecar
    existed, silently skipping batches 0-1."""
    import shutil

    from combblas_spark.streaming.corpus import ingest_batch, read_corpus

    corp = str(tmp_path / "corpus")
    legacy0 = "the quick brown fox jumps over a lazy dog near the old red barn"
    legacy1 = "a completely different first document about the web crawling world"
    fresh2 = "an entirely fresh later document on the distributed data engines"
    ingest_batch(spark, spark.createDataFrame(
        [(0, legacy0)], "doc_id long, text string"), 0, corp, threshold=0.5)
    ingest_batch(spark, spark.createDataFrame(
        [(1, legacy1)], "doc_id long, text string"), 1, corp, threshold=0.5)
    # simulate the pre-sidecar format: strip batches 0-1's sidecars
    for kind in ("_shingles", "_sizes", "_df"):
        for bid in (0, 1):
            shutil.rmtree(str(tmp_path / "corpus" / kind / f"batch={bid}"))
    ingest_batch(spark, spark.createDataFrame(
        [(2, fresh2)], "doc_id long, text string"), 2, corp, threshold=0.5)
    # batch 3 carries near-dups of BOTH legacy docs + one genuinely new
    ingest_batch(spark, spark.createDataFrame(
        [(30, legacy0 + " extra"), (31, legacy1 + " extra"),
         (32, "nothing like anything stored before in this little corpus")],
        "doc_id long, text string"), 3, corp, threshold=0.5)
    got = {r["doc_id"] for r in read_corpus(spark, corp).collect()}
    assert got == {0, 1, 2, 32}


def test_incremental_sidecar_equivalence(spark):
    """incremental_prefix_pairs (one-sided prefix vs persisted corpus
    tables) returns exactly the pairs of the recompute-everything
    two-sided join — the prefix filter is exact under any rarity order."""
    from combblas_spark.functions.dedup import (
        incremental_prefix_pairs, prefix_filter_pairs, shingles)
    from pyspark.sql import functions as F
    import random

    rng = random.Random(5)
    words = [f"w{i}" for i in range(30)]
    base = [rng.choice(words) for _ in range(25)]
    docs = []
    for i in range(16):
        t = list(base)
        for _ in range(rng.randrange(0, 12)):
            t[rng.randrange(len(t))] = rng.choice(words)
        docs.append((i, " ".join(t)))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    corpus = d.where("doc_id % 2 = 0")
    batch = d.where("doc_id % 2 = 1")
    want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            prefix_filter_pairs(batch, threshold=0.6, other=corpus).collect()}
    csh = corpus.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh"))
    csz = csh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    cdf = csh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
           incremental_prefix_pairs(batch, csh, csz, df_table=cdf,
                                    threshold=0.6).collect()}
    assert got == want and want  # non-vacuous
    # df_table is an optimization only: omitting it changes nothing
    got2 = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            incremental_prefix_pairs(batch, csh, csz,
                                     threshold=0.6).collect()}
    assert got2 == want
    # hash64 candidate keys (derived on read, sidecars keep strings)
    # are bit-identical too
    got3 = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            incremental_prefix_pairs(batch, csh, csz, df_table=cdf,
                                     threshold=0.6,
                                     key_encoding="hash64").collect()}
    assert got3 == want


def test_corpus_ingest_fresh_checkpoint_appends(spark, tmp_path):
    """A SECOND stream with a fresh checkpoint over an existing corpus
    must append new batch dirs, never overwrite batch=0 (ADVICE r3);
    and its batches near-dup-check against the standing corpus via the
    persisted sidecars."""
    import os

    from combblas_spark.streaming.corpus import (
        max_batch_id, read_corpus, run_corpus_ingest)

    base = "the quick brown fox jumps over a lazy dog near the old red barn"
    inp1, inp2, corp = (str(tmp_path / d) for d in ("in1", "in2", "corpus"))
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    spark.createDataFrame([(0, base)], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(inp1)
    run_corpus_ingest(spark, inp1, corp, ck1, threshold=0.5) \
        .awaitTermination(120)
    assert max_batch_id(corp) == 0
    assert os.path.isdir(os.path.join(corp, "_shingles", "batch=0"))
    # second pipeline, FRESH checkpoint: near-dup of doc 0 + a new doc
    spark.createDataFrame(
        [(7, base + " extra"), (8, "an entirely different document about engines")],
        "doc_id long, text string").coalesce(1).write.mode("append").parquet(inp2)
    run_corpus_ingest(spark, inp2, corp, ck2, threshold=0.5) \
        .awaitTermination(120)
    got = {r["doc_id"] for r in read_corpus(spark, corp).collect()}
    assert got == {0, 8}, got          # 7 deduped against standing corpus
    assert max_batch_id(corp) == 1     # appended, batch=0 intact


def test_streaming_sessions_equal_batch(spark, tmp_path):
    from combblas_spark.functions.sessions import sessionize
    from combblas_spark.streaming.sessions import run_streaming_sessions

    src_dir = str(tmp_path / "sess_in")
    gap = 100  # seconds; inter-event gaps below are 30, 240, 260 — never == gap

    def ev(spark, rows):
        t0 = dt.datetime(2025, 1, 1)
        return spark.createDataFrame(
            [(eid, t0 + dt.timedelta(seconds=s), uid, "click", 1.0, "{}")
             for eid, s, uid in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    batch1 = [(1, 0, 7), (2, 30, 7), (3, 60, 7),      # user 7 session A
              (10, 0, 9)]                              # user 9 session A
    batch2 = [(4, 300, 7), (5, 330, 7),               # user 7 session B
              (11, 260, 9)]                            # user 9 session B
    ev(spark, batch1).write.mode("append").parquet(src_dir)
    ev(spark, batch2).write.mode("append").parquet(src_dir)

    q = run_streaming_sessions(spark, src_dir, "sess_tbl", gap_seconds=gap)
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.table("sess_tbl").collect()))
    want = sorted(map(tuple, sessionize(
        ev(spark, batch1 + batch2), gap_seconds=gap).collect()))
    assert got == want
    assert len(got) == 4  # 2 users x 2 sessions


def test_stateful_hll_across_restarts(spark, tmp_path):
    """Streaming HLL registers (CRDT max-merge in the state store) must
    converge to the batch hll_distinct estimate over the union of all
    drops, including across a query restart."""
    from combblas_spark.functions.sketch import hll_distinct
    from combblas_spark.streaming.stateful import stateful_hll_distinct

    src_dir = str(tmp_path / "in")
    out = str(tmp_path / "est")
    ck = str(tmp_path / "ck")
    schema = "k string, v string"
    batch1 = [(f"k{i % 2}", f"v{i}") for i in range(300)]
    batch2 = [(f"k{i % 2}", f"v{i}") for i in range(150, 600)]  # overlaps

    def drain():
        stream = (
            spark.readStream.schema(schema).parquet(src_dir))
        q = (
            stateful_hll_distinct(stream, "k", "v").writeStream
            .foreachBatch(lambda df, _b: df.write.mode("append").parquet(out))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start())
        q.awaitTermination(120)

    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src_dir)
    drain()
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src_dir)
    drain()  # RESTART: registers must come back from the checkpoint

    import pyspark.sql.functions as SF
    rows = spark.read.parquet(out).collect()
    # the LAST emission per key is the converged estimate; emissions are
    # appended per drain, and estimates only grow (registers are
    # monotone), so max() per key is the final value
    latest = {}
    for r in rows:
        latest[r["key"]] = max(latest.get(r["key"], 0.0), r["distinct_est"])
    batch = {r["k"]: r["distinct_est"] for r in hll_distinct(
        spark.createDataFrame(batch1 + batch2, schema), "k", "v").collect()}
    assert set(latest) == set(batch)
    for k in batch:
        assert abs(latest[k] - batch[k]) < 1e-6, (k, latest[k], batch[k])
