"""Tests for the training-data-pipeline functions: text analysis,
dedup (exact / minhash-LSH / simhash / jaccard), similarity search,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from combblas_spark.functions.text import analyze_documents
from combblas_spark.functions.dedup import (
    exact_duplicates, dedup_exact, minhash_signatures, lsh_candidate_pairs,
    near_dup_clusters, ngram_jaccard, prefix_filter_pairs, simhash,
    simhash_near_dups,
)
from combblas_spark.functions.similarity import brute_force_topk, lsh_topk, hyperplane_lsh_buckets
from combblas_spark.functions.multimodal import synthetic_media, extract_media_features


BASE = "the quick brown fox jumps over the lazy dog and runs away fast to the north"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", "s0"),
        (1, BASE, "en", "s0"),                              # exact dup of 0
        (2, BASE + " again", "en", "s1"),                   # near dup of 0
        (3, "ein ganz anderes der die das dokument und text", "de", "s1"),
        (4, "completely different content about spark engines", "en", "s2"),
        (5, BASE.upper(), "en", "s2"),                      # case dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_analyze_documents(docs):
    out = {r["doc_id"]: r for r in analyze_documents(docs).collect()}
    assert out[0]["n_tokens"] == len(BASE.split(" "))
    assert out[0]["lang_guess"] == "en"
    assert out[3]["lang_guess"] == "de"
    assert 0.0 <= out[0]["quality"] <= 1.0
    assert out[0]["fingerprint"] == out[1]["fingerprint"] == out[5]["fingerprint"]
    assert out[0]["fingerprint"] != out[2]["fingerprint"]


def test_exact_dedup(docs):
    groups = {r["fp"]: r for r in exact_duplicates(docs).collect()}
    sizes = sorted(g["n_dups"] for g in groups.values())
    assert sizes == [1, 1, 1, 3]
    big = [g for g in groups.values() if g["n_dups"] == 3][0]
    assert big["keep_id"] == 0
    kept = dedup_exact(docs)
    assert kept.count() == 4
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3, 4}


def test_minhash_lsh(docs):
    sig = {r["id"]: (r["h0"], r["h1"]) for r in minhash_signatures(docs, num_hashes=2).collect()}
    assert sig[0] == sig[1]            # identical docs -> identical signatures
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(docs, bands=4, rows_per_band=1).collect()}
    assert (0, 1) in pairs             # exact dups always collide
    assert (0, 2) in pairs             # near dup: most shingles shared
    assert (3, 4) not in pairs         # unrelated docs don't collide in all bands


def test_simhash(docs, spark):
    sh = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]
    # near dup: small hamming distance
    ham = bin(sh[0] ^ sh[2]).count("1")
    assert ham <= 6
    nd = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(docs, max_hamming=3).collect()}
    assert (0, 1) in nd


def test_ngram_jaccard(docs, spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "id_a long, id_b long")
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard(docs, docs, pairs).collect()}
    assert j[(0, 1)] == 1.0
    assert 0.5 < j[(0, 2)] < 1.0
    assert j[(0, 4)] == 0.0


def test_gopher_quality_flags(spark):
    """Each rule rejects its own handcrafted violator and passes the
    clean doc; keep = conjunction."""
    from combblas_spark.functions.text import gopher_quality_flags

    clean = "the cat sat on a mat and the dog ran to the red barn door now"
    rows = [
        (0, clean),                                       # passes all
        (1, "too short"),                                 # word count low
        (2, "supercalifragilistic " * 16),                # mean word len high
        (3, clean.replace("cat", "###### #### #####")),   # symbol ratio
        (4, "cat sat mat dog ran red barn door now tick tock five more pad"),  # no stopwords
        (5, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),    # non-alpha words
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(
        docs, min_words=10, max_words=100, min_mean_word_len=2.0,
        max_mean_word_len=6.0).collect()}
    assert out[0]["keep"]
    assert not out[1]["ok_word_count"] and not out[1]["keep"]
    assert not out[2]["ok_mean_word_len"] and not out[2]["keep"]
    assert not out[3]["ok_symbol_ratio"] and not out[3]["keep"]
    assert not out[4]["ok_stopwords"] and not out[4]["keep"]
    assert not out[5]["ok_alpha_words"] and not out[5]["keep"]


def test_repetition_flags(spark):
    """Keyword-stuffed doc rejected on both gram rules; varied doc kept;
    one-word doc gets 0.0 fractions (short docs are the word-count
    rule's business, not repetition's)."""
    from combblas_spark.functions.text import repetition_flags

    rows = [
        (0, "buy cheap pills " * 8),             # 'buy cheap' dominates
        (1, "the quick brown fox jumps over a lazy dog near the old red barn"),
        (2, "single"),
    ]
    docs = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                                 "doc_id long, text string")
    out = {r["id"]: r for r in repetition_flags(docs).collect()}
    assert out[0]["top_2gram_frac"] > 0.3 and out[0]["dup_3gram_frac"] > 0.9
    assert not out[0]["keep"]
    assert out[1]["dup_3gram_frac"] == 0.0 and out[1]["keep"]
    assert out[2]["top_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    assert out[2]["keep"]


def test_vocab_and_rarity(spark):
    """Rank order = (count desc, token asc); mean rank and OOV ratio
    are hand-checkable on a three-doc corpus."""
    from combblas_spark.functions.text import doc_rarity, token_vocabulary

    docs = spark.createDataFrame(
        [(0, "cat cat cat dog"), (1, "cat dog bird"), (2, "")],
        "doc_id long, text string")
    v = {r["token"]: (r["c"], r["rank"]) for r in token_vocabulary(docs).collect()}
    assert v == {"cat": (4, 1), "dog": (2, 2), "bird": (1, 3)}
    out = {r["id"]: (r["mean_rank"], r["oov_ratio"])
           for r in doc_rarity(docs, vocab_size=2).collect()}
    assert out[0] == ((1 + 1 + 1 + 2) / 4, 0.0)       # three cats, one dog
    assert out[1] == ((1 + 2 + 3) / 3, round(1 / 3, 6))  # bird is OOV
    assert out[2] == (0.0, 0.0)                       # empty doc


def test_deterministic_sample(spark):
    """Rate lands near nominal; decisions are stable under corpus
    growth (hash of own key only); stratified rates differ per
    stratum."""
    from combblas_spark.functions.sampling import deterministic_sample, stratified_sample

    small = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept_small = {r["doc_id"] for r in deterministic_sample(small, 0.3, "doc_id").collect()}
    kept_big = {r["doc_id"] for r in deterministic_sample(big, 0.3, "doc_id").collect()}
    assert kept_small == {i for i in kept_big if i < 400}   # growth-stable
    assert 0.2 < len(kept_big) / 2000 < 0.4                 # near nominal
    # different salt -> different (independent-ish) subset
    other = {r["doc_id"] for r in deterministic_sample(big, 0.3, "doc_id", salt="v2").collect()}
    assert other != kept_big
    strat = big.withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de"))
    out = stratified_sample(strat, {"en": 0.1, "de": 0.9}, "lang", "doc_id")
    frac = {r["lang"]: r["c"] / 1000 for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert frac["de"] > 0.8 and frac["en"] < 0.2


def _brute_jaccard_pairs(rows, threshold, k=3):
    """All (a<b, jaccard>=t) pairs over word-k-gram shingle sets, in
    plain Python — the completeness reference for the prefix filter."""
    sets = {}
    for i, text in rows:
        toks = text.split(" ")
        sets[i] = {" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)} \
            if len(toks) >= k else set()
    ids = sorted(sets)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= threshold:
                out[(a, b)] = round(j, 6)
    return out


def test_prefix_filter_pairs_complete(spark):
    """The prefix filter is EXACT: engine pairs == brute-force all-pairs
    Jaccard on a random small-vocab corpus (which maximizes shingle
    collisions, the hard case for candidate pruning)."""
    import random

    rng = random.Random(7)
    vocab = ["web", "page", "link", "graph", "spark", "data", "crawl", "rank"]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18)))))
    # planted near-dups: copy with a 1-word edit, and an exact dup
    base = rows[3][1].split(" ")
    base[2] = "edited"
    rows.append((30, " ".join(base)))
    rows.append((31, rows[5][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        want = _brute_jaccard_pairs(rows, t)
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in prefix_filter_pairs(docs, threshold=t).collect()}
        assert got == want, f"threshold {t}: {got.keys() ^ want.keys()}"
    assert (5, 31) in _brute_jaccard_pairs(rows, 0.8)  # the plants fired


def test_prefix_filter_hash64_identical(spark):
    """key_encoding='hash64' (candidate shuffles on xxhash64 longs) is
    bit-identical to string mode AND to brute force: the rarity order
    changes (df merges on hash collisions, order is (df,h,sh)) but the
    prefix-filter lemma holds under any total order, and verification
    rescans true strings."""
    import random

    rng = random.Random(7)
    vocab = ["web", "page", "link", "graph", "spark", "data", "crawl", "rank"]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18)))))
    base = rows[3][1].split(" ")
    base[2] = "edited"
    rows.append((30, " ".join(base)))
    rows.append((31, rows[5][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        want = _brute_jaccard_pairs(rows, t)
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in prefix_filter_pairs(docs, threshold=t,
                                            key_encoding="hash64").collect()}
        assert got == want, f"threshold {t}: {got.keys() ^ want.keys()}"
    # incremental (batch-vs-corpus) shape under hash keys
    corpus = docs.where("doc_id < 20")
    batch = docs.where("doc_id >= 20")
    allp = _brute_jaccard_pairs(rows, 0.5)
    want = {(b, a): j for (a, b), j in allp.items() if a < 20 <= b} | \
           {(a, b): j for (a, b), j in allp.items() if b < 20 <= a}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           prefix_filter_pairs(batch, threshold=0.5, other=corpus,
                               key_encoding="hash64").collect()}
    assert got == want
    import pytest as _pytest
    with _pytest.raises(ValueError):
        prefix_filter_pairs(docs, key_encoding="md5")


def test_prefix_filter_partition_invariance(spark):
    """Identical pair set whatever the input partitioning — the rank
    order (df, shingle) is total, so prefixes are deterministic."""
    import random

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 12))))
            for i in range(40)]
    rows.append((40, rows[7][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for parts in (1, 13):
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
               prefix_filter_pairs(docs.repartition(parts), threshold=0.5).collect()}
        outs.append(got)
    assert outs[0] == outs[1] and (7, 40) in outs[0]


def test_prefix_filter_incremental(spark):
    """Batch-vs-corpus mode returns exactly the CROSS pairs of the
    brute-force result — no corpus x corpus, no batch x batch."""
    import random

    rng = random.Random(11)
    vocab = ["crawl", "batch", "index", "web", "page", "dedup"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 14))))
            for i in range(24)]
    rows.append((24, rows[2][1]))            # batch dup of corpus doc 2
    rows.append((25, rows[3][1] + " tail"))  # batch near-dup of corpus doc 3
    corpus_rows = [r for r in rows if r[0] < 20]
    batch_rows = [r for r in rows if r[0] >= 20]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    t = 0.5
    allp = _brute_jaccard_pairs(rows, t)
    want = {(b, a): j for (a, b), j in allp.items() if a < 20 <= b} | \
           {(a, b): j for (a, b), j in allp.items() if b < 20 <= a}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           prefix_filter_pairs(batch, threshold=t, other=corpus).collect()}
    assert got == want and (24, 2) in got
    assert got[(24, 2)] == 1.0


def test_containment_pairs(spark):
    """A short doc quoted inside a 2x-longer one: containment(A->B)=1.0
    while Jaccard ~0.5 — the symmetric filter misses the pair, the
    containment join reports exactly the (contained, container)
    direction; full result equals brute force."""
    from combblas_spark.functions.dedup import containment_pairs

    import random
    rng = random.Random(9)
    vocab = ["quote", "news", "wire", "story", "page", "copy", "web"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 16))))
            for i in range(20)]
    rows.append((20, rows[4][1] + " " + rows[11][1]))   # contains 4 (and 11)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.8
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs(docs, threshold=t).collect()}
    # brute force over distinct shingle sets
    sets = {}
    for i, text in rows:
        toks = text.split(" ")
        sets[i] = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
    want = {}
    for a in sets:
        for b in sets:
            if a != b and sets[a]:
                c = len(sets[a] & sets[b]) / len(sets[a])
                if c >= t:
                    want[(a, b)] = round(c, 6)
    assert got == want
    assert got[(4, 20)] == 1.0                          # quoted doc found
    got_h = {(r["id_a"], r["id_b"]): r["containment"]
             for r in containment_pairs(docs, threshold=t,
                                        key_encoding="hash64").collect()}
    assert got_h == want                                # hash keys identical
    jac = {(r["id_a"], r["id_b"]) for r in
           prefix_filter_pairs(docs, threshold=t).collect()}
    assert (4, 20) not in jac                           # Jaccard misses it


def test_neardup_clusters(spark):
    """Transitive closure over the pair graph: A~B and B~C land in ONE
    cluster with canonical = min id; unpaired docs are singletons."""
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = {r["id"]: (r["cluster"], r["is_canonical"])
           for r in near_dup_clusters(docs, pairs).collect()}
    assert out == {0: (0, True), 1: (0, False), 2: (0, False),
                   3: (3, True), 4: (4, True)}


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(8).astype(np.float32)  # near dup of 0
    rows = [(i, base[i].tolist()) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_brute_force_topk(vectors):
    df, base = vectors
    top = brute_force_topk(df.filter(F.col("vec_id") == 0), df, k=3)
    rows = top.orderBy(F.col("cos").desc()).collect()
    assert rows[0]["neighbor_id"] == 1      # planted near-duplicate
    # verify against numpy
    def cos(a, b):
        a, b = a.astype(np.float64), b.astype(np.float64)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    sims = sorted(((cos(base[0], base[j]), j) for j in range(1, 20)), reverse=True)
    expect = [j for _, j in sims[:3]]
    assert [r["neighbor_id"] for r in rows] == expect
    for r, (s, _) in zip(rows, sims[:3]):
        assert r["cos"] == pytest.approx(round(s, 6), abs=2e-6)


def test_mutual_topk_pairs(vectors):
    """MNN keeps exactly the reciprocal top-k pairs (numpy twin), in
    canonical order, with the a->b cosine."""
    from combblas_spark.functions.similarity import mutual_topk_pairs

    df, base = vectors
    K = 3
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in mutual_topk_pairs(brute_force_topk(df, df, k=K)).collect()}

    def cos(a, b):
        a, b = a.astype(np.float64), b.astype(np.float64)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    topk = {}
    for i in range(20):
        sims = sorted(((cos(base[i], base[j]), j)
                       for j in range(20) if j != i),
                      key=lambda t: (-t[0], t[1]))
        topk[i] = [j for _, j in sims[:K]]
    want = {(a, b) for a in range(20) for b in topk[a]
            if a < b and a in topk[b]}
    assert set(got) == want
    assert (0, 1) in got  # the planted near-dup pair is mutual
    for (a, b), c in got.items():
        assert c == pytest.approx(round(cos(base[a], base[b]), 6), abs=2e-6)


def test_lsh_topk_finds_planted_neighbor(vectors):
    df, _ = vectors
    got = lsh_topk(df, k=3, n_tables=1, n_planes=2, dim=8, per_bucket_cap=None)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # near-identical vectors share all hyperplane signs -> same bucket
    assert 1 in by_query.get(0, [])
    b = {r["id"]: r["bucket"] for r in hyperplane_lsh_buckets(df, n_planes=4, dim=8).collect()}
    assert b[0] == b[1]


@pytest.fixture(scope="module")
def big_vectors(spark):
    """200 x 16-dim clustered vectors: 20 centers x 10 noisy members —
    realistic ANN workload (neighbors genuinely exist)."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 16))
    pts = np.concatenate(
        [c + 0.15 * rng.standard_normal((10, 16)) for c in centers]
    ).astype(np.float32)
    rows = [(i, pts[i].tolist()) for i in range(len(pts))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_topk_recall_vs_brute_force(big_vectors):
    """Multi-table banding must recover most true top-k neighbors; more
    tables must not reduce recall (OR-construction monotonicity)."""
    k = 3
    truth = {}
    for r in brute_force_topk(big_vectors, big_vectors, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(n_tables):
        got = {}
        for r in lsh_topk(big_vectors, k=k, n_tables=n_tables, n_planes=6,
                          dim=16, per_bucket_cap=64).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return hits / (len(truth) * k)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1 - 1e-9       # OR over tables only adds candidates
    assert r4 >= 0.7             # 4 tables x 6 planes on clustered data


def test_lsh_per_bucket_cap_bounds_candidates(big_vectors):
    """The cap must bound per-(table,bucket) membership (skew guard)."""
    from combblas_spark.functions.similarity import lsh_table_assignments

    capped = lsh_table_assignments(
        big_vectors, n_tables=2, n_planes=2, dim=16, per_bucket_cap=5)
    mx = (capped.groupBy("tbl", "bucket").count()
          .agg(F.max("count").alias("m")).collect()[0]["m"])
    assert mx <= 5
    uncapped = lsh_table_assignments(
        big_vectors, n_tables=2, n_planes=2, dim=16)
    assert uncapped.count() == 2 * 200  # every vector in every table


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=30)
    assert media.count() == 30
    feats = extract_media_features(media, decoder="stub")
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["width"] >= 16 and r["height"] >= 16
        assert r["kind"] in ("image", "audio", "video")
    # determinism
    again = extract_media_features(
        synthetic_media(spark, n=30), decoder="stub").collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_multimodal_decoder_gating(spark):
    """VERDICT r4 #4: the decoder gate — "auto" resolves on the driver
    (stub here, no Pillow in this container), "pil" raises up front
    instead of failing per-executor, unknown names rejected."""
    import pytest as _pytest

    from combblas_spark.functions.multimodal import pil_available

    media = synthetic_media(spark, n=10)
    auto = extract_media_features(media, decoder="auto").collect()
    stub = extract_media_features(
        synthetic_media(spark, n=10), decoder="stub").collect()
    if not pil_available():
        assert sorted(map(str, auto)) == sorted(map(str, stub))
        with _pytest.raises(ImportError):
            extract_media_features(media, decoder="pil")
    with _pytest.raises(ValueError):
        extract_media_features(media, decoder="mp4")


def test_multimodal_pil_path(monkeypatch):
    """The REAL-decode glue (_pil_decode_image), exercised against a
    minimal in-process fake of the Pillow API (PIL itself is not in
    this container): dims/bands/pixel-stats extraction and the
    corrupt-payload -> None contract. Driver-side on purpose — a
    sys.modules fake cannot reach Spark's worker processes."""
    import sys
    import types

    import numpy as _np

    class _FakeGray:
        def __init__(self, w, h):
            self.size = (w, h)
            self._arr = _np.arange(w * h, dtype=_np.uint8).reshape(h, w)

        def __array__(self, dtype=None, copy=None):
            a = self._arr
            return a.astype(dtype) if dtype is not None else a

    class _FakeImage:
        def __init__(self, w, h):
            self._g = _FakeGray(w, h)

        def getbands(self):
            return ("R", "G", "B")

        def convert(self, mode):
            assert mode == "L"
            return self._g

    def _open(buf):
        payload = buf.read()
        if not payload.startswith(b"FAKEIMG"):
            raise OSError("cannot identify image file")
        return _FakeImage(payload[7], payload[8])

    fake_pil = types.ModuleType("PIL")
    fake_img = types.ModuleType("PIL.Image")
    fake_img.open = _open
    fake_pil.Image = fake_img
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_img)

    from combblas_spark.functions.multimodal import (
        _pil_decode_image, pil_available)

    assert pil_available()
    got = _pil_decode_image(b"FAKEIMG" + bytes([4, 3]) + b"xyz")
    assert got is not None
    w, h, feat = got
    assert (w, h) == (4, 3)
    assert feat.shape == (8,)
    arr = _np.arange(12, dtype=_np.float32)
    assert feat[0] == arr.mean() and feat[3] == arr.max()
    assert feat[4] == 4.0 and feat[5] == 3.0
    assert feat[6] == 12.0   # payload length
    assert feat[7] == 3.0    # bands
    # corrupt payload -> dropped, not raised
    assert _pil_decode_image(b"NOTANIMAGE") is None


def test_ivf_topk_recall_and_partition(big_vectors):
    """IVF probing must recover most true top-k neighbors on clustered
    data; the quantizer's inverted lists must partition the corpus; a
    larger nprobe must not reduce recall (probing only adds lists)."""
    from combblas_spark.functions.similarity import (
        ivf_centroids_and_assignments, ivf_topk)

    k = 3
    truth = {}
    for r in brute_force_topk(big_vectors, big_vectors, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    cent, assign = ivf_centroids_and_assignments(
        big_vectors, n_centroids=10, iters=2)
    assert cent.count() == 10
    rows = assign.collect()
    assert len(rows) == 200                      # every vector in exactly
    assert len({r["id"] for r in rows}) == 200   # one inverted list

    def recall(nprobe):
        got = {}
        for r in ivf_topk(big_vectors, k=k, n_centroids=10, iters=2,
                          nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return hits / (len(truth) * k)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1 - 1e-9    # more probes only add candidates
    assert r3 >= 0.7          # 10 lists / 3 probes on 20-cluster data


def test_ivf_per_list_cap(big_vectors):
    """per_list_cap bounds candidate-list membership (skew guard)."""
    from combblas_spark.functions.similarity import ivf_topk

    got = ivf_topk(big_vectors, k=3, n_centroids=4, iters=1, nprobe=1,
                   per_list_cap=5)
    # with every list capped at 5 members, no query can see more than
    # nprobe*cap candidates -> at most 5 neighbors reported
    per_q = got.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 5


def test_semdedup_drops_exact_copies_keeps_lowest_id(big_vectors, spark):
    """SemDeDup: exact copies always land in the SAME cluster (identical
    cosines to every centroid, same cid tie-break), so the copy with the
    larger id is dropped at any threshold; every vector appears exactly
    once in the output."""
    from combblas_spark.functions.similarity import semdedup

    dup = big_vectors.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    v = big_vectors.unionByName(dup)
    out = semdedup(v, threshold=0.999, n_centroids=6, iters=1)
    rows = {r["id"]: (r["cid"], r["kept"]) for r in out.collect()}
    assert len(rows) == 203
    for i in range(3):
        assert rows[i][0] == rows[1000 + i][0]      # same cluster
        assert rows[i][1] is True                    # original kept
        assert rows[1000 + i][1] is False            # copy dropped


def test_semdedup_matches_in_cluster_brute_force(big_vectors):
    """kept flags equal the keep-lowest-id rule applied to the exact
    in-cluster pair set (brute-force reference over the quantizer's own
    assignment)."""
    import numpy as np

    from combblas_spark.functions.similarity import (
        ivf_centroids_and_assignments, semdedup)

    t = 0.8
    out = {r["id"]: r["kept"]
           for r in semdedup(big_vectors, threshold=t, n_centroids=8,
                             iters=2).collect()}
    _, assign = ivf_centroids_and_assignments(big_vectors, 8, 2)
    cid = {r["id"]: r["cid"] for r in assign.collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in big_vectors.collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    expect = {}
    for i in sorted(vecs):
        expect[i] = not any(
            cid[j] == cid[i] and round(cos(vecs[j], vecs[i]), 6) >= t
            for j in vecs if j < i)
    assert out == expect
    assert any(not k for k in out.values())  # threshold actually bites


def test_duplicate_spans(spark):
    """A sentence copied into another doc marks its windows duplicated
    in BOTH docs; a doc with an internal repeat flags itself; fully
    unique docs score 0."""
    from combblas_spark.functions.dedup import duplicate_spans

    common = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, common + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, "iota kappa lambda mu nu xi omicron pi " + common),
        (2, "one two three four five one two three four five"),   # self-repeat
        (3, "solo unique words that appear nowhere else at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in duplicate_spans(docs, k=5).collect()}
    assert out[0]["n_dup_windows"] == 6 and out[1]["n_dup_windows"] == 6
    assert out[2]["n_dup_windows"] == 2        # 'one two three four five' x2
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[0]["n_windows"] == len(rows[0][1].split()) - 4


def test_remove_duplicate_spans(spark):
    """The apply half of ExactSubstr: the copied sentence is cut from
    BOTH docs (all-copies rule), the self-repeat doc empties, unique
    docs and sub-window docs pass through byte-identical."""
    from combblas_spark.functions.dedup import remove_duplicate_spans

    common = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, common + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, "iota kappa lambda mu nu xi omicron pi " + common),
        (2, "one two three four five one two three four five"),   # self-repeat
        (3, "solo unique words that appear nowhere else at all here"),
        (4, "tiny doc"),                                   # < k tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in remove_duplicate_spans(docs, k=5).collect()}

    # every doc comes back, n_removed consistent with the rebuild
    assert set(out) == {0, 1, 2, 3, 4}
    for i, text in rows:
        kept = len(out[i]["clean_text"].split(" ")) if out[i]["clean_text"] else 0
        assert kept + out[i]["n_removed"] == len(text.split(" "))

    # the 10 common tokens cut from both docs; private suffix/prefix kept
    assert out[0]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[0]["n_removed"] == 10
    assert out[1]["clean_text"] == "iota kappa lambda mu nu xi omicron pi"
    assert out[1]["n_removed"] == 10
    # the internal repeat covers every window -> whole doc removed
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 10
    # untouched docs reconstruct byte-identically
    assert out[3]["clean_text"] == rows[3][1] and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == rows[4][1] and out[4]["n_removed"] == 0


def test_winnow_fingerprints(spark):
    """Winnowing selection matches a pure-Python MOSS twin (rightmost
    min per window) and honors the k+w-1 completeness guarantee."""
    import hashlib

    from combblas_spark.functions.dedup import (winnow_fingerprints,
                                                winnow_pairs)

    K, W = 3, 3
    texts = {
        1: "the quick brown fox jumps over the lazy dog again today",
        2: "something else entirely but the quick brown fox jumps over here",
        3: "completely unrelated words in this one document here now",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")

    def py_winnow(text):
        toks = text.split(" ")
        grams = [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
        sel = set()
        for t in range(len(hs) - W + 1):
            win = hs[t:t + W]
            mn = min(win)
            # rightmost occurrence of the minimum
            p = t + max(j for j, h in enumerate(win) if h == mn)
            sel.add((p, hs[p]))
        return sel

    got = {}
    for r in winnow_fingerprints(docs, k=K, w=W).collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    assert got == {i: py_winnow(t) for i, t in texts.items()}

    # completeness: docs 1 and 2 share the 5-token (= k+w-1) substring
    # "the quick brown fox jumps" -> at least one shared fingerprint hash
    shared = {f for _, f in got[1]} & {f for _, f in got[2]}
    assert shared
    pairs = {(r["id_a"], r["id_b"]): r["shared"]
             for r in winnow_pairs(docs, k=K, w=W, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == len(shared)
    assert not any(3 in p for p in pairs)

    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_pairs(docs, min_shared=0)
    with pytest.raises(ValueError, match="max_df"):
        winnow_pairs(docs, max_df=1)


def test_decontaminate(spark):
    from combblas_spark.functions.dedup import decontaminate

    bench = spark.createDataFrame([(100, "a b c d e")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b c d x"),         # shares "a b c","b c d"  -> 2 hits
         (2, "x y z a b c"),       # shares "a b c"          -> 1 hit
         (3, "p q r s t u"),       # nothing shared          -> 0 hits
         (4, "xy")],               # < k words: no shingles  -> 0 hits
        "doc_id long, text string")
    out = {r["id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(corpus, bench, min_overlap=2).collect()}
    assert out == {1: (2, True), 2: (1, False), 3: (0, False), 4: (0, False)}

    out1 = {r["id"]: r["contaminated"]
            for r in decontaminate(corpus, bench, min_overlap=1).collect()}
    assert out1 == {1: True, 2: True, 3: False, 4: False}

    # repeated shingles in ONE benchmark doc count once; a corpus doc
    # repeating a hit shingle still counts it once (distinct semantics)
    bench2 = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c d")], "doc_id long, text string")
    corpus2 = spark.createDataFrame(
        [(9, "a b c a b c a b c")], "doc_id long, text string")
    r = decontaminate(corpus2, bench2, min_overlap=1).collect()[0]
    # corpus doc 9 distinct shingles: {a b c, b c a, c a b} -> hits on
    # {a b c, b c a, c a b} all present in bench2 doc 0's distinct set
    assert (r["n_hits"], r["contaminated"]) == (3, True)

    with pytest.raises(ValueError, match="min_overlap"):
        decontaminate(corpus, bench, min_overlap=0)


def test_pii_scrub(spark):
    from combblas_spark.functions.pii import pii_scrub

    rows = [
        (0, "reach me at jo.doe+spam@mail.example.org or 192.168.0.1"),
        (1, "ssn 123-45-6789 phone 555-867-5309 done"),
        (2, "email host looks like a quad: a@1.2.3.4x.net tail"),
        (3, "no pii here at all"),
        (4, "v1.2.3.4000 is a version, 12-34-5678 is not an ssn"),
        (5, "two mails a@b.co c@d.io and ips 8.8.8.8 1.1.1.1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in pii_scrub(docs).collect()}

    assert (out[0]["n_email"], out[0]["n_ipv4"]) == (1, 1)
    assert out[0]["clean_text"] == "reach me at <EMAIL> or <IP>"
    assert (out[1]["n_ssn"], out[1]["n_phone"]) == (1, 1)
    assert out[1]["clean_text"] == "ssn <SSN> phone <PHONE> done"
    # staged order: the dotted quad INSIDE an email host is redacted by
    # the email stage and never double-counted as an IP
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (1, 0)
    assert out[2]["clean_text"] == "email host looks like a quad: <EMAIL> tail"
    assert out[3]["n_pii"] == 0 and out[3]["clean_text"] == rows[3][1]
    # \b guards: 4-digit octet and 2-3-4 dashed groups don't match
    assert out[4]["n_pii"] == 0 and out[4]["clean_text"] == rows[4][1]
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_pii"]) == (2, 2, 4)
    assert out[5]["clean_text"] == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>"


def test_tf_cosine_pairs(spark):
    from combblas_spark.functions.similarity import tf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b b"), (3, "c c"), (4, "a c")],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["dot"], r["cos"])
           for r in tf_cosine_pairs(docs, min_cos=0.5).collect()}
    assert got == {
        (1, 2): (4, 0.8),                      # (2,1)·(1,2) / (√5·√5)
        (1, 4): (2, round(2 / 10 ** 0.5, 6)),
        (3, 4): (2, round(2 / 8 ** 0.5, 6)),
    }

    # df cap: token 'a' (df=3) is a stopword-hub — dropped BEFORE the
    # self-join; norms recompute over kept tokens so cos stays <= 1
    capped = {(r["id_a"], r["id_b"]): r["cos"]
              for r in tf_cosine_pairs(docs, min_cos=0.9, max_df=2).collect()}
    assert capped == {(1, 2): 1.0, (3, 4): 1.0}

    with pytest.raises(ValueError, match="min_cos"):
        tf_cosine_pairs(docs, min_cos=0.0)
    with pytest.raises(ValueError, match="max_df"):
        tf_cosine_pairs(docs, max_df=1)


def test_canonicalize_url(spark):
    from combblas_spark.functions.urls import canonicalize_url, url_dup_groups

    cases = [
        # (raw, canonical)
        ("https://A.Example/Path/X", "https://a.example/Path/X"),  # path case kept
        ("https://a.example:443/p/1", "https://a.example/p/1"),
        ("http://a.example:80/p/1", "http://a.example/p/1"),
        ("https://a.example:8443/p/1", "https://a.example:8443/p/1"),  # non-default kept
        ("http://a.example:443/p/1", "http://a.example:443/p/1"),      # wrong-scheme port kept
        ("https://a.example/p/1#frag", "https://a.example/p/1"),
        ("https://a.example/p/1?utm_source=x", "https://a.example/p/1"),
        ("https://a.example/p?utm_a=1&utm_b=2", "https://a.example/p"),
        ("https://a.example/p?utm_a=1&q=2", "https://a.example/p?q=2"),
        ("https://a.example/p?q=2&utm_a=1", "https://a.example/p?q=2"),
        ("https://a.example/p?q=2&utm_a=1&r=3", "https://a.example/p?q=2&r=3"),
        ("https://a.example/p/1///", "https://a.example/p/1"),
        ("HTTPS://A.EXAMPLE/", "https://a.example"),
        ("https://a.example/p?butm_x=1", "https://a.example/p?butm_x=1"),  # not utm_
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in cases]

    # grouping: three spellings of one page, one of another
    dup = spark.createDataFrame(
        [("https://a.example/p/1",), ("HTTPS://a.example/p/1/",),
         ("https://a.example/p/1#x",), ("https://a.example/p/2",)],
        "url string")
    g = {r["canonical_url"]: (r["n_variants"], r["rep_url"])
         for r in url_dup_groups(dup).collect()}
    assert g == {
        "https://a.example/p/1": (3, "HTTPS://a.example/p/1/"),
        "https://a.example/p/2": (1, "https://a.example/p/2"),
    }


def test_weighted_sample(spark):
    from combblas_spark.functions.sampling import sample_hash, weighted_sample

    df = spark.createDataFrame([(i, (i % 11) / 10.0) for i in range(400)],
                               "id long, w double")
    kept = {r["id"] for r in
            weighted_sample(df, F.col("w"), key_col="id").collect()}
    hashes = {r["id"]: r["h"] for r in
              df.select("id", sample_hash(F.col("id"), "wsample").alias("h")).collect()}
    expect = {i for i in range(400)
              if hashes[i] < min(max((i % 11) / 10.0, 0.0), 1.0) * 2 ** 32}
    assert kept == expect
    assert all(i in kept for i in range(400) if i % 11 == 10)  # w=1 always kept
    assert not any(i in kept for i in range(400) if i % 11 == 0)  # w=0 never
    # out-of-range weights clamp instead of misbehaving
    df2 = spark.createDataFrame([(1, 7.0), (2, -3.0)], "id long, w double")
    got = {r["id"] for r in weighted_sample(df2, F.col("w"), key_col="id").collect()}
    assert got == {1}

    # growth stability: the same id keeps its decision in a larger corpus
    big = spark.createDataFrame([(i, (i % 11) / 10.0) for i in range(800)],
                                "id long, w double")
    kept_big = {r["id"] for r in
                weighted_sample(big, F.col("w"), key_col="id").collect()}
    assert {i for i in kept_big if i < 400} == kept


def test_per_group_cap(spark):
    from combblas_spark.functions.sampling import per_group_cap, sample_hash

    df = spark.createDataFrame([(i, i % 3) for i in range(90)],
                               "id long, host long")
    out = per_group_cap(df, "host", 5, key_col="id")
    rows = [(r["id"], r["host"]) for r in out.collect()]
    assert len(rows) == 15 and len({g for _, g in rows}) == 3
    # survivors are exactly the 5 smallest by (hash, id) within each host
    hashes = {r["id"]: r["h"] for r in
              df.select("id", sample_hash(F.col("id"), "cap").alias("h")).collect()}
    for g in range(3):
        members = sorted((hashes[i], i) for i in range(90) if i % 3 == g)
        assert {i for i, gg in rows if gg == g} == {i for _, i in members[:5]}
    # groups under the cap pass through whole; partition invariance
    tiny = per_group_cap(df.where(F.col("id") < 4), "host", 5, key_col="id")
    assert tiny.count() == 4
    repart = per_group_cap(df.repartition(13), "host", 5, key_col="id")
    assert {(r["id"], r["host"]) for r in repart.collect()} == set(rows)
    with pytest.raises(ValueError, match="k must be"):
        per_group_cap(df, "host", 0, key_col="id")


def test_remove_boilerplate_lines(spark):
    from combblas_spark.functions.text import remove_boilerplate_lines

    rows = [
        # host A: 'nav' on all three docs, 'promo' on two, bodies unique
        (0, "a", "nav\nbody zero\npromo"),
        (1, "a", "nav\nbody one\npromo"),
        (2, "a", "nav\nbody two"),
        # host B: same 'nav' line but only ONE doc there -> kept (the
        # decision is per group); doc 4 is pure boilerplate within B
        (3, "b", "nav\nfooter\nbody three"),
        (4, "b", "footer"),
        (5, "b", "footer\nfooter\nbody five"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r["id"]: (r["clean_text"], r["n_removed"])
           for r in remove_boilerplate_lines(
               docs, group_col="host", min_docs=2).collect()}
    assert out[0] == ("body zero", 2)
    assert out[1] == ("body one", 2)
    assert out[2] == ("body two", 1)
    assert out[3] == ("nav\nbody three", 1)      # 'nav' unique within B
    assert out[4] == ("", 1)                     # fully boilerplate, kept as ''
    # repeated line inside ONE doc still counts that doc once for the
    # frequency, but removal strips every occurrence
    assert out[5] == ("body five", 2)

    # corpus-wide mode (group_col=None): 'nav' now spans hosts -> 4 docs
    allg = {r["id"]: r["clean_text"]
            for r in remove_boilerplate_lines(docs, min_docs=4).collect()}
    assert allg[3] == "footer\nbody three"
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(docs, min_docs=1)


def test_sessionize(spark):
    import datetime as dt

    from combblas_spark.functions.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: two sessions split by a 700s gap (gap=600)
        (0, at(0), 1, 1.5), (1, at(100), 1, 2.0), (2, at(800), 1, 4.0),
        # exactly-gap boundary: 600s gap does NOT split (strict >)
        (3, at(0), 2, 1.0), (4, at(600), 2, 1.0),
        # single-event user
        (5, at(42), 3, 9.25),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {(r["user_id"], r["session_start_us"]):
           (r["n_events"], r["min_event_id"], r["duration_us"], r["sum_value"])
           for r in sessionize(ev, gap_seconds=600).collect()}
    us0 = int(t0.timestamp()) * 1_000_000
    assert got == {
        (1, us0): (2, 0, 100_000_000, 3.5),
        (1, us0 + 800_000_000): (1, 2, 0, 4.0),
        (2, us0): (2, 3, 600_000_000, 2.0),
        (3, us0 + 42_000_000): (1, 5, 0, 9.25),
    }
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(ev, gap_seconds=0)


def test_dedup_paragraphs_keep_first(spark):
    from combblas_spark.functions.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "shared intro\nunique one\nquoted block"),
            (2, "shared intro\nunique two\nquoted block"),
            (3, "quoted block\nshared intro"),
            (4, "unique one"),          # dup of doc 1's paragraph
            (5, "fresh\nfresh"),        # intra-doc repeat: keep first only
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["clean_text"], r["n_removed"])
           for r in dedup_paragraphs(docs).collect()}
    # doc 1 is first everywhere -> keeps everything
    assert got[1] == ("shared intro\nunique one\nquoted block", 0)
    # doc 2 keeps only its unique middle line
    assert got[2] == ("unique two", 2)
    # doc 3 loses both (both seen in doc 1)
    assert got[3] == ("", 2)
    # doc 4's only paragraph already appeared in doc 1
    assert got[4] == ("", 1)
    # intra-doc repeat deduped to one occurrence
    assert got[5] == ("fresh", 1)


def test_dedup_paragraphs_partition_invariance(spark):
    from combblas_spark.functions.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [(i, f"common header\nbody {i % 3}") for i in range(1, 30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, dedup_paragraphs(docs).collect()))
    b = sorted(map(tuple, dedup_paragraphs(docs.repartition(7)).collect()))
    assert a == b
    # exactly one survivor per distinct paragraph: 1 header + 3 bodies kept
    total_kept = sum(
        len([l for l in t.split("\n") if l]) for _, t, _ in a)
    assert total_kept == 4


def test_dedup_paragraphs_null_text_and_literal_sep(spark):
    from combblas_spark.functions.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "a|b"), (2, "b|c"), (3, None)], "doc_id long, text string")
    got = {r["id"]: (r["clean_text"], r["n_removed"])
           for r in dedup_paragraphs(docs, sep="|").collect()}
    # '|' must be a LITERAL separator, not an empty-alternation regex
    assert got[1] == ("a|b", 0)
    assert got[2] == ("c", 1)
    # NULL text still yields a row per the contract
    assert got[3] == ("", 0)


def test_dedup_paragraphs_idempotent(spark):
    """A second keep-first pass over already-deduped texts removes
    nothing: every surviving paragraph occurrence is already the global
    first (empty docs collapse to a single '' paragraph whose sole
    survivor is the smallest doc id — also stable on re-run)."""
    from combblas_spark.functions.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "y\nz"), (3, "x\nz\nw"), (4, "w")],
        "doc_id long, text string",
    )
    once = dedup_paragraphs(docs)
    again = dedup_paragraphs(
        once.select(F.col("id").alias("doc_id"), F.col("clean_text").alias("text")))
    a = {r["id"]: (r["clean_text"], r["n_removed"]) for r in again.collect()}
    o = {r["id"]: r["clean_text"] for r in once.collect()}
    # every non-empty doc is unchanged with zero removals (fully-emptied
    # docs become '' paragraphs, which legitimately re-dedup among
    # themselves, so they are excluded from the invariant)
    for i, t in o.items():
        if t:
            assert a[i] == (t, 0)


# ----------------------------------------------------------------- DSIR

def test_dsir_weights_exact_and_guards(spark):
    import hashlib
    import math
    import re

    import pytest as _pytest

    from combblas_spark.functions.sampling import dsir_weights
    import pyspark.sql.functions as F

    docs = [
        (0, "alpha beta alpha", True),
        (1, "beta gamma", True),
        (2, "gamma gamma delta", False),
        (3, "alpha delta", False),
        (4, "", False),          # token-free -> logratio 0.0
        (5, None, True),         # NULL text -> token-free
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, is_t boolean")
    B, S = 16, 1.0
    got = {r["id"]: (r["n_tokens"], r["logratio"])
           for r in dsir_weights(df, F.col("is_t"), buckets=B,
                                 doc_col="doc_id").collect()}

    # local twin: same md5 bucket hash, same add-1 smoothing
    def bucket(tok):
        return int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:8], 16) % B

    occ = []  # (doc, bucket, is_target)
    for did, text, t in docs:
        for tok in re.split(r"[^a-z0-9]+", (text or "").lower()):
            if tok:
                occ.append((did, bucket(tok), t))
    nr = len(occ)
    nt = sum(1 for _, _, t in occ if t)
    from collections import Counter
    cr = Counter(b for _, b, _ in occ)
    ct = Counter(b for _, b, t in occ if t)
    want = {}
    for did, _, _ in docs:
        mine = [b for d, b, _ in occ if d == did]
        if not mine:
            want[did] = (0, 0.0)
            continue
        lrs = [math.log(((ct[b] + S) / (nt + S * B)) / ((cr[b] + S) / (nr + S * B)))
               for b in mine]
        want[did] = (len(mine), round(sum(lrs) / len(lrs), 6))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9, (k, got[k], want[k])
    # the target-language doc must outscore the off-target doc
    assert got[0][1] > got[2][1]

    with _pytest.raises(ValueError, match="smoothing"):
        dsir_weights(df, F.col("is_t"), smoothing=0.0)
    with _pytest.raises(ValueError, match="buckets"):
        dsir_weights(df, F.col("is_t"), buckets=0)


def test_tfidf_top_terms_exact(spark):
    import re
    from collections import Counter

    import pytest as _pytest

    from combblas_spark.functions.text import tfidf_top_terms

    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana banana durian"),
        (2, "apple cherry cherry cherry"),
        (3, ""),          # token-free: no output rows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id"], r["pos"]): (r["term"], r["score"])
           for r in tfidf_top_terms(df, k=2).collect()}

    # local twin with the same unlogged idf
    tf = Counter()
    for did, text in docs:
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t:
                tf[(did, t)] += 1
    dl = Counter()
    dfreq = Counter()
    for (did, t), c in tf.items():
        dl[did] += c
        dfreq[t] += 1
    n = len(docs)
    want = {}
    for did, _ in docs:
        terms = [(t, (tf[(did, t)] / dl[did]) * (n / dfreq[t]))
                 for (d2, t) in tf if d2 == did]
        terms.sort(key=lambda x: (-x[1], x[0]))
        for pos, (t, s) in enumerate(terms[:2], start=1):
            want[(did, pos)] = (t, round(s, 6))
    assert got == want
    assert not any(k[0] == 3 for k in got)  # token-free doc absent

    with _pytest.raises(ValueError, match="k must"):
        tfidf_top_terms(df, k=0)


def test_bigram_fluency(spark):
    """Hand corpus vs pure python: corpus-trained transition counts,
    per-doc weakest link and support; <2-token docs score (1,1,0)."""
    from combblas_spark.functions.text import bigram_fluency

    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "dog!"), (3, "")],
        "doc_id long, text string")
    corpus = {0: ["the", "cat", "sat"], 1: ["the", "cat", "ran"],
              2: ["dog"], 3: []}
    c2, c1 = {}, {}
    for toks in corpus.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    want = {}
    for i, toks in corpus.items():
        trs = list(zip(toks, toks[1:]))
        if not trs:
            want[i] = (1.0, 1.0, 0)
        else:
            want[i] = (
                round(min(c2[t] / c1[t[0]] for t in trs), 6),
                round(sum(c2[t] for t in trs) / sum(c1[t[0]] for t in trs), 6),
                len(trs))
    got = {r["id"]: (r["min_prob"], r["support"], r["n_transitions"])
           for r in bigram_fluency(docs).collect()}
    assert got == want, (got, want)
    # "the cat" is shared (prob 1 for the->cat); sat/ran diverge at
    # cat-> giving min_prob 0.5 for docs 0 and 1
    assert got[0][0] == 0.5 and got[1][0] == 0.5


def test_hll_distinct(spark):
    """HLL estimate tracks exact distinct within the 64-register error
    envelope, is invariant to partitioning/duplication (CRDT max-merge),
    and validates p."""
    import pytest as _pytest

    from combblas_spark.functions.sketch import hll_distinct

    # cardinalities >= 2.5*m (=160): the raw estimate (deliberately no
    # linear-counting small-range correction) is only valid there
    rows = [(f"k{i % 3}", f"v{(i // 3) % (400 * (1 + i % 3))}")
            for i in range(9000)]
    df = spark.createDataFrame(rows, "k string, v string")
    exact = {r["k"]: r["c"] for r in
             df.groupBy("k").agg(F.count_distinct("v").alias("c")).collect()}
    est = {r["k"]: r["distinct_est"] for r in
           hll_distinct(df, "k", "v").collect()}
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert abs(est[k] - c) / c < 0.35, (k, c, est[k])
    # partition invariance + duplicate absorption: the register max is
    # order-free, so a reshuffled, doubled input gives the SAME estimate
    est2 = {r["k"]: r["distinct_est"] for r in
            hll_distinct(df.unionAll(df).repartition(13), "k", "v").collect()}
    assert est2 == est

    with _pytest.raises(ValueError, match="p must"):
        hll_distinct(df, "k", "v", p=2)


def test_kcenter_select(spark):
    """Farthest-point traversal on hand 2D points follows the known
    greedy order; k > n truncates; selection is deterministic."""
    import pytest as _pytest

    from combblas_spark.functions.similarity import kcenter_select

    # seed = id 0 at origin; farthest is (10,0); then (5,8); then (2,1)
    pts = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [5.0, 8.0]),
           (3, [2.0, 1.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = [(r["pos"], r["vec_id"], r["d2"])
           for r in kcenter_select(df, k=3).orderBy("pos").collect()]
    # seed 0 at origin; farthest is 1 at (10,0), d2=100; then 2 at
    # (5,8) with min(89 to origin, 89 to (10,0)) = 89
    assert got == [(0, 0, 0.0), (1, 1, 100.0), (2, 2, 89.0)]

    allk = kcenter_select(df, k=10).collect()
    assert len(allk) == 4  # truncates past n points
    with _pytest.raises(ValueError, match="k must"):
        kcenter_select(df, k=0)
    with _pytest.raises(ValueError, match="empty"):
        kcenter_select(df.where(F.col("vec_id") < 0), k=2)


def test_mix_to_budget(spark):
    """Rates follow budget*w/T with the cap at 1.0; unlisted strata
    drop; decisions are stable under corpus growth of OTHER strata;
    kept token mass tracks the target share."""
    import pytest as _pytest

    from combblas_spark.functions.sampling import mix_to_budget

    docs = spark.createDataFrame(
        [(i, "tok " * 10, "a" if i < 200 else "b") for i in range(400)],
        "doc_id long, text string, source string")
    # each doc has 10 tokens; T_a = T_b = 2000
    out = mix_to_budget(docs, {"a": 0.75, "b": 0.25}, 2000)
    kept = out.groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    # expected keep rates: a -> 1500/2000 = 0.75, b -> 500/2000 = 0.25
    assert 0.60 * 200 < got.get("a", 0) < 0.90 * 200
    assert 0.12 * 200 < got.get("b", 0) < 0.40 * 200
    # cap at 1.0: a budget far above the stratum keeps it whole
    whole = mix_to_budget(docs, {"a": 1.0}, 10**9)
    assert whole.count() == 200 and whole.where("source = 'b'").count() == 0
    # growth stability: adding more 'b' docs never flips an 'a' decision
    bigger = docs.unionByName(spark.createDataFrame(
        [(i, "tok " * 10, "b") for i in range(1000, 1400)],
        "doc_id long, text string, source string"))
    kept_a1 = {r["doc_id"] for r in
               mix_to_budget(docs, {"a": 0.75, "b": 0.25}, 2000)
               .where("source = 'a'").collect()}
    kept_a2 = {r["doc_id"] for r in
               mix_to_budget(bigger, {"a": 0.75, "b": 0.25}, 2000)
               .where("source = 'a'").collect()}
    assert kept_a1 == kept_a2
    with _pytest.raises(ValueError, match="budget"):
        mix_to_budget(docs, {"a": 1.0}, -1)
    assert mix_to_budget(docs, {}, 100).count() == 0


def test_textrank_keywords(spark):
    """Hub word in a star-shaped co-occurrence corpus outranks leaves;
    k bounds output; ranks sum <= 1 (a PageRank distribution slice)."""
    from combblas_spark.functions.text import textrank_keywords

    # every sentence couples 'spark' with a distinct word -> 'spark'
    # is the co-occurrence hub
    leaves = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = spark.createDataFrame(
        [(i, f"spark {w}") for i, w in enumerate(leaves)],
        "doc_id long, text string")
    out = textrank_keywords(docs, k=3, n_iter=8).collect()
    assert len(out) == 3
    assert out[0]["token"] == "spark"
    assert out[0]["rank"] > out[1]["rank"]
    # leaves are symmetric: ranks 2 and 3 tie, alphabetical tie-break
    assert [r["token"] for r in out[1:]] == ["alpha", "beta"]
    assert sum(r["rank"] for r in out) <= 1.000001


def test_quantize_embeddings(spark):
    """Codes are 0..255, extremes map to 0/255, degenerate dims code 0,
    and dequantization reconstructs within half a grid step."""
    from combblas_spark.functions.similarity import quantize_embeddings

    vecs = [(0, [0.0, 5.0, 1.0]), (1, [10.0, 5.0, 2.0]),
            (2, [5.0, 5.0, 3.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["codes"]
           for r in quantize_embeddings(df).collect()}
    # dim0: min 0, max 10 -> 0.0->0, 10.0->255, 5.0->127
    # dim1: degenerate -> 0 ; dim2: min 1, max 3 -> 0, 127, 255
    assert got == {0: [0, 0, 0], 1: [255, 0, 127], 2: [127, 0, 255]}, got
    # reconstruction error bound on random data
    rng = np.random.default_rng(3)
    data = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(100)]
    df2 = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: r["codes"] for r in quantize_embeddings(df2).collect()}
    cols = list(zip(*[v for _, v in data]))
    mins = [min(c) for c in cols]
    maxs = [max(c) for c in cols]
    for i, v in data:
        for d, x in enumerate(v):
            step = (maxs[d] - mins[d]) / 255.0
            deq = mins[d] + codes[i][d] * step
            assert abs(float(np.float32(x)) - deq) <= step * 1.001, (i, d)


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    from pyspark.sql import functions as F
    from combblas_spark.functions.sketch import cms_estimate, cms_sketch

    vals = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7
            + [f"tail{i}" for i in range(30)])
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = cms_sketch(df, "v")
    probes = df.select("v").distinct()
    est = {r["v"]: r["est"] for r in cms_estimate(sk, probes, "v").collect()}
    true = {r["v"]: r["c"] for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(est) == set(true)
    # one-sided bound: est >= true, always
    assert all(est[v] >= true[v] for v in true)
    # 107 items in 4x256 registers: heavy hitters are exact w.h.p. and
    # the additive error is bounded by the total count
    assert est["alpha"] == 50 and est["beta"] == 20
    assert all(est[v] - true[v] <= len(vals) for v in true)


def test_cms_sketch_is_a_crdt_under_cnt_sum_merge(spark):
    from pyspark.sql import functions as F
    from combblas_spark.functions.sketch import cms_sketch

    a = spark.createDataFrame([(f"w{i % 11}",) for i in range(40)], "v string")
    b = spark.createDataFrame([(f"w{i % 7}",) for i in range(25)], "v string")
    merged = (cms_sketch(a, "v").unionByName(cms_sketch(b, "v"))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    direct = cms_sketch(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_validates_shape(spark):
    import pytest
    from combblas_spark.functions.sketch import cms_sketch

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError):
        cms_sketch(df, "v", d=0)
    with pytest.raises(ValueError):
        cms_sketch(df, "v", w=1)


def test_lang_id_ngram_classifies_and_handles_edges(spark):
    from combblas_spark.functions.text import lang_id_ngram

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox is running with the other animals of the forest."),
            (2, "Die Kinder spielen und singen ein schönes Lied mit der ganzen Gruppe."),
            (3, "Les enfants que nous aimons jouaient dans les jardins avec leurs amis."),
            (4, "Los padres de la ciudad quieren que los jardines del parque sean buenos."),
            (5, "zzz qqq xxx"),          # no profile trigrams -> unknown
            (6, "ab"),                   # shorter than a trigram -> unknown
            (7, None),                   # NULL text -> unknown
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["lang"], r["score"]) for r in lang_id_ngram(docs).collect()}
    assert got[1][0] == "en" and got[1][1] > 0
    assert got[2][0] == "de"
    assert got[3][0] == "fr"
    assert got[4][0] == "es"
    assert got[5] == ("unknown", 0)
    assert got[6] == ("unknown", 0)
    assert got[7] == ("unknown", 0)


def test_lang_id_ngram_counts_occurrences_and_breaks_ties_lexicographically(spark):
    from combblas_spark.functions.text import lang_id_ngram

    # custom 2-language profile; text "ababab" holds "aba" x2 and "bab" x2
    # -> both languages score 2, tie broken to the smaller name "aa".
    prof = [("bb", "aba", 1), ("aa", "bab", 1)]
    docs = spark.createDataFrame([(1, "ababab")], "doc_id long, text string")
    row = lang_id_ngram(docs, profiles=prof).collect()[0]
    assert (row["lang"], row["score"]) == ("aa", 2)
    # occurrence voting: repeating a weighted gram scales the score
    prof2 = [("en", "the", 2)]
    docs2 = spark.createDataFrame([(1, "the the the")], "doc_id long, text string")
    row2 = lang_id_ngram(docs2, profiles=prof2).collect()[0]
    assert (row2["lang"], row2["score"]) == ("en", 6)


def test_phrase_search_positions_and_counts(spark):
    import pytest
    from combblas_spark.functions.text import phrase_search, inverted_index

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat sat cat sat cat"),      # overlapping repeats: 2 matches
            (3, "the sat cat"),              # words present, wrong order
            (4, "Cat! Sat?"),                # punctuation/case-robust match
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search(docs, "cat sat").collect()}
    assert got == {1: (1, 2), 2: (2, 1), 4: (1, 1)}
    # single-word phrase counts every occurrence
    one = {r["id"]: r["n_matches"]
           for r in phrase_search(docs, "cat").collect()}
    assert one == {1: 1, 2: 3, 3: 1, 4: 1}
    # prebuilt-index path gives identical results
    idx = inverted_index(docs)
    via_idx = {r["id"]: (r["n_matches"], r["first_pos"])
               for r in phrase_search(docs, "cat sat", index=idx).collect()}
    assert via_idx == got
    with pytest.raises(ValueError):
        phrase_search(docs, "!!!")


def test_cdc_chunks_edit_robustness_and_reassembly(spark):
    import pytest
    from combblas_spark.functions.dedup import cdc_chunks

    base_words = [f"tok{i % 97}x{i % 13}" for i in range(400)]
    orig = " ".join(base_words)
    edited = " ".join(["inserted"] + base_words)  # one early insertion
    docs = spark.createDataFrame(
        [(1, orig), (2, edited), (3, ""), (4, None)],
        "doc_id long, text string")
    rows = cdc_chunks(docs, mod=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    # empty/NULL docs produce no chunks
    assert 3 not in by_doc and 4 not in by_doc
    a = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    b = sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    # chunk token counts reassemble the doc exactly
    assert sum(r["n_tokens"] for r in a) == 400
    assert sum(r["n_tokens"] for r in b) == 401
    # content-defined property: the edit only re-keys the prefix chunks —
    # the suffix chunk hashes are SHARED between original and edited doc.
    ha, hb = {r["chunk_hash"] for r in a}, {r["chunk_hash"] for r in b}
    shared = ha & hb
    assert len(shared) >= len(ha) - 2, (len(ha), len(hb), len(shared))
    with pytest.raises(ValueError):
        cdc_chunks(docs, mod=1)


def test_chunk_dedup_pairs_finds_edited_near_dup(spark):
    import pytest
    from combblas_spark.functions.dedup import chunk_dedup_pairs

    words = [f"tok{i % 89}y{i % 11}" for i in range(300)]
    orig = " ".join(words)
    edited = " ".join(words[:5] + ["spliced", "in"] + words[5:])
    unrelated = " ".join(f"zed{i}q{i % 7}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, orig), (2, edited), (3, unrelated)],
        "doc_id long, text string")
    rows = chunk_dedup_pairs(docs, mod=8, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert (1, 2) in pairs          # the edit survives chunk-level dedup
    assert pairs[(1, 2)]["frac"] > 0.5
    assert all(3 not in p for p in pairs)  # unrelated doc pairs with no one
    with pytest.raises(ValueError):
        chunk_dedup_pairs(docs, min_shared=0)
    with pytest.raises(ValueError):
        chunk_dedup_pairs(docs, max_df=1)


def test_readability_counts_and_score(spark):
    from combblas_spark.functions.text import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran! Did it rain?"),
            (2, "no punctuation here at all"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string")
    got = {r["id"]: r for r in readability(docs).collect()}
    r1 = got[1]
    assert r1["n_sentences"] == 3 and r1["n_words"] == 9
    # vowel runs: the(1) cat(1) sat(1) the(1) dog(1) ran(1) did(1) it(1) rain(1-run "ai") = 9
    assert r1["n_syllables"] == 9
    expected = 206.835 - 1.015 * (9 / 3) - 84.6 * (9 / 9)
    assert abs(r1["flesch"] - round(expected, 6)) < 1e-9
    assert got[2]["n_sentences"] == 1  # unpunctuated = one sentence
    assert got[3]["flesch"] is None and got[3]["n_words"] == 0
    assert got[4]["flesch"] is None


def test_louvain_weighted_respects_multiplicity(spark):
    from combblas_spark.algorithms.labelprop import louvain

    # star: center 100 with unit edges to 1,2,3 and ONE w=10 edge to 9.
    # Unweighted (val ignored): all candidate scores tie at 2m*1 -
    # deg*1, tiebreak to the smallest community -> center joins c1.
    # Weighted: the heavy edge dominates (2m*10 - deg*deg(9)) ->
    # center joins c9. One synchronous round isolates the decision
    # (the synchronous variant oscillates on symmetric pairs, so we
    # assert the move rule, not a converged partition).
    edges = spark.createDataFrame(
        [(100, 1, 1.0), (100, 2, 1.0), (100, 3, 1.0), (100, 9, 10.0)],
        "src long, dst long, val double")
    unw = {r["id"]: r["community"]
           for r in louvain(edges, n_levels=1, n_rounds=1).collect()}
    wtd = {r["id"]: r["community"]
           for r in louvain(edges, n_levels=1, n_rounds=1,
                            weighted=True).collect()}
    assert unw[100] == 1
    assert wtd[100] == 9


def test_path_rollup_hierarchy(spark):
    import pytest
    from combblas_spark.functions.urls import path_rollup

    df = spark.createDataFrame(
        [("https://A.example/a/b/c?x=1",),
         ("https://a.example/a/b/d",),
         ("https://a.example/a/e",),
         ("https://b.example/",),          # no path segments -> no rows
         ("https://a.example/a/b/c/d/e/f",)],  # deeper than max_depth
        "url string")
    rows = {(r["host"], r["depth"], r["prefix"]): r["n_pages"]
            for r in path_rollup(df, max_depth=3).collect()}
    assert rows[("a.example", 1, "a")] == 4       # host lowercased, all under /a
    assert rows[("a.example", 2, "a/b")] == 3
    assert rows[("a.example", 3, "a/b/c")] == 2   # query stripped; deep page truncated
    assert rows[("a.example", 2, "a/e")] == 1
    assert not any(h == "b.example" for h, _, _ in rows)
    assert not any(d > 3 for _, d, _ in rows)
    with pytest.raises(ValueError):
        path_rollup(df, max_depth=0)


def test_mirror_hosts_detects_full_mirror(spark):
    import pytest
    from combblas_spark.functions.urls import mirror_hosts

    rows = []
    # big.example serves 10 pages; mirror.example serves the SAME 4
    # (a partial mirror); other.example serves unrelated content; one
    # boilerplate page ("404") appears on every host.
    for i in range(10):
        rows.append((f"https://big.example/p/{i}", f"content {i}"))
    for i in range(4):
        rows.append((f"https://mirror.example/m/{i}", f"content {i}"))
    for i in range(5):
        rows.append((f"https://other.example/o/{i}", f"different {i}"))
    for h in ("big", "mirror", "other"):
        rows.append((f"https://{h}.example/404", "not found"))
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {(r["host_a"], r["host_b"]): (r["shared"], r["frac"])
           for r in mirror_hosts(pages, min_shared=2).collect()}
    # only the real mirror pair survives min_shared=2 (the 404 page is
    # a single shared fp elsewhere)
    assert list(got) == [("big.example", "mirror.example")]
    shared, frac = got[("big.example", "mirror.example")]
    assert shared == 5                       # 4 mirrored + the 404
    assert frac == 1.0                       # full containment of the mirror
    # boilerplate cap: with max_df=2 the 404 fp (on 3 hosts) is dropped
    got2 = {(r["host_a"], r["host_b"]): r["shared"]
            for r in mirror_hosts(pages, min_shared=2, max_df=2).collect()}
    assert got2 == {("big.example", "mirror.example"): 4}
    with pytest.raises(ValueError):
        mirror_hosts(pages, min_shared=0)


def test_bloom_filter_no_false_negatives_and_crdt_merge(spark):
    import pytest
    from pyspark.sql import functions as F
    from combblas_spark.functions.sketch import bloom_build, bloom_contains

    members = spark.createDataFrame([(f"val{i}",) for i in range(40)], "v string")
    others = spark.createDataFrame([(f"other{i}",) for i in range(200)], "v string")
    bloom = bloom_build(members, m_words=4, k=3)
    # NO false negatives: every member probes true
    got = bloom_contains(members, "v", bloom, m_words=4, k=3).collect()
    assert all(r["bloom_hit"] for r in got) and len(got) == 40
    # tiny filter (252 bits, 40 keys) MUST show some false positives on
    # 200 non-members, and some true negatives
    neg = [r["bloom_hit"] for r in
           bloom_contains(others, "v", bloom, m_words=4, k=3).collect()]
    assert any(neg) and not all(neg)
    # CRDT: OR-merge of two half-filters == filter of the union
    h1 = bloom_build(members.where(F.col("v") < "val2"), m_words=4, k=3)
    h2 = bloom_build(members.where(F.col("v") >= "val2"), m_words=4, k=3)
    merged = (h1.unionByName(h2).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, bloom.collect()))
    with pytest.raises(ValueError):
        bloom_build(members, m_words=0)
