"""Text analysis: tokenization, language ID, quality scoring, fingerprints.

All JVM-side Column expressions (whole-stage codegen) — deliberately
specified in ANSI-SQL-expressible form so every function has an exact
DuckDB oracle twin (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from combblas_spark.portable import pround

# Tiny deterministic English stopword list for the n-gram/stopword
# language heuristic. Order matters nowhere; membership only.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "den"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, empties preserved so
    the DuckDB twin string_split(text,' ') agrees byte-for-byte)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_tokens(text: Column) -> Column:
    """BPE-ish word tokenization: lowercase alphanumeric runs."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality: mean token length + punctuation ratio +
    stopword presence, squashed to [0,1]. Deterministic, SQL-twinnable."""
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.when(n > 0, (F.length(text) - (n - 1)).cast("double") / n).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    punct_ratio = F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    raw = 0.4 * F.least(mean_len / F.lit(8.0), F.lit(1.0)) + 0.3 * (1 - punct_ratio) + 0.3 * F.least(sw * 5, F.lit(1.0))
    return raw


def lang_id(text: Column) -> Column:
    """Stopword-vote language heuristic: en vs de vs unknown."""
    toks = tokens(F.lower(text))
    en = F.size(F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(w) for w in EN_STOPWORDS]), t)))
    de = F.size(F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(w) for w in DE_STOPWORDS]), t)))
    return (
        F.when((en == 0) & (de == 0), F.lit("unknown"))
        .when(en >= de, F.lit("en"))
        .otherwise(F.lit("de"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (rolling-hash analogue, exact-dup key)."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.md5(normalized)


# Character-trigram language profiles for lang_id_ngram — a fixed
# literal vote table (Cavnar & Trenkle 1994 reduced to membership
# weights) so the DuckDB oracle twin is a VALUES list. Weight 2 marks
# trigrams that are strongly distinctive for the language, 1 is
# supporting evidence; shared trigrams (" de" en/de/fr/es) vote for
# every language that lists them and cancel in the argmax.
LANG_TRIGRAM_PROFILES = [
    ("en", " th", 2), ("en", "the", 2), ("en", "he ", 1), ("en", "ing", 2),
    ("en", "ng ", 1), ("en", " an", 1), ("en", "and", 1), ("en", " of", 2),
    ("en", "of ", 1), ("en", " to", 1), ("en", "ion", 1), ("en", "ed ", 1),
    ("en", " is", 1), ("en", "is ", 1), ("en", " wi", 1), ("en", "ith", 2),
    ("de", " de", 1), ("de", "der", 2), ("de", "ie ", 1), ("de", "die", 2),
    ("de", "und", 2), ("de", " un", 1), ("de", "ch ", 1), ("de", "ein", 2),
    ("de", "ich", 2), ("de", "sch", 2), ("de", "ung", 2), ("de", " ge", 1),
    ("de", "cht", 1), ("de", "das", 1), ("de", "en ", 1), ("de", "nd ", 1),
    ("fr", " le", 2), ("fr", "le ", 1), ("fr", " la", 1), ("fr", "es ", 1),
    ("fr", "ent", 1), ("fr", "et ", 1), ("fr", " et", 1), ("fr", " qu", 1),
    ("fr", "que", 2), ("fr", "ue ", 1), ("fr", "les", 2), ("fr", "ait", 2),
    ("fr", "eur", 1), ("fr", "ais", 2), ("fr", " es", 1), ("fr", "de ", 1),
    ("es", " de", 1), ("es", "de ", 1), ("es", " la", 1), ("es", "la ", 2),
    ("es", "os ", 2), ("es", "el ", 1), ("es", " el", 2), ("es", " en", 1),
    ("es", "as ", 1), ("es", "ado", 2), ("es", " qu", 1), ("es", "que", 1),
    ("es", " co", 1), ("es", "con", 1), ("es", "dad", 2), ("es", "nte", 1),
]


def lang_id_ngram(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  profiles: list[tuple[str, str, int]] | None = None) -> DataFrame:
    """Character-trigram language identification (the n-gram heuristic).

    Cavnar & Trenkle (1994) rank-order profiles reduced to a fixed
    integer vote table: every overlapping character trigram of the
    whitespace-normalized lowercase text that appears in a language
    profile votes its weight for that language (occurrences count — a
    doc repeating "the" votes en once per occurrence); the language
    with the highest total wins, ties broken lexicographically, docs
    with zero profile hits (or text shorter than 3 chars, or NULL)
    come back "unknown" with score 0. Scores are integer sums, so the
    result is bit-identical across engines and partitionings.

    Scale shape: the trigram explode is ~1 row per character, but the
    64-row profile broadcast-joins (and so filters) in the SAME stage
    as the explode — only profile hits reach the groupBy shuffle, and
    partial aggregation collapses them map-side to ≤(docs × langs)
    rows. No window, no global exchange.

    Returns (id, lang, score).
    """
    spark = docs.sparkSession
    prof = spark.createDataFrame(
        profiles if profiles is not None else LANG_TRIGRAM_PROFILES,
        schema="lang string, gram string, w bigint")
    # Materialize the normalized text as a projected column BEFORE the
    # transform() lambda: referencing the regexp_replace subtree inside
    # the lambda would re-evaluate it once per trigram (the shingles()
    # lesson — codegen inlines lambda-captured subtrees per element).
    t = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    base = docs.select(F.col(id_col).alias("id"), t.alias("t"))
    n = F.length(F.col("t"))
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - 2),
                    lambda i: F.substr(F.col("t"), i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>"))
    g = base.select("id", F.explode(grams).alias("gram"))
    scores = (
        g.join(F.broadcast(prof), "gram")
        .groupBy("id", "lang").agg(F.sum("w").alias("score"))
    )
    # argmax with deterministic tiebreak: min over (-score, lang) picks
    # the highest score, then the lexicographically smallest language.
    best = (
        scores.groupBy("id")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"),
                            F.col("lang").alias("lang"))).alias("b"))
        .select("id", F.col("b.lang").alias("lang"),
                (-F.col("b.ns")).alias("score"))
    )
    return (
        docs.select(F.col(id_col).alias("id")).join(best, "id", "left")
        .select("id", F.coalesce("lang", F.lit("unknown")).alias("lang"),
                F.coalesce("score", F.lit(0)).cast("long").alias("score"))
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (single-space joined).

    Built as array_join(slice(toks, i+1, k)) per index — measured 25x
    faster than the previous k-way element_at concat_ws chain (1.5s vs
    37s for 3.6M grams at local[32]; codegen evaluates the element_at
    subtrees per gram, the slice once), byte-identical output
    (array_join and concat_ws treat empty tokens the same and split
    never yields NULLs)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.when(n >= k, grams).otherwise(F.array())


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_distinct_stopwords: int = 2,
    min_alpha_word_frac: float = 0.8,
) -> DataFrame:
    """Gopher-style document quality filter rules (the published
    Rae et al. 2021 / RefinedWeb heuristics), one boolean Column per
    rule plus the conjunction ``keep`` — so a pipeline can audit WHICH
    rule rejected each page, not just that one did. Appended columns:
    n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
    ok_stopwords, ok_alpha_words, keep. Pure JVM Column expressions
    (whole-stage codegen; exact DuckDB twin in the oracle)."""
    t = F.col(text_col)
    words = tokens(t)
    n = F.size(words)
    mean_len = F.when(n > 0, (F.length(t) - (n - 1)).cast("double") / n).otherwise(F.lit(0.0))
    # '#' occurrences + '…'-style ellipsis runs ('...'), per word
    n_hash = F.length(F.regexp_replace(t, "[^#]", ""))
    n_ellipsis = (F.length(t) - F.length(F.replace(t, F.lit("...")))) / 3
    sym_ratio = F.when(n > 0, (n_hash + n_ellipsis).cast("double") / n).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(tokens(F.lower(t))), sw))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n > 0, n_alpha.cast("double") / n).otherwise(F.lit(0.0))
    out = (
        docs.withColumn("n_words", n)
        .withColumn("ok_word_count", (n >= min_words) & (n <= max_words))
        .withColumn("ok_mean_word_len",
                    (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len))
        .withColumn("ok_symbol_ratio", sym_ratio <= max_symbol_word_ratio)
        .withColumn("ok_stopwords", n_stop >= min_distinct_stopwords)
        .withColumn("ok_alpha_words", alpha_frac >= min_alpha_word_frac)
    )
    return out.withColumn(
        "keep",
        F.col("ok_word_count") & F.col("ok_mean_word_len") & F.col("ok_symbol_ratio")
        & F.col("ok_stopwords") & F.col("ok_alpha_words"),
    )


def repetition_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_2gram_frac: float = 0.2,
    max_dup_3gram_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style intra-document repetition rules: fraction of word
    2-gram occurrences taken by the single most frequent 2-gram, and
    fraction of word 3-gram occurrences whose gram appears more than
    once — the boilerplate/keyword-stuffing detectors that complement
    the static quality rules (gopher_quality_flags). Returns
    (id, top_2gram_frac, dup_3gram_frac, keep); docs too short for a
    gram get fraction 0.0 (never rejected for being short here — that
    is the word-count rule's job). Explode + two-level count-agg per
    gram size; both aggregations shuffle on (id, gram) then id — no
    all-pairs, no Python."""
    t = F.col(text_col)

    def frac(k: int, top: bool) -> DataFrame:
        g = docs.select(F.col(id_col).alias("id"), F.explode(shingles(t, k)).alias("g"))
        c = g.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        num = F.max("c") if top else F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        return c.groupBy("id").agg(
            pround(num.cast("double") / F.sum("c")).alias(f"f{k}"))

    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(frac(2, top=True), "id", "left")
        .join(frac(3, top=False), "id", "left")
        .select(
            "id",
            F.coalesce("f2", F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce("f3", F.lit(0.0)).alias("dup_3gram_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("dup_3gram_frac") <= max_dup_3gram_frac),
    )


def token_vocabulary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary with frequency ranks — the tokenizer-training
    precursor. Returns (token, c, rank) where rank is 1-based over the
    total order (count desc, token asc). The rank is assigned with the
    JVM-only distributed zip_with_index (operators/indexing.py), not a
    single-partition window — at web scale the vocabulary is 10^8 types
    and must rank distributed."""
    from combblas_spark.operators.indexing import zip_with_index

    vocab = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = zip_with_index(
        vocab, order_cols=[F.col("c").desc(), F.col("token")],
        keep_cols=["token", "c"], pos_col="rank0")
    return ranked.select("token", "c", (F.col("rank0") + 1).alias("rank"))


def doc_rarity(docs: DataFrame, vocab_size: int = 1000,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rank-based rarity scoring — a deterministic proxy for LM-
    perplexity quality filtering (CCNet-style): mean corpus-frequency
    rank of a document's token occurrences, plus the fraction of
    occurrences outside the top-``vocab_size`` vocabulary (OOV ratio).
    Deliberately rank-based rather than log-probability: ranks are
    integers and the mean is one IEEE-exact division, so the DuckDB
    twin matches to the bit — ln() is not bit-portable across engines.
    Docs with no tokens score (0.0, 0.0). Returns
    (id, mean_rank, oov_ratio)."""
    vocab = token_vocabulary(docs, text_col)
    occ = docs.select(
        F.col(id_col).alias("id"), F.explode(word_tokens(F.col(text_col))).alias("token"))
    scored = (
        occ.join(vocab, "token")
        .groupBy("id")
        .agg(
            pround(F.avg("rank")).alias("mean_rank"),
            pround(F.avg((F.col("rank") > vocab_size).cast("double"))).alias("oov_ratio"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id")).join(scored, "id", "left")
        .select("id", F.coalesce("mean_rank", F.lit(0.0)).alias("mean_rank"),
                F.coalesce("oov_ratio", F.lit(0.0)).alias("oov_ratio"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the keyword-extraction /
    topic-tagging primitive for a training-data pipeline. Returns
    (id, term, pos, score): pos = 1..k by descending score, term
    ascending on ties; score rounded to 6dp.

    Bit-portability (the doc_rarity rule): the idf factor is the RAW
    inverse document frequency n_docs/df, not ln of it — every factor
    is then an integer or one IEEE-exact division, so engine and DuckDB
    twin rank and score identically to the bit; ln() is not. Monotone
    in the usual ln-idf for fixed tf, and the per-doc ORDER is what the
    operator delivers.

    Scale: token explode -> two hash aggs ((doc,term) counts; df per
    term) + one broadcastable n_docs scalar; the only window is
    row_number partitioned BY DOCUMENT — never global, same skew
    profile as sampling.per_group_cap.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    occ = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.col(text_col))).alias("term"))
    tf = occ.groupBy("id", "term").agg(F.count("*").alias("_tf"))
    dl = tf.groupBy("id").agg(F.sum("_tf").alias("_dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n_docs = docs.select(F.countDistinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dl, "id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "term",
            ((F.col("_tf") / F.col("_dl")) * (F.col("_n") / F.col("_df")))
            .alias("_s"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("id", "term", "pos", pround("_s").alias("score"))
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: append token_count / quality / lang_guess /
    fingerprint columns to a documents table."""
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("quality", pround(quality_score(t)))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide KEEP-FIRST paragraph dedup (the Dolma/CCNet
    paragraph-level pass, the complement of remove_boilerplate_lines):
    every distinct paragraph survives exactly ONCE — at its first
    occurrence in corpus order, first = smallest (doc id, position) —
    and every later occurrence (across documents AND repeats inside the
    same document) is stripped. Unlike boilerplate removal, the content
    itself is preserved somewhere; only redundancy is removed, which is
    what a training pipeline wants for body text (boilerplate removal
    is for nav/footer chrome, keep-first dedup is for syndicated/quoted
    content).

    Returns (id, clean_text, n_removed) for every input doc; a doc
    whose every paragraph appeared earlier comes back as '', and a doc
    with NULL text comes back as ('', 0). ``sep`` is treated as a
    LITERAL separator (regex metacharacters escaped before the split).

    Scale design: explode to (paragraph, id, pos) once; the winner per
    paragraph is ONE hash aggregate (min of the (id, pos) struct —
    map-side combined, no window, no sort); survivors join back on the
    same paragraph key, co-partitioned with the aggregate. Reassembly
    sorts WITHIN each doc only (sort_array in the per-doc aggregate).
    The keep-first rule is deterministic and partition-invariant, so
    the kept subset is stable across runs and engines.
    """
    import re as _re

    paras = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "para"),
    )
    first = paras.groupBy("para").agg(F.min(F.struct("id", "pos")).alias("_w"))
    kept = (
        paras.join(first, "para")
        .where((F.col("id") == F.col("_w.id")) & (F.col("pos") == F.col("_w.pos")))
    )
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("_nkept"),
        )
    )
    totals = paras.groupBy("id").agg(F.count(F.lit(1)).alias("_ntot"))
    # left joins so NULL-text docs (which explode to zero rows) still
    # come back as ('', 0) per the contract
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.coalesce("_ntot", F.lit(0))
             - F.coalesce("_nkept", F.lit(0))).alias("n_removed"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    min_docs: int = 2,
) -> DataFrame:
    """Site-level boilerplate removal (the CCNet / RefinedWeb line-dedup
    pass): a LINE that occurs in >= ``min_docs`` distinct documents of
    the same group (typically the host — nav bars, cookie banners,
    copyright footers) is boilerplate; strip it from every document and
    rebuild the text. ``group_col=None`` treats the whole corpus as one
    group. Returns (id, clean_text, n_removed) for every input doc —
    a fully-boilerplate document comes back as '' rather than vanishing.

    Scale design: explode to (group, line) rows once; line frequency is
    ONE hash aggregate (count distinct docs per line, map-side combined
    on the narrow (group, line-hash) key); the boilerplate decision
    joins back on the same key, so everything stays co-partitioned —
    no self-join, no window over the corpus. Reassembly sorts WITHIN
    each document only (sort_array of (pos, line) structs inside the
    per-doc aggregate, never a global sort).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    gcols = [group_col] if group_col else []
    lines = docs.select(
        F.col(id_col).alias("id"), *gcols,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    freq = (
        lines.groupBy(*gcols, "line")
        .agg(F.count_distinct("id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select(*gcols, "line")
    )
    kept = lines.join(freq, [*gcols, "line"], "left_anti")
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("_nkept"),
        )
    )
    totals = lines.groupBy("id").agg(F.count(F.lit(1)).alias("_ntot"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_ntot") - F.coalesce("_nkept", F.lit(0))).alias("n_removed"),
        )
    )


def bigram_fluency(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Weakest-link bigram fluency scoring — the deterministic stand-in
    for LM-perplexity quality filtering (CCNet trains a 5-gram KenLM;
    the filtering signal is "does any transition in this document look
    improbable under the corpus LM"). Trains bigram/unigram transition
    counts over the corpus word tokens and scores every document by

      min_prob      = min over its transitions of c2(w1,w2) / c1(w1)
      support       = sum c2 over transitions / sum c1 over transitions
      n_transitions = transition count

    Bit-portability (the doc_rarity rule — no ln/exp): each conditional
    probability is ONE IEEE division of exact integer counts, `min` is
    order-free, and `support` is one division of two exact integer
    sums, so the DuckDB twin matches to the bit. A doc with fewer than
    2 word tokens has no transitions and scores (1.0, 1.0, 0) — absence
    of evidence is not disfluency.

    Scale: the transition table is corpus-token-sized; both count
    tables aggregate map-side. The c1 join on w1 is skewed ("the" is a
    heavy hitter) — an equi-join, so AQE skew-split applies; nothing is
    vocabulary-squared and no window is used.
    """
    t = word_tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), t.alias("w"))
    tr = (
        base.where(F.size("w") >= 2)
        .select("id", F.explode(F.zip_with(
            F.slice("w", 1, F.size("w") - 1),
            F.slice("w", 2, F.size("w") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )).alias("t"))
        .select("id", "t.w1", "t.w2")
    )
    c2 = tr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = tr.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pd_ = (
        tr.join(c2, ["w1", "w2"]).join(c1, "w1")
        .groupBy("id")
        .agg(
            F.min(F.col("c2").cast("double") / F.col("c1").cast("double")).alias("_mp"),
            F.sum("c2").alias("_s2"),
            F.sum("c1").alias("_s1"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id")).join(pd_, "id", "left")
        .select(
            "id",
            pround(F.coalesce("_mp", F.lit(1.0))).alias("min_prob"),
            pround(F.coalesce(
                F.col("_s2").cast("double") / F.col("_s1").cast("double"),
                F.lit(1.0))).alias("support"),
            F.coalesce("_n", F.lit(0)).alias("n_transitions"),
        )
    )


def pack_sequences(docs: DataFrame, capacity: int = 128,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """GPT-style sequence-packing layout: documents are concatenated in
    id order and chunked into fixed ``capacity``-token training
    windows; each document is mapped to the chunk span its tokens land
    in. Returns (id, n_tokens, start, first_chunk, last_chunk,
    n_chunks, offset_in_first) — all exact integers. Token-free
    documents occupy no space and are omitted (they cannot land in a
    chunk).

    This is the concat-then-chunk packing every LLM data pipeline runs
    before training; the layout table is what a loader needs to fetch
    a chunk's documents (filter first_chunk <= c <= last_chunk).

    Scale shape: one distributed prefix_sum over doc token counts (the
    two-pass offset scan — no global window, see
    operators/indexing.prefix_sum), then pure integer projections.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    from combblas_spark.operators.indexing import prefix_sum

    t = docs.select(
        F.col(id_col).alias("id"),
        F.size(word_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    p = prefix_sum(t, [F.col("id").asc()], "n_tokens", ["id", "n_tokens"])
    first = F.expr(f"start div {capacity}")
    last = F.expr(f"(start + n_tokens - 1) div {capacity}")
    return p.select(
        "id", "n_tokens", "start",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
        F.expr(f"start % {capacity}").alias("offset_in_first"),
    )


def textrank_keywords(docs: DataFrame, k: int = 20, n_iter: int = 10,
                      alpha: float = 0.85, text_col: str = "text") -> DataFrame:
    """TextRank corpus keywords (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph. Adjacent word-token pairs form the
    undirected distinct co-occurrence edges; words get dense vertex ids
    through the distributed zip_with_index (alphabetical order — count-
    independent, so the mapping is stable under re-ingestion); the
    ENGINE'S OWN pagerank() runs the chain; top-``k`` words by
    (rank DESC, token ASC). Returns (token, rank) rounded 6dp.

    The corpus-level companion of tfidf_top_terms (per-doc keywords):
    TextRank surfaces globally central vocabulary, TF-IDF surfaces
    per-document distinctive vocabulary.

    Scale shape: the co-occurrence graph is vocabulary-sized (<<
    corpus), built with one distinct + two dictionary equi-joins; the
    PageRank inherits every scale property of algorithms/pagerank.py
    (regime switch, fused supersteps); top-k is a TakeOrdered tree
    reduce, not a global sort.
    """
    from combblas_spark.algorithms.pagerank import pagerank
    from combblas_spark.operators.indexing import zip_with_index

    t = word_tokens(F.col(text_col))
    base = docs.select(t.alias("w")).where(F.size("w") >= 2)
    tr = base.select(F.explode(F.zip_with(
        F.slice("w", 1, F.size("w") - 1),
        F.slice("w", 2, F.size("w") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )).alias("t")).select("t.w1", "t.w2")
    und = (
        tr.select(F.least("w1", "w2").alias("a"),
                  F.greatest("w1", "w2").alias("b"))
        .where(F.col("a") != F.col("b")).distinct()
    )
    words = (
        und.select(F.col("a").alias("token"))
        .unionByName(und.select(F.col("b").alias("token"))).distinct()
    )
    wl = zip_with_index(words, [F.col("token").asc()], ["token"],
                        pos_col="wid")
    da = wl.select(F.col("token").alias("a"), F.col("wid").alias("_sa"))
    db = wl.select(F.col("token").alias("b"), F.col("wid").alias("_sb"))
    ids = und.join(da, "a").join(db, "b")
    edges = (
        ids.select(F.col("_sa").alias("src"), F.col("_sb").alias("dst"))
        .unionByName(ids.select(F.col("_sb").alias("src"),
                                F.col("_sa").alias("dst")))
        .withColumn("val", F.lit(1.0))
    )
    ranks = pagerank(edges, alpha=alpha, n_iter=n_iter)
    # top-k on the ROUNDED rank: full-precision ranks carry engine-
    # specific summation-order ulps, so a cross-engine-stable cut needs
    # the 6dp value (+ token tie-break) as the selection key too
    return (
        ranks.join(wl.select(F.col("wid").alias("id"), "token"), "id")
        .select("token", pround("rank").alias("rank"))
        .orderBy(F.desc("rank"), F.asc("token")).limit(k)
    )


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Positional inverted index: one (term, id, pos) posting per word
    occurrence (word_tokens rule, 1-based positions over the filtered
    token array). The retrieval-side primitive behind phrase_search —
    at web scale this table is what you materialize (bucketed by term)
    instead of re-tokenizing per query. One posexplode, no shuffle.
    """
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_tokens(F.col(text_col))).alias("pos0", "term"),
    ).select("term", "id", (F.col("pos0") + 1).cast("long").alias("pos"))


def phrase_search(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text",
                  index: DataFrame | None = None) -> DataFrame:
    """Exact phrase query over the positional inverted index: a doc
    matches at position p iff word i of the phrase is at p+i for all i
    (the classic positional-postings intersection). Returns
    (id, n_matches, first_pos) for matching docs only.

    Scale shape: one term-filtered posting slice per phrase word —
    each a pushed-down filter on the (materialized, term-bucketed)
    index — intersected by k-1 equi-joins on (id, anchor_pos). Join
    input sizes are term-frequency-sized, not corpus-sized; the rarest
    word bounds every intermediate (Catalyst reorders the equi-joins;
    at web scale sort the words by df yourself if you skip the
    optimizer). Pass ``index=`` to reuse a prebuilt/materialized
    inverted_index instead of re-tokenizing ``docs``.
    """
    import re as _re

    words = [w for w in _re.split("[^a-z0-9]+", phrase.lower()) if w]
    if not words:
        raise ValueError(f"phrase_search: no words in phrase {phrase!r}")
    idx = index if index is not None else inverted_index(docs, id_col, text_col)
    base = idx.where(F.col("term") == words[0]) \
              .select("id", F.col("pos").alias("p0"))
    for i, w in enumerate(words[1:], start=1):
        nxt = idx.where(F.col("term") == w) \
                 .select("id", (F.col("pos") - i).alias("p0"))
        base = base.join(nxt, ["id", "p0"])
    return base.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").alias("first_pos"))


def readability(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease scoring from integer counts: sentences =
    runs of [.!?], words = word_tokens, syllables = vowel-runs
    ([aeiouy]+) — the classic proxy; score = 206.835 - 1.015 * (words /
    sentences) - 84.6 * (syllables / words), composed with identical
    IEEE double ops in both engines and rounded 6dp (the
    greedy-modularity bit-portability precedent: integer moments, one
    fixed float composition). Zero-sentence docs count as one sentence
    (an unpunctuated doc is one long sentence); zero-word docs score
    NULL (nothing to read). Returns (id, n_words, n_sentences,
    n_syllables, flesch).

    Scale shape: three regexp_extract_all counts per row, one
    projection — no explode, no shuffle at all.
    """
    t = F.col(text_col)
    n_words = F.size(word_tokens(t))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))), F.lit(1))
    n_syll = F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"),
                                         F.lit(0)))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.when(n_words > 0, pround(flesch)).alias("flesch"),
    )
