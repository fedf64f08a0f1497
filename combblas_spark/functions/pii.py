"""PII detection and redaction for web-text corpora.

The standard pre-training scrub pass (applied by C4, Dolma, RefinedWeb
and every serious web pipeline): find emails / IPv4 addresses /
US-SSN-shaped ids / phone-shaped numbers, count them per document, and
replace each with a typed placeholder token.

Reference parity: the reference engine has no text scrubber — this is
one of the training-data-pipeline extensions the driver brief makes
first-class. Implementation is pure JVM Column expressions
(regexp_extract_all + regexp_replace inside whole-stage codegen): a
single projection with NO shuffle, NO UDF and NO Python worker — the
op is embarrassingly parallel and scales linearly to the 100 TB corpus
(the scan cost IS the op cost).

Pattern-dialect note: every regex below restricts itself to the
intersection of Java regex (Spark) and RE2 (DuckDB oracle) — character
classes, bounded repetition, alternation and ``\\b`` word boundaries;
no backreferences, no lookaround — so the DuckDB twin in
__spark_entry__._pii_scrub_sql matches byte-for-byte.

Match semantics: patterns are applied in a fixed ORDER (email → ipv4 →
ssn → phone), each counting and redacting against the PREVIOUS stage's
output, so a dotted-quad inside an already-redacted email is neither
double-counted nor double-replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in application order. Kept as data so
# the SQL-oracle twin unrolls the exact same chain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII counts + redacted text.

    Returns (id, n_email, n_ipv4, n_ssn, n_phone, n_pii, clean_text):
    one count column per pattern class, their total, and the text with
    every match replaced by its typed placeholder.
    """
    out = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    counts = []
    for name, pat, rep in PII_PATTERNS:
        out = out.select(
            "id", *counts,
            F.size(F.regexp_extract_all("_t", F.lit(pat), F.lit(0)))
            .alias(f"n_{name}"),
            F.regexp_replace("_t", pat, rep).alias("_t"),
        )
        counts.append(f"n_{name}")
    total = None
    for c in counts:
        total = F.col(c) if total is None else total + F.col(c)
    return out.select(
        "id", *counts, total.alias("n_pii"), F.col("_t").alias("clean_text"))
