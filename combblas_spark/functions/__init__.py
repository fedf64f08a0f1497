"""Training-data-pipeline functions over document/embedding tables:
text analysis, deduplication, similarity search, multimodal plumbing.

These extend the reference's capability surface (which has no string/
document functions — SURVEY.md §2.7) with the operations a 100 TB
web-corpus pipeline needs, built entirely from JVM-side
pyspark.sql.functions (no per-row Python)."""
