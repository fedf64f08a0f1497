"""DataFrame re-expressions of CombBLAS's operator inventory (SURVEY.md §2)."""
