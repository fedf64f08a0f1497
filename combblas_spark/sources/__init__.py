"""Sources & sinks: generators, web-page ingestion, storage (SURVEY.md §2.1)."""
