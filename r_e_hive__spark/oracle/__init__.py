"""DuckDB differential-testing harness (SURVEY.md §5.2.1)."""
