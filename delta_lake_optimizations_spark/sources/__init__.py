"""Sources & sinks: CSV readers (explicit-schema vs inferSchema), the
GraftTable parquet+log format (SURVEY.md §2.1)."""
