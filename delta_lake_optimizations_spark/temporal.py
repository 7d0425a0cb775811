"""Timestamp-flavor-robust temporal expressions (top-level leaf module —
imports nothing from query/operator modules, so any of them can import it
without side-effecting the registry's registration order)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Fractional epoch seconds (double) from any timestamp flavor.

    Spark 4 refuses ``CAST(timestamp_ntz AS DOUBLE)`` (the legacy cast that
    works for TIMESTAMP_LTZ), and the driver corpus stores event times as
    parquet micros without timezone — which arrives as TIMESTAMP_NTZ under
    Spark 4's ``inferTimestampNTZ`` default. Routing through
    ``timestamp_ltz`` accepts both flavors; with the session timezone pinned
    to UTC (``session.py``, re-pinned by ``catalog.load_table`` so
    driver-owned sessions behave identically) the NTZ wall clock is
    interpreted as UTC — exactly DuckDB's ``epoch(ts)`` on a naive
    timestamp, so oracle arithmetic agrees to the microsecond.
    """
    return F.unix_micros(col.cast("timestamp_ltz")) / F.lit(1_000_000.0)
