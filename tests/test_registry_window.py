"""The driver's correctness gate checks exactly the first ``DRIVER_WINDOW``
registry entries in registration order. These tests pin the window so a
refactor can't silently rotate a family out of driver verification."""

from __future__ import annotations

from delta_lake_optimizations_spark.registry import (
    DRIVER_WINDOW,
    _DRIVER_PRIORITY,
    registry,
)


def test_priority_fills_driver_window_exactly():
    assert len(_DRIVER_PRIORITY) == DRIVER_WINDOW
    assert len(set(_DRIVER_PRIORITY)) == DRIVER_WINDOW


def test_registry_leads_with_priority_window():
    names = list(registry().keys())
    assert names[: len(_DRIVER_PRIORITY)] == list(_DRIVER_PRIORITY)


def test_window_prefers_oracle_backed_queries():
    # Rows-only (no-oracle) queries get a weaker driver check; the window
    # should carry them only when the family has no SQL-expressible form.
    defs = registry()
    no_oracle_in_window = [
        n for n in _DRIVER_PRIORITY if defs[n].oracle is None
    ]
    # MinHash/SimHash/LSH/IVF/fingerprint/chunk-embed/multimodal stubs are
    # genuinely non-SQL-expressible; everything else must carry an oracle.
    assert len(no_oracle_in_window) <= 10, no_oracle_in_window
