"""The driver's correctness gate checks exactly the first ``DRIVER_WINDOW``
registry entries in registration order. These tests pin the window so a
refactor can't silently rotate a family out of driver verification."""

from __future__ import annotations

import pytest

import pyspark.sql.types as T

from delta_lake_optimizations_spark.registry import (
    DRIVER_WINDOW,
    _DRIVER_PRIORITY,
    registry,
)
from tests.conftest import SF_DIR


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
    # MinHash/SimHash/LSH/IVF/PQ/fingerprint/chunk-embed/multimodal stubs are
    # genuinely non-SQL-expressible; everything else must carry an oracle.
    assert len(no_oracle_in_window) <= 10, no_oracle_in_window


@pytest.mark.slow  # constructs all 50 window frames (includes index builds)
def test_driver_window_has_no_complex_columns(spark):
    """The driver canonicalizes results through pandas ``sort_values``, which
    raises ``unhashable type: 'list'`` on array/map cells (and sorts struct
    cells nondeterministically). Rounds 1 AND 2 each shipped a red row from
    this exact class (`array_agg_status_profile` r01; `pipeline_chunk_embed`
    + `multimodal_byte_features` r02), so make it structurally impossible:
    no window query may return a complex-typed column — serialize vectors
    with ``array_join`` of fixed-precision strings in the registered query.
    """
    defs = registry()
    offenders = {}
    for name in _DRIVER_PRIORITY:
        df = defs[name].fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed columns in driver window: {offenders}"


def test_every_registry_name_has_had_a_driver_row():
    """VERDICT r04 #6: across all recorded CORRECTNESS rounds plus the
    current round's window, every registered query must have had at
    least one driver correctness row. A new query must enter the window
    the round it is added."""
    import json
    import os

    import glob

    seen = set(_DRIVER_PRIORITY)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        seen |= set(json.load(open(p)).keys())
    missing = [n for n in registry() if n not in seen]
    assert not missing, f"never driver-checked: {missing}"
