"""Driver heap sizing (VERDICT r11 #1): the heap must floor on the
WORKLOAD, not the core count — an 8-core scaling run processes the same
data as the 32-core run and died in BroadcastExchange inside the old
``max(8, cores)`` GB heap."""

from __future__ import annotations

import os

from delta_lake_optimizations_spark.session import _default_driver_mem


def _half_ram_gb() -> int:
    page = os.sysconf("SC_PAGE_SIZE")
    phys = os.sysconf("SC_PHYS_PAGES")
    return max(1, (page * phys) // (2 * 1024**3))


def test_driver_mem_floors_on_workload_not_cores(monkeypatch):
    half = _half_ram_gb()
    for cores in (1, 4, 8, 16):
        monkeypatch.setenv("SPARK_GRAFT_CPUS", str(cores))
        expect = max(2, min(24, half))
        assert _default_driver_mem() == f"{expect}g", cores


def test_driver_mem_scales_above_floor(monkeypatch):
    half = _half_ram_gb()
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    assert _default_driver_mem() == f"{max(2, min(32, half))}g"
