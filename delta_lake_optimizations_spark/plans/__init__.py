"""Plan inspection + benchmarking helpers (reference §2.7 measurement harness)."""
