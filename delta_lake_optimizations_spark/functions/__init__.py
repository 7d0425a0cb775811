"""Reusable column-expression helpers (vector math, text features)."""
