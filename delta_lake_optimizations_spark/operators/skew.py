"""Skew-aware join: salting for hot keys (SURVEY §4 / the 100 TB checklist).

AQE's skew-join handling (on by default in our session factory) splits
oversized SORT-MERGE partitions at runtime, which covers most cases. This
module is for the case AQE can't fix: a broadcast-ineligible join where a
handful of keys dominate (e.g. a null-heavy or power-law foreign key).

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets, so one hot key becomes R parallel
tasks instead of one straggler. Identical results to a plain inner join
(verified by test), cost = R× duplication of the small side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-based skew
    mitigation. ``how`` supports inner/left (the skewed-side-preserving
    shapes). The join key keeps its name; other columns pass through."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")

    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(exploded, [on, "__salt"], how)
    return out.drop("__salt")
