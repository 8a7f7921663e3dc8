"""Skew-mitigation: salted joins (plus AQE notes).

AQE's skew-join split (on by default in session.py) handles most skew
at runtime by splitting oversized partitions of a sort-merge join. The
salted join below is the *static* fallback for the cases AQE can't fix:
a broadcast-ineligible right side joined on a key where one value
dominates (the classic hot-customer / null-key pile-up).

Mechanics: the fact side gets a deterministic salt in [0, n); the
build side is exploded n× (one copy per salt); the join key becomes
(key, salt), spreading each hot key over n reducers. Deterministic
(hash-derived salt, no RNG) so results are stable and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``key``, salted ``n_salts`` ways. Semantically
    identical to ``fact.join(dim, key, how)`` for equi-joins where
    ``dim`` is unique per key; the dim side is replicated n× (keep it
    the smaller input)."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
