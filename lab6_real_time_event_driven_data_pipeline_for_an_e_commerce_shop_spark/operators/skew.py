"""Skew-mitigation: salted joins (plus AQE notes).

AQE's skew-join split (on by default in session.py) handles most skew
at runtime by splitting oversized partitions of a sort-merge join. The
salted join below is the *static* fallback for the cases AQE can't fix:
a broadcast-ineligible right side joined on a key where one value
dominates (the classic hot-customer / null-key pile-up).

Mechanics: the fact side gets a salt in [0, n) derived from ROW
identity (never from the key alone — a key-derived salt maps every
row of the hot key to the same salt and spreads nothing); the build
side is exploded n× (one copy per salt); the join key becomes
(key, salt), spreading each hot key over n reducers. The salt only
affects routing, so results are identical for any salt assignment.

Crossover (measured, tools/skew_probe.py, SCALING.md r10): at a
10^6:1 hot key on a pure equi-join, AQE's skew split beats salting
(5.65× vs 3.52× over the unmitigated SMJ at n_salts=32) — it splits
the hot partition at map-output granularity with no replication,
while salting caps the spread at n_salts and replicates the dim n×.
So: ship the plain join and let AQE split (the session default)
UNLESS AQE can't act — stream-stream joins (no AQE per micro-batch
plan reuse), a join whose output partitioning must survive for a
downstream op AQE would reshape, or an AQE-disabled stage. Those are
this function's use cases.
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
    # Salt from row identity (partition-local id), NOT the join key: a
    # key-derived salt is constant per key and would leave the hot key
    # on a single reducer. monotonically_increasing_id varies per row;
    # the result set is salt-invariant (salt only routes rows).
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
