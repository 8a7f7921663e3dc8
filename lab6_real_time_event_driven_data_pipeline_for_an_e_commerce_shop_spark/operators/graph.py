"""Graph analytics on the relational engine — fixed-iteration INTEGER
PageRank.

The repo-wide claim this module completes: iterative algorithms CAN sit
under a complete cross-engine oracle when every step is integer-exact.
Floating-point PageRank is order-dependent (a sum of doubles differs in
the last ulp between partitionings, let alone engines); this one keeps
all mass in fixed-point units with integer DIV for the out-degree split
and the damping blend, so iteration k's state is a pure deterministic
function of iteration k−1 — on Spark, on DuckDB (N chained CTEs), and
in a ten-line Python reference, bit-for-bit.

Semantics per iteration (n = |nodes|, damping = num/den, base =
scale DIV n):

    mass_0(v)     = base
    contrib_k(v)  = Σ_{(u,v)∈E}  mass_k(u) DIV outdeg(u)
    dang_k        = Σ_{u : outdeg(u)=0}  mass_k(u)
    mass_{k+1}(v) = ((den−num)·base + num·(contrib_k(v) + dang_k DIV n))
                    DIV den

Truncating DIV loses a little mass each round (≤ n + den units) — the
price of exactness; ranks and ratios are unaffected at scale 10¹².

Scale shape: one distinct + degree aggregate up front; per iteration
ONE src-keyed join (edges ⋈ mass), one dst-keyed aggregate, one
left join back to nodes, and a 1-row dangling aggregate attached via a
CONSTANT-KEY equi-join (keyed ⇒ BroadcastHashJoin, never BNLJ — the
r8/r12 rule). Each iteration's frame is persisted and materialized
before the next (the standard Spark iterative discipline: without it
branch reuse re-derives iteration k−1 per consumer and the lineage
doubles per round).

Related: duplicate_clusters (operators/dedup.py) does pointer-jumping
connected components in O(log d) rounds — together they cover the two
classic iterative graph shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (module
    docstring has the exact per-iteration formula). Returns
    (node, mass) BIGINT at node grain after ``n_iter`` iterations.
    NULL endpoints are dropped; duplicate edges collapse (standard
    unweighted PageRank)."""
    num, den = int(damping[0]), int(damping[1])
    if not (0 < num < den):
        raise ValueError("damping must be a proper fraction (num, den)")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    ed = e.join(deg, "src").persist()
    dangling = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    # n is a bounded scalar (one count job) — the model-artifact
    # pattern: it becomes a plan literal on both engines
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list (no non-NULL edges)")
    base = int(scale) // n

    m = nodes.withColumn("mass", F.lit(base).cast("long")).persist()
    m.count()
    next_expr = (
        f"CAST((({(den - num) * base} + {num} *"
        f" (coalesce(_contrib, CAST(0 AS BIGINT)) + (_dang div {n})))"
        f" div {den}) AS BIGINT)"
    )
    for _ in range(int(n_iter)):
        contrib = (
            ed.join(m.withColumnRenamed("node", "src"), "src")
            .withColumn("_c", F.expr("mass div outdeg"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").cast("long").alias("_contrib"))
        )
        dang = (
            m.join(dangling, "node", "left_semi")
            .agg(
                F.coalesce(F.sum("mass"), F.lit(0)).cast("long").alias("_dang")
            )
            .withColumn("_k", F.lit(1))
        )
        prev = m
        m = (
            nodes.withColumn("_k", F.lit(1))
            .join(F.broadcast(dang), "_k")
            .join(contrib, "node", "left")
            .select("node", F.expr(next_expr).alias("mass"))
            .persist()
        )
        m.count()  # materialize before unpersisting the input it read
        prev.unpersist()
    out = m.select("node", "mass")
    for df in (nodes, ed, dangling):
        df.unpersist()
    # the final iteration's frame stays persisted — the returned plan
    # reads it (one node-grain cache; callers may unpersist after
    # consuming). Lineage stays recomputable either way.
    return out


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
) -> dict[int, int]:
    """Pure-Python twin of :func:`pagerank` — the naive reference the
    unit tests compare against (same integer formula, plain dicts)."""
    num, den = damping
    e = sorted(set((s, d) for s, d in edge_list if s is not None and d is not None))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg: dict[int, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = scale // n
    mass = {v: base for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d in e:
            contrib[d] += mass[s] // outdeg[s]
        dang = sum(mass[v] for v in nodes if v not in outdeg)
        mass = {
            v: ((den - num) * base + num * (contrib[v] + dang // n)) // den
            for v in nodes
        }
    return mass


def pagerank_oracle_sql(
    edges_sql: str,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
) -> str:
    """The DuckDB twin as N chained CTEs over ``edges_sql`` (a query
    producing columns src, dst) — iteration k's CTE applies the
    identical integer formula to CTE k−1, so the unrolled pipeline is
    the oracle for the Spark loop."""
    num, den = int(damping[0]), int(damping[1])
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"m0 AS (SELECT node, CAST({int(scale)} // (SELECT n FROM nn) AS BIGINT)"
        " AS mass FROM nodes)",
    ]
    for k in range(1, int(n_iter) + 1):
        p = k - 1
        parts.append(
            f"""m{k} AS (
        SELECT nodes.node,
               CAST((({den - num}) * ({int(scale)} // (SELECT n FROM nn))
                     + {num} * (COALESCE(c.contrib, 0)
                         + (SELECT COALESCE(SUM(mass), 0) FROM m{p}
                            WHERE NOT EXISTS (SELECT 1 FROM deg
                                              WHERE deg.src = m{p}.node))
                           // (SELECT n FROM nn))
                    ) // {den} AS BIGINT) AS mass
        FROM nodes
        LEFT JOIN (SELECT e.dst AS node,
                          CAST(SUM(m{p}.mass // deg.outdeg) AS BIGINT) AS contrib
                   FROM e JOIN m{p} ON m{p}.node = e.src
                          JOIN deg ON deg.src = e.src
                   GROUP BY 1) c USING (node)
    )"""
        )
    return ",\n".join(parts) + f"\nSELECT node, mass FROM m{int(n_iter)}"
