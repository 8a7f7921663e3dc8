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
left join back to nodes, and a 1-row dangling aggregate attached via an
explicit broadcast crossJoin. (A lit(1) "constant-key equi-join"
constant-folds the key away and plans as BNLJ anyway — the r14 q76
lesson: literal keys fold; the keyed⇒BHJ rule needs a DATA column.
A deliberate 1-row broadcast cross product is the honest spelling —
linear, and exempt from any future no-BNLJ pin on q77/q78.) Each
iteration's frame is eagerly localCheckpoint'ed
before the next — the standard Spark iterative discipline, and
specifically CHECKPOINT rather than persist: persist caches blocks but
keeps the full logical plan, so the unrolled loop's plan doubles per
round and whole-stage codegen compiles ever-larger methods (measured
r14: an intermittent driver-heap OOM at collect); checkpointing
truncates lineage to constant depth.

Related: duplicate_clusters (operators/dedup.py) does pointer-jumping
connected components in O(log d) rounds. The module's r15 additions —
bfs_hops (min-hop reach) and shortest_paths (hop-capped Bellman-Ford)
— share the same contract shape: an integer relaxation loop with
truncated lineage on the Spark side, an engine-native WITH RECURSIVE
fixpoint as the DuckDB oracle, and the hop cap as the shared semantic
that makes cyclic recursion terminate. Together the four cover the
classic iterative graph shapes: rank (pagerank), components
(duplicate_clusters / q79), reach (bfs_hops), distance
(shortest_paths).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def _scoped_loop_width(st: "_PRState"):
    """Scope the session shuffle width to the MEASURED graph size for
    the duration of an eager iteration loop (r18, VERDICT r17 #3): the
    per-round checkpoint materializations otherwise run at the session
    static width — 200 store/exchange cycles per iteration for a
    ~1.7k-node gate-SF graph (the r15/r16 lesson), or 16 serializing a
    billion-edge production graph if a constant were baked in. The
    edge frame is persisted, so this count materializes the persist
    the first iteration would otherwise pay, and loop_width sizes the
    rounds from that result-bounded cardinality. Restored in finally;
    the caller's width is untouched outside the loop."""
    from .dedup import loop_width

    spark = st.ed.sparkSession
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_width(st.ed.count()))
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


class _PRState:
    """Shared setup for the pagerank family: node/seed frames, the
    (weighted) out-degree edge frame, the dangling set, and the update
    expression. One builder so the fixed-iteration, converged, and
    weighted variants cannot drift apart."""

    def __init__(
        self,
        edges: DataFrame,
        damping: tuple[int, int],
        scale: int,
        src_col: str,
        dst_col: str,
        seeds: DataFrame | None,
        weight_col: str | None,
    ) -> None:
        num, den = int(damping[0]), int(damping[1])
        if not (0 < num < den):
            raise ValueError("damping must be a proper fraction (num, den)")
        self.num, self.den = num, den
        if weight_col is None:
            # unweighted: duplicate edges collapse; _w == 1 so the ONE
            # contribution formula (mass*w DIV outw) reduces exactly to
            # mass DIV outdeg — the pre-r15 (and oracle) arithmetic
            e = (
                edges.select(
                    F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
                )
                .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
                .distinct()
                .withColumn("_w", F.lit(1).cast("long"))
            )
        else:
            # weighted: duplicate (src,dst) pairs SUM their weights;
            # weights must be POSITIVE integers (fixed-point discipline)
            raw = edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("long").alias("_w"),
            ).filter(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & F.col("_w").isNotNull()
            )
            # positivity is validated on the RAW weights, BEFORE the
            # per-pair sum (ADVICE r15): duplicate edges (+5, -2) must
            # raise, not silently pass as 3 — the documented contract
            # is per-edge positive, and the oracle/reference twins sum
            # only weights this check has already admitted
            rmin = raw.agg(F.min("_w")).collect()[0][0]
            if rmin is not None and rmin <= 0:
                raise ValueError(
                    f"pagerank: edge weights must be positive (min {rmin})"
                )
            e = raw.groupBy("src", "dst").agg(
                F.sum("_w").cast("long").alias("_w")
            )
            wmax = e.agg(F.max("_w")).collect()[0][0]
            # per-edge product mass*w must stay in int64: per-node mass
            # is <= scale (truncating DIV only loses mass), so the bound
            # is scale*max_w < 2^63 — fail loudly, never wrap
            if wmax is not None and int(scale) * int(wmax) >= 2**63:
                raise ValueError(
                    f"pagerank: scale*max_weight = {int(scale) * int(wmax)}"
                    " overflows int64 — lower scale or rescale weights"
                )
        base_nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        if seeds is None:
            seed_nodes = base_nodes
        else:
            seed_nodes = base_nodes.join(
                seeds.select("node").distinct(), "node", "left_semi"
            )
        # one node-grain frame carrying the seed flag (broadcast-size
        # metadata column — no extra join inside the loop)
        self.nodes = base_nodes.join(
            seed_nodes.withColumn("_seed", F.lit(1)), "node", "left"
        ).select(
            "node", F.coalesce("_seed", F.lit(0)).alias("_seed")
        ).persist()
        deg = e.groupBy("src").agg(F.sum("_w").cast("long").alias("outw"))
        self.ed = e.join(deg, "src").persist()
        self.dangling = self.nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).persist()
        # n / ns are bounded scalars (one count job each) — the
        # model-artifact pattern: they become plan literals on both
        # engines
        counts = self.nodes.agg(
            F.count(F.lit(1)), F.sum("_seed")
        ).collect()[0]
        self.n, self.ns = counts[0], int(counts[1] or 0)
        if self.n == 0:
            raise ValueError("pagerank: empty edge list (no non-NULL edges)")
        if self.ns == 0:
            raise ValueError("pagerank: no seed intersects the graph's nodes")
        self.base = int(scale) // self.ns
        self.next_expr = (
            f"CAST(((({(den - num) * self.base} * _seed) + {num} *"
            f" (coalesce(_contrib, CAST(0 AS BIGINT)) +"
            f" (_dang div {self.ns}) * _seed))"
            f" div {den}) AS BIGINT)"
        )
        # localCheckpoint (eager) rather than persist: persist keeps the
        # FULL logical plan for planning/codegen even though blocks are
        # cached, so an unrolled k-iteration loop carries a plan that
        # doubles per round — janino then compiles giant generated
        # methods and a modest driver heap OOMs (found r14: q78
        # intermittently died at collect inside a 67-query sim JVM).
        # Checkpointing TRUNCATES lineage per iteration — constant plan
        # depth, constant codegen size; materialization is eager and
        # deterministic.
        self.m0 = self.nodes.withColumn(
            "mass", (F.lit(self.base) * F.col("_seed")).cast("long")
        ).select("node", "mass").localCheckpoint(True)

    def step_frame(self, m: DataFrame) -> DataFrame:
        """One iteration's LAZY frame (no checkpoint) — step() is this
        plus lineage truncation. Split out so the plan pin can assert
        the per-iteration physical shape (the checkpointed frame's
        plan is just a Scan ExistingRDD)."""
        contrib = (
            self.ed.join(m.withColumnRenamed("node", "src"), "src")
            .withColumn("_c", F.expr("(mass * _w) div outw"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").cast("long").alias("_contrib"))
        )
        dang = (
            m.join(self.dangling, "node", "left_semi")
            .agg(
                F.coalesce(F.sum("mass"), F.lit(0)).cast("long").alias("_dang")
            )
        )
        # deliberate 1-row broadcast cross product (module docstring):
        # a lit(1) join key would constant-fold into the same BNLJ shape
        # while CLAIMING to be keyed — say what the plan does.
        return (
            self.nodes.crossJoin(F.broadcast(dang))
            .join(contrib, "node", "left")
            .select("node", F.expr(self.next_expr).alias("mass"))
        )

    def step(self, m: DataFrame) -> DataFrame:
        return self.step_frame(m).localCheckpoint(True)

    def release(self) -> None:
        for df in (self.nodes, self.ed, self.dangling):
            df.unpersist()


def pagerank(
    edges: DataFrame,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (module
    docstring has the exact per-iteration formula). Returns
    (node, mass) BIGINT at node grain after ``n_iter`` iterations.
    NULL endpoints are dropped; duplicate edges collapse (standard
    unweighted PageRank) unless ``weight_col`` is given.

    ``seeds`` (a frame with a ``node`` column) switches to
    PERSONALIZED PageRank: the teleport term and the dangling-mass
    redistribution land on the SEED set instead of all nodes —
    mass_0(v) = scale DIV |S| for v in S else 0, and the update's base
    and dang terms apply only on S. Uniform PageRank IS the seeds =
    all-nodes special case, so one code path (and one oracle shape)
    serves both — seeds are intersected with the graph's nodes first
    (a seed outside the graph carries no edges and would strand
    teleport mass on a non-node).

    ``weight_col`` (r15) switches to WEIGHTED PageRank under the same
    fixed-point discipline: weights are positive int64 (validated),
    duplicate (src,dst) pairs sum theirs, and each edge carries
    mass*w DIV W_u where W_u is u's weighted out-degree — with w == 1
    this IS the unweighted formula, so one code path again. The
    scale*max_weight int64 envelope is enforced loudly at setup."""
    st = _PRState(edges, damping, scale, src_col, dst_col, seeds, weight_col)
    m = st.m0
    with _scoped_loop_width(st):
        for _ in range(int(n_iter)):
            m = st.step(m)
    st.release()
    return m


def pagerank_converged(
    edges: DataFrame,
    tol_units: int,
    max_iter: int = 50,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> tuple[DataFrame, int, int]:
    """PageRank run to CONVERGENCE (r15): iterate :func:`pagerank`'s
    exact integer step until the L1 delta sum_v |mass_k(v) −
    mass_{k−1}(v)| drops to ``tol_units`` fixed-point units or below
    (or ``max_iter`` is hit). Returns (masses, n_iters_run,
    final_l1_delta) — the frame is BIT-IDENTICAL to
    pagerank(n_iter=n_iters_run, …) with the same arguments
    (test-pinned), because both run the same _PRState.step; the only
    addition is one bounded 1-row delta aggregate per iteration (node
    sets are identical every round, so an inner join measures every
    node). tol_units is in mass units: scale=10**12 and tol_units=10**6
    means "total movement below 1e-6 of all mass"."""
    if int(tol_units) < 0:
        raise ValueError("tol_units must be >= 0")
    st = _PRState(edges, damping, scale, src_col, dst_col, seeds, weight_col)
    m = st.m0
    n_run, delta = 0, None
    with _scoped_loop_width(st):
        for _ in range(int(max_iter)):
            nxt = st.step(m)
            n_run += 1
            delta = int(
                nxt.join(m.withColumnRenamed("mass", "_prev"), "node")
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("mass") - F.col("_prev"))), F.lit(0)
                    ).cast("long")
                )
                .collect()[0][0]
            )
            m = nxt
            if delta <= int(tol_units):
                break
    st.release()
    return m, n_run, int(delta if delta is not None else 0)


def pagerank_reference(
    edge_list: list[tuple],
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    seeds: list[int] | None = None,
    weighted: bool = False,
) -> dict[int, int]:
    """Pure-Python twin of :func:`pagerank` — the naive reference the
    unit tests compare against (same integer formula, plain dicts;
    ``seeds`` = personalized teleport set, None = uniform). With
    ``weighted=True`` edge_list items are (src, dst, w) and duplicate
    pairs sum their weights — the :func:`pagerank` weight_col
    contract."""
    num, den = damping
    w_by_pair: dict[tuple[int, int], int] = {}
    if weighted:
        for s, d, w in edge_list:
            if s is None or d is None or w is None:
                continue
            # raw-weight positivity, matching pagerank's pre-sum check
            # (ADVICE r15: a (+5, -2) duplicate pair must raise, not
            # silently sum to 3)
            if int(w) <= 0:
                raise ValueError("edge weights must be positive")
            w_by_pair[(s, d)] = w_by_pair.get((s, d), 0) + int(w)
    else:
        for s, d in edge_list:
            if s is None or d is None:
                continue
            w_by_pair[(s, d)] = 1
    e = sorted(w_by_pair)
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outw: dict[int, int] = {}
    for s, d in e:
        outw[s] = outw.get(s, 0) + w_by_pair[(s, d)]
    seed_set = set(nodes) if seeds is None else (set(seeds) & set(nodes))
    if not seed_set:
        raise ValueError("no seed intersects the graph's nodes")
    ns = len(seed_set)
    base = scale // ns
    mass = {v: (base if v in seed_set else 0) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d in e:
            contrib[d] += (mass[s] * w_by_pair[(s, d)]) // outw[s]
        dang = sum(mass[v] for v in nodes if v not in outw)
        mass = {
            v: (
                (den - num) * base * (v in seed_set)
                + num * (contrib[v] + (dang // ns) * (v in seed_set))
            )
            // den
            for v in nodes
        }
    return mass


def pagerank_oracle_sql(
    edges_sql: str,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    seeds_sql: str | None = None,
    weighted: bool = False,
) -> str:
    """The DuckDB twin as N chained CTEs over ``edges_sql`` (a query
    producing columns src, dst — plus w when ``weighted``) — iteration
    k's CTE applies the identical integer formula to CTE k−1, so the
    unrolled pipeline is the oracle for the Spark loop. ``seeds_sql``
    (a query producing a ``node`` column) switches to the personalized
    form; None = uniform (seeds = all nodes — the same reduction the
    Spark side uses). ``weighted=True`` mirrors pagerank(weight_col=):
    duplicate (src,dst) pairs SUM weights, out-degree is the weight
    sum, each edge carries mass·w // W_u.

    r17: every chained CTE is ``AS MATERIALIZED`` — iteration k
    references m(k−1) TWICE (contrib join + dangling scalar subquery),
    so DuckDB's per-reference inlining evaluated the mass chain 2^N
    times (the r16 kcore lesson at base 2). Materialization is
    evaluation strategy only — masses are bit-identical."""
    num, den = int(damping[0]), int(damping[1])
    seeds_src = (
        "SELECT node FROM base_nodes"
        if seeds_sql is None
        else f"SELECT node FROM ({seeds_sql}) WHERE node IN"
             " (SELECT node FROM base_nodes)"
    )
    if weighted:
        e_cte = (
            f"WITH e AS MATERIALIZED (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w"
            f" FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL"
            " AND w IS NOT NULL GROUP BY 1, 2)"
        )
        deg_cte = (
            "deg AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg"
            " FROM e GROUP BY 1)"
        )
        contrib_sum = "SUM((m{p}.mass * e.w) // deg.outdeg)"
    else:
        e_cte = (
            f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})"
            " WHERE src IS NOT NULL AND dst IS NOT NULL)"
        )
        deg_cte = (
            "deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg"
            " FROM e GROUP BY 1)"
        )
        contrib_sum = "SUM(m{p}.mass // deg.outdeg)"
    parts = [
        e_cte,
        "base_nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"seeds AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_src}))",
        "nodes AS MATERIALIZED (SELECT base_nodes.node,"
        " CASE WHEN EXISTS (SELECT 1 FROM seeds WHERE seeds.node ="
        " base_nodes.node) THEN 1 ELSE 0 END AS is_seed FROM base_nodes)",
        deg_cte,
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds)",
        f"m0 AS MATERIALIZED (SELECT node, CAST(({int(scale)} // (SELECT ns FROM nn))"
        " * is_seed AS BIGINT) AS mass FROM nodes)",
    ]
    for k in range(1, int(n_iter) + 1):
        p = k - 1
        parts.append(
            f"""m{k} AS MATERIALIZED (
        SELECT nodes.node,
               CAST((({den - num}) * ({int(scale)} // (SELECT ns FROM nn))
                       * nodes.is_seed
                     + {num} * (COALESCE(c.contrib, 0)
                         + ((SELECT COALESCE(SUM(mass), 0) FROM m{p}
                             WHERE NOT EXISTS (SELECT 1 FROM deg
                                               WHERE deg.src = m{p}.node))
                            // (SELECT ns FROM nn)) * nodes.is_seed)
                    ) // {den} AS BIGINT) AS mass
        FROM nodes
        LEFT JOIN (SELECT e.dst AS node,
                          CAST({contrib_sum.format(p=p)} AS BIGINT) AS contrib
                   FROM e JOIN m{p} ON m{p}.node = e.src
                          JOIN deg ON deg.src = e.src
                   GROUP BY 1) c USING (node)
    )"""
        )
    return ",\n".join(parts) + f"\nSELECT node, mass FROM m{int(n_iter)}"


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Minimum-hop BFS distance from a seed set: (node, hops) BIGINT
    for every node reachable within ``max_hops`` edges (unreached
    nodes are ABSENT — distance is undefined, not sentinel-coded).
    ``directed=False`` walks edges both ways. Seeds are intersected
    with the graph's endpoints first (the pagerank seeds contract);
    ``max_hops`` caps BOTH engines identically, so the frame has a
    complete recursive-CTE oracle (:func:`bfs_oracle_sql`) — the cap
    is what makes the SQL recursion terminate on cyclic graphs (an
    uncapped walk enumerates unboundedly long paths around a cycle).

    Per round: one src-keyed join (frontier ⋈ edges) + one dst-keyed
    MIN aggregate + one node-keyed MIN fold into the label table —
    shuffle ∝ edges, state ∝ reached nodes; lineage truncated per
    round (localCheckpoint, the pagerank discipline); early exit on a
    fixpoint round (one bounded scalar per round, like
    duplicate_clusters). Integer hops end to end."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = (
        nodes.join(seeds.select("node").distinct(), "node", "left_semi")
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(True)
    )
    if labels.isEmpty():
        raise ValueError("bfs_hops: no seed intersects the graph's nodes")
    for _ in range(int(max_hops)):
        relaxed = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("hops") + F.lit(1)).cast("long").alias("hops"))
        )
        nxt = (
            labels.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").cast("long").alias("hops"))
            .localCheckpoint(True)
        )
        # fixpoint check: BFS labels only ever ADD nodes or lower hops,
        # so "same row count AND same hop sum" == identical tables
        # (two bounded scalars in one job)
        a = labels.agg(F.count(F.lit(1)), F.sum("hops")).collect()[0]
        b = nxt.agg(F.count(F.lit(1)), F.sum("hops")).collect()[0]
        labels = nxt
        if tuple(a) == tuple(b):
            break
    e.unpersist()
    return labels


def bfs_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    max_hops: int = 8,
    directed: bool = True,
) -> str:
    """The DuckDB twin of :func:`bfs_hops` as the engine-native
    WITH RECURSIVE fixpoint: `walk` enumerates every (node, path
    length) pair derivable within the hop cap (UNION dedups, the cap
    bounds path length, so it terminates even on cycles) and MIN per
    node is the hop distance — exactly what the Spark relaxation loop
    converges to within the same cap."""
    rev = (
        ""
        if directed
        else " UNION SELECT dst AS src, src AS dst FROM"
             f" ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL"
    )
    return f"""
WITH RECURSIVE e AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql})
        WHERE src IS NOT NULL AND dst IS NOT NULL{rev}
    )
),
base_nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS (
    SELECT DISTINCT node FROM ({seeds_sql})
    WHERE node IN (SELECT node FROM base_nodes)
),
walk(node, hops) AS (
    SELECT node, 0 FROM seeds
    UNION
    SELECT e.dst, walk.hops + 1
    FROM walk JOIN e ON e.src = walk.node
    WHERE walk.hops < {int(max_hops)}
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    directed: bool = True,
) -> DataFrame:
    """Hop-capped WEIGHTED shortest paths (Bellman-Ford relaxation):
    (node, dist) BIGINT where dist = minimum total edge weight over
    paths of at most ``max_hops`` edges from the seed set (unreached
    nodes absent). ``weight_col`` None means w ≡ 1, where dist IS the
    BFS hop distance — :func:`bfs_hops` is the w ≡ 1 special case
    (test-pinned identity). Weights are positive int64 (validated);
    the max_hops·max_weight int64 envelope is enforced loudly.
    Duplicate (src,dst) edges keep the MINIMUM weight (the only one a
    shortest path would use).

    After k rounds the label table holds the exact minimum over
    ≤ k-edge paths (the Bellman-Ford invariant), so the hop cap is a
    semantic contract shared with the recursive-CTE oracle
    (:func:`shortest_paths_oracle_sql`) exactly like bfs_hops'; a
    fixpoint round exits early WITHOUT changing the answer (if a full
    relaxation changes nothing, no longer path improves any label —
    induction). Per round: one src-keyed join + one dst-keyed MIN +
    one node-keyed MIN fold, lineage truncated per round."""
    w_expr = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w_expr.alias("_w"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & F.col("_w").isNotNull()
        )
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "_w"
            )
        )
    e = e.groupBy("src", "dst").agg(F.min("_w").alias("_w")).persist()
    wmin, wmax = e.agg(F.min("_w"), F.max("_w")).collect()[0]
    if wmin is not None and wmin <= 0:
        raise ValueError(
            f"shortest_paths: edge weights must be positive (min {wmin})"
        )
    if wmax is not None and int(max_hops) * int(wmax) >= 2**63:
        raise ValueError(
            f"shortest_paths: max_hops*max_weight = {int(max_hops) * int(wmax)}"
            " overflows int64 — lower the cap or rescale weights"
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = (
        nodes.join(seeds.select("node").distinct(), "node", "left_semi")
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(True)
    )
    if labels.isEmpty():
        raise ValueError("shortest_paths: no seed intersects the graph's nodes")
    for _ in range(int(max_hops)):
        relaxed = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("_w")).cast("long").alias("dist"))
        )
        nxt = (
            labels.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint(True)
        )
        # fixpoint: labels only ever ADD nodes or LOWER dists, so
        # equal (count, sum) means identical tables (adding raises
        # count; with equal counts, only drops are possible, which
        # strictly lower the sum)
        a = labels.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        b = nxt.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        labels = nxt
        if tuple(a) == tuple(b):
            break
    e.unpersist()
    return labels


def shortest_paths_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    max_hops: int = 8,
    weighted: bool = False,
    directed: bool = True,
) -> str:
    """The DuckDB twin of :func:`shortest_paths`: the recursive walk
    enumerates every (node, path weight, path length) triple within
    the hop cap — finite, so it terminates on cycles — and MIN(d) per
    node is the capped shortest distance, exactly the Bellman-Ford
    k-round invariant. ``edges_sql`` yields (src, dst) or
    (src, dst, w) when ``weighted``; duplicate pairs keep MIN(w)."""
    w_sel = "w" if weighted else "1 AS w"
    w_guard = " AND w IS NOT NULL" if weighted else ""
    rev = (
        ""
        if directed
        else f" UNION ALL SELECT dst AS src, src AS dst, {w_sel} FROM"
             f" ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL"
             f"{w_guard}"
    )
    return f"""
WITH RECURSIVE e AS (
    SELECT src, dst, CAST(MIN(w) AS BIGINT) AS w FROM (
        SELECT src, dst, {w_sel} FROM ({edges_sql})
        WHERE src IS NOT NULL AND dst IS NOT NULL{w_guard}{rev}
    ) GROUP BY 1, 2
),
base_nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS (
    SELECT DISTINCT node FROM ({seeds_sql})
    WHERE node IN (SELECT node FROM base_nodes)
),
walk(node, d, hops) AS (
    SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
    UNION
    SELECT e.dst, walk.d + e.w, walk.hops + 1
    FROM walk JOIN e ON e.src = walk.node
    WHERE walk.hops < {int(max_hops)}
)
SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY node
"""


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + degree + local clustering coefficient
    over the UNDIRECTED simple graph induced by ``edges`` (direction,
    duplicates, self-loops, and NULL endpoints dropped). Returns
    (node, n_triangles, degree, clust_micro) where clust_micro =
    2·T·10⁶ DIV (deg·(deg−1)) in integer micro-units (0 when deg < 2)
    — the graph family's LOCAL-STRUCTURE shape next to rank (q77),
    components (q79), reach (q81), and distance.

    DEGREE-ORDERED orientation (the MapReduce triangle-counting
    discipline, Suri & Vassilvitskii 2011): each undirected edge is
    oriented from its lower-(degree, node) endpoint to the higher, so
    a triangle {x,y,z} with ranks rx<ry<rz is enumerated EXACTLY once
    as the wedge (x→y, x→z) closed by the edge (y→z). Out-degrees
    under this orientation are O(√m), which bounds the wedge join's
    fanout on skewed (power-law) graphs — orienting by node id alone
    would pivot every wedge through the hub. The rank comparison rides
    IN the wedge join's condition (equi-join on the pivot node with a
    residual tuple inequality); the closing check is a pure equi-join.

    Deterministic and engine-portable: ranks are (degree, node) tuple
    comparisons — no hashing, no floats — so the DuckDB oracle
    (:func:`triangle_oracle_sql`) replicates the orientation exactly."""
    e = (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .filter(
            F.col("_s").isNotNull()
            & F.col("_d").isNotNull()
            & (F.col("_s") != F.col("_d"))
        )
    )
    und = e.select(
        F.least("_s", "_d").alias("a"), F.greatest("_s", "_d").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    nodes = deg.select("node", "degree")
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("_da")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("_db")
    )
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(lower_first, F.col("_db")).otherwise(F.col("_da"))
            .alias("_dd"),
        )
    )
    o1 = oriented.select(
        F.col("src").alias("_x"), F.col("dst").alias("_y"),
        F.col("_dd").alias("_dy"),
    )
    o2 = oriented.select(
        F.col("src").alias("_x2"), F.col("dst").alias("_z"),
        F.col("_dd").alias("_dz"),
    )
    o3 = oriented.select(
        F.col("src").alias("_y3"), F.col("dst").alias("_z3")
    )
    wedge_cond = (F.col("_x") == F.col("_x2")) & (
        (F.col("_dy") < F.col("_dz"))
        | ((F.col("_dy") == F.col("_dz")) & (F.col("_y") < F.col("_z")))
    )
    tri = (
        o1.join(o2, wedge_cond)
        .join(
            o3,
            (F.col("_y3") == F.col("_y")) & (F.col("_z3") == F.col("_z")),
            "left_semi",
        )
        .select("_x", "_y", "_z")
    )
    per_node = (
        tri.select(F.col("_x").alias("node"))
        .unionByName(tri.select(F.col("_y").alias("node")))
        .unionByName(tri.select(F.col("_z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
    )
    return (
        nodes.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("_t", F.lit(0)).cast("long").alias("n_triangles"),
            "degree",
            F.expr(
                "CAST(CASE WHEN degree >= 2 THEN"
                " (2 * coalesce(_t, 0) * 1000000)"
                " DIV (degree * (degree - 1)) ELSE 0 END AS BIGINT)"
            ).alias("clust_micro"),
        )
    )


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_counts` — identical degree-ordered
    orientation and integer clustering arithmetic over ``edges_sql``
    (a query producing src, dst; direction/duplicates ignored)."""
    return f"""
WITH und AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM ({edges_sql})
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
    GROUP BY 1
),
oriented AS (
    SELECT CASE WHEN (da.degree, und.a) < (db.degree, und.b)
                THEN und.a ELSE und.b END AS src,
           CASE WHEN (da.degree, und.a) < (db.degree, und.b)
                THEN und.b ELSE und.a END AS dst,
           CASE WHEN (da.degree, und.a) < (db.degree, und.b)
                THEN db.degree ELSE da.degree END AS dd
    FROM und
    JOIN deg da ON da.node = und.a
    JOIN deg db ON db.node = und.b
),
tri AS (
    SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
    FROM oriented o1
    JOIN oriented o2 ON o2.src = o1.src
                    AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
    WHERE EXISTS (SELECT 1 FROM oriented o3
                  WHERE o3.src = o1.dst AND o3.dst = o2.dst)
),
pn AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS t
    FROM (SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
    GROUP BY 1
)
SELECT deg.node,
       CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
       deg.degree,
       CAST(CASE WHEN deg.degree >= 2
                 THEN (2 * COALESCE(pn.t, 0) * 1000000)
                      // (deg.degree * (deg.degree - 1))
                 ELSE 0 END AS BIGINT) AS clust_micro
FROM deg LEFT JOIN pn USING (node)
"""


def link_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Link prediction by Adamic–Adar common-neighbor scoring over the
    undirected simple graph: for every NON-ADJACENT pair (a, b) with at
    least one common neighbor, ``aa_micro = Σ_z 10¹² DIV
    log2_interp_micro(deg(z))`` over the common neighbors z — the
    classic 1/log(deg) weighting made integer-exact and
    engine-portable (log2 ∝ ln, so rankings are identical; the log
    table + interpolation is the published-constant discipline).
    Returns (a, b, n_common, aa_micro) with a < b canonical.

    ``max_degree`` is the HUB knob (honest-lossy, the q24 df-cut
    pattern): a pivot z of degree d contributes (d choose 2) wedges —
    quadratic in the hottest node — while its per-pair weight
    1/log2(d) is the SMALLEST of any pivot, so dropping pivots above
    ``max_degree`` bounds the wedge join at the cost of the
    least-informative contributions. The oracle replicates the
    identical integer cut. On bipartite graphs the knob doubles as a
    mode selector: cutting above the dense side's degree floor leaves
    only sparse-side pivots (e.g. supplier–supplier links through
    shared customers, never the customer–customer explosion).

    A pivot needs two distinct neighbors to form a wedge, so deg(z) ≥ 2
    on every scored row and the log divisor is never zero."""
    from ..functions.expressions import log2_interp_micro_sql

    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(
            F.col("_s").isNotNull()
            & F.col("_d").isNotNull()
            & (F.col("_s") != F.col("_d"))
        )
    )
    und = e.select(
        F.least("_s", "_d").alias("a"), F.greatest("_s", "_d").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    piv = (
        und.select(F.col("a").alias("_z"), F.col("b").alias("_n"))
        .unionByName(und.select(F.col("b").alias("_z"), F.col("a").alias("_n")))
        .join(deg.select(F.col("node").alias("_z"), "degree"), "_z")
        # a degree-1 pivot cannot form a wedge, and its log2 is ZERO —
        # filtering it here is semantics-neutral AND keeps the weight
        # division away from the /0 path (ANSI would raise)
        .filter(F.col("degree") >= 2)
    )
    if max_degree is not None:
        piv = piv.filter(F.col("degree") <= int(max_degree))
    w_expr = (
        f"CAST(1000000000000 DIV {log2_interp_micro_sql('degree')}"
        " AS BIGINT)"
    )
    piv = piv.withColumn("_w", F.expr(w_expr))
    p1 = piv.select("_z", F.col("_n").alias("_x"), "_w")
    p2 = piv.select(F.col("_z").alias("_z2"), F.col("_n").alias("_y"))
    wedges = p1.join(
        p2, (F.col("_z") == F.col("_z2")) & (F.col("_x") < F.col("_y"))
    )
    scored = wedges.groupBy(
        F.col("_x").alias("a"), F.col("_y").alias("b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("_w").cast("long").alias("aa_micro"),
    )
    return scored.join(und, ["a", "b"], "left_anti")


def link_oracle_sql(edges_sql: str, max_degree: int | None = None) -> str:
    """DuckDB twin of :func:`link_scores` — identical canonicalization,
    degree cut, integer log weights, and existing-edge exclusion."""
    from ..functions.expressions import log2_interp_micro_sql

    # degree >= 2 mirrors the Spark side: wedge-incapable pivots are
    # dropped before the zero-log division can be evaluated
    cut = "WHERE degree >= 2" + (
        f" AND degree <= {int(max_degree)}" if max_degree is not None else ""
    )
    w = f"(1000000000000 // {log2_interp_micro_sql('degree', 'duckdb')})"
    return f"""
WITH und AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM ({edges_sql})
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
    GROUP BY 1
),
piv AS (
    SELECT _z, _n, CAST({w} AS BIGINT) AS _w
    FROM (SELECT p.node AS _z, p.nbr AS _n, deg.degree
          FROM (SELECT a AS node, b AS nbr FROM und
                UNION ALL SELECT b, a FROM und) p
          JOIN deg ON deg.node = p.node
          {cut})
),
scored AS (
    SELECT p1._n AS a, p2._n AS b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(p1._w) AS BIGINT) AS aa_micro
    FROM piv p1 JOIN piv p2 ON p2._z = p1._z AND p1._n < p2._n
    GROUP BY 1, 2
)
SELECT a, b, n_common, aa_micro FROM scored
WHERE NOT EXISTS (SELECT 1 FROM und
                  WHERE und.a = scored.a AND und.b = scored.b)
"""


def kcore(
    edges: DataFrame,
    k: int,
    n_rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling over the undirected
    simple graph: each round removes every still-active node whose
    ACTIVE degree (neighbors not yet removed) is below ``k`` — the
    SHRINKING-fixpoint sibling of the PageRank/BFS loops. Returns
    (node, removed_round, in_core) where removed_round is the 1-based
    peeling round (−1 for survivors) and in_core ∈ {0, 1}.

    The shared cross-engine semantic is "state after ``n_rounds``
    peeling rounds" (the q81 hop-cap lesson: the cap, not
    convergence, is what both engines replicate —
    :func:`kcore_oracle_sql` unrolls the same rounds as chained CTEs).
    Removal is MONOTONE — peeling only lowers other nodes' active
    degrees — so an empty round is empty forever and the loop may
    exit early with results IDENTICAL to running every round (the
    bounded one-scalar-per-round early-stop proof from
    pagerank_converged). A node whose every neighbor was peeled has no
    surviving adjacency row: its active degree is COALESCE(0), removed
    that round, never silently kept.

    Scale shape: per round one semi-joined adjacency filter + one
    node-keyed count + one anti-join, lineage truncated per round
    (localCheckpoint — the _PRState discipline); state is one
    (node, round) row per REMOVED node, monotone and bounded by n."""
    if int(k) < 1:
        raise ValueError("kcore: k must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(
            F.col("_s").isNotNull()
            & F.col("_d").isNotNull()
            & (F.col("_s") != F.col("_d"))
        )
    )
    und = e.select(
        F.least("_s", "_d").alias("a"), F.greatest("_s", "_d").alias("b")
    ).distinct()
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(
            und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
        .persist()
    )
    nodes = adj.select("node").distinct().persist()
    nodes.count()
    removed = nodes.select(
        "node", F.lit(0).cast("long").alias("removed_round")
    ).limit(0).localCheckpoint(True)
    n_removed = 0
    # r18 (VERDICT r17 #3): peeling rounds run at a width derived from
    # the MEASURED adjacency cardinality (persisted; this count
    # materializes what round 1 would), not the session static width
    # and not a caller-side constant. Restored in finally.
    from .dedup import loop_width

    spark = adj.sparkSession
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_width(adj.count()))
    )
    try:
        for rnd in range(1, int(n_rounds) + 1):
            active = nodes.join(removed.select("node"), "node", "left_anti")
            live = adj.join(removed.select("node"), "node", "left_anti").join(
                removed.select(F.col("node").alias("nbr")), "nbr", "left_anti"
            )
            deg = live.groupBy("node").agg(
                F.count(F.lit(1)).cast("long").alias("_deg")
            )
            newly = (
                active.join(deg, "node", "left")
                .filter(F.coalesce("_deg", F.lit(0)) < int(k))
                .select("node", F.lit(rnd).cast("long").alias("removed_round"))
            )
            removed = removed.unionByName(newly).localCheckpoint(True)
            # monotone: an empty round is empty forever. Count the
            # CHECKPOINTED union (already materialized) rather than the
            # lazy `newly` frame — counting newly would re-evaluate its
            # whole join plan a second time.
            cur = removed.count()
            if cur == n_removed:
                break
            n_removed = cur
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    adj.unpersist()
    out = nodes.join(removed, "node", "left").select(
        "node",
        F.coalesce("removed_round", F.lit(-1).cast("long")).alias(
            "removed_round"
        ),
        F.when(F.col("removed_round").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("in_core"),
    )
    nodes.unpersist()
    return out


def kcore_oracle_sql(edges_sql: str, k: int, n_rounds: int = 8) -> str:
    """DuckDB twin of :func:`kcore` — the peeling rounds unrolled as
    chained CTEs (the pagerank_oracle_sql pattern applied to a
    SHRINKING fixpoint): round i's removed set = round i−1's plus every
    active node whose active degree is below k.

    Every chained CTE is ``AS MATERIALIZED``: round i references round
    i−1 THREE times (the active filter, the live-adjacency filter, and
    the carry-forward union), and DuckDB inlines un-materialized CTEs
    per reference — 3^rounds evaluations, measured EXPONENTIAL (0.6 s
    at 4 rounds, 6.7 s at 5, hung at 6 on a 40-edge graph). The
    pagerank oracle survives un-materialized only because its rounds
    reference the previous mass twice; materialization makes this one
    linear in rounds, matching the Spark loop's checkpoints."""
    parts = [
        f"""WITH und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM ({edges_sql})
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
)""",
        "adj AS MATERIALIZED (SELECT a AS node, b AS nbr FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM adj)",
        "r0 AS MATERIALIZED"
        " (SELECT node, CAST(0 AS BIGINT) AS rnd FROM nodes WHERE 1=0)",
    ]
    for i in range(1, int(n_rounds) + 1):
        p = i - 1
        parts.append(
            f"""r{i} AS MATERIALIZED (
    SELECT node, rnd FROM r{p}
    UNION ALL
    SELECT act.node, CAST({i} AS BIGINT) AS rnd
    FROM (SELECT node FROM nodes
          WHERE node NOT IN (SELECT node FROM r{p})) act
    LEFT JOIN (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
               FROM adj
               WHERE node NOT IN (SELECT node FROM r{p})
                 AND nbr NOT IN (SELECT node FROM r{p})
               GROUP BY 1) d USING (node)
    WHERE COALESCE(d.deg, 0) < {int(k)}
)"""
        )
    last = f"r{int(n_rounds)}"
    return ",\n".join(parts) + f"""
SELECT nodes.node,
       CAST(COALESCE({last}.rnd, -1) AS BIGINT) AS removed_round,
       CAST(CASE WHEN {last}.rnd IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS in_core
FROM nodes LEFT JOIN {last} USING (node)
"""
