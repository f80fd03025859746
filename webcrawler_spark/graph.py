"""Link-graph analytics over the crawl's edge table — PageRank as a
fixed-iteration, FIXED-POINT-INTEGER dataflow.

The reference exports its link graph for exactly this kind of analysis
(vertex/edge CSV at sql_selects.sql:19-21, consumed by a graph tool);
this module runs the canonical crawl-graph metric natively as Spark
DataFrame jobs instead of exporting.

Why integer arithmetic: distributed float summation is order-dependent
(partial aggregates combine in partition order), so a float PageRank is
not value-reproducible across engines or even across runs with
different partitioning — and the driver value-hashes Spark vs DuckDB.
Ranks here are BIGINT mass out of a 10^12 total; every step is integer
multiply / truncating divide / integer sum, all order-independent, so
the result is bit-identical everywhere. The truncation discards at most
outdeg units of mass per node per iteration — at 10^12 scale a relative
error of ~10^-9, far below any ranking-relevant difference.

Update rule (per iteration, damping 0.85 as 85/100):

    contrib(u->v) = rank(u) DIV outdeg(u)          for each edge u->v
    dang          = sum of rank(u) over sink nodes (no out-edges)
    rank'(v)      = (15*BASE) DIV 100
                    + (85 * (inflow(v) + dang DIV N)) DIV 100

with BASE = TOTAL DIV N the uniform start mass. Sinks redistribute
uniformly (the standard dangling-node fix), teleport mass goes to every
node equally.

Scale shape (10^10-edge graph): per iteration one shuffle keyed on src
(edges ⋈ ranks ⋈ outdeg — ranks/outdeg co-partition on the same key) and
one keyed on dst (the inflow aggregate, map-side combined); the dangling
total is an aggregate-sized 1-row cross join, never a collect. A
production run persists/checkpoints each iteration's ranks to cut the
lineage chain; at test scale the lazy chain is fine and keeps the
function pure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOTAL_MASS = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


# ---------------------------------------------------------------------------
# deterministic synthetic link graph (documents carry no link table)
# ---------------------------------------------------------------------------

def synthetic_links(docs: DataFrame, n_nodes: int, id_col: str = "doc_id") -> DataFrame:
    """(src, dst) edges derived from doc ids: two pseudo-random out-links
    per page plus a hub edge (every 3rd page links to node 0 — the
    portal every gov site links back to), self-loops dropped, duplicate
    edges collapsed. Mirrored value-for-value by
    ``synthetic_links_duckdb``.

    PRECONDITION: ``doc_id`` must be dense 0..n_nodes-1 (true of the
    testdata ``documents`` table). The modular dst formulas only land on
    existing nodes under that assumption; with gapped ids some edges
    would reference absent nodes and ``pagerank`` would silently drop
    that inflow each iteration (a rank-mass leak both engines would
    mask identically). Derive a dense index first if ids can gap."""
    u = F.col(id_col)
    n = F.lit(n_nodes)
    e1 = (u * 7 + 1) % n
    e2 = (u * 13 + 5) % n
    hub = F.when(u % 3 == 0, F.lit(0).cast("long"))
    return (
        docs.select(u.alias("src"), F.explode(F.array(e1, e2, hub)).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )


def synthetic_links_duckdb(n_nodes_expr: str, table: str = "documents",
                           id_col: str = "doc_id") -> str:
    """CTE body producing the identical (src, dst) edge rows. The three
    edge families are a UNION ALL rather than an unnest — filtering an
    unnest-produced column trips DuckDB's binder — and the node count is
    hoisted into a 1-row cross join."""
    nn = f"(SELECT ({n_nodes_expr})::BIGINT AS nn) _nn"
    return f"""
        SELECT DISTINCT src, dst FROM (
            SELECT {id_col} AS src, ({id_col} * 7 + 1) % _nn.nn AS dst
            FROM {table}, {nn}
            UNION ALL
            SELECT {id_col}, ({id_col} * 13 + 5) % _nn.nn
            FROM {table}, {nn}
            UNION ALL
            SELECT {id_col}, 0 FROM {table} WHERE {id_col} % 3 = 0
        ) WHERE dst <> src
    """


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def pagerank(nodes: DataFrame, edges: DataFrame, n_nodes: int,
             n_iter: int = 5, total: int = TOTAL_MASS,
             cache_registry: list | None = None) -> DataFrame:
    """(node, rank) after ``n_iter`` integer PageRank iterations.
    ``nodes`` has one `node` column; ``edges`` has (src, dst) with both
    endpoints present in ``nodes``.

    Each iteration's ranks are persisted and EAGERLY materialized, then
    the previous iteration's cache is dropped: every iteration reads its
    predecessor 2-3 times (contribution join, dangling anti-join, next
    update), so a lazy chain recomputes lineage EXPONENTIALLY — the
    un-cached 5-iteration plan holds ~190 exchanges vs ~2 per iteration
    here. This is the standard checkpoint-per-iteration shape of
    distributed PageRank; resident cache is bounded at one rank vector.
    The RETURNED frame stays persisted (dropping it would re-trigger the
    blowup on collection) — pass ``cache_registry`` to unpersist it
    after consuming."""
    base = total // n_nodes
    teleport = (15 * base) // 100
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    prev = None
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr("rank DIV outdeg").alias("c"))
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        dang = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("d"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * (coalesce(s, 0) + d DIV {n_nodes}))"
                        f" DIV {DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        ).persist()
        ranks.count()  # materialize so the predecessor's cache can drop
        if prev is not None:
            prev.unpersist()
        prev = ranks
    if cache_registry is not None and prev is not None:
        cache_registry.append(prev)
    return ranks


def cocitation(edges: DataFrame, min_common: int = 2,
               max_out: int = 64) -> DataFrame:
    """Co-citation counts — (a, b, n_common) for every unordered page
    pair cited together by at least ``min_common`` common sources (the
    classic link-graph similarity signal; with PageRank, the second
    metric the reference's graph export feeds).

    Skew handling is explicit: a source citing d pages contributes
    d·(d-1)/2 pairs, so one 10^5-out-link hub page would alone emit
    5·10^9 rows into the pair shuffle. Each source's contribution is
    capped at its ``max_out`` smallest-dst edges FIRST (deterministic,
    so the oracle mirrors it) — the standard hub-cap: beyond ~64
    co-citations the pair signal is boilerplate navigation, not
    similarity. The cap window partitions by src, whose cardinality is
    bounded by a page's link count, never by corpus size.

    Scale shape: one shuffle on src (the cap window and the self-join
    co-partition), one map-side-combined aggregate on the (a, b) pair.
    """
    w = Window.partitionBy("src").orderBy("dst")
    capped = (
        edges.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_out)
        .drop("_r")
    )
    left = capped.select("src", F.col("dst").alias("a"))
    right = capped.select("src", F.col("dst").alias("b"))
    return (
        left.join(right, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .orderBy("a", "b")
    )


def cocitation_duckdb(edges_cte: str, min_common: int = 2,
                      max_out: int = 64) -> str:
    """Full SELECT mirroring ``cocitation``."""
    return f"""
        WITH cc_edges AS ({edges_cte}),
        cc_capped AS (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (PARTITION BY src ORDER BY dst) AS _r
                FROM cc_edges
            ) WHERE _r <= {max_out}
        )
        SELECT l.a, r.b, count(*)::BIGINT AS n_common
        FROM (SELECT src, dst AS a FROM cc_capped) l
        JOIN (SELECT src, dst AS b FROM cc_capped) r USING (src)
        WHERE l.a < r.b
        GROUP BY 1, 2
        HAVING count(*) >= {min_common}
        ORDER BY 1, 2
    """


def pagerank_duckdb(nodes_cte: str, edges_cte: str, n_nodes_expr: str,
                    n_iter: int = 5, total: int = TOTAL_MASS) -> str:
    """Full SELECT mirroring ``pagerank`` via chained per-iteration CTEs
    (it0..itK). `n_nodes_expr` may be a scalar subquery."""
    n = f"({n_nodes_expr})"
    base = f"({total} // {n})"
    teleport = f"((15 * {base}) // 100)"
    ctes = [
        f"pr_nodes AS ({nodes_cte})",
        f"pr_edges AS ({edges_cte})",
        "pr_outdeg AS (SELECT src, count(*)::BIGINT AS outdeg "
        "FROM pr_edges GROUP BY 1)",
        f"it0 AS (SELECT node, {base}::BIGINT AS rank FROM pr_nodes)",
    ]
    for i in range(1, n_iter + 1):
        prev = f"it{i - 1}"
        ctes.append(f"""it{i} AS (
            SELECT nd.node,
                   ({teleport} + ({DAMP_NUM} * (coalesce(inf.s, 0)
                        + dang.d // {n})) // {DAMP_DEN})::BIGINT AS rank
            FROM pr_nodes nd
            LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank // o.outdeg)::BIGINT AS s
                FROM pr_edges e
                JOIN {prev} r ON r.node = e.src
                JOIN pr_outdeg o ON o.src = e.src
                GROUP BY 1
            ) inf ON inf.node = nd.node
            CROSS JOIN (
                SELECT coalesce(sum(r.rank), 0)::BIGINT AS d
                FROM {prev} r LEFT JOIN pr_outdeg o ON o.src = r.node
                WHERE o.src IS NULL
            ) dang
        )""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank FROM it{n_iter} ORDER BY node")
