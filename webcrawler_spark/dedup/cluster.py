"""Near-duplicate CLUSTER assembly: connected components over verified
near-dup pair edges, then canonical-survivor election per cluster.

Pair generation (``dedup.minhash.near_duplicates``,
``dedup.embedding.lsh_near_duplicate_pairs``) answers "which documents
are near-duplicates of each other"; a production dedup pipeline needs the
next step — transitive grouping (A~B, B~C ⇒ {A,B,C} is ONE group even if
A and C never shared a band) and one kept representative per group. The
reference's own dedup is exact-match first-writer-wins
(DatabaseHandler.java's content lookup); this module is the near-dup
generalization of the same keep-one rule.

Algorithm: partition-local union-find PRE-CONTRACTION (one Arrow pass
that replaces each task's subgraph with its exact local star forest —
component-preserving, see ``_local_contract``), then alternating
large-star / small-star (Kiveris, Lattanzi, Mirrokni, Rastogi,
Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC'14; public technique). Each round is two groupBy+join passes over
the edge set; the edge set contracts toward a star forest (every node →
its component's minimum id) in O(log n) rounds with high probability —
no vertex-program framework, no driver-side graph, just DataFrame
shuffles on node ids. When the whole edge set fits one contraction task
(any fixture-scale graph), the union-find already IS the answer and the
star loop is skipped outright:

  large-star(u): m = min(N(u) ∪ {u}); re-point every STRICTLY LARGER
                 neighbor v > u at m
  small-star(u): orient edges large→small; m = min(smaller nbrs);
                 re-point every smaller neighbor AND u itself at m

Convergence is detected by an order-insensitive (count, xor xxhash64)
signature of the canonicalized edge set — two aggregate-sized actions per
round, the same budget class as the engine's documented collects.

Scale: each round shuffles only the current edge set hashed by node id
(near-dup edges are a thin subset of the corpus — |E| ≪ |docs|), and the
star contraction strictly reduces long chains, so the 100-TB cost is
O(log n) edge-sized shuffles, never an all-pairs or whole-corpus join.
A per-round checkpoint materializes the contracted set and severs the
plan (an iterative plan otherwise grows ~16× per round — each star pass
references the edge frame four times — and the job dies assembling a
GB-sized plan string long before any data-size limit).

DuckDB oracle: min-label propagation as a recursive CTE over the SAME
deterministic pair set (``clusters_oracle_sql`` embeds
``near_duplicates_oracle_sql``), so the driver verifies cluster ids,
sizes, and canonical flags value-for-value.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.dedup.minhash import near_duplicates_oracle_sql

# Partition-local contraction sizing: one union-find task handles up to
# this many edges (a dict of ≤2x that many entries — comfortably inside
# one executor task's memory). The task count is ceil(|E| / this), so a
# fixture-sized pair set contracts in ONE task (solving the whole graph
# before any star round), while a 100-TB edge set fans out wide.
EDGES_PER_CONTRACTION_TASK = 2_000_000


def _local_contract(e: DataFrame) -> DataFrame:
    """Partition-local union-find contraction (one Arrow pass): replace
    each partition's edge set with the star forest of its LOCAL
    components — every member points at its component's MIN id.

    Component-preserving by construction: within a partition, a
    connected subgraph's edges are replaced by a star over the SAME
    nodes (connectivity unchanged), and node identity is global, so the
    union over partitions has exactly the original graph's components.
    Output is ≤ nodes-per-partition rows; dense subgraphs (the
    adversarial clique fixtures) collapse |E| → |V| before any star
    round shuffles."""
    schema = e.schema
    u_name, v_name = schema[0].name, schema[1].name

    def uf(batches: Iterator) -> Iterator:
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        nodes: set = set()
        for pdf in batches:
            for a, b in zip(pdf[u_name], pdf[v_name]):
                nodes.add(a)
                nodes.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min: the smaller id is always the root,
                    # so every component's root is its minimum
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        out_u, out_v = [], []
        for x in nodes:
            r = find(x)
            if x != r:
                out_u.append(x)
                out_v.append(r)
        yield pd.DataFrame({u_name: out_u, v_name: out_v})

    return e.mapInPandas(uf, schema)


def _large_star(e: DataFrame) -> DataFrame:
    """Re-point every neighbor v > u at min(N(u) ∪ {u})."""
    nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient large→small; re-point smaller neighbors and u at the min."""
    ee = (
        e.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    )
    mins = ee.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        ee.join(mins, "u")
        .select(F.col("v").alias("n"), F.col("m"))
        .union(mins.select(F.col("u").alias("n"), F.col("m")))
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame, u_col: str = "a", v_col: str = "b", max_rounds: int = 50
) -> DataFrame:
    """(node, component) for every node that appears in ``edges``;
    ``component`` is the minimum node id of the component in the id
    column's NATIVE ordering (deterministic, engine-portable — Spark and
    DuckDB order ints numerically and ASCII strings bytewise alike; the
    id dtype is preserved, never coerced, so both engines elect the same
    canonical).

    ``max_rounds`` is a runaway backstop, not a tuning knob: large/small
    star converges in O(log n) rounds w.h.p. (SoCC'14 Thm 1-2); real
    near-dup graphs finish in a handful.
    """
    sc = edges.sparkSession.sparkContext

    def _pin(df: DataFrame) -> DataFrame:
        # materialize + sever lineage: reliable checkpoint when the
        # context has a checkpoint dir (production), localCheckpoint
        # otherwise — executor-resident, so block loss fails the job,
        # never corrupts
        return (
            df.checkpoint(eager=True)
            if sc.getCheckpointDir()
            else df.localCheckpoint(eager=True)
        )

    # materialize the (thin) canonical edge set once — its upstream is
    # typically a full LSH pipeline that must not recompute per pass —
    # then PRE-CONTRACT with partition-local union-find before any star
    # round: coalesce (no shuffle) to tasks of ≤ EDGES_PER_CONTRACTION_
    # TASK edges each and solve each task's subgraph exactly. A fixture-
    # sized graph fits ONE task, so the stars below only confirm; at
    # scale the pass shortens chains into local stars, cutting the
    # O(log n) round count the driver loop pays for.
    orig = _pin(
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    n_edges = orig.count()  # answered from the pinned blocks, not lineage
    n_tasks = max(1, math.ceil(n_edges / EDGES_PER_CONTRACTION_TASK))
    contracted = _local_contract(orig.coalesce(n_tasks))
    if n_tasks > 1:
        # a node whose edges straddle tasks can emit the same (or two
        # different) star edges from each — dedup so the seed signature
        # below keeps the loop's distinct-set xor invariant
        contracted = contracted.distinct()
    e = _pin(contracted)

    # one contraction task saw the WHOLE edge set → its union-find output
    # is already the exact global min-star forest; star rounds would only
    # re-confirm it (a large+small star pass is the identity on a
    # min-rooted star forest). Skip straight to the read-off. At scale
    # n_tasks > 1 and the star loop runs as usual.
    if n_tasks > 1:
        # seed the convergence signature from the CONTRACTED set: if the
        # first star round leaves it unchanged, the loop exits after ONE
        # confirmation round instead of two
        prev_cnt, prev_hsh = e.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
        ).first()
        prev_sig: tuple | None = (prev_cnt, prev_hsh)
        for _ in range(max_rounds):
            e = _small_star(_large_star(e))
            # sever lineage every round: each star pass references the
            # edge frame ~4×, so the logical plan grows ~16× per round
            # and is GB-sized in plan-string form by round 5 — persist()
            # caches blocks but not the plan. Checkpointing materializes
            # the thin edge set AND resets the plan (the standard move
            # for iterative graph jobs).
            e = _pin(e)
            # bit_xor: order-insensitive and overflow-free under ANSI
            # mode (a SUM of xxhash64 values overflows int64); the edge
            # set is distinct so XOR cancellation cannot alias two
            # different sets except by 64-bit hash collision
            cnt, hsh = e.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
            ).first()
            sig = (cnt, hsh)
            if sig == prev_sig:
                break
            prev_sig = sig

    # converged star forest: e = (child, root) is a FUNCTION of child
    # (each child points at exactly one root — when n_tasks == 1 the
    # single union-find solved the graph exactly; otherwise the
    # convergence signature held across two consecutive states, so the
    # set is star-stable) and every node of
    # the input graph appears as a child or a root. Read the mapping
    # straight off the forest — children map to their root, roots to
    # themselves — instead of rebuilding the node set from ``orig`` and
    # joining (that was a union+distinct+join: two extra exchanges per
    # call on the hot iterative path's result).
    comp = (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
    )
    return comp


def clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment for every doc that appears in a near-dup pair:
    (doc_id, cluster_id, cluster_size, is_canonical). Canonical = the
    cluster's min doc_id — the deterministic first-writer analog (the
    reference keeps the FIRST stored copy of duplicate content;
    crawler DatabaseHandler content-match path)."""
    cc = connected_components(pairs)
    sz = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sz, "component")
        .select(
            F.col("node").alias(id_col),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("cluster_id", id_col)
    )


def drop_near_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The deduplicated corpus: ``docs`` minus non-canonical cluster
    members. Left-anti on the thin victim set — the corpus-sized side is
    never shuffled wide (victims ≪ docs; broadcast-eligible under AQE)."""
    victims = (
        connected_components(pairs)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(victims, id_col, "left_anti")


# ---------------------------------------------------------------------------
# DuckDB oracle — min-label propagation as a recursive CTE over the same
# deterministic LSH+verify pair set
# ---------------------------------------------------------------------------

def _cc_ctes(
    threshold: float,
    table: str,
    id_col: str,
    text_col: str,
    bands: int,
    rows_per_band: int,
) -> str:
    """Shared recursive-CTE prefix: LSH+verify pairs → bidirected edges →
    min-label propagation (``lab``: node → cluster_id)."""
    pairs_sql = near_duplicates_oracle_sql(
        threshold, table, id_col, text_col, bands, rows_per_band
    )
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
        edges AS (
            SELECT a AS u, b AS v FROM pairs
            UNION SELECT b AS u, a AS v FROM pairs
        ),
        reach(node, label) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
        ),
        lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
    """


def clusters_oracle_sql(
    threshold: float,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    rows_per_band: int = 2,
) -> str:
    ctes = _cc_ctes(threshold, table, id_col, text_col, bands, rows_per_band)
    return f"""
        {ctes},
        sz AS (
            SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
        )
        SELECT l.node AS {id_col}, l.cluster_id, s.cluster_size,
               l.node = l.cluster_id AS is_canonical
        FROM lab l JOIN sz s ON s.cluster_id = l.cluster_id
        ORDER BY l.cluster_id, {id_col}
    """


def survivors_oracle_sql(
    threshold: float,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    rows_per_band: int = 2,
) -> str:
    """Oracle for ``drop_near_duplicates``: every doc except non-canonical
    cluster members."""
    ctes = _cc_ctes(threshold, table, id_col, text_col, bands, rows_per_band)
    return f"""
        {ctes},
        victims AS (SELECT node FROM lab WHERE node <> cluster_id)
        SELECT d.{id_col}
        FROM {table} d
        WHERE d.{id_col} NOT IN (SELECT node FROM victims)
        ORDER BY d.{id_col}
    """
