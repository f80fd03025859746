"""Integer PageRank (graph.py): closed-form checks on tiny graphs plus
structural invariants on the synthetic webgraph."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.graph import TOTAL_MASS, pagerank, synthetic_links


def _run(spark, edges, n, n_iter=5):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"]
            for r in pagerank(nodes, e, n, n_iter=n_iter).collect()}


def test_two_node_cycle_is_symmetric_fixed_point(spark):
    # A<->B: the uniform distribution is exact; integer updates must
    # reproduce base each iteration bar the DIV-100 truncation
    r = _run(spark, [(0, 1), (1, 0)], 2)
    base = TOTAL_MASS // 2
    assert r[0] == r[1]
    assert abs(r[0] - base) <= 5  # truncation loses <1 unit per DIV


def test_star_graph_hub_dominates(spark):
    # nodes 1..4 all link to 0; 0 links to 1 (so no sink)
    edges = [(i, 0) for i in range(1, 5)] + [(0, 1)]
    r = _run(spark, edges, 5)
    assert r[0] > r[1] > r[2] == r[3] == r[4]


def test_sink_mass_redistributes(spark):
    # 0 -> 1, 1 is a sink: without the dangling fix node 1's mass
    # vanishes; with it, total mass is conserved (bar truncation)
    r = _run(spark, [(0, 1)], 2)
    total = sum(r.values())
    assert abs(total - TOTAL_MASS) < TOTAL_MASS * 1e-6
    assert r[1] > r[0]  # 1 receives 0's full contribution


def test_mass_conserved_and_hub_ranked_on_synthetic_graph(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("node"))
    ranks = pagerank(nodes, synthetic_links(docs, n), n)
    rows = ranks.collect()
    total = sum(r["rank"] for r in rows)
    # truncating DIVs lose at most ~1 unit per node per stage
    assert abs(total - TOTAL_MASS) < 20 * n
    top = max(rows, key=lambda r: (r["rank"], -r["node"]))
    assert top["node"] == 0  # the hub every 3rd page links to
    assert all(r["rank"] > 0 for r in rows)


def test_deterministic_across_partitioning(spark):
    # same graph, different parallelism -> identical integer ranks
    edges = [(i, (i * 3 + 1) % 20) for i in range(20) if (i * 3 + 1) % 20 != i]
    r1 = _run(spark, edges, 20)
    nodes = spark.range(20).select(F.col("id").alias("node")).repartition(7)
    e = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    r2 = {r["node"]: r["rank"] for r in pagerank(nodes, e, 20).collect()}
    assert r1 == r2


def test_cocitation_counts_and_hub_cap(spark):
    from webcrawler_spark.graph import cocitation

    # sources 0,1 both cite (10, 11); source 2 cites (10, 11, 12)
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11), (2, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"]): r["n_common"] for r in cocitation(e).collect()}
    assert got == {(10, 11): 3}  # (10,12),(11,12) have only 1 common src
    # hub cap: with max_out=2 source 2 keeps only dsts (10, 11), so the
    # result is unchanged; with max_out=1 every source keeps one edge and
    # no pairs remain
    got2 = {(r["a"], r["b"]): r["n_common"]
            for r in cocitation(e, max_out=2).collect()}
    assert got2 == {(10, 11): 3}
    assert cocitation(e, max_out=1).count() == 0
