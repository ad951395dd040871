"""Connected-components / dedup-clustering operator
(pegasus_spark.functions.graphops): fixpoint correctness on hand graphs,
determinism, loud non-convergence, and the full dedup_clusters
composition against a DuckDB recursive-CTE twin on the same edges."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pegasus_spark.functions import graphops


def _cc(spark, edge_rows, vert_rows=None, **kw):
    edges = spark.createDataFrame(edge_rows, "a long, b long")
    verts = (
        spark.createDataFrame([(v,) for v in vert_rows], "node long")
        if vert_rows is not None else None
    )
    out = graphops.connected_components(edges, "a", "b", vertices=verts, **kw)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_cc_chain_triangle_isolated(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated 99
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    got = _cc(spark, edges, vert_rows=[1, 2, 3, 4, 10, 11, 12, 99])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_cc_vertex_set_from_edges(spark):
    got = _cc(spark, [(5, 6), (8, 7)])
    assert got == {5: 5, 6: 5, 7: 7, 8: 7}


def test_cc_long_chain_converges(spark):
    # a 12-vertex path needs ~11 propagation hops: exercises the
    # iteration loop well past typical dedup depth, under the default cap
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(n)}


def test_cc_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(9)], max_iter=2)


def _cc_star(spark, edge_rows, vert_rows=None, **kw):
    edges = spark.createDataFrame(edge_rows, "a long, b long")
    verts = (
        spark.createDataFrame([(v,) for v in vert_rows], "node long")
        if vert_rows is not None else None
    )
    out = graphops.connected_components_star(edges, "a", "b",
                                             vertices=verts, **kw)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_adversarial_chain_within_log_budget(spark):
    """A 64-vertex path (diameter 63): pre-r6, plain min-propagation
    needed 63 rounds and raised under its default 16-round budget. With
    pointer jumping (L(v) ← min(L(v), L(L(v)), neighbor labels)) the
    distance-to-root halves per round, so BOTH methods now contract the
    chain within their default O(log)-sized budgets — and a deliberately
    tiny budget still fails loudly instead of returning under-merged
    clusters."""
    edges = [(i, i + 1) for i in range(63)]
    assert _cc(spark, edges) == {i: 0 for i in range(64)}
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, edges, max_iter=3)  # log2(63) ≈ 6 > 3
    got = _cc_star(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_star_matches_propagation_on_mixed_graph(spark):
    # chain + triangle + isolated + reversed/duplicate/self-loop edges:
    # both methods must produce the identical min-label fixpoint
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
             (4, 3), (7, 7), (20, 25), (25, 20)]
    verts = [1, 2, 3, 4, 7, 10, 11, 12, 20, 25, 99]
    assert _cc_star(spark, edges, vert_rows=verts) == \
        _cc(spark, edges, vert_rows=verts) == \
        {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 10: 10, 11: 10, 12: 10,
         20: 20, 25: 20, 99: 99}


def test_star_empty_and_singleton_edges(spark):
    assert _cc_star(spark, [], vert_rows=[3, 5]) == {3: 3, 5: 5}
    assert _cc_star(spark, [(8, 2)]) == {2: 2, 8: 2}


def test_dedup_clusters_matches_recursive_cte(spark):
    """Same fixpoint as a DuckDB recursive CTE over the identical edge
    list — the in-repo twin of the driver's dedup_clusters oracle
    (which recomputes the pairs from simhash; here the edges are pinned
    so the graph semantics are isolated from the signature machinery)."""
    docs = [(i,) for i in range(10)]
    pairs = [(0, 3), (3, 7), (1, 2), (8, 9)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ddf = spark.createDataFrame(docs, "doc_id long")
    got = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in graphops.dedup_clusters(ddf, pdf).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?)", docs)
    con.execute("CREATE TABLE pairs(doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", pairs)
    want = set(map(tuple, con.execute("""
        WITH RECURSIVE edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, root) AS (
          SELECT src, src FROM edges
          UNION SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id),
               d.doc_id = COALESCE(c.cluster_id, d.doc_id)
        FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
    """).fetchall()))
    assert got == want
    # the dedup decision: exactly one canonical row per cluster
    kept = [r for r in got if r[2]]
    assert len(kept) == len({r[1] for r in got})
