"""Graph operators for the dedup pipeline: connected components over a
near-dup pair graph, and canonical-representative selection.

Pair generators (minhash/simhash/phash/embedding banding in simops,
textops, multimodal) emit EDGES; a training-data dedup pipeline needs
the CLUSTERS those edges imply and one kept representative per cluster
(the rest are dropped as duplicates). This module closes that gap.

Algorithm: iterative min-label propagation — each vertex repeatedly
adopts the smallest label reachable over one hop until fixpoint, which
yields label(v) = min(vertex id in v's component), a deterministic,
engine-independent cluster id (the DuckDB oracle computes the same
fixpoint with a recursive CTE). Each iteration is one shuffle-join
(edges ⋈ labels) + one min-aggregation — all JVM built-ins, no Python.

Scale notes (the 100 TB shape):
- Near-dup graphs are overwhelmingly tiny components (pairs/triangles
  of true duplicates), so the fixpoint arrives in O(component diameter)
  iterations — typically 2-4, never more than ``max_iter``.
- Lineage is truncated per iteration (``localCheckpoint``): iterative
  plans otherwise grow exponentially and OOM the driver — same fix as
  the crawl's round lineage (see round.py).
- The per-iteration convergence check RIDES the label-materialization
  job via ``observe()`` — one Spark action per iteration total, no
  separate comparison job and no driver collect of data rows. The
  observed metric is ``sum(label)`` (as decimal(38,0), overflow-proof):
  min-propagation only ever DECREASES a vertex's label, so the sum is
  strictly monotone while any label moves and the fixpoint is exactly
  "sum unchanged" — no join back against the previous labels needed
  (the earlier fused check still paid one extra shuffle join per
  iteration to line up old vs new labels).
- For adversarial graphs with long chains, the literature's
  large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) converges in
  O(log n) rounds with the same join+min building blocks; plain
  min-propagation is used here because dedup components are shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         vertices: DataFrame | None = None,
                         id_col: str = "node",
                         max_iter: int = 16) -> DataFrame:
    """Label every vertex with the minimum vertex id in its connected
    component. ``edges`` is undirected input (each pair listed once in
    either orientation). ``vertices`` optionally supplies the full
    vertex set (isolated vertices become singleton clusters labelled by
    themselves); when omitted the vertex set is taken from the edges.

    Returns (``id_col``, cluster_id). Deterministic: the fixpoint is a
    pure function of the graph, independent of partitioning or
    iteration order. Raises if ``max_iter`` is hit before convergence
    (silent truncation would return WRONG clusters — a too-small budget
    must fail loudly, not quietly under-merge).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # undirected: propagate both ways; distinct keeps the join slim
    bidir = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("node")).distinct()
    else:
        verts = bidir.select(F.col("src").alias("node")).distinct()

    from pyspark.sql import Observation

    # Convergence metric: sum(label) over all vertices, decimal(38,0) so
    # it cannot overflow (≤1e13 rows × |id|≤9.3e18 < 1e32). Labels only
    # DECREASE under min-propagation, so "sum unchanged" ⇔ "no label
    # changed" ⇔ fixpoint — checked without joining old labels back in.
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")

    obs0 = Observation()
    labels = (
        verts.select("node", F.col("node").alias("label"))
        .observe(obs0, _label_sum)
        .localCheckpoint(eager=True)
    )
    prev_sum = obs0.get["s"]  # None for an empty vertex set

    for _ in range(max_iter):
        # candidate labels one hop away: neighbor's current label
        nbr = (
            bidir.join(labels, bidir["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
        )
        obs = Observation()
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .observe(obs, _label_sum)
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id")) \
                         .withColumnRenamed("node", id_col)
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"— raise max_iter (component diameter exceeds the budget)"
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "doc_a", pair_b: str = "doc_b") -> DataFrame:
    """Cluster assignment for EVERY document: near-dup pair members get
    their component's min doc id, everything else is a singleton cluster
    of itself. Output (``id_col``, cluster_id, is_canonical) — the
    pipeline keeps ``is_canonical`` rows and drops the rest, turning the
    pair generators into an actual dedup decision."""
    comp = connected_components(pairs, pair_a, pair_b, id_col=id_col)
    out = (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.select(
        id_col, "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )
