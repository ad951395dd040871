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
- For adversarial graphs with long chains, ``connected_components_star``
  implements the literature's large-star/small-star alternation
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): O(log n)-ish rounds vs O(diameter) for plain propagation,
  built from the same join+min blocks. Plain min-propagation stays the
  default because dedup components are shallow (2-4 hops) and it costs
  one shuffle-join per round vs the star rounds' two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _free_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint(eager=True)``'s cached
    blocks (ADVICE r5: iterative loops otherwise hold every round's
    checkpointed labels in executor storage simultaneously). The
    checkpointed Dataset's analyzed plan is a LogicalRDD whose ``rdd``
    field is exactly the persisted RDD; unpersist it non-blocking.
    Failure is harmless — Spark's ContextCleaner unpersists the RDD
    anyway once the driver-side reference is garbage-collected."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


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

    # FUSED first propagation step: with L0(v)=v, the first iteration's
    # fixpoint state is L1(v) = min(v, min neighbor) — computable straight
    # from the (checkpointed) edge set with ONE groupBy + left join, so
    # the loop starts one step ahead and every call saves one full
    # join+union+aggregate+checkpoint pass. F.least skips the null a
    # neighborless vertex gets from the left join, yielding L1(v)=v.
    obs0 = Observation()
    nbr0 = bidir.groupBy(F.col("dst").alias("node")).agg(
        F.min("src").alias("_nm"))
    labels = (
        verts.join(nbr0, "node", "left")
        .select("node", F.least(F.col("node"), F.col("_nm")).alias("label"))
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
        # POINTER JUMPING (path doubling): also adopt the current label
        # OF your label — L(L(v)). Labels are always vertex ids inside
        # the same component, so the self-join resolves every row and
        # every candidate stays ≥ the component minimum; min(L, L∘L,
        # neighbor L) turns a diameter-D chain from D propagation rounds
        # into O(log D) (a 63-diameter path: 63 → 4 rounds measured).
        # Deeper squaring (adding L⁴ per round) was A/B-tested and did
        # NOT reduce rounds on the sf0.1 near-dup graph (hash-to-min
        # information flow, not pointer depth, gates dense components:
        # its 3030-vertex/diameter-14 giant component converges in ~8
        # rounds with either form) while tripling per-round join work —
        # single jump kept. Still monotone decreasing, so the fixpoint —
        # and the sum-based convergence test — are unchanged.
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.node"))
            .select(F.col("x.node").alias("node"),
                    F.col("y.label").alias("label"))
        )
        obs = Observation()
        prev_labels = labels
        labels = (
            labels.unionByName(nbr).unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .observe(obs, _label_sum)
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        _free_checkpoint(prev_labels)
        if cur_sum == prev_sum:
            _free_checkpoint(bidir)
            return labels.select("node", F.col("label").alias("cluster_id")) \
                         .withColumnRenamed("node", id_col)
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"— raise max_iter (component diameter exceeds the budget)"
    )


def connected_components_star(edges: DataFrame, src: str, dst: str,
                              vertices: DataFrame | None = None,
                              id_col: str = "node",
                              max_rounds: int = 24) -> DataFrame:
    """Connected components via large-star/small-star alternation
    (Kiveris et al., SoCC'14) — the scale path for ADVERSARIAL graphs:
    a diameter-D component costs plain min-propagation D rounds, but
    the star alternation contracts it in O(log D)-ish rounds, each
    round two groupBy-min shuffles + two joins, all JVM built-ins.

    large-star: every node strictly larger than a center u is re-wired
    to m(u) = min(u ∪ neighbors(u)). small-star: every node ≤ the
    center (plus the center itself) is re-wired to the center's min
    neighbor. The joint fixpoint is a forest of depth-1 stars rooted at
    each component's minimum vertex id — the same labels the plain
    fixpoint produces, so the two methods are interchangeable and share
    the recursive-CTE oracle.

    Convergence is detected EXACTLY: edges are kept in canonical
    (child > parent) orientation, the round's edge count rides the
    materialization via ``observe``, and only when counts match is a
    left-anti set-equality probe run — no hash-sum approximation.
    Raises if ``max_rounds`` is hit (silent truncation would return
    under-merged clusters).
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("child"),
            F.least(F.col(src), F.col(dst)).alias("parent"),
        )
        .where(F.col("child") != F.col("parent"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("node")).distinct()
    else:
        verts = (
            e.select(F.col("child").alias("node"))
            .unionByName(e.select(F.col("parent").alias("node")))
            .distinct()
        )

    from pyspark.sql import Observation

    # verts (above) lazily derives from THIS checkpoint and is consumed
    # only after the loop — it must never be freed inside it
    e_input = e
    prev_count = e.count()
    for _ in range(max_rounds):
        # large-star over the bidirected view: center = src, emit
        # (v, m(center)) for every strictly-larger neighbor v. Output is
        # canonical by construction: v > center >= m.
        bidir = e.select(F.col("child").alias("u"), F.col("parent").alias("v")) \
                 .unionByName(e.select(F.col("parent").alias("u"),
                                       F.col("child").alias("v")))
        lmin = bidir.groupBy("u").agg(F.min("v").alias("nbr_min"))
        large = (
            bidir.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("child"),
                    F.least("nbr_min", F.col("u")).alias("parent"))
        )
        # small-star over canonical (child > parent) edges: center =
        # child, m = its min parent; re-wire every parent (and the
        # center) to m.
        smin = large.groupBy("child").agg(F.min("parent").alias("mn"))
        new_e = (
            large.join(smin, "child")
            .where(F.col("parent") != F.col("mn"))
            .select(F.col("parent").alias("child"), F.col("mn").alias("parent"))
            .unionByName(smin.select(F.col("child"), F.col("mn").alias("parent")))
            .distinct()
        )
        obs = Observation()
        new_e = new_e.observe(obs, F.count(F.lit(1)).alias("n")) \
                     .localCheckpoint(eager=True)
        cur_count = obs.get["n"]
        converged = cur_count == prev_count and \
            new_e.join(e, ["child", "parent"], "left_anti").isEmpty()
        # previous round's checkpointed edges are dead either way (the
        # equality probe above was their last consumer): release the
        # blocks instead of accumulating every round's edge set (ADVICE)
        if e is not e_input:
            _free_checkpoint(e)
        e, prev_count = new_e, cur_count
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            f"rounds — raise max_rounds")

    members = e.select(F.col("child").alias("node"),
                       F.col("parent").alias("label"))
    roots = e.select(F.col("parent").alias("node"),
                     F.col("parent").alias("label")).distinct()
    labels = members.unionByName(roots)
    return (
        verts.join(labels, "node", "left")
        .select(F.col("node").alias(id_col),
                F.coalesce("label", F.col("node")).alias("cluster_id"))
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "doc_a", pair_b: str = "doc_b",
                   method: str = "propagate") -> DataFrame:
    """Cluster assignment for EVERY document: near-dup pair members get
    their component's min doc id, everything else is a singleton cluster
    of itself. Output (``id_col``, cluster_id, is_canonical) — the
    pipeline keeps ``is_canonical`` rows and drops the rest, turning the
    pair generators into an actual dedup decision. ``method`` picks the
    component algorithm: ``propagate`` (min-label, O(diameter) rounds —
    right for shallow dedup graphs) or ``star`` (large/small-star
    alternation, O(log)-round scale path for adversarial chains); both
    converge to identical labels."""
    if method not in ("propagate", "star"):
        # a typo'd method silently falling back to the O(diameter) path
        # (and its RuntimeError on deep chains) is a footgun (ADVICE r5)
        raise ValueError(f"method must be 'propagate' or 'star', got {method!r}")
    if method == "star":
        comp = connected_components_star(pairs, pair_a, pair_b, id_col=id_col)
    else:
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
