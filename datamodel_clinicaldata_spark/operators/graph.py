"""Distributed connected components — the canonicalization step a dedup
pipeline needs after candidate-pair generation (MinHash-LSH / SimHash /
cosine near-dup all emit PAIRS; collapsing "A~B, B~C" into one keep-group
requires the transitive closure).

The reference has no graph operator (its dedup is full-row ``distinct``,
``pandas_DataModel.py:161``); this is part of the training-data extension
surface. Spark has no built-in connected components on DataFrames, so this
is an iterative min-label-propagation implemented with joins + aggregations
(idiomatic Catalyst ops, whole-stage codegen per iteration):

    label(v) ← min(label(v), min_{(v,u)∈E} label(u))    until fixpoint

Scale design (100 TB corpus, ~10⁹ nodes):
- Near-duplicate graphs are overwhelmingly small, dense clusters (dup
  families), so the iteration count is bounded by the cluster DIAMETER —
  single digits in practice — not by graph size. For adversarially long
  path graphs, ``connected_components_star`` implements alternating
  large-star / small-star contraction (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), which converges in
  O(log² d) rounds regardless of shape; ``connected_components`` falls
  back to it automatically when min-label propagation exhausts its
  round budget, so a chain-shaped component can no longer fail a run.
- Each round is one shuffle join (edges ⋈ labels on dst) + one partial-agg
  shuffle (min per src). Edges are re-used every round → cache them once.
- ``localCheckpoint`` after every round truncates the lineage: without it
  the plan doubles per iteration and the driver OOMs on plan size long
  before the executors sweat. Blocks live ON executors with NO lineage
  left — right for local mode, but on a real cluster an executor loss
  mid-fixpoint kills the run; past the threshold where that matters,
  swap for reliable ``checkpoint()`` / a persisted-table round-trip
  (see SCALING.md "Reliable-checkpoint doctrine" — the swap is
  mechanical, partitioning survives either way).
- Convergence is detected with a count of changed labels — one action per
  round, the standard cost of any fixpoint algorithm on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: (a,b) ∪ (b,a), self-loops dropped."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _local_union_find(sym: DataFrame) -> DataFrame:
    """Single-task union-find over a small symmetric edge set: all edges
    flow into ONE ``applyInPandas`` group (Arrow-batched, runs on an
    executor — no driver collect) and a path-compressed union-find labels
    each node with its component minimum in O(E·α). The right plan when
    the graph fits one task: the iterative fixpoints pay ~4 actions +
    2 shuffles PER ROUND in fixed overhead, which dwarfs the actual work
    below a few million edges (measured on the sf0.1 dedup query: 2.26 s
    → 1.94 s end-to-end; the CC stage itself collapses from ~5 shuffle
    rounds to one Arrow task)."""
    import pandas as pd

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["src"], pdf["dst"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by label order keeps the root the minimum
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        nodes = sorted(parent)
        return pd.DataFrame(
            {"node": nodes, "component_id": [find(n) for n in nodes]}
        )

    t = sym.schema["src"].dataType.simpleString()
    out_schema = f"node {t}, component_id {t}"
    return (
        sym.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda pdf: uf(pdf), out_schema)
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns ``(node, component_id)`` for every node incident to an edge,
    where ``component_id`` is the minimum node id in the component (the
    conventional "keep the smallest doc_id" dedup survivor rule).

    Adaptive execution, smallest-plan-first:

    1. **Small graph** (≤ ``local_threshold`` symmetric edges, ~32 MB of
       id pairs): single-task union-find via ``applyInPandas`` — the
       per-round shuffle+action overhead of any distributed fixpoint
       exceeds the entire O(E·α) local cost. Near-dup edge sets are
       usually SMALL even when the corpus is 100 TB (edges exist only
       among candidate duplicates); pass ``local_threshold=0`` to force
       the distributed path.
    2. **Large graph**: min-label propagation, rounds bounded by
       component diameter — single digits for dup families.
    3. If the fixpoint is not reached within ``max_iter`` rounds (a
       chain-shaped component), falls back to
       ``connected_components_star``, whose round count is O(log²
       diameter) on any shape — silent truncation would mislabel
       components, and an unconditional error would strand adversarial
       graphs.
    """
    # Eager materialization, not lazy persist: the size probe below would
    # otherwise trigger the (expensive) upstream pair-generation with a
    # LIMIT short-circuit that caches only part of the edge set, and the
    # next consumer recomputes the rest — measured ~2× upstream cost.
    sym = symmetrize(edges, src, dst).localCheckpoint()

    if local_threshold and sym.limit(local_threshold + 1).count() <= local_threshold:
        return _local_union_find(sym)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # min over neighbours' labels, NULL for isolated-this-round nodes
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("lbl", "nbr_lbl").alias("new_lbl"),  # least skips NULLs
                F.col("lbl").alias("old_lbl"),
            )
        )
        # Checkpoint BEFORE the convergence count: the count and the
        # checkpoint are both actions, and counting the un-materialized
        # frame would execute the round's join+agg twice (measured ~2×
        # per-round cost). The count then reads the materialized
        # partitions for pennies.
        mat = new_labels.localCheckpoint()
        changed = mat.filter(F.col("new_lbl") != F.col("old_lbl")).count()
        labels = mat.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("component_id"))

    # Diameter exceeded the propagation budget — hand the graph to the
    # shape-insensitive contraction instead of failing the run.
    return connected_components_star(edges, src, dst)


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge set: every neighbour
    v > u of node u is re-attached to m = min(Γ(u) ∪ {u}). Output edges
    are oriented src > dst. One shuffle (groupBy src) + one join."""
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """One small-star round over edges oriented src > dst: all smaller
    neighbours of u (and u itself) re-attach to m = min of them. Output
    stays oriented src > dst."""
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        directed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 §3) —
    converges in O(log² d) rounds on ANY graph shape, so it is the path
    for adversarial diameters where min-label propagation needs O(d)
    rounds (a 10⁶-node chain: ~40 star rounds vs 10⁶ label rounds).

    Same contract as ``connected_components``: ``(node, component_id)``
    for every node incident to an edge, component_id = component minimum.

    Scale shape per round: two shuffles (groupBy src; distinct on the
    emitted pairs) over an edge set that only ever shrinks toward one
    edge per non-root node; rows are bare (src, dst) id pairs.
    Convergence check = count + one-sided EXCEPT emptiness on the
    oriented sets (both distinct, so that implies set equality); lineage
    is truncated per round with localCheckpoint like the label loop.
    """
    # Orient the deduped undirected set large→small: small-star's input
    # invariant, and large-star re-derives symmetric neighbourhoods.
    directed = (
        symmetrize(edges, src, dst)
        .filter(F.col("src") > F.col("dst"))
        .localCheckpoint()
    )
    if directed.isEmpty():
        return directed.select(
            F.col("src").alias("node"), F.col("dst").alias("component_id")
        )

    rounds_used = 0
    for _ in range(max_rounds):
        rounds_used += 1
        sym = directed.union(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        after_large = _large_star(sym)
        new_directed = _small_star(after_large).localCheckpoint()
        same_count = new_directed.count() == directed.count()
        if same_count and new_directed.exceptAll(directed).isEmpty():
            directed = new_directed
            break
        directed = new_directed
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — theoretically impossible for any graph with diameter "
            f"< 2^sqrt({max_rounds}); the edge set is likely mutating "
            "between actions (non-deterministic node ids?)"
        )

    if stats is not None:
        stats["rounds"] = rounds_used

    # Fixpoint = disjoint stars centred on component minima: every
    # non-root points at its root; roots appear only as dst.
    non_roots = directed.groupBy("src").agg(F.min("dst").alias("component_id"))
    roots = (
        directed.select("dst")
        .distinct()
        .join(directed.select(F.col("src").alias("dst")).distinct(), "dst", "left_anti")
        .select(F.col("dst").alias("src"), F.col("dst").alias("component_id"))
    )
    return (
        non_roots.select(F.col("src").alias("node"), "component_id")
        .union(roots.select(F.col("src").alias("node"), "component_id"))
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """PageRank over the undirected (symmetrized) graph, computed ENTIRELY
    in fixed-point e12 integer arithmetic — damping 0.85 becomes
    ``(v · 85) div (100 · deg)`` — so every engine lands on bit-identical
    values: a float PageRank's neighbour sums depend on partial-agg
    order, and ulp spread COMPOUNDS across iterations, which no final
    rounding can absorb (the same doctrine as the timeseries fixed-point
    hashing, applied to an iterative fixpoint).

    A FIXED iteration count (no convergence probe) keeps the loop at one
    join + one partial-agg shuffle + a lineage-truncating checkpoint per
    round — unlike the CC loops there is no per-round count action. The
    node count is the only driver-side scalar (one bounded collect).
    Symmetric graphs have no dangling nodes, so mass-leak correction is
    unnecessary; ranks order the dup-family hubs.
    """
    sym = symmetrize(edges, src, dst).localCheckpoint()
    if local_threshold and sym.limit(local_threshold + 1).count() <= local_threshold:
        return _local_pagerank(sym, iters)
    # Distinct column names per derived frame: deg and the edge view both
    # descend from `sym`, and Spark's self-join ambiguity check rejects
    # shared attribute ids in the chained join otherwise.
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("__d")).select(
        F.col("src").alias("__dn"), "__d"
    )
    ev = sym.select(F.col("src").alias("__es"), F.col("dst").alias("__ed"))
    nodes = sym.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr_e12", F.lit(0).cast("long"))
    init = 10**12 // n
    base = (15 * 10**10) // n
    pr = nodes.withColumn("v", F.lit(init).cast("long")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            pr.join(deg, F.col("node") == F.col("__dn"))
            .join(ev, F.col("node") == F.col("__es"))
            .select(
                F.col("__ed").alias("node"),
                F.expr("(v * 85) div (100 * __d)").alias("__c"),
            )
        )
        pr = (
            contrib.groupBy("node")
            .agg((F.lit(base) + F.sum("__c")).cast("long").alias("v"))
            .localCheckpoint()
        )
    return pr.select("node", F.col("v").alias("pr_e12"))


def _local_pagerank(sym: DataFrame, iters: int) -> DataFrame:
    """Single-task fixed-point PageRank for small symmetric edge sets —
    the same adaptive escape hatch as ``_local_union_find``: ten
    distributed rounds cost ~10×(join + agg shuffle + checkpoint) of
    fixed overhead, which dwarfs the actual work below a few million
    edges (measured 43.6 s → ~2 s end-to-end on the sf0.001 dup graph).
    Python ints replay the BIGINT arithmetic exactly (same `//` floors),
    so the result is bit-identical to the distributed loop and the
    oracle's recursive CTE."""
    import pandas as pd

    def pr(pdf: pd.DataFrame) -> pd.DataFrame:
        out_edges: dict = {}
        for a, b in zip(pdf["src"], pdf["dst"]):
            out_edges.setdefault(int(a), []).append(int(b))
        n = len(out_edges)
        init = 10**12 // n
        base = (15 * 10**10) // n
        v = {node: init for node in out_edges}
        for _ in range(iters):
            nxt = {node: base for node in out_edges}
            for node, nbrs in out_edges.items():
                c = (v[node] * 85) // (100 * len(nbrs))
                for b in nbrs:
                    nxt[b] += c
            v = nxt
        nodes = sorted(v)
        return pd.DataFrame({"node": nodes, "pr_e12": [v[x] for x in nodes]})

    t = sym.schema["src"].dataType.simpleString()
    # Pin the single-task result: downstream ranking consumes it more
    # than once (a count for the adaptive small path, then the rank
    # itself) and the applyInPandas must not re-run per consumption.
    return (
        sym.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda pdf: pr(pdf), f"node {t}, pr_e12 long")
        .localCheckpoint()
    )
