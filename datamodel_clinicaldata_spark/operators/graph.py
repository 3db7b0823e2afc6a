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
- Lineage is truncated after every round via ``truncate_lineage``:
  without it the plan doubles per iteration and the driver OOMs on plan
  size long before the executors sweat. The default (``'local'``) is
  ``localCheckpoint`` — right for local mode, but on a real cluster an
  executor loss mid-fixpoint kills the run; past the threshold where
  that matters, pass ``checkpoint_mode='reliable'`` (or set
  ``SPARK_GRAFT_CHECKPOINT=reliable`` fleet-wide) for durable
  ``checkpoint()`` — see SCALING.md "Reliable-checkpoint doctrine";
  partitioning survives either way.
- Convergence is detected with a count of changed labels — one action per
  round, the standard cost of any fixpoint algorithm on Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def truncate_lineage(
    df: DataFrame, mode: str | None = None, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and cut its lineage — the per-round pin every
    iterative fixpoint here needs (without it the plan doubles per round
    and the driver OOMs on plan size long before the executors sweat).

    ``mode`` (default: ``$SPARK_GRAFT_CHECKPOINT`` or ``'local'``):

    - ``'local'`` — ``localCheckpoint()``: blocks live on executors with
      NO lineage left. Fastest, and correct for local mode / ephemeral
      jobs, but an executor loss mid-fixpoint kills the run on a real
      cluster.
    - ``'reliable'`` — ``checkpoint()`` to the SparkContext checkpoint
      dir (HDFS/S3 on a cluster): survives executor loss, costs one
      write+read of the frame per round. On a cluster, call
      ``sc.setCheckpointDir('hdfs://...')`` FIRST; if unset, a local
      temp dir is used so local runs/tests work out of the box (that
      fallback is NOT durable — it exercises the code path, not the
      fault-tolerance).

    The env var makes the swap deployment-time configuration: registered
    queries stay parameter-free while a cluster submit flips every
    fixpoint to reliable checkpoints (SCALING.md "Reliable-checkpoint
    doctrine")."""
    mode = mode or os.environ.get("SPARK_GRAFT_CHECKPOINT", "local")
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            import tempfile

            sc.setCheckpointDir(
                tempfile.mkdtemp(prefix="spark_graft_ckpt_")
            )
        # Reliable checkpoints write in a SEPARATE job after the first
        # action; without a persist that job RECOMPUTES the lineage, and
        # with nondeterministic upstream (range-partitioner sampling, pid
        # assignment — exactly what callers pin for) the checkpointed
        # copy can differ from what the first consumer already read. So
        # in reliable mode: persist → eager checkpoint (count + write
        # both read cached blocks, one computation total) → unpersist.
        # The caller's `eager=False` is a local-mode action-count
        # optimization only; here consistency wins over the extra action.
        from pyspark import StorageLevel

        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return cached.checkpoint(eager=True)
        finally:
            cached.unpersist()
    if mode != "local":
        raise ValueError(f"truncate_lineage: unknown mode {mode!r}")
    return df.localCheckpoint(eager=eager)


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
    checkpoint_mode: str | None = None,
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
    sym = truncate_lineage(symmetrize(edges, src, dst), checkpoint_mode)

    if local_threshold and sym.limit(local_threshold + 1).count() <= local_threshold:
        return _local_union_find(sym)
    labels = truncate_lineage(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node")),
        checkpoint_mode,
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
        # LAZY checkpoint materialized by the convergence count — one
        # action per round: an eager checkpoint + count pair would be two
        # (and counting an un-checkpointed frame would execute the
        # round's join+agg twice, measured ~2× per-round cost).
        mat = truncate_lineage(new_labels, checkpoint_mode, eager=False)
        changed = mat.filter(F.col("new_lbl") != F.col("old_lbl")).count()
        labels = mat.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("component_id"))

    # Diameter exceeded the propagation budget — hand the graph to the
    # shape-insensitive contraction instead of failing the run.
    return connected_components_star(edges, src, dst, checkpoint_mode=checkpoint_mode)


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge set: every neighbour
    v > u of node u is re-attached to m = min(Γ(u) ∪ {u}). Output edges
    are oriented src > dst.

    ONE exchange: m is a window min over partitionBy(src) — the r9
    groupBy+join shape paid a second pass over ``sym`` plus a join for
    the same per-src scalar. No trailing ``distinct``: duplicate pairs
    cannot change the following small-star's per-src min, and its single
    output ``distinct`` collapses them — dropping a full (src,dst)
    shuffle per round (VERDICT r9 #3)."""
    m = F.least(F.min("dst").over(Window.partitionBy("src")), F.col("src"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """One small-star round over edges oriented src > dst: all smaller
    neighbours of u (and u itself) re-attach to m = min of them. Output
    stays oriented src > dst.

    Same single-exchange shape as ``_large_star``: window min per src,
    then BOTH emissions — (v, m) per smaller neighbour v and (u, m) for
    the centre itself — ride one explode off the same row (the per-edge
    duplicate (u, m) copies collapse in the round's one distinct), so
    the r9 mins-frame join + union is gone."""
    m = F.min("dst").over(Window.partitionBy("src"))
    return (
        directed.withColumn("m", m)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("dst").alias("s"), F.col("m").alias("d")),
                    F.struct(F.col("src").alias("s"), F.col("m").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _edge_fingerprint(directed: DataFrame) -> tuple:
    """Deterministic set fingerprint of a DISTINCT oriented edge frame:
    (count, Σ xxhash64(src,dst) as DECIMAL(38), XOR of the same hashes)
    in ONE aggregate action. Used as the cheap per-round convergence
    screen — equality of consecutive fingerprints is confirmed by the
    exact ``_is_star_set`` test before the loop stops, so a (≈2⁻¹²⁸)
    hash collision can delay detection by a round but never produce a
    wrong answer. The decimal cast keeps the sum exact under ANSI mode
    (a LONG sum of 64-bit hashes overflows ANSI arithmetic)."""
    h = F.xxhash64("src", "dst")
    row = directed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("hxor"),
    ).collect()[0]
    return (row["n"], row["hsum"], row["hxor"])


def _is_star_set(directed: DataFrame) -> bool:
    """EXACT fixpoint test: an oriented (src > dst) distinct edge set is
    a disjoint star forest iff every src appears exactly once (out-degree
    1) and no node is both a src and a dst (height 1). These are exactly
    the fixpoints of the large-star∘small-star round (a star centred on
    its minimum maps to itself under both operators; any multi-level or
    multi-parent shape is rewritten), so stopping on this test — run only
    when the fingerprint screen fires — is exact, not probabilistic.

    ONE job / one shuffle: both conditions ride a single per-node role
    rollup (each edge explodes into a src-role and a dst-role row) —
    a violating node has either >1 src roles or both roles."""
    roles = directed.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.lit(1).alias("s"), F.lit(0).alias("d")),
                F.struct(F.col("dst").alias("node"), F.lit(0).alias("s"), F.lit(1).alias("d")),
            )
        ).alias("r")
    )
    bad = (
        roles.groupBy("r.node")
        .agg(F.sum("r.s").alias("ns"), F.sum("r.d").alias("nd"))
        .filter((F.col("ns") > 1) | ((F.col("ns") > 0) & (F.col("nd") > 0)))
    )
    return bad.isEmpty()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
    stats: dict | None = None,
    checkpoint_mode: str | None = None,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 §3) —
    converges in O(log² d) rounds on ANY graph shape, so it is the path
    for adversarial diameters where min-label propagation needs O(d)
    rounds (a 10⁶-node chain: ~40 star rounds vs 10⁶ label rounds).

    Same contract as ``connected_components``: ``(node, component_id)``
    for every node incident to an edge, component_id = component minimum.

    Scale shape per round (r10 rework, VERDICT r9 #3): THREE shuffles —
    a window min per large-star, a window min per small-star, one
    distinct on the emitted pairs — over an edge set that only ever
    shrinks toward one edge per non-root node; rows are bare (src, dst)
    id pairs. (The r9 shape paid 4 shuffles + 2 joins: groupBy+join in
    each star operator plus a distinct in each.) Convergence costs ONE
    aggregate action per round (``_edge_fingerprint``) instead of
    count + exceptAll; a fingerprint repeat is confirmed by the exact
    ``_is_star_set`` structural test, so the stop condition is exact.
    NOTE count-equality alone would NOT suffice: on any forest the
    directed edge count is pinned at (nodes − components) every round
    while the set keeps contracting, so a chain would false-converge
    immediately. Lineage is truncated per round via ``truncate_lineage``
    (``checkpoint_mode``: local | reliable, see its docstring).
    """
    # Orient the deduped undirected set large→small: small-star's input
    # invariant, and large-star re-derives symmetric neighbourhoods.
    directed = truncate_lineage(
        symmetrize(edges, src, dst).filter(F.col("src") > F.col("dst")),
        checkpoint_mode,
    )
    fp = _edge_fingerprint(directed)
    if fp[0] == 0:  # empty-graph check rides the fingerprint — no extra job
        return directed.select(
            F.col("src").alias("node"), F.col("dst").alias("component_id")
        )

    # Per-round action policy: ONE job. The round's frame is checkpointed
    # LAZILY (eager=False) and the fingerprint aggregate is the action
    # that materializes it — r9 paid three actions per round (eager
    # checkpoint + count + exceptAll). A persist()-based amortization
    # (checkpoint every k rounds) was tried and MEASURED WORSE (14 s →
    # 84 s on the 100k chain): re-planning a k-deep window/explode stack
    # around the InMemoryRelation grows superlinearly, and the union's
    # double reference recomputes whatever the cache doesn't cover —
    # per-round truncation is what keeps round cost flat.
    rounds_used = 0
    for _ in range(max_rounds):
        rounds_used += 1
        sym = directed.union(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        new_directed = truncate_lineage(
            _small_star(_large_star(sym)), checkpoint_mode, eager=False
        )
        new_fp = _edge_fingerprint(new_directed)  # materializes the pin
        directed = new_directed
        # The exact test normally runs only when the fingerprint repeats
        # (set unchanged ⇒ fixpoint candidate). On SMALL edge sets it runs
        # every round: dup-family graphs collapse to stars in round 1, and
        # the ~0.1 s check detects that immediately instead of paying a
        # full confirmation round (windows + distinct + fingerprint). At
        # scale the fp screen alone drives the loop — an extra per-round
        # shuffle over a billion-edge frame would cost more than the one
        # round it could save.
        if (new_fp == fp or new_fp[0] <= 10_000) and _is_star_set(directed):
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — theoretically impossible for any graph with diameter "
            f"< 2^sqrt({max_rounds}); the edge set is likely mutating "
            "between actions (non-deterministic node ids?)"
        )

    if stats is not None:
        stats["rounds"] = rounds_used

    # Fixpoint = disjoint stars centred on component minima, and
    # ``_is_star_set`` has VERIFIED out-degree 1 and height 1 — so the
    # edge list itself is the labeling: each src row is a non-root with
    # its root in dst (no groupBy needed: src appears exactly once), and
    # the roots are exactly distinct(dst) (no anti-join needed: height 1
    # means no dst ever appears as a src). One distinct exchange total —
    # the r9 extraction paid a groupBy, two distincts, and a left_anti.
    return (
        directed.select(F.col("src").alias("node"), F.col("dst").alias("component_id"))
        .union(
            directed.select(
                F.col("dst").alias("node"), F.col("dst").alias("component_id")
            ).distinct()
        )
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    local_threshold: int = 2_000_000,
    checkpoint_mode: str | None = None,
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
    sym = truncate_lineage(symmetrize(edges, src, dst), checkpoint_mode)
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
    pr = truncate_lineage(
        nodes.withColumn("v", F.lit(init).cast("long")), checkpoint_mode
    )
    for _ in range(iters):
        contrib = (
            pr.join(deg, F.col("node") == F.col("__dn"))
            .join(ev, F.col("node") == F.col("__es"))
            .select(
                F.col("__ed").alias("node"),
                F.expr("(v * 85) div (100 * __d)").alias("__c"),
            )
        )
        pr = truncate_lineage(
            contrib.groupBy("node")
            .agg((F.lit(base) + F.sum("__c")).cast("long").alias("v")),
            checkpoint_mode,
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
    # Routed through truncate_lineage so SPARK_GRAFT_CHECKPOINT=reliable
    # covers this pin like every other one in the package.
    return truncate_lineage(
        sym.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda pdf: pr(pdf), f"node {t}, pr_e12 long")
    )
