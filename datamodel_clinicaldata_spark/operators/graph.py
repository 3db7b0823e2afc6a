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
  path graphs, swap the propagation step for alternating large-star /
  small-star (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14), which converges in O(log²) rounds; the per-round join
  shape below is identical, so the harness (checkpointing, convergence
  counting) is shared.
- Each round is one shuffle join (edges ⋈ labels on dst) + one partial-agg
  shuffle (min per src). Edges are re-used every round → cache them once.
- ``localCheckpoint`` after every round truncates the lineage: without it
  the plan doubles per iteration and the driver OOMs on plan size long
  before the executors sweat.
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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns ``(node, component_id)`` for every node incident to an edge,
    where ``component_id`` is the minimum node id in the component (the
    conventional "keep the smallest doc_id" dedup survivor rule).

    Raises if the fixpoint is not reached within ``max_iter`` rounds —
    silent truncation would mislabel components.
    """
    sym = symmetrize(edges, src, dst).persist()
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
        changed = new_labels.filter(F.col("new_lbl") != F.col("old_lbl")).count()
        labels = new_labels.select(
            "node", F.col("new_lbl").alias("lbl")
        ).localCheckpoint()
        if changed == 0:
            sym.unpersist()
            return labels.select("node", F.col("lbl").alias("component_id"))

    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the propagation budget; raise max_iter "
        "or switch to large-star/small-star contraction"
    )
