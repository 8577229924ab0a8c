"""Connected components over a pair list (duplicate-cluster resolution).

LSH emits near-duplicate PAIRS; a training-data pipeline needs CLUSTERS —
one representative kept per group of transitively-linked documents. This
is hash-min label propagation: every node starts labelled with its own
id and repeatedly adopts the minimum label among itself and its
neighbours until no label changes.

Scale notes (100 TB): each round is one equi-join (edges ⋈ labels on
src) plus one min-aggregate (shuffle on dst) — both key-partitioned,
map-side partial-aggregated, and nothing proportional to the graph is
ever broadcast or collected. Round count is bounded by the component
diameter; near-dup graphs are overwhelmingly small cliques (diameter
2-3), so the loop exits after a handful of rounds. Large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") cuts
the worst case to O(log d) rounds at the cost of extra per-round work;
hash-min keeps rounds minimal for the short-diameter graphs dedup
produces. Convergence is detected from sum(label) — labels only ever
decrease, so an unchanged (overflow-safe DECIMAL) sum is a fixpoint —
one scalar action per round, no per-row diff join. ``localCheckpoint``
truncates lineage each round so the plan does not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iters: int = 25) -> DataFrame:
    """Resolve undirected edge pairs into components.

    Returns one row per node appearing in ``pairs`` with columns
    ``id`` and ``component`` (the minimum node id reachable from it).
    Raises if ``max_iters`` rounds don't reach the fixpoint (a diameter
    that large means the input is not a dedup pair list).
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct()
             .persist())
    # seed with min(self, neighbors) — exactly one hash-min round fused
    # into the node-dedup aggregate, so diameter-2 cliques (the typical
    # dedup cluster) converge one full round (two jobs) earlier
    labels = (edges.groupBy(F.col("src").alias("id"))
              .agg(F.least(F.col("src"), F.min("dst")).alias("component"))
              .localCheckpoint())
    prev_sum = None
    for _ in range(max_iters):
        prop = (edges.join(labels, edges["src"] == labels["id"])
                .select(F.col("dst").alias("id"), "component"))
        labels_new = (labels.union(prop)
                      .groupBy("id")
                      .agg(F.min("component").alias("component"))
                      .localCheckpoint())
        cur_sum = labels_new.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = labels_new
        if prev_sum is not None and cur_sum == prev_sum:
            edges.unpersist()
            return labels
        prev_sum = cur_sum
    edges.unpersist()
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds")
