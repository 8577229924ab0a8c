"""Connected components over a pair list (duplicate-cluster resolution).

LSH emits near-duplicate PAIRS; a training-data pipeline needs CLUSTERS —
one representative kept per group of transitively-linked documents.

Two convergence regimes, used adaptively:

* **hash-min label propagation** — every node repeatedly adopts the
  minimum label among itself and its neighbours. One equi-join + one
  min-aggregate per round; converges in O(diameter) rounds. Dedup
  graphs are overwhelmingly small cliques (diameter 2-3), so this is
  the cheap path that almost always finishes first (measured: the
  star rounds below cost ~2× the jobs per round at bench SF).
* **large-star / small-star contraction** (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) — each round links
  every node's larger neighbours, then its smaller neighbours, to the
  minimum of its neighbourhood, contracting any component to a star in
  O(log n) rounds even for worst-case chain/path graphs.

``connected_components`` runs hash-min for ``star_after`` rounds; if the
fixpoint hasn't arrived (an unusually deep graph), it contracts the
*label-compressed* residual graph with alternating stars — total rounds
O(star_after + log n) instead of O(diameter).

Scale notes (100 TB): every round in both regimes is a constant number
of key-partitioned shuffles; per-node neighbour lists are never
materialized (mins are aggregates, relinks are equi-joins) and nothing
proportional to the graph is broadcast or collected. Convergence is one
tiny aggregate action per round — hash-min: sum(label) (labels only
decrease, so an unchanged overflow-safe DECIMAL sum is a fixpoint);
stars: the (count, sum(src), sum(dst)) triple, confirmed by one exact
anti-join so a checksum coincidence cannot end the loop early.
``localCheckpoint`` truncates lineage each round so the plan does not
grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-larger neighbours to
    the minimum of its neighbourhood (including itself). Input/output:
    directed distinct edges (src, dst) without self-loops."""
    sym = (edges.union(edges.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst"))
           .distinct())
    mins = (sym.groupBy("src").agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m")))
    return (sym.where(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient each edge large→small, then every node links
    its smaller neighbours (and itself) to the minimum among them."""
    o = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (o.join(mins, "u")
                .select(F.col("v").alias("src"), F.col("m").alias("dst"))
                .where(F.col("src") != F.col("dst")))
    self_links = mins.select(F.col("u").alias("src"),
                             F.col("m").alias("dst"))
    return relinked.union(self_links).distinct()


def _edge_stats(edges: DataFrame):
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.col("src").cast("decimal(38,0)")).alias("ss"),
        F.sum(F.col("dst").cast("decimal(38,0)")).alias("sd"),
    ).collect()[0]
    return row["n"], row["ss"], row["sd"]


def _star_components(edges: DataFrame, max_iters: int
                     ) -> tuple[DataFrame, int]:
    """Alternating star contraction to the fixpoint star graph.
    Returns (star edges src→component-min, rounds used)."""
    edges = edges.localCheckpoint()
    prev = _edge_stats(edges)
    for rounds in range(1, max_iters + 1):
        edges_new = _small_star(_large_star(edges)).localCheckpoint()
        cur = _edge_stats(edges_new)
        if cur == prev:
            # checksum stable — confirm the exact fixpoint (equal
            # counts make one anti-join direction sufficient)
            changed = (edges_new.join(edges, ["src", "dst"], "left_anti")
                       .limit(1).count())
            if changed == 0:
                return edges_new, rounds
        edges = edges_new
        prev = cur
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} star rounds")


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iters: int = 25,
                         star_after: int = 4) -> DataFrame:
    """Resolve undirected edge pairs into components.

    Returns one row per node appearing in ``pairs`` with columns
    ``id`` and ``component`` (the minimum node id reachable from it).
    ``star_after`` hash-min rounds run first (0 = star-contract from
    the start); deeper graphs then switch to the O(log n) star phase,
    so ``max_iters`` bounds only pathology, not path graphs.
    """
    # both directions from ONE evaluation of the pairs subtree (for
    # dedup_cc_clusters that subtree is the whole LSH pipeline — a
    # two-select union would run it twice even under the persist)
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
             )).alias("e"))
             .select("e.src", "e.dst")
             .distinct()
             .persist())
    # seed with min(self, neighbors) — one hash-min round fused into the
    # node-dedup aggregate, so diameter-2 cliques (the typical dedup
    # cluster) converge one full round (two jobs) earlier
    labels = (edges.groupBy(F.col("src").alias("id"))
              .agg(F.least(F.col("src"), F.min("dst")).alias("component"))
              .localCheckpoint())
    prev_sum = None
    for _ in range(max(star_after, 0)):
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
    # not converged (deep graph): star-contract the label-compressed
    # residual — components among the current labels, then compose
    contracted = (edges
                  .join(labels.withColumnRenamed("id", "src")
                        .withColumnRenamed("component", "lsrc"), "src")
                  .join(labels.withColumnRenamed("id", "dst")
                        .withColumnRenamed("component", "ldst"), "dst")
                  .select(F.col("lsrc").alias("src"),
                          F.col("ldst").alias("dst"))
                  .where(F.col("src") != F.col("dst"))
                  .distinct())
    edges.unpersist()
    if contracted.limit(1).count() == 0:
        return labels  # labels already component-consistent
    stars, _ = _star_components(contracted, max_iters)
    comp = stars.select(F.col("src").alias("component"),
                        F.col("dst").alias("final"))
    return (labels.join(comp, "component", "left")
            .select("id", F.coalesce("final", F.col("component"))
                    .alias("component")))
