"""Graph clustering for dedup: connected components over a candidate
dup-pair edge list → one canonical cluster id per document/vector.

A training-data pipeline doesn't just FIND near-dup pairs — it has to
pick one survivor per transitive cluster (A~B, B~C ⇒ {A,B,C} even if
A≁C).  Components are computed by iterative min-label propagation —
the standard Spark formulation (GraphX/Pregel shape) expressed in pure
DataFrame ops:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint, PLUS a pointer-doubling shortcut each round

    label(v) ← min(label(v), label(label(v)))

(the Shiloach-Vishkin / hash-to-min trick): labels chase their own
mapping, so the distance a label travels doubles per round and the
loop converges in O(log diameter) rounds instead of O(diameter) —
containment-style chains (A quotes B quotes C …) produce long paths
that would otherwise exhaust max_iter.  Each round is two shuffled
equi-joins + a groupBy on vertex id (same key → AQE reuses the
partitioning).  `localCheckpoint` truncates the growing lineage so
round N doesn't re-execute rounds 1..N-1.

At 100 TB: edge lists from LSH banding are bounded per bucket, the
loop is O(log diameter) shuffles of the (small) vertex-label table,
not of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def connected_components(pairs: DataFrame, a: str, b: str,
                         max_iter: int = 25,
                         local_threshold: int = 200_000) -> DataFrame:
    """pairs(a, b) undirected edges → (id, cluster_id) with cluster_id
    = min member id of the component.  Only ids appearing in an edge
    are returned (singletons have no dup decision to make).

    SMALL-GRAPH FAST PATH: the edge list is the dedup pipeline's
    near-dup PAIR set — tiny relative to the corpus — so when one
    cheap count shows ≤ local_threshold edges, a driver-side
    union-find (O(E·α)) replaces the iterative job chain: one bounded
    collect instead of ~7 rounds × 2 shuffles of scheduling latency
    (measured 5.5s → <1s on the sf0.1 terminal).  The GraphFrames/
    production pattern; equality with the distributed loop is pinned
    by test.  Above the threshold the distributed loop runs.

    Distributed-loop cost discipline: the edge table carries a
    SELF-LOOP per vertex, so one edges⋈labels groupBy yields min(own,
    neighbors) directly — no separate labels⟕nbr_min join; and
    convergence is witnessed by the LABEL SUM, not a
    join-against-previous: labels only ever decrease
    (min-propagation), so sum(label) is strictly monotone and equal
    sums ⟺ fixpoint.  Each round is therefore exactly two shuffled
    joins + one scalar agg on the vertex table."""
    # Materialize the edge list ONCE: the pair feed is typically an
    # uncached join pipeline (IVF candidates, LSH buckets) — without
    # this the threshold count, the fast-path collect, and the loop
    # would each recompute it from scratch.
    e = (pairs.select(col(a).alias("src"), col(b).alias("dst"))
         .localCheckpoint())
    if local_threshold > 0 and e.limit(local_threshold + 1).count() \
            <= local_threshold:
        return _local_components(e)
    sym = e.unionByName(e.select(col("dst").alias("src"),
                                 col("src").alias("dst")))
    ids = sym.select(col("src").alias("id")).distinct().localCheckpoint()
    # Self-loops fold each vertex's own label into the neighbor min.
    edges = (sym.unionByName(ids.select(col("id").alias("src"),
                                        col("id").alias("dst")))
             .distinct()
             .localCheckpoint())

    labels = ids.withColumn("label", col("id")).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iter):
        prop = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "id")
        )
        # Pointer doubling: label ← min(label, label(label)).  Every
        # label value is itself a vertex id (labels start as ids and
        # only ever take min over ids), so the self-join always
        # resolves; chasing the mapping doubles propagation distance
        # per round → O(log diameter) rounds on chain graphs where
        # neighbor-min alone needs O(diameter).
        lmap = prop.select(col("id").alias("_lid"),
                           col("label").alias("_ll"))
        labels = (
            prop.join(lmap, col("label") == col("_lid"), "left")
            .select("id",
                    F.least(col("label"), F.coalesce(col("_ll"),
                                                     col("label")))
                    .alias("label"))
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select("id", col("label").alias("cluster_id"))


def _local_components(e: DataFrame) -> DataFrame:
    """Driver-side union-find over a BOUNDED edge list (caller counts
    first).  Path-halving + union-by-min keeps the min member as the
    root, matching the distributed loop's cluster_id exactly."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]   # path halving
            x = parent[x]
        return x

    rows = e.collect()
    for r in rows:
        s, d = r[0], r[1]
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by MIN id so the root IS the cluster id
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    out = [(x, find(x)) for x in parent]
    id_type = e.schema[0].dataType.simpleString()
    return e.sparkSession.createDataFrame(
        out, schema=f"id {id_type}, cluster_id {id_type}")
