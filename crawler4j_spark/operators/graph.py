"""Distributed connected components (the dedup-cluster resolver).

Min-label propagation with pointer doubling: every round each node takes
the minimum of (its label, its neighbors' labels, its label's label). The
neighbor term floods the component minimum along edges; the
``label(label)`` term is pointer doubling — label chains halve every
round, so convergence is O(log diameter) rounds instead of O(diameter)
(a 10^10-node bucket-hub graph with chained buckets converges in ~30
rounds where plain propagation would need the chain length). Each round
is two keyed joins + one groupBy — no cartesian anything — and labels are
``localCheckpoint``ed so round k's plan never replays rounds 0..k-1. The
driver-side convergence count per round is a deliberate bounded sync
point, exactly like the mint offsets collect (mint.py:54).

This is the step between "LSH bucket join" and "keep one canonical doc"
in an at-scale dedup pipeline (A~B, B~C => {A,B,C} one cluster);
`analytics.q_dedup_cc_label` drives it under the DuckDB recursive-CTE
oracle, and tests/test_graph.py proves it against a union-find model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank", "hits"]


def pagerank(
    edges: DataFrame,            # (src long/str, dst long/str) directed
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Damped PageRank power iteration over a directed edge list —
    ``(node, pr)`` after ``n_iter`` rounds from uniform init 1.0 (the
    classic pr = (1-d) + d·Σ pr(in)/outdeg(in) formulation; the authority
    signal a production crawler feeds back into frontier priority, see
    ``CrawlEngine.reprioritize_frontier``. The reference's priority byte is
    user-set — url/WebURL.java:255-263 — this computes one).

    Scale shape: each iteration is the canonical two-shuffle step — the
    rank/degree joins key on ``src`` (both exchanges share that
    partitioning; at cluster scale pre-partition ``edges`` by src once and
    every iteration's join is co-located), then the contribution aggregate
    keys on ``dst`` with full map-side combine. Ranks are
    ``localCheckpoint``ed per iteration so round k's plan never replays
    rounds 0..k-1 (same discipline as ``connected_components``). Dangling
    nodes keep the floor rank (their mass is not redistributed — the
    convention of the standard Spark/Pregel example this mirrors)."""
    out_edges = edges.select("src", "dst").localCheckpoint()
    outdeg = out_edges.groupBy("src").agg(F.count("*").alias("_d"))
    nodes = (out_edges.select(F.col("src").alias("node"))
             .union(out_edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    for _ in range(n_iter):
        contrib = (
            out_edges
            .join(outdeg, "src")
            .join(ranks.select(F.col("node").alias("src"),
                               F.col("pr").alias("_w")), "src")
            .groupBy("dst").agg(F.sum(F.col("_w") / F.col("_d")).alias("_c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit(1.0 - damping)
                     + F.lit(damping) * F.coalesce("_c", F.lit(0.0)))
                    .alias("pr"))
            .localCheckpoint()
        )
    return ranks


def hits(
    edges: DataFrame,            # (src, dst) directed
    n_iter: int = 1,
) -> DataFrame:
    """Unnormalized HITS power iterations — ``(node, auth, hub)`` doubles
    from hub init 1.0 (Kleinberg's update order: auth ← Σ hub(in-nbrs),
    then hub ← Σ auth(out-nbrs) using the NEW auth). Normalization is a
    per-iteration scalar divide that cancels in any rank-ordering use —
    the frontier feedback (``CrawlEngine.reprioritize_frontier``) consumes
    relative order only, so it is omitted and one iteration stays
    integer-exact.

    Scale shape: per iteration one dst-keyed and one src-keyed
    shuffle-join+aggregate (full map-side combine), ranks
    ``localCheckpoint``ed like ``pagerank``; at cluster scale pre-partition
    ``edges`` by each join key once and every iteration co-locates."""
    e = edges.select("src", "dst").localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = nodes.select("node", F.lit(0.0).alias("auth"))
    for _ in range(n_iter):
        a_sum = (
            e.join(hub.select(F.col("node").alias("src"),
                              F.col("hub").alias("_h")), "src")
            .groupBy("dst").agg(F.sum("_h").alias("_a"))
            .withColumnRenamed("dst", "node")
        )
        auth = (
            nodes.join(a_sum, "node", "left")
            .select("node", F.coalesce("_a", F.lit(0.0)).alias("auth"))
            .localCheckpoint()
        )
        h_sum = (
            e.join(auth.select(F.col("node").alias("dst"),
                               F.col("auth").alias("_a")), "dst")
            .groupBy("src").agg(F.sum("_a").alias("_h"))
            .withColumnRenamed("src", "node")
        )
        hub = (
            nodes.join(h_sum, "node", "left")
            .select("node", F.coalesce("_h", F.lit(0.0)).alias("hub"))
            .localCheckpoint()
        )
    return auth.join(hub, "node")

#: With pointer doubling, rounds ~ log2(diameter) + a small constant; 64
#: covers any graph that fits on hardware. Hitting it raises rather than
#: returning partial labels.
CC_MAX_ROUNDS = 64


def connected_components(
    edges: DataFrame,            # (a long, b long) undirected edge list
    max_rounds: int = CC_MAX_ROUNDS,
) -> tuple[DataFrame, int]:
    """Label every endpoint with the minimum node id of its component.
    Returns ``(labels(node, component), rounds_used)``. Isolated nodes
    (absent from ``edges``) are the caller's to handle — they are their
    own singleton components by definition."""
    sym = (
        edges.select(F.col("a").alias("s"), F.col("b").alias("d"))
        .union(edges.select(F.col("b").alias("s"), F.col("a").alias("d")))
    )
    labels = (
        sym.select(F.col("s").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy("s").agg(F.min("component").alias("nbr_min"))
        )
        # pointer doubling: component(component(v)) — one self-join
        hop = (
            labels.alias("x")
            .join(labels.select(
                F.col("node").alias("h_node"),
                F.col("component").alias("h_comp")),
                F.col("x.component") == F.col("h_node"), "left")
            .select(F.col("x.node").alias("node"),
                    F.col("x.component").alias("component"),
                    F.coalesce(F.col("h_comp"), F.col("x.component"))
                    .alias("hop"))
        )
        new_labels = (
            hop.join(nbr_min, hop["node"] == nbr_min["s"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                    F.col("hop"),
                ).alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.select(
                "node", F.col("component").alias("old")), "node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_rounds} rounds")
    return labels, rounds
