"""Connected components over near-duplicate pair edges — the step that
turns pairwise dedup output into disjoint duplicate CLUSTERS (keep the
min-id representative per cluster, drop the rest).

Implemented as iterative minimum-label propagation (Pregel-lite on
DataFrames): every node starts with its own id as label; each round a
node adopts the smallest label among itself and its neighbors; stop
when a round changes nothing. Rounds = graph diameter, and near-dup
graphs are overwhelmingly tiny star/clique components, so 3–5 rounds
settle real corpora. Each round is one join + one aggregate — all
hash-shuffled on node id, no driver-side state beyond the changed-row
count that drives convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster) with cluster = min node id reachable via edges.

    ``nodes`` must contain every vertex (isolated docs become singleton
    clusters); ``edges`` is undirected input (one row per pair, either
    orientation). Raises if propagation hasn't converged in ``max_iter``
    rounds — a real corpus hitting that has a pathological chain and the
    caller should raise the bound consciously.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
    )
    # NOT checkpointed: per-round re-execution of sym's lineage reuses
    # the already-written shuffle files (stages are skipped), so an
    # eager materialization only adds block-manager pressure — measured
    # slower at sf0.1, not faster.
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("cluster")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("cluster").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce("n_min", F.col("cluster"))
                ).alias("cluster"),
                (F.coalesce("n_min", F.col("cluster")) < F.col("cluster")).alias(
                    "_chg"
                ),
            )
        )
        # EAGER lineage truncation every round: a cache + partial action
        # materializes only the touched partitions, so later rounds
        # re-derive the whole join chain — exponential in round count.
        # localCheckpoint materializes all partitions and cuts lineage,
        # the standard pattern for iterative DataFrame algorithms.
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological chain component; raise max_iter"
    )
