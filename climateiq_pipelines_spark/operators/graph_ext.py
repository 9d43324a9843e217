"""Round-6 graph-analytics extension: PageRank power iteration over the
customer–supplier purchase graph. Together with
`dedup_graph.connected_components` (min-label / star contraction) this
gives the repo both canonical iterative-graph shapes: component
labelling and degree-normalized centrality. Registered after the
driver's 50-entry certification window (plans.load_all);
rotation-targeted for round 7+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.fixedpoint import (
    PR_BASE,
    PR_R0,
    bipartite_purchase_edges,
    pagerank_oracle_sql,
)
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

_PR_ITERS = 3
_PR_R0 = PR_R0  # initial rank, micro-units (fixedpoint canonical home)
_PR_BASE = PR_BASE  # (1 - d) in micros, d = 0.85


def _pagerank_oracle() -> str:
    # 3 unrolled power iterations as CTE stages — the identical integer
    # arithmetic the engine runs: c(u) = r(u) // deg(u) per edge,
    # r'(v) = BASE + (Σ c(u) * 85) // 100.  ONE builder shared with
    # the converged twin (fixedpoint.pagerank_oracle_sql — round-13
    # review batch D found the block duplicated here and in
    # iterative_ext).
    return pagerank_oracle_sql(_PR_ITERS)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK over the bipartite customer–supplier purchase graph —
    degree-normalized centrality, the second canonical iterative graph
    shape beside connected components (`llm_dedup_clusters`): which
    suppliers sit at the center of the purchase network, weighted by
    how concentrated each buyer's attention is. Nodes are customers
    (2k) and suppliers (2k+1); an undirected edge per DISTINCT
    purchase relationship; 3 power iterations of
    r'(v) = 0.15 + 0.85 · Σ_(u→v) r(u)/deg(u).

    Exactness: ranks live in int64 micro-units; each per-edge
    contribution is floor(r(u) / deg(u)) (integer division), each
    damping step is (Σ · 85) DIV 100 — every iteration is pure integer
    arithmetic, so 3 rounds compose bit-identically on both engines
    (the llm_kmeans_iterate unrolled-fixed-point contract applied to
    graphs). Iteration count is fixed at 3 for hash-checkability; a
    production run iterates to an L1-residual threshold with the same
    per-round plan.

    Plan: the edge list is built ONCE (orderkey join, distinct pair
    aggregate), symmetrized, and the degree table derives from it; the
    (edge, deg) subtree repeats identically under each unrolled round
    and AQE's runtime stage reuse computes its shuffles once
    (measured 2.5 s vs 3.9 s for a localCheckpoint barrier at sf0.1 —
    the checkpoint's ExistingRDD scan forfeits both exchange reuse
    and AQE's join re-planning). Per iteration the plan is one
    node-keyed join (rank → edge source) + one map-side-combined sum
    on the destination, i.e. 2 shuffles per round, the same
    discipline as connected_components. No driver-side loop state:
    the 3 rounds are unrolled into one lazy plan. At 100 TB: rank and
    degree state is node-sized (≪ edge-sized); hot hubs are the skew
    risk and AQE's skew-join split handles the rank join (pinned for
    the identical shape by test_aqe_skew_join_splits_hot_partition);
    at hundreds of rounds (not 3) lineage depth would warrant a
    localCheckpoint every ~10 rounds — the dedup_graph discipline."""
    # Shared lazy edge build (fixedpoint.bipartite_purchase_edges, one
    # home with the converged twin); NO checkpoint here — AQE stage
    # reuse is measured faster for this unrolled plan (docstring).
    _edges, sym, deg = bipartite_purchase_edges(spark, sf_dir)
    # (src, dst, src-degree): identical subtree under every unrolled
    # round — AQE stage reuse computes its shuffles once (see
    # docstring for the measured checkpoint comparison).
    edge_deg = sym.join(deg, sym["u"] == deg["node"]).select("u", "v", "deg")
    ranks = deg.select("node", F.lit(_PR_R0).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        contribs = edge_deg.join(
            ranks, edge_deg["u"] == ranks["node"]
        ).select("v", F.expr("r div deg").alias("c"))
        ranks = contribs.groupBy(F.col("v").alias("node")).agg(
            (F.lit(_PR_BASE) + F.expr("(sum(c) * 85) div 100")).alias("r")
        )
    return ranks.join(deg.select("node", "deg"), "node").select(
        F.col("node").alias("node_id"),
        (F.col("node") % 2 == 1).alias("is_supplier"),
        F.col("deg").cast("long").alias("degree"),
        F.col("r").cast("long").alias("rank_micro"),
    )
