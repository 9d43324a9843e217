"""Near-duplicate CLUSTERING — the production step after pair
generation: near-dup pairs are edges, duplicates form connected
components, and each component keeps one canonical document. Added in
round 3; loaded after the driver's 50-entry correctness window
(plans.load_all) and covered by tools/driver_sim.py.

This is the repo's genuinely ITERATIVE operator (a driver loop of
DataFrame joins, converging on graph diameter), yet still fully
hash-checked: the DuckDB oracle computes the same components with a
recursive CTE, so the iterative Spark formulation is proven equivalent
to the declarative fixpoint on every fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.operators.llm import (
    _simhash60_pairs,
    _simhash60_sigs,
    _simhash60_sql_sig,
)
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

def connected_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "doc_id"
) -> DataFrame:
    """Min-label propagation to a fixpoint: returns (node_col, label)
    where label = min node id reachable from each node over the
    undirected edge set (a_id, b_id). Totality: every node appears,
    singletons label themselves. Lineage is truncated per round with
    localCheckpoint (cluster deployments: durable checkpoint).
    Property-tested against a union-find reference on arbitrary graphs
    (tests/test_properties.py) and hash-checked against a recursive-CTE
    oracle via llm_dedup_clusters.

    Each round is propagate ∪ keep → min per node: TWO shuffles (the
    edge join and the min aggregate). The earlier three-shuffle form
    (neighbor-min groupBy + old-vs-new left join carrying a _changed
    flag) was measured ~30% slower per round. Convergence check:
    labels only ever DECREASE under min-propagation, so Σlabel is a
    strict potential function — the round sum (a one-row aggregate off
    the checkpointed frame, summed as decimal(38) so 10^9 nodes with
    10^18 ids cannot overflow) is unchanged iff no label moved."""
    bi = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    bi = bi.localCheckpoint(eager=True)

    labels = nodes.select(node_col, F.col(node_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(32):
        prop = bi.join(labels, bi.dst == F.col(node_col)).select(
            F.col("src").alias(node_col), F.col("label")
        )
        labels = (
            prop.union(labels)
            .groupBy(node_col)
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # bounded driver action: ONE scalar row off the materialized
        # checkpoint (same class as the .count() convergence probes).
        round_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if round_sum == prev_sum:
            break
        prev_sum = round_sum
    else:
        raise RuntimeError("label propagation did not converge in 32 rounds")
    return labels


_CLUSTER_ORACLE = f"""
    WITH RECURSIVE
    {_simhash60_sql_sig()},
    edges AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 3
    ),
    bi AS (
      SELECT a_id AS src, b_id AS dst FROM edges
      UNION ALL
      SELECT b_id, a_id FROM edges
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT bi.src, reach.r FROM bi JOIN reach ON bi.dst = reach.node
    ),
    comp AS (SELECT node AS doc_id, min(r) AS cluster_id
             FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM comp
"""


@register("llm_dedup_clusters", oracle=_CLUSTER_ORACLE)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over simhash near-dup edges (Hamming ≤ 3 on
    the 60-bit token simhash), by iterative MIN-LABEL PROPAGATION:

    1. Edges from the banded candidate generator (_simhash60_pairs —
       recall exactly 1.0 for the ≤3 threshold, never all-pairs).
    2. Every doc starts labeled with its own id (singletons are their
       own cluster — totality matters: an un-clustered doc must appear
       in the output, not vanish).
    3. Iterate label(v) ← min(label(v), min over neighbors u of
       label(u)) until no label changes. Each iteration is one
       edge-join + one groupBy (shuffles keyed on node id); lineage is
       truncated per iteration with localCheckpoint so the plan does
       not grow unboundedly (on a cluster: checkpoint to durable
       storage instead).
    4. Output one row per DOCUMENT: (doc_id, cluster_id = component min
       id, cluster_size, is_canonical = keeps-the-cluster).

    Convergence: ≤ graph diameter iterations (near-dup components are
    dense — permutation/copy cliques converge in 1; the 32-iteration
    cap is a safety net that raises rather than emitting a
    half-converged clustering). At 10^9+ nodes with long chains, switch
    to large-star/small-star (alternating min-propagation that
    contracts paths in O(log n) rounds) — same join-per-round shape,
    fewer rounds; Hamming cliques make plain propagation the right
    default here.

    The oracle is a DuckDB RECURSIVE CTE computing the identical
    fixpoint, so the iterative engine path is value-hash-proven — the
    repo's demonstration that 'iterative algorithm' need not mean
    'rows-only'."""
    docs = load_table(spark, sf_dir, "documents")
    edges = _simhash60_pairs(_simhash60_sigs(docs)).select("a_id", "b_id")
    labels = connected_components(
        docs.select("doc_id"), edges, node_col="doc_id"
    )

    wc = W.partitionBy("cluster_id")
    return labels.select(
        "doc_id", F.col("label").alias("cluster_id")
    ).select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(wc).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
