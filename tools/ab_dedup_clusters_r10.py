"""Round-10 A/B (VERDICT r9 task #5): llm_dedup_clusters' star-
contraction loop — is the intermediate post-large-star .distinct() a
win or a wasted shuffle?

The min-aggregates downstream (small-star's groupBy(u).min(v)) are
duplicate-insensitive, so dropping the intermediate distinct is
answer-preserving (the round's FINAL distinct still canonicalizes the
state); the trade is one fewer shuffle per round vs a larger small-star
join input. Measures warm wall-clock of the full registered key at
sf0.1, A (current) vs B (no intermediate distinct), x3 each,
interleaved, plus an answer-equality check.

Usage: python tools/ab_dedup_clusters_r10.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def cc_no_mid_distinct(nodes, edges, node_col="doc_id"):
    """connected_components with the post-large-star .distinct()
    removed (variant B). Everything else identical."""
    raw = edges.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_stat, prev_e = None, None
    for _ in range(32):
        nbrs = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        e = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            # variant B: NO .distinct() here
        )
        mins2 = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        ).first()
        stat = (row["n"], row["su"], row["sv"])
        if stat == prev_stat and prev_e is not None:
            if prev_e.exceptAll(e).limit(1).count() == 0:
                break
        prev_stat, prev_e = stat, e
    else:
        raise RuntimeError("no convergence")
    heads = e.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias(node_col), "label"
    )
    return nodes.select(node_col).join(heads, node_col, "left").select(
        node_col, F.coalesce("label", F.col(node_col)).alias("label")
    )


def main() -> int:
    from climateiq_pipelines_spark import get_spark
    from climateiq_pipelines_spark.operators import dedup_graph
    from climateiq_pipelines_spark.operators.llm import (
        _simhash60_pairs,
        _simhash60_sigs,
    )
    from climateiq_pipelines_spark.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-dedup", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    def run_a():
        return dedup_graph.llm_dedup_clusters(spark, sf_dir).count()

    def run_b():
        edges = _simhash60_pairs(_simhash60_sigs(docs)).select("a_id", "b_id")
        return cc_no_mid_distinct(docs.select("doc_id"), edges).count()

    # answer equality (once)
    a_df = dedup_graph.connected_components(
        docs.select("doc_id"),
        _simhash60_pairs(_simhash60_sigs(docs)).select("a_id", "b_id"),
    )
    edges = _simhash60_pairs(_simhash60_sigs(docs)).select("a_id", "b_id")
    b_df = cc_no_mid_distinct(docs.select("doc_id"), edges)
    diff = a_df.exceptAll(b_df).count() + b_df.exceptAll(a_df).count()
    print(f"answer diff rows: {diff}")
    assert diff == 0

    run_a(), run_b()  # warm both paths
    for trial in range(3):
        t0 = time.perf_counter(); run_a(); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); run_b(); tb = time.perf_counter() - t0
        print(f"trial {trial}: A(current)={ta:.2f}s  B(no-mid-distinct)={tb:.2f}s",
              flush=True)
    print("load:", os.getloadavg())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
