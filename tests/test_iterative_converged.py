"""Behavior pins for the round-7 convergence-driven iterative keys
(operators/iterative_ext.py): data-driven round counts, rule caps,
state-shape invariants, and run-to-run determinism (the loop reads
per-round scalars, so nondeterminism anywhere would change n_rounds).
Oracle parity at sf0.01 is covered by driver_sim / the driver itself.
"""

from __future__ import annotations

from climateiq_pipelines_spark.operators import iterative_ext as IE
from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_SMALL


def test_pagerank_converged_rounds_and_state(spark):
    pdf = QUERIES["graph_pagerank_converged"](spark, SF_SMALL).toPandas()
    n_rounds = pdf["n_rounds"].iloc[0]
    assert (pdf["n_rounds"] == n_rounds).all()
    assert 1 <= n_rounds <= IE._PR_MAX_ROUNDS
    # the tolerance binds before the cap on any fixture-sized graph
    assert n_rounds < IE._PR_MAX_ROUNDS
    # every node keeps the damping floor; degrees positive
    assert (pdf["rank_micro"] >= IE._PR_BASE).all()
    assert (pdf["degree"] > 0).all()
    # node set = both sides of the bipartite purchase graph
    assert pdf["is_supplier"].any() and (~pdf["is_supplier"]).any()


def test_pagerank_converged_is_deterministic(spark):
    a = (
        QUERIES["graph_pagerank_converged"](spark, SF_SMALL)
        .toPandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    b = (
        QUERIES["graph_pagerank_converged"](spark, SF_SMALL)
        .toPandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_kmeans_converged_rounds_and_state(spark):
    pdf = QUERIES["llm_kmeans_converged"](spark, SF_SMALL).toPandas()
    n_rounds = pdf["n_rounds"].iloc[0]
    assert (pdf["n_rounds"] == n_rounds).all()
    assert 1 <= n_rounds <= IE._KM_MAX_ROUNDS
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert pdf["n_vecs"].sum() == n_vecs
    assert (pdf["inertia"] >= 0).all()


def test_kmeans_converged_is_deterministic(spark):
    a = (
        QUERIES["llm_kmeans_converged"](spark, SF_SMALL)
        .toPandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    b = (
        QUERIES["llm_kmeans_converged"](spark, SF_SMALL)
        .toPandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
