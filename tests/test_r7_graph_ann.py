"""Behavior pins for the round-7 graph/ANN wave (triangle counting,
Matryoshka rerank, Bloom decontamination): plain-Python re-derivations
independent of both engines' query text.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from climateiq_pipelines_spark.operators.ann_ext2 import (
    _BLOOM_K,
    _BLOOM_N,
    _EVAL_SOURCE,
    _MRL_K,
    _MRL_PREFIX_DIM,
    _MRL_SHORTLIST,
)
from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_SMALL


def test_triangle_counts_against_bruteforce(spark):
    """Rebuild the part co-purchase graph in Python sets and count each
    node's triangles by brute force over neighbor pairs."""
    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(int(r["l_orderkey"]), set()).add(int(r["l_partkey"]))
    adj: dict[int, set[int]] = {}
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    pdf = QUERIES["graph_triangle_count"](spark, SF_SMALL).toPandas()
    assert len(pdf) == len(adj)
    for _, r in pdf.iterrows():
        node = int(r["part_id"])
        nbrs = adj[node]
        tri = sum(1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x])
        d = len(nbrs)
        assert int(r["degree"]) == d
        assert int(r["n_triangles"]) == tri, (node, tri, r["n_triangles"])
        cc = (2_000_000 * tri) // (d * (d - 1)) if d >= 2 else 0
        assert int(r["clustering_micros"]) == cc


def test_mrl_rerank_against_bruteforce(spark):
    """Re-derive the two-stage shortlist+rerank in numpy from the raw
    embeddings: stage-1 top-shortlist by prefix dot, stage-2 exact
    full-dim rerank — the operator must agree exactly."""
    import numpy as np

    rows = (
        load_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    expected = {}
    for i, qid in enumerate(ids):
        keep = ids != qid
        nb, m = ids[keep], mat[keep]
        td = np.floor(mat[i][None, :_MRL_PREFIX_DIM] * m[:, :_MRL_PREFIX_DIM] * 1e12).sum(axis=1)
        short = np.lexsort((nb, -td))[:_MRL_SHORTLIST]
        fd = np.floor(mat[i][None, :] * m[short] * 1e12).sum(axis=1)
        top = np.lexsort((nb[short], -fd))[:_MRL_K]
        for rnk, j in enumerate(top, 1):
            expected[(int(qid), int(nb[short][j]))] = (
                rnk,
                int(np.floor(float(fd[j]) / 1e6)),
            )
    pdf = QUERIES["llm_mrl_truncated_rerank"](spark, SF_SMALL).toPandas()
    assert len(pdf) == len(expected)
    assert set(pdf["method"]) == {f"mrl_prefix{_MRL_PREFIX_DIM}_rerank"}
    for _, r in pdf.iterrows():
        rnk, sim = expected[(int(r["vec_id"]), int(r["neighbor_id"]))]
        assert int(r["rnk"]) == rnk
        assert int(r["cos_micros"]) == sim


def test_bloom_decontam_no_false_negatives_and_counts(spark):
    """The Bloom prefilter may over-select (false positives) but can
    never miss: every truly contaminated shingle must be a candidate,
    so n_verified equals the exact per-doc contamination count and
    n_candidates >= n_verified everywhere."""
    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )

    def shingles(text: str) -> set[str]:
        w = text.split(" ")
        return {
            " ".join(w[i : i + _BLOOM_N])
            for i in range(len(w) - _BLOOM_N + 1)
        }

    eval_sh: set[str] = set()
    for r in docs:
        if r["source"] == _EVAL_SOURCE:
            eval_sh |= shingles(r["text"])
    bits = {
        int(hashlib.md5(s.encode()).hexdigest()[j * 4 : j * 4 + 4], 16)
        for s in eval_sh
        for j in range(_BLOOM_K)
    }
    expected = {}
    for r in docs:
        if r["source"] == _EVAL_SOURCE:
            continue
        cand = {
            s
            for s in shingles(r["text"])
            if all(
                int(hashlib.md5(s.encode()).hexdigest()[j * 4 : j * 4 + 4], 16)
                in bits
                for j in range(_BLOOM_K)
            )
        }
        if cand:
            expected[int(r["doc_id"])] = (len(cand), len(cand & eval_sh))
        # no false negatives: every truly-shared shingle is a candidate
        assert shingles(r["text"]) & eval_sh <= cand
    pdf = QUERIES["llm_bloom_decontam"](spark, SF_SMALL).toPandas()
    got = {
        int(r["doc_id"]): (int(r["n_candidates"]), int(r["n_verified"]))
        for _, r in pdf.iterrows()
    }
    assert got == expected
    assert all(c >= v for c, v in got.values())


def test_ann_recall_eval_consistent_with_components(spark):
    """The recall distribution must re-derive exactly from the two
    component keys' own outputs, and the weighted mean must match the
    per-row constant column."""
    exact = (
        QUERIES["llm_cosine_topk"](spark, SF_SMALL)
        .select("vec_id", "neighbor_id")
        .toPandas()
    )
    approx = (
        QUERIES["llm_cosine_topk_lsh"](spark, SF_SMALL)
        .select("vec_id", "neighbor_id")
        .toPandas()
    )
    apairs = set(zip(approx["vec_id"], approx["neighbor_id"]))
    hits_per_q: dict[int, int] = {}
    for v, n in zip(exact["vec_id"], exact["neighbor_id"]):
        hits_per_q.setdefault(int(v), 0)
        if (v, n) in apairs:
            hits_per_q[int(v)] += 1
    from collections import Counter

    dist = Counter(hits_per_q.values())
    pdf = QUERIES["llm_ann_recall_eval"](spark, SF_SMALL).toPandas()
    got = {int(r["hits"]): int(r["n_queries"]) for _, r in pdf.iterrows()}
    assert got == dict(dist)
    total = sum(dist.values())
    mean = int(sum(h * n * 200000.0 for h, n in dist.items()) // total)
    assert set(int(r["mean_recall_micros"]) for _, r in pdf.iterrows()) == {mean}
    assert int(pdf["n_queries"].sum()) == total
