"""Behavior pins for the round-7 wave-3 keys (attribution, histogram,
label propagation, vocab coverage, perceptron training): full
plain-Python re-derivations independent of both engines' query text.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

from climateiq_pipelines_spark.operators.analytics_ext2 import (
    _CONV_TYPE,
    _HIST_HI,
    _HIST_LO,
    _HIST_N,
)
from climateiq_pipelines_spark.operators.corpus_quality_ext import _VOCAB_K
from climateiq_pipelines_spark.operators.graph_ext2 import _LPA_ROUNDS
from climateiq_pipelines_spark.operators.ml_train_ext import (
    _BIAS_X0,
    _LABEL_MIN_WORDS,
    _LR_DIV,
    _N_BUCKETS,
    _ROUNDS,
)
from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_SMALL


def test_attribution_rederive(spark):
    ev = sorted(
        load_table(spark, SF_SMALL, "events").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    first_seen: dict[int, str] = {}
    last_seen: dict[int, str] = {}
    agg: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for r in ev:
        uid = int(r["user_id"])
        if r["event_type"] == _CONV_TYPE:
            if uid in first_seen:
                rev = math.floor(r["value"] * 1_000_000)
                for model, touch in (
                    ("first_touch", first_seen[uid]),
                    ("last_touch", last_seen[uid]),
                ):
                    agg[(model, touch)][0] += 1
                    agg[(model, touch)][1] += rev
        else:
            first_seen.setdefault(uid, r["event_type"])
            last_seen[uid] = r["event_type"]
    pdf = QUERIES["events_attribution_touch"](spark, SF_SMALL).toPandas()
    got = {
        (r["model"], r["touch_type"]): (
            int(r["n_conversions"]),
            int(r["revenue_micros"]),
        )
        for _, r in pdf.iterrows()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_histogram_rederive_and_conservation(spark):
    orders = load_table(spark, SF_SMALL, "orders").select("o_totalprice").collect()
    span = _HIST_HI - _HIST_LO
    exp: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for r in orders:
        x = r["o_totalprice"]
        b = min(max(math.floor((x - _HIST_LO) * _HIST_N / span), 0), _HIST_N - 1)
        exp[b][0] += 1
        exp[b][1] += math.floor(x * 1_000_000)
    pdf = QUERIES["agg_width_bucket_histogram"](spark, SF_SMALL).toPandas()
    got = {
        int(r["bucket"]): (int(r["n_orders"]), int(r["total_micros"]))
        for _, r in pdf.iterrows()
    }
    assert got == {k: tuple(v) for k, v in exp.items()}
    # conservation: bucket counts sum to the table, edges are coherent
    assert sum(c for c, _ in got.values()) == len(orders)
    for _, r in pdf.iterrows():
        assert int(r["hi_edge"]) - int(r["lo_edge"]) == span // _HIST_N


def _copurchase_adj(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = defaultdict(set)
    for r in li:
        by_order[int(r["l_orderkey"])].add(int(r["l_partkey"]))
    adj: dict[int, set[int]] = defaultdict(set)
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            adj[u].add(v)
            adj[v].add(u)
    return adj


def test_label_propagation_rederive(spark):
    adj = _copurchase_adj(spark)
    labels = {n: n for n in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            counts = Counter(labels[u] for u in nbrs)
            best = min(counts, key=lambda l: (-counts[l], l))
            nxt[v] = best
        labels = nxt
    sizes = Counter(labels.values())
    pdf = QUERIES["graph_label_propagation"](spark, SF_SMALL).toPandas()
    got = {
        int(r["part_id"]): (int(r["label"]), int(r["community_size"]))
        for _, r in pdf.iterrows()
    }
    assert got == {n: (l, sizes[l]) for n, l in labels.items()}


def test_vocab_coverage_rederive(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("lang", "text").collect()
    counts: Counter = Counter()
    for r in docs:
        counts.update(r["text"].split(" "))
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_VOCAB_K
        ]
    }
    exp = {}
    per_lang: dict[str, list] = defaultdict(lambda: [0, 0, set()])
    for r in docs:
        st = per_lang[r["lang"]]
        for t in r["text"].split(" "):
            st[0] += 1
            if t in vocab:
                st[1] += 1
            else:
                st[2].add(t)
    for lang, (tot, inv, oov) in per_lang.items():
        exp[lang] = (tot, inv, math.floor(inv * 1_000_000.0 / tot), len(oov))
    pdf = QUERIES["llm_vocab_coverage"](spark, SF_SMALL).toPandas()
    got = {
        r["lang"]: (
            int(r["n_tokens"]),
            int(r["n_in_vocab"]),
            int(r["coverage_micros"]),
            int(r["n_oov_types"]),
        )
        for _, r in pdf.iterrows()
    }
    assert got == exp


def test_perceptron_trajectory_rederive(spark):
    """Re-run the full damped batch-perceptron trajectory in plain
    Python and require exact weight/error equality per round, plus the
    convergence property the key demonstrates (non-increasing errors
    from round 2 on; final error rate strictly below the majority-class
    baseline)."""
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    feats, labels = [], []
    for r in docs:
        w = r["text"].split(" ")
        x = [_BIAS_X0] + [0] * _N_BUCKETS
        for t in w:
            x[1 + int(hashlib.md5(t.encode()).hexdigest()[0], 16) % _N_BUCKETS] += 1
        feats.append(x)
        labels.append(1 if len(w) >= _LABEL_MIN_WORDS else -1)

    def tdiv(a: int) -> int:
        q = abs(a) // _LR_DIV
        return q if a >= 0 else -q

    w = [0] * (_N_BUCKETS + 1)
    expected = []
    for _ in range(_ROUNDS):
        d = [0] * len(w)
        e = 0
        for x, y in zip(feats, labels):
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                e += 1
                for i in range(len(w)):
                    d[i] += y * x[i]
        w = [wi + tdiv(di) for wi, di in zip(w, d)]
        expected.append((e, tuple(w)))
    pdf = (
        QUERIES["llm_perceptron_quality"](spark, SF_SMALL)
        .toPandas()
        .sort_values("round")
    )
    assert len(pdf) == _ROUNDS
    for (_, r), (e, wv) in zip(pdf.iterrows(), expected):
        assert int(r["n_errors"]) == e
        assert tuple(int(r[f"w{i}"]) for i in range(len(wv))) == wv
    errs = [e for e, _ in expected]
    assert all(a >= b for a, b in zip(errs[1:], errs[2:]))  # monotone tail
    majority = min(sum(1 for y in labels if y == 1), sum(1 for y in labels if y == -1))
    assert errs[-1] < majority  # beats always-predict-majority


def test_ewma_smoothing_rederive(spark):
    """Re-fold the halving EWMA per event type in plain Python from the
    raw events, including the daily pre-aggregate."""
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_type", "ts", "value"
    ).collect()
    daily: dict[tuple[str, object], int] = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += math.floor(
            r["value"] * 1_000_000
        )
    per_type: dict[str, list] = defaultdict(list)
    for (t, d), x in daily.items():
        per_type[t].append((d, x))
    pdf = QUERIES["events_ewma_smoothing"](spark, SF_SMALL).toPandas()
    assert len(pdf) == len(per_type)
    for _, r in pdf.iterrows():
        series = sorted(per_type[r["event_type"]])
        s = 0
        for _, x in series:
            s = (s + x) // 2
        assert int(r["ewma_micros"]) == s
        assert int(r["n_days"]) == len(series)
        assert r["last_day"] == str(series[-1][0])
        tot = sum(x for _, x in series)
        assert int(r["mean_micros"]) == tot // len(series)


def test_dataset_split_disjoint_complete_and_rederives(spark):
    """The split must assign every doc to exactly one of train/val/test
    with the declared hash rule, and the audit shares must re-derive."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    exp: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for r in docs:
        nib = int(
            hashlib.md5(f"{int(r['doc_id'])}:split".encode()).hexdigest()[0], 16
        )
        split = "train" if nib < 13 else ("val" if nib == 13 else "test")
        exp[(r["lang"], split)][0] += 1
        exp[(r["lang"], split)][1] += len(r["text"].split(" "))
    pdf = QUERIES["llm_dataset_split"](spark, SF_SMALL).toPandas()
    got = {
        (r["lang"], r["split"]): (int(r["n_docs"]), int(r["n_tokens"]))
        for _, r in pdf.iterrows()
    }
    assert got == {k: tuple(v) for k, v in exp.items()}
    # completeness: per-lang doc counts sum back to the corpus
    assert int(pdf["n_docs"].sum()) == len(docs)
    # share audit re-derives
    lang_tot = pdf.groupby("lang")["n_docs"].sum().to_dict()
    for _, r in pdf.iterrows():
        assert int(r["lang_share_micros"]) == math.floor(
            int(r["n_docs"]) * 1_000_000.0 / lang_tot[r["lang"]]
        )


def test_classifier_eval_rederive(spark):
    """Recompute the confusion matrix in Python: train the perceptron
    (same plain-Python loop as the trajectory test), score the val
    split (nibble == 13), and require exact agreement including the
    integer metric arithmetic."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    feats, labels, nibs = [], [], []
    for r in docs:
        w = r["text"].split(" ")
        x = [_BIAS_X0] + [0] * _N_BUCKETS
        for t in w:
            x[1 + int(hashlib.md5(t.encode()).hexdigest()[0], 16) % _N_BUCKETS] += 1
        feats.append(x)
        labels.append(1 if len(w) >= _LABEL_MIN_WORDS else -1)
        nibs.append(
            int(hashlib.md5(f"{int(r['doc_id'])}:split".encode()).hexdigest()[0], 16)
        )

    def tdiv(a: int) -> int:
        q = abs(a) // _LR_DIV
        return q if a >= 0 else -q

    w = [0] * (_N_BUCKETS + 1)
    for _ in range(_ROUNDS):
        d = [0] * len(w)
        for x, y in zip(feats, labels):
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                for i in range(len(w)):
                    d[i] += y * x[i]
        w = [wi + tdiv(di) for wi, di in zip(w, d)]
    tp = fp = fn = tn = 0
    for x, y, nib in zip(feats, labels, nibs):
        if nib != 13:
            continue
        pos = sum(wi * xi for wi, xi in zip(w, x)) > 0
        if y == 1 and pos:
            tp += 1
        elif y == -1 and pos:
            fp += 1
        elif y == 1:
            fn += 1
        else:
            tn += 1
    pdf = QUERIES["llm_classifier_eval"](spark, SF_SMALL).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert (int(r["tp"]), int(r["fp"]), int(r["fn"]), int(r["tn"])) == (
        tp, fp, fn, tn,
    )
    assert int(r["n_docs"]) == tp + fp + fn + tn
    prec = (tp * 1_000_000) // (tp + fp) if tp + fp else None
    rec = (tp * 1_000_000) // (tp + fn) if tp + fn else None
    f1 = (
        (2 * prec * rec) // (prec + rec)
        if (prec or 0) + (rec or 0) > 0
        else None
    )
    def cell(v):
        import pandas as pd
        return None if v is None or pd.isna(v) else int(v)
    assert cell(r["precision_micros"]) == prec
    assert cell(r["recall_micros"]) == rec
    assert cell(r["f1_micros"]) == f1
