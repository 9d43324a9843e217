"""Behavior pins for the corpus-quality extensions (Gopher rules,
temperature mixture, duplicate-substring spans): plain-Python
re-derivations, so a wrong-but-self-consistent formulation shared by
both engines' query text would still surface.
"""

from __future__ import annotations

import math

from climateiq_pipelines_spark.operators.corpus_quality_ext import (
    _MAX_MWL_MICROS,
    _MAX_WORDS,
    _MIN_MWL_MICROS,
    _MIN_STOP_DISTINCT,
    _MIN_WORDS,
    _SPAN_MIN_WORDS,
    _SPAN_N,
    _STOPWORDS,
)
from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_SMALL


def _doc_words(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    return {
        int(r["doc_id"]): r["text"].split(" ") for r in docs.collect()
    }


def test_gopher_metrics_rederive(spark):
    """Every metric and the keep flag recomputed per doc in Python."""
    words = _doc_words(spark)
    pdf = QUERIES["llm_gopher_quality"](spark, SF_SMALL).toPandas()
    assert len(pdf) == len(words)
    for _, r in pdf.iterrows():
        w = words[int(r["doc_id"])]
        n = len(w)
        mwl = math.floor(sum(len(x) for x in w) * 1_000_000.0 / n)
        n_stop = sum(1 for s in _STOPWORDS if s in w)
        assert int(r["n_words"]) == n
        assert int(r["mwl_micros"]) == mwl
        assert int(r["max_word_len"]) == max(len(x) for x in w)
        assert int(r["n_stop_distinct"]) == n_stop
        keep = (
            _MIN_WORDS <= n <= _MAX_WORDS
            and _MIN_MWL_MICROS <= mwl <= _MAX_MWL_MICROS
            and n_stop >= _MIN_STOP_DISTINCT
        )
        assert bool(r["keep"]) == keep


def test_temperature_mixture_flattens_toward_uniform(spark):
    """The defining property of temperature sampling: shares move
    toward uniform but never reorder — high-resource languages are
    downsampled (factor < 1), low-resource upsampled (factor > 1),
    and both share vectors sum to 1."""
    pdf = QUERIES["llm_temperature_mixture"](spark, SF_SMALL).toPandas()
    # Shares are FLOORED INTEGER MICROS as of round 12 (the round(,6)
    # double form was the module's one strict-comparator half-up
    # hazard); flooring loses < 1e-6 per language.
    p_s = pdf["token_share_micros"] / 1e6
    q_s = pdf["temp_share_micros"] / 1e6
    assert abs(p_s.sum() - 1.0) < 1e-4
    assert abs(q_s.sum() - 1.0) < 1e-4
    uniform = 1.0 / len(pdf)
    by_p = pdf.sort_values("token_share_micros")
    # monotone: ordering by p equals ordering by q (temperature never
    # swaps ranks), and q is strictly between p and uniform
    assert list(by_p["temp_share_micros"]) == sorted(
        pdf["temp_share_micros"]
    )
    for _, r in pdf.iterrows():
        p, q = r["token_share_micros"] / 1e6, r["temp_share_micros"] / 1e6
        lo, hi = min(p, uniform), max(p, uniform)
        assert lo - 2e-6 <= q <= hi + 2e-6, (p, q, uniform)
        assert (r["upsample_micros"] > 1_000_000) == (p < q) or abs(
            p - q
        ) < 2e-6


def test_substring_spans_are_verbatim_and_maximal(spark):
    """Each reported span's words match verbatim between the two docs,
    cover >= the minimum length, and are MAXIMAL (one more word on
    either side breaks the match or leaves a document)."""
    words = _doc_words(spark)
    pdf = QUERIES["llm_substring_span_dedup"](spark, SF_SMALL).toPandas()
    assert len(pdf) > 0, "fixture must contain at least one long span"
    for _, r in pdf.iterrows():
        a, b = words[int(r["a_id"])], words[int(r["b_id"])]
        sa, sb, ln = int(r["a_start"]) - 1, int(r["b_start"]) - 1, int(
            r["span_words"]
        )
        assert ln >= _SPAN_MIN_WORDS
        assert a[sa : sa + ln] == b[sb : sb + ln], r
        if sa > 0 and sb > 0:
            assert a[sa - 1] != b[sb - 1], f"span not left-maximal: {r}"
        if sa + ln < len(a) and sb + ln < len(b):
            assert a[sa + ln] != b[sb + ln], f"span not right-maximal: {r}"


def test_substring_spans_complete_against_bruteforce(spark):
    """Brute-force all maximal common word spans >= the threshold over
    all doc pairs (O(n^2 L^2) — fine at sf0.001) and require exact set
    equality with the operator's output."""
    words = _doc_words(spark)
    expected = set()
    ids = sorted(words)
    for i, aid in enumerate(ids):
        for bid in ids[i + 1 :]:
            a, b = words[aid], words[bid]
            for sa in range(len(a)):
                for sb in range(len(b)):
                    if a[sa] != b[sb]:
                        continue
                    # only count runs at their start (maximality left)
                    if sa > 0 and sb > 0 and a[sa - 1] == b[sb - 1]:
                        continue
                    ln = 0
                    while (
                        sa + ln < len(a)
                        and sb + ln < len(b)
                        and a[sa + ln] == b[sb + ln]
                    ):
                        ln += 1
                    if ln >= _SPAN_MIN_WORDS:
                        expected.add((aid, bid, sa + 1, sb + 1, ln))
    pdf = QUERIES["llm_substring_span_dedup"](spark, SF_SMALL).toPandas()
    got = {
        (
            int(r["a_id"]),
            int(r["b_id"]),
            int(r["a_start"]),
            int(r["b_start"]),
            int(r["span_words"]),
        )
        for _, r in pdf.iterrows()
    }
    assert got == expected
    assert _SPAN_N <= _SPAN_MIN_WORDS  # sanity on the module constants

def test_substring_spans_anchor_equivalence(spark):
    """r17 optimization pin: the registered operator joins on
    _SPAN_MIN_WORDS-gram ANCHORS; this re-derives the pre-r17 form
    (raw _SPAN_N-gram self-join + islands + HAVING >= threshold) and
    requires exact multiset equality — the overlapping-window identity
    the rewrite rests on (a maximal run of r >= _SPAN_MIN_RUN matching
    _SPAN_N-grams on a diagonal IS a maximal run of r - _SPAN_MIN_RUN
    + 1 matching _SPAN_MIN_WORDS-grams there)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from climateiq_pipelines_spark.functions.textgrams import word_shingles
    from climateiq_pipelines_spark.registry import widen_if_narrow

    docs = widen_if_narrow(
        spark,
        load_table(spark, SF_SMALL, "documents").select("doc_id", "text"),
    )
    sh = word_shingles(docs, _SPAN_N, with_pos=True).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "s"
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("pos").alias("pa"), "s")
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("pos").alias("pb"), "s")
    hits = (
        a.join(b, "s")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag")
        )
    )
    iw = W.partitionBy("a_id", "b_id", "diag").orderBy("pa")
    isl = hits.withColumn("island", F.col("pa") - F.row_number().over(iw))
    old = (
        isl.groupBy("a_id", "b_id", "diag", "island")
        .agg(
            F.min("pa").cast("long").alias("a_start"),
            F.min("pb").cast("long").alias("b_start"),
            (F.count(F.lit(1)) + F.lit(_SPAN_N - 1)).cast("long").alias(
                "span_words"
            ),
        )
        .filter(F.col("span_words") >= _SPAN_MIN_WORDS)
        .select("a_id", "b_id", "a_start", "b_start", "span_words")
    )
    new = QUERIES["llm_substring_span_dedup"](spark, SF_SMALL)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
