"""Round-6 retrieval-infrastructure extensions: inverted-index
(posting-list) construction, overlapping sliding-window chunking,
BM25 full-text ranking, and Reciprocal Rank Fusion of the lexical and
dense retrievers — the build AND read sides of a retrieval / RAG
stack (the dense read side is the ANN family: llm_cosine_topk /
llm_ivf_topk / llm_knn_query). Registered after the driver's 50-entry
certification window (plans.load_all); rotation-targeted for
round 7+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

_POSTINGS_K = 5

_INVERTED_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
      WHERE w <> ''
    ),
    tf AS (
      SELECT w AS token, doc_id, COUNT(*) AS tf
      FROM words GROUP BY w, doc_id
    ),
    ranked AS (
      SELECT token, doc_id, tf,
             row_number() OVER (PARTITION BY token
                                ORDER BY tf DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY token) AS df
      FROM tf
    )
    SELECT token, CAST(rk AS INTEGER) AS rank, doc_id,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM ranked WHERE rk <= {_POSTINGS_K}
"""


@register("llm_inverted_index", oracle=_INVERTED_ORACLE)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INVERTED-INDEX CONSTRUCTION — the build step of every keyword
    retrieval system (BM25 serving, contamination lookups, corpus
    search): token → top-5 posting list by term frequency, with each
    token's document frequency alongside. The posting order is a TOTAL
    order (tf desc, doc_id asc — row_number, not rank), so tf ties at
    the cutoff can never flip the result set between engines.

    Plan: the word stream collapses map-side into (token, doc, tf)
    counts — ONE data-sized shuffle; the top-k and df windows share a
    single token partitioning (WindowGroupLimit prunes the rank
    filter before materializing full posting lists). At 100 TB this is
    the canonical index-build shape: token-partitioned, per-token
    state bounded by the posting cutoff, hot tokens (stopwords) are
    the skew risk — production salts or drops stopword postings; the
    df column is what that decision reads."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    words = docs.select("doc_id", F.explode(ws).alias("token"))
    tf = words.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    tw = W.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    dfw = W.partitionBy("token")
    return (
        tf.withColumn("rank", F.row_number().over(tw))
        .withColumn("df", F.count(F.lit(1)).over(dfw))
        .filter(F.col("rank") <= _POSTINGS_K)
        .select(
            "token",
            F.col("rank").cast("int"),
            "doc_id",
            "tf",
            F.col("df").cast("long"),
        )
    )


_CHUNK_WIDTH = 64
_CHUNK_STRIDE = 48  # overlap = 16 tokens


def _sliding_chunks_oracle() -> str:
    return f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
             ws[({_CHUNK_STRIDE} * i + 1):({_CHUNK_STRIDE} * i
                + {_CHUNK_WIDTH})] AS cw
      FROM ws, UNNEST(range(CAST(ceil(len(ws) / {_CHUNK_STRIDE}.0)
                            AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(cw) AS BIGINT) AS n_tokens,
           md5(array_to_string(cw, ' ')) AS chunk_digest
    FROM chunks
    """


@register("llm_sliding_chunks", oracle=_sliding_chunks_oracle())
def llm_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAPPING SLIDING-WINDOW CHUNKING — the RAG / embedding-stage
    chunker: windows of 64 tokens advancing by a 48-token stride (16
    tokens of overlap), so no semantic boundary is ever lost to a hard
    cut. One row per (doc, chunk) with the token count and the md5
    digest of the chunk text — the digest pins the FULL chunk content,
    so an off-by-one in the stride arithmetic or slicing hash-fails
    immediately. Chunk count = ceil(n / stride); the final windows are
    short by construction (identical formula both engines; empty docs
    produce no chunks).

    Contrast with the two sibling chunkers: `llm_pack_sequences` packs
    WHOLE documents into fixed token budgets (training batches);
    `udtf_native_chunker` cuts disjoint fixed windows (the UDTF API
    demo); this key is the overlapping variant retrieval actually
    indexes. Plan: a ZERO-SHUFFLE map stage end to end — the window
    index sequence, per-index array slice, join, and digest all run
    inside codegen over the scan; at 100 TB this is a pure map over
    the corpus, the cheapest possible shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    arr = docs.select("doc_id", ws.alias("ws"))
    # sequence(0, n-1) DESCENDS when n = 0 — guard empty docs to [].
    idx = F.when(
        F.size("ws") > 0,
        F.expr(
            f"sequence(0, cast(ceil(size(ws) / {_CHUNK_STRIDE}.0) as int)"
            " - 1)"
        ),
    ).otherwise(F.expr("array()"))
    chunks = arr.select(
        "doc_id", "ws", F.explode(idx).alias("chunk_idx")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.expr(
            f"slice(ws, {_CHUNK_STRIDE} * chunk_idx + 1, {_CHUNK_WIDTH})"
        ).alias("cw"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("cw").cast("long").alias("n_tokens"),
        F.md5(F.array_join("cw", " ")).alias("chunk_digest"),
    )


_BM25_QUERY = ("table", "spark", "query")
_BM25_K1 = "1.2"
_BM25_B = "0.75"

# The full per-(doc, term) BM25 contribution as ONE shared SQL text —
# both engines evaluate the IDENTICAL expression tree over exact
# integer inputs (tf, df, dl, n_docs, total_dl), so every intermediate
# double matches bit-for-bit except ln(), whose libm output is
# immediately floored to int64 micros (idf_micro) — the one
# library-dependent value enters the arithmetic as an integer.
# Contribution = idf * (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl)),
# floored to micros for exact integer summation (the dsum policy).
#
# EVERY literal is E-notation and EVERY integer operand is explicitly
# CAST AS DOUBLE (round-9 fix): in Spark SQL a bare `1.2` or
# `1000000.0` parses as DECIMAL, so the "shared" text previously ran
# a decimal arithmetic chain on the Spark side and a double chain in
# DuckDB — pre-floor values ~0.15 micros apart, a ~15% floor-flip per
# (doc, term) that surfaced as a 1-micro top-10 divergence at sf0.1
# (sf0.01 certs had passed on luck). E-notation literals are DOUBLE
# in both dialects, making the whole chain pure IEEE ops —
# bit-identical — with the inner ln knife-edge (ulp-of-libm vs the
# micro floor, ~1e-9 per distinct (n_docs, df)) the only residual,
# pinned by test_properties_r9's cross-engine identity sweep.
# Named {tf}/{df} placeholders, formatted per use — round-12 review:
# the Spark side previously rewrote the rendered text via blind
# substring .replace("df", ...)/.replace("tf", ...) (plus a dead
# .replace("tf.doc_id", ...) that matched nothing), so any future
# token containing "tf"/"df" as a substring (a dist_fp intermediate, a
# renamed operand) would corrupt the engine expression while the
# oracle kept the original — a silent cross-engine fork the shared-text
# identity test cannot catch.
_BM25_CONTRIB_TEMPLATE = f"""
  CAST(floor(
    CAST(CAST(floor(ln((CAST(n_docs AS DOUBLE) - CAST({{df}} AS DOUBLE)
                        + 5.0e-1)
                       / (CAST({{df}} AS DOUBLE) + 5.0e-1) + 1.0e0) * 1.0e6)
              AS BIGINT) AS DOUBLE) / 1.0e6
    * (CAST({{tf}} AS DOUBLE) * ({_BM25_K1}e0 + 1.0e0))
    / (CAST({{tf}} AS DOUBLE) + {_BM25_K1}e0 * (1.0e0 - {_BM25_B}e0
         + {_BM25_B}e0 * CAST(dl AS DOUBLE)
           / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
    * 1.0e6) AS BIGINT)
"""

_BM25_CONTRIB_SQL = _BM25_CONTRIB_TEMPLATE.format(tf="tf", df="df")

_BM25_TOPK = 10


def _bm25_chain_sql() -> str:
    """The words→dl→tot→tf→dfq→contrib CTE chain — ONE source for
    _bm25_oracle and _rrf_oracle (round-12 review: two hand-maintained
    verbatim copies; the round-9 decimal-literal incident shows this
    text gets edited under pressure, and a fix applied to only one copy
    would certify llm_rrf_fusion's lexical ranking against a stale
    scoring definition)."""
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
      WHERE w <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
    tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
    tf AS (
      SELECT doc_id, w, COUNT(*) AS tf
      FROM words WHERE w IN ({terms}) GROUP BY doc_id, w
    ),
    dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    contrib AS (
      SELECT tf.doc_id, {_BM25_CONTRIB_SQL} AS c
      FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id), tot
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {_bm25_chain_sql()},
    sc AS (
      SELECT doc_id, COUNT(*) AS n_matched, SUM(c) AS s
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
           CAST(s AS DOUBLE) / 1000000.0 AS bm25,
           CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT doc_id, n_matched, s,
             row_number() OVER (ORDER BY s DESC, doc_id) AS rk
      FROM sc
    ) WHERE rk <= {_BM25_TOPK}
    """


@register("llm_bm25_score", oracle=_bm25_oracle())
def llm_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 FULL-TEXT RANKING — the read side of `llm_inverted_index`:
    score every document against a fixed 3-term query with the real
    BM25 formula (k1 = 1.2, b = 0.75, the Robertson idf in its
    always-positive ln(1 + ·) form) and return the top-10 under a
    total order (score desc, doc_id). This is the lexical half of
    every hybrid retrieval stack; the ANN keys are the dense half.

    Exactness: the per-(doc, term) contribution is ONE shared SQL text
    evaluated by BOTH engines over exact integer inputs — identical
    IEEE expression tree; ln(), the only libm call, is floored to
    int64 micros immediately, and per-doc scores are exact integer
    sums of those micros (the dsum policy; the fixed-order 3-term
    chain equals the relational SUM because int addition is
    associative), so ranking ties are decided identically — and the
    ORACLE keeps the relational (doc, term, tf) form, an
    independently-SHAPED second implementation of the same contract.
    Plan: ONE pass over the word stream — the fixed query pivots
    into conditional tf counts beside the doc length (3.0 s → 1.1 s
    at sf0.1 vs the relational form's three serial jobs), one 1-row
    stats broadcast, and the top-10 is TakeOrderedAndProject — never
    a data-sized sort. At 100 TB a real index fetches postings
    instead of scanning (llm_inverted_index builds it); this
    scan-side form is the index-free fallback with the identical
    scoring contract."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    words = docs.select("doc_id", F.explode(ws).alias("w"))
    # ONE pass over the word stream: the query is a fixed small set, so
    # per-term tfs pivot into conditional counts beside the doc length
    # — no separate tf/df relations, no second explode (was 3.0 s at
    # sf0.1 in the relational form; 3 serial jobs collapsed to 2).
    perdoc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count_if(F.col("w") == t).alias(f"tf{i}")
            for i, t in enumerate(_BM25_QUERY)
        ],
    )
    tot = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(_BM25_QUERY))
        ],
    )
    # Per-term contribution: the SAME shared expression text, with this
    # term's tf/df substituted — identical int64 micros per (doc, term)
    # as the relational form, summed in a fixed order (int addition is
    # associative, so the relational SUM and this 3-term chain agree).
    def term_c(i: int):
        c = _BM25_CONTRIB_TEMPLATE.format(tf=f"tf{i}", df=f"df{i}")
        return F.when(F.col(f"tf{i}") > 0, F.expr(c)).otherwise(F.lit(0))

    staged = perdoc.crossJoin(F.broadcast(tot))
    n_terms = len(_BM25_QUERY)
    n_matched = sum(
        (F.col(f"tf{i}") > 0).cast("long") for i in range(n_terms)
    )
    s_total = sum(term_c(i) for i in range(n_terms))
    sc = staged.select(
        "doc_id",
        n_matched.alias("n_matched"),
        s_total.cast("long").alias("s"),
    ).filter(F.col("n_matched") > 0)
    top = sc.orderBy(F.desc("s"), F.asc("doc_id")).limit(_BM25_TOPK)
    rw = W.orderBy(F.desc("s"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(rw)).select(
        "doc_id",
        "n_matched",
        (F.col("s").cast("double") / F.lit(1e6)).alias("bm25"),
        F.col("rank").cast("int"),
    )


_RRF_K = 60  # the standard RRF damping constant


def _rrf_oracle() -> str:
    from climateiq_pipelines_spark.functions.fixedpoint import _sql_int_dot

    dot = _sql_int_dot("e.embedding", "q.q_emb")
    return f"""
    WITH {_bm25_chain_sql()},
    sc AS (SELECT doc_id, SUM(c) AS s FROM contrib GROUP BY doc_id),
    lexr AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rk
      FROM sc
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    dscored AS (
      SELECT e.vec_id, {dot} AS dot_fp
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    denser AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY dot_fp DESC, vec_id) AS rk
      FROM dscored
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.vec_id) AS id,
             l.rk AS lex_rank, d.rk AS dense_rank
      FROM (SELECT * FROM lexr WHERE rk <= {_BM25_TOPK}) l
      FULL JOIN (SELECT * FROM denser WHERE rk <= {_BM25_TOPK}) d
        ON l.doc_id = d.vec_id
    )
    SELECT id,
           CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(dense_rank AS INTEGER) AS dense_rank,
           CAST(COALESCE(1000000 // ({_RRF_K} + lex_rank), 0)
              + COALESCE(1000000 // ({_RRF_K} + dense_rank), 0)
              AS BIGINT) AS rrf_micro,
           CAST(row_number() OVER (
             ORDER BY COALESCE(1000000 // ({_RRF_K} + lex_rank), 0)
                    + COALESCE(1000000 // ({_RRF_K} + dense_rank), 0) DESC,
                    id) AS INTEGER) AS fused_rank
    FROM fused
    """


@register("llm_rrf_fusion", oracle=_rrf_oracle())
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID-RETRIEVAL RANK FUSION (RRF, Cormack et al. 2009) — the
    step every modern search stack runs after its lexical and dense
    retrievers: fuse the BM25 top-10 (llm_bm25_score's ranking) with
    the embedding top-10 (llm_knn_query's exact-dot ranking against
    the vec_id-0 query) via Reciprocal Rank Fusion, score(d) =
    Σ_lists 1/(60 + rank). Documents found by only one retriever keep
    that single term — the property that makes RRF robust to score
    scale mismatch between lists (it reads only RANKS, never scores).

    Exactness: both input rankings are already total integer orders
    (BM25 micro-sums; fixed-point dots), and the RRF terms are
    computed as floor(1e6 / (60 + rank)) — pure integer floor
    division on both engines — so fusion scores and the fused total
    order (rrf desc, id) are bit-identical. Plan: each retriever's
    top-10 is TakeOrderedAndProject (never a data-sized sort); the
    fusion is a full outer join of two ≤10-row relations with a
    bounded rank window. At 100 TB the retrievers scale as documented
    on their own keys; the fusion cost is constant."""
    from climateiq_pipelines_spark.functions.fixedpoint import _int_dot

    lex = llm_bm25_score(spark, sf_dir).select(
        F.col("doc_id").alias("l_id"), F.col("rank").alias("lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    dscored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _int_dot(F.col("embedding"), F.col("q_emb")).alias("dot_fp"))
    )
    dtop = dscored.orderBy(F.desc("dot_fp"), F.asc("vec_id")).limit(
        _BM25_TOPK
    )
    drw = W.orderBy(F.desc("dot_fp"), F.asc("vec_id"))
    dense = dtop.withColumn("dense_rank", F.row_number().over(drw)).select(
        F.col("vec_id").alias("d_id"), "dense_rank"
    )
    fused = lex.join(dense, lex["l_id"] == dense["d_id"], "full_outer")
    term = lambda c: F.coalesce(  # noqa: E731 — tiny local shorthand
        F.expr(f"1000000 div ({_RRF_K} + {c})"), F.lit(0)
    )
    rrf = (term("lex_rank") + term("dense_rank")).cast("long")
    staged = fused.select(
        F.coalesce(F.col("l_id"), F.col("d_id")).alias("id"),
        F.col("lex_rank").cast("int"),
        F.col("dense_rank").cast("int"),
        rrf.alias("rrf_micro"),
    )
    fw = W.orderBy(F.desc("rrf_micro"), F.asc("id"))
    return staged.withColumn(
        "fused_rank", F.row_number().over(fw).cast("int")
    )
