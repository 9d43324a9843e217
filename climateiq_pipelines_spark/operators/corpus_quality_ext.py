"""Round-7 corpus-quality extensions: GOPHER-rule document filtering
(Rae et al. 2021, "Scaling Language Models", Appendix A), TEMPERATURE-
scaled language mixture sampling (Conneau et al. 2020, XLM-R §3.1 /
Lample & Conneau 2019), and maximal DUPLICATE-SUBSTRING span detection
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — the ExactSubstr step, re-expressed relationally).

Registered after the driver's 50-entry certification window
(plans.load_all); covered by tools/driver_sim.py; rotation-targeted for
round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.textgrams import word_shingles
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table, widen_if_narrow

# --- llm_gopher_quality -------------------------------------------------
# Gopher's rule set targets web text (50..100k words, mean word length
# 3..10, symbol ratios, bullet ratios, >=2 stop words). The fixture
# corpus is synthetic lowercase prose with 10..99-word docs and no
# punctuation, so the numeric bounds are rescaled to the fixture's range
# and the stop-word list maps to the corpus's function-word analogues —
# the RULE SHAPES (count band, length band, containment) are the
# paper's; the constants are corpus-specific exactly as they are in
# production (every lab retunes them per corpus).
_MIN_WORDS = 20
_MAX_WORDS = 95
_MIN_MWL_MICROS = 3_000_000  # mean word length >= 3.0 chars
_MAX_MWL_MICROS = 10_000_000  # mean word length <= 10.0 chars
_STOPWORDS = ("the", "a", "value", "data")  # fixture function words
_MIN_STOP_DISTINCT = 2

_GOPHER_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(replace(text, ' ', '')) AS word_chars
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(floor(word_chars * 1000000.0 / len(w)) AS BIGINT)
               AS mwl_micros,
             CAST(list_max(list_transform(w, x -> len(x))) AS BIGINT)
               AS max_word_len,
             CAST(len(list_filter(
                 ['the', 'a', 'value', 'data'],
                 s -> list_contains(w, s))) AS BIGINT) AS n_stop_distinct
      FROM t
    )
    SELECT doc_id, n_words, mwl_micros, max_word_len, n_stop_distinct,
           (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS})
           AND (mwl_micros BETWEEN {_MIN_MWL_MICROS} AND {_MAX_MWL_MICROS})
           AND (n_stop_distinct >= {_MIN_STOP_DISTINCT}) AS keep
    FROM m
"""


@register("llm_gopher_quality", oracle=_GOPHER_ORACLE)
def llm_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER QUALITY RULES (Rae et al. 2021 App. A): per-document
    rule metrics — word count, mean word length, max word length,
    distinct stop-word containment — and the conjunction `keep` flag
    that the pretraining pipeline filters on. The paper's symbol-ratio
    and bullet-line rules are vacuous on the fixture's punctuation-free
    synthetic prose and are deliberately omitted (they would be
    constant-true columns, i.e. padding).

    Exactness: every metric is integer arithmetic — mean word length is
    floor(word_chars * 1e6 / n_words) (one double multiply+divide on
    exact integers, floored — bit-identical cross-engine); the flag is
    a boolean conjunction of integer range checks.

    Scale: a single narrow projection over documents — no shuffle, no
    UDF, fully codegen'd (split / transform / filter / array_contains).
    At 100 TB this is the canonical map-only quality pass: it pipelines
    with the scan, and the `keep` flag predicate-pushes into downstream
    reads when materialized as a partition column."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_words = F.size(w).cast("long")
    word_chars = F.length(F.regexp_replace(F.col("text"), " ", ""))
    mwl = F.floor(word_chars * F.lit(1000000.0) / F.size(w)).cast("long")
    max_wl = F.array_max(F.transform(w, lambda x: F.length(x))).cast("long")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _STOPWORDS]),
            lambda s: F.array_contains(w, s),
        )
    ).cast("long")
    keep = (
        n_words.between(_MIN_WORDS, _MAX_WORDS)
        & mwl.between(_MIN_MWL_MICROS, _MAX_MWL_MICROS)
        & (n_stop >= _MIN_STOP_DISTINCT)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mwl_micros"),
        max_wl.alias("max_word_len"),
        n_stop.alias("n_stop_distinct"),
        keep.alias("keep"),
    )


# --- llm_temperature_mixture -------------------------------------------
# Temperature exponent alpha = 0.5 (T = 2). XLM-R uses alpha = 0.3; 0.5
# is chosen here because p^0.5 = sqrt(p) is an IEEE correctly-rounded
# operation, hence bit-identical across Spark's JVM and DuckDB's libm —
# pow(p, 0.3) is not correctly rounded and may differ in the last ulp
# between implementations, which the strict value comparator would
# reject. The formula and plan are alpha-independent.
_TEMP_SCALE = 1_000_000_000_000  # 1e12 fixed-point for q = sqrt(p)

_TEMP_MIXTURE_ORACLE = f"""
    WITH stats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    shares AS (
      SELECT lang, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)
                             / SUM(n_tokens) OVER ()) * {_TEMP_SCALE})
                  AS BIGINT) AS q_fp
      FROM stats
    )
    SELECT lang, n_docs, n_tokens,
           CAST(floor(p * 1000000) AS BIGINT) AS token_share_micros,
           CAST(floor(CAST(q_fp AS DOUBLE) / SUM(q_fp) OVER () * 1000000)
                AS BIGINT) AS temp_share_micros,
           CAST(floor((CAST(q_fp AS DOUBLE) / SUM(q_fp) OVER ()) / p
                      * 1000000) AS BIGINT) AS upsample_micros
    FROM shares
"""


@register("llm_temperature_mixture", oracle=_TEMP_MIXTURE_ORACLE)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED language sampling (XLM-R §3.1): the
    multilingual mixture q_i = p_i^alpha / sum_j p_j^alpha that
    upsamples low-resource languages during pretraining; emitted as
    per-language token share, temperature share, and the upsample
    factor q/p the sampler applies. Complements `llm_mixture_weights`
    (uniform retargeting = the alpha→0 limit); alpha = 0.5 here (see
    module note on why sqrt keeps the check bit-exact).

    Exactness: p divides exact int64 token sums; q is floored to 1e12
    fixed-point BEFORE the normalizing sum, so the denominator is an
    exact integer sum (engine sum order cannot perturb it); the final
    shares are FLOORED INTEGER MICROS like every other metric in this
    module (round-12 review: this was the one key pinning parity on
    round(double, 6) — Spark's BigDecimal HALF_UP vs DuckDB's
    std::round can differ by 1e-6 at half-way ulps, a latent strict-
    comparator break floored micros cannot hit).

    Scale: one hash aggregate over documents (map-side partial), then
    windows over the |langs|-row aggregate — bounded cardinality at any
    corpus size (SURVEY §9.4's bounded-window rule), same shape as
    llm_mixture_weights."""
    stats = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    over_all = W.partitionBy()  # |langs| rows only — bounded
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(over_all)
    with_q = stats.select(
        "lang",
        "n_docs",
        "n_tokens",
        p.alias("p"),
        F.floor(F.sqrt(p) * F.lit(float(_TEMP_SCALE))).cast("long").alias("q_fp"),
    )
    q_share = F.col("q_fp").cast("double") / F.sum("q_fp").over(over_all)
    return with_q.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.floor(F.col("p") * F.lit(1000000)).cast("long").alias(
            "token_share_micros"
        ),
        F.floor(q_share * F.lit(1000000)).cast("long").alias(
            "temp_share_micros"
        ),
        F.floor(q_share / F.col("p") * F.lit(1000000)).cast("long").alias(
            "upsample_micros"
        ),
    )


# --- llm_substring_span_dedup ------------------------------------------
_SPAN_N = 8  # shingle order (words); a span is a diagonal run of matches
_SPAN_MIN_WORDS = 12  # report maximal spans of at least this many words
# run length r of consecutive matching 8-grams covers r + 7 words
_SPAN_MIN_RUN = _SPAN_MIN_WORDS - _SPAN_N + 1

_SPAN_SHINGLE_SQL = f"""
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - {_SPAN_N - 1}),
                                   i -> i)) AS pos, w
      FROM t
    ),
    sh2 AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             list_aggregate(w[pos:pos + {_SPAN_N - 1}], 'string_agg', ' ')
               AS s
      FROM sh
    )
"""

_SPAN_ORACLE = f"""
    WITH {_SPAN_SHINGLE_SQL},
    hits AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
      FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT a_id, b_id, pa, pb, diag,
             pa - row_number() OVER (PARTITION BY a_id, b_id, diag
                                     ORDER BY pa) AS island
      FROM hits
    )
    SELECT a_id, b_id,
           CAST(MIN(pa) AS BIGINT) AS a_start,
           CAST(MIN(pb) AS BIGINT) AS b_start,
           CAST(COUNT(*) + {_SPAN_N - 1} AS BIGINT) AS span_words
    FROM isl
    GROUP BY a_id, b_id, diag, island
    HAVING COUNT(*) >= {_SPAN_MIN_RUN}
"""


@register("llm_substring_span_dedup", oracle=_SPAN_ORACLE)
def llm_substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL DUPLICATE-SUBSTRING spans (Lee et al. 2022's ExactSubstr
    dedup, relational form): for every document pair, every maximal run
    of word positions whose {_SPAN_N}-gram shingles match on the same
    alignment diagonal (pa - pb constant, pa consecutive) — i.e. every
    shared verbatim word span — reported with start offsets and span
    length, kept when the span covers >= {_SPAN_MIN_WORDS} words. The
    suffix-array step of the paper becomes shingle-equality + a
    gaps-and-islands pass: a run of r consecutive matching {_SPAN_N}-
    grams IS a shared span of r + {_SPAN_N - 1} words.

    r17 OPTIMIZATION — the self-join key is the {_SPAN_MIN_WORDS}-gram
    ANCHOR, not the raw {_SPAN_N}-gram (guide §2.3/§3: shuffle fewer
    bytes, prune the join's candidate mass losslessly). Equivalence
    (exact, by construction): a {_SPAN_MIN_WORDS}-gram at position p
    matches on diagonal d iff {_SPAN_N}-grams p..p+{_SPAN_MIN_RUN - 1}
    all match on d (the overlapping-window identity), so a MAXIMAL run
    of r >= {_SPAN_MIN_RUN} consecutive matching {_SPAN_N}-grams on a
    diagonal is EXACTLY a maximal run of r - {_SPAN_MIN_RUN - 1}
    consecutive matching {_SPAN_MIN_WORDS}-grams there — maximality
    carries both ways (one more {_SPAN_N}-gram match at either end
    would extend the {_SPAN_MIN_WORDS}-gram run and vice versa), the
    run start is the same word position, and span_words =
    count_{_SPAN_MIN_WORDS}grams + {_SPAN_MIN_WORDS - 1}. Sub-
    threshold islands therefore generate NO join hits at all (the old
    form joined every co-occurring {_SPAN_N}-gram position pair and
    discarded short islands only after the window pass), and the
    >= {_SPAN_MIN_WORDS}-word HAVING filter becomes vacuous. A hot
    boilerplate {_SPAN_N}-gram (df quadratic in the posting join at
    100 TB) only survives as a candidate when it extends to a full
    {_SPAN_MIN_WORDS}-word match — the document-frequency-capped
    candidate stage VERDICT r16 asked for, with zero recall loss.
    Property-tested against the {_SPAN_N}-gram form (multiset-equal)
    and oracle-checked at all three SFs (the oracle still runs the
    {_SPAN_N}-gram formulation).

    Plan: anchor shingles via functions.textgrams.word_shingles (a
    ZERO-SHUFFLE map stage over the split array), equality self-join
    on xxhash64(anchor) — 8-byte shuffle keys instead of ~60-byte
    12-word strings (the llm_ngram_jaccard hashed-shingle trade: a
    2^-64 collision could at worst fabricate one span candidate) —
    then one window per (a, b, diagonal) partition over TRUE span
    hits only — island detection is row_number subtraction, the
    win_gap_islands pattern.

    Scale: the self-join carries only positions whose full
    {_SPAN_MIN_WORDS}-word context occurs in >1 document (rare after
    exact dedup, and immune to {_SPAN_N}-gram boilerplate hot keys);
    production salts any residual hot anchors — the same skew
    discipline as llm_ngram_jaccard. Window partitions are per-(pair,
    diagonal), so no global ordering exists anywhere."""
    docs = widen_if_narrow(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
    )
    sh = word_shingles(docs, _SPAN_MIN_WORDS, with_pos=True).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.xxhash64("s").alias("s"),
    )
    a = sh.select(
        F.col("doc_id").alias("a_id"), F.col("pos").alias("pa"), "s"
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("pos").alias("pb"), "s"
    )
    hits = (
        a.join(b, "s")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    iw = W.partitionBy("a_id", "b_id", "diag").orderBy("pa")
    isl = hits.withColumn("island", F.col("pa") - F.row_number().over(iw))
    return (
        isl.groupBy("a_id", "b_id", "diag", "island")
        .agg(
            F.min("pa").cast("long").alias("a_start"),
            F.min("pb").cast("long").alias("b_start"),
            # every island is >= 1 matching anchor = >= _SPAN_MIN_WORDS
            # words, so the old HAVING filter is vacuously true here.
            (F.count(F.lit(1)) + F.lit(_SPAN_MIN_WORDS - 1))
            .cast("long")
            .alias("span_words"),
        )
        .select("a_id", "b_id", "a_start", "b_start", "span_words")
    )


# --- llm_vocab_coverage ------------------------------------------------
_VOCAB_K = 16  # vocabulary size: top-K corpus tokens by frequency

_VOCAB_ORACLE = f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    vocab AS (
      SELECT t FROM (
        SELECT t, COUNT(*) AS n FROM toks GROUP BY t
        ORDER BY n DESC, t
        LIMIT {_VOCAB_K}
      )
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(v.t) AS BIGINT) AS n_in_vocab,
           CAST(floor(COUNT(v.t) * 1000000.0 / COUNT(*)) AS BIGINT)
             AS coverage_micros,
           CAST(COUNT(DISTINCT CASE WHEN v.t IS NULL THEN toks.t END)
                AS BIGINT) AS n_oov_types
    FROM toks LEFT JOIN vocab v ON v.t = toks.t
    GROUP BY lang
"""


@register("llm_vocab_coverage", oracle=_VOCAB_ORACLE)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER VOCABULARY COVERAGE: fix the vocabulary at the corpus
    top-{_VOCAB_K} tokens (count DESC, token ASC — total order) and
    report, per language, total token occurrences, in-vocab
    occurrences, the coverage rate in integer micros, and the count of
    distinct out-of-vocabulary types — the fertility/OOV audit run
    before committing to a tokenizer (high OOV in a slice means the
    vocab under-serves it and its effective sequence length inflates).

    Plan: one token explode feeds BOTH the vocabulary top-K (a bounded
    global TakeOrdered over the type aggregate — K rows out) and the
    per-lang coverage join; the vocab side is {_VOCAB_K} rows, a
    literal-sized broadcast at any corpus size (real vocabs are 32-256K
    rows — still broadcast-sized). The count(DISTINCT CASE ...) OOV
    types ride the same (lang) aggregate.

    Exactness: pure integer counts; coverage is one floored double
    division of exact integers."""
    toks = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("t")
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("t"))
        .limit(_VOCAB_K)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count("in_vocab").cast("long").alias("n_in_vocab"),
            F.floor(
                F.count("in_vocab") * F.lit(1000000.0) / F.count(F.lit(1))
            )
            .cast("long")
            .alias("coverage_micros"),
            F.countDistinct(
                F.when(F.col("in_vocab").isNull(), F.col("t"))
            )
            .cast("long")
            .alias("n_oov_types"),
        )
    )


# --- llm_dataset_split -------------------------------------------------
# The split contract lives in functions/helpers.py (registers nothing)
# with the salt interpolated into the SQL — see the note there.  Local
# underscore aliases keep this module's call sites unchanged.
from climateiq_pipelines_spark.functions.helpers import (  # noqa: E402
    SPLIT_SALT as _SPLIT_SALT,
    SQL_SPLIT_NIBBLE as _SQL_SPLIT_NIBBLE,
)

_SPLIT_ORACLE = f"""
    WITH assigned AS (
      SELECT lang, len(string_split(text, ' ')) AS n_tok,
             CASE WHEN {_SQL_SPLIT_NIBBLE} < 13 THEN 'train'
                  WHEN {_SQL_SPLIT_NIBBLE} = 13 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(floor(COUNT(*) * 1000000.0
                      / SUM(COUNT(*)) OVER (PARTITION BY lang)) AS BIGINT)
             AS lang_share_micros
    FROM assigned GROUP BY lang, split
"""


@register("llm_dataset_split", oracle=_SPLIT_ORACLE)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TRAIN/VAL/TEST split + stratification audit: each
    document is assigned by a salted md5 nibble (~81/6/13) —
    reproducible across runs, machines, and engines, no RNG (the
    llm_shuffle_shard discipline applied to the canonical split step) —
    and the output is the per-(language, split) doc/token counts with
    each split's share WITHIN its language in micros: the audit that
    catches a split that accidentally concentrates a low-resource
    language into val/test. Disjointness and completeness are
    structural (CASE over one hash value).

    Exactness: integer counts; shares are floored double divisions of
    exact integers; the per-lang share window runs over the bounded
    (lang x split) aggregate (<= 15 rows), never data rows.

    Plan: one map-side projection + one hash aggregate — the split
    column is computed, not shuffled into existence; at 100 TB the
    assignment is a pure map over the scan and the audit is a
    |langs x 3|-row result."""
    nib = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + _SPLIT_SALT))),
            1,
            1,
        ),
        16,
        10,
    ).cast("int")
    split = (
        F.when(nib < 13, "train").when(nib == 13, "val").otherwise("test")
    )
    assigned = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        split.alias("split"),
    )
    agg = assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    lang_w = W.partitionBy("lang")  # <= |langs| x 3 rows — bounded
    return agg.select(
        "lang",
        "split",
        "n_docs",
        "n_tokens",
        F.floor(
            F.col("n_docs") * F.lit(1000000.0) / F.sum("n_docs").over(lang_w)
        )
        .cast("long")
        .alias("lang_share_micros"),
    )
