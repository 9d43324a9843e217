"""Round-6 training-data pipeline extensions: PII redaction and
deterministic shuffle-sharding — two ops every corpus-production
pipeline runs between cleaning and tokenization. Registered after the
driver's 50-entry certification window (plans.load_all);
rotation-targeted for round 7.

Scale notes: redaction is a zero-shuffle map stage (regex evaluated in
the scan's generated code, no Python); shard assignment is one hash
computation plus a shuffle on shard_id, with per-shard positions from a
shard-partitioned window — the state any loader-facing shard writer
needs, parallel across shards, never a global single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

# Shared by the engine and both oracles: RE2-compatible patterns (the
# lowest-common-denominator regex dialect — DuckDB is RE2; these avoid
# every Java-regex-only construct).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\d{3}-\\d{3}-\\d{4}"

# The fixture corpus is PII-free word soup, so both sides INJECT
# deterministic PII first (same expression): every 5th doc gains an
# email, every 7th a phone number. The injection is part of the key's
# definition — what is tested is the REDACTION arithmetic.
_INJECT_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 5 = 0
                   THEN ' contact user' || doc_id || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' call 555-123-4567 today' ELSE '' END
           AS text
    FROM documents
"""


@register(
    "llm_pii_redact",
    oracle=f"""
    WITH injected AS ({_INJECT_SQL}),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones
      FROM injected
    )
    SELECT doc_id, md5(clean) AS clean_digest,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           (n_emails = 0 AND n_phones = 0) AS was_clean
    FROM red
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION — the compliance pass of a corpus pipeline:
    replace email addresses and phone numbers with typed placeholder
    tokens and count what was removed, per document. The fixture
    corpus is PII-free, so the key deterministically injects PII into
    a subset of docs first (same expression on both engines — the
    redaction arithmetic is what's under test): every 5th doc an
    email, every 7th a phone number (35th: both).

    Patterns are written in the RE2-compatible subset so Spark's Java
    regex and DuckDB's RE2 agree character-for-character; the digest
    of the redacted text pins the FULL output string, not just counts.
    Plan: a zero-shuffle map stage — regexp_replace/regexp_count run
    inside whole-stage codegen over the scan; nothing crosses to
    Python and nothing reshuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567 today")
            ).otherwise(""),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    n_emails = F.regexp_count(F.col("text"), F.lit(_EMAIL_RE))
    n_phones = F.regexp_count(F.col("text"), F.lit(_PHONE_RE))
    return injected.select(
        "doc_id",
        F.md5(clean).alias("clean_digest"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        ((n_emails == 0) & (n_phones == 0)).alias("was_clean"),
    )


_N_SHARDS = 8


@register(
    "llm_shuffle_shard",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR) || ':42') AS k
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, n_chars, k,
             ascii(substr(k, 32, 1)) % {_N_SHARDS} AS shard_id
      FROM keyed
    )
    SELECT doc_id, CAST(shard_id AS INTEGER) AS shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id ORDER BY k)
                AS BIGINT) AS pos_in_shard,
           n_chars
    FROM sharded
    """,
)
def llm_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC SHUFFLE + SHARDING — the step that turns a cleaned
    corpus into loader-ready shards: every doc gets a pseudo-random but
    SEEDED order key (md5 of doc_id:seed — reproducible across runs and
    engines, no RNG), a shard assignment derived from the key, and its
    position within the shard. Re-running with the same seed yields the
    identical byte order — the reproducibility property training infra
    actually needs from "shuffle the data".

    The shard hash (last hex nibble mod 8) is the cross-engine-portable
    DEMO spread — 16 hex values fold uniformly onto 8 shards; a
    production run would widen to 1024+ shards with any keyed hash.
    Plan: one md5 projection, one shuffle on shard_id, and a
    shard-PARTITIONED row_number — per-shard linear state, parallel
    across shards, never a global single-partition sort (the same
    discipline as sort_multikey_scalable)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias(
            "k"
        ),
    )
    sharded = keyed.withColumn(
        "shard_id", (F.ascii(F.substring("k", 32, 1)) % _N_SHARDS)
    )
    w = W.partitionBy("shard_id").orderBy("k")
    return sharded.select(
        "doc_id",
        F.col("shard_id").cast("int").alias("shard_id"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
        "n_chars",
    )


_SEMDEDUP_TAU_FP = 3 * 10**11  # cos >= 0.30 in the 1e12 fixed-point dot


def _semdedup_oracle() -> str:
    from climateiq_pipelines_spark.operators.llm import _sql_int_dot

    dot = _sql_int_dot("a.embedding", "b.embedding")
    return f"""
    WITH dup_counts AS (
      SELECT b.vec_id,
             COUNT(*) AS n_earlier_dups,
             MAX({dot}) AS max_dot
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {dot} >= {_SEMDEDUP_TAU_FP}
      GROUP BY b.vec_id
    )
    SELECT e.vec_id,
           e.label AS cluster_id,
           coalesce(d.n_earlier_dups, 0) AS n_earlier_dups,
           round(coalesce(d.max_dot, 0) / 1000000000000.0, 6)
             AS max_earlier_sim,
           d.vec_id IS NULL AS kept
    FROM embeddings e LEFT JOIN dup_counts d ON e.vec_id = d.vec_id
    """


@register("llm_semdedup", oracle=_semdedup_oracle())
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023): prune
    documents that are semantically redundant — near-identical in
    embedding space — KEEPING one representative per near-dup set. The
    paper's two-stage shape: (1) cluster the corpus so similarity is
    only ever computed WITHIN a cluster, (2) inside each cluster drop
    every point whose cosine to an already-kept (here: lower-vec_id)
    point exceeds tau. The fixture's `label` column is the stage-1
    cluster assignment (a production run materializes it with
    `llm_kmeans_iterate` / `llm_centroid_assign` first — composing the
    two registered keys IS the full paper pipeline).

    Per vector the key emits its cluster, how many earlier in-cluster
    near-dups it has, the strongest such similarity, and the `kept`
    survivor verdict (kept := no earlier in-cluster neighbor at
    cos >= 0.30). Keep-lowest-id is the deterministic stand-in for the
    paper's keep-one policy — engine-orderable, unlike "keep random".

    Exactness: similarities are exact int64 fixed-point dots
    (llm._int_dot, Σ floor(x·y·1e12) — unit-norm fixture vectors make
    dot == cosine), so the tau cut and both aggregates are bit-stable
    cross-engine; the only float output is one exact int→double round.

    Scale: the self-join shuffles on `label` once and is quadratic in
    CLUSTER size only — the paper's point: k grows with n (k ∝ n keeps
    expected cluster size constant, |pairs| ≈ n·c/2), so 100 TB never
    sees an all-pairs product. The left join back is on vec_id, and
    the dup-count side is at most one row per vector."""
    from climateiq_pipelines_spark.operators.llm import _S12, _int_dot

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
    )
    b = emb.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = (
        a.join(b, "l")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dot_fp", _int_dot(F.col("a_emb"), F.col("b_emb")))
        .filter(F.col("dot_fp") >= F.lit(_SEMDEDUP_TAU_FP))
    )
    dup_counts = pairs.groupBy(F.col("b_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_earlier_dups"),
        F.max("dot_fp").alias("max_dot"),
    )
    return (
        emb.select("vec_id", F.col("label").alias("cluster_id"))
        .join(dup_counts, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(F.col("n_earlier_dups"), F.lit(0)).alias(
                "n_earlier_dups"
            ),
            F.round(
                F.coalesce(F.col("max_dot"), F.lit(0)) / F.lit(float(_S12)), 6
            ).alias("max_earlier_sim"),
            F.col("n_earlier_dups").isNull().alias("kept"),
        )
    )
