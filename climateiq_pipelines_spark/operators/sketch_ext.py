"""Round-7 sketch-accuracy extension: the MinHash JACCARD ESTIMATOR
itself, cross-engine-checked. The near-dup keys (llm_minhash_neardup /
llm_minhash_lsh) use MinHash only to PRUNE and then verify exactly, so
nothing in the surface previously pinned the estimator's arithmetic —
the property production systems rely on when they *skip* the exact
verify (estimate-then-threshold at petabyte scale).

Portability trick: signatures are min() over md5 HEX STRINGS of
seed-prefixed tokens — both engines produce identical lowercase-hex
md5, and VARCHAR min is plain byte order on hex, so the 16 per-seed
minima (and therefore the agreement counts) are bit-identical
cross-engine without any shared 64-bit hash function. This is a real
MinHash family: each seed prefix defines an independent random
permutation of the token universe via the hash.

Registered after the driver's 50-entry certification window
(plans.load_all); rotation-targeted for round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

_N_SEEDS = 16
_A_MOD, _B_MOD = 97, 89  # deterministic disjoint-ish doc slices
_PAIR_K = 8  # constant per-side sample size — pair count is 64 at ANY SF


def _est_oracle() -> str:
    sig_cols = ", ".join(
        f"min(md5('{s}:' || token)) AS mh{s}" for s in range(_N_SEEDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh{s} = b.mh{s} THEN 1 ELSE 0 END"
        for s in range(_N_SEEDS)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    sigs AS (
      SELECT doc_id, COUNT(*) AS n_toks, {sig_cols}
      FROM toks GROUP BY doc_id
    ),
    sa AS (
      SELECT * FROM sigs WHERE doc_id % {_A_MOD} = 0
      ORDER BY doc_id LIMIT {_PAIR_K}
    ),
    sb AS (
      SELECT * FROM sigs WHERE doc_id % {_B_MOD} = 1
      ORDER BY doc_id LIMIT {_PAIR_K}
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.n_toks AS a_toks, b.n_toks AS b_toks,
             ({agree}) AS n_agree
      FROM sa a, sb b
      WHERE a.doc_id < b.doc_id
    ),
    overlap AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS n_common
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.a_id
      JOIN toks tb ON tb.doc_id = p.b_id AND tb.token = ta.token
      GROUP BY p.a_id, p.b_id
    )
    SELECT p.a_id, p.b_id,
           CAST(p.n_agree AS INTEGER) AS n_agree,
           (COALESCE(o.n_common, 0) * 1000000)
             // (p.a_toks + p.b_toks - COALESCE(o.n_common, 0))
             AS jaccard_micro,
           (p.n_agree * 1000000) // {_N_SEEDS} AS estimate_micro,
           abs((COALESCE(o.n_common, 0) * 1000000)
               // (p.a_toks + p.b_toks - COALESCE(o.n_common, 0))
               - (p.n_agree * 1000000) // {_N_SEEDS}) AS abs_err_micro
    FROM pairs p LEFT JOIN overlap o
      ON o.a_id = p.a_id AND o.b_id = p.b_id
    """


@register("llm_minhash_jaccard_estimate", oracle=_est_oracle())
def llm_minhash_jaccard_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MINHASH JACCARD ESTIMATION, checked against exact Jaccard — the
    arithmetic petabyte pipelines use when they threshold on the
    ESTIMATE instead of verifying exactly (E[agreement/k] = J; 16 seeds
    give 1/16 resolution). Per sampled pair: the exact set Jaccard
    (integer micros, the llm_minhash_neardup formula), the 16-seed
    estimate, and the absolute error — all integer-exact, so both
    engines agree bit-for-bit on estimator AND truth.

    The pair SAMPLE is a constant-size harness: each side is a
    mod-sliced, doc_id-ordered LIMIT 8 (TakeOrderedAndProject at any
    scale), so the cross join is 8×8 forever — the estimator itself is
    O(k) per pair and the signatures are one hash aggregate over the
    token relation (the llm_minhash_lsh plan with md5-string minima
    instead of xxhash64: strings shuffle a bit heavier, which is why
    the PRUNING keys use xxhash64 — here the string form buys an
    engine-portable estimator check).

    Scale: one (doc_id)-keyed aggregate builds all 16 minima in one
    pass (map-side combined); the exact-overlap side only touches the
    ≤16 sampled docs' tokens (semi-join pushdown via the bounded pair
    frame)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    sigs = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("token")))).alias(
                f"mh{s}"
            )
            for s in range(_N_SEEDS)
        ],
    )
    sa = (
        sigs.filter(F.col("doc_id") % _A_MOD == 0)
        .orderBy("doc_id")
        .limit(_PAIR_K)
    )
    sb = (
        sigs.filter(F.col("doc_id") % _B_MOD == 1)
        .orderBy("doc_id")
        .limit(_PAIR_K)
    )
    a = sa.select(
        F.col("doc_id").alias("a_id"),
        F.col("n_toks").alias("a_toks"),
        *[F.col(f"mh{s}").alias(f"a_mh{s}") for s in range(_N_SEEDS)],
    )
    b = sb.select(
        F.col("doc_id").alias("b_id"),
        F.col("n_toks").alias("b_toks"),
        *[F.col(f"mh{s}").alias(f"b_mh{s}") for s in range(_N_SEEDS)],
    )
    agree = sum(
        F.when(F.col(f"a_mh{s}") == F.col(f"b_mh{s}"), 1).otherwise(0)
        for s in range(_N_SEEDS)
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_toks", "b_toks", agree.alias("n_agree"))
    )
    ta = toks.select(F.col("doc_id").alias("a_id"), "token")
    tb = toks.select(F.col("doc_id").alias("b_id"), "token")
    overlap = (
        pairs.select("a_id", "b_id")
        .join(ta, "a_id")
        .join(tb, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = pairs.join(overlap, ["a_id", "b_id"], "left").withColumn(
        "n_common", F.coalesce(F.col("n_common"), F.lit(0))
    )
    jac = F.expr(
        "(n_common * 1000000) div (a_toks + b_toks - n_common)"
    )
    est = F.expr(f"(n_agree * 1000000) div {_N_SEEDS}")
    return j.select(
        "a_id",
        "b_id",
        F.col("n_agree").cast("int").alias("n_agree"),
        jac.alias("jaccard_micro"),
        est.alias("estimate_micro"),
        F.abs(jac - est).alias("abs_err_micro"),
    )
