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
    # r16: the pair sample is decided ENTIRELY by doc_id (mod-slice +
    # ordered LIMIT), so only docs in either residue class can ever
    # reach the output — pushing the OR-of-mods predicate into the
    # documents scan drops ~97.8% of the corpus before the explode and
    # the 16-seed md5 aggregate (guide §1.2: don't compute what you
    # throw away). The sa/sb filters below still select the exact same
    # rows; every downstream relation is unchanged.
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % _A_MOD == 0) | (F.col("doc_id") % _B_MOD == 1)
    )
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


# --- agg_cms_heavy_hitters ---------------------------------------------
_CMS_EPS = 0.001  # width guarantee: est <= exact + eps * N
_CMS_CONF = 0.99
_CMS_SEED = 42

_CMS_TOPK = 16  # report bounded to the top-K heavy hitters

_CMS_ORACLE = f"""
    SELECT event_type, exact_count,
           TRUE AS never_underestimates,
           TRUE AS within_eps_n,
           TRUE AS merged_never_underestimates
    FROM (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM events GROUP BY event_type
      ORDER BY exact_count DESC, event_type
      LIMIT {_CMS_TOPK}
    )
"""


@register("agg_cms_heavy_hitters", oracle=_CMS_ORACLE)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan 2005):
    per-event-type frequency estimates from a fixed-size CMS (eps =
    {_CMS_EPS}, confidence = {_CMS_CONF}, seeded), checked against the
    exact counts via the sketch's two PROVABLE properties — estimates
    NEVER underestimate, and (with the seeded hash family,
    deterministically on this fixture) stay within eps*N of exact —
    plus the MERGE law: two disjoint half-sketches (split on event_id
    parity) merged driver-side must keep the no-underestimate bound.
    The hll_sketch_merge discipline applied to frequency sketches:
    engine-specific estimates stay OUT of the hash; a broken sketch or
    merge flips a boolean.

    Scale: the sketch is the point — a few KB of counters summarizes
    any stream, builds map-side, merges associatively across
    days/segments, and the driver materialization is sketch-sized
    (epsilon/confidence-derived), never data-sized. At 100 TB the
    heavy-hitter query never shuffles raw keys."""
    ev = load_table(spark, sf_dir, "events")
    agg_expr = (
        f"count_min_sketch(event_type, {_CMS_EPS}d, {_CMS_CONF}d,"
        f" {_CMS_SEED})"
    )
    # ONE scan builds all three sketches + the grand total: aggregate
    # FILTER clauses replace three separate filtered passes (round-12
    # review: the old shape ran five independent actions over the raw
    # events source — five full scans per evaluation).
    agg_row = ev.agg(
        F.expr(agg_expr).alias("s_full"),
        F.expr(
            f"{agg_expr} FILTER (WHERE event_id % 2 = 0)"
        ).alias("s_a"),
        F.expr(
            f"{agg_expr} FILTER (WHERE event_id % 2 = 1)"
        ).alias("s_b"),
        F.count(F.lit(1)).alias("n"),
    ).first()

    def sketch_from(blob):
        # sketch-sized payloads, deserialized through the engine's own
        # codec.
        jvm = spark._jvm
        return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(blob))
        )

    full = sketch_from(agg_row["s_full"])
    half_a = sketch_from(agg_row["s_a"])
    half_b = sketch_from(agg_row["s_b"])
    half_a.mergeInPlace(half_b)
    # Bounded driver materializations only: the heavy-hitter report is
    # top-{_CMS_TOPK} by construction (take of a TakeOrdered), and the
    # grand total rode the sketch aggregate — both model/catalog-sized.
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("event_type"))
        .take(_CMS_TOPK)
    )
    n_total = int(agg_row["n"])
    slack = int(_CMS_EPS * n_total) + 1
    rows = []
    for r in exact:
        t, c = r["event_type"], int(r["exact_count"])
        est = full.estimateCount(t)
        est_merged = half_a.estimateCount(t)
        rows.append(
            (t, c, est >= c, est <= c + slack, est_merged >= c)
        )
    return spark.createDataFrame(
        rows,
        "event_type string, exact_count long, never_underestimates "
        "boolean, within_eps_n boolean, merged_never_underestimates "
        "boolean",
    )


# --- agg_theta_set_algebra ---------------------------------------------
_THETA_A = "1-URGENT"
_THETA_B = "2-HIGH"

_THETA_ORACLE = f"""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '{_THETA_A}'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '{_THETA_B}')
    SELECT 'A' AS measure,
           CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_distinct,
           TRUE AS approx_within_5pct
    UNION ALL SELECT 'B', (SELECT COUNT(*) FROM b), TRUE
    UNION ALL SELECT 'A_union_B',
        (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)),
        TRUE
    UNION ALL SELECT 'A_intersect_B',
        (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)),
        TRUE
    UNION ALL SELECT 'A_minus_B',
        (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)),
        TRUE
"""


@register("agg_theta_set_algebra", oracle=_THETA_ORACLE)
def agg_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA SKETCH SET ALGEBRA (DataSketches theta): distinct-count
    estimates for two customer slices AND their union, intersection,
    and difference — computed entirely on the sketches
    (theta_union / theta_intersection / theta_difference), never
    re-touching rows. This is the capability HLL structurally lacks
    (HLL unions but cannot intersect); theta's hash-threshold sampling
    supports the full algebra, which is why audience-overlap /
    segment-intersection analytics standardize on it.

    Determinism: theta sampling is a pure keyed-hash threshold (fixed
    library seed) — NO per-run randomness (contrast KLL, excluded for
    exactly that reason), and below the nominal entries bound the
    sketch is exact; the 5%%-band booleans are stable at every fixture
    SF and partitioning. Engine-specific estimates stay out of the
    hash (the HLL/CMS discipline); the oracle carries DuckDB's exact
    set-op counts.

    Scale: each slice's sketch builds map-side and merges
    associatively; the entire 5-measure report reads off two KB-sized
    binaries — segment-overlap questions at 100 TB cost one scan for
    ALL segments at once (groupBy segment + theta_sketch_agg), then
    pure sketch algebra per pair."""
    orders = load_table(spark, sf_dir, "orders")
    sk = orders.agg(
        F.expr(
            f"theta_sketch_agg(CASE WHEN o_orderpriority = '{_THETA_A}'"
            " THEN o_custkey END)"
        ).alias("sa"),
        F.expr(
            f"theta_sketch_agg(CASE WHEN o_orderpriority = '{_THETA_B}'"
            " THEN o_custkey END)"
        ).alias("sb"),
    )
    # ONE action reads all five estimates off the 1-row sketch frame
    # (round-12 review: the old shape cross-joined the UN-materialized
    # sketch subtree once per measure and unioned — one evaluation
    # scanned orders ~13 times).
    est_row = sk.select(
        F.expr("theta_sketch_estimate(sa)").alias("est_a"),
        F.expr("theta_sketch_estimate(sb)").alias("est_b"),
        F.expr("theta_sketch_estimate(theta_union(sa, sb))").alias("est_u"),
        F.expr("theta_sketch_estimate(theta_intersection(sa, sb))").alias(
            "est_i"
        ),
        F.expr("theta_sketch_estimate(theta_difference(sa, sb))").alias(
            "est_d"
        ),
    ).first()
    # All five EXACT set-op counts from ONE per-customer membership
    # aggregate (A, B, A∪B, A∩B, A∖B are pure boolean algebra over the
    # per-key flags) — one scan + one custkey shuffle, replacing five
    # separate distinct/intersect/except plans.
    flags = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == _THETA_A).cast("int")).alias(
            "in_a"
        ),
        F.max((F.col("o_orderpriority") == _THETA_B).cast("int")).alias(
            "in_b"
        ),
    )
    ex_row = flags.agg(
        F.sum("in_a").cast("long").alias("xa"),
        F.sum("in_b").cast("long").alias("xb"),
        F.sum(F.greatest("in_a", "in_b")).cast("long").alias("xu"),
        F.sum(F.least("in_a", "in_b")).cast("long").alias("xi"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("xd"),
    ).first()
    # Model-sized assembly (the agg_cms_heavy_hitters pattern): both
    # sides are 1-row; IEEE double arithmetic on the driver matches the
    # old in-plan expressions bit-for-bit.
    measures = [
        ("A", int(ex_row["xa"]), float(est_row["est_a"])),
        ("B", int(ex_row["xb"]), float(est_row["est_b"])),
        ("A_union_B", int(ex_row["xu"]), float(est_row["est_u"])),
        ("A_intersect_B", int(ex_row["xi"]), float(est_row["est_i"])),
        ("A_minus_B", int(ex_row["xd"]), float(est_row["est_d"])),
    ]
    rows = [
        (name, exact, abs(est - exact) <= 0.05 * exact)
        for name, exact, est in measures
    ]
    return spark.createDataFrame(
        rows,
        "measure string, exact_distinct long, approx_within_5pct boolean",
    )
