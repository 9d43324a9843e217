"""The sketch keys emit their accuracy contracts as SQL-checkable
booleans (the sketch VALUES are engine-specific, so the band — not the
estimate — is the cross-engine contract; see each key's docstring).
These tests re-derive the same bands independently against DuckDB's
exact order statistics / distinct counts, so a regression that somehow
kept the boolean TRUE while breaking the estimate would still surface:

- agg_hll_sketch_merge: every per-priority DataSketches HLL estimate,
  and the merged-union ALL estimate, within 5% of the exact count.
- agg_approx_count_distinct: every per-type HLL++ (rsd=0.01) estimate
  within 5% of DuckDB's exact distinct count.
- agg_approx_percentile: every approximate quantile within the
  Greenwald-Khanna rank-error bound of the TRUE quantile, measured
  against DuckDB's exact order statistics (a tolerance-banded oracle —
  quantified correctness, not just "ran")."""

from __future__ import annotations

from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_MED, SF_SMALL


def test_hll_estimates_within_5pct(spark, duck_med):
    pdf = QUERIES["agg_hll_sketch_merge"](spark, SF_MED).toPandas()
    per = pdf[pdf["o_orderpriority"] != "ALL"]
    assert len(per) >= 3
    assert per["approx_within_5pct"].all(), pdf
    # independent exact-count check against DuckDB
    for _, row in per.iterrows():
        exact, = duck_med.execute(
            "SELECT COUNT(DISTINCT o_custkey) FROM orders "
            "WHERE o_orderpriority = ?",
            [row["o_orderpriority"]],
        ).fetchone()
        assert row["exact_distinct"] == exact, dict(row)
    merged = pdf[pdf["o_orderpriority"] == "ALL"]
    assert len(merged) == 1 and merged["approx_within_5pct"].all(), pdf
    overall_exact, = duck_med.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()
    assert int(merged["exact_distinct"].iloc[0]) == overall_exact


def test_approx_count_distinct_within_5pct(spark, duck_med):
    """The registered key's boolean band, plus an independent re-check:
    the raw rsd=0.01 estimate itself (recomputed here, since the key
    emits only the band verdict) must sit within 5% of DuckDB's exact
    distinct user count."""
    pdf = QUERIES["agg_approx_count_distinct"](spark, SF_MED).toPandas()
    assert len(pdf) >= 3
    assert pdf["approx_within_5pct"].all(), pdf
    est = {
        r["event_type"]: r["approx"]
        for r in load_table(spark, SF_MED, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx"))
        .collect()
    }
    for _, row in pdf.iterrows():
        exact, = duck_med.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = ?",
            [row["event_type"]],
        ).fetchone()
        assert exact > 0 and row["exact_users"] == exact
        assert abs(est[row["event_type"]] - exact) / exact < 0.05, dict(row)


def test_approx_percentile_within_rank_error_band(spark, duck_med):
    """Spark's approx_percentile(accuracy=10000) guarantees rank error
    <= 1/accuracy. The key emits that band check as booleans; here the
    raw quantile values are recomputed and verified against the exact
    distribution in DuckDB: the empirical rank of each approximate
    quantile value must sit within eps of the target quantile (eps =
    1/10000 plus one discrete step 1/n for the order-statistic
    granularity of small groups)."""
    pdf = QUERIES["agg_approx_percentile"](spark, SF_MED).toPandas()
    assert len(pdf) >= 3
    assert pdf["p50_ok"].all() and pdf["p90_ok"].all(), pdf
    approx = {
        r["o_orderpriority"]: (r["p50"], r["p90"])
        for r in load_table(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.5, 0.9), 10000)"
            ).alias("ap")
        )
        .select(
            "o_orderpriority",
            F.col("ap")[0].alias("p50"),
            F.col("ap")[1].alias("p90"),
        )
        .collect()
    }
    for _, row in pdf.iterrows():
        pri = row["o_orderpriority"]
        n, = duck_med.execute(
            "SELECT COUNT(*) FROM orders WHERE o_orderpriority = ?", [pri]
        ).fetchone()
        assert n == row["n_orders"]
        for v, q in zip(approx[pri], (0.5, 0.9)):
            v = float(v)
            # rank band of v: [#(x < v), #(x <= v)] / n
            lo, hi = duck_med.execute(
                "SELECT COUNT(*) FILTER (WHERE o_totalprice < ?), "
                "COUNT(*) FILTER (WHERE o_totalprice <= ?) "
                "FROM orders WHERE o_orderpriority = ?",
                [v, v, pri],
            ).fetchone()
            eps = 1.0 / 10000 + 1.0 / n
            assert lo / n - eps <= q <= hi / n + eps, (pri, v, lo, hi, n)


def test_cms_heavy_hitters_exact_counts_and_bounds(spark):
    """Exact counts re-derived in pandas; every sketch boolean must be
    true (no-underestimate is a hard CMS guarantee, the eps*N band is
    deterministic under the fixed seed)."""
    ev = load_table(spark, SF_SMALL, "events").select("event_type").toPandas()
    exact = ev["event_type"].value_counts().to_dict()
    pdf = QUERIES["agg_cms_heavy_hitters"](spark, SF_SMALL).toPandas()
    assert {r["event_type"]: int(r["exact_count"]) for _, r in pdf.iterrows()} == {
        k: int(v) for k, v in exact.items()
    }
    for col in (
        "never_underestimates",
        "within_eps_n",
        "merged_never_underestimates",
    ):
        assert pdf[col].all(), col


def test_theta_set_algebra_exact_and_identity(spark):
    """Exact set sizes re-derived in Python sets; all bands true; the
    inclusion-exclusion identity holds on the EXACT side."""
    rows = load_table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    a = {int(r["o_custkey"]) for r in rows if r["o_orderpriority"] == "1-URGENT"}
    b = {int(r["o_custkey"]) for r in rows if r["o_orderpriority"] == "2-HIGH"}
    exp = {
        "A": len(a),
        "B": len(b),
        "A_union_B": len(a | b),
        "A_intersect_B": len(a & b),
        "A_minus_B": len(a - b),
    }
    pdf = QUERIES["agg_theta_set_algebra"](spark, SF_SMALL).toPandas()
    got = {r["measure"]: int(r["exact_distinct"]) for _, r in pdf.iterrows()}
    assert got == exp
    assert pdf["approx_within_5pct"].all()
    assert exp["A_union_B"] == exp["A"] + exp["B"] - exp["A_intersect_B"]
