"""The sketch keys are rows-only for the driver (sketch estimates are
engine-specific), so pin their accuracy contracts here instead:

- agg_hll_sketch_merge: every per-priority DataSketches HLL estimate,
  and the merged-union ALL estimate, within 5% of the exact count.
- agg_approx_percentile: every approximate quantile within the
  Greenwald-Khanna rank-error bound of the TRUE quantile, measured
  against DuckDB's exact order statistics (a tolerance-banded oracle —
  quantified correctness, not just "ran")."""

from __future__ import annotations

from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_MED


def test_hll_estimates_within_5pct(spark):
    pdf = QUERIES["agg_hll_sketch_merge"](spark, SF_MED).toPandas()
    per = pdf[pdf["o_orderpriority"] != "ALL"]
    assert len(per) >= 3
    for _, row in per.iterrows():
        exact = row["exact_distinct"]
        assert exact > 0
        assert abs(row["approx_distinct"] - exact) / exact < 0.05, dict(row)
    orders = load_table(spark, SF_MED, "orders")
    overall_exact = orders.select("o_custkey").distinct().count()
    merged = int(pdf[pdf["o_orderpriority"] == "ALL"]["approx_distinct"].iloc[0])
    assert abs(merged - overall_exact) / overall_exact < 0.05


def test_approx_count_distinct_within_5pct(spark, duck_med):
    """approx_count_distinct (HLL++, default rsd=0.05): every per-type
    estimate must sit within 5% of the exact distinct user count —
    the same banded-oracle discipline as the DataSketches key."""
    pdf = QUERIES["agg_approx_count_distinct"](spark, SF_MED).toPandas()
    assert len(pdf) >= 3
    for _, row in pdf.iterrows():
        exact, = duck_med.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = ?",
            [row["event_type"]],
        ).fetchone()
        assert exact > 0
        assert abs(row["approx_users"] - exact) / exact < 0.05, dict(row)


def test_approx_percentile_within_rank_error_band(spark, duck_med):
    """Spark's approx_percentile(accuracy=10000) guarantees rank error
    <= 1/accuracy. Verify against the exact distribution in DuckDB: the
    empirical rank of each approximate quantile value must sit within
    eps of the target quantile (eps = 1/10000 plus one discrete step
    1/n for the order-statistic granularity of small groups)."""
    pdf = QUERIES["agg_approx_percentile"](spark, SF_MED).toPandas()
    assert len(pdf) >= 3
    for _, row in pdf.iterrows():
        pri = row["o_orderpriority"]
        n, = duck_med.execute(
            "SELECT COUNT(*) FROM orders WHERE o_orderpriority = ?", [pri]
        ).fetchone()
        assert n == row["n_orders"]
        for col, q in (("p50_approx", 0.5), ("p90_approx", 0.9)):
            v = float(row[col])
            # rank band of v: [#(x < v), #(x <= v)] / n
            lo, hi = duck_med.execute(
                "SELECT COUNT(*) FILTER (WHERE o_totalprice < ?), "
                "COUNT(*) FILTER (WHERE o_totalprice <= ?) "
                "FROM orders WHERE o_orderpriority = ?",
                [v, v, pri],
            ).fetchone()
            eps = 1.0 / 10000 + 1.0 / n
            assert lo / n - eps <= q <= hi / n + eps, (pri, col, v, lo, hi, n)
