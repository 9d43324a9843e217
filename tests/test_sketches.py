"""agg_hll_sketch_merge is rows-only for the driver (sketch estimates
are engine-specific), so pin its accuracy contract here: every
per-priority DataSketches HLL estimate, and the merged-union ALL
estimate, must sit within 5% of the exact distinct count."""

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
