"""Round-3 TPC-H composite extensions (Q7 / Q10 / Q12 shapes) — loaded
after the driver's 50-entry correctness window (plans.load_all);
covered by tools/driver_sim.py.

Same discipline as operators/queries_tpch.py: parameters adapted to the
fixture's value ranges (nations are NATION_0..24, dates 1995-2001, no
l_shipmode/l_commitdate columns — Q12 substitutes the return flag as
its category axis and keeps the canonical conditional-count shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.helpers import (
    REVENUE,
    dsum,
    dsum_merge,
    micros,
    revenue_col,
    sql_dsum,
)
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(REVENUE)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_10')
        OR (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_12'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between a nation
    PAIR in either direction, per shipment year — the classic
    double-dimension join with a symmetric OR predicate.

    Plan: nation (25 rows) broadcasts twice under different aliases;
    supplier and the filtered fact chain shuffle on their FK keys; the
    OR pair predicate is applied after both nation joins (Catalyst
    cannot split it into per-scan filters without losing the cross
    pairing, but the two n_name IN (pair) halves DO push into each
    broadcast side as derived filters). Year extraction is exact
    integer date arithmetic in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ["NATION_12", "NATION_10"]  # probed: nonempty at sf0.001
    sn = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        # Round 15: TWO-LEVEL exact sum (helpers module docstring) —
        # the nation-pair × year groups are fact-fraction-sized, so
        # the single-level long-micro accumulator carries the 2^63
        # ceiling; micros pre-sum per (pair, year, partition), then
        # the tiny partials relation merges as decimal(38,0).
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            F.spark_partition_id().alias("_pid"),
        )
        .agg(F.sum(micros(revenue_col())).alias("p_rev"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_merge("p_rev", "revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum(REVENUE)} AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): customers who returned the
    most revenue in one half-year window, top 20 — the
    customer-attribution shape (fact filtered two ways, rolled up to
    the customer grain, bounded tail).

    Plan: both date and returnflag predicates push to their scans;
    nation broadcasts; the order/lineitem chain shuffles on its FK
    keys; TakeOrderedAndProject bounds the result. Revenue is the
    shared fixed-point sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(revenue_col(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ONE query text for BOTH entry APIs (round-13 review batch F: the
# oracle literal and the spark.sql body were the same ~15 lines
# maintained twice, differing only in table names — an edit to one
# copy compiled cleanly and surfaced only as an unattributed hash
# mismatch; the key's entire point is that both APIs compile the one
# query).
_Q22_SQL = """
    WITH thresh AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_bal
      FROM {cust} WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_bal
    FROM {cust}, thresh
    WHERE c_acctbal > thresh.avg_bal
      AND NOT EXISTS (SELECT 1 FROM {ord}
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """


@register(
    "q22_global_sales_opportunity",
    oracle=_Q22_SQL.format(cust="customer", ord="orders"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity) — and the repo's
    SQL-SURFACE demonstration: the whole query is ONE spark.sql()
    string over temp views, exercising a scalar aggregate subquery
    (above-average balance threshold) and NOT EXISTS (customers with no
    URGENT orders — probed nonempty at sf0.001; every fixture customer
    has SOME order), which Catalyst rewrites to the same broadcast/anti-join
    physical shapes the DataFrame keys pin. Both entry APIs compile to
    the one Catalyst IR — this key proves the SQL door is open.

    Exactness: the threshold is an exact fixed-point mean
    (sum of floor(bal·100) int64s / 100 / count) — a naive AVG(double)
    differs across engines in the last ulp, which could flip a
    boundary customer. Temp-view names carry a per-call token so
    concurrent sessions never collide.

    Plan: customer scans once per side but both with pushed
    projections; the scalar subquery broadcasts as a 1-row cross; the
    NOT EXISTS becomes a left-anti hash join keyed on custkey."""
    import uuid

    from climateiq_pipelines_spark.session import register_temp_view

    token = uuid.uuid4().hex[:12]
    # Registered for post-consumption reclaim (round-13 review batch F:
    # the per-call uuid names defeated replace-reuse AND bypassed the
    # batch-C SESSION_TEMP_VIEWS discipline — 2 dead catalog entries
    # per evaluation for the session lifetime).
    cust_v = register_temp_view(f"cps_q22_cust_{token}")
    ord_v = register_temp_view(f"cps_q22_ord_{token}")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(cust_v)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ord_v)
    return spark.sql(_Q22_SQL.format(cust=cust_v, ord=ord_v))


@register(
    "q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority), adapted:
    the fixture carries no l_shipmode/l_commitdate, so the category
    axis is l_returnflag and the late-commit predicate is dropped —
    what remains is Q12's essence: fact⋈fact join + per-category
    CONDITIONAL COUNTS over a priority class split.

    Plan: the ship-date band pushes to the lineitem scan; one shuffle
    joins orders (the priority carrier) to the filtered lineitems; the
    conditional counts are a single partial+final aggregate (two
    codegen'd count-if accumulators, no second pass)."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )
