"""Sort / limit / top-k operators (SURVEY.md §2.6) — 4 keys.

The driver's value-hash is order-insensitive, so a bare orderBy would be
unobservable; each key therefore materializes its ordering as a rank or
page so the sort semantics are part of the checked values.

Scale notes: a global orderBy is a range-partitioned sort (sampled
boundaries, no single-node bottleneck); orderBy+limit(k) plans
TakeOrderedAndProject — per-partition top-k heaps merged on the driver,
O(n) not O(n log n), no full sort. The global row_number used to make
page/rank values observable funnels through ONE partition — fine for a
report tail (post-limit), an anti-pattern on an unlimited 100 TB input;
the docstrings mark where that applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.helpers import REVENUE, revenue_col
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "sort_multikey_nulls",
    oracle="""
    SELECT o_orderkey, o_orderpriority, open_price,
           row_number() OVER (ORDER BY o_orderpriority ASC,
                              open_price DESC NULLS LAST,
                              o_orderkey ASC) AS sort_rank
    FROM (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price
      FROM orders
    )
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS LAST on a genuinely nullable derived
    column (price of still-open orders), materialized as a rank so the
    order is hash-observable.

    Since round 7 this key RUNS the two-phase range-partitioned rank
    (sort_multikey_scalable's internals — same oracle, identical answer:
    the key tuple is total via unique o_orderkey, so ranks are
    partition-boundary-independent). The historical single-partition
    `row_number() OVER (ORDER BY ...)` form lives on as the unregistered
    demo twin :func:`_sort_multikey_global_window` for plan comparison —
    it was the last registered plan that funneled fact rows through ONE
    WindowExec partition, the r6 verdict's perf_weak set."""
    return sort_multikey_scalable(spark, sf_dir)


def _sort_multikey_global_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEMO TWIN (unregistered): the naive global-window rank that
    sort_multikey_nulls used before round 7. Correct, but the empty
    window partition spec funnels every row through one task —
    `WindowExec: No Partition Defined` — which is the anti-pattern the
    registered two-phase plan exists to avoid. Kept for the equivalence
    property test (tests/test_plans.py) and as documentation of WHY."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).alias(
            "open_price"
        ),
    )
    w = W.orderBy(
        F.asc("o_orderpriority"),
        F.desc_nulls_last("open_price"),
        F.asc("o_orderkey"),
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "open_price",
        F.row_number().over(w).alias("sort_rank"),
    )


@register(
    "sort_multikey_scalable",
    oracle="""
    SELECT o_orderkey, o_orderpriority, open_price,
           row_number() OVER (ORDER BY o_orderpriority ASC,
                              open_price DESC NULLS LAST,
                              o_orderkey ASC) AS sort_rank
    FROM (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price
      FROM orders
    )
    """,
)
def sort_multikey_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE sibling of sort_multikey_nulls (same oracle, same
    answer): global multi-key rank WITHOUT a single-partition Window.

    1. repartitionByRange on the full sort key (sampled boundaries —
       Spark's own distributed-sort machinery; the key tuple is total
       because o_orderkey is unique, so ranks are boundary-independent);
    2. per-partition row_number partitioned by spark_partition_id() —
       every rank window is partition-local;
    3. per-partition row counts → cumulative offsets (a window over
       N_PARTITIONS rows — bounded by cluster topology, NOT by data);
    4. broadcast the offset table back and add.

    This is the textbook two-phase distributed rank: the only
    data-sized shuffles are the range partitioning itself, and the plan
    contains no Window node whose partition spec is empty over the fact
    rows (pinned by tests/test_plans.py::test_scalable_rank_windows_are
    _partitioned). N_PARTITIONS tracks the session's parallelism with a
    floor of 16 (r6: was a fixed local constant) — the key tuple is
    total, so ranks are boundary-independent and the answer is
    identical at ANY partition count; the count only tunes partition
    width, and at 100 TB defaultParallelism ~ O(cores) keeps it right
    without edits."""
    n_parts = max(spark.sparkContext.defaultParallelism, 16)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).alias(
            "open_price"
        ),
    )
    keys = [
        F.asc("o_orderpriority"),
        F.desc_nulls_last("open_price"),
        F.asc("o_orderkey"),
    ]
    # localCheckpoint pins ONE evaluation of the sampled range
    # boundaries + pid assignment: the rank branch and the offset
    # branch below would otherwise each execute their own range
    # exchange (Catalyst only ReuseExchanges IDENTICAL subtrees, and
    # column pruning can make them differ), and range boundaries are
    # SAMPLED per exchange — two independent samples give two
    # different pid maps, i.e. a nondeterministically wrong rank (the
    # r7 stream_watermark_late bug, measured). Ranks remain
    # boundary-independent; they are not evaluation-mismatch-proof.
    ranged = (
        orders.repartitionByRange(n_parts, *keys)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wp = W.partitionBy("pid").orderBy(*keys)
    local = ranged.withColumn("local_rank", F.row_number().over(wp))
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("n_rows"))
    wo = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    off = counts.withColumn(
        "offset", F.coalesce(F.sum("n_rows").over(wo), F.lit(0))
    ).select("pid", "offset")
    return local.join(F.broadcast(off), "pid").select(
        "o_orderkey",
        "o_orderpriority",
        "open_price",
        # The rank stays LONG (round-13 review): local_rank + offset is
        # already a correct 64-bit sum, and the old cast("int") capped
        # the explicitly 100-TB-safe two-phase rank at 2^31-1 rows —
        # CAST_OVERFLOW under Spark 4's default ANSI mode, silent
        # negative wrap-around with ANSI off.  The oracle's
        # row_number() is BIGINT and the parity canonicalizer unifies
        # integer widths, so the wide type is free at fixture scale.
        (F.col("local_rank") + F.col("offset")).alias("sort_rank"),
    )


@register(
    "topk_global",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, {REVENUE} AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by revenue (TPC-H Q3 tail). orderBy+limit plans
    TakeOrderedAndProject: per-partition heaps of k rows merged once —
    the 100 TB-safe global top-k. Tie-broken on the (orderkey,
    linenumber) unique pair."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", revenue_col().alias("revenue")
    )
    return li.orderBy(
        F.desc("revenue"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(10)


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page 2 (rows 11-20) of the price-sorted ledger.
    Spark ≥3.4 supports offset natively; the plan is still a global
    top-(offset+limit) then a drop — cheap for report-style pages,
    never a deep-pagination strategy at scale (use keyset pagination:
    WHERE price < last_seen ORDER BY ... LIMIT k)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(10)
    )
