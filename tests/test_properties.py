"""Property-based algebraic invariants (SURVEY §5.2 #3, Hypothesis).

Small generated frames → invariants that must hold for ANY input, not
just the fixtures: join-partition laws, set-op cardinality laws, dedup
idempotence, top-k containment. Example counts are kept low because
each example pays a Spark job; the value is the generator exploring
edge shapes (empty groups, all-duplicates, single rows) that fixtures
never contain.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=30,
)
keys = st.lists(
    st.integers(min_value=0, max_value=9), min_size=0, max_size=10
)


@given(left=rows, right_keys=keys)
@settings(**SETTINGS)
def test_semi_anti_partition(spark, left, right_keys):
    """left_semi ∪ left_anti partitions the left table exactly."""
    ldf = spark.createDataFrame(left or [(0, 0)], "k int, v int")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(
        [(k,) for k in right_keys] or [(0,)], "k int"
    )
    if not right_keys:
        rdf = rdf.limit(0)
    semi = ldf.join(rdf, "k", "left_semi").count()
    anti = ldf.join(rdf, "k", "left_anti").count()
    assert semi + anti == ldf.count()


@given(a=rows, b=rows)
@settings(**SETTINGS)
def test_union_all_additivity(spark, a, b):
    adf = spark.createDataFrame(a or [(0, 0)], "k int, v int")
    bdf = spark.createDataFrame(b or [(0, 0)], "k int, v int")
    if not a:
        adf = adf.limit(0)
    if not b:
        bdf = bdf.limit(0)
    assert adf.unionByName(bdf).count() == adf.count() + bdf.count()


@given(a=rows)
@settings(**SETTINGS)
def test_distinct_idempotent(spark, a):
    df = spark.createDataFrame(a or [(0, 0)], "k int, v int")
    if not a:
        df = df.limit(0)
    once = df.distinct()
    assert once.count() == once.distinct().count()


@given(a=rows)
@settings(**SETTINGS)
def test_groupmin_dedup_is_subset_and_covers_keys(spark, a):
    """The deterministic dedup (groupBy+min) emits exactly one row per
    key and every surviving (k, v) pair exists in the input."""
    df = spark.createDataFrame(a or [(0, 0)], "k int, v int")
    if not a:
        df = df.limit(0)
    dedup = df.groupBy("k").agg(F.min("v").alias("v"))
    assert dedup.count() == df.select("k").distinct().count()
    assert dedup.join(df, ["k", "v"], "left_anti").count() == 0


@given(a=rows)
@settings(**SETTINGS)
def test_window_topk_containment(spark, a):
    """Per-group top-2 rows ⊆ the group and ≤2 per key."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(a or [(0, 0)], "k int, v int")
    if not a:
        df = df.limit(0)
    w = W.partitionBy("k").orderBy(F.desc("v"), F.asc("k"))
    top = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    per_key = top.groupBy("k").count().filter(F.col("count") > 2).count()
    assert per_key == 0
    assert top.drop("rn").join(df, ["k", "v"], "left_anti").count() == 0
