"""Round-15 two-level exact-sum pins (VERDICT r14 task #1).

The round converted every remaining single-level dsum/davg whose
groups are table-fraction-sized to the two-level form (long-micro
partials per (keys, spark_partition_id()) → decimal(38,0) merge;
helpers module docstring).  These tests pin the REASON and the FIX
directly, at the magnitude where they diverge:

1. The ceiling is REAL: on a fixture whose per-group micro mass
   exceeds 2^63, the single-level accumulator raises Spark's ANSI
   ARITHMETIC_OVERFLOW (loud, never a silent wrap — the documented
   failure mode), while the two-level form over the same data returns
   the exact sum, provided each PARTITION's mass stays under 2^63 —
   exactly the bound maxPartitionBytes enforces at scale.
2. The two forms are BIT-IDENTICAL where both are defined: on
   money-scale data the merged double equals the single-level double
   exactly (same integer total, same final conversion tree) — the
   property that let all 12 conversions ship with UNCHANGED oracles.
3. The merge is layout-independent: integer partials re-grouped under
   different partitionings sum to the same decimal, so
   spark_partition_id() in the grouping key never leaks into values
   (the probe keys in test_determinism cover the registered queries;
   this covers the primitive).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.helpers import (
    dsum,
    dsum_merge,
    micros,
)

# Each row carries 2.5e12 units → floor(x*1e6) = 2.5e18 micros.  Four
# rows in ONE group total 1e19 micros > 2^63 ≈ 9.22e18: the
# single-level long accumulator MUST overflow; per-partition partials
# (one row each) are 2.5e18 < 2^63 and merge exactly as decimal.
_BIG = 2.5e12
_N = 4


def _big_frame(spark):
    # one row per partition — the maxPartitionBytes-bounded shape the
    # two-level recipe relies on.  range(0, N, 1, numPartitions=N)
    # GUARANTEES the one-row-per-partition layout (range splits its
    # interval across exactly N partitions); the earlier
    # range(N).repartition(N) relied on round-robin spreading 4 rows
    # over 4 partitions, which Spark does not promise — a collapsed
    # layout would overflow the level-1 partial itself and flip the
    # pin's meaning (ADVICE r15).
    return spark.range(0, _N, 1, _N).select(
        F.lit("g").alias("k"), F.lit(_BIG).alias("v")
    )


def test_single_level_overflows_loudly_past_2e63(spark):
    df = _big_frame(spark).groupBy("k").agg(dsum(F.col("v"), "s"))
    with pytest.raises(Exception) as exc:
        df.collect()
    msg = str(exc.value)
    assert "ARITHMETIC_OVERFLOW" in msg or "overflow" in msg.lower(), msg


def test_two_level_returns_exact_sum_past_2e63(spark):
    partials = _big_frame(spark).groupBy(
        "k", F.spark_partition_id().alias("_pid")
    ).agg(F.sum(micros(F.col("v"))).alias("p"))
    [row] = partials.groupBy("k").agg(dsum_merge("p", "s")).collect()
    # 4 × 2.5e18 micros = 1e19 micros = 1e13 units, exactly
    # representable as a double (it is a power of 10 below 2^53 × 2^k
    # scaling? 1e13 < 2^53, so yes — integer-exact)
    assert row["s"] == 1.0e13, row


def test_two_forms_bit_identical_at_money_scale(spark):
    # 10k pseudo-random money-scale rows across 7 partitions: the two
    # forms must produce the SAME double, bit for bit.
    base = (
        spark.range(10_000)
        .repartition(7)
        .select(
            (F.pmod(F.col("id"), F.lit(5))).alias("k"),
            (
                (F.pmod(F.xxhash64("id"), F.lit(10_000_000)))
                / F.lit(100.0)
            ).alias("v"),
        )
    )
    single = {
        r["k"]: r["s"]
        for r in base.groupBy("k").agg(dsum(F.col("v"), "s")).collect()
    }
    partials = base.groupBy("k", F.spark_partition_id().alias("_pid")).agg(
        F.sum(micros(F.col("v"))).alias("p")
    )
    two = {
        r["k"]: r["s"]
        for r in partials.groupBy("k").agg(dsum_merge("p", "s")).collect()
    }
    assert single == two  # exact float equality — same integer, same tree


def test_merge_is_layout_independent(spark):
    vals = [(i % 3, (i * 7919) % 1000 / 4.0) for i in range(2_000)]
    results = []
    for n_parts in (1, 5, 32):
        df = spark.createDataFrame(vals, ["k", "v"]).repartition(n_parts)
        partials = df.groupBy("k", F.spark_partition_id().alias("_pid")).agg(
            F.sum(micros(F.col("v"))).alias("p")
        )
        results.append(
            sorted(
                (r["k"], r["s"])
                for r in partials.groupBy("k")
                .agg(dsum_merge("p", "s"))
                .collect()
            )
        )
    assert results[0] == results[1] == results[2]


# --------------------------------------------------- two_level() helper
# Round 16 packaged the partial/merge pair as helpers.two_level for the
# sources-wave audit tails; these pin the helper itself against the
# single-level forms it replaced, spec kind by spec kind.


def _audit_frame(spark, n_parts=7):
    return (
        spark.range(5_000)
        .repartition(n_parts)
        .select(
            F.pmod(F.col("id"), F.lit(4)).alias("k"),
            (F.pmod(F.xxhash64("id"), F.lit(900_000)) / F.lit(100.0)).alias(
                "v"
            ),
            F.when(F.col("id") % 13 == 0, F.col("id")).alias("maybe"),
            F.concat(F.lit("b"), F.pmod(F.col("id"), F.lit(9))).alias(
                "brand"
            ),
        )
    )


def test_two_level_helper_matches_single_level(spark):
    from climateiq_pipelines_spark.functions.helpers import two_level

    df = _audit_frame(spark)
    got = {
        r["k"]: r.asDict()
        for r in two_level(
            df,
            ["k"],
            [
                ("count", "n_rows"),
                ("countc", F.col("maybe"), "n_maybe"),
                ("lsum", F.col("maybe"), "checksum"),
                ("dsum", F.col("v"), "sum_v"),
                ("davg", F.col("v"), "avg_v"),
                ("min", F.col("v"), "min_v"),
                ("max", F.col("v"), "max_v"),
                ("cdistinct", F.col("brand"), "n_brands"),
                ("lit", F.lit(42).cast("int"), "answer"),
            ],
        ).collect()
    }
    want = {
        r["k"]: r.asDict()
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("maybe").alias("n_maybe"),
            F.coalesce(F.sum("maybe"), F.lit(0)).cast("long").alias(
                "checksum"
            ),
            dsum(F.col("v"), "sum_v"),
            (
                F.sum(micros(F.col("v"))).cast("double")
                / F.lit(1e6)
                / F.count("v")
            ).alias("avg_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.countDistinct("brand").alias("n_brands"),
            F.lit(42).cast("int").alias("answer"),
        )
        .collect()
    }
    assert got == want  # exact equality, floats bit-for-bit included


def test_two_level_helper_layout_independent(spark):
    from climateiq_pipelines_spark.functions.helpers import two_level

    frames = [
        sorted(
            (r["k"], r["s"], r["a"], r["n"])
            for r in two_level(
                _audit_frame(spark, n_parts),
                ["k"],
                [
                    ("dsum", F.col("v"), "s"),
                    ("davg", F.col("v"), "a"),
                    ("count", "n"),
                ],
            ).collect()
        )
        for n_parts in (1, 6, 32)
    ]
    assert frames[0] == frames[1] == frames[2]


def test_two_level_helper_global_and_empty(spark):
    from climateiq_pipelines_spark.functions.helpers import two_level

    aggs = [("count", "n"), ("dsum", F.col("v"), "s")]
    df = _audit_frame(spark)
    [row] = two_level(df, [], aggs).collect()
    [want] = df.agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("v"), "s")
    ).collect()
    assert (row["n"], row["s"]) == (want["n"], want["s"])
    # empty input: the global form must still return ONE row with
    # n=0 (the coalesce in the count merge) — matching the
    # single-level global aggregate's empty-relation contract
    [empty] = two_level(df.filter(F.lit(False)), [], aggs).collect()
    assert empty["n"] == 0 and empty["s"] is None


def test_two_level_helper_aliased_key_and_bad_kind(spark):
    import pytest as _pytest

    from climateiq_pipelines_spark.functions.helpers import two_level

    df = _audit_frame(spark)
    out = two_level(
        df,
        [(F.col("k") % 2 == 0).alias("k_even")],
        [("count", "n")],
    )
    assert out.columns == ["k_even", "n"]
    assert {r["k_even"] for r in out.collect()} == {True, False}
    with _pytest.raises(ValueError, match="unknown two_level agg kind"):
        two_level(df, ["k"], [("median", F.col("v"), "m")])
