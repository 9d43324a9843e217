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
    # two-level recipe relies on
    return (
        spark.range(_N)
        .repartition(_N)
        .select(F.lit("g").alias("k"), F.lit(_BIG).alias("v"))
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
