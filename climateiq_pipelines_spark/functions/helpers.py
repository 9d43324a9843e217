"""Float-determinism and oracle-parity helpers (SURVEY §7.4 policy).

Double summation is association-order dependent: Spark's partial/final
aggregation over shuffled partitions and DuckDB's single-node sum will
disagree in final ulps, which breaks the driver's value-hash. Policy:

- Every SUM/AVG over a double measure goes through an exact decimal
  accumulator: cast each (double-computed) term to DECIMAL(25,6), sum
  exactly, cast the total back to DOUBLE. Decimal addition is exact and
  associative, and double→decimal(…,6) rounding is engine-independent
  (ties would require a double exactly at a .0000005 boundary, which is
  not representable), so Spark and DuckDB produce bit-identical doubles.
- AVG = CAST(decimal-sum AS DOUBLE) / COUNT — one IEEE division of
  identical operands on both sides.
- Library transcendentals (exp/ln/pow/…) may differ between the JVM and
  DuckDB's libm in the last ulp → round those outputs (`fin`).

Scale note: the decimal cast is a per-row scalar inside whole-stage
codegen; partial aggregation (map-side combine) still applies, so this
costs nothing at 100 TB relative to a plain sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column, alias: str) -> Column:
    """Exact, engine-independent SUM of a double expression."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Exact-sum mean: decimal-sum / count, bit-stable across engines."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def fin(col: Column, alias: str, places: int = 6) -> Column:
    """Round a float output whose producer is library-dependent."""
    return F.round(col, places).alias(alias)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` (without alias)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg` (without alias)."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr}))"


REVENUE = "l_extendedprice * (1 - l_discount)"


def revenue_col() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
