"""Property checks for the round-13 cosine-micros migration.

The vector-similarity family (llm_cosine_topk and its bucketed / LSH /
MRL / multiprobe / neardup / knn / IVF kin plus the SemDeDup
max_sim_micros column) used to report round(dot_fp / 1e12, 6) as a
DOUBLE — parity rested on np.round (half-even), Spark F.round
(BigDecimal HALF_UP) and DuckDB round (std::round) agreeing at
half-way ulps, the exact latent class round 12 eliminated in
llm_temperature_mixture.  The family now reports FLOORED INTEGER
MICROS: cos_micros = floor(dot_fp / 1e6), computed as
fixedpoint.cos_micros (Spark), fixedpoint.sql_cos_micros (DuckDB) and
np.floor(d / 1e6).astype(np.int64) (the Arrow block-NL paths).

This module pins the migration's load-bearing claim: floor of the
double quotient equals exact integer floor division for EVERY int64
dot the engine can produce — negatives included, multiples of 1e6
included (the boundary where a rounding-mode seam would live).

Why it holds: |dot_fp| ≤ 64 · 2.5e11 ≈ 1.6e13 < 2^53, so double(dot)
is exact; 1e6 is exact; the nearest-double quotient cannot cross an
integer boundary because any non-multiple quotient sits ≥ 1e-6 away
from the nearest integer while the half-ulp at |q| ≈ 1.6e7 (< 2^24)
is ≈ 1.9e-9.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# The engine's dot bound: 64 terms, each |floor(x·y·1e12)| ≤ 2.5e11
# for unit-norm fixture vectors; widen to 2^53-ish to prove headroom.
_DOT_BOUND = 16 * 10**13

# Adversarial values: exact multiples of 1e6 (the boundary), ±1 around
# them (the nearest non-multiples), half-way points of the OLD
# round(…, 6) contract (odd multiples of 5e5 — where HALF_UP and
# half-even disagreed), and the magnitude extremes.
_EDGES = []
for base in (0, 10**6, 37 * 10**6, 5 * 10**5, 15 * 10**5, _DOT_BOUND):
    for v in (base - 1, base, base + 1):
        _EDGES.extend([v, -v])


def _paths(dot: int) -> dict:
    exact = dot // 10**6  # Python ints: true floor division
    return {
        "exact": exact,
        "double": math.floor(float(dot) / 1e6),
        "numpy": int(np.floor(np.float64(dot) / 1e6)),
    }


@given(st.integers(min_value=-_DOT_BOUND, max_value=_DOT_BOUND))
@settings(max_examples=500, deadline=None)
def test_cos_micros_floor_matches_integer_floordiv(dot):
    p = _paths(dot)
    assert p["double"] == p["exact"], p
    assert p["numpy"] == p["exact"], p


def test_cos_micros_edges_all_paths_agree():
    """The boundary cases stated explicitly (plus DuckDB's floor),
    so a failure names the value instead of shrinking to it."""
    con = duckdb.connect()
    for dot in _EDGES:
        p = _paths(dot)
        (dd,) = con.execute(
            "SELECT CAST(floor(CAST(? AS BIGINT) / 1000000.0) AS BIGINT)",
            [dot],
        ).fetchone()
        assert p["double"] == p["exact"] == p["numpy"] == dd, (dot, p, dd)


def test_cos_micros_spark_path_matches(spark):
    """The Spark expression (fixedpoint.cos_micros) floors identically
    on the adversarial set — negatives toward -inf, multiples exact."""
    from pyspark.sql import functions as F

    from climateiq_pipelines_spark.functions.fixedpoint import cos_micros

    df = spark.createDataFrame(
        [(int(v),) for v in _EDGES], "dot_fp long"
    ).select("dot_fp", cos_micros(F.col("dot_fp")).alias("cos_micros"))
    for r in df.collect():
        assert r["cos_micros"] == r["dot_fp"] // 10**6, r
    assert dict(df.dtypes)["cos_micros"] == "bigint"


def test_old_contract_half_way_seam_is_real():
    """Documents WHY the migration happened: at the old contract's
    half-way points (dot an odd multiple of 5e5), np.round (half-even)
    and decimal HALF_UP genuinely disagree — the seam the integer
    column removes."""
    from decimal import ROUND_HALF_UP, Decimal

    dot = 25 * 10**5  # old cos_sim: 0.0000025 — exactly half-way
    half_even = float(np.round(dot / 1e12, 6))
    half_up = float(
        (Decimal(dot) / Decimal(10**12)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    assert half_even != half_up, (half_even, half_up)
    # and the NEW contract is seamless at the same value
    assert math.floor(dot / 1e6) == dot // 10**6 == 2
