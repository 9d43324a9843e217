"""Property-based checks for the round-9 cent-long moment accumulation
(agg_linear_fit / agg_stats_moments) and its oracle semantics.

The rewrite's surviving numerical claims, each pinned here:

1. CENT RECOVERY — for any true value of k cents stored as the parquet
   double k/100, `round(x * 100)` recovers exactly k on both engines.
   This is the ONLY step where a double is interpreted; everything
   after it is integer arithmetic until one final Σ→double conversion
   and a double division by 100/10000 — expression trees the engine
   and the DuckDB oracle text share verbatim.

2. QUANTIZED PRODUCTS ARE NOT GRID-FAITHFUL AT PRICE SCALE — the
   counterexample test. The first r9 form kept the oracle's
   CAST(y*y AS DECIMAL(25,6)) while the engine moved to exact cents:
   at y ≥ ~1e5 units, y² ≈ 1e10 has ulp ≈ 3.7e-6, larger than the
   5e-7 HALF_UP half-gap, so the quantized DOUBLE product differs
   from the exact 4-decimal product on the majority of rows
   (measured ~80% over y ∈ [1e5, 2e5]); the asymmetric pair only
   hash-matched because the final Σ→double cast absorbed the sub-ulp
   net difference — a coin flip, not a guarantee. This test pins a
   concrete failing value so the quantized-product oracle form cannot
   quietly return.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

_Q6 = Decimal("0.000001")


def _as_dec6(x: float) -> Decimal:
    """JVM/DuckDB cast(double AS decimal(_,6)) — exact binary value of
    the double, then HALF_UP at 6 decimals."""
    return Decimal(x).quantize(_Q6, rounding=ROUND_HALF_UP)


@given(k=st.integers(min_value=-(10**12), max_value=10**12))
@settings(max_examples=500, deadline=None)
def test_cent_recovery_is_exact(k):
    """round(double(k/100) * 100) == k far beyond any money domain
    (10^12 cents = $10B line items): the double for k/100 sits within
    a relative 2^-52 of the grid point, and the *100 product keeps the
    error orders of magnitude under the 0.5 rounding radius."""
    x = k / 100.0
    assert round(x * 100) == k


@given(
    kx=st.integers(min_value=-10_000, max_value=10_000),
    ky=st.integers(min_value=-(2 * 10**7), max_value=2 * 10**7),
)
@settings(max_examples=500, deadline=None)
def test_cent_products_are_exact(kx, ky):
    """The engine's long products equal the true 4-decimal products at
    any magnitude the accumulator admits — integer arithmetic has no
    scale-dependent failure mode (contrast the counterexample below)."""
    xc = round((kx / 100.0) * 100)
    yc = round((ky / 100.0) * 100)
    assert Decimal(xc * yc).scaleb(-4) == (Decimal(kx) * Decimal(ky)).scaleb(-4)
    assert Decimal(yc * yc).scaleb(-4) == (Decimal(ky) * Decimal(ky)).scaleb(-4)


def test_quantized_double_product_diverges_at_price_scale():
    """The reason both moment oracles use exact cents: quantizing the
    DOUBLE product y*y to 6 decimals does NOT recover the exact
    4-decimal product once y² ulp exceeds the half-gap. Concrete pin:
    y = 122,542.57 (12,254,257 cents) — dec6(y*y) ends ...204903, the
    exact product ends ...204900."""
    ky = 12_254_257
    y = ky / 100.0
    quantized = _as_dec6(y * y)
    exact = (Decimal(ky) * Decimal(ky)).scaleb(-4)
    assert quantized != exact, (
        "If this ever starts matching, the counterexample has rotted — "
        "pick another from the ~80% failing band, do NOT revert the "
        "oracles to CAST(y*y AS DECIMAL(25,6))."
    )
    # and the failure is sub-1e-5 — exactly the silent-last-digit class
    assert abs(quantized - exact) < Decimal("0.00001")


def test_bm25_contrib_text_is_cross_engine_bit_identical(spark):
    """The BM25 per-(doc, term) contribution is ONE SQL text evaluated
    by both engines; after the round-9 literal fix (bare decimals
    parse as DECIMAL in Spark SQL but ran as DOUBLE in DuckDB — a
    ~15% floor-flip per term before the fix) the text must produce
    the IDENTICAL int64 micros on arbitrary integer inputs. 2,000
    random tuples plus the tuple that exposed the bug (tf=2, dl=20,
    df=3885 at sf0.1's N=5000)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from climateiq_pipelines_spark.operators.retrieval_ext import (
        _BM25_CONTRIB_SQL,
    )

    rng = random.Random(7)
    rows = [
        (
            rng.randint(1, 30),
            rng.randint(1, 400),
            rng.randint(1, 5000),
            5000,
            270704,
        )
        for _ in range(2000)
    ]
    rows.append((2, 20, 3885, 5000, 270704))  # the sf0.1 top-10 flipper
    sdf = spark.createDataFrame(
        rows, "tf long, dl long, df long, n_docs long, total_dl long"
    )
    sv = [
        r["c"]
        for r in sdf.select(F.expr(_BM25_CONTRIB_SQL).alias("c")).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(tf BIGINT, dl BIGINT, df BIGINT,"
        " n_docs BIGINT, total_dl BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    dv = [x[0] for x in con.execute(f"SELECT {_BM25_CONTRIB_SQL} FROM t").fetchall()]
    mismatches = [
        (rows[i], a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b
    ]
    assert not mismatches, mismatches[:5]


def test_bm25_idf_floor_has_margin_at_every_fixture_input():
    """VERDICT r9 task #4: the one library-dependent value in the BM25
    chain is floor(ln(idf_arg) * 1e6) — if a fixture's pre-floor value
    sat within libm's ~1e-9 ulp band of an integer boundary, a libm
    build difference could flip the floor and the cross-engine identity
    would hold while BOTH engines drifted from the intended score.
    Enumerate every distinct (n_docs, df) the fixture query terms
    produce at BOTH checked scales and assert the pre-floor value sits
    > 1e-7 (100x the exposure) from its floor boundaries, so a future
    fixture regen landing on a knife edge fails loudly here."""
    import math

    import duckdb

    from climateiq_pipelines_spark.operators.retrieval_ext import (
        _BM25_QUERY,
    )

    eps = 1e-7
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{sf_dir}/documents.parquet')"
        )
        terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
        pairs = con.execute(
            f"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
              WHERE w <> ''
            ),
            tf AS (
              SELECT doc_id, w FROM words WHERE w IN ({terms})
              GROUP BY doc_id, w
            ),
            dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
            SELECT (SELECT COUNT(DISTINCT doc_id) FROM words) AS n_docs, df
            FROM dfq
            """
        ).fetchall()
        con.close()
        assert pairs, f"no query-term hits at {sf_dir}?"
        for n_docs, df in pairs:
            pre_floor = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6
            frac = pre_floor - math.floor(pre_floor)
            assert eps < frac < 1 - eps, (
                f"{sf_dir}: (n_docs={n_docs}, df={df}) pre-floor idf micro"
                f" value {pre_floor!r} sits within {eps} of a floor"
                f" boundary (frac={frac!r}) — regenerate or re-margin"
            )
