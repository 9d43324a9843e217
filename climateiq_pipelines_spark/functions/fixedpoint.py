"""Shared fixed-point vector arithmetic — Spark + DuckDB twins.

Exact int64 embedding math used across the ANN / dedup / retrieval
families: both engines accumulate Σ floor(x·y·1e12) in int64, making
dot products (and everything ranked by them) bit-identical cross-engine
regardless of float summation order.

Lives OUTSIDE operators/llm.py on purpose: oracle builders run at
@register decoration time (module import), and importing operators.llm
for a two-line helper would register llm's 19 keys as an import
side-effect — silently consuming driver-certification window slots
(observed in the round-7 rotation: retrieval_ext's RRF oracle pulled
llm's whole family into the first 50). Helpers that oracle builders
need must come from a module that registers nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_S12 = 1_000_000_000_000  # 1e12 fixed-point scale for products
_S9 = 1_000_000_000  # 1e9 scale for centroid component means


def _int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot of two float arrays: Σ floor(x·y·1e12)."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(float(_S12))
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _sql_int_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`_int_dot` (p[1]/p[2]: list_zip makes an
    unnamed struct, numeric extraction only)."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) "
        f"* 1000000000000) AS BIGINT)), 'sum')"
    )


# DuckDB CTE block computing per-label centroids (1e9-scaled component
# means) and nearest-centroid assignment by 1e12-scaled L2 — the oracle
# twin of the k-means E-step shared by llm_centroid_assign and the
# SemDeDup pipeline.
_CENTROID_SQL = """
    exploded AS (
      SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS x
      FROM embeddings
    ),
    centroids AS (
      SELECT label AS c_label, pos,
             CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000000) AS BIGINT))
                  AS DOUBLE) / 1000000000.0 / COUNT(*) AS c
      FROM exploded GROUP BY label, pos
    ),
    dists AS (
      SELECT e.vec_id, e.label, c.c_label,
             SUM(CAST(floor((CAST(e.x AS DOUBLE) - c.c)
                            * (CAST(e.x AS DOUBLE) - c.c)
                            * 1000000000000) AS BIGINT)) AS dist_fp
      FROM exploded e JOIN centroids c ON e.pos = c.pos
      GROUP BY e.vec_id, e.label, c.c_label
    ),
    assigned AS (
      SELECT vec_id, label, c_label AS assigned_label
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist_fp ASC, c_label) AS rn
        FROM dists
      ) WHERE rn = 1
    )
"""
