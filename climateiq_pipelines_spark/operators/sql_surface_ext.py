"""Round-7 SQL-surface extension: RECURSIVE CTEs, which Spark gained in
4.x (SPARK-24497) — the declarative form of the repo's iterative keys.
`llm_dedup_clusters` proves the ENGINE loop equals a recursive fixpoint
by checking against DuckDB's recursive CTE; this key runs the recursive
fixpoint ON SPARK ITSELF (spark.sql WITH RECURSIVE), demonstrating that
hierarchy walks a user would write in SQL work verbatim — and that both
engines' recursion semantics agree bit-for-bit on the same query text.

Registered after the driver's 50-entry certification window
(plans.load_all); rotation-targeted for round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from climateiq_pipelines_spark.plans import register

_SLICE_MOD = 101  # bounded deterministic node slice of orders

# One SQL text, two engines: only the table reference differs (Spark
# reads the parquet path directly; DuckDB reads the pre-registered
# view). The hierarchy is the implicit binary heap over the slice's
# orderkey ranks (parent = rank div 2) — deterministic, acyclic, depth
# ~log2(n), so the recursion terminates on structure, not on a guard.
_CLOSURE_BODY = """
    WITH RECURSIVE nodes AS (
      SELECT o_orderkey,
             CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rnk,
             o_totalprice
      FROM {orders} WHERE o_orderkey % {mod} = 0
    ),
    walk(rnk, o_orderkey, depth, root_key) AS (
      SELECT rnk, o_orderkey, CAST(0 AS INTEGER), o_orderkey
      FROM nodes WHERE rnk = 1
      UNION ALL
      SELECT c.rnk, c.o_orderkey, p.depth + 1, p.root_key
      FROM nodes c JOIN walk p ON c.rnk / 2 = p.rnk
      WHERE c.rnk > 1
    )
    SELECT w.rnk, w.o_orderkey, w.depth, w.root_key,
           CAST(n.o_totalprice * 1 AS DOUBLE) AS node_price
    FROM walk w JOIN nodes n ON n.rnk = w.rnk
"""


def _closure_sql(orders_ref: str) -> str:
    # integer division: Spark DIV vs DuckDB // differ in spelling, but
    # plain / on integers truncates in NEITHER engine uniformly — use
    # an engine-neutral floor-free form: c.rnk / 2 would be fractional,
    # so the template is specialized per engine below.
    return _CLOSURE_BODY.format(orders=orders_ref, mod=_SLICE_MOD)


_SPARK_SQL = _closure_sql("parquet.`{path}`").replace(
    "c.rnk / 2 = p.rnk", "c.rnk DIV 2 = p.rnk"
)
_DUCK_SQL = _closure_sql("orders").replace(
    "c.rnk / 2 = p.rnk", "c.rnk // 2 = p.rnk"
)


@register("sql_recursive_closure", oracle=_DUCK_SQL)
def sql_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE-CTE HIERARCHY WALK through the spark.sql surface
    (Spark 4.x WITH RECURSIVE): rank a bounded slice of orders, treat
    the ranks as an implicit binary heap (parent = rank div 2), and
    recursively derive each node's DEPTH and ROOT — the org-chart /
    BOM / category-tree query every SQL warehouse user eventually
    writes. The SAME query text (modulo integer-division spelling and
    the table reference) runs on DuckDB as the oracle, so the two
    engines' recursion semantics — seed row, step join, UNION ALL
    accumulation, termination on an empty step — are proven to agree
    row-for-row.

    Determinism: the slice is mod-keyed, ranks are a total order over
    unique keys, the tree is acyclic by construction (child rank >
    parent rank), and depth/root are integers — nothing floats.

    Scale: recursion depth is log2 of the slice (structural
    termination); each step is one equi-join of the frontier against
    the bounded node table. For DATA-sized graphs the engine loop with
    checkpoints (dedup_graph.connected_components) remains the
    registered production path — this key is the declarative SQL
    surface over topology-bounded hierarchies (org charts, category
    trees: thousands of rows, not billions). The rank window runs over
    the mod-sliced relation (bounded by construction, the
    llm_minhash_jaccard_estimate sampling discipline)."""
    return spark.sql(_SPARK_SQL.format(path=f"{sf_dir}/orders.parquet"))
