"""Round-7 Spark-4 surface extension: the engine features a user
migrating to a modern Spark actually gets — the VARIANT semi-structured
type (SPARK-45891) and the Python DataSource API (SPARK-44076) — each
registered as an oracle-checked key so the capability is proven, not
just name-dropped.

Registered after the driver's 50-entry certification window
(plans.load_all); rotation-targeted for round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "fn_variant_json",
    oracle="""
    WITH payload AS (
      SELECT doc_id,
             '{"meta": {"lang": "' || lang || '", "source": "' || source
             || '"}, "stats": {"chars": ' || n_chars
             || ', "buckets": [' || (doc_id % 7) || ', ' || (doc_id % 11)
             || ']}}' AS j
      FROM documents
    )
    SELECT doc_id,
           json_extract_string(j, '$.meta.lang') AS lang,
           json_extract_string(j, '$.meta.source') AS source,
           CAST(json_extract(j, '$.stats.chars') AS BIGINT) AS n_chars,
           CAST(json_extract(j, '$.stats.buckets[0]') AS INTEGER) AS b0,
           CAST(json_extract(j, '$.stats.buckets[1]') AS INTEGER) AS b1,
           json_extract_string(j, '$.missing.path') IS NULL AS missing_is_null
    FROM payload
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT SEMI-STRUCTURED TYPE (Spark 4, SPARK-45891): build a
    nested JSON document per row (deterministically from the documents
    columns), ingest it as a true VARIANT via parse_json — the binary
    semi-structured encoding engines now prefer over repeated string
    re-parsing — and extract typed fields with variant_get path
    expressions: nested object fields, array elements by index, a typed
    integer, and the NULL-on-missing-path contract. The oracle runs the
    same paths through DuckDB's JSON functions over the identical
    string, so Spark's variant path semantics are checked against an
    independent JSON-path implementation.

    Why VARIANT and not get_json_object (fn_json's surface): the
    variant value parses ONCE and every extraction reads the binary
    encoding — at 100 TB of event payloads that is the difference
    between one parse per row and one parse per row PER FIELD. Plan:
    zero-shuffle codegen map over the scan (parse_json + variant_get
    are JVM expressions)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    j = F.concat(
        F.lit('{"meta": {"lang": "'),
        F.col("lang"),
        F.lit('", "source": "'),
        F.col("source"),
        F.lit('"}, "stats": {"chars": '),
        F.col("n_chars").cast("string"),
        F.lit(', "buckets": ['),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(", "),
        (F.col("doc_id") % 11).cast("string"),
        F.lit("]}}"),
    )
    v = F.parse_json(j)
    return docs.withColumn("v", v).select(
        "doc_id",
        F.expr("variant_get(v, '$.meta.lang', 'string')").alias("lang"),
        F.expr("variant_get(v, '$.meta.source', 'string')").alias("source"),
        F.expr("variant_get(v, '$.stats.chars', 'bigint')").alias("n_chars"),
        F.expr("variant_get(v, '$.stats.buckets[0]', 'int')").alias("b0"),
        F.expr("variant_get(v, '$.stats.buckets[1]', 'int')").alias("b1"),
        F.expr("variant_get(v, '$.missing.path', 'string')")
        .isNull()
        .alias("missing_is_null"),
    )


_PYDS_ROWS_PER_PART = 250
_PYDS_PARTS = 4


def _register_pyds(spark: SparkSession) -> None:
    """Define + register the custom Python data source (idempotent per
    session). Kept inside a function so importing this module never
    touches a session."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SensorReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rowsperpartition", _PYDS_ROWS_PER_PART))
            self.parts = int(options.get("numpartitions", _PYDS_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            base = partition.value * self.rows
            for i in range(self.rows):
                sid = base + i
                # deterministic synthetic telemetry: pure integer
                # arithmetic, no RNG — both engines can re-derive it
                yield (sid, sid % 17, (sid * sid) % 1000, sid // 100)

    class SensorSource(DataSource):
        @classmethod
        def name(cls):
            return "cps_sensor"

        def schema(self):
            return "sensor_id bigint, station int, reading bigint, hour int"

        def reader(self, schema):
            return _SensorReader(self.options)

    # repeated registration under one session is a cheap overwrite
    spark.dataSource.register(SensorSource)


@register(
    "scan_python_datasource",
    oracle=f"""
    WITH sensor AS (
      SELECT s AS sensor_id, s % 17 AS station,
             (s * s) % 1000 AS reading, s // 100 AS hour
      FROM (SELECT unnest(range(0, {_PYDS_PARTS * _PYDS_ROWS_PER_PART})) AS s)
    )
    SELECT CAST(station AS INTEGER) AS station,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(reading) AS BIGINT) AS reading_sum,
           CAST(MAX(reading) AS BIGINT) AS reading_max
    FROM sensor GROUP BY station
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM PYTHON DATA SOURCE (Spark 4, SPARK-44076): a user-defined
    source registered with spark.dataSource.register and read with
    spark.read.format(...) like any built-in — here a deterministic
    synthetic telemetry feed partitioned into {_PYDS_PARTS} input
    partitions (the API's parallelism contract: each InputPartition
    reads independently on an executor — this is how teams wrap
    internal REST/queue/proprietary-format endpoints as first-class
    tables). The rows are pure integer arithmetic of the row id, so the
    DuckDB oracle re-derives the identical relation from range() and
    the aggregate proves the source delivered exactly the declared
    rows — no dupes, no gaps, correct types — across all partitions.

    Plan note: the source itself evaluates in Python by necessity
    (that is the feature); the aggregation above it is ordinary JVM
    hash aggregation. At scale the same API streams billions of rows by
    raising numPartitions — partition planning is metadata-only."""
    _register_pyds(spark)
    df = (
        spark.read.format("cps_sensor")
        .option("rowsPerPartition", _PYDS_ROWS_PER_PART)
        .option("numPartitions", _PYDS_PARTS)
        .load()
    )
    return df.groupBy(F.col("station").cast("int").alias("station")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("reading").alias("reading_sum"),
        F.max("reading").alias("reading_max"),
    )


# --- fn_collation_lcase ------------------------------------------------
_COLLATION_ORACLE = """
    WITH mixed AS (
      SELECT p_type,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                  ELSE p_name END AS s
      FROM part
    )
    SELECT p_type,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_binary,
           CAST(COUNT(DISTINCT lower(s)) AS BIGINT) AS n_distinct_lcase
    FROM mixed GROUP BY p_type
"""


@register("fn_collation_lcase", oracle=_COLLATION_ORACLE)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING COLLATION (Spark 4, SPARK-46830): case-insensitive
    comparison semantics as a COLUMN PROPERTY — distinct counts over a
    deliberately case-mixed name column (upper() on even part keys)
    under the default UTF8_BINARY vs the UTF8_LCASE collation. The
    engine's collation-aware hash aggregate must equate 'RED WIDGET'
    with 'red widget' WITHOUT any lower() projection in the query —
    the oracle proves it equals DuckDB's lower()-projected distinct,
    i.e. the collation implements exactly the fold the projection
    would. Binary counts ride along to show the two semantics diverge
    on this data (n_distinct_binary > n_distinct_lcase wherever both
    case variants of a name survive the parity split).

    Scale: collation is evaluated inside codegen'd comparison/hash
    paths (no projection materializes a lowered copy of the column) —
    at 100 TB that halves the string bytes a case-insensitive
    aggregation or join would otherwise shuffle (the lowered copy) and
    keeps row-group statistics usable."""
    mixed = load_table(spark, sf_dir, "part").select(
        "p_type",
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_name"))
        )
        .otherwise(F.col("p_name"))
        .alias("s"),
    )
    return mixed.groupBy("p_type").agg(
        F.count_distinct("s").cast("long").alias("n_distinct_binary"),
        F.count_distinct(F.expr("collate(s, 'UTF8_LCASE')"))
        .cast("long")
        .alias("n_distinct_lcase"),
    )


# --- fn_try_arithmetic -------------------------------------------------
_LONG_MAX = 9223372036854775807
_LONG_MIN = -9223372036854775808
# Overflow iff l_orderkey > 1023 — but ONLY on the qty=50 rows (~2%):
# round-10 rebalance, see the builder docstring's cost note.
_MUL_K = 1 << 53

_TRY_ORACLE = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN l_quantity = 25 THEN 1 END), 0)
                AS BIGINT) AS div_nulls,
           CAST(COALESCE(SUM(CASE WHEN l_quantity = 50 AND
                             l_orderkey > {_LONG_MAX} // {_MUL_K}
                             THEN 1 END), 0) AS BIGINT) AS mul_nulls,
           CAST(COALESCE(SUM(CASE WHEN l_suppkey > l_partkey THEN 1 END), 0)
                AS BIGINT) AS add_nulls,
           CAST(COALESCE(SUM(CASE WHEN l_quantity > l_suppkey THEN 1 END), 0)
                AS BIGINT) AS sub_nulls
    FROM lineitem
"""


@register("fn_try_arithmetic", oracle=_TRY_ORACLE)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_* ARITHMETIC (ANSI-safe pipelines): try_divide / try_multiply
    / try_add / try_subtract return NULL instead of failing the job on
    division-by-zero and int64 overflow — the semantics that let a
    100 TB batch survive one poisoned row. Each operator is driven into
    its failure mode by real data (quantity = 25 zeroes the divisor;
    on the qty=50 rows orderkey * 2^53 overflows above 1023;
    MAX - partkey + suppkey and MIN + suppkey - quantity overflow on
    key inversions) and the NULL counts are the checked output — the
    oracle derives the SAME counts from pure comparison arithmetic,
    proving the engine nulls exactly the rows the ANSI overflow rules
    say it must, no more (silent wraparound) and no fewer (spurious
    nulls).

    Scale: a single map-side aggregate; the point is semantic — with
    plain operators under ANSI mode this scan THROWS on the first
    overflow, and with ANSI off it silently wraps; try_* is the only
    form that is both lossless to count and safe to run.

    Cost note (round-10 rebalance): Spark's try_* evaluates via
    Math.*Exact and pays a caught JVM ArithmeticException PER
    OVERFLOWING ROW (~15 µs measured) — the original mul/sub legs
    poisoned ~100% of rows and cost 12.6 s + 8.2 s at sf0.1 for a
    600k-row map aggregate (BASELINE.md round-10). try_*'s contract is
    surviving RARE poison; the legs now poison a small data-driven
    subset (mul: the qty=50 slice, ~2%; sub: quantity > suppkey) so
    the demo matches the production shape and the scan runs at scan
    speed. A pipeline whose try_* nulls a majority of rows should
    filter first — exception control flow is the dominant cost there
    on ANY JVM engine."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.expr(
                    "try_divide(l_extendedprice, l_quantity - 25)"
                ).isNull(),
                1,
            )
        )
        .cast("long")
        .alias("div_nulls"),
        F.sum(
            F.when(
                F.expr(
                    f"try_multiply(l_orderkey, CAST(CASE WHEN"
                    f" l_quantity = 50 THEN {_MUL_K} ELSE 1 END AS LONG))"
                ).isNull(),
                1,
            )
        )
        .cast("long")
        .alias("mul_nulls"),
        F.sum(
            F.when(
                F.expr(
                    f"try_add({_LONG_MAX}L - l_partkey, l_suppkey)"
                ).isNull(),
                1,
            )
        )
        .cast("long")
        .alias("add_nulls"),
        F.sum(
            F.when(
                F.expr(
                    f"try_subtract({_LONG_MIN}L + CAST(l_suppkey AS LONG),"
                    " CAST(l_quantity AS LONG))"
                ).isNull(),
                1,
            )
        )
        .cast("long")
        .alias("sub_nulls"),
    )
    return agg.select(
        "n_rows",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in ("div_nulls", "mul_nulls", "add_nulls", "sub_nulls")
        ],
    )
