"""Scalar function families (SURVEY.md §2.8) — 8 keys, one consolidated
query per family with every function as an aliased output column so the
oracle hash covers each.

Cross-engine quirks pinned empirically (2026-08-13 probes; each noted at
its use site):

- ``dayofweek``: Spark is 1-based Sunday, DuckDB 0-based Sunday → Spark
  side emits ``dayofweek(x) - 1``.
- ``date_trunc`` on timestamp_ntz RETURNS A SESSION-TZ TIMESTAMP in
  Spark (tz leak — observed +5 h drift under an America/New_York
  session). All truncation here happens at DATE level via ``trunc``,
  which both engines keep tz-free.
- ``ceil``/``floor``: Spark returns BIGINT, DuckDB DOUBLE → cast both.
- ``sign``: Spark DOUBLE, DuckDB INT → cast both to INT.
- transcendentals (exp/ln/log10/pow with fractional exponent): JVM
  StrictMath vs DuckDB libm differ in the last ulp (measured on
  exp(1.0)) → rounded via ``fin``.
- ``pmod`` has no DuckDB twin → oracle emulates ``((x % m) + m) % m``.
- ``%`` on negatives: both engines truncate toward zero — safe as-is.
- md5 / sha2-256: identical lowercase-hex in both engines.
- ``unix_timestamp(ntz)``: both engines interpret naive timestamps as
  UTC — verified identical under a non-UTC driver session.
- xxhash64 / crc32 exist only in Spark → checked through cardinality
  invariants (see fn_hash docstring), not value equality.

All functions here are JVM built-ins inside whole-stage codegen — zero
Python row overhead at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.helpers import fin
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_type) AS type_upper,
           lower(p_brand) AS brand_lower,
           trim(concat('  ', p_type, ' ')) AS type_trim,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           concat_ws('/', p_brand, p_type) AS brand_type,
           array_to_string(string_split(p_name, ' '), '|') AS name_tokens,
           CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INTEGER) AS brand_num,
           regexp_replace(p_type, '[AEIOU]', '', 'g') AS type_novowel,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
           (p_type LIKE '%ECONOMY%') AS is_economy,
           starts_with(p_type, 'PROMO') AS is_promo
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family. Note Spark regexp_replace is global by default
    while DuckDB needs the explicit 'g' flag; split output is serialized
    with array_join (driver hash cannot take arrays)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.array_join(F.split("p_name", " "), "|").alias("name_tokens"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_type", "[AEIOU]", "").alias("type_novowel"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.col("p_type").like("%ECONOMY%").alias("is_economy"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofweek(o_orderdate) AS order_dow,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS order_week,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS order_month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family, ntz-only discipline (SURVEY §1.2): truncation at
    DATE level via trunc() — Spark's date_trunc on timestamp_ntz returns
    a session-tz timestamp (tz leak, probed). dayofweek aligned to
    DuckDB's 0=Sunday by subtracting 1. unix_timestamp(ntz) == DuckDB
    epoch(): both treat the naive value as UTC (probed under a non-UTC
    session)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # DATE results are emitted as timestamp_ntz on both sides: Spark DATE
    # collects to python date objects while DuckDB DATE fetches as
    # datetime64, which the (driver's and our) pandas canonicalizer sees
    # as different dtypes even when values agree.
    ntz = "timestamp_ntz"
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        d.cast(ntz).alias("order_day"),
        F.trunc(d, "week").cast(ntz).alias("order_week"),
        F.trunc(d, "month").cast(ntz).alias("order_month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_add(d, 30).cast(ntz).alias("due_date"),
        F.last_day(d).cast(ntz).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           sqrt(l_quantity) AS qty_sqrt,
           round(pow(l_quantity, 1.5), 6) AS qty_pow,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           round(log10(l_extendedprice), 6) AS price_log10,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           ((CAST(l_quantity AS INTEGER) - 25) % 7 + 7) % 7 AS qty_pmod
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt/abs/round are IEEE-exact cross-engine;
    pow/ln/exp/log10 are library transcendentals (last-ulp divergence
    measured) → rounded to 6 dp both sides. pmod oracle is the
    ((x%m)+m)%m emulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        fin(F.pow("l_quantity", F.lit(1.5)), "qty_pow"),
        fin(F.log(F.col("l_extendedprice")), "price_ln"),
        fin(F.exp("l_discount"), "disc_exp"),
        fin(F.log10("l_extendedprice"), "price_log10"),
        F.sign(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.pmod(F.col("l_quantity").cast("int") - 25, F.lit(7)).alias("qty_pmod"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           least(o_totalprice, 200000.0) AS price_capped,
           greatest(o_totalprice, 1000.0) AS price_floored,
           (o_orderpriority = '1-URGENT' AND o_totalprice > 150000) AS hot_flag
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    order_size_case = (
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        order_size_case.alias("size_bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.least("o_totalprice", F.lit(200000.0)).alias("price_capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("price_floored"),
        (
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        ).alias("hot_flag"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(list_max(embedding) AS DOUBLE) AS max_component,
           len(list_distinct(embedding)) AS n_distinct,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           list_aggregate(list_transform(embedding[1:8],
                          x -> CAST(x AS DOUBLE)), 'sum') AS sum_first8,
           round(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9)
             AS norm_sq,
           list_contains(embedding, 0.0::FLOAT) AS has_zero
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the 64-d float vectors: size/element_at/slice/
    max/distinct + lambda transform/filter/aggregate. float→double casts
    are exact; both engines fold lists left-to-right, so the element-wise
    sums are order-identical (norm_sq still rounded: the 64-term sum is
    long enough that a future engine change in fold strategy shouldn't
    break the key)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(e).alias("n_dims"),
        F.element_at(e, 1).cast("double").alias("first_component"),
        F.array_max(e).cast("double").alias("max_component"),
        F.size(F.array_distinct(e)).alias("n_distinct"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            F.slice(e, 1, 8), F.lit(0.0), lambda a, x: a + dbl(x)
        ).alias("sum_first8"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + dbl(x) * dbl(x)), 9
        ).alias("norm_sq"),
        F.array_contains(e, F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: props JSON parsed to MapType (from_json), then
    map_keys / element_at. The map is built once per row in the JVM —
    at 100 TB prefer extracting needed keys directly (fn_json) over
    materializing wide maps."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return events.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.missing') AS missing_path,
           (json_valid(props)) AS is_valid_json
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: get_json_object returns STRING (DuckDB
    json_extract returns JSON) → both sides cast '$.k' to INT to align
    the schema (SURVEY §3.1b).

    is_valid_json is TRUE JSON validity via Spark 4's try_parse_json
    (round-13 review batch F: the old from_json map<string,int> probe
    tested "parses as an int-valued object", so a valid scalar/array
    JSON — or a NULL — read false while DuckDB's json_valid read
    true/NULL; probed equal on objects, scalars, arrays, and garbage,
    with the NULL row made explicit on the engine side because
    try_parse_json(NULL) IS NOT NULL collapses to false, not NULL)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.when(
            F.col("props").isNull(), F.lit(None).cast("boolean")
        )
        .otherwise(F.expr("try_parse_json(props) IS NOT NULL"))
        .alias("is_valid_json"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_text,
           COUNT(DISTINCT md5(text)) AS n_distinct_md5,
           COUNT(DISTINCT text) AS n_distinct_xxhash64,
           COUNT(DISTINCT text) AS n_distinct_crc32,
           min(md5(text)) AS min_md5,
           min(sha256(text)) AS min_sha256
    FROM documents
    GROUP BY source
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family. md5/sha2-256 hash-match DuckDB directly (identical
    lowercase hex, probed). xxhash64 and crc32 have no DuckDB twin, so
    they are checked through a cardinality invariant instead: their
    per-source distinct count must equal the distinct-text count (i.e.
    collision-free injection on the corpus — the property a dedup
    pipeline actually relies on); the oracle pins that value with
    COUNT(DISTINCT text). A Spark-side collision would break the match."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_text"),
        F.countDistinct(F.md5("text")).alias("n_distinct_md5"),
        F.countDistinct(F.xxhash64("text")).alias("n_distinct_xxhash64"),
        F.countDistinct(F.crc32("text")).alias("n_distinct_crc32"),
        F.min(F.md5("text")).alias("min_md5"),
        F.min(F.sha2("text", 256)).alias("min_sha256"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           {'key': o_orderkey, 'price': o_totalprice}.price
             AS price_from_struct,
           {'status': o_orderstatus,
            'inner': {'d': o_orderdate}}.inner.d AS date_from_nested,
           (ROW(o_orderstatus, o_totalprice) >
            ROW('O', 150000.0::DOUBLE)) AS cmp_flag,
           (ROW(o_orderstatus, o_custkey) =
            ROW(o_orderstatus, o_custkey)) AS self_eq
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family — the §2.6 composite-type surface the other fn_*
    keys don't touch: construction (struct / named_struct), field
    access (getField), NESTING (struct inside struct, two-level
    access), and lexicographic struct COMPARISON (field order = compare
    order on both engines — Spark compares StructType values fieldwise
    left-to-right exactly like DuckDB's ROW comparison; the pinned
    cmp_flag exercises a string field deciding before a double field
    gets consulted, plus the tie path falling through to the second
    field).

    Everything is JVM-side codegen (no shuffle, no Python): at 100 TB
    this is a pure map stage, and the optimizer prunes unaccessed
    struct fields from the scan (nested-schema pruning) — accessing
    only `.inner.d` never materializes the sibling fields."""
    orders = load_table(spark, sf_dir, "orders")
    pair = F.struct(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    nested = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.struct(F.col("o_orderdate").alias("d")).alias("inner"),
    )
    cmp_ref = F.struct(
        F.lit("O").alias("status"), F.lit(150000.0).alias("price")
    )
    return orders.select(
        "o_orderkey",
        pair.getField("price").alias("price_from_struct"),
        nested.getField("inner").getField("d").alias("date_from_nested"),
        (
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("price"),
            )
            > cmp_ref
        ).alias("cmp_flag"),
        (
            F.struct("o_orderstatus", "o_custkey")
            == F.struct("o_orderstatus", "o_custkey")
        ).alias("self_eq"),
    )


@register(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://ex' || (doc_id % 7) || '.example.com/docs/'
               || doc_id || '?q=' || lang || '&page=' || (doc_id % 13)
               || '#frag' || (doc_id % 3) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'q=([^&#]*)', 1) AS q_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family — completes the §2.8 string surface with
    Spark's dedicated `parse_url` (PROTOCOL / HOST / PATH / QUERY /
    per-key QUERY / REF), the parser every clickstream or crawl
    pipeline leans on. The fixture has no URL column, so URLs are
    CONSTRUCTED deterministically from doc_id and lang (same
    expression both engines — the llm_pii_redact injection
    discipline); what is under test is the PARSING. DuckDB has no
    parse_url, so the oracle re-derives each component with anchored
    RE2 regexes — an independent second implementation, which is
    exactly what makes the equality meaningful: Spark's Java URI
    parser and the regex spec must agree on every component, on
    every row.

    Plan: construction + parsing are one zero-shuffle codegen map
    stage (parse_url is a JVM intrinsic; no Python, no UDF)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    url = F.concat(
        F.lit("https://ex"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("lang"),
        F.lit("&page="),
        (F.col("doc_id") % 13).cast("string"),
        F.lit("#frag"),
        (F.col("doc_id") % 3).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q")).alias(
            "q_param"
        ),
        F.parse_url(F.col("url"), F.lit("REF")).alias("fragment"),
    )
