"""Float-determinism and oracle-parity helpers (SURVEY §7.4 policy).

Double summation is association-order dependent: Spark's partial/final
aggregation over shuffled partitions and DuckDB's single-node sum will
disagree in final ulps, which breaks the driver's value-hash. Policy:

- Every SUM/AVG over a double measure goes through a FIXED-POINT LONG
  accumulator: per row, floor(x * 1e6) as int64 ("micro units" — an
  IEEE-identical multiply+floor on both engines), summed exactly
  (integer addition is associative ⇒ partition-order independent), then
  converted back to double and divided by 1e6. Both engines convert
  their exact integer sum to double with IEEE round-to-nearest, so the
  final doubles are bit-identical.
- AVG = (integer-sum → double / 1e6) / COUNT — the identical expression
  tree on both sides.
- Library transcendentals (exp/ln/pow/…) may differ between the JVM and
  DuckDB's libm in the last ulp → round those outputs (`fin`).

Why long-micros and not a decimal accumulator: decimal(25,6) exceeds
64-bit unscaled range, so Spark aggregates it on the BigDecimal slow
path — measured 3× slower than long-micros on the Q1 shape at sf0.1
(1.43 s vs 0.45 s; BASELINE.md). The long path stays inside whole-stage
codegen as primitive ops.

Capacity / scale note: the accumulator holds Σ|x|·1e6 per group; with
money-scale values (~1e5 → 1e11 micro-units/row) it is exact up to
~9·10^7 rows per group (2^63 bound), and Spark 4's default ANSI mode
makes the boundary LOUD (ARITHMETIC_OVERFLOW), never a silent wrap.
Beyond that — e.g. national-scale groups at 100 TB — the standard
recipe is the TWO-LEVEL SUM: partial long-micro sums grouped by
(keys, spark_partition_id()) — bounded by partition size
(maxPartitionBytes), so the hot codegen path can never overflow at ANY
total scale — then a decimal(38,0) merge over the tiny
|groups|×|partitions| relation.  agg_pricing_summary (the TPC-H Q1
headline) runs this form live since round 14 (+0.07 s fixed overhead
at sf0.1, the extra merge stage; the decimal-everywhere alternative
measured 3× on the same shape).  Round 15 extended it to every
remaining ANALYTICS key whose groups are table-fraction-sized:
agg_conditional_filter (~SF 1e5 single-level ceiling at events value
scale), agg_rollup (grand total ~SF 60 — the earliest-binding site in
the repo), agg_unpivot_melt (~SF 400), join_multikey /
join_bucketed_colocated (~SF 1e3), join_salted_skew (~SF 1e5),
q7/q8/q9 (fact-fraction nation/year groups), q14 (~SF 4e3), and the
global bands q17/q19 (~SF 4e4) — all 12 hash-matched against their
UNCHANGED single-level oracles (DuckDB sums BIGINT into HUGEINT, so
the oracle side never had the ceiling) at all three SFs.

Round 16 converted the last table-fraction-group class — the
sources/lakehouse/format audit tails (scans.py roundtrips +
sink_partitioned_parquet + sink_merge_upsert, lakehouse.py
merge_on_read/time_travel, formats_ext.py csv_malformed /
schema_evolution / dynamic_partition_pruning, manifest_read.py,
lakehouse_txn.py's three txn keys — 14 keys, ~SF 200-1000
single-level ceilings) — via :func:`two_level`, which packages the
partial/merge pair for the audit-tail shape so each site stays one
declarative call.  Oracles unchanged (DuckDB sums BIGINT into
HUGEINT; its side never had the ceiling).

Level-1 bound fine print: the long partial is bounded by PARTITION
mass, and what bounds a partition depends on where the partial runs.
Scan-side sites (Q1, the sources wave) are bounded by
spark.sql.files.maxPartitionBytes.  POST-JOIN sites (join_multikey,
join_salted_skew, join_bucketed_colocated) inherit their partition
size from shuffle/AQE output sizing instead — an upstream
coalesce(1), a disabled AQE skew split, or a pathological skewed key
re-introduces a per-partition ceiling there (loud via ANSI
ARITHMETIC_OVERFLOW, never silent).  Review rule: any change that
coarsens partitioning upstream of those three keys' partial stage
needs a second look at the partial's mass bound.

Single-level dsum/davg remain, deliberately, in two classes:
(1) BOUNDED-group keys — per-order (join_shuffle_fact, q3), per
    (part, supp) (q2, q20), per-customer (q10), per-supplier (q15):
    group size is a TPC-H constant independent of SF, no ceiling.
(2) stream_tumbling_window's davg: per-window row counts are bounded
    by event rate × window length in a real stream; the batch fixture
    ceiling (~SF 1e5 at value scale) is documented rather than
    converted to keep the key a faithful streaming shape.
q11 shows the decimal(38,0) direct-sum form where the input relation
is small.  The moments oracle (aggregates._MOM) shows the decimal
form for squared measures whose magnitude exceeds the long budget at
any cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Kept for the few aggregates (squared measures) that exceed the
# long-micro range and accept the BigDecimal slow path instead.
DEC = "decimal(25,6)"

# Merge type of the two-level sum (module docstring): wide enough that
# Σ over per-partition long partials cannot overflow at any SF (the
# q11 precedent type).
DEC38 = "decimal(38,0)"

_SCALE = 1_000_000


def dsum(col: Column, alias: str) -> Column:
    """Exact, engine-independent SUM of a double expression
    (fixed-point micro-units; see module docstring for the range bound).
    """
    return (F.sum(F.floor(col * _SCALE)).cast("double") / F.lit(float(_SCALE))).alias(
        alias
    )


def davg(col: Column, alias: str) -> Column:
    """Exact-sum mean: micro-unit sum / 1e6 / count, bit-stable across
    engines and partition layouts."""
    return (
        F.sum(F.floor(col * _SCALE)).cast("double") / F.lit(float(_SCALE)) / F.count(col)
    ).alias(alias)


def dsum_merge(partial: Column | str, alias: str) -> Column:
    """Final stage of the TWO-LEVEL exact sum (module docstring): merge
    per-(keys, partition) long-micro partials as decimal(38,0) —
    overflow-free at any SF — and convert to double exactly like
    :func:`dsum`'s tail, so the hash-parity expression is unchanged."""
    c = F.col(partial) if isinstance(partial, str) else partial
    return (F.sum(c.cast(DEC38)).cast("double") / F.lit(float(_SCALE))).alias(
        alias
    )


def davg_merge(partial: Column | str, n: Column | str, alias: str) -> Column:
    """Two-level twin of :func:`davg`: decimal merge of long-micro
    partials divided by the merged non-null count — the same
    ((sum→double)/1e6)/count expression tree as the single-level form,
    so the final double is bit-identical."""
    c = F.col(partial) if isinstance(partial, str) else partial
    return (
        F.sum(c.cast(DEC38)).cast("double")
        / F.lit(float(_SCALE))
        / F.sum(n)
    ).alias(alias)


def two_level(df: DataFrame, keys, aggs) -> DataFrame:
    """TWO-LEVEL exact aggregation (module docstring recipe) packaged
    for the audit-tail shape ``groupBy(keys).agg(count, dsum, …)`` the
    sources/lakehouse/format keys share — each site declares WHAT it
    audits and this builds the overflow-free partial/merge pair.

    ``keys``: groupBy columns (names or aliased Column expressions;
    ``[]`` for a global aggregate).  ``aggs``: ordered specs, one
    output column each —

    - ``("count", alias)`` — exact COUNT(*)
    - ``("countc", col, alias)`` — COUNT(col) (non-null / conditional)
    - ``("lsum", col, alias)`` — integer SUM with COALESCE(…, 0), the
      key-checksum shape (same 2^63 merge bound as the BIGINT oracle)
    - ``("dsum", col, alias)`` / ``("davg", col, alias)`` — two-level
      exact micro-sum / exact-sum mean (the point of the exercise)
    - ``("min", col, alias)`` / ``("max", col, alias)`` — order stats
      (merge trivially: min of partial mins)
    - ``("cdistinct", col, alias)`` — COUNT(DISTINCT col) for BOUNDED
      domains only: partials carry collect_set(col) and the merge
      flattens + dedups, so per-partition state is O(|domain|) — used
      by scan_schema_evolution (25 p_brand values), never for
      unbounded columns
    - ``("lit", col, alias)`` — a constant column attached at the
      merge stage (the txn keys' n_versions-style audit literals)

    Level 1 groups by (keys…, spark_partition_id()) and computes only
    codegen-primitive partials bounded by partition mass; level 2
    merges the tiny |groups|×|partitions| relation with decimal(38,0)
    sums (``dsum_merge``/``davg_merge``), so the final double
    expression trees — and therefore oracle hash parity and layout
    determinism — are identical to the single-level forms they
    replaced.  The partition-id key affects only which exact integers
    get pre-summed; integer addition is associative, so results are
    layout-independent (pinned by tests/test_two_level_sum.py)."""
    partial_aggs: list[Column] = []
    merge_aggs: list[Column] = []
    for i, spec in enumerate(aggs):
        kind, alias = spec[0], spec[-1]
        p = f"_p{i}"
        if kind == "count":
            partial_aggs.append(F.count(F.lit(1)).alias(p))
            merge_aggs.append(
                F.coalesce(F.sum(p), F.lit(0)).cast("long").alias(alias)
            )
        elif kind == "countc":
            partial_aggs.append(F.count(spec[1]).alias(p))
            merge_aggs.append(
                F.coalesce(F.sum(p), F.lit(0)).cast("long").alias(alias)
            )
        elif kind == "lsum":
            partial_aggs.append(F.sum(spec[1]).alias(p))
            merge_aggs.append(
                F.coalesce(F.sum(p), F.lit(0)).cast("long").alias(alias)
            )
        elif kind == "dsum":
            partial_aggs.append(F.sum(micros(spec[1])).alias(p))
            merge_aggs.append(dsum_merge(p, alias))
        elif kind == "davg":
            n = f"_n{i}"
            partial_aggs.append(F.sum(micros(spec[1])).alias(p))
            partial_aggs.append(F.count(spec[1]).alias(n))
            merge_aggs.append(davg_merge(p, n, alias))
        elif kind == "min":
            partial_aggs.append(F.min(spec[1]).alias(p))
            merge_aggs.append(F.min(p).alias(alias))
        elif kind == "max":
            partial_aggs.append(F.max(spec[1]).alias(p))
            merge_aggs.append(F.max(p).alias(alias))
        elif kind == "cdistinct":
            partial_aggs.append(F.collect_set(spec[1]).alias(p))
            merge_aggs.append(
                F.size(F.array_distinct(F.flatten(F.collect_set(p))))
                .cast("long")
                .alias(alias)
            )
        elif kind == "lit":
            merge_aggs.append(
                (F.col(spec[1]) if isinstance(spec[1], str) else spec[1]).alias(
                    alias
                )
            )
        else:
            raise ValueError(f"unknown two_level agg kind: {kind!r}")
    partials = df.groupBy(
        *keys, F.spark_partition_id().alias("_pid")
    ).agg(*partial_aggs)
    # the key columns' OUTPUT names (aliased expressions included) are
    # the first len(keys) columns of the partial relation, _pid next
    key_names = partials.columns[: len(keys)]
    return partials.groupBy(*key_names).agg(*merge_aggs)


def micros(col: Column) -> Column:
    """floor(col * the fixed-point scale) — the raw micro-unit term
    every dsum/davg accumulates.  Exported (round-13 review batch F) so
    window/decimal variants stop hand-inlining 1_000_000 next to an
    oracle built from sql_dsum — the scale-drift class the SPLIT_SALT
    note records."""
    return F.floor(col * _SCALE)


def davg_window(col: Column, w) -> Column:
    """Window twin of :func:`davg`: exact micro-sum mean over a window
    frame (q17's per-part average threshold shape)."""
    return (
        F.sum(micros(col)).over(w).cast("double")
        / F.lit(float(_SCALE))
        / F.count(F.lit(1)).over(w)
    )


def fin(col: Column, alias: str, places: int = 6) -> Column:
    """Round a float output whose producer is library-dependent."""
    return F.round(col, places).alias(alias)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` (without alias)."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0)"
    )


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg` (without alias)."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 / COUNT({expr}))"
    )


REVENUE = "l_extendedprice * (1 - l_discount)"


def revenue_col() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# Deterministic 3-way dataset-split contract, keyed on
# md5(doc_id:SPLIT_SALT): first hex nibble < 13 -> train (~81%),
# = 13 -> val (~6%), > 13 -> test (~13%).  Lives HERE — a module that
# registers nothing — because llm_dataset_split (corpus_quality_ext)
# AND the train/eval keys (ml_train_ext) share it, and an oracle
# builder importing another OPERATOR module registers that module's
# keys as an import side effect (the round-7 certification-window
# incident; round-12 review found the contract parked in
# corpus_quality_ext with the salt BAKED into the SQL literal, so
# changing SPLIT_SALT would silently desync engine from oracle).
SPLIT_SALT = "split"
SQL_SPLIT_NIBBLE = (
    f"(ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 1)) - "
    f"CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 1))"
    " >= 97 THEN 87 ELSE 48 END)"
)
