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

Single-level dsum/davg remain, deliberately, in three classes:
(1) BOUNDED-group keys — per-order (join_shuffle_fact, q3), per
    (part, supp) (q2, q20), per-customer (q10), per-supplier (q15):
    group size is a TPC-H constant independent of SF, no ceiling.
(2) The sources/lakehouse/format DEMO keys (scans.py, lakehouse.py,
    formats_ext.py, lakehouse_txn.py, manifest_read.py audit sums
    by o_orderpriority / l_returnflag / merge_action / o_year): these
    sum money-scale measures over table-fraction groups and carry the
    same ~SF 200-1000 single-level ceiling.  They are the
    pre-sequenced ROUND-16 conversion wave (SURVEY §11.8) — each is a
    one-aggregate audit tail over a format-mechanics key, kept
    single-level this round so the r15 certification window stays a
    coherent 12-key analytics batch.
(3) stream_tumbling_window's davg: per-window row counts are bounded
    by event rate × window length in a real stream; the batch fixture
    ceiling (~SF 1e5 at value scale) is documented rather than
    converted to keep the key a faithful streaming shape.
q11 shows the decimal(38,0) direct-sum form where the input relation
is small.  The moments oracle (aggregates._MOM) shows the decimal
form for squared measures whose magnitude exceeds the long budget at
any cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column
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
