"""The shared merge-demo SOURCE contract — one place for the business
constants and the Spark builder that sink_merge_upsert (scans.py,
copy-on-write) and the lakehouse merge-on-read/time-travel twins
(lakehouse.py) all merge against.

Round-13 review: the same constants (+100.0 on keys ≡ 0 mod 10, five
synthetic inserts beyond the max key at 50000.0, the broadcast-max-key
crossJoin idiom) were encoded twice in Spark and twice more in oracle
SQL — two keys claiming to be COW/MOR twins of the SAME logical merge
could silently drift onto different sources.  The builder lives in a
module that registers NOTHING (the fixedpoint.py discipline: importing
a sibling operator module for a helper registers its keys as an import
side effect and perturbs the pristine registration order gen_rotation
derives from).

Oracle texts interpolate the same constants; rendered SQL is
byte-identical to the pre-refactor strings (md5-checked in the round
log), so no registered oracle changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UPDATE_MOD = 10  # keys ≡ 0 (mod this) receive the price bump
UPDATE_BUMP = 100.0  # the WHEN MATCHED update: price + bump
N_INSERTS = 5  # synthetic NOT-MATCHED inserts beyond the max key
INSERT_PRICE = 50000.0  # their price


def merge_source(
    spark: SparkSession, orders: DataFrame, priority_lit: str | None = None
) -> DataFrame:
    """The demo merge source: updated rows (key ≡ 0 mod UPDATE_MOD,
    price + UPDATE_BUMP) UNION N_INSERTS synthetic inserts keyed past
    the current max (1-row max-key aggregate broadcast into the
    insert-generator crossJoin — constant-sized at any base scale).
    ``priority_lit`` adds the o_orderpriority column the MOR twin
    carries (inserts get the literal; updates keep their own)."""
    ucols = [
        F.col("o_orderkey"),
        (F.col("o_totalprice") + UPDATE_BUMP).alias("o_totalprice"),
    ]
    icols = [
        (F.col("mk") + 1 + F.col("id")).alias("o_orderkey"),
        F.lit(INSERT_PRICE).alias("o_totalprice"),
    ]
    if priority_lit is not None:
        ucols.append(F.col("o_orderpriority"))
        icols.append(F.lit(priority_lit).alias("o_orderpriority"))
    updates = orders.filter(F.col("o_orderkey") % UPDATE_MOD == 0).select(
        *ucols
    )
    max_key = orders.agg(F.max("o_orderkey").alias("mk"))
    inserts = (
        spark.range(N_INSERTS).crossJoin(F.broadcast(max_key)).select(*icols)
    )
    return updates.unionByName(inserts)
