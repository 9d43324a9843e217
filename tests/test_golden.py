"""Golden fixture facts (SURVEY §5.2 #4, pinned from FIXTURES.md).

Regression pins on the driver-generated data: if the fixtures drift,
every oracle-parity assumption (dup structure, unit norms, JSON shape)
drifts with them — these tests localize that failure instead of letting
it surface as a mysterious hash mismatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climateiq_pipelines_spark.registry import load_table

from tests.conftest import SF_MED, SF_SMALL

ROW_COUNTS = {
    SF_SMALL: {
        "region": 5, "nation": 25, "customer": 150, "supplier": 10,
        "part": 200, "orders": 1500, "lineitem": 6000, "events": 1000,
        "documents": 500, "embeddings": 500,
    },
    SF_MED: {
        "region": 5, "nation": 25, "customer": 1500, "supplier": 100,
        "part": 2000, "orders": 15000, "lineitem": 60000, "events": 10000,
        "documents": 500, "embeddings": 500,
    },
}


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_row_counts(spark, sf_dir):
    for table, expected in ROW_COUNTS[sf_dir].items():
        assert load_table(spark, sf_dir, table).count() == expected, table


def test_fk_zero_orphans(spark):
    """Referential integrity via the anti-join shape (FIXTURES: 0 orphans
    on every FK edge)."""
    li = load_table(spark, SF_MED, "lineitem")
    orders = load_table(spark, SF_MED, "orders")
    customer = load_table(spark, SF_MED, "customer")
    for fact, key, dim, dim_key in [
        (li, "l_orderkey", orders, "o_orderkey"),
        (li, "l_suppkey", load_table(spark, SF_MED, "supplier"), "s_suppkey"),
        (li, "l_partkey", load_table(spark, SF_MED, "part"), "p_partkey"),
        (orders, "o_custkey", customer, "c_custkey"),
    ]:
        orphans = fact.join(
            dim, fact[key] == dim[dim_key], "left_anti"
        ).count()
        assert orphans == 0, f"{key} has {orphans} orphans"


def test_documents_invariants(spark):
    docs = load_table(spark, SF_MED, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert vocab == 31
    bad_len = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad_len == 0


def test_events_props_shape(spark):
    events = load_table(spark, SF_MED, "events")
    bad = events.filter(
        ~F.col("props").rlike(r'^\{"k": -?[0-9]+\}$')
    ).count()
    assert bad == 0


def test_embeddings_unit_norm(spark):
    emb = load_table(spark, SF_MED, "embeddings")
    stats = emb.select(
        F.size("embedding").alias("dims"),
        F.abs(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            )
            - 1.0
        ).alias("norm_dev"),
    ).agg(
        F.min("dims").alias("min_d"),
        F.max("dims").alias("max_d"),
        F.max("norm_dev").alias("max_dev"),
    ).head()
    assert stats["min_d"] == 64 and stats["max_d"] == 64
    assert stats["max_dev"] < 1e-6


def test_sf01_duplicate_structure(spark):
    """The dedup keys' ground truth: sf0.1 has 5000 docs / 4992 distinct
    texts (FIXTURES)."""
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    assert docs.count() == 5000
    assert docs.select("text").distinct().count() == 4992
