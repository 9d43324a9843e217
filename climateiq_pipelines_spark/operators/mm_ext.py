"""Round-3 multimodal extension — file-based binary ingestion via
Spark's built-in ``binaryFile`` source. Loaded after the driver's
50-entry correctness window (plans.load_all); covered by
tools/driver_sim.py.

operators/multimodal.py processes payloads that already sit in a table
column; real image/audio corpora usually START as loose files in object
storage. This module exercises that first hop: payload files written
executor-side, ingested with ``spark.read.format("binaryFile")``, and
audited against the source-of-truth table without ever decoding.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "mm_binary_file_scan",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_digest
    FROM documents
    """,
)
def mm_binary_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based multimodal ingestion, end to end:

    1. WRITE: each executor partition writes its documents' payload
       bytes as one ``<doc_id>.bin`` file (foreachPartition — file
       emission is inherently per-file work; on a cluster the target is
       object storage, locally a shared temp dir cleaned at exit).
    2. INGEST: ``spark.read.format("binaryFile")`` lists the directory
       and yields (path, modificationTime, length, content) — Spark's
       built-in source for image/audio corpora.
    3. AUDIT without decoding: doc_id parsed from the file name, length
       and md5(content) computed JVM-side, hash-checked against the
       source-of-truth table — proving the write→list→read round-trip
       is lossless byte-for-byte.

    Scale: the listing parallelizes over files; content never shuffles
    (digest/length are map-side); metadata predicates (e.g. length
    bounds, path globs) prune before bytes are touched — pushed into
    the binaryFile source via pathGlobFilter at 10^9-file scale, where
    a manifest table replaces raw listings."""
    out = tempfile.mkdtemp(prefix="cps_binfiles")
    atexit.register(shutil.rmtree, out, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def write_files(rows) -> None:
        for row in rows:
            with open(os.path.join(out, f"{row['doc_id']}.bin"), "wb") as fh:
                fh.write(bytes(row["payload"]))

    docs.foreachPartition(write_files)

    binfiles = spark.read.format("binaryFile").load(out)
    return binfiles.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_digest"),
    )
