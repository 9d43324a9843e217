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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    # Registered for post-consumption reclaim (release_blocks purges it
    # once the harness has consumed the read-back result; the session
    # atexit hook covers non-reclaiming processes).
    from climateiq_pipelines_spark.session import new_temp_dir

    out = new_temp_dir("binfiles")

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
        # (-?\d+): the old \d+-only pattern silently stripped a minus
        # sign, so a negative doc_id round-tripped as its absolute
        # value — wrong key instead of a loud parse failure (round-13
        # review; fixture ids are dense 0..N-1 today, so latent).
        F.regexp_extract(F.col("path"), r"(-?\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_digest"),
    )


# mm_wav_decode geometry: 256 mono PCM16 samples = 512 data bytes. The
# header is CONSTANT byte-for-byte (fixed geometry), so it ships as one
# binary literal; sample bytes come from the doc text (pure ASCII, so
# char position == byte position and every sample is nonnegative — the
# negative/two's-complement path is property-tested on arbitrary bytes
# in tests/test_properties_r6b.py).
_WAV_N = 256
_WAV_DATA = _WAV_N * 2


def _wav_header() -> bytes:
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + _WAV_DATA)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", _WAV_DATA)
    )


_WAV_ORACLE = f"""
    WITH px AS (
      SELECT doc_id,
             rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                  {_WAV_DATA}, 'x') AS d
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             ascii(substr(d, CAST(2 * i + 1 AS INTEGER), 1))
               + 256 * ascii(substr(d, CAST(2 * i + 2 AS INTEGER), 1))
               AS v
      FROM px CROSS JOIN (SELECT unnest(range(0, {_WAV_N})) AS i)
    ),
    t AS (
      SELECT doc_id, CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS v
      FROM s
    )
    SELECT doc_id,
           1 AS n_channels, 8000 AS sample_rate,
           {_WAV_N} AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_amp,
           CAST(MIN(v) AS BIGINT) AS min_amp,
           CAST(MAX(v) AS BIGINT) AS max_amp,
           CAST(SUM(v * v) AS BIGINT) AS energy
    FROM t GROUP BY doc_id
"""


@register("mm_wav_decode", oracle=_WAV_ORACLE)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (r6b, the WAV twin of
    mm_ppm_decode): build a valid RIFF/WAVE PCM16 mono payload per
    document JVM-side (constant 44-byte header literal + a 512-byte
    data chunk whose bytes come from the doc text, right-padded with
    'x'), ship the binary column through Arrow, parse it in Python
    with the repo's native RIFF codec (_decode_wav: container walk +
    fmt validation + frombuffer int16 LE), and emit per-track sample
    statistics (sum / min / max / integer energy — no float ever).

    The oracle reassembles each little-endian sample from its two
    text bytes with pure arithmetic in SQL (lo + 256·hi, two's
    complement fold at 32768), so a codec that misparses the
    container, drops the word-alignment rule, or byte-swaps samples
    hash-mismatches. With mm_ppm_decode this completes the
    image+audio codec pair over the same Arrow plumbing; scale shape
    unchanged — payloads built and decoded map-side, only the
    fixed-width stats row flows onward."""
    from climateiq_pipelines_spark.operators.multimodal import _decode_wav

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sum_amp", T.LongType()),
            T.StructField("min_amp", T.LongType()),
            T.StructField("max_amp", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )
    docs = load_table(spark, sf_dir, "documents")
    # ADVICE r6: the header declares a fixed 512-BYTE data chunk, but
    # rpad pads/truncates by CHARACTERS — any non-ASCII character would
    # make the UTF-8 payload longer than declared and break the codec
    # (and the oracle's per-char ascii() arithmetic). Project to the
    # printable-ASCII subset first (same RE2-compatible class on both
    # engines) so chars == bytes by construction.
    ascii_txt = F.regexp_replace(F.col("text"), "[^ -~]", "")
    data_txt = F.rpad(ascii_txt, _WAV_DATA, "x")
    payload = F.concat(
        F.lit(_wav_header()), F.encode(data_txt, "UTF-8")
    )
    tracks = docs.select("doc_id", payload.alias("payload"))

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                d = _decode_wav(bytes(pl))
                s = d["samples"].astype(np.int64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_channels": d["n_channels"],
                        "sample_rate": d["sample_rate"],
                        "n_samples": s.shape[0],
                        "sum_amp": int(s.sum()),
                        "min_amp": int(s.min()),
                        "max_amp": int(s.max()),
                        "energy": int((s * s).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=list(schema.fieldNames()))

    return tracks.mapInPandas(decode, schema)
