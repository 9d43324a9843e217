"""Multimodal binary-column operators — image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a stub:
``_decode_image`` raises ``NotImplementedError`` unless a real codec
(Pillow) is importable, and the shipped keys use a DETERMINISTIC FAKE
decoder (byte-level statistics) so the Spark-side plumbing — binary
Arrow columns, metadata structs, UDF batch shape, fixed-width feature
vectors, frame sampling explode — is real and oracle-checked end to
end. Swapping the fake for Pillow/ffmpeg changes one function, not the
pipeline.

Scale notes: binary payloads dominate row width, so every plan here
(a) prunes metadata-only predicates BEFORE touching bytes, and (b)
keeps payloads out of shuffles — features are extracted map-side and
only the small typed outputs flow onward. At 100 TB the payload column
lives in its own parquet files (or object-store refs) and these plans
are unchanged.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


def _decode_image(payload: bytes):  # pragma: no cover - codec-gated
    """Real decode path, gated on an optional codec import. The fixture
    container ships no codecs, so the checked keys use the deterministic
    fake below; this function documents the swap point."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; checked keys "
            "use the deterministic byte-stat fake decoder"
        ) from exc
    return Image.open(io.BytesIO(payload))


@register(
    "mm_binary_ingest",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
           lang AS media_lang,
           (octet_length(encode(text)) > 300) AS is_large
    FROM documents
    """,
)
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest shape: attach an opaque binary payload (deterministic
    fake: the UTF-8 bytes of the doc text — the fixture has no real
    media) plus a typed metadata struct, then compute metadata WITHOUT
    decoding. The JVM-side byte ops (length, first byte) stand in for
    header sniffing; nothing crosses to Python. The binary column is
    dropped before output so no payload reaches the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("media_lang"),
            F.col("source").alias("media_source"),
        ).alias("meta"),
    )
    return with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.ascii(F.substring(F.decode("payload", "UTF-8"), 1, 1)).alias(
            "first_byte"
        ),
        F.col("meta.media_lang").alias("media_lang"),
        (F.octet_length("payload") > 300).alias("is_large"),
    )


_FEAT_ORACLE = """
    WITH payloads AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    )
    SELECT doc_id,
           octet_length(payload) AS n_bytes,
           CAST(SUM(code) AS BIGINT) AS byte_sum,
           CAST(min(code) AS INTEGER) AS byte_min,
           CAST(max(code) AS INTEGER) AS byte_max,
           COUNT(DISTINCT code) AS n_distinct_bytes
    FROM (
      SELECT doc_id, payload,
             ascii(unnest(string_split_regex(CAST(payload AS VARCHAR), ''))) AS code
      FROM payloads
    )
    GROUP BY doc_id, payload
"""


@register("mm_decode_features", oracle=_FEAT_ORACLE)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract over Arrow binary batches: each task
    receives binary payloads as pandas bytes objects and emits a
    fixed-shape feature row (the fake decoder computes byte statistics;
    a real one would emit embedding/pixel features of the same fixed
    width). This is the exact batch shape a GPU feature extractor
    plugs into — payloads stay map-side, only features flow on.

    The oracle recomputes the same statistics in SQL (payload bytes are
    UTF-8 text here, so per-character ascii() == per-byte value),
    proving the Python boundary loses nothing."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("byte_min", T.IntegerType()),
            T.StructField("byte_max", T.IntegerType()),
            T.StructField("n_distinct_bytes", T.LongType()),
        ]
    )

    def extract(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        "byte_sum": sum(b),
                        "byte_min": min(b),
                        "byte_max": max(b),
                        "n_distinct_bytes": len(set(b)),
                    }
                )
            yield pd.DataFrame(out, columns=list(schema.fieldNames()))

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(extract, schema)


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, frame_id,
           octet_length(frame_bytes) AS frame_len,
           CAST(ascii(substr(CAST(frame_bytes AS VARCHAR), 1, 1)) AS INTEGER)
             AS frame_first_byte
    FROM (
      SELECT doc_id,
             CAST(k AS INTEGER) AS frame_id,
             encode(substr(text, 1 + k * 64, 64)) AS frame_bytes
      FROM documents
      CROSS JOIN (SELECT unnest(range(0, 8)) AS k)
      WHERE k * 64 < length(text)
    )
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: slice each payload into fixed-width frames (64
    bytes standing in for video GOPs / audio windows), one output row
    per frame — the explode shape a frame-level model consumes.
    Implemented JVM-side (substr on binary via the text twin + explode
    of the frame index); the per-frame stats prove slicing parity.
    Scale: frames multiply row count ~8×, so the sampler runs AFTER
    metadata filters and never shuffles whole payloads."""
    docs = load_table(spark, sf_dir, "documents")
    frames = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("frame_id"),
    ).filter(F.col("frame_id") * 64 < F.length("text"))
    frame_text = F.substring(
        F.col("text"), F.col("frame_id") * 64 + 1, 64
    )
    return frames.select(
        "doc_id",
        "frame_id",
        F.octet_length(F.encode(frame_text, "UTF-8")).alias("frame_len"),
        F.ascii(frame_text).alias("frame_first_byte"),
    )
