"""Multimodal binary-column operators — image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas``.

The container ships no image libraries, so the codec is IN-REPO (r6):
``_decode_image`` natively parses binary P6 PPM — real header parsing
and a real bytes→(h,w,3) pixel raster, exercised end-to-end by
``mm_ppm_decode`` against a byte-arithmetic SQL oracle — and falls
through to Pillow for other formats when importable. The byte-stat
keys (``mm_decode_features`` etc.) keep their deterministic byte-level
contracts so the Spark-side plumbing — binary Arrow columns, metadata
structs, UDF batch shape, fixed-width feature vectors, frame sampling
explode — stays oracle-checked independently of any codec. Swapping in
Pillow/ffmpeg for richer formats changes one function, not the
pipeline.

Scale notes: binary payloads dominate row width, so every plan here
(a) prunes metadata-only predicates BEFORE touching bytes, and (b)
keeps payloads out of shuffles — features are extracted map-side and
only the small typed outputs flow onward. At 100 TB the payload column
lives in its own parquet files (or object-store refs) and these plans
are unchanged.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

# mm_ppm_decode image geometry: 16x16 RGB = 768 raster bytes.
_PPM_W = 16
_PPM_H = 16
_PPM_RASTER = _PPM_W * _PPM_H * 3


def _decode_image(payload: bytes) -> dict:
    """REAL image decode (r6; was a NotImplementedError stub): binary
    P6 PPM payloads are parsed natively — ASCII header (magic, width,
    height, maxval) then the binary RGB raster into an (h, w, 3) uint8
    array — with no external codec; any other format falls through to
    Pillow when importable. Returns {width, height, maxval, px}."""
    if payload[:2] == b"P6":
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if not m:
            raise ValueError("malformed P6 header")
        w, h, maxval = (int(g) for g in m.groups())
        raster = payload[m.end() : m.end() + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError(
                f"truncated P6 raster: want {w * h * 3}, got {len(raster)}"
            )
        px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
        return {"width": w, "height": h, "maxval": maxval, "px": px}
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise ValueError(
            f"unsupported image format {payload[:4]!r} and no external "
            "codec importable in this environment (P6 PPM decodes "
            "natively)"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return {
        "width": img.width,
        "height": img.height,
        "maxval": 255,
        "px": np.asarray(img),
    }


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
      SELECT doc_id,
             encode(regexp_replace(text, '[^ -~]', '', 'g')) AS payload
      FROM documents
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

    The oracle recomputes the same statistics in SQL over the SAME
    printable-ASCII projection of the text (round-13 review, the
    mm_wav_decode ADVICE-r6 precedent): chars == bytes by construction
    on both engines, so per-character ascii() == per-byte value even if
    a regenerated fixture carries non-ASCII text — without the
    projection the engine's per-UTF-8-byte stats and the oracle's
    per-character codepoints silently diverge.  An empty payload (a doc
    whose text is entirely non-printable) fails LOUDLY with the doc_id
    named instead of crashing min() with an opaque executor trace."""

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
                if not b:
                    raise ValueError(
                        f"mm_decode_features: doc {doc_id} has an empty "
                        "payload after the printable-ASCII projection — "
                        "byte statistics are undefined on zero bytes"
                    )
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
    payloads = docs.select(
        "doc_id",
        F.encode(
            F.regexp_replace("text", "[^ -~]", ""), "UTF-8"
        ).alias("payload"),
    )
    return payloads.mapInPandas(extract, schema)


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, frame_id,
           octet_length(frame_bytes) AS frame_len,
           -- first-CHAR codepoint from the TEXT slice (round-13
           -- review): casting the BLOB back to VARCHAR backslash-
           -- escapes non-printable bytes (a 0x09 tab renders '\\x09',
           -- ascii -> 92 not 9), so the old blob-cast form diverged
           -- from Spark's F.ascii(frame_text) on any non-printable
           -- frame head; both engines now read the same char.
           CAST(ascii(substr(frame_text, 1, 1)) AS INTEGER)
             AS frame_first_byte
    FROM (
      SELECT doc_id,
             CAST(k AS INTEGER) AS frame_id,
             substr(text, 1 + k * 64, 64) AS frame_text,
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


_PPM_ORACLE = f"""
    WITH px AS (
      SELECT doc_id,
             substr(rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                         {_PPM_RASTER}, 'x'), 1, {_PPM_RASTER}) AS pix
      FROM documents
    ),
    b AS (
      SELECT doc_id, i, ascii(substr(pix, CAST(i AS INTEGER), 1)) AS code
      FROM px CROSS JOIN (SELECT unnest(range(1, {_PPM_RASTER} + 1)) AS i)
    )
    SELECT doc_id,
           {_PPM_W} AS width, {_PPM_H} AS height, 255 AS maxval,
           {_PPM_W * _PPM_H} AS n_pixels,
           CAST(SUM(CASE WHEN (i - 1) % 3 = 0 THEN code END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN (i - 1) % 3 = 1 THEN code END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN (i - 1) % 3 = 2 THEN code END) AS BIGINT) AS b_sum
    FROM b
    GROUP BY doc_id
"""


@register("mm_ppm_decode", oracle=_PPM_ORACLE)
def mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (r6): build a valid binary P6 PPM
    per document JVM-side (ASCII header + a 16x16 RGB raster whose
    bytes come from the doc text, right-padded with 'x' — the fixture
    corpus is pure ASCII so char position == byte position), ship the
    binary column through Arrow, parse it in Python with the repo's
    native P6 codec (_decode_image: header regex + frombuffer raster,
    no external library), and emit per-channel pixel statistics.

    The oracle recomputes the channel sums with pure byte arithmetic in
    SQL (byte i belongs to channel (i-1) mod 3), so a codec that
    misparses the header, mis-slices the raster, or transposes channels
    hash-mismatches. This upgrades the multimodal family from
    byte-stat fakes to a real bytes→pixels decode while keeping the
    same scale shape: payloads are built and kept map-side, only the
    fixed-width feature row flows onward."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("maxval", T.IntegerType()),
            T.StructField("n_pixels", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
        ]
    )

    docs = load_table(spark, sf_dir, "documents")
    # Printable-ASCII projection BEFORE the fixed-width slice (round-13
    # review, the mm_wav_decode ADVICE-r6 precedent): rpad/substring
    # count CHARS while the P6 header declares BYTES, so one non-ASCII
    # char in the first 768 positions would shift every later raster
    # byte — the decode still "succeeds" (extra trailing bytes are
    # ignored) but r/g/b sums are silently wrong vs the oracle's
    # per-character arithmetic.  chars == bytes by construction.
    clean_txt = F.regexp_replace(F.col("text"), "[^ -~]", "")
    raster_txt = F.substring(
        F.rpad(clean_txt, _PPM_RASTER, "x"), 1, _PPM_RASTER
    )
    header = F.lit(f"P6\n{_PPM_W} {_PPM_H}\n255\n")
    payload = F.encode(F.concat(header, raster_txt), "UTF-8")
    frames = docs.select("doc_id", payload.alias("payload"))

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                d = _decode_image(bytes(pl))
                px = d["px"].astype(np.int64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "maxval": d["maxval"],
                        "n_pixels": d["width"] * d["height"],
                        "r_sum": int(px[:, :, 0].sum()),
                        "g_sum": int(px[:, :, 1].sum()),
                        "b_sum": int(px[:, :, 2].sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=list(schema.fieldNames()))

    return frames.mapInPandas(decode, schema)


def _decode_wav(payload: bytes) -> dict:
    """REAL audio decode (r6b): RIFF/WAVE PCM payloads parsed natively —
    RIFF container walk (chunk id + little-endian size, word-aligned),
    fmt validation (PCM, 16-bit), data chunk into an (n, channels)
    int16 array — no external codec. Malformed containers fail loudly
    (bad magic, truncated chunk, missing fmt/data, non-PCM), never
    return garbage samples. Returns {n_channels, sample_rate, samples}.
    """
    import struct

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"truncated {cid!r} chunk: want {sz}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _brate, _block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    if n_ch < 1 or len(data) % (2 * n_ch) != 0:
        raise ValueError("data chunk not a whole number of frames")
    samples = np.frombuffer(data, "<i2").reshape(-1, n_ch)
    return {"n_channels": n_ch, "sample_rate": rate, "samples": samples}
