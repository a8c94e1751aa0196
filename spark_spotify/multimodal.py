"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode / feature-extract stage as Arrow-batched ``mapInPandas``.

Design (the 100 TB pattern): media lives as an opaque ``binary`` column with
typed metadata alongside; decode/resize/frame-sample run as vectorized
pandas-batch operators so each task touches one Arrow batch at a time and the
JVM never materializes decoded frames.  Real codecs (PIL/librosa/av) are not
in this container, so ``decode_media`` gates them behind import-try and falls
back to a deterministic metadata-derived fake — the Spark-side plumbing
(schema, batch iteration, partitioning) is real and oracle-checked; only the
pixel math is stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload_bytes int, "
    "width int, height int, n_frames int"
)


def build_media_table(docs: DataFrame) -> DataFrame:
    """documents -> media table: payload as binary + typed metadata.
    (In production this column holds image/audio bytes; here the doc text
    stands in as the payload.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("source") == "src0", "image")
        .when(F.col("source") == "src1", "audio")
        .otherwise("video")
        .alias("media_type"),
        F.octet_length(F.col("text")).alias("payload_bytes"),
    )


def _try_real_decode(payload: bytes, media_type: str):
    """Real decode path — requires codec libs absent from this container."""
    raise NotImplementedError(
        "real image/audio decode needs PIL/librosa; stubbed in this env"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode / feature-extract over the binary column.

    Yields per-batch metadata features; the fake decode derives dimensions
    deterministically from payload size so the full pipeline is testable
    end-to-end without codecs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            nbytes = pdf["payload"].map(len).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": nbytes,
                    "width": (nbytes % 640 + 32).astype("int32"),
                    "height": (nbytes * 7 % 480 + 32).astype("int32"),
                    "n_frames": (nbytes % 16 + 1).astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(build_media_table(docs))


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "out_w int, out_h int"
)
RESIZE_BOX = 224


def resize_media(decoded: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """Aspect-preserving fit-to-box resize plan, Arrow-batched.  The real
    pixel resample is part of the stubbed codec path; the dimension math is
    the genuine article (integer, so it reproduces exactly in any engine)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            landscape = w >= h
            out_w = landscape * box + (~landscape) * (box * w // h)
            out_h = landscape * (box * h // w) + (~landscape) * box
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                }
            )

    return decoded.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_feature int"
FRAME_STRIDE = 4


def sample_frames(decoded: DataFrame) -> DataFrame:
    """Stride frame-sampling for video rows — a row-expanding mapInPandas
    (1 input row -> ceil(n_frames/stride) frame rows); the per-frame feature
    is a deterministic hash standing in for the embedding a real extractor
    would emit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            rows = {"doc_id": [], "frame_no": [], "frame_feature": []}
            for doc_id, n_frames in zip(vids["doc_id"], vids["n_frames"]):
                for f in range(0, int(n_frames), FRAME_STRIDE):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(f)
                    rows["frame_feature"].append(
                        (int(doc_id) * 31 + f * 7) % 997
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_no": pd.Series(rows["frame_no"], dtype="int32"),
                    "frame_feature": pd.Series(
                        rows["frame_feature"], dtype="int32"
                    ),
                }
            )

    return decoded.mapInPandas(batches, schema=FRAME_SCHEMA)


ENERGY_FRAME = 64
ENERGY_SCHEMA = "doc_id bigint, frame_no int, energy bigint, peak int"


def frame_energy(media: DataFrame) -> DataFrame:
    """Audio-style windowed feature extraction over the raw binary payload:
    non-overlapping 64-byte frames, per-frame energy (sum of squared byte
    values) and peak byte — the RMS/peak pass an audio ingest pipeline runs
    before segmentation.  Unlike the decode stubs, this computes on the
    actual bytes: ``np.frombuffer`` -> reshape -> one vectorized
    matrix reduction per Arrow batch, no per-sample Python.  All-integer
    math (int64 sums of uint8 squares cannot overflow), so the output is
    exact and engine-portable — the DuckDB oracle rebuilds it from
    codepoint arithmetic on the ASCII payload.  Trailing partial frames are
    dropped (fixed-width frame contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids: list[int] = []
            fnos: list[int] = []
            energies: list[int] = []
            peaks: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = len(arr) // ENERGY_FRAME
                if n == 0:
                    continue
                m = (
                    arr[: n * ENERGY_FRAME]
                    .reshape(n, ENERGY_FRAME)
                    .astype(np.int64)
                )
                ids.extend([int(doc_id)] * n)
                fnos.extend(range(n))
                energies.extend((m * m).sum(axis=1).tolist())
                peaks.extend(m.max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=ENERGY_SCHEMA
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_media(decode_media(build_media_table(docs)))


def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_spotify.sources.tables import fan_out

    docs = load_table(spark, sf_dir, "documents")
    return frame_energy(build_media_table(fan_out(docs)))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(decode_media(build_media_table(docs)))


def q_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality exact dedup on the raw BINARY payload: md5 over the
    bytes (not a text normalization — byte-identical images/audio dedupe
    regardless of metadata), canonical copy elected as the lowest doc_id
    per fingerprint.  The binary twin of ``text_dedup_exact`` and the
    first pass every multimodal ingest runs before any decode: one hash
    per payload computed JVM-side at scan, one shuffle on the uniform
    128-bit fingerprint, no skew, no Python.

    The oracle hashes the same byte sequence (the payload is the UTF-8
    encoding of the doc text, so DuckDB's md5(text) sees identical
    bytes)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    media = build_media_table(docs)
    fp = F.md5(F.col("payload"))
    w = Window.partitionBy("payload_fp")
    return (
        media.select(
            "doc_id",
            "media_type",
            "payload_bytes",
            fp.alias("payload_fp"),
        )
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


ORACLE = {
    "mm_payload_dedup": """
WITH m AS (
  SELECT doc_id,
         CASE WHEN source = 'src0' THEN 'image'
              WHEN source = 'src1' THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(strlen(text) AS INT) AS payload_bytes,
         md5(text) AS payload_fp
  FROM documents
)
SELECT doc_id, media_type, payload_bytes, payload_fp,
       MIN(doc_id) OVER (PARTITION BY payload_fp) AS canonical_id,
       doc_id = MIN(doc_id) OVER (PARTITION BY payload_fp) AS is_canonical
FROM m
""",
    "mm_audio_energy": """
WITH f AS (
  SELECT doc_id, text, CAST(floor(length(text) / 64) AS INT) AS nf
  FROM documents
),
fr AS (
  SELECT doc_id, text, CAST(unnest(range(nf)) AS INT) AS frame_no FROM f
)
SELECT doc_id, frame_no,
  CAST(list_sum(list_transform(range(64),
      j -> ord(substr(text, frame_no * 64 + CAST(j AS INT) + 1, 1))
           * ord(substr(text, frame_no * 64 + CAST(j AS INT) + 1, 1))))
    AS BIGINT) AS energy,
  CAST(list_max(list_transform(range(64),
      j -> ord(substr(text, frame_no * 64 + CAST(j AS INT) + 1, 1))))
    AS INT) AS peak
FROM fr
""",
    "mm_media_decode": """
SELECT doc_id,
       CASE WHEN source = 'src0' THEN 'image'
            WHEN source = 'src1' THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
       CAST(octet_length(encode(text)) % 640 + 32 AS INT) AS width,
       CAST(octet_length(encode(text)) * 7 % 480 + 32 AS INT) AS height,
       CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
FROM documents
""",
    "mm_media_resize": """
WITH d AS (
  SELECT doc_id,
         CASE WHEN source = 'src0' THEN 'image'
              WHEN source = 'src1' THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) % 640 + 32 AS INT) AS width,
         CAST(octet_length(encode(text)) * 7 % 480 + 32 AS INT) AS height
  FROM documents
)
SELECT doc_id, media_type, width, height,
       CAST(CASE WHEN width >= height THEN 224
                 ELSE 224 * width // height END AS INT) AS out_w,
       CAST(CASE WHEN width >= height THEN 224 * height // width
                 ELSE 224 END AS INT) AS out_h
FROM d
""",
    "mm_frame_sample": """
WITH d AS (
  SELECT doc_id,
         CASE WHEN source = 'src0' THEN 'image'
              WHEN source = 'src1' THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(f AS INT) AS frame_no,
       CAST((doc_id * 31 + f * 7) % 997 AS INT) AS frame_feature
FROM d CROSS JOIN generate_series(0, 15, 4) g(f)
WHERE media_type = 'video' AND f < n_frames
""",
}

QUERIES = {
    "mm_media_decode": q_media_decode,
    "mm_media_resize": q_media_resize,
    "mm_frame_sample": q_frame_sample,
    "mm_audio_energy": q_audio_energy,
    "mm_payload_dedup": q_payload_dedup,
}
