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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"


def _looks_like_image(payload: bytes) -> bool:
    """Magic-byte sniff: only genuine image payloads take the real
    codec path. The synthetic media_table payloads are text bytes, so
    catalog results are identical with or without PIL installed; real
    PNG/JPEG payloads decode for real wherever PIL exists
    (tests/test_multimodal_codec.py)."""
    return payload.startswith(PNG_MAGIC) or payload.startswith(JPEG_MAGIC)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real image decode: pseudo-dimensions
    derived from the content digest (same formula as the SQL oracle),
    clamped to >= 1 like any real decoded image — so EVERY media op
    (features / resize / profile) emits the same width/height columns
    and the profile twin genuinely certifies the others."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return max(h % 1920, 1), max(h % 1080, 1)


def _decode_dims(payload: bytes, media_type: str, have_pil: bool) -> tuple[int, int]:
    """Dimensions for one payload: real PIL decode for genuine image
    bytes when PIL exists, deterministic fake otherwise. A payload that
    passes the magic sniff but fails to decode (truncated/corrupt file)
    falls back to the fake instead of killing the whole query — one bad
    row must never fail a 100 TB scan."""
    if have_pil and media_type == "image" and _looks_like_image(payload):
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(payload)) as img:
                return img.size
        except Exception:  # truncated/corrupt image: degrade, don't die
            return _fake_decode(payload)
    return _fake_decode(payload)


def _resize_geometry(w: int, h: int) -> tuple[int, int, int, int, float]:
    """Aspect-preserving thumbnail plan shared by every worker:
    (clamped_w, clamped_h, out_w, out_h, scale)."""
    rw, rh = max(w, 1), max(h, 1)
    scale = min(TARGET_W / rw, TARGET_H / rh, 1.0)
    return rw, rh, int(rw * scale), int(rh * scale), scale


def _frame_slices(payload: bytes) -> list[tuple[int, int, str]]:
    """N evenly-spaced frame fingerprints: (idx, byte_offset, md5).

    Slicing is BYTE-based (frames of a binary payload), and the
    fingerprint is md5 of the slice's UPPERCASE-HEX encoding — the one
    representation DuckDB can reproduce for arbitrary bytes (its md5 /
    substr only accept VARCHAR, and a mid-codepoint byte slice of
    non-ASCII text is not valid VARCHAR; hex chars = 2 x bytes, so the
    oracle's substr(hex(encode(text)), 2*off+1, 2*len) slices the
    identical bytes)."""
    n = max(len(payload), 1)
    step = n // N_FRAMES
    return [
        (
            i,
            i * step,
            hashlib.md5(
                payload[i * step : i * step + max(step, 1)].hex().upper().encode()
            ).hexdigest(),
        )
        for i in range(N_FRAMES)
    ]


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
            w, h = _decode_dims(b, media_type, have_pil)
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
    # spread the (unsplittable-locally) source so the Arrow decode
    # workers run on every core, not one
    return d.repartition(d.sparkSession.sparkContext.defaultParallelism).select(
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
           greatest(CAST({md5_long_sql('text')} % 1920 AS INT), 1) AS width,
           greatest(CAST({md5_long_sql('text')} % 1080 AS INT), 1) AS height
    FROM documents WHERE n_chars > 0
    """,
    "multimodal decode/feature-extract plumbing: binary payload column "
    "-> mapInPandas (Arrow-batched) -> typed feature row; codec stubbed "
    "deterministically (no PIL in container), Spark-side plumbing real "
    "and hash-gated against the SQL twin of the fake decode.",
    driver=False,  # driver gate: certified via media_profile (same columns)
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(decode_media_batch, FEATURE_SCHEMA)


# --- resize (image) ---------------------------------------------------------

TARGET_W, TARGET_H = 224, 224

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "scale double, out_bytes bigint"
)


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: aspect-preserving resize plan per payload.

    Real path would decode + PIL .thumbnail; the deterministic stand-in
    computes the same geometry from the fake-decoded dimensions, and the
    'resized payload size' as bytes * scale² (what an uncompressed
    bitmap would do). Spark-side contract (schema, batching, partition
    behavior) is identical either way.
    """
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(payload)
            w, h, ow, oh, scale = _resize_geometry(*_fake_decode(b))
            out.append((doc_id, w, h, ow, oh, round(scale, 6), int(len(b) * scale * scale)))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "width", "height", "out_width", "out_height", "scale", "out_bytes",
            ],
        )


@register(
    "media_resize",
    f"""
    WITH dims AS (
        SELECT doc_id,
               greatest(CAST({md5_long_sql('text')} % 1920 AS INT), 1) AS width,
               greatest(CAST({md5_long_sql('text')} % 1080 AS INT), 1) AS height,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents WHERE n_chars > 0),
    scaled AS (
        SELECT doc_id, width, height,
               least({TARGET_W}.0 / width, {TARGET_H}.0 / height, 1.0) AS s,
               n_bytes
        FROM dims)
    SELECT doc_id, width, height,
           CAST(floor(width * s) AS INT) AS out_width,
           CAST(floor(height * s) AS INT) AS out_height,
           round(s, 6) AS scale,
           CAST(floor(n_bytes * s * s) AS BIGINT) AS out_bytes
    FROM scaled
    """,
    "image resize operator: aspect-preserving thumbnail geometry per "
    "payload via Arrow-batched mapInPandas (codec stubbed "
    "deterministically — no PIL in container; plumbing and batch shape "
    "real). Per-row, shuffle-free; payload bytes never leave the scan "
    "stage.",
    driver=False,  # driver gate: certified via media_profile (same columns)
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(resize_batch, RESIZE_SCHEMA)


# --- frame sampling (video/audio) -------------------------------------------

N_FRAMES = 4

FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_md5 string"


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: N evenly-spaced frames per payload (1:N
    output — one input row fans out to N frame rows). The deterministic
    stand-in slices the payload at even offsets and fingerprints each
    slice; a real decoder would emit decoded frame tensors with the
    same (doc_id, frame_idx) keying."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(payload)
            for i, off, md5 in _frame_slices(b):
                out.append((doc_id, i, off, md5))
        yield pd.DataFrame(
            out, columns=["doc_id", "frame_idx", "frame_offset", "frame_md5"]
        )


@register(
    "media_frame_sample",
    f"""
    WITH base AS (
        SELECT doc_id, text, greatest(strlen(text), 1) AS n,
               strlen(text) // {N_FRAMES} AS step
        FROM documents WHERE n_chars > 0)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * step AS BIGINT) AS frame_offset,
           md5(substr(hex(encode(text)), i * step * 2 + 1, greatest(step, 1) * 2))
               AS frame_md5
    FROM base CROSS JOIN (SELECT unnest(generate_series(0, {N_FRAMES - 1})) AS i)
    """,
    "video/audio frame sampling: N evenly-spaced frames per payload, "
    "1:N fan-out inside mapInPandas (Arrow-batched). The 100 TB shape: "
    "frames extracted in the scan stage, only (doc_id, frame_idx, "
    "fingerprint/tensor) flows downstream — raw media bytes are never "
    "shuffled.",
    driver=False,  # driver gate: certified via media_profile (frame_md5s col)
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(sample_frames_batch, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Driver-facing consolidated twin (QuerySpec.driver in catalog.py): decode
# features + resize geometry + frame fingerprints in ONE Arrow-batched pass
# per payload — column-for-column the media_features/media_resize/
# media_frame_sample surface, which is also how a production media ingest
# runs (decode once, derive everything, drop the bytes).
# ---------------------------------------------------------------------------

PROFILE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, content_md5 string, "
    "width int, height int, out_width int, out_height int, scale double, "
    "out_bytes bigint, frame_offsets string, frame_md5s string"
)


def media_profile_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one decode per payload feeds features, resize
    plan, and frame fingerprints (same codec dispatch as the individual
    workers — real PIL for genuine image bytes, deterministic fake
    otherwise; frames joined to a comma string so the output stays one
    row per payload)."""
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
            w, h = _decode_dims(b, media_type, have_pil)
            _, _, ow, oh, scale = _resize_geometry(w, h)
            frames = _frame_slices(b)
            out.append(
                (
                    doc_id,
                    media_type,
                    len(b),
                    hashlib.md5(b).hexdigest(),
                    w,
                    h,
                    ow,
                    oh,
                    round(scale, 6),
                    int(len(b) * scale * scale),
                    ",".join(str(off) for _, off, _ in frames),
                    ",".join(md5 for _, _, md5 in frames),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "media_type", "n_bytes", "content_md5", "width", "height",
                "out_width", "out_height", "scale", "out_bytes",
                "frame_offsets", "frame_md5s",
            ],
        )


@register(
    "media_profile",
    f"""
    WITH dims AS (
        SELECT doc_id, text,
               greatest(CAST({md5_long_sql('text')} % 1920 AS INT), 1) AS width,
               greatest(CAST({md5_long_sql('text')} % 1080 AS INT), 1) AS height,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               strlen(text) // {N_FRAMES} AS step
        FROM documents WHERE n_chars > 0),
    scaled AS (
        SELECT doc_id, text, width, height, n_bytes, step,
               least({TARGET_W}.0 / greatest(width, 1),
                     {TARGET_H}.0 / greatest(height, 1), 1.0) AS s
        FROM dims)
    SELECT doc_id, 'image' AS media_type, n_bytes, md5(text) AS content_md5,
           width, height,
           CAST(floor(greatest(width, 1) * s) AS INT) AS out_width,
           CAST(floor(greatest(height, 1) * s) AS INT) AS out_height,
           round(s, 6) AS scale,
           CAST(floor(n_bytes * s * s) AS BIGINT) AS out_bytes,
           array_to_string(list_transform(generate_series(0, {N_FRAMES - 1}),
                           i -> CAST(i * step AS VARCHAR)), ',') AS frame_offsets,
           array_to_string(list_transform(generate_series(0, {N_FRAMES - 1}),
                           i -> md5(substr(hex(encode(text)), i * step * 2 + 1,
                                           greatest(step, 1) * 2))), ',')
               AS frame_md5s
    FROM scaled
    """,
    "consolidated multimodal pipeline: decode features + aspect-"
    "preserving resize geometry + evenly-spaced frame fingerprints from "
    "ONE Arrow-batched mapInPandas pass per payload — the driver-facing "
    "certification twin of media_features/media_resize/"
    "media_frame_sample. Codec deterministically stubbed (no PIL in "
    "container); Spark-side plumbing (schema, batching, 1:N frame "
    "logic) is real. Payload bytes never shuffle.",
)
def media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(media_profile_batch, PROFILE_SCHEMA)


# ---------------------------------------------------------------------------
# Media region-fingerprint dedup: near-duplicate payload detection by
# region voting (the content-ID shape: k of N region fingerprints match
# => near-dup) — the dedup modality the text tier cannot express
# ---------------------------------------------------------------------------

N_REGIONS = 4
REGION_MIN_SHARED = 3  # 3-of-4 region vote = near-dup
MEDIA_COPY_OFFSET = 10**15  # planted same-length one-byte-mutated copies

REGION_FP_SCHEMA = "doc_id bigint, band_id int, fp string"


def region_fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload bytes -> N_REGIONS equal-width region
    fingerprints (md5 of each quarter's uppercase-hex — the byte-exact
    representation DuckDB can reproduce, the _frame_slices convention).
    A real system fingerprints DECODED content (keyframe pHashes, audio
    chroma) so re-encodes collide; the codec is stubbed here, but the
    plumbing — binary column in, (id, band, fingerprint) rows out, 1:N
    inside the Arrow batch — is exactly the production shape."""
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            hexs = bytes(payload).hex().upper()
            q = len(hexs) // N_REGIONS
            if q < 1:
                continue  # payload too small to carve N regions
            for i in range(N_REGIONS):
                out.append(
                    (
                        doc_id,
                        i,
                        hashlib.md5(hexs[i * q : (i + 1) * q].encode()).hexdigest(),
                    )
                )
        yield pd.DataFrame(out, columns=["doc_id", "band_id", "fp"])


def media_dup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media corpus + planted SAME-LENGTH one-byte-mutated copies,
    spliced in the HEX of the encoded payload (r09 advice fix): byte
    k = floor(3q/4) (q = hex chars per region) is replaced by 0x7E —
    or 0x23 when the original byte already IS 0x7E — so the copy
    differs from its original in EXACTLY one byte, that byte sits
    FULLY inside region 1 for every q >= 2 (hex span [2k, 2k+1] within
    [q, 2q) — checked for all q), and every downstream byte keeps its
    offset. The old form replaced one CHARACTER at len/2, which on
    multi-byte UTF-8 shifted every subsequent byte (all regions
    differ) and on odd q straddled a region boundary (2-of-4) — this
    form's exactly-3-of-4 claim holds for ANY corpus, pinned with a
    multi-byte doc in tests/test_multimodal_codec.py. Exact
    content_md5 dedup (media_features) stays provably blind to it."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.hex(F.encode("text", "UTF-8")).alias("hx"))
        # >= 4 payload bytes => q >= 2, the region-interior guarantee
        .filter(F.length("hx") >= 8)
        # 0-based hex index of the mutation byte: 2 * floor(3q/4)
        .withColumn(
            "_p", F.expr(f"2 * ((3 * (length(hx) div {N_REGIONS})) div 4)")
        )
    )
    orig_byte = F.expr("substring(hx, _p + 1, 2)")
    repl = F.when(orig_byte == "7E", F.lit("23")).otherwise(F.lit("7E"))
    mut_hx = F.concat(
        F.expr("substring(hx, 1, _p)"), repl, F.expr("substring(hx, _p + 3)")
    )
    m = d.select("doc_id", "hx").unionByName(
        d.select(
            (F.col("doc_id") + MEDIA_COPY_OFFSET).alias("doc_id"),
            mut_hx.alias("hx"),
        )
    )
    return m.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", F.unhex("hx").alias("content")
    )


@register(
    "media_region_dedup",
    f"""
    WITH m0 AS (
        SELECT doc_id, hex(encode(text)) AS hx FROM documents
        WHERE n_chars > 0 AND length(hex(encode(text))) >= 8),
    mut AS (
        SELECT doc_id, hx,
               2 * ((3 * (length(hx) // {N_REGIONS})) // 4) AS p
        FROM m0),
    h AS (
        SELECT doc_id, hx FROM mut
        UNION ALL
        SELECT doc_id + {MEDIA_COPY_OFFSET} AS doc_id,
               substr(hx, 1, p)
                   || CASE WHEN substr(hx, p + 1, 2) = '7E'
                           THEN '23' ELSE '7E' END
                   || substr(hx, p + 3) AS hx
        FROM mut),
    fp AS (
        SELECT doc_id, CAST(i AS INT) AS band_id,
               md5(substr(hx, i * (length(hx) // {N_REGIONS}) + 1,
                          length(hx) // {N_REGIONS})) AS fp
        FROM h CROSS JOIN (SELECT unnest(generate_series(0, {N_REGIONS - 1})) AS i)
        WHERE length(hx) // {N_REGIONS} >= 1),
    pairs AS (
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
        FROM fp a JOIN fp b
          ON a.band_id = b.band_id AND a.fp = b.fp AND a.doc_id < b.doc_id)
    SELECT doc_id_1, doc_id_2, CAST(count(*) AS BIGINT) AS n_shared
    FROM pairs GROUP BY doc_id_1, doc_id_2
    HAVING count(*) >= {REGION_MIN_SHARED}
    """,
    "near-duplicate MEDIA detection by region-fingerprint voting — the "
    f"content-ID shape (k-of-N matching region/keyframe fingerprints "
    f"=> near-dup, here {REGION_MIN_SHARED}-of-{N_REGIONS}): each "
    "payload is fingerprinted per equal-width region inside ONE "
    "Arrow-batched mapInPandas pass (binary in, (id, band, "
    "fingerprint) rows out — raw bytes never leave the scan stage), "
    "candidates come from the SAME bucket equi-join machinery as the "
    "text LSH families (pairs_in_buckets, one (band, fp) shuffle of "
    "id+hash rows), and the vote is a pair-count aggregate: a pair "
    "sharing >= k region fingerprints is a near-dup, with n_shared "
    "reported for triage. Catches the planted same-length one-byte-"
    "mutated copies (the splice is byte-aligned to the region grid in "
    "the encoded payload's hex, so EXACTLY 3 of 4 regions stay intact "
    "on any corpus, multi-byte UTF-8 included) that exact "
    "content_md5 dedup is blind to. Codec stubbed (region hashes over "
    "payload bytes, not decoded pixels — a real deploy swaps the "
    "fingerprint fn inside the SAME worker); everything downstream of "
    "the fingerprint is the production plan. Cost tracks collision "
    "density, never n^2; a hot fingerprint (boilerplate intro frame) "
    "is a degenerate band, same remedy as text LSH.",
    driver=False,  # registry-gated: oracle-checked at sf0.001 (pytest) + sf0.01 (verify)
)
def media_region_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eurovision_spark.operators.dedup import pairs_in_buckets

    fps = media_dup_table(spark, sf_dir).mapInPandas(
        region_fp_batch, REGION_FP_SCHEMA
    )
    pairs = pairs_in_buckets(
        fps.select("doc_id", "band_id", F.col("fp").alias("band_sig")),
        "doc_id",
        dedup_pairs=False,  # one row per shared band IS the vote count
    )
    return (
        pairs.groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= REGION_MIN_SHARED)
    )
