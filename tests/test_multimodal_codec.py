"""Both branches of the media decode worker, including the real codec.

The container has no PIL, so the catalog queries run the deterministic
fake decode (hash-gated against the DuckDB oracle). This test covers
the codec dispatch itself:

- a genuine PNG fixture, GENERATED here from stdlib zlib (no image
  library needed to build it), goes down the REAL path wherever PIL is
  installed and must report its true 3x2 dimensions;
- the same bytes without PIL — and any non-image payload always —
  take the deterministic fake, keeping results engine-stable.

The worker functions are plain Arrow-batch callables, so they are
exercised directly on pandas frames (no Spark session needed): the
same code object runs under mapInPandas in the catalog queries.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pandas as pd
import pytest

from eurovision_spark.operators.multimodal import (
    _fake_decode,
    _looks_like_image,
    decode_media_batch,
)

WIDTH, HEIGHT = 3, 2


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(width: int = WIDTH, height: int = HEIGHT) -> bytes:
    """Minimal valid RGB PNG built from the spec with stdlib only."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    # each scanline: filter byte 0 + width RGB pixels
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _decode_one(payload: bytes):
    batch = pd.DataFrame(
        {"doc_id": [1], "media_type": ["image"], "content": [payload]}
    )
    (out,) = list(decode_media_batch(iter([batch])))
    return out.iloc[0]


def test_magic_sniff():
    assert _looks_like_image(make_png())
    assert _looks_like_image(b"\xff\xd8\xff\xe0jpegish")
    assert not _looks_like_image(b"plain text payload")


def test_text_payload_always_takes_deterministic_fake():
    payload = b"some synthetic document text"
    row = _decode_one(payload)
    w, h = _fake_decode(payload)
    assert (row["width"], row["height"]) == (w, h)
    assert row["content_md5"] == hashlib.md5(payload).hexdigest()
    assert row["n_bytes"] == len(payload)


def test_png_payload_real_codec_or_gated_fake():
    png = make_png()
    row = _decode_one(png)
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        # REAL decode: true dimensions of the generated image
        assert (row["width"], row["height"]) == (WIDTH, HEIGHT)
    else:
        assert (row["width"], row["height"]) == _fake_decode(png)
    # invariants shared by both branches
    assert row["content_md5"] == hashlib.md5(png).hexdigest()
    assert row["n_bytes"] == len(png)


def test_real_codec_when_pil_available():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    with PIL_Image.open(io.BytesIO(make_png())) as img:
        assert img.size == (WIDTH, HEIGHT)  # fixture sanity
    row = _decode_one(make_png())
    assert (row["width"], row["height"]) == (WIDTH, HEIGHT)


def test_corrupt_image_payload_degrades_to_fake_never_raises():
    """Magic bytes + garbage body: with PIL the decode fails and must
    fall back to the deterministic fake (one bad row never kills a
    scan); without PIL the sniffed payload takes the fake directly.
    Either way the row comes back with the fake dimensions."""
    corrupt = b"\x89PNG\r\n\x1a\n" + b"this is not a real png body"
    row = _decode_one(corrupt)
    assert (row["width"], row["height"]) == _fake_decode(corrupt)
    assert row["n_bytes"] == len(corrupt)


def test_frame_fingerprints_match_oracle_on_non_ascii(spark, tmp_path):
    """Byte-based frame slicing must agree with the oracle on MULTI-BYTE
    text: the old char-based oracle substr diverged from the worker's
    byte slices the moment a non-ASCII doc appeared (zh/ja corpora are
    first-class in a training pipeline)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eurovision_spark.catalog import registry, resolve_oracle

    texts = ["数据 query join 数据 spark row", "ascii only words here", "données été à"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["zh", "en", "fr"]),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    sf = tmp_path / "sfx"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))

    spec = registry()["media_frame_sample"]
    srows = sorted(tuple(r) for r in spec.fn(spark, str(sf)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    orows = sorted(tuple(r) for r in con.execute(resolve_oracle(spec, str(sf))).fetchall())
    assert srows == orows and len(srows) == 3 * 4


def test_media_region_dedup_vote_tiers(spark, tmp_path):
    """Region-vote semantics pinned exactly: identical payloads share
    all 4 region fingerprints, the one-byte-mutated planted copy
    exactly 3 — including a MULTI-BYTE UTF-8 payload and an odd region
    width (the r09 advice cases: the splice is byte-aligned in the
    encoded hex, so no downstream byte shifts and no region-boundary
    straddle) — and a half-different payload at most 2 (excluded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eurovision_spark.catalog import registry
    from eurovision_spark.operators.multimodal import MEDIA_COPY_OFFSET

    base = "".join(f"t{i:02d}" for i in range(32))  # 96 chars
    half_diff = base[:48] + "".join(f"z{i:02d}" for i in range(16))
    multibyte = "héllo wörld données 数据 été"  # multi-byte UTF-8
    odd_q = "abcdefghij"  # 10 bytes -> 20 hex chars -> q = 5 (odd)
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [base, base, half_diff, multibyte, odd_q],
            "lang": ["en"] * 5,
            "source": ["A"] * 5,
            "n_chars": pa.array(
                [96, 96, 96, len(multibyte), len(odd_q)], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    cells = {
        (r["doc_id_1"], r["doc_id_2"]): r["n_shared"]
        for r in registry()["media_region_dedup"].fn(spark, str(tmp_path)).collect()
    }
    C = MEDIA_COPY_OFFSET
    # identical docs 0 and 1: all four regions; each with the other's
    # mutated copy: 3 (the copies are byte-identical to each other too)
    assert cells[(0, 1)] == 4 and cells[(C, C + 1)] == 4
    for a, b in [(0, C), (1, C + 1), (0, C + 1), (1, C)]:
        assert cells[(a, b)] == 3, (a, b)
    # doc 2 shares only its first two regions with 0/1 — every pair
    # linking the 2-family to the 0/1-family is excluded; doc 2's one
    # surviving pair is with its own mutated copy, at 3
    fam2 = {2, C + 2}
    cross = [
        p
        for p in cells
        if (set(p) & fam2) and not (set(p) <= fam2) and not (set(p) & {3, 4, C + 3, C + 4})
    ]
    assert not cross, cross
    assert cells[(2, C + 2)] == 3
    # the advice cases: the multi-byte payload's copy and the odd-q
    # payload's copy each land at exactly 3 shared regions — the old
    # character splice shifted every downstream byte of doc 3 (0 or 1
    # shared) and straddled doc 4's region boundary (2 shared)
    assert cells[(3, C + 3)] == 3
    assert cells[(4, C + 4)] == 3
