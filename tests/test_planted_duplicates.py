"""Planted-duplicate fixtures for the survivorship/phash policies.

The driver fixtures contain no byte-exact document copies and no
re-encoded PNGs, so dedup_keep_best's ORDER BY arm and mm_phash_dedup's
family grouping were only ever exercised through the oracle CONTRACT
(both engines ranking the same duplicate-free data) — VERDICT r6 task
#5. These tests synthesize real duplicates and assert the intended
survivor / family is chosen on data.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.operators.dedup import dedup_keep_best
from solarflare_etl_pipeline_spark.operators.multimodal import (
    decode_png_pixels,
    dhash_bits,
    encode_png,
    phash_families,
)


def test_keep_best_prefers_longest_then_lowest_id(spark, tmp_path):
    """Same text planted three ways: the highest n_chars survives;
    within an n_chars tie the lowest doc_id survives; singletons pass
    through untouched."""
    rows = [
        # family A — one text, differing recorded lengths
        (1, "en", 50, "shared text alpha"),
        (2, "en", 100, "shared text alpha"),   # survivor: longest
        (3, "de", 70, "shared text alpha"),
        # family B — exact tie on n_chars: lowest doc_id wins
        (10, "fr", 40, "shared text beta"),
        (11, "fr", 40, "shared text beta"),
        # singleton
        (99, "es", 10, "unique text gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in dedup_keep_best(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 10, 99}
    assert out[2].n_chars == 100 and out[2].lang == "en"
    assert out[10].lang == "fr"


def _reencode_png(payload: bytes) -> bytes:
    """Re-encode a PNG without touching its pixels: re-deflate the
    scanline stream and split it across TWO IDAT chunks (spec-legal —
    decoders concatenate IDAT bodies). The byte stream is guaranteed to
    differ (different chunking), the decoded image is identical — the
    exact shape of a mirror that re-saved the file."""
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks, idat = 8, [], b""
    while pos < len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IDAT":
            idat += body
        else:
            chunks.append((ctype, body))
        pos += 12 + size

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    raw = zlib.decompress(idat)
    recompressed = zlib.compress(raw, 1)
    mid = max(1, len(recompressed) // 2)
    out = b"\x89PNG\r\n\x1a\n"
    for ctype, body in chunks:
        if ctype == b"IEND":
            out += chunk(b"IDAT", recompressed[:mid])
            out += chunk(b"IDAT", recompressed[mid:])
        out += chunk(ctype, body)
    return out


def _make_png(pixels) -> bytes:
    """Encode an arbitrary (h, w) uint8 array as an 8-bit grayscale PNG
    with filter-0 scanlines — encode_png's container with caller-chosen
    content. The generator ramp (doc_id + x + y) % 256 has monotone
    rows, so EVERY generated image dhashes to 0; planted tests need
    images whose gradient signs actually differ."""
    h = len(pixels)
    w = len(pixels[0])
    raw = b"".join(b"\x00" + bytes(int(v) & 0xFF for v in row) for row in pixels)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pattern(seed: int, w: int = 16, h: int = 12):
    """Deterministic pseudo-random pixels with rich gradient structure."""
    return [
        [(seed * 37 + x * 41 + y * 59 + (x * y * 7) % 83) * 97 % 256 for x in range(w)]
        for y in range(h)
    ]


def test_reencoded_png_same_pixels_different_bytes():
    original = _make_png(_pattern(17))
    mirrored = _reencode_png(original)
    assert mirrored != original
    w1, h1, d1, px1 = decode_png_pixels(original)
    w2, h2, d2, px2 = decode_png_pixels(mirrored)
    assert (w1, h1, d1) == (w2, h2, d2)
    assert (px1 == px2).all()
    assert dhash_bits(px1) == dhash_bits(px2)


def test_phash_dedup_groups_reencoded_copy(spark):
    """A re-encoded mirror (different bytes, same pixels) must land in
    the original's family with the original as canonical; an unrelated
    image (distinct dhash — asserted, since the generator ramp images
    all dhash to 0) must not join any family."""
    a, b = _make_png(_pattern(5)), _make_png(_pattern(41))
    assert dhash_bits(decode_png_pixels(a)[3]) != dhash_bits(decode_png_pixels(b)[3])
    payloads = spark.createDataFrame(
        [(5, bytearray(a)), (500, bytearray(_reencode_png(a))), (41, bytearray(b))],
        "doc_id long, png binary",
    )
    fams = phash_families(payloads).collect()
    assert len(fams) == 1
    fam = fams[0]
    assert fam.n_imgs == 2
    assert fam.canonical_doc == 5


def test_phash_dedup_byte_exact_copy_groups(spark):
    """Byte-exact copies trivially share the phash family too — and the
    real generator container (encode_png) round-trips through the
    policy unchanged."""
    a = encode_png(9)
    payloads = spark.createDataFrame(
        [(9, bytearray(a)), (90, bytearray(a))], "doc_id long, png binary"
    )
    fams = phash_families(payloads).collect()
    assert len(fams) == 1 and fams[0].n_imgs == 2 and fams[0].canonical_doc == 9
