"""Property tests for the real multimodal codecs (no Spark needed):
encode→decode round-trips over arbitrary inputs, plus corruption must
fail loudly (CRC/magic checks) — a decoder that silently returns values
for garbage bytes would poison a 100 TB pipeline quietly.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.operators.multimodal import (
    _png_dims,
    _wav_n_samples,
    _WAV_RATE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=2**40), n_chars=st.integers(0, 10_000))
def test_wav_roundtrip(doc_id, n_chars):
    rate, n, total = decode_wav(encode_wav(doc_id, n_chars))
    assert rate == _WAV_RATE
    assert n == _wav_n_samples(n_chars)
    assert total == sum((doc_id * 31 + i * 7) % 65536 - 32768 for i in range(n))


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=2**40))
def test_png_roundtrip(doc_id):
    w, h, depth, total = decode_png(encode_png(doc_id))
    assert (w, h) == _png_dims(doc_id)
    assert depth == 8
    assert total == sum(
        (doc_id + x + y) % 256 for x in range(w) for y in range(h)
    )


@given(doc_id=st.integers(0, 1000), pos=st.integers(0, 200), bit=st.integers(0, 7))
@settings(max_examples=100, deadline=None)
def test_png_corruption_fails_loudly(doc_id, pos, bit):
    payload = bytearray(encode_png(doc_id))
    pos %= len(payload)
    payload[pos] ^= 1 << bit
    try:
        result = decode_png(bytes(payload))
    except Exception:
        return  # loud failure is the contract
    # A flip that decodes cleanly must not have changed any decoded value
    # (e.g. a flip inside zlib padding bits) — never a silent wrong answer.
    assert result == decode_png(encode_png(doc_id))


def test_wav_truncation_fails():
    payload = encode_wav(7, 500)
    with pytest.raises(ValueError):
        decode_wav(payload[: len(payload) // 2])


def test_wav_bad_magic_fails():
    payload = b"JUNK" + encode_wav(7, 500)[4:]
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_png_missing_ihdr_raises_value_error():
    # A signature + IEND-only stream must raise the 'missing IHDR'
    # ValueError — not a NameError on h/depth (the round-5 ADVICE bug) —
    # and must do so even under `python -O` (no asserts on this path).
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    payload = b"\x89PNG\r\n\x1a\n" + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(payload)
