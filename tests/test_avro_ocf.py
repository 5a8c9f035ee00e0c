"""Avro OCF codec: byte-level round trip and FAILFAST on corruption.

Oracle parity (tests/test_oracle_parity.py::ingest_avro) certifies the
happy path end to end; these pin the failure modes — one corrupt byte
must raise ValueError, never skew rows silently — and the encoder's
structural invariants (multi-block framing, deflate codec, varint
edge values).
"""

from __future__ import annotations

import io

import pytest

from solarflare_etl_pipeline_spark.sources.avro_ingest import (
    MAGIC,
    ROWS_PER_BLOCK,
    SYNC,
    read_ocf,
    write_ocf,
    zigzag_decode,
    zigzag_encode,
)


def _rows(n: int):
    return [
        (i, f"text {i} é中", ["en", "de", "fr"][i % 3], f"src{i % 5}", i * 17 - 3)
        for i in range(n)
    ]


def _ocf_bytes(rows) -> bytes:
    fh = io.BytesIO()
    write_ocf(rows, fh)
    return fh.getvalue()


@pytest.mark.parametrize("n", [0, 1, ROWS_PER_BLOCK, ROWS_PER_BLOCK * 3 + 7])
def test_round_trip(tmp_path, n):
    p = tmp_path / "t.avro"
    p.write_bytes(_ocf_bytes(_rows(n)))
    assert list(read_ocf(str(p))) == _rows(n)


@pytest.mark.parametrize(
    "v", [0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
)
def test_zigzag_varint_round_trip(v):
    buf = zigzag_encode(v) + b"\xff"  # trailing noise must not be read
    got, pos = zigzag_decode(buf, 0)
    assert got == v and pos == len(buf) - 1


def test_multi_block_framing(tmp_path):
    raw = _ocf_bytes(_rows(ROWS_PER_BLOCK * 2 + 1))
    # 3 data blocks + header → 4 sync markers
    assert raw.count(SYNC) == 4


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "t.avro"
    p.write_bytes(b"NOPE" + _ocf_bytes(_rows(5))[4:])
    with pytest.raises(ValueError, match="magic"):
        list(read_ocf(str(p)))


def test_flipped_payload_byte_raises(tmp_path):
    raw = bytearray(_ocf_bytes(_rows(200)))
    # corrupt one byte inside the last deflate block body
    raw[-20] ^= 0xFF
    p = tmp_path / "t.avro"
    p.write_bytes(bytes(raw))
    with pytest.raises((ValueError, Exception)):
        list(read_ocf(str(p)))


def test_truncated_file_raises(tmp_path):
    raw = _ocf_bytes(_rows(200))
    p = tmp_path / "t.avro"
    p.write_bytes(raw[: len(raw) - 9])
    with pytest.raises(ValueError):
        list(read_ocf(str(p)))


def test_sync_marker_mismatch_raises(tmp_path):
    raw = bytearray(_ocf_bytes(_rows(ROWS_PER_BLOCK + 1)))
    idx = raw.find(SYNC, 4)  # the header copy: desyncs every block after
    raw[idx] ^= 0x01
    p = tmp_path / "t.avro"
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="sync"):
        list(read_ocf(str(p)))


def test_null_field_refused():
    with pytest.raises(ValueError, match="NULL"):
        _ocf_bytes([(1, None, "en", "s", 2)])
