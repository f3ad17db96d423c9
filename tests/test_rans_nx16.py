"""rANS Nx16 codec (CRAM 3.1 method 5) roundtrip + format tests."""

import random

import pytest

from clair3_tpu.io.rans_nx16 import (
    F_CAT,
    F_N32,
    F_ORDER1,
    F_PACK,
    F_RLE,
    F_STRIPE,
    rans_nx16_compress,
    rans_nx16_decompress,
    read_uint7,
    write_uint7,
)


def _corpora():
    rng = random.Random(1234)
    yield b""
    yield b"A"
    yield b"ACGT" * 3
    yield bytes(rng.randrange(256) for _ in range(10_000))          # dense
    yield bytes(rng.choice(b"ACGTN") for _ in range(20_000))        # 5-sym
    yield bytes(rng.choice(b"\x00\x01") for _ in range(5_000))      # 2-sym
    yield b"\x07" * 9_999                                           # constant
    # runs: quality-like
    q = bytearray()
    while len(q) < 15_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(1, 40)
    yield bytes(q)
    # skewed order-1 structure
    s = bytearray()
    prev = 65
    for _ in range(30_000):
        prev = (prev + rng.choice((0, 0, 0, 1, 2))) % 256
        s.append(prev)
    yield bytes(s)


@pytest.mark.parametrize("flags", [
    0, F_ORDER1, F_N32, F_ORDER1 | F_N32,
    F_PACK, F_PACK | F_ORDER1, F_RLE, F_RLE | F_ORDER1,
    F_PACK | F_RLE, F_PACK | F_RLE | F_ORDER1,
    F_CAT, F_STRIPE, F_STRIPE | F_ORDER1, F_STRIPE | F_PACK | F_RLE,
])
def test_roundtrip_all_flag_combos(flags):
    for data in _corpora():
        blob = rans_nx16_compress(data, flags)
        out = rans_nx16_decompress(blob)
        assert out == data, (flags, len(data))


def test_uint7_roundtrip():
    for v in (0, 1, 127, 128, 255, 16383, 16384, 2**21 - 1, 2**28, 2**34):
        enc = write_uint7(v)
        got, p = read_uint7(enc, 0)
        assert got == v and p == len(enc)
    # big-endian 7-bit groups with continuation bit
    assert write_uint7(0) == b"\x00"
    assert write_uint7(127) == b"\x7f"
    assert write_uint7(128) == b"\x81\x00"
    assert write_uint7(300) == b"\x82\x2c"


def test_compression_actually_compresses():
    data = bytes("the quick brown fox " * 500, "ascii")
    o0 = rans_nx16_compress(data, 0)
    o1 = rans_nx16_compress(data, F_ORDER1)
    assert len(o0) < len(data)
    assert len(o1) < len(o0)  # order-1 wins on English text


def test_pack_drops_when_alphabet_too_wide():
    data = bytes(range(256)) * 20
    blob = rans_nx16_compress(data, F_PACK)
    assert not (blob[0] & F_PACK)  # silently dropped, like htslib
    assert rans_nx16_decompress(blob) == data


def test_pack_constant_stream_is_tiny():
    data = b"Q" * 100_000
    blob = rans_nx16_compress(data, F_PACK)
    assert blob[0] & F_PACK
    assert len(blob) < 16
    assert rans_nx16_decompress(blob) == data


def test_rle_on_runs_beats_plain():
    rng = random.Random(7)
    q = bytearray()
    while len(q) < 50_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(5, 60)
    q = bytes(q)
    plain = rans_nx16_compress(q, 0)
    rle = rans_nx16_compress(q, F_RLE)
    assert blob_valid(rle, q)
    assert len(rle) < len(plain)


def blob_valid(blob, data):
    return rans_nx16_decompress(blob) == data


def test_nosz_stream_needs_hint():
    data = b"ACGT" * 100
    blob = rans_nx16_compress(data, F_ORDER1, no_size=True)
    with pytest.raises(ValueError, match="hint"):
        rans_nx16_decompress(blob)
    assert rans_nx16_decompress(blob, len(data)) == data


def test_order1_compressed_freq_table():
    # wide alphabet forces the order-1 table over 1024 bytes -> the table
    # itself is rANS-order-0 compressed (flag bit 0 of the comp byte)
    rng = random.Random(99)
    data = bytes(rng.randrange(200) for _ in range(60_000))
    blob = rans_nx16_compress(data, F_ORDER1)
    assert rans_nx16_decompress(blob) == data


def test_fuzz_roundtrip():
    rng = random.Random(31337)
    flag_pool = [0, F_ORDER1, F_PACK, F_RLE, F_PACK | F_RLE,
                 F_ORDER1 | F_PACK | F_RLE, F_STRIPE | F_ORDER1, F_N32]
    for trial in range(60):
        n = rng.randrange(0, 4000)
        nsym = rng.choice((1, 2, 3, 4, 15, 17, 256))
        alpha = bytes(rng.randrange(256) for _ in range(nsym))
        data = bytes(rng.choice(alpha) for _ in range(n)) if n else b""
        flags = rng.choice(flag_pool)
        blob = rans_nx16_compress(data, flags)
        assert rans_nx16_decompress(blob) == data, (trial, flags, n, nsym)


def test_cram_block_method5_roundtrip():
    """A CRAM block written with method 5 decodes through read_block."""
    from clair3_tpu.io.cram import (
        M_RANSNX16, Block, CT_EXTERNAL, read_block, _compress)
    import clair3_tpu.io.cram as cram_mod

    data = bytes("qualities " * 400, "ascii")
    # craft a block by hand (the writer emits 3.0 codecs only)
    from clair3_tpu.io.rans_nx16 import rans_nx16_compress as c
    comp = c(data, F_ORDER1 | F_RLE)
    head = bytes([M_RANSNX16, CT_EXTERNAL]) + cram_mod.write_itf8(12) \
        + cram_mod.write_itf8(len(comp)) + cram_mod.write_itf8(len(data))
    import zlib
    import struct
    body = head + comp
    blob = body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    block, q = read_block(blob, 0)
    assert q == len(blob)
    assert block.data == data
    assert block.content_id == 12
