"""Adaptive arithmetic codec (CRAM 3.1 method 6) roundtrip tests."""

import random

import pytest

from clair3_tpu.io.arith import (
    F_CAT,
    F_EXT,
    F_ORDER1,
    F_PACK,
    F_RLE,
    F_STRIPE,
    RangeDecoder,
    RangeEncoder,
    SimpleModel,
    arith_compress,
    arith_decompress,
)


def _corpora():
    rng = random.Random(4321)
    yield b""
    yield b"x"
    yield b"ACGT" * 3
    yield bytes(rng.randrange(256) for _ in range(5_000))
    yield bytes(rng.choice(b"ACGTN") for _ in range(10_000))
    yield b"\x00" * 4_000
    q = bytearray()
    while len(q) < 8_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(1, 300)
    yield bytes(q)


@pytest.mark.parametrize("flags", [
    0, F_ORDER1, F_RLE, F_RLE | F_ORDER1, F_CAT, F_EXT,
    F_PACK, F_PACK | F_ORDER1, F_PACK | F_RLE,
    F_STRIPE, F_STRIPE | F_ORDER1, F_STRIPE | F_RLE | F_ORDER1,
])
def test_roundtrip_all_flag_combos(flags):
    for data in _corpora():
        blob = arith_compress(data, flags)
        assert arith_decompress(blob) == data, (flags, len(data))


def test_range_coder_primitive():
    """Raw range-coder sanity: model-free fixed-frequency coding."""
    rng = random.Random(5)
    seq = [rng.randrange(4) for _ in range(5_000)]
    freqs = [10, 20, 30, 40]
    cum = [0, 10, 30, 60]
    tot = 100
    enc = RangeEncoder()
    for s in seq:
        enc.encode(cum[s], freqs[s], tot)
    blob = enc.finish()
    dec = RangeDecoder(blob)
    out = []
    for _ in seq:
        f = dec.get_freq(tot)
        s = max(i for i in range(4) if cum[i] <= f)
        dec.decode(cum[s], freqs[s])
        out.append(s)
    assert out == seq


def test_adaptive_model_roundtrip():
    rng = random.Random(6)
    seq = [rng.choice((0, 0, 0, 1, 2, 7)) for _ in range(20_000)]
    enc = RangeEncoder()
    m = SimpleModel(8)
    for s in seq:
        m.encode(enc, s)
    blob = enc.finish()
    dec = RangeDecoder(blob)
    m2 = SimpleModel(8)
    assert [m2.decode(dec) for _ in seq] == seq
    # skewed input must compress well
    assert len(blob) < len(seq) * 0.4


def test_model_renormalization_path():
    # >4096 updates force total > 2^16-16 -> renormalize repeatedly
    seq = [0, 1] * 40_000
    enc = RangeEncoder()
    m = SimpleModel(2)
    for s in seq:
        m.encode(enc, s)
    dec = RangeDecoder(enc.finish())
    m2 = SimpleModel(2)
    assert [m2.decode(dec) for _ in seq] == seq


def test_order1_beats_order0_on_structured_text():
    data = bytes("the quick brown fox jumps over " * 400, "ascii")
    o0 = arith_compress(data, 0)
    o1 = arith_compress(data, F_ORDER1)
    assert len(o1) < len(o0) < len(data)
    assert arith_decompress(o1) == data


def test_rle_on_runs_beats_plain():
    rng = random.Random(9)
    q = bytearray()
    while len(q) < 40_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(20, 200)
    q = bytes(q)
    rle = arith_compress(q, F_RLE)
    plain = arith_compress(q, 0)
    assert arith_decompress(rle) == q
    assert len(rle) < len(plain)


def test_nosz_needs_hint():
    data = b"ACGT" * 64
    blob = arith_compress(data, F_ORDER1, no_size=True)
    with pytest.raises(ValueError, match="hint"):
        arith_decompress(blob)
    assert arith_decompress(blob, len(data)) == data


def test_fuzz_roundtrip():
    rng = random.Random(777)
    pool = [0, F_ORDER1, F_RLE, F_RLE | F_ORDER1, F_PACK,
            F_PACK | F_RLE | F_ORDER1, F_STRIPE, F_EXT]
    for trial in range(40):
        n = rng.randrange(0, 2000)
        nsym = rng.choice((1, 2, 5, 30, 256))
        alpha = bytes(rng.randrange(256) for _ in range(nsym))
        data = bytes(rng.choice(alpha) for _ in range(n)) if n else b""
        flags = rng.choice(pool)
        blob = arith_compress(data, flags)
        assert arith_decompress(blob) == data, (trial, flags, n, nsym)


def test_cram_block_method6_roundtrip():
    from clair3_tpu.io.cram import M_ARITH, CT_EXTERNAL, read_block
    import clair3_tpu.io.cram as cram_mod
    import struct
    import zlib

    data = bytes("auxiliary tags " * 300, "ascii")
    comp = arith_compress(data, F_ORDER1)
    head = bytes([M_ARITH, CT_EXTERNAL]) + cram_mod.write_itf8(7) \
        + cram_mod.write_itf8(len(comp)) + cram_mod.write_itf8(len(data))
    body = head + comp
    blob = body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    block, q = read_block(blob, 0)
    assert q == len(blob)
    assert block.data == data
