"""fqzcomp quality codec (CRAM 3.1 method 7) roundtrip tests."""

import random

import pytest

from clair3_tpu.io.fqzcomp import (
    FqzParam,
    PFLAG_DO_LEN,
    PFLAG_HAVE_PTAB,
    PFLAG_HAVE_QTAB,
    fqzcomp_compress,
    fqzcomp_decompress,
    read_array,
    store_array,
)


def _qualities(n, seed, alphabet=(10, 15, 20, 25, 30, 35, 40)):
    rng = random.Random(seed)
    out = bytearray()
    q = 30
    for _ in range(n):
        q = max(0, min(45, q + rng.choice((-5, 0, 0, 0, 5))))
        out.append(q)
    return bytes(out)


def test_roundtrip_single_record():
    data = _qualities(20_000, 7)
    blob = fqzcomp_compress(data)
    assert fqzcomp_decompress(blob, len(data)) == data
    # correlated qualities compress well
    assert len(blob) < len(data) * 0.5


def test_roundtrip_multi_record():
    rng = random.Random(9)
    lengths = [rng.randrange(50, 300) for _ in range(40)]
    data = _qualities(sum(lengths), 11)
    blob = fqzcomp_compress(data, lengths)
    assert fqzcomp_decompress(blob, len(data)) == data


def test_roundtrip_uniform_and_binary():
    for data in (b"\x28" * 5000,
                 bytes(random.Random(3).choice(b"\x0a\x28") for _ in range(8000)),
                 b"", b"\x05"):
        blob = fqzcomp_compress(data)
        assert fqzcomp_decompress(blob, len(data)) == data


def test_store_read_array_roundtrip():
    # monotone bucket maps like htslib's qtab/ptab
    for size, buckets in ((256, 8), (1024, 16), (256, 1)):
        vals = [min(buckets - 1, i * buckets // size) for i in range(size)]
        enc = store_array(vals, size)
        got, p = read_array(enc, 0, size)
        assert got == vals
        assert p == len(enc)


def test_read_array_long_runs():
    vals = [0] * 300 + [1] * 700 + [2] * 24  # runs > 255 need 255-chaining
    enc = store_array(vals, 1024)
    got, _ = read_array(enc, 0, 1024)
    assert got == vals


def test_bad_version_rejected():
    with pytest.raises(ValueError, match="version"):
        fqzcomp_decompress(b"\x04\x00", 10)


def test_length_mismatch_rejected():
    with pytest.raises(ValueError, match="sum"):
        fqzcomp_compress(b"abc", [1, 1])


def test_decoder_ptab_qtab_paths():
    """Exercise position-table and quality-table context components by
    hand-building a parameter block and coding with it both ways."""
    from clair3_tpu.io.arith import RangeEncoder, SimpleModel
    from clair3_tpu.io.fqzcomp import FQZ_VERS, _QualModels, _update_ctx, _write_param

    pm = FqzParam()
    pm.pflags = PFLAG_HAVE_PTAB | PFLAG_HAVE_QTAB
    pm.max_sym = 48
    pm.qbits = 8
    pm.qshift = 4
    pm.ploc = 8
    # bucketed tables (monotone, as the reference trains them)
    pm.qtab = [min(15, i // 4) for i in range(256)]
    pm.ptab = [min(15, i // 64) for i in range(1024)]
    pm.finish()

    data = _qualities(6_000, 21)
    out = bytearray([FQZ_VERS, 0])
    out += _write_param(pm)
    qm = _QualModels(pm.nsym)
    model_len = [SimpleModel(256) for _ in range(4)]
    rc = RangeEncoder()
    n = len(data)
    model_len[0].encode(rc, n & 0xFF)
    model_len[1].encode(rc, (n >> 8) & 0xFF)
    model_len[2].encode(rc, (n >> 16) & 0xFF)
    model_len[3].encode(rc, (n >> 24) & 0xFF)
    state = {"p": n, "delta": 0, "prevq": 0, "qctx": 0, "s": 0}
    ctx = pm.context
    for q in data:
        qm.get(ctx).encode(rc, q)
        ctx = _update_ctx(pm, state, q)
    out += rc.finish()

    assert fqzcomp_decompress(bytes(out), n) == data


def test_cram_block_method7_roundtrip():
    from clair3_tpu.io.cram import M_FQZCOMP, CT_EXTERNAL, read_block
    import clair3_tpu.io.cram as cram_mod
    import struct
    import zlib

    data = _qualities(4_000, 33)
    comp = fqzcomp_compress(data)
    head = bytes([M_FQZCOMP, CT_EXTERNAL]) + cram_mod.write_itf8(23) \
        + cram_mod.write_itf8(len(comp)) + cram_mod.write_itf8(len(data))
    body = head + comp
    blob = body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    block, q = read_block(blob, 0)
    assert q == len(blob)
    assert block.data == data
