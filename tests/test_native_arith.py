"""Differential tests: native adaptive-arithmetic decoder (clair3t_arith.cc)
vs the Python codec in io/arith.py (CRAM 3.1 method 6), plus arith-backed
tok3 name streams and an end-to-end CRAM with method-6 blocks through the
native converter."""

import ctypes
import random

import pytest

from clair3_tpu import native
from clair3_tpu.io.arith import (
    F_CAT, F_EXT, F_ORDER1, F_PACK, F_RLE, F_STRIPE, arith_compress)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable")


def _native_arith_decode(payload: bytes, out_sz: int):
    lib = native.get_lib()
    lib.clair3t_arith_decode.restype = ctypes.c_int
    lib.clair3t_arith_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(max(out_sz, 1))
    rc = lib.clair3t_arith_decode(payload, len(payload), out, out_sz)
    return rc, out.raw[:out_sz]


def _corpora():
    rng = random.Random(97)
    yield b""
    yield b"q"
    yield b"ACGT" * 11
    yield bytes(rng.randrange(256) for _ in range(6_000))
    yield bytes(rng.choice(b"ACGTN") for _ in range(9_000))
    yield b"\x00" * 4_000
    q = bytearray()
    while len(q) < 8_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(1, 250)
    yield bytes(q)


@pytest.mark.parametrize("flags", [
    0, F_ORDER1, F_RLE, F_RLE | F_ORDER1, F_CAT,
    F_PACK, F_PACK | F_ORDER1, F_PACK | F_RLE,
    F_STRIPE, F_STRIPE | F_ORDER1, F_STRIPE | F_RLE | F_ORDER1,
])
def test_native_decode_matches_python_encoder(flags):
    for data in _corpora():
        payload = arith_compress(data, flags)
        rc, got = _native_arith_decode(payload, len(data))
        assert rc == 0, (flags, len(data))
        assert got == data, (flags, len(data))


def test_native_rejects_ext_bzip2():
    payload = arith_compress(b"hello world" * 100, F_EXT)
    rc, _ = _native_arith_decode(payload, 1100)
    assert rc != 0  # bzip2 transform -> Python fallback


def test_native_tok3_decodes_arith_streams():
    from clair3_tpu.io.tok3 import tok3_compress

    names = [f"read_{i:05d}/ccs maj" for i in range(500)]
    blob = b"\x00".join(n.encode() for n in names) + b"\x00"
    payload = tok3_compress(blob, use_arith=True)

    lib = native.get_lib()
    lib.clair3t_tok3_decode.restype = ctypes.c_int
    lib.clair3t_tok3_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(len(blob))
    rc = lib.clair3t_tok3_decode(payload, len(payload), out, len(blob))
    assert rc == 0
    assert out.raw == blob


def test_native_cram_converter_handles_arith_blocks(tmp_path, monkeypatch):
    """A CRAM 3.1 whose quality/base blocks use method 6 converts natively
    to a record-identical BAM."""
    import clair3_tpu.io.cram as cram_mod
    from clair3_tpu.io.bam import BamReader
    from clair3_tpu.io.cram import M_ARITH, M_RANSNX16, bam_to_cram
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    ref = random_reference(6_000, seed=77)
    variants = [SimVariant(2_000, ref[2_000],
                           "C" if ref[2_000] != "C" else "G", (1, 1))]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=6_000, variants=variants, coverage=12,
        read_length=800, seed=77, error_rate=0.02)

    orig_write_block = cram_mod.write_block

    def arith_write_block(block, method):
        if method == M_RANSNX16:
            method = M_ARITH
        return orig_write_block(block, method)

    monkeypatch.setattr(cram_mod, "write_block", arith_write_block)
    cram = str(tmp_path / "arith31.cram")
    bam_to_cram(bam, cram, fasta, version=(3, 1))
    monkeypatch.undo()

    # the file really contains method-6 blocks
    raw = open(cram, "rb").read()
    assert any(raw[i] == 6 for i in range(len(raw)))  # weak sanity

    out_bam = str(tmp_path / "native.bam")
    got = native.cram_to_bam_native(cram, fasta, out_bam)
    assert got == out_bam, "native converter fell back"
    ours = list(BamReader(out_bam))
    theirs = list(BamReader(bam))
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert (a.qname, a.pos, a.cigar, a.seq) == (b.qname, b.pos, b.cigar, b.seq)
        assert bytes(a.qual) == bytes(b.qual)
