"""Differential tests of the native fast raw-DEFLATE decoder (inflate.h)
against zlib across levels, strategies, and data shapes — the fast path must
be byte-identical wherever it claims success, and the BGZF readers must
produce identical BAM records with it enabled."""

import ctypes
import random
import zlib

import numpy as np
import pytest

from clair3_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable")


def _raw_inflate(comp: bytes, out_len: int):
    lib = native.get_lib()
    fn = lib.clair3t_raw_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    out = (ctypes.c_uint8 * max(out_len, 1))()
    ok = fn(comp, len(comp), out, out_len)
    return ok, bytes(out[:out_len])


def _deflate(data: bytes, level: int, strategy=zlib.Z_DEFAULT_STRATEGY):
    co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return co.compress(data) + co.flush()


def _corpora():
    rng = random.Random(77)
    yield b""
    yield b"a"
    yield b"abc" * 10
    yield bytes(rng.randrange(256) for _ in range(100_000))      # incompressible
    yield bytes(rng.choice(b"ACGTN") for _ in range(200_000))    # dna-ish
    yield b"\x00" * 150_000                                      # long matches
    yield (b"pattern-12345-" * 5000)[:65_536]                    # repeats
    # BAM-record-like: binary with embedded strings and runs
    rec = bytearray()
    while len(rec) < 120_000:
        rec += rng.randbytes(24)
        rec += b"read_%06d\x00" % rng.randrange(10**6)
        rec += bytes([rng.choice(b"\x12\x48\x84\x21")] * rng.randrange(10, 80))
    yield bytes(rec)


@pytest.mark.parametrize("level", [0, 1, 5, 6, 9])
def test_differential_vs_zlib_levels(level):
    for data in _corpora():
        comp = _deflate(data, level)
        ok, out = _raw_inflate(comp, len(data))
        assert ok == 1, (level, len(data))
        assert out == data, (level, len(data))


@pytest.mark.parametrize("strategy", [
    zlib.Z_DEFAULT_STRATEGY, zlib.Z_FILTERED, zlib.Z_HUFFMAN_ONLY,
    zlib.Z_RLE, zlib.Z_FIXED,
])
def test_differential_vs_zlib_strategies(strategy):
    rng = random.Random(3)
    for data in (bytes(rng.choice(b"ACGT!") for _ in range(50_000)),
                 b"\x07" * 30_000,
                 bytes(rng.randrange(256) for _ in range(20_000))):
        comp = _deflate(data, 6, strategy)
        ok, out = _raw_inflate(comp, len(data))
        assert ok == 1
        assert out == data


def test_fuzz_differential():
    rng = random.Random(1234)
    for trial in range(120):
        n = rng.randrange(0, 70_000)
        nsym = rng.choice((1, 2, 4, 30, 256))
        alpha = bytes(rng.randrange(256) for _ in range(nsym))
        if rng.random() < 0.4:
            # runs/repeat structure to hit long matches & RLE strategies
            data = bytearray()
            while len(data) < n:
                if rng.random() < 0.5:
                    data += bytes([rng.choice(alpha)]) * rng.randrange(1, 300)
                else:
                    data += bytes(rng.choice(alpha) for _ in range(rng.randrange(1, 50)))
            data = bytes(data[:n])
        else:
            data = bytes(rng.choice(alpha) for _ in range(n))
        level = rng.choice((1, 4, 6, 9))
        comp = _deflate(data, level)
        ok, out = _raw_inflate(comp, len(data))
        assert ok == 1, (trial, level, n)
        assert out == data, (trial, level, n)


def test_truncated_and_garbage_fail_or_fallback():
    """Corrupt streams must not be silently accepted as success with wrong
    size; the BGZF layer additionally falls back to zlib when we return 0."""
    data = b"ACGT" * 5000
    comp = _deflate(data, 6)
    ok, _ = _raw_inflate(comp[: len(comp) // 2], len(data))
    assert ok == 0
    ok, _ = _raw_inflate(b"\xff" * 100, 1000)
    assert ok == 0
    # wrong declared output size
    ok, _ = _raw_inflate(comp, len(data) - 7)
    assert ok == 0


def test_bam_loads_identical_through_fast_path(tmp_path):
    """End-to-end: native region extraction (which inflates every BGZF block
    through the fast path) matches the pure-Python oracle reader."""
    from clair3_tpu.io.bam import BamReader
    from clair3_tpu.native import pileup_region_native
    from clair3_tpu.pileup.extractor import pileup_region
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    L = 120_000
    ref = random_reference(L, seed=55)
    variants = [SimVariant(p, ref[p], "A" if ref[p] != "A" else "C", (0, 1))
                for p in range(600, L - 600, 1500)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=12,
        read_length=3000, seed=55, error_rate=0.02)
    reads = BamReader(bam).fetch("chr1", 0, L)
    want = pileup_region(reads, ref, 0, 0, L)
    got = pileup_region_native(bam, ref, 0, "chr1", 0, L)
    assert np.array_equal(want.counts, got.counts)
    assert np.array_equal(want.depth, got.depth)
    assert [c.pos for c in want.candidates] == \
        [c.pos for c in got.candidates]
