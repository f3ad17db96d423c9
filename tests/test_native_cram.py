"""Differential tests: native CRAM->BAM converter (clair3t_cram.cc) vs the
pure-Python CramReader oracle — identical records, valid BAI, and CRAM 3.1
files falling back to the Python path transparently."""

import os

import numpy as np
import pytest

from clair3_tpu import native
from clair3_tpu.io.bam import BamRead, BamReader, write_bam
from clair3_tpu.io.cram import CramReader, bam_to_cram
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable")


def _reads_equal(a: BamRead, b: BamRead):
    assert a.qname == b.qname
    assert a.flag == b.flag
    assert (a.tid, a.pos, a.mapq) == (b.tid, b.pos, b.mapq)
    assert a.cigar == b.cigar
    assert a.seq == b.seq
    assert np.array_equal(np.asarray(a.qual), np.asarray(b.qual))
    assert set(a.tags) == set(b.tags)
    for k in a.tags:
        va, vb = a.tags[k], b.tags[k]
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            assert np.array_equal(np.asarray(va), np.asarray(vb)), k
        else:
            assert va == vb, k


@pytest.fixture(scope="module")
def case(tmp_path_factory):
    d = tmp_path_factory.mktemp("ncram")
    L = 30_000
    ref = random_reference(L, seed=61)
    variants = []
    for p in range(500, L - 500, 900):
        kind = p % 3
        if kind == 0:
            variants.append(SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1)))
        elif kind == 1:
            variants.append(SimVariant(p, ref[p], ref[p] + "TTAG", (0, 1)))
        else:
            variants.append(SimVariant(p, ref[p:p + 4], ref[p], (1, 1)))
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=L, variants=variants, coverage=8,
        read_length=2000, seed=61, error_rate=0.02, with_hp_tags=True,
        with_mv_tags=True)
    cram = str(d / "in.cram")
    bam_to_cram(bam, cram, fasta)
    return {"fasta": fasta, "bam": bam, "cram": cram, "L": L, "dir": str(d)}


def test_native_records_match_python_reader(case, tmp_path):
    out_bam = str(tmp_path / "native.bam")
    got = native.cram_to_bam_native(case["cram"], case["fasta"], out_bam)
    assert got == out_bam
    assert os.path.exists(out_bam + ".bai")

    want = list(CramReader(case["cram"], ref_fn=case["fasta"]))
    want.sort(key=lambda r: (r.tid, r.pos))
    back = list(BamReader(out_bam))
    assert len(back) == len(want) > 50
    for a, b in zip(want, back):
        _reads_equal(a, b)


def test_native_bai_serves_windowed_fetch(case, tmp_path):
    out_bam = str(tmp_path / "nidx.bam")
    assert native.cram_to_bam_native(case["cram"], case["fasta"], out_bam)
    lo, hi = 8_000, 12_000
    via_native = [r.qname for r in BamReader(out_bam).fetch("chr1", lo, hi)]
    via_python = [r.qname for r in BamReader(case["bam"]).fetch("chr1", lo, hi)]
    assert via_native == via_python
    assert len(via_native) > 5


def test_cram31_served_natively(case, tmp_path):
    """CRAM 3.1 (rANS-Nx16 + tok3 blocks) converts natively too."""
    cram31 = str(tmp_path / "in31.cram")
    bam_to_cram(case["bam"], cram31, case["fasta"], version=(3, 1))
    out_bam = str(tmp_path / "n31.bam")
    assert native.cram_to_bam_native(cram31, case["fasta"], out_bam) == out_bam
    back = list(BamReader(out_bam))
    want = sorted(CramReader(case["cram"], ref_fn=case["fasta"]),
                  key=lambda r: (r.tid, r.pos))
    assert len(back) == len(want)
    for a, b in zip(want, back):
        _reads_equal(a, b)


def test_unsupported_input_falls_back_to_python(case, tmp_path):
    """Coordinate-UNSORTED records are outside the native converter's
    scope (it streams BAM+BAI, so it requires sorted input): it returns
    None and cram_to_bam transparently uses the Python reader, which
    sorts.  (bzip2/lzma/arith-EXT blocks, the former fallback triggers
    here, all decode natively now — test_codec_matrix_native below.)"""
    from clair3_tpu.io.bam import write_bam

    reads = sorted(CramReader(case["cram"], ref_fn=case["fasta"]),
                   key=lambda r: (r.tid, r.pos))
    shuffled = reads[::-1]  # fully reversed: unambiguously unsorted
    unsorted_bam = str(tmp_path / "unsorted.bam")
    refs = CramReader(case["cram"], ref_fn=case["fasta"]).references
    lens = CramReader(case["cram"], ref_fn=case["fasta"]).lengths
    write_bam(unsorted_bam, refs, lens, shuffled)
    cram_u = str(tmp_path / "unsorted.cram")
    bam_to_cram(unsorted_bam, cram_u, case["fasta"])

    out_bam = str(tmp_path / "na.bam")
    assert native.cram_to_bam_native(cram_u, case["fasta"], out_bam) is None
    from clair3_tpu.io.cram import cram_to_bam

    got = cram_to_bam(cram_u, out_bam, case["fasta"])
    # same-position reads keep arbitrary relative order through the sort:
    # compare with qname as the tiebreak
    key = lambda r: (r.tid, r.pos, r.qname)  # noqa: E731
    back = sorted(BamReader(got), key=key)
    want = sorted(reads, key=key)
    assert len(back) == len(want)
    for a, b in zip(want, back):
        _reads_equal(a, b)


@pytest.mark.parametrize("version,method_name", [
    ((3, 0), "M_GZIP"), ((3, 0), "M_BZIP2"), ((3, 0), "M_LZMA"),
    ((3, 0), "M_RANS"), ((3, 1), "M_RANSNX16"), ((3, 1), "M_ARITH"),
    ((3, 1), "M_TOK3"),
])
def test_codec_matrix_native(case, tmp_path, version, method_name):
    """Property fuzz over the FULL writable codec matrix: every EXTERNAL
    block of a real container forced onto one compression method
    (CramWriter method_override), decoded by the NATIVE converter with no
    Python fallback, records identical to the Python oracle reader.
    Covers the r4 gaps: native bzip2 (method 2), native lzma/.xz
    (method 3) — clair3t_bzip2.cc / clair3t_xz.cc."""
    import clair3_tpu.io.cram as cram_mod
    from clair3_tpu.io.bam import BamReader as BR
    from clair3_tpu.io.cram import CramWriter

    method = getattr(cram_mod, method_name)
    cram_p = str(tmp_path / f"m{method}.cram")
    bam = BR(case["bam"])
    with CramWriter(cram_p, bam.references, bam.lengths,
                    ref_fn=case["fasta"], header_text=bam.header_text or None,
                    version=version, method_override=method,
                    records_per_slice=97) as w:  # odd slice size: more blocks
        for read in bam:
            w.write(read)

    out_bam = str(tmp_path / "native.bam")
    got = native.cram_to_bam_native(cram_p, case["fasta"], out_bam)
    assert got is not None, f"native converter refused method {method_name}"
    back = list(BamReader(got))
    want = sorted(CramReader(case["cram"], ref_fn=case["fasta"]),
                  key=lambda r: (r.tid, r.pos))
    assert len(back) == len(want)
    for a, b in zip(want, back):
        _reads_equal(a, b)


def test_arith_ext_blocks_decode_natively(case, tmp_path, monkeypatch):
    """The arith codec's EXT transform (an embedded bzip2 stream,
    io/arith.py:320-323) decodes in-library now (clair3t_arith.cc ->
    clair3t_bzip2.cc): force the writer's arith blocks onto F_EXT and
    convert natively with no fallback."""
    import clair3_tpu.io.arith as arith_mod
    import clair3_tpu.io.cram as cram_mod

    orig = cram_mod._compress

    def compress_ext(method, data):
        if method == cram_mod.M_ARITH:
            return arith_mod.arith_compress(data, arith_mod.F_EXT)
        return orig(method, data)

    monkeypatch.setattr(cram_mod, "_compress", compress_ext)
    cram_p = str(tmp_path / "ext.cram")
    from clair3_tpu.io.bam import BamReader as BR
    from clair3_tpu.io.cram import CramWriter

    bam = BR(case["bam"])
    with CramWriter(cram_p, bam.references, bam.lengths,
                    ref_fn=case["fasta"], header_text=bam.header_text or None,
                    version=(3, 1),
                    method_override=cram_mod.M_ARITH) as w:
        for read in bam:
            w.write(read)
    monkeypatch.undo()

    out_bam = str(tmp_path / "ext.bam")
    got = native.cram_to_bam_native(cram_p, case["fasta"], out_bam)
    assert got is not None, "native converter refused arith-EXT blocks"
    back = list(BamReader(got))
    want = sorted(CramReader(case["cram"], ref_fn=case["fasta"]),
                  key=lambda r: (r.tid, r.pos))
    assert len(back) == len(want)
    for a, b in zip(want, back):
        _reads_equal(a, b)


def test_native_bzip2_xz_random_stream_fuzz():
    """Randomized-payload differential fuzz of the two new block codecs vs
    their stdlib oracles: random bytes, DNA-like, repetitive, all-zero and
    empty payloads; multi-block bzip2 (compresslevel=1 at >100k forces
    multiple 100k blocks); corrupted streams must fail, not crash."""
    import bz2
    import lzma

    from clair3_tpu.native import bzip2_decode_native, xz_decode_native

    rng = np.random.RandomState(11)
    payloads = [b"", b"a", bytes(1000)]
    for n in (17, 997, 65536, 250_000):
        payloads.append(rng.randint(0, 256, n).astype(np.uint8).tobytes())
        payloads.append(rng.choice(list(b"ACGT"), n).astype(np.uint8).tobytes())
        payloads.append((b"qualqualQUAL!!" * (n // 14 + 1))[:n])
    for data in payloads:
        for comp, fn in ((bz2.compress(data, 1), bzip2_decode_native),
                         (bz2.compress(data, 9), bzip2_decode_native),
                         (lzma.compress(data), xz_decode_native),
                         (lzma.compress(data, preset=1), xz_decode_native)):
            assert fn(comp, len(data)) == data
    # corruption: every byte position of a small stream, flipped
    data = payloads[4][:4096]
    for comp, fn in ((bz2.compress(data), bzip2_decode_native),
                     (lzma.compress(data), xz_decode_native)):
        for i in range(0, len(comp), max(1, len(comp) // 64)):
            bad = bytearray(comp)
            bad[i] ^= 0x5A
            try:
                out = fn(bytes(bad), len(data))
                # a flip the checksum catches must NOT return success with
                # wrong bytes
                assert out == data or False, "corruption accepted"
            except ValueError:
                pass  # rejected, as it should be


def test_native_nx16_and_tok3_decoders_match_python(tmp_path):
    """Direct differential: the native rANS-Nx16 / tok3 decoders reproduce
    the Python codecs byte-for-byte across the transform matrix."""
    import ctypes
    import random

    from clair3_tpu.io.rans_nx16 import (F_CAT, F_N32, F_ORDER1, F_PACK,
                                         F_RLE, F_STRIPE, rans_nx16_compress)
    from clair3_tpu.io.tok3 import tok3_compress

    lib = native.get_lib()
    for name in ("clair3t_rans_nx16_decode", "clair3t_tok3_decode"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]

    rng = random.Random(5150)
    corpora = [b"", b"Q" * 5000,
               bytes(rng.choice(b"ACGTN") for _ in range(15000)),
               bytes(rng.randrange(256) for _ in range(8000))]
    q = bytearray()
    while len(q) < 10000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(1, 50)
    corpora.append(bytes(q))
    for flags in (0, F_ORDER1, F_N32 | F_ORDER1, F_PACK | F_RLE | F_ORDER1,
                  F_CAT, F_STRIPE | F_ORDER1):
        for data in corpora:
            blob = rans_nx16_compress(data, flags)
            out = (ctypes.c_uint8 * max(len(data), 1))()
            rc = lib.clair3t_rans_nx16_decode(blob, len(blob), out, len(data))
            assert rc == 0 and bytes(out[:len(data)]) == data, flags

    names = b"".join(f"A001:12:H7:1:{x}:{y}\x00".encode()
                     for x, y in zip(range(100, 800, 7), range(5000, 90000, 71)))
    blob = tok3_compress(names)
    out = (ctypes.c_uint8 * len(names))()
    rc = lib.clair3t_tok3_decode(blob, len(blob), out, len(names))
    assert rc == 0 and bytes(out[:len(names)]) == names


def test_edge_reads_through_native(tmp_path):
    """Soft+hard clips, deletions, insertions, skips, unmapped, N bases."""
    ref = random_reference(600, seed=62)
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n" + ref + "\n")

    def q(n):
        return np.full(n, 25, np.uint8)

    reads = [
        BamRead("r_clip", 0, 0, 50, 40, [(5, 3), (4, 5), (0, 40), (4, 5)],
                "ACGTA" + ref[50:90] + "TTTTT", q(50), {"HP": 1}),
        BamRead("r_del", 16, 0, 100, 55, [(0, 20), (2, 7), (0, 20)],
                ref[100:120] + ref[127:147], q(40), {"XX": "hello"}),
        BamRead("r_ins", 0, 0, 150, 60, [(0, 10), (1, 4), (0, 10)],
                ref[150:160] + "ACGT" + ref[160:170], q(24),
                {"mv": np.array([5, 1, 0, 1], np.int8)}),
        BamRead("r_mm_n", 0, 0, 200, 60, [(0, 30)],
                ref[200:210] + "N" + ref[211:230], q(30), {}),
        BamRead("r_skip", 0, 0, 250, 60, [(0, 10), (3, 100), (0, 10)],
                ref[250:260] + ref[360:370], q(20), {}),
        BamRead("r_unmapped", 4, 0, 300, 0, [], "ACGTNACGT", q(9), {}),
    ]
    bam = str(tmp_path / "edge.bam")
    write_bam(bam, ["chr1"], [600], reads)
    cram = str(tmp_path / "edge.cram")
    bam_to_cram(bam, cram, fasta)

    out_bam = str(tmp_path / "edge_native.bam")
    assert native.cram_to_bam_native(cram, fasta, out_bam)
    back = {r.qname: r for r in BamReader(out_bam)}
    assert len(back) == len(reads)
    for r in reads:
        got = back[r.qname]
        if r.qname == "r_unmapped":
            assert got.flag & 0x4
            assert got.seq == r.seq
            continue
        _reads_equal(r, got)


def test_pipeline_uses_native_converter(case, tmp_path):
    """End-to-end `call` on CRAM input: calls identical to BAM input, and
    the conversion goes through the native path (no fallback notice)."""
    import gzip

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import PileupOracleEngine

    def run(aln, outdir):
        cfg = CallConfig(
            platform="ont", bam_fn=aln, ref_fn=case["fasta"],
            output_dir=str(outdir), pileup_only=True)
        outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
        with gzip.open(outputs["merge_output"], "rt") as f:
            return [l for l in f if not l.startswith("#")]

    rows_cram = run(case["cram"], tmp_path / "oc")
    rows_bam = run(case["bam"], tmp_path / "ob")
    assert rows_cram == rows_bam
    assert len(rows_bam) > 10
