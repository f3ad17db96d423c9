"""CRAM 3.0 reader/writer roundtrips and pipeline-level parity with BAM."""

import numpy as np
import pytest

from clair3_tpu.io.bam import BamRead, BamReader, write_bam
from clair3_tpu.io.cram import (CramReader, CramWriter, bam_to_cram,
                                cram_to_bam, read_itf8, read_ltf8, write_itf8,
                                write_ltf8)
from clair3_tpu.io.rans import rans_compress, rans_decompress
from clair3_tpu.testing import SimVariant, random_reference, simulate_reads, write_test_case


def test_itf8_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455,
              268435456, 2**31 - 1, -1, -2, -2147483648):
        data = write_itf8(v)
        got, p = read_itf8(data, 0)
        assert got == v and p == len(data), v
    for v in (0, 1, 127, 128, 2**14, 2**21, 2**28, 2**35, 2**42, 2**49,
              2**55, 2**56, 2**62, -1, -5):
        data = write_ltf8(v)
        got, p = read_ltf8(data, 0)
        assert got == v and p == len(data), v


def test_rans_roundtrip_orders():
    import random

    rng = random.Random(1)
    for order in (0, 1):
        for data in (b"", b"x", b"ACGT" * 500,
                     bytes(rng.randrange(256) for _ in range(9999)),
                     bytes(rng.choice(b"IIIIII###") for _ in range(12345))):
            assert rans_decompress(rans_compress(data, order)) == data


def _reads_equal(a: BamRead, b: BamRead):
    assert a.qname == b.qname
    assert a.flag == b.flag
    assert (a.tid, a.pos, a.mapq) == (b.tid, b.pos, b.mapq)
    assert list(a.cigar) == list(b.cigar)
    assert a.seq == b.seq
    np.testing.assert_array_equal(np.asarray(a.qual), np.asarray(b.qual))
    assert set(a.tags) == set(b.tags)
    for k in a.tags:
        va, vb = a.tags[k], b.tags[k]
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb)
        else:
            assert va == vb, k


def test_cram_roundtrip_simulated_reads(tmp_path):
    """BAM -> CRAM -> records: everything the pipeline consumes survives,
    including HP and mv:B:c tags, soft clips, indels, and mismatches."""
    L = 20_000
    ref = random_reference(L, seed=31)
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
        str(tmp_path), ref_length=L, variants=variants, coverage=8,
        read_length=2000, seed=31, error_rate=0.02, with_hp_tags=True,
        with_mv_tags=True)

    cram = str(tmp_path / "rt.cram")
    bam_to_cram(bam, cram, fasta)

    orig = list(BamReader(bam).fetch("chr1", 0, L, min_mq=0))
    back = list(CramReader(cram, ref_fn=fasta))
    assert len(back) == len(orig) > 50
    for a, b in zip(orig, back):
        _reads_equal(a, b)


def test_cram_roundtrip_edge_reads(tmp_path):
    """Hand-built edge cases: soft+hard clips, unmapped read, deletion at
    read start region, N-containing read base (stored verbatim)."""
    ref = random_reference(500, seed=32)
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n" + ref + "\n")

    def q(n):
        return np.full(n, 25, np.uint8)

    reads = [
        BamRead("r_clip", 0, 0, 50, 40,
                [(5, 3), (4, 5), (0, 40), (4, 5)],
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
    write_bam(bam, ["chr1"], [500], reads)
    cram = str(tmp_path / "edge.cram")
    bam_to_cram(bam, cram, fasta)
    back = {r.qname: r for r in CramReader(cram, ref_fn=fasta)}
    assert len(back) == len(reads)
    for r in reads:
        got = back[r.qname]
        if r.qname == "r_unmapped":
            assert got.flag & 0x4
            assert got.seq == r.seq
            continue
        _reads_equal(r, got)


def test_cram_to_bam_pipeline_parity(tmp_path):
    """The cascade must produce byte-identical VCF rows from CRAM input and
    from the original BAM."""
    import gzip

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import FullAlignmentOracleEngine, PileupOracleEngine

    ref = random_reference(3000, seed=33)
    variants = [
        SimVariant(600, ref[600], "C" if ref[600] != "C" else "G", (1, 1)),
        SimVariant(1200, ref[1200], "T" if ref[1200] != "T" else "A", (0, 1)),
        SimVariant(1800, ref[1800], ref[1800] + "ACG", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=3000, variants=variants, coverage=25,
        read_length=700, seed=33, error_rate=0.02)
    cram = str(tmp_path / "in.cram")
    bam_to_cram(bam, cram, fasta)

    def run(aln, outdir):
        cfg = CallConfig(
            platform="ont", bam_fn=aln, ref_fn=fasta, output_dir=str(outdir),
            no_phasing_for_fa=True, var_pct_full=1.0, ref_pct_full=1.0)
        outputs = VariantCaller(
            cfg, pileup_engine=PileupOracleEngine(),
            fa_engine=FullAlignmentOracleEngine()).run()
        with gzip.open(outputs["merge_output"], "rt") as f:
            return [l for l in f if not l.startswith("#")]

    rows_bam = run(bam, tmp_path / "out_bam")
    rows_cram = run(cram, tmp_path / "out_cram")
    assert rows_cram == rows_bam
    assert len(rows_bam) == 3


def test_cram31_roundtrip_with_new_codecs(tmp_path):
    """CRAM 3.1 output: QS/BA blocks use rANS-Nx16 (method 5), RN uses the
    tok3 name tokeniser (method 8); records decode identically to 3.0."""
    from clair3_tpu.io.cram import (M_RANSNX16, M_TOK3, read_block,
                                    read_container_header)

    L = 20_000
    ref = random_reference(L, seed=34)
    variants = [SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1))
                for p in range(500, L - 500, 900)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=8,
        read_length=2000, seed=34, error_rate=0.02, with_mv_tags=True)

    cram31 = str(tmp_path / "rt31.cram")
    bam_to_cram(bam, cram31, fasta, version=(3, 1))
    with open(cram31, "rb") as fh:
        magic = fh.read(6)
    assert magic[4:6] == bytes([3, 1])

    orig = list(BamReader(bam).fetch("chr1", 0, L, min_mq=0))
    back = list(CramReader(cram31, ref_fn=fasta))
    assert len(back) == len(orig) > 30
    for a, b in zip(orig, back):
        _reads_equal(a, b)

    # inspect the raw container blocks: methods 5 and 8 must really be used
    methods = set()
    with open(cram31, "rb") as fh:
        fh.seek(26)  # magic + file id
        while True:
            hdr = read_container_header(fh)
            if hdr is None:
                break
            payload = fh.read(hdr.length)
            p = 0
            for _ in range(hdr.n_blocks):
                try:
                    block, p = read_block(payload, p)
                except Exception:
                    break
                methods.add(block.method)
    assert M_RANSNX16 in methods
    assert M_TOK3 in methods


def test_cram31_pipeline_parity(tmp_path):
    """Variant calls from CRAM 3.1 input match the same reads as BAM."""
    import gzip

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import FullAlignmentOracleEngine, PileupOracleEngine

    ref = random_reference(3000, seed=35)
    variants = [
        SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (1, 1)),
        SimVariant(1500, ref[1500], ref[1500] + "AG", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=3000, variants=variants, coverage=25,
        read_length=700, seed=35, error_rate=0.02)
    cram = str(tmp_path / "in31.cram")
    bam_to_cram(bam, cram, fasta, version=(3, 1))

    def run(aln, outdir):
        cfg = CallConfig(
            platform="ont", bam_fn=aln, ref_fn=fasta, output_dir=str(outdir),
            no_phasing_for_fa=True, var_pct_full=1.0, ref_pct_full=1.0)
        outputs = VariantCaller(
            cfg, pileup_engine=PileupOracleEngine(),
            fa_engine=FullAlignmentOracleEngine()).run()
        with gzip.open(outputs["merge_output"], "rt") as f:
            return [l for l in f if not l.startswith("#")]

    assert run(cram, tmp_path / "out31") == run(bam, tmp_path / "outb")
