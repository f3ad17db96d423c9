import gzip
import os

import numpy as np
import pytest

from clair3_tpu.io.bgzf import BgzfWriter, decompress
from clair3_tpu.io.bam import BamRead, BamReader, write_bam
from clair3_tpu.io.fasta import FastaFile, build_fai, write_fasta
from clair3_tpu.io.vcf import VcfReader, VcfWriter, get_header, parse_vcf_line
from clair3_tpu.testing import SimVariant, random_reference, simulate_reads


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "x.gz")
    payload = os.urandom(200_000) + b"tail"
    with BgzfWriter(path) as w:
        w.write(payload)
    assert decompress(path) == payload
    # stdlib gzip must also read it (BGZF is valid multi-member gzip)
    with gzip.open(path, "rb") as fh:
        assert fh.read() == payload


def test_fasta_fetch(tmp_path):
    path = str(tmp_path / "ref.fa")
    seq1 = random_reference(157, seed=1)
    seq2 = random_reference(41, seed=2)
    write_fasta(path, {"chr1": seq1, "chrM": seq2}, line_width=50)
    fa = FastaFile(path)
    assert fa.references == ["chr1", "chrM"]
    assert fa.contig_length("chr1") == 157
    assert fa.fetch("chr1") == seq1
    assert fa.fetch("chr1", 49, 101) == seq1[49:101]
    assert fa.fetch("chrM", 0, 41) == seq2
    assert fa.fetch("chr1", 150, 400) == seq1[150:]
    assert fa.fetch("chr1", 10, 10) == ""


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    reads = [
        BamRead(
            qname="r1", flag=0, tid=0, pos=5, mapq=60,
            cigar=[(0, 10), (1, 2), (0, 5), (2, 3), (0, 4)],
            seq="ACGTACGTACGGTTACGTACG",
            qual=np.arange(21, dtype=np.uint8) + 20,
            tags={"HP": 1, "RG": "grp", "mv": np.array([5, 1, 0, 1], np.int8)},
        ),
        BamRead(
            qname="r2", flag=16, tid=0, pos=8, mapq=30,
            cigar=[(4, 3), (0, 8)], seq="ACGTACGTACG",
            qual=np.full(11, 25, np.uint8), tags={},
        ),
    ]
    write_bam(path, ["chr1", "chr2"], [1000, 500], reads)

    br = BamReader(path)
    assert br.references == ["chr1", "chr2"]
    assert br.lengths == [1000, 500]
    got = list(br)
    assert len(got) == 2
    r1 = got[0]
    assert (r1.qname, r1.flag, r1.pos, r1.mapq) == ("r1", 0, 5, 60)
    assert r1.cigar == reads[0].cigar
    assert r1.seq == reads[0].seq
    np.testing.assert_array_equal(r1.qual, reads[0].qual)
    assert r1.tags["HP"] == 1
    assert r1.tags["RG"] == "grp"
    np.testing.assert_array_equal(r1.tags["mv"], reads[0].tags["mv"])
    assert got[1].is_reverse
    assert r1.reference_length == 10 + 5 + 3 + 4  # M+M+D+M


def test_bam_fetch_overlap(tmp_path):
    path = str(tmp_path / "t.bam")
    reads = [
        BamRead("a", 0, 0, 0, 60, [(0, 10)], "A" * 10, np.full(10, 30, np.uint8)),
        BamRead("b", 0, 0, 20, 60, [(0, 10)], "C" * 10, np.full(10, 30, np.uint8)),
        BamRead("c", 256, 0, 25, 60, [(0, 10)], "G" * 10, np.full(10, 30, np.uint8)),  # secondary
        BamRead("d", 0, 0, 40, 2, [(0, 10)], "T" * 10, np.full(10, 30, np.uint8)),      # low mq
    ]
    write_bam(path, ["chr1"], [100], reads)
    br = BamReader(path)
    names = [r.qname for r in br.fetch("chr1", 5, 30, min_mq=5)]
    assert names == ["a", "b"]  # c filtered (secondary), d out of range anyway
    names = [r.qname for r in br.fetch("chr1", 35, 60, min_mq=0)]
    assert names == ["d"]
    names = [r.qname for r in br.fetch("chr1", 10, 12)]
    assert names == []  # read a ends at 10 (exclusive)


def test_simulated_reads_cover_variants(tmp_path):
    ref = random_reference(1200, seed=3)
    variants = [
        SimVariant(400, ref[400], "A" if ref[400] != "A" else "C", (0, 1)),
        SimVariant(600, ref[600], ref[600] + "TT", (1, 1)),  # hom ins
        SimVariant(800, ref[800:803], ref[800], (0, 1)),     # het del
    ]
    reads = simulate_reads(ref, variants, coverage=20, read_length=300, seed=0)
    assert len(reads) > 50
    # depth at position 500 should be ~20
    depth = sum(1 for r in reads if r.pos <= 500 < r.reference_end)
    assert 15 <= depth <= 25
    # roughly half the reads covering the het SNP carry the alt
    alt_count = 0
    cover = 0
    for r in reads:
        if r.pos <= 400 < r.reference_end and not any(op == 1 or op == 2 for op, _ in r.cigar):
            cover += 1
            if r.seq[400 - r.pos] == variants[0].alt:
                alt_count += 1
    assert cover > 0
    assert 0.3 <= alt_count / cover <= 0.7


def test_vcf_header_and_roundtrip(tmp_path):
    fa_path = str(tmp_path / "ref.fa")
    write_fasta(fa_path, {"chr1": "ACGT" * 100})
    header = get_header(reference_file_path=fa_path, sample_name="HG003")
    assert header.startswith("##fileformat=VCFv4.2")
    assert "##contig=<ID=chr1,length=400>" in header
    assert header.endswith("FORMAT\tHG003")
    assert "##FILTER=<ID=RefCall" in header

    gheader = get_header(reference_file_path=fa_path, gvcf=True)
    assert "NON_REF" in gheader and "MIN_DP" in gheader

    path = str(tmp_path / "out.vcf.gz")
    with VcfWriter(path, header) as w:
        w.write("chr1\t10\t.\tA\tT\t23.40\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:23:30:14,15:0.5000")
    rd = VcfReader(path)
    recs = list(rd)
    assert len(recs) == 1
    assert (recs[0].chrom, recs[0].pos, recs[0].ref, recs[0].alt) == ("chr1", 10, "A", "T")
    assert recs[0].genotype == (0, 1)
    assert not recs[0].is_phased


def test_parse_phased_gt():
    rec = parse_vcf_line("chr1\t5\t.\tA\tT\t30\tPASS\tP\tGT:PS\t1|0:1000")
    assert rec.genotype == (1, 0)
    assert rec.is_phased


def test_bam_reader_rejects_garbage(tmp_path):
    p = tmp_path / "junk.bam"
    p.write_bytes(b"not a bam at all")
    with pytest.raises(ValueError):
        BamReader(str(p))


def test_bam_reader_truncated_file(tmp_path):
    from clair3_tpu.testing import random_reference, simulate_reads

    ref = random_reference(2000, seed=55)
    reads = simulate_reads(ref, [], coverage=10, read_length=400, seed=55)
    full = tmp_path / "full.bam"
    write_bam(str(full), ["chr1"], [2000], reads)
    data = full.read_bytes()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[: len(data) * 2 // 3])  # cut mid-block
    # header parse may succeed; record iteration must not crash or hang
    try:
        rd = BamReader(str(trunc))
        n = sum(1 for _ in rd.fetch("chr1", 0, 2000))
        assert n <= len(reads)
    except ValueError:
        pass  # acceptable: detected corruption


def test_bgzf_threaded_writer_byte_identical(tmp_path):
    """BgzfWriter(threads=N) must produce byte-identical output to the
    serial writer (ordered block emission)."""
    import random

    from clair3_tpu.io.bgzf import BgzfWriter

    rng = random.Random(3)
    payload = bytes(rng.randrange(256) for _ in range(500_000))
    a = str(tmp_path / "serial.gz")
    b = str(tmp_path / "threaded.gz")
    with BgzfWriter(a) as w:
        for i in range(0, len(payload), 9973):
            w.write(payload[i:i + 9973])
    with BgzfWriter(b, threads=4) as w:
        for i in range(0, len(payload), 9973):
            w.write(payload[i:i + 9973])
    assert open(a, "rb").read() == open(b, "rb").read()


def test_bgzf_iter_lines(tmp_path):
    import random

    from clair3_tpu.io.bgzf import BgzfWriter, iter_lines

    rng = random.Random(8)
    lines = [f"chr1\t{i}\tEND={i+9}\t" + "x" * rng.randrange(0, 200)
             for i in range(50_000)]
    path = str(tmp_path / "t.gz")
    with BgzfWriter(path, level=1) as w:
        w.write(("\n".join(lines) + "\n").encode())
    assert list(iter_lines(path)) == lines
