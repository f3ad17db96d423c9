"""Differential tests: native C++ pileup extractor vs the numpy oracle
(the same C-vs-Python identity strategy the reference project used,
docs/v0.1_r11_speedup.md:7)."""

import numpy as np
import pytest

from clair3_tpu.io.bam import BamReader
from clair3_tpu.io.fasta import FastaFile
from clair3_tpu.pileup.extractor import pileup_region
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

native = pytest.importorskip("clair3_tpu.native")
if not native.native_available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def _both(bam, fasta, ctg, start, end, **kw):
    fa = FastaFile(fasta)
    ref_start = max(0, start - 1000)
    ref_seq = fa.fetch(ctg, ref_start, end + 1000)
    fa.close()
    br = BamReader(bam)
    py = pileup_region(
        br.fetch(ctg, start, end, min_mq=kw.get("min_mq", 5)),
        ref_seq, ref_start, start, end, **{k: v for k, v in kw.items() if k != "min_mq"})
    nat = native.pileup_region_native(
        bam, ref_seq, ref_start, ctg, start, end, **kw)
    return py, nat


def _assert_identical(py, nat):
    np.testing.assert_array_equal(py.counts, nat.counts)
    np.testing.assert_array_equal(py.depth, nat.depth)
    assert len(py.candidates) == len(nat.candidates)
    for a, b in zip(py.candidates, nat.candidates):
        assert (a.pos, a.depth, a.ref_base) == (b.pos, b.depth, b.ref_base)
        assert a.alt_info == b.alt_info
    if py.pos_ref_count is not None:
        np.testing.assert_array_equal(py.pos_ref_count, nat.pos_ref_count)
        np.testing.assert_array_equal(py.pos_total_count, nat.pos_total_count)


def test_native_matches_python_snps_and_indels(tmp_path):
    ref = random_reference(3000, seed=51)
    variants = [
        SimVariant(600, ref[600], "C" if ref[600] != "C" else "G", (1, 1)),
        SimVariant(1000, ref[1000], "T" if ref[1000] != "T" else "A", (0, 1)),
        SimVariant(1500, ref[1500], ref[1500] + "TAG", (0, 1)),
        SimVariant(2000, ref[2000:2004], ref[2000], (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=3000, variants=variants, coverage=25,
        read_length=600, seed=51, error_rate=0.02)
    py, nat = _both(bam, fasta, "chr1", 0, 3000, gvcf=True)
    assert len(py.candidates) >= 4
    _assert_identical(py, nat)


def test_native_matches_python_subregion_and_flags(tmp_path):
    ref = random_reference(2000, seed=52)
    variants = [SimVariant(p, ref[p], "A" if ref[p] != "A" else "C", (0, 1))
                for p in (400, 800, 1200)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2000, variants=variants, coverage=18,
        read_length=400, seed=52, error_rate=0.01)
    # sub-region with call_ht (head/tail) enabled and snp-only mode
    py, nat = _both(bam, fasta, "chr1", 350, 1300, call_ht=True)
    _assert_identical(py, nat)
    py, nat = _both(bam, fasta, "chr1", 0, 2000, call_snp_only=True)
    _assert_identical(py, nat)
    py, nat = _both(bam, fasta, "chr1", 0, 2000, min_snp_af=0.3, min_indel_af=0.5)
    _assert_identical(py, nat)


def test_native_speedup(tmp_path):
    """The native path must beat the numpy oracle by a wide margin."""
    import time

    ref = random_reference(20_000, seed=53)
    variants = [SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1))
                for p in range(500, 19_500, 500)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=20_000, variants=variants, coverage=30,
        read_length=1000, seed=53, error_rate=0.02)

    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, 20_000)
    fa.close()

    t0 = time.perf_counter()
    br = BamReader(bam)
    pileup_region(br.fetch("chr1", 0, 20_000, min_mq=5), ref_seq, 0, 0, 20_000)
    t_py = time.perf_counter() - t0

    native.pileup_region_native(bam, ref_seq, 0, "chr1", 0, 20_000)  # warm build
    t0 = time.perf_counter()
    native.pileup_region_native(bam, ref_seq, 0, "chr1", 0, 20_000)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py / 3, f"native {t_nat:.3f}s vs python {t_py:.3f}s"


def test_threaded_counting_identical_to_single_thread(tmp_path):
    """Genome-subrange sharded counting (threads>1) must be bit-identical to
    the single-thread pass: shard-boundary-spanning reads, indel anchors at
    boundaries, counts/depth/candidates/alt-infos/gVCF counts."""
    L = 400_000  # > 64kb/shard floor so 4 shards actually engage
    ref = random_reference(L, seed=91)
    variants = []
    for p in range(500, L - 500, 900):
        kind = p % 3
        if kind == 0:
            variants.append(SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1)))
        elif kind == 1:
            variants.append(SimVariant(p, ref[p], ref[p] + "AC", (0, 1)))
        else:
            variants.append(SimVariant(p, ref[p:p + 3], ref[p], (1, 1)))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=12,
        read_length=3000, seed=91, error_rate=0.03)
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, L)
    fa.close()
    one = native.pileup_region_native(
        bam, ref_seq, 0, "chr1", 0, L, gvcf=True, threads=1)
    four = native.pileup_region_native(
        bam, ref_seq, 0, "chr1", 0, L, gvcf=True, threads=4)
    _assert_identical(one, four)
    assert len(one.candidates) > 100


def test_native_matches_python_multiwindow_bai_load(tmp_path):
    """Multi-window indexed load (BamView.load_ranges with n_win > 1): a long
    read parked in a coarse BAI bin plus a >64 KiB compressed gap of
    non-overlapping reads forces query_chunks to return two windows, so the
    two-pass decode must place each window's kept bytes (including partially
    trimmed boundary blocks) at the right output offset.  Differential vs the
    numpy oracle over the query region."""
    import numpy as np
    from clair3_tpu.io.bam import BamRead, write_bam
    from clair3_tpu.io.fasta import write_fasta

    L = 1_200_000
    ref = random_reference(L, seed=77)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chr1": ref})

    reads = []
    qual1k = np.full(1000, 30, np.uint8)

    def add(pos, length, qual=None):
        reads.append(BamRead(
            qname=f"r{len(reads)}", flag=0, tid=0, pos=pos, mapq=60,
            cigar=[(0, length)], seq=ref[pos:pos + length],
            qual=qual if qual is not None else np.full(length, 30, np.uint8)))

    # one long read crossing the 1 MiB linear boundary -> coarse (8 Mb) bin,
    # early in file order
    add(880_000, 250_000)
    # dense cluster that ends before the query region: >64 KiB compressed
    # between the coarse-bin chunk and the query's fine-bin chunks
    for layer in range(30):
        for p in range(880_000 + layer * 33, 1_039_000, 1000):
            add(p, 1000, qual1k)
    # reads overlapping the query region
    for layer in range(20):
        for p in range(1_060_000 + layer * 50, 1_129_000, 1000):
            add(p, 1000, qual1k)
    reads.sort(key=lambda r: r.pos)
    bam = str(tmp_path / "reads.bam")
    write_bam(bam, ["chr1"], [L], reads)

    qs, qe = 1_070_000, 1_120_000
    _tid, _voffs, n_win = native._bai_windows(bam, "chr1", qs, qe)
    assert n_win >= 2, f"fixture no longer forces a multi-window load ({n_win})"

    py, nat = _both(bam, fasta, "chr1", qs, qe, gvcf=True)
    _assert_identical(py, nat)
    assert int(nat.depth.max()) >= 20  # the window actually saw the reads
