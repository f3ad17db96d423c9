"""Differential tests: native C++ full-alignment extractor vs the numpy
oracle (bit-identical tensors, alt-info, and subsampling decisions via the
shared xorshift PRNG)."""

import numpy as np
import pytest

from clair3_tpu.fullalign.extractor import PhasedVariant, fa_region
from clair3_tpu.io.bam import BamReader
from clair3_tpu.io.fasta import FastaFile
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

native = pytest.importorskip("clair3_tpu.native")
if not native.native_available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def _both(bam, fasta, ctg, candidates0, variants=(), **kw):
    fa = FastaFile(fasta)
    lo = max(0, min(candidates0) - 16)
    hi = max(candidates0) + 17
    ref_start = max(0, lo - 2000)
    ref_seq = fa.fetch(ctg, ref_start, hi + 2000)
    fa.close()
    br = BamReader(bam)
    reads = list(br.fetch(ctg, lo, hi, min_mq=kw.get("min_mq", 5)))
    py_kw = {k: v for k, v in kw.items() if k != "min_mq"}
    py = fa_region(reads, ref_seq, ref_start, candidates0, variants, **py_kw)
    nat = native.fa_region_native(
        bam, ref_seq, ref_start, ctg, candidates0, variants, **kw)
    return py, nat


def _assert_identical(py, nat):
    py_t, py_pos, py_alt = py
    nat_t, nat_pos, nat_alt = nat
    assert py_pos == nat_pos
    assert py_alt == nat_alt
    np.testing.assert_array_equal(py_t, nat_t)


def test_fa_native_matches_oracle_mixed_variants(tmp_path):
    ref = random_reference(3000, seed=71)
    variants = [
        SimVariant(600, ref[600], "C" if ref[600] != "C" else "G", (1, 1)),
        SimVariant(1000, ref[1000], "T" if ref[1000] != "T" else "A", (0, 1)),
        SimVariant(1500, ref[1500], ref[1500] + "TAG", (0, 1)),
        SimVariant(2000, ref[2000:2004], ref[2000], (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=3000, variants=variants, coverage=20,
        read_length=600, seed=71, error_rate=0.02)
    cands = [v.pos for v in variants]
    py, nat = _both(bam, fasta, "chr1", cands,
                    matrix_depth=30, need_haplotagging=False)
    _assert_identical(py, nat)


def test_fa_native_with_haplotagging(tmp_path):
    ref = random_reference(2500, seed=72)
    snp_alt = "C" if ref[700] != "C" else "A"
    cand_alt = "G" if ref[1200] != "G" else "T"
    sim = [
        SimVariant(700, ref[700], snp_alt, (0, 1)),
        SimVariant(1200, ref[1200], cand_alt, (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2500, variants=sim, coverage=24,
        read_length=900, seed=72, error_rate=0.01)
    phased = [PhasedVariant(700, ref[700], snp_alt, 1, 701)]
    py, nat = _both(bam, fasta, "chr1", [1200], phased,
                    matrix_depth=40, need_haplotagging=True)
    _assert_identical(py, nat)
    # haplotagging produced both haplotype codes in the tensor
    hap_col = py[0][0, :, 16, 7]
    assert {30, 90} <= set(hap_col.tolist())


def test_fa_native_subsampling_agrees(tmp_path):
    ref = random_reference(1500, seed=73)
    v = SimVariant(700, ref[700], "A" if ref[700] != "A" else "T", (0, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=1500, variants=[v], coverage=60,
        read_length=500, seed=73, error_rate=0.01)
    # coverage 60 > matrix_depth 20 -> xorshift down-sampling must agree
    py, nat = _both(bam, fasta, "chr1", [700],
                    matrix_depth=20, need_haplotagging=False, seed=7)
    _assert_identical(py, nat)


def test_fa_native_dwell_channel(tmp_path):
    import clair3_tpu.io.bam as bam_mod
    from clair3_tpu.io.bam import BamRead, write_bam

    ref = random_reference(400, seed=74)
    reads = []
    for i in range(6):
        seq = ref[0:300]
        mv = np.array([5] + [1, 0] + [1] * 298, np.int8)  # base0: 2 blocks
        reads.append(BamRead(
            f"d{i}", 0 if i % 2 == 0 else 16, 0, 0, 60, [(0, 300)], seq,
            np.full(300, 30, np.uint8), {"mv": mv}))
    fasta = str(tmp_path / "ref.fa")
    from clair3_tpu.io.fasta import write_fasta
    write_fasta(fasta, {"chr1": ref})
    bam = str(tmp_path / "r.bam")
    write_bam(bam, ["chr1"], [400], reads)
    py, nat = _both(bam, fasta, "chr1", [150],
                    matrix_depth=8, need_haplotagging=False, enable_dwell=True)
    _assert_identical(py, nat)
    assert py[0].shape[-1] == 9
    assert (py[0][0, 1:7, 16, 8] == 1).all()


def test_fa_native_speedup(tmp_path):
    import time

    ref = random_reference(30_000, seed=75)
    sim = [SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1))
           for p in range(500, 29_500, 400)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=30_000, variants=sim, coverage=30,
        read_length=1000, seed=75, error_rate=0.02)
    cands = [v.pos for v in sim]
    phased = [PhasedVariant(v.pos, v.ref, v.alt, 1, 501) for v in sim if len(v.ref) == 1]

    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, 30_000)
    fa.close()

    t0 = time.perf_counter()
    br = BamReader(bam)
    reads = list(br.fetch("chr1", 0, 30_000, min_mq=5))
    fa_region(reads, ref_seq, 0, cands, phased, matrix_depth=55)
    t_py = time.perf_counter() - t0

    native.fa_region_native(bam, ref_seq, 0, "chr1", cands, phased, matrix_depth=55)
    t0 = time.perf_counter()
    native.fa_region_native(bam, ref_seq, 0, "chr1", cands, phased, matrix_depth=55)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py / 3, f"native {t_nat:.3f}s vs python {t_py:.3f}s"


def test_fa_threaded_fill_identical(tmp_path, monkeypatch):
    """The per-candidate fill sharded over 4 threads must be bit-identical
    to the single-thread result (forced via CLAIR3T_FA_THREADS; the env is
    read per call, so both runs happen in this process)."""
    import os

    ref = random_reference(60_000, seed=77)
    variants = [SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1))
                for p in range(500, 59_500, 300)]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=60_000, variants=variants, coverage=20,
        read_length=2000, seed=77, error_rate=0.03)
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, 60_000)
    fa.close()
    cands = [v.pos for v in variants]
    monkeypatch.setenv("CLAIR3T_FA_THREADS", "1")
    one = native.fa_region_native(bam, ref_seq, 0, "chr1", cands, seed=5)
    monkeypatch.setenv("CLAIR3T_FA_THREADS", "4")
    four = native.fa_region_native(bam, ref_seq, 0, "chr1", cands, seed=5)
    import numpy as np
    np.testing.assert_array_equal(one[0], four[0])
    assert one[1] == four[1]
    assert one[2] == four[2]
