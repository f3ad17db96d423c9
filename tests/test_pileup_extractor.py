import numpy as np
import pytest

from clair3_tpu.io.bam import BamRead
from clair3_tpu.pileup.extractor import (
    candidate_tensors,
    create_pileup_tensors,
    pileup_region,
)
from clair3_tpu.testing import SimVariant, random_reference, simulate_reads, write_test_case


def _read(pos, seq, cigar=None, flag=0, qname="r"):
    cigar = cigar or [(0, len(seq))]
    return BamRead(qname, flag, 0, pos, 60, cigar, seq,
                   np.full(len(seq), 30, np.uint8))


REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTAC"  # 50bp


def test_simple_matched_counts():
    # 3 fwd + 2 rev reads perfectly matching the reference over [0, 50)
    reads = [_read(0, REF, flag=0, qname=f"f{i}") for i in range(3)]
    reads += [_read(0, REF, flag=16, qname=f"r{i}") for i in range(2)]
    res = pileup_region(reads, REF, 0, 0, 50)
    assert res.candidates == []
    # at pos 0 ref is A: fwd A column negated to -3, rev to -2
    assert res.counts[0, 0] == -3
    assert res.counts[0, 9] == -2
    # non-ref columns zero
    assert res.counts[0, 1] == 0
    assert (res.depth == 5).all()


def test_hom_snp_candidate_and_altinfo():
    # 20 reads, all with C at position 20 (ref A)
    alt_seq = REF[:20] + "C" + REF[21:]
    reads = [_read(0, alt_seq, flag=(16 if i % 2 else 0), qname=f"x{i}") for i in range(20)]
    res = pileup_region(reads, REF, 0, 0, 50)
    assert len(res.candidates) == 1
    cand = res.candidates[0]
    assert cand.pos == 20
    assert cand.ref_base == "A"
    assert cand.depth == 20
    # alt_info: "20-XC 20 " (no ref support)
    assert cand.alt_info == "20-XC 20 "
    # counts at pos 20: C fwd=10 rev=10, A(ref) negated strand sums
    assert res.counts[20, 1] == 10 and res.counts[20, 10] == 10
    assert res.counts[20, 0] == -10 and res.counts[20, 9] == -10


def test_het_snp_af_threshold():
    alt_seq = REF[:20] + "G" + REF[21:]
    reads = [_read(0, alt_seq, qname=f"a{i}") for i in range(10)]
    reads += [_read(0, REF, qname=f"b{i}") for i in range(10)]
    res = pileup_region(reads, REF, 0, 0, 50, min_snp_af=0.08)
    assert len(res.candidates) == 1
    assert res.candidates[0].alt_info == "20-XG 10 RA 10 "

    # 1/20 alt reads: below AF threshold, no candidate
    reads = [_read(0, alt_seq, qname="a")] + [_read(0, REF, qname=f"b{i}") for i in range(19)]
    res = pileup_region(reads, REF, 0, 0, 50, min_snp_af=0.08)
    assert res.candidates == []


def test_insertion_channels_and_altinfo():
    # insertion of "TT" after position 25 in half the reads
    cigar = [(0, 26), (1, 2), (0, 24)]
    ins_seq = REF[:26] + "TT" + REF[26:]
    reads = [_read(0, ins_seq, cigar=cigar, qname=f"i{i}") for i in range(8)]
    reads += [_read(0, REF, flag=16, qname=f"m{i}") for i in range(8)]
    res = pileup_region(reads, REF, 0, 0, 50, min_indel_af=0.15)
    assert len(res.candidates) == 1
    cand = res.candidates[0]
    assert cand.pos == 25
    # anchor pos 25 ref is C (ACGT repeating: 25 % 4 == 1 -> C)
    assert cand.ref_base == "C"
    assert cand.alt_info == "16-ICTT 8 RC 8 "
    # ins channels: all fwd inserts
    assert res.counts[25, 4] == 8   # I_S+
    assert res.counts[25, 5] == 8   # I1_S+
    assert res.counts[25, 13] == 0  # I_S-


def test_deletion_channels_and_altinfo():
    # 3bp deletion of positions 30..32 in half the reads
    cigar = [(0, 30), (2, 3), (0, 17)]
    del_seq = REF[:30] + REF[33:]
    reads = [_read(0, del_seq, cigar=cigar, flag=16, qname=f"d{i}") for i in range(9)]
    reads += [_read(0, REF, qname=f"m{i}") for i in range(9)]
    res = pileup_region(reads, REF, 0, 0, 50, min_indel_af=0.15)
    assert len(res.candidates) == 1
    cand = res.candidates[0]
    assert cand.pos == 29  # anchor = position before the deletion
    assert cand.alt_info == f"18-D{REF[30:33]} 9 R{REF[29]} 9 "
    # anchor channels (reverse strand): D_S- and D1_S-
    assert res.counts[29, 15] == 9 and res.counts[29, 16] == 9
    assert res.counts[29, 6] == 0
    # deleted positions carry D_R- and count toward depth
    for p in (30, 31, 32):
        assert res.counts[p, 17] == 9
        assert res.depth[p] == 18


def test_contiguous_flank_gating():
    # reads start at position 10; a SNP at position 20 has only 10 contiguous
    # flanking columns -> gated out unless call_ht
    alt_seq = REF[10:20] + "C" + REF[21:40]
    reads = [_read(10, alt_seq, qname=f"g{i}") for i in range(10)]
    res = pileup_region(reads, REF, 0, 0, 50)
    assert res.candidates == []
    res_ht = pileup_region(reads, REF, 0, 0, 50, call_ht=True)
    assert [c.pos for c in res_ht.candidates] == [20]


def test_min_depth():
    alt_seq = REF[:20] + "C" + REF[21:]
    reads = [_read(0, alt_seq, qname="only")]
    res = pileup_region(reads, REF, 0, 0, 50, min_depth=2)
    assert res.candidates == []


def test_candidate_tensor_window():
    alt_seq = REF[:20] + "C" + REF[21:]
    reads = [_read(0, alt_seq, qname=f"x{i}") for i in range(20)]
    res = pileup_region(reads, REF, 0, 0, 50)
    tensors, pos_infos, alt_infos = candidate_tensors(res, "chr1")
    assert tensors.shape == (1, 33, 18)
    assert pos_infos == ["chr1:21:A"]  # 1-based
    assert alt_infos == ["20-XC 20 "]
    # center column is the candidate position
    assert tensors[0, 16, 1] == 20  # C fwd


def test_candidate_tensor_rejects_uncovered_flank():
    # coverage only [14, 40): SNP at 30 has 16 contiguous columns before it
    # (14..29) so it passes gating, but the 33-window [14..46] hits empty
    # columns at 46.. -> rejected without head_tail, padded with head_tail
    alt_seq = REF[14:30] + "C" + REF[31:40]
    reads = [_read(14, alt_seq, qname=f"x{i}") for i in range(20)]
    res = pileup_region(reads, REF, 0, 0, 50)
    assert [c.pos for c in res.candidates] == [30]
    tensors, pos_infos, _ = candidate_tensors(res, "chr1")
    assert tensors.shape[0] == 0
    tensors, pos_infos, _ = candidate_tensors(res, "chr1", head_tail=True)
    assert tensors.shape == (1, 33, 18)
    # padded tail columns all zero
    assert (tensors[0, -3:] == 0).all()


def test_end_to_end_with_simulated_bam(tmp_path):
    ref = random_reference(1500, seed=7)
    variants = [
        SimVariant(500, ref[500], ("C" if ref[500] != "C" else "G"), (1, 1)),
        SimVariant(700, ref[700], ("T" if ref[700] != "T" else "A"), (0, 1)),
        SimVariant(900, ref[900], ref[900] + "AG", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=1500, variants=variants, coverage=30,
        read_length=400, seed=7)
    tensors, pos_infos, alt_infos, res = create_pileup_tensors(
        bam, fasta, "chr1", 1, 1500, min_snp_af=0.08, min_indel_af=0.15)
    called_pos = {int(p.split(":")[1]) - 1 for p in pos_infos}
    assert {500, 700, 900} <= called_pos
    # few spurious candidates without errors
    assert len(called_pos) <= 6
    assert tensors.shape[1:] == (33, 18)
    assert tensors.dtype == np.int32
