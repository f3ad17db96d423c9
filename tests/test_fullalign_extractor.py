import numpy as np
import pytest

from clair3_tpu.fullalign.extractor import (
    PhasedVariant,
    compute_signal_lengths,
    create_fa_tensors,
    fa_region,
    haplotag_read,
    levenshtein,
)
from clair3_tpu.io.bam import BamRead
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTAC"  # 50bp


def _read(pos, seq, cigar=None, flag=0, qname="r", mapq=60, tags=None):
    cigar = cigar or [(0, len(seq))]
    return BamRead(qname, flag, 0, pos, mapq, cigar, seq,
                   np.full(len(seq), 30, np.uint8), tags or {})


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("AC", "AC") == 0
    assert levenshtein("AC", "AG") == 1
    assert levenshtein("ACGT", "AGT") == 1
    assert levenshtein("ACGT", "TGCA") == 4


def test_fa_snp_tensor_encoding():
    # ref at pos 25 is C; 4 reads carry G (SNP), 4 match
    alt_seq = REF[:25] + "G" + REF[26:]
    reads = [_read(0, alt_seq, qname=f"a{i}") for i in range(4)]
    reads += [_read(0, REF, flag=16, qname=f"b{i}") for i in range(4)]
    tensor, cands, alt_infos = fa_region(
        reads, REF, 0, [25], matrix_depth=10, need_haplotagging=False)
    assert tensor.shape == (1, 10, 33, 8)
    assert cands == [25]
    assert alt_infos[0] == "8-XG 4 RC 4 "
    t = tensor[0]
    # 8 reads -> 1 padding row before, 1 after (center padding)
    assert (t[0] == 0).all() and (t[9] == 0).all()
    center = 16
    alt_vals = t[1:9, center, 1]
    # 4 rows with alt G (75), 4 rows ref-match (0)
    assert sorted(alt_vals.tolist()) == [0, 0, 0, 0, 75, 75, 75, 75]
    # ref channel at center: C -> 25
    assert (t[1:9, center, 0] == 25).all()
    # strand: fwd reads 50, rev reads 100
    assert set(t[1:9, center, 2].tolist()) == {50, 100}
    # MQ 60 -> 100, BQ 30 -> 75
    assert (t[1:9, center, 3] == 100).all()
    assert (t[1:9, center, 4] == 75).all()
    # AF channel on alt rows: 4/8 = 50
    alt_rows = np.nonzero(t[:, center, 1] == 75)[0]
    assert (t[alt_rows, center, 5] == 50).all()
    # unphased haplotype = 60
    assert (t[1:9, center, 7] == 60).all()


def test_fa_insertion_encoding():
    cigar = [(0, 26), (1, 2), (0, 24)]
    ins_seq = REF[:26] + "TT" + REF[26:]
    reads = [_read(0, ins_seq, cigar=cigar, qname=f"i{i}") for i in range(6)]
    reads += [_read(0, REF, qname=f"m{i}") for i in range(6)]
    tensor, cands, alt_infos = fa_region(
        reads, REF, 0, [25], matrix_depth=12, need_haplotagging=False)
    assert alt_infos[0] == "12-ICTT 6 RC 6 "
    t = tensor[0]
    center = 16
    ins_rows = np.nonzero(t[:, center, 1] == -50)[0]
    assert len(ins_rows) == 6
    # insert_base channel overlays T (50) at center and center+1
    assert (t[ins_rows, center, 6] == 50).all()
    assert (t[ins_rows, center + 1, 6] == 50).all()
    assert (t[ins_rows, center + 2, 6] == 0).all()
    # AF = 6/12
    assert (t[ins_rows, center, 5] == 50).all()


def test_fa_deletion_encoding():
    cigar = [(0, 26), (2, 3), (0, 21)]
    del_seq = REF[:26] + REF[29:]
    reads = [_read(0, del_seq, cigar=cigar, qname=f"d{i}") for i in range(6)]
    reads += [_read(0, REF, qname=f"m{i}") for i in range(6)]
    tensor, cands, alt_infos = fa_region(
        reads, REF, 0, [25], matrix_depth=12, need_haplotagging=False)
    assert alt_infos[0] == f"12-D{REF[26:29]} 6 RC 6 "
    t = tensor[0]
    center = 16
    del_rows = np.nonzero(t[:, center, 1] == -100)[0]
    assert len(del_rows) == 6
    # deleted columns (center+1..center+3) are all-zero for those rows
    assert (t[del_rows, center + 1: center + 4] == 0).all()
    # but covered again after the deletion
    assert (t[del_rows, center + 4, 0] != 0).all()


def test_fa_depth_subsampling_and_padding():
    reads = [_read(0, REF, qname=f"x{i}") for i in range(30)]
    tensor, _, alt_infos = fa_region(
        reads, REF, 0, [25], matrix_depth=10, need_haplotagging=False)
    # exactly matrix_depth rows filled, none zero
    assert (tensor[0, :, 16, 0] != 0).all()
    assert alt_infos[0].startswith("30-")  # alt-info depth is NOT subsampled

    tensor, _, _ = fa_region(
        [ _read(0, REF, qname="only") ], REF, 0, [25], matrix_depth=5,
        need_haplotagging=False)
    # 1 read centered: rows 0-1 pad, row 2 data, rows 3-4 pad
    assert (tensor[0, 2, 16, 0] != 0)
    assert (tensor[0, [0, 1, 3, 4]] == 0).all()


def test_haplotag_read_assigns_haplotypes():
    ref = random_reference(300, seed=5)
    # phased het SNP at 100: hap1 carries ref (genotype 1 == 0|1)
    alt = "A" if ref[100] != "A" else "C"
    variants = [PhasedVariant(100, ref[100], alt, 1, 1000)]
    ref_read = _read(40, ref[40:200], qname="refread")
    alt_seq = ref[40:100] + alt + ref[101:200]
    alt_read = _read(40, alt_seq, qname="altread")
    assert haplotag_read(ref_read, variants, 0, ref, 0) == 1
    assert haplotag_read(alt_read, variants, 0, ref, 0) == 2
    # read not covering the variant -> unphased
    far_read = _read(150, ref[150:250], qname="far")
    assert haplotag_read(far_read, variants, 0, ref, 0) == 0


def test_fa_haplotype_channel_and_sorting():
    ref = random_reference(200, seed=6)
    alt = "G" if ref[100] != "G" else "T"
    snp_alt = "C" if ref[60] != "C" else "A"
    variants = [PhasedVariant(60, ref[60], snp_alt, 1, 500)]
    # hap2 reads carry the het snp at 60 (genotype 1 means hap1==ref)
    hap2_seq = ref[20:60] + snp_alt + ref[61:180]
    reads = [_read(20, hap2_seq, qname=f"h2_{i}") for i in range(3)]
    reads += [_read(20, ref[20:180], qname=f"h1_{i}") for i in range(3)]
    tensor, _, _ = fa_region(
        reads, ref, 0, [100], variants, matrix_depth=6, need_haplotagging=True)
    hap_col = tensor[0, :, 16, 7]
    # sorted by haplotype: hap1 (30) rows before hap2 (90)
    assert hap_col.tolist() == [30, 30, 30, 90, 90, 90]


def test_dwell_channel():
    # mv tag: stride + one step per base (signal length 1 each), with one
    # base having 3 blocks
    seq = REF[:20]
    mv = [5] + [1, 0, 0] + [1] * 19  # base0: 3 blocks, others 1
    read = _read(0, seq, qname="dw", tags={"mv": np.array(mv, np.int8)})
    sig = compute_signal_lengths(read)
    assert sig[0] == 3
    assert (sig[1:] == 1).all()
    # reverse strand flips
    read_rev = _read(0, seq, flag=16, qname="dwr", tags={"mv": np.array(mv, np.int8)})
    sig_rev = compute_signal_lengths(read_rev)
    assert sig_rev[-1] == 3

    reads = [_read(0, REF, qname=f"m{i}", tags={"mv": np.array([5] + [1] * 50, np.int8)})
             for i in range(4)]
    tensor, _, _ = fa_region(
        reads, REF, 0, [25], matrix_depth=4, need_haplotagging=False,
        enable_dwell=True)
    assert tensor.shape == (1, 4, 33, 9)
    assert (tensor[0, :, 16, 8] == 1).all()


def test_create_fa_tensors_end_to_end(tmp_path):
    ref = random_reference(1200, seed=9)
    alt = "T" if ref[600] != "T" else "A"
    variants = [SimVariant(600, ref[600], alt, (0, 1))]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=1200, variants=variants, coverage=20,
        read_length=400, seed=9)
    tensors, pos_infos, alt_infos = create_fa_tensors(
        bam, fasta, "chr1", [601], matrix_depth=30, no_phasing=True)
    assert tensors.shape == (1, 30, 33, 8)
    assert pos_infos == [f"chr1:601:{ref[600]}"]
    # roughly half the reads carry the alt
    t = tensors[0]
    n_alt = int((t[:, 16, 1] > 0).sum())
    n_cov = int((t[:, 16, 0] != 0).sum())
    assert n_cov >= 15
    assert 0.3 <= n_alt / n_cov <= 0.7
