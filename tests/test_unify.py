"""Representation unification: truths re-expressed in candidate coordinates
when local haplotypes are equivalent."""

from clair3_tpu.train.data import TruthVariant
from clair3_tpu.train.unify import (
    CandidateAllele,
    apply_variants_to_haplotype,
    unify_representation,
)


def test_apply_variants_basic():
    #            123456789
    ref_window = "ACGTACGTA"
    assert apply_variants_to_haplotype(ref_window, 1, [(3, "G", "T")]) == "ACTTACGTA"
    assert apply_variants_to_haplotype(ref_window, 1, [(3, "GTA", "G")]) == "ACGCGTA"
    assert apply_variants_to_haplotype(ref_window, 1, [(3, "G", "GAA")]) == "ACGAATACGTA"
    # ref mismatch -> None
    assert apply_variants_to_haplotype(ref_window, 1, [(3, "T", "A")]) is None
    # overlapping -> None
    assert apply_variants_to_haplotype(
        ref_window, 1, [(3, "GTA", "G"), (4, "T", "C")]) is None


def test_unify_shifted_deletion():
    # homopolymer: deletion can be placed at either end
    #      pos: 123456789012345678901234567890123456789012345678
    ref = "ACGTACGTAC" + "TTTTTT" + "GACGTACGTACGTACGTACGTACGTACGTACG"
    # truth deletes two Ts said to start at pos 11 (1-based): ref[10:13]="TTT"
    truth = [TruthVariant("chr1", 10, "CTT", "C", 0, 1)]
    # candidate expresses the same deletion right-shifted
    cand = [CandidateAllele(14, "TTT", "T")]
    unified = unify_representation(truth, cand, ref, 0)
    assert len(unified) == 1
    u = unified[0]
    assert (u.pos, u.ref, u.alt) == (14, "TTT", "T")
    assert (u.genotype1, u.genotype2) == (0, 1)


def test_unify_keeps_unmatched_truth():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 10, "G", "A", 1, 1)]
    cand = [CandidateAllele(10, "G", "C")]  # different allele, no match
    unified = unify_representation(truth, cand, ref, 0)
    assert unified == truth


def test_unify_exact_match_passthrough():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 10, "G", "A", 0, 1)]
    cand = [CandidateAllele(10, "G", "A")]
    unified = unify_representation(truth, cand, ref, 0)
    assert len(unified) == 1
    assert (unified[0].pos, unified[0].alt) == (10, "A")
    assert (unified[0].genotype1, unified[0].genotype2) == (0, 1)


def test_unify_split_insertion():
    # truth: hom insertion of AT expressed as one 2bp ins; candidate splits
    # representation differently inside the repeat
    ref = "ACGTACGT" + "ATATAT" + "CGTACGTACGTACGTACGTA"
    # truth: insert "AT" after pos 8 (1-based)
    truth = [TruthVariant("chr1", 8, "T", "TAT", 1, 1)]
    # candidate: same net haplotype via insertion after pos 14 (end of repeat)
    cand = [CandidateAllele(14, "T", "TAT")]
    unified = unify_representation(truth, cand, ref, 0)
    assert len(unified) == 1
    assert unified[0].pos == 14
    assert (unified[0].genotype1, unified[0].genotype2) == (1, 1)


def test_unify_hom_genotype_recovered():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 12, "T", "C", 1, 1)]
    cand = [CandidateAllele(12, "T", "C")]
    unified = unify_representation(truth, cand, ref, 0)
    assert (unified[0].genotype1, unified[0].genotype2) == (1, 1)


def test_unify_multiallelic_truth():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 12, "T", "A,C", 1, 2)]
    cand = [CandidateAllele(12, "T", "A"), CandidateAllele(12, "T", "C")]
    unified = unify_representation(truth, cand, ref, 0)
    # expressed as two het candidate alleles... but same-position alleles
    # overlap on a haplotype pair only as (1,0)+(0,1)
    alts = sorted((u.alt, (u.genotype1, u.genotype2)) for u in unified)
    assert [a for a, _ in alts] == ["A", "C"]
    assert all(gt in ((0, 1),) for _, gt in alts)


def test_unify_multiallelic_02_genotype():
    """Regression: 0/2 truth genotypes place only the carried alt."""
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 12, "T", "A,C", 0, 2)]
    cand = [CandidateAllele(12, "T", "C")]
    unified = unify_representation(truth, cand, ref, 0)
    assert len(unified) == 1
    assert unified[0].alt == "C"
    assert (unified[0].genotype1, unified[0].genotype2) == (0, 1)


def test_unify_multiallelic_22_genotype():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    truth = [TruthVariant("chr1", 12, "T", "A,C", 2, 2)]
    cand = [CandidateAllele(12, "T", "C")]
    unified = unify_representation(truth, cand, ref, 0)
    assert len(unified) == 1
    assert unified[0].alt == "C"
    assert (unified[0].genotype1, unified[0].genotype2) == (1, 1)
