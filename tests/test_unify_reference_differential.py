"""Differential: clair3_tpu.train.unify vs the reference's own
preprocess/UnifyRepresentation.py core (driven in-memory — it is pure
Python; `find_match_pairs` needs only Position/Read stand-ins, no
samtools).  VERDICT r02 #6.

Both sides get the same window: a reference sequence, truth variants,
candidate alleles (the sample's own representation), and a read
population supporting the truth haplotypes.  The contract compared is the
*relabeled truth*: which candidate alleles (pos, ref, alt) are asserted,
with how many haplotype copies.  Known-divergence cases are asserted
explicitly and documented inline.
"""

import os
import sys

import numpy as np
import pytest

from clair3_tpu.io.bam import BamRead
from clair3_tpu.train.data import TruthVariant
from clair3_tpu.train.unify import CandidateAllele, unify_representation

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "preprocess"))

pytestmark = pytest.mark.skipif(not HAS_REF, reason="no reference tree")


def _ru():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import preprocess.UnifyRepresentation as RU

    RU.max_calculate_count = 10_000
    return RU


# ---------------------------------------------------------------------------
# scenario plumbing
# ---------------------------------------------------------------------------

def _hap_read(name, ref_seq, edits, rid=0):
    """A BamRead spanning the whole window carrying ``edits``
    [(pos1, ref, alt), ...] (1-based, anchored like VCF indels)."""
    cigar = []
    seq_parts = []
    cursor = 0  # 0-based ref offset
    for pos1, ref, alt in sorted(edits):
        p0 = pos1 - 1
        if len(ref) == len(alt) == 1:            # SNP
            pre = p0 - cursor + 1
            cigar.append((0, pre))
            seq_parts.append(ref_seq[cursor:p0] + alt)
            cursor = p0 + 1
        elif len(ref) > len(alt):                # deletion (anchor base kept)
            pre = p0 - cursor + 1
            cigar.append((0, pre))
            seq_parts.append(ref_seq[cursor:p0] + alt[0])
            cigar.append((2, len(ref) - 1))
            cursor = p0 + len(ref)
        else:                                    # insertion after anchor
            pre = p0 - cursor + 1
            cigar.append((0, pre))
            seq_parts.append(ref_seq[cursor:p0] + ref[0])
            cigar.append((1, len(alt) - 1))
            seq_parts.append(alt[1:])
            cursor = p0 + 1
    if cursor < len(ref_seq):
        cigar.append((0, len(ref_seq) - cursor))
        seq_parts.append(ref_seq[cursor:])
    seq = "".join(seq_parts)
    # merge adjacent M ops
    merged = []
    for op, ln in cigar:
        if merged and merged[-1][0] == op:
            merged[-1][1] += ln
        else:
            merged.append([op, ln])
    return BamRead(name, 0, rid, 0, 60, [tuple(c) for c in merged], seq,
                   np.full(len(seq), 30, np.uint8))


def _run_ours(ref_seq, truths, cands, hap_specs):
    """hap_specs: [(edits, n_reads), ...]; returns normalized allele set."""
    reads = []
    for i, (edits, n) in enumerate(hap_specs):
        for j in range(n):
            reads.append(_hap_read(f"h{i}_{j}", ref_seq, edits))
    t_rows = [TruthVariant("chr1", p, r, a, g1, g2)
              for p, r, a, g1, g2 in truths]
    c_rows = [CandidateAllele(p, r, a) for p, r, a in cands]
    out = unify_representation(t_rows, c_rows, ref_seq, 0, reads=reads)
    norm = {}
    for t in out:
        for k, alt in enumerate(t.alt.split(",")):
            copies = (2 if (t.genotype1, t.genotype2) in ((1, 1),) and "," not in t.alt
                      else 1)
            norm[(t.pos, t.ref, alt)] = norm.get((t.pos, t.ref, alt), 0) + copies
    return norm


def _run_reference(ref_seq, truths, cands, hap_specs):
    """Drive RepresentationUnification.find_match_pairs; returns the same
    normalized allele set, or None when the reference finds no match."""
    RU = _ru()
    truth_pos = [RU.Position(pos=p, genotype1=g1, genotype2=g2, ref_base=r,
                             alt_base=a) for p, r, a, g1, g2 in truths]
    # group candidate alleles by (pos, ref) into multiallelic Positions
    grouped = {}
    for p, r, a in cands:
        grouped.setdefault((p, r), []).append(a)
    cand_pos = [RU.Position(pos=p, genotype1=-1, genotype2=-1, ref_base=r,
                            alt_base=alts, candidate=True)
                for (p, r), alts in sorted(grouped.items())]
    variant_dict = {t.start: t for t in truth_pos}
    alt_dict = {c.start: c for c in cand_pos}
    read_name_info_dict = {}
    for i, (edits, n) in enumerate(hap_specs):
        segments = [(p, p + len(r), a) for p, r, a in sorted(edits)]
        for j in range(n):
            rd = RU.Read()
            rd.seq = segments
            name = f"h{i}_{j}"
            read_name_info_dict[name] = rd
            for c in cand_pos:
                c.read_name_set.add(name)
    ru = RU.RepresentationUnification(
        sample_name="s", contig_name="chr1", reference_sequence=ref_seq,
        reference_start=1, partition_size=15, max_candidates_distance=100,
        max_calculate_count=10_000, subsample_ratio=1000)
    ref = ru.get_reference_seq(cand_pos, truth_pos)
    m = ru.find_match_pairs(cand_pos, truth_pos, ref, variant_dict,
                            read_name_info_dict=read_name_info_dict,
                            alt_dict=alt_dict)
    if m is None:
        return None
    norm = {}
    for c, gt in zip(m.candidates, m.candidate_genotypes):
        for idx in gt:
            if idx > 0:
                key = (c.start, c.reference_bases,
                       c.alternate_bases[idx - 1])
                norm[key] = norm.get(key, 0) + 1
    return norm


def _window(seed=0, n=120):
    rng = np.random.RandomState(seed)
    # repeat-rich: homopolymers + dinucleotide repeats force shifted reprs
    parts = []
    while sum(len(p) for p in parts) < n:
        parts.append(rng.choice(["A", "C", "G", "T"]) * rng.randint(1, 7))
        parts.append("".join(rng.choice(list("ACGT"), 3)))
    return "".join(parts)[:n]


# ---------------------------------------------------------------------------
# crafted scenarios
# ---------------------------------------------------------------------------

def test_shifted_het_deletion_matches_reference():
    ref_seq = "ACGTACGTAAAAAATCGATCGATCGATCGGCTAGCTAA"
    truths = [(9, "AA", "A", 0, 1)]       # het del in the A-run
    cands = [(12, "AA", "A")]             # same edit, shifted right
    haps = [([(12, "AA", "A")], 10), ([], 10)]
    ours = _run_ours(ref_seq, truths, cands, haps)
    ref = _run_reference(ref_seq, truths, cands, haps)
    assert ref == {(12, "AA", "A"): 1}
    assert ours == ref


def test_shifted_het_insertion_matches_reference():
    ref_seq = "GGATCACACACACATTGGCAGGATCCATTGCAGGATCC"
    # one extra AC unit in the (AC)n repeat: C->CAC anchored at any of the
    # repeat's C positions yields the same haplotype string
    truths = [(5, "C", "CAC", 0, 1)]
    cands = [(13, "C", "CAC")]            # right-shifted representation
    haps = [([(13, "C", "CAC")], 8), ([], 12)]
    ours = _run_ours(ref_seq, truths, cands, haps)
    ref = _run_reference(ref_seq, truths, cands, haps)
    assert ref == {(13, "C", "CAC"): 1}
    assert ours == ref


def test_adjacent_het_indels_opposite_haplotypes():
    ref_seq = "ACGGTTTTTCAGACACATTGCGATCGATCGATCGATAT"
    truths = [(5, "TT", "T", 0, 1),       # del in T-run (pos 5-9), hap A
              (13, "A", "ACA", 0, 1)]     # +1 AC unit in ACACA (13-17), hap B
    cands = [(8, "TT", "T"), (17, "A", "ACA")]
    haps = [([(8, "TT", "T")], 7), ([(17, "A", "ACA")], 7), ([], 6)]
    ours = _run_ours(ref_seq, truths, cands, haps)
    ref = _run_reference(ref_seq, truths, cands, haps)
    assert ref == {(8, "TT", "T"): 1, (17, "A", "ACA"): 1}
    assert ours == ref


def test_multiallelic_truth_resolves_to_shifted_candidates():
    ref_seq = "ACGGAAAAAACAGGATCGATTTGCGATCGATCGATCGA"
    # 1/2 site: two different deletions of the A-run (del2 | del1)
    truths = [(5, "AAA", "A,AA", 1, 2)]
    cands = [(7, "AAA", "A"), (8, "AA", "A")]
    haps = [([(7, "AAA", "A")], 8), ([(8, "AA", "A")], 8)]
    ours = _run_ours(ref_seq, truths, cands, haps)
    ref = _run_reference(ref_seq, truths, cands, haps)
    assert ref is not None and ours is not None
    # both must assert exactly one copy of each distinct deletion length
    assert sorted(len(r) - len(a) for (_, r, a), n in ref.items()
                  for _ in range(n)) == [1, 2]
    assert sorted(len(r) - len(a) for (_, r, a), n in ours.items()
                  for _ in range(n)) == [1, 2]


def test_dense_cluster_beyond_reference_budget():
    """8 het SNPs + 1 shifted del in one window: the reference's candidate
    option-product (4^9 = 262k) blows its 10k budget, the simplify retry
    cannot reduce single-alt sites (UnifyRepresentation.py:269-273 only
    drops idx1!=idx2 multiallelic pairs), and genotypes_combination
    collapses the candidates to the all-(0,0) assignment — the "best
    match" then asserts NO variant on any haplotype (all nine truths
    reported missed).  Documented divergence: our partition-and-search
    splits the cluster at its gaps and still relabels the shifted deletion
    while passing the SNPs through."""
    base = _window(seed=3, n=140)
    ref_seq = base[:40] + "AAAAAAA" + base[40:]
    snp_pos = [10, 14, 18, 22, 26, 30, 34, 38]
    truths = []
    cands = []
    edits_a, edits_b = [], []
    for i, p in enumerate(snp_pos):
        r = ref_seq[p - 1]
        a = "A" if r != "A" else "G"
        truths.append((p, r, a, 0, 1))
        cands.append((p, r, a))
        (edits_a if i % 2 == 0 else edits_b).append((p, r, a))
    truths.append((42, "AA", "A", 0, 1))   # het del inside the A-run
    cands.append((45, "AA", "A"))          # shifted representation
    edits_a.append((45, "AA", "A"))
    haps = [(edits_a, 9), (edits_b, 9)]

    ref = _run_reference(ref_seq, truths, cands, haps)
    assert not ref  # the reference asserts no variant at this density

    ours = _run_ours(ref_seq, truths, cands, haps)
    assert ours.get((45, "AA", "A")) == 1, ours
    for p, r, a, _, _ in truths[:8]:
        assert ours.get((p, r, a)) == 1, (p, ours)


# ---------------------------------------------------------------------------
# fuzz sweep
# ---------------------------------------------------------------------------

def test_fuzzed_shifted_indels_agree_with_reference():
    """Random repeat windows with 1-2 shifted het indels (+0-2 SNPs): the
    relabeled allele sets must agree with the reference's choice in >=90%
    of matchable cases; every divergence is printed for audit."""
    rng = np.random.RandomState(7)
    agree = total = 0
    divergences = []
    for trial in range(25):
        ref_seq = _window(seed=100 + trial, n=120)
        # pick a homopolymer run to shift within
        runs = []
        i = 0
        while i < len(ref_seq) - 1:
            j = i
            while j < len(ref_seq) and ref_seq[j] == ref_seq[i]:
                j += 1
            if j - i >= 4 and 20 < i < 90:
                runs.append((i, j))
            i = j
        if not runs:
            continue
        s, e = runs[rng.randint(len(runs))]
        pos_t = s + 1  # 1-based leftmost anchor
        shift = rng.randint(1, e - s - 1)
        pos_c = pos_t + shift
        if rng.rand() < 0.5:
            t_edit = (pos_t, ref_seq[pos_t - 1] * 2, ref_seq[pos_t - 1])
            c_edit = (pos_c, ref_seq[pos_c - 1] * 2, ref_seq[pos_c - 1])
        else:
            t_edit = (pos_t, ref_seq[pos_t - 1], ref_seq[pos_t - 1] * 2)
            c_edit = (pos_c, ref_seq[pos_c - 1], ref_seq[pos_c - 1] * 2)
        truths = [(t_edit[0], t_edit[1], t_edit[2], 0, 1)]
        cands = [c_edit]
        hap_edits = [c_edit]
        for _ in range(rng.randint(0, 3)):   # sprinkle agreeing het SNPs
            p = int(rng.randint(5, 115))
            if abs(p - pos_t) < 4 or abs(p - pos_c) < 4:
                continue
            r = ref_seq[p - 1]
            a = "T" if r != "T" else "C"
            truths.append((p, r, a, 0, 1))
            cands.append((p, r, a))
            hap_edits.append((p, r, a))
        truths.sort()
        haps = [(hap_edits, 9), ([], 9)]
        try:
            ref = _run_reference(ref_seq, truths, cands, haps)
        except Exception as e:  # reference crashes on some edge windows
            divergences.append((trial, "ref raised", repr(e)))
            continue
        ours = _run_ours(ref_seq, truths, cands, haps)
        if ref is None:
            continue  # unmatchable under reference budget; nothing to compare
        total += 1
        if ours == ref:
            agree += 1
        else:
            divergences.append((trial, ref, ours))
    print(f"[unify-fuzz] {agree}/{total} agree; divergences: {divergences}")
    assert total >= 10, f"fuzz produced too few comparable cases ({total})"
    assert agree >= int(0.9 * total), divergences
