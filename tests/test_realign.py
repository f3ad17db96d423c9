"""Illumina realignment: DBG consensus, affine alignment, CIGAR composition,
and recovery of indels hidden by mismatch-only alignments."""

import numpy as np
import pytest

from clair3_tpu.io.bam import BamRead
from clair3_tpu.pileup.extractor import pileup_region
from clair3_tpu.realign.align import affine_local_align, _align_python
from clair3_tpu.realign.align import MATCH, MISMATCH, GAP_OPEN, GAP_EXTEND
from clair3_tpu.realign.dbg import consensus_haplotypes
from clair3_tpu.realign.realigner import (
    realign_reads_in_region,
    select_realignment_windows,
)
from clair3_tpu.testing import random_reference


def test_affine_align_exact_match():
    a = affine_local_align("ACGTACGT", "TTACGTACGTTT")
    assert a.score == 8 * 4
    assert a.cigar == [(0, 8)]
    assert a.target_start == 2
    assert a.query_start == 0 and a.query_end == 8


def test_affine_align_with_deletion():
    target = "AAACCCGGGTTTAAACCC"
    query = target[:6] + target[9:]  # 3bp deletion
    a = affine_local_align(query, target)
    ops = [op for op, _ in a.cigar]
    assert 2 in ops  # D present
    total_d = sum(l for op, l in a.cigar if op == 2)
    assert total_d == 3


def test_affine_align_with_insertion():
    target = "AAACCCGGGTTTAAACCC"
    query = target[:9] + "TTTT" + target[9:]
    a = affine_local_align(query, target)
    assert sum(l for op, l in a.cigar if op == 1) == 4


def test_python_fallback_matches_native():
    q, t = "ACGTTGCA", "ACGTACGTTGCAAC"
    a = affine_local_align(q, t, use_native=False)
    b = affine_local_align(q, t)
    assert (a.score, a.cigar) == (b.score, b.cigar)


def test_consensus_haplotypes_recovers_alt():
    ref = random_reference(200, seed=81)
    alt = ref[:100] + ref[103:]  # 3bp deletion haplotype
    reads = []
    for s in range(0, 120, 10):
        reads.append(alt[s: s + 80])
        reads.append(ref[s: s + 80])
    haps = consensus_haplotypes(reads, ref, min_edge_weight=2)
    assert ref in haps
    assert alt in haps


def test_consensus_haplotypes_prunes_noise():
    ref = random_reference(150, seed=82)
    noisy = ref[:70] + ("A" if ref[70] != "A" else "C") + ref[71:]
    haps = consensus_haplotypes([noisy], ref, min_edge_weight=2)
    # single-read support < min_edge_weight -> only the reference survives
    assert haps == [ref]


def _misaligned_del_reads(ref, del_start, del_len, n=14, read_len=80):
    """Reads from a deletion haplotype but aligned all-M (as a naive mapper
    would), hiding the deletion as a tail of mismatches."""
    alt = ref[:del_start] + ref[del_start + del_len:]
    reads = []
    for i in range(n):
        s = del_start - 50 + (i * 7) % 30
        seq = alt[s: s + read_len]
        reads.append(BamRead(
            f"m{i}", 0 if i % 2 == 0 else 16, 0, s, 60,
            [(0, len(seq))], seq, np.full(len(seq), 30, np.uint8)))
    return reads


def test_window_selection_finds_misalignment():
    ref = random_reference(400, seed=83)
    reads = _misaligned_del_reads(ref, 200, 4)
    wins = select_realignment_windows(reads, ref, 0, 0, 400)
    assert len(wins) >= 1
    assert any(w.start <= 204 <= w.end for w in wins)


def test_realignment_recovers_hidden_deletion():
    ref = random_reference(400, seed=84)
    del_start, del_len = 200, 4
    reads = _misaligned_del_reads(ref, del_start, del_len, n=16)
    # plus clean reference-matching reads
    for i in range(8):
        s = 120 + i * 10
        reads.append(BamRead(
            f"r{i}", 0, 0, s, 60, [(0, 80)], ref[s: s + 80],
            np.full(80, 30, np.uint8)))
    reads.sort(key=lambda r: r.pos)

    realigned, n = realign_reads_in_region(reads, ref, 0, 0, 400)
    assert n >= 10

    # the deletion now appears in the pileup at the anchor position
    res = pileup_region(realigned, ref, 0, 0, 400, min_indel_af=0.15)
    anchor = del_start - 1
    assert res.counts[anchor, 6] + res.counts[anchor, 15] >= 10  # D_S channels
    cand_pos = [c.pos for c in res.candidates]
    assert anchor in cand_pos
    cand = res.candidates[cand_pos.index(anchor)]
    assert f"D{ref[del_start:del_start + del_len]}" in cand.alt_info

    # before realignment there is no deletion evidence at all
    res0 = pileup_region(reads, ref, 0, 0, 400, min_indel_af=0.15)
    assert res0.counts[anchor, 6] + res0.counts[anchor, 15] == 0


def test_realignment_leaves_clean_reads_alone():
    ref = random_reference(300, seed=85)
    reads = [
        BamRead(f"c{i}", 0, 0, i * 10, 60, [(0, 80)], ref[i * 10: i * 10 + 80],
                np.full(80, 30, np.uint8))
        for i in range(15)
    ]
    realigned, n = realign_reads_in_region(reads, ref, 0, 0, 300)
    assert n == 0
    for a, b in zip(reads, realigned):
        assert a.pos == b.pos and a.cigar == b.cigar


def test_ilmn_pipeline_with_realignment(tmp_path):
    """End-to-end ilmn cascade: misaligned deletion reads are realigned and
    the deletion is called."""
    from clair3_tpu.config import CallConfig
    from clair3_tpu.io.bam import write_bam
    from clair3_tpu.io.fasta import write_fasta
    from clair3_tpu.io.vcf import VcfReader
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import PileupOracleEngine

    ref = random_reference(800, seed=86)
    del_start, del_len = 400, 4
    reads = _misaligned_del_reads(ref, del_start, del_len, n=20, read_len=100)
    # reference-haplotype reads across the rest of the contig
    for i in range(60):
        s = (i * 13) % 680
        reads.append(BamRead(
            f"bg{i}", 0 if i % 2 else 16, 0, s, 60, [(0, 100)],
            ref[s: s + 100], np.full(100, 30, np.uint8)))
    reads.sort(key=lambda r: r.pos)
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, {"chr1": ref})
    bam = str(tmp_path / "r.bam")
    write_bam(bam, ["chr1"], [800], reads)

    cfg = CallConfig(platform="ilmn", bam_fn=bam, ref_fn=fasta,
                     output_dir=str(tmp_path / "out"), pileup_only=True)
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    recs = list(VcfReader(outputs["merge_output"]))
    by_pos = {r.pos: r for r in recs}
    anchor1 = del_start  # 1-based anchor = del_start (0-based anchor del_start-1)
    assert anchor1 in by_pos, f"deletion not called; calls at {sorted(by_pos)}"
    rec = by_pos[anchor1]
    assert rec.ref == ref[del_start - 1: del_start + del_len]
    assert rec.alt == ref[del_start - 1]
