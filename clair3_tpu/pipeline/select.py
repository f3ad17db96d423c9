"""Candidate routing between the pileup and full-alignment stages.

Library-function ports of the reference's per-contig subprocesses:
* ``select_phase_qual`` — qual cutoff for phasing het SNPs (SelectQual.py:10-48)
* ``select_qual`` — (variant, ref) qual cutoffs for FA re-calling (SelectQual.py:52-111)
* ``select_het_snps`` — het SNP subset for the phaser (SelectHetSnp.py:12-78)
* ``select_candidates`` — low-qual candidate batching with phased-SNP
  attachment windows (SelectCandidates.py:128-342)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from clair3_tpu.config import NO_OF_POSITIONS, FLANKING_BASE_NUM
from clair3_tpu.io.vcf import VcfRecord


def _rows_qual_gt(rows: Sequence[VcfRecord]):
    for rec in rows:
        gt = rec.sample.split(":")[0]
        yield rec, rec.qual, gt


def select_phase_qual(rows: Sequence[VcfRecord], var_pct_phasing: float) -> float:
    """Quality cutoff below which het SNPs are excluded from phasing."""
    quals = sorted(
        rec.qual
        for rec, qual, gt in _rows_qual_gt(rows)
        if len(rec.ref) == 1 and len(rec.alt) == 1 and gt == "0/1"
    )
    low = quals[: int((1 - var_pct_phasing) * len(quals))]
    return low[-1] if low else 0.0


def select_qual(
    rows: Sequence[VcfRecord], var_pct_full: float, ref_pct_full: float
) -> Tuple[float, float]:
    """(variant_qual_cutoff, ref_qual_cutoff) for full-alignment routing."""
    var_quals: List[float] = []
    ref_quals: List[float] = []
    for rec, qual, gt in _rows_qual_gt(rows):
        if gt == "0/0":
            ref_quals.append(qual)
        else:
            var_quals.append(qual)
    var_quals.sort()
    ref_quals.sort()
    low_var = var_quals[: int(var_pct_full * len(var_quals))]
    low_ref = ref_quals[: int(ref_pct_full * len(ref_quals))]
    return (low_var[-1] if low_var else 0.0, low_ref[-1] if low_ref else 0.0)


def select_het_snps(
    rows: Sequence[VcfRecord], phase_qual_cutoff: float, contig: Optional[str] = None
) -> List[VcfRecord]:
    """Pileup het SNPs above the phasing qual cutoff (input to the phaser)."""
    out = []
    for rec in rows:
        if contig is not None and rec.chrom != contig:
            continue
        gt = rec.sample.split(":")[0].replace("|", "/")
        if gt not in ("0/1", "1/0") or len(rec.ref) != 1 or len(rec.alt) != 1:
            continue
        if rec.qual >= phase_qual_cutoff:
            out.append(rec)
    return out


def sequence_entropy(seq: str, k: int = 5) -> float:
    """Normalized k-mer Shannon entropy of a window (0 = homopolymer,
    -> 1 = maximally diverse).  Low-complexity regions (homopolymers,
    tandem repeats) score low; the reference routes such candidates to
    full-alignment re-calling (SelectCandidates.py:41-125 computes the
    same k-mer-distribution entropy with an incremental slide)."""
    import math

    n = len(seq) - k + 1
    if n <= 1:
        return 0.0
    counts: Dict[str, int] = {}
    for i in range(n):
        kmer = seq[i: i + k]
        counts[kmer] = counts.get(kmer, 0) + 1
    h = -sum((c / n) * math.log(c / n) for c in counts.values())
    return h / math.log(n)


def low_entropy_candidates(
    ref_calls: Sequence[Tuple[int, float]],
    var_calls: Sequence[Tuple[int, float]],
    fetch_window,
    var_pct_full: float,
    seq_entropy_pro: float,
) -> List[int]:
    """Positions whose flanking reference window has the lowest sequence
    entropy, drawn from the lowest-QUAL (var_pct_full + seq_entropy_pro)
    fraction of both call lists (SelectCandidates.py:222-233).

    ``fetch_window(pos1)`` returns the 33bp reference window centered on
    the 1-based position."""
    frac = var_pct_full + seq_entropy_pro
    pool = [p for p, _ in sorted(ref_calls, key=lambda x: x[1])[: int(frac * len(ref_calls))]]
    pool += [p for p, _ in sorted(var_calls, key=lambda x: x[1])[: int(frac * len(var_calls))]]
    pool = sorted(set(pool))
    scored = [(p, sequence_entropy(fetch_window(p))) for p in pool]
    scored.sort(key=lambda x: x[1])
    return [p for p, _ in scored[: int(seq_entropy_pro * len(scored))]]


@dataclass
class CandidateBatch:
    """One full-alignment work unit: candidate positions (1-based) plus the
    phased het SNPs overlapping the batch's +-phasing_window_size window
    ('ref-alt-hap-phaseset' descriptors, SelectCandidates.py:322-342)."""

    contig: str
    positions: List[int]
    phased_snps: List[Tuple[int, str]]


def select_candidates(
    pileup_rows: Sequence[VcfRecord],
    contig: str,
    var_qual_cutoff: float,
    ref_qual_cutoff: float,
    phased_rows: Sequence[VcfRecord] = (),
    split_bed_size: int = 10_000,
    phasing_window_size: int = 100_000,
    call_low_seq_entropy: bool = False,
    seq_entropy_pro: float = 0.05,
    var_pct_full: float = 0.3,
    fetch_window=None,
) -> List[CandidateBatch]:
    """Split low-quality pileup calls into FA candidate batches.  With
    ``call_low_seq_entropy`` (needs ``fetch_window``), the lowest-entropy
    candidates are routed to full alignment as well."""
    variant_dict: Dict[int, str] = {}
    for rec in phased_rows:
        if rec.chrom != contig:
            continue
        gt_info = rec.sample.split(":")
        genotype, phase_set = gt_info[0], gt_info[-1]
        if "|" not in genotype:
            continue
        hap = "1" if genotype == "0|1" else "2"
        variant_dict[rec.pos] = "-".join([rec.ref, rec.alt, hap, phase_set])

    ref_calls: List[Tuple[int, float]] = []
    var_calls: List[Tuple[int, float]] = []
    for rec in pileup_rows:
        if rec.chrom != contig:
            continue
        if rec.alt == "." or rec.ref == rec.alt:
            ref_calls.append((rec.pos, rec.qual))
        else:
            var_calls.append((rec.pos, rec.qual))

    low_ref = [p for p, q in ref_calls if q < ref_qual_cutoff]
    low_var = [p for p, q in var_calls if q < var_qual_cutoff]
    extra: List[int] = []
    if call_low_seq_entropy and fetch_window is not None:
        extra = low_entropy_candidates(
            ref_calls, var_calls, fetch_window,
            var_pct_full=var_pct_full, seq_entropy_pro=seq_entropy_pro)
    positions = sorted(set(low_ref) | set(low_var) | set(extra))
    if not positions:
        return []

    snp_positions = sorted(variant_dict)
    batches: List[CandidateBatch] = []
    n_batches = (len(positions) + split_bed_size - 1) // split_bed_size
    for idx in range(n_batches):
        chunk = positions[idx * split_bed_size: (idx + 1) * split_bed_size]
        lo = chunk[0] - phasing_window_size
        hi = chunk[-1] + phasing_window_size
        snps = [(p, variant_dict[p]) for p in snp_positions if lo <= p < hi]
        batches.append(CandidateBatch(contig, chunk, snps))
    return batches
