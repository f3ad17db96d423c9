"""Representation unification for training truth
(reference: preprocess/UnifyRepresentation.py, docs/representation_unification.md).

Truth sets and a sample's own candidate calls often express the same edit
differently (indels shifted inside repeats, composite edits split
differently).  Training labels must live in the *candidate* representation
space, so for each truth cluster we search bounded genotype assignments of
the nearby candidate alleles whose implied local haplotype pair equals the
truth's haplotype pair, and re-emit the truth in candidate coordinates.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from clair3_tpu.train.data import TruthVariant

MAX_CLUSTER_CANDIDATES = 4
WINDOW_PAD = 16
_GT_OPTIONS = ((0, 1), (1, 0), (1, 1))


@dataclass(frozen=True)
class CandidateAllele:
    """One candidate site's allele in sample coordinates (1-based pos)."""

    pos: int
    ref: str
    alt: str


def apply_variants_to_haplotype(
    ref_window: str,
    window_start: int,  # 1-based position of ref_window[0]
    variants: Sequence[Tuple[int, str, str]],  # (pos1, ref, alt), sorted
) -> Optional[str]:
    """Apply non-overlapping variants to a reference window; None on
    overlap/out-of-window conflicts."""
    out: List[str] = []
    cursor = window_start
    for pos, ref, alt in sorted(variants):
        if pos < cursor:
            return None  # overlapping edits
        if pos + len(ref) - 1 > window_start + len(ref_window) - 1:
            return None
        out.append(ref_window[cursor - window_start: pos - window_start])
        if ref_window[pos - window_start: pos - window_start + len(ref)] != ref:
            return None
        out.append(alt)
        cursor = pos + len(ref)
    out.append(ref_window[cursor - window_start:])
    return "".join(out)


def _haplotype_pair(
    ref_window: str, window_start: int,
    variants: Sequence[Tuple[int, str, str, Tuple[int, int]]],
) -> Optional[Tuple[str, str]]:
    """(hap1, hap2) as an unordered (sorted) pair, or None on conflict."""
    hap_edits: Tuple[List, List] = ([], [])
    for pos, ref, alt, gt in variants:
        for h in (0, 1):
            if gt[h] == 1:
                hap_edits[h].append((pos, ref, alt))
    h1 = apply_variants_to_haplotype(ref_window, window_start, hap_edits[0])
    h2 = apply_variants_to_haplotype(ref_window, window_start, hap_edits[1])
    if h1 is None or h2 is None:
        return None
    return tuple(sorted((h1, h2)))


def _cluster(items: Sequence, pos_of, gap: int) -> List[List]:
    clusters: List[List] = []
    for item in sorted(items, key=pos_of):
        if clusters and pos_of(item) - pos_of(clusters[-1][-1]) <= gap:
            clusters[-1].append(item)
        else:
            clusters.append([item])
    return clusters


def unify_representation(
    truths: Sequence[TruthVariant],
    candidates: Sequence[CandidateAllele],
    ref_seq: str,
    ref_offset: int,  # 0-based offset of ref_seq[0]
    *,
    window_pad: int = WINDOW_PAD,
    max_candidates: int = MAX_CLUSTER_CANDIDATES,
) -> List[TruthVariant]:
    """Re-express truth variants using candidate alleles where the local
    haplotypes match; truths with no matching candidate combination pass
    through unchanged."""
    out: List[TruthVariant] = []
    cand_sorted = sorted(candidates, key=lambda c: c.pos)

    for cluster in _cluster(truths, lambda t: t.pos, 2 * window_pad):
        ctg = cluster[0].ctg
        lo = cluster[0].pos - window_pad
        hi = cluster[-1].pos + max(len(t.ref) for t in cluster) + window_pad
        window_start = max(1, lo)
        ref_window = ref_seq[window_start - 1 - ref_offset: hi - ref_offset]
        if not ref_window:
            out.extend(cluster)
            continue

        truth_edits = []
        ok = True
        for t in cluster:
            alts = t.alt.split(",")
            gts = sorted((t.genotype1, t.genotype2))
            if gts[1] > len(alts) or t.ctg != ctg:
                ok = False
                break
            # expand to per-haplotype single-alt edits
            if len(alts) == 1:
                gt = (min(t.genotype1, 1), min(t.genotype2, 1))
                if gt == (0, 0):
                    continue
                truth_edits.append((t.pos, t.ref, alts[0], tuple(sorted(gt))))
            else:
                # multiallelic: place each carried alt on its haplotype(s)
                # (handles 1/2 as well as 0/2, 2/2, 1/1 with spurious alts)
                g1, g2 = t.genotype1, t.genotype2
                if g1 == g2 and g1 > 0:  # e.g. 2/2
                    truth_edits.append((t.pos, t.ref, alts[g1 - 1], (1, 1)))
                else:
                    if g1 > 0:
                        truth_edits.append((t.pos, t.ref, alts[g1 - 1], (1, 0)))
                    if g2 > 0:
                        truth_edits.append((t.pos, t.ref, alts[g2 - 1], (0, 1)))
        if not ok:
            out.extend(cluster)
            continue

        truth_pair = None
        # try both phasings of het truth edits (bounded)
        het_idx = [i for i, e in enumerate(truth_edits) if e[3] != (1, 1)]
        target_pairs = set()
        for phases in itertools.product((0, 1), repeat=min(len(het_idx), 6)):
            edits = []
            for i, e in enumerate(truth_edits):
                pos, ref, alt, gt = e
                if gt == (1, 1):
                    edits.append((pos, ref, alt, (1, 1)))
                else:
                    k = het_idx.index(i) if i in het_idx else 0
                    flip = phases[k] if k < len(phases) else 0
                    edits.append((pos, ref, alt, (1, 0) if flip else (0, 1)))
            pair = _haplotype_pair(ref_window, window_start, edits)
            if pair is not None:
                target_pairs.add(pair)
        if not target_pairs:
            out.extend(cluster)
            continue

        near = [c for c in cand_sorted if lo <= c.pos <= hi]
        if not near or len(near) > max_candidates:
            out.extend(cluster)
            continue

        matched: Optional[List[TruthVariant]] = None
        # search subsets x genotype assignments of candidate alleles
        for r in range(1, len(near) + 1):
            if matched:
                break
            for subset in itertools.combinations(near, r):
                if matched:
                    break
                for gts in itertools.product(_GT_OPTIONS, repeat=r):
                    edits = [(c.pos, c.ref, c.alt, gt) for c, gt in zip(subset, gts)]
                    pair = _haplotype_pair(ref_window, window_start, edits)
                    if pair is not None and pair in target_pairs:
                        matched = [
                            TruthVariant(ctg, c.pos, c.ref, c.alt,
                                         *sorted((min(gt[0], 1), min(gt[1], 1))))
                            for c, gt in zip(subset, gts)
                        ]
                        break
        out.extend(matched if matched else cluster)
    out.sort(key=lambda t: (t.ctg, t.pos))
    return out
