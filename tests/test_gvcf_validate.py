"""Structural gVCF validator tests (GATK-ValidateVariants-equivalent,
reference gVCF contract: preprocess/utils.py:348-626).

Three layers: (1) the validator passes real pipeline output and fuzzed
block streams, (2) it CATCHES each class of corruption (mutation tests
— a validator that never fires is worthless), (3) region-restricted
runs allow gaps only across region boundaries.
"""

import random

import numpy as np
import pytest

from clair3_tpu.config import CallConfig
from clair3_tpu.gvcf import NonVariantBlockWriter, merge_variant_and_nonvariant
from clair3_tpu.gvcf_validate import GvcfValidator, validate_gvcf
from clair3_tpu.io.vcf import get_header
from clair3_tpu.pipeline.call import VariantCaller
from clair3_tpu.testing import (PileupOracleEngine, SimVariant,
                                random_reference, write_test_case)


def _make_stream(seed: int, L: int = 3000, with_variants: bool = True):
    """A synthetic merged gVCF (header + rows) from fuzzed coverage."""
    rng = random.Random(seed)
    ref = random_reference(L, seed=seed)
    w = NonVariantBlockWriter(contig_lengths={"chr1": L})
    var_positions = sorted(rng.sample(range(100, L - 100), 8)) if with_variants else []
    var_rows = []
    for p in var_positions:
        r = ref[p - 1]
        alt = rng.choice([b for b in "ACGT" if b != r])
        var_rows.append(
            f"chr1\t{p}\t.\t{r}\t{alt}\t18.3\tPASS\tP\tGT:GQ:DP:AD:AF:PL\t"
            f"0/1:18:30:15,15:0.5000:18,0,25")
    depth = 25
    for pos1 in range(1, L + 1):
        if pos1 in set(var_positions):
            continue  # pipeline skips candidate spans in the nonvar stream
        depth = max(3, min(60, depth + rng.choice([-1, 0, 0, 0, 1])))
        n_alt = rng.choice([0, 0, 0, 1])
        w.add_site("chr1", pos1, ref[pos1 - 1], depth - n_alt, depth)
    rows = merge_variant_and_nonvariant(
        var_rows, w.finish(), lambda c, p: ref[p - 1])
    header = get_header(gvcf=True, contigs=[("chr1", L)])
    return header.splitlines() + rows, ref


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_fuzzed_stream_validates(seed):
    lines, _ = _make_stream(seed)
    assert validate_gvcf(lines) == []


def test_pipeline_gvcf_output_validates(tmp_path):
    """The real VariantCaller gVCF output is structurally valid."""
    L = 1500
    ref = random_reference(L, seed=17)
    variants = [
        SimVariant(500, ref[500], "C" if ref[500] != "C" else "G", (1, 1)),
        SimVariant(900, ref[900], "T" if ref[900] != "T" else "A", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=25,
        read_length=500, seed=17)
    cfg = CallConfig(platform="ont", bam_fn=bam, ref_fn=fasta,
                     output_dir=str(tmp_path / "out"), pileup_only=True,
                     gvcf=True)
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    # read coverage starts/ends inside the contig: pass the covered span
    problems = validate_gvcf(outputs["merge_output_gvcf"],
                             regions=[("chr1", 0, L)])
    # the only acceptable "gap" is head/tail without reads; anything else
    # (mid-contig gap, overlap, PL/GQ inconsistency) must be empty
    real = [p for p in problems if "coverage gap" not in p]
    assert real == [], real
    for p in problems:
        assert "coverage gap chr1:1-" in p or f"-{L}" in p, p


MUTATIONS = [
    # (name, row-transformer, expected violation substring)
    ("unsorted", lambda c: _set(c, 1, str(int(c[1]) + 10_000)), "unsorted"),
    ("end_lt_pos", lambda c: _set(c, 7, "END=%d" % (int(c[1]) - 5)), "END="),
    ("overlap", lambda c: _set(c, 1, str(int(c[1]) - 2)), "overlap"),
    ("bad_gt", lambda c: _sample(c, 0, "1/1"), "GT"),
    ("neg_pl", lambda c: _sample(c, 3, "0,-5,45"), "negative PL"),
    ("unnorm_pl", lambda c: _sample(c, 3, "3,9,45"), "not normalized"),
    ("pl_gt_mismatch", lambda c: _sample(c, 3, "9,0,45"), "PL[0]"),
    ("bad_min_dp", lambda c: _sample(c, 2, "-1"), "MIN_DP"),
    ("fmt_shape", lambda c: _set(c, 8, "GT:GQ:PL"), "FORMAT"),
    ("undeclared_fmt", lambda c: _set(c, 8, "GT:GQ:MIN_DP:XX"), "not declared"),
    ("bad_contig", lambda c: _set(c, 0, "chrUn"), "not declared"),
    ("past_contig_end", lambda c: _set(c, 7, "END=99999"), "exceeds contig"),
]


def _set(cols, i, v):
    cols = list(cols)
    cols[i] = v
    return cols


def _sample(cols, field_i, v):
    cols = list(cols)
    parts = cols[9].split(":")
    parts[field_i] = v
    cols[9] = ":".join(parts)
    return cols


@pytest.mark.parametrize("name,mutate,expect", MUTATIONS,
                         ids=[m[0] for m in MUTATIONS])
def test_mutations_are_caught(name, mutate, expect):
    lines, _ = _make_stream(7)
    # mutate a mid-stream <NON_REF> block row
    idx = next(i for i, l in enumerate(lines)
               if not l.startswith("#") and "\t<NON_REF>\t" in l
               and int(l.split("\t")[1]) > 500)
    cols = lines[idx].split("\t")
    lines[idx] = "\t".join(mutate(cols))
    problems = validate_gvcf(lines)
    assert problems, f"{name}: corruption not detected"
    assert any(expect in p for p in problems), (name, expect, problems[:4])


def test_variant_row_allele_bookkeeping_caught():
    lines, _ = _make_stream(5)
    idx = next(i for i, l in enumerate(lines)
               if not l.startswith("#") and ",<NON_REF>" in l.split("\t")[4])
    # break AD cardinality (Number=R: one per allele incl. NON_REF)
    cols = lines[idx].split("\t")
    parts = cols[9].split(":")
    parts[3] = "15,15"  # should be 3 values for REF+ALT+NON_REF
    cols[9] = ":".join(parts)
    lines[idx] = "\t".join(cols)
    problems = validate_gvcf(lines)
    assert any("AD has 2 values" in p for p in problems), problems
    # and PL cardinality (Number=G = 6 for 3 alleles)
    lines2, _ = _make_stream(5)
    cols = lines2[idx].split("\t")
    parts = cols[9].split(":")
    parts[5] = "18,0,25,990"  # should be 6
    cols[9] = ":".join(parts)
    lines2[idx] = "\t".join(cols)
    problems = validate_gvcf(lines2)
    assert any("PL has 4 values" in p for p in problems), problems


def test_missing_nonref_alt_declaration_caught():
    lines, _ = _make_stream(9)
    lines = [l for l in lines if not l.startswith("##ALT=<ID=NON_REF")]
    problems = validate_gvcf(lines)
    assert any("##ALT=<ID=NON_REF>" in p for p in problems), problems


def test_region_boundary_gaps_allowed_inside_flagged():
    """Two disjoint calling regions: the inter-region gap is legal, a
    mid-region gap is not."""
    L = 3000
    lines, ref = _make_stream(13, L=L, with_variants=False)
    body = [l for l in lines if not l.startswith("#")]
    header = [l for l in lines if l.startswith("#")]

    # carve the stream into [1,1000] and [2001,3000] by dropping blocks
    def span(l):
        c = l.split("\t")
        import re
        m = re.search(r"END=(\d+)", c[7])
        return int(c[1]), int(m.group(1))

    kept = [l for l in body
            if span(l)[1] <= 1000 or span(l)[0] >= 2001]
    regions = [("chr1", 0, 1000), ("chr1", 2000, 3000)]
    problems = [p for p in validate_gvcf(header + kept, regions=regions)
                if "coverage gap" in p]
    # block edges won't align exactly with 1000/2001 — tolerate gaps that
    # touch the region boundary but none strictly interior
    interior = [p for p in problems
                if not ("-1000" in p or ":1001-" in p or "-2000" in p
                        or ":2001-" in p or "-999" in p)]
    # drop one mid-region block -> interior gap must be flagged
    mid = next(i for i, l in enumerate(kept) if span(l)[0] > 300
               and span(l)[1] < 700)
    del kept[mid]
    flagged = [p for p in validate_gvcf(header + kept, regions=regions)
               if "coverage gap" in p]
    assert len(flagged) > len(problems), "interior gap not flagged"


def test_empty_gvcf_with_header_is_valid():
    header = get_header(gvcf=True, contigs=[("chr1", 100)]).splitlines()
    assert validate_gvcf(header) == []
    assert validate_gvcf([]) != []
