import math

import numpy as np
import pytest

from clair3_tpu.decode import DecodeConfig, compute_pl, decode_candidate, quality_score_from
from clair3_tpu.task.labels import GT21


def make_probs(gt21_idx, genotype_idx, len1=0, len2=0, p=0.95, add_indel_length=True):
    """90-dim probability vector with near-one-hot heads."""
    v = np.zeros(90)
    v[:21] = (1 - p) / 20
    v[gt21_idx] = p
    v[21:24] = (1 - p) / 2
    v[21 + genotype_idx] = p
    v[24:57] = (1 - p) / 32
    v[24 + len1 + 16] = p
    v[57:90] = (1 - p) / 32
    v[57 + len2 + 16] = p
    return v


REF_SEQ = "G" * 16 + "A" + "G" * 16  # center base A
CFG = DecodeConfig(add_indel_length=True, pileup=False)
CFG_P = DecodeConfig(add_indel_length=False, pileup=True)


def _row(probs, alt_info, cfg=CFG, pos_info=f"chr1:1000:{REF_SEQ}"):
    return decode_candidate(pos_info, alt_info, probs, cfg)


def parse(row):
    cols = row.rstrip("\n").split("\t")
    sample = cols[9].split(":")
    return {
        "chrom": cols[0], "pos": int(cols[1]), "ref": cols[3], "alt": cols[4],
        "qual": float(cols[5]), "filter": cols[6], "info": cols[7],
        "gt": sample[0], "gq": int(sample[1]), "dp": int(sample[2]),
        "ad": sample[3], "af": sample[4],
    }


def test_hom_ref_hidden_by_default():
    probs = make_probs(GT21.AA, 0)
    assert _row(probs, "30-RA 30 ") is None


def test_hom_ref_shown_with_flag():
    probs = make_probs(GT21.AA, 0)
    cfg = DecodeConfig(add_indel_length=True, pileup=True, show_ref_calls=True)
    row = _row(probs, "30-RA 30 ", cfg)
    d = parse(row)
    assert d["filter"] == "RefCall"
    assert d["alt"] == "."
    assert d["gt"] == "0/0"
    assert d["info"] == "P"


def test_het_snp():
    probs = make_probs(GT21.AC, 2)  # A->C het
    row = _row(probs, "30-XC 14 RA 16 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("A", "C", "0/1")
    assert d["dp"] == 30
    assert d["ad"] == "16,14"
    assert d["af"] == "%.4f" % (14 / 30)
    assert d["filter"] == "PASS"
    assert d["info"] == "F"


def test_hom_snp():
    probs = make_probs(GT21.TT, 1)
    row = _row(probs, "25-XT 24 RA 1 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("A", "T", "1/1")
    assert d["ad"] == "1,24"


def test_multiallelic_snp():
    probs = make_probs(GT21.CG, 2)  # neither allele is ref A -> 1/2
    row = _row(probs, "40-XC 18 XG 19 RA 3 ")
    d = parse(row)
    assert d["gt"] == "1/2"
    # sorted by count desc: G(19) then C(18)
    assert d["alt"] == "G,C"
    assert d["ad"] == "3,19,18"


def test_snp_alt_base_switch_when_unsupported():
    # model says C but reads only show G -> find_alt_base switches
    probs = make_probs(GT21.AC, 2)
    row = _row(probs, "30-XG 15 RA 15 ")
    d = parse(row)
    assert d["alt"] == "G"


def test_hom_insertion_with_length():
    probs = make_probs(GT21.InsIns, 1, len1=2, len2=2)
    row = _row(probs, "20-IATT 18 RA 2 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("A", "ATT", "1/1")
    assert d["ad"] == "2,18"


def test_het_acgt_insertion():
    probs = make_probs(GT21.AIns, 2, len1=0, len2=3)
    row = _row(probs, "30-IATTT 13 RA 17 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("A", "ATTT", "0/1")


def test_hom_deletion_with_length():
    probs = make_probs(GT21.DelDel, 1, len1=-2, len2=-2)
    row = _row(probs, "22-DGG 20 RA 2 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("AGG", "A", "1/1")
    assert d["ad"] == "2,20"


def test_het_deletion():
    probs = make_probs(GT21.ADel, 2, len1=-2, len2=0)
    row = _row(probs, "30-DGG 14 RA 16 ")
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("AGG", "A", "0/1")


def test_insdel():
    probs = make_probs(GT21.InsDel, 2, len1=-2, len2=2)
    row = _row(probs, "30-DGG 12 IACC 13 RA 5 ")
    d = parse(row)
    assert d["ref"] == "AGG"
    assert d["gt"] == "1/2"
    # alt1 = deletion allele (A), alt2 = insertion + remaining ref (ACC + GG)
    assert d["alt"] == "A,ACCGG"


def test_fallback_to_reference_when_no_evidence():
    # model wants an insertion but alt-info has none -> probability zeroed,
    # next best outcome (hom ref, from residual mass) wins -> hidden ref call
    probs = make_probs(GT21.InsIns, 1, len1=2, len2=2, p=0.6)
    probs[GT21.AA] = 0.3
    probs[21 + 0] = 0.35
    assert _row(probs, "20-RA 20 ") is None


def test_fallback_insertion_without_proposed_length():
    # proposed length 5 absent; evidence has length-2 insertion ->
    # propose_insertion_length path returns nothing, fallback finds empty ->
    # but without the propose filter the length-2 ins is used
    probs = make_probs(GT21.InsIns, 1, len1=5, len2=5)
    row = _row(probs, "20-IAGG 18 RA 2 ")
    d = parse(row)
    assert d["alt"] == "AGG"


def test_qual_formula():
    assert quality_score_from(0.5) == pytest.approx(10.0, abs=0.01)
    q9 = quality_score_from(0.9)
    assert q9 == pytest.approx(-10 * math.log10(math.e) * math.log(0.1 / 0.9) + 10, abs=0.01)
    assert quality_score_from(1e-12) == 0.0


def test_compute_pl_biallelic():
    gt21 = np.zeros(21)
    gt21[GT21.AC] = 0.9
    gt21[GT21.AA] = 0.05
    gt21[GT21.CC] = 0.05
    geno = np.array([0.05, 0.05, 0.9])
    pls = compute_pl("0/1", geno, gt21, "A", "C")
    assert len(pls) == 3
    assert min(pls) == 0
    assert pls[1] == 0  # het is most likely
    assert all(isinstance(x, int) and x >= 0 for x in pls)


def test_compute_pl_triallelic_length():
    gt21 = np.full(21, 1 / 21)
    geno = np.array([0.2, 0.2, 0.6])
    pls = compute_pl("1/2", geno, gt21, "A", "C,G")
    assert len(pls) == 6


def test_gvcf_mode_adds_pl():
    probs = make_probs(GT21.AC, 2)
    cfg = DecodeConfig(add_indel_length=True, pileup=False, gvcf=True)
    row = _row(probs, "30-XC 14 RA 16 ", cfg)
    cols = row.split("\t")
    assert cols[8] == "GT:GQ:DP:AD:AF:PL"
    assert len(cols[9].split(":")) == 6


def test_haploid_precise_drops_het():
    probs = make_probs(GT21.AC, 2)
    cfg = DecodeConfig(add_indel_length=True, pileup=False, haploid_precise=True)
    assert _row(probs, "30-XC 14 RA 16 ", cfg) is None


def test_haploid_genotype_rewrite():
    probs = make_probs(GT21.TT, 1)
    cfg = DecodeConfig(add_indel_length=True, pileup=False, haploid_sensitive=True)
    row = _row(probs, "25-XT 24 RA 1 ", cfg)
    d = parse(row)
    assert d["gt"] == "1"


def test_qual_cutoff_lowqual():
    probs = make_probs(GT21.AC, 2, p=0.55)
    cfg = DecodeConfig(add_indel_length=True, pileup=False, quality_score_for_pass=15.0)
    row = _row(probs, "30-XC 14 RA 16 ", cfg)
    d = parse(row)
    assert d["filter"] == "LowQual"


def test_pileup_mode_without_length_heads():
    probs = np.zeros(24)
    probs[:21] = 0.002
    probs[GT21.AT] = 0.96
    probs[21:24] = [0.02, 0.02, 0.96]
    row = decode_candidate(f"chr1:500:{REF_SEQ}", "28-XT 13 RA 15 ", probs, CFG_P)
    d = parse(row)
    assert (d["ref"], d["alt"], d["gt"]) == ("A", "T", "0/1")
    assert d["info"] == "P"


def test_single_base_reference_sequence():
    # C-path position info carries only the center base
    probs = make_probs(GT21.AC, 2)
    row = decode_candidate("chr1:1000:A", "30-XC 14 RA 16 ", probs, CFG)
    d = parse(row)
    assert (d["ref"], d["alt"]) == ("A", "C")


def test_decoder_fuzz_never_raises():
    """Robustness: random probability vectors over assorted alt-info shapes
    must always decode or return None, never raise."""
    import random as _r

    rng = np.random.default_rng(0)
    pyr = _r.Random(0)
    alt_pool = [
        "30-XC 14 RA 16 ",
        "20-",
        "1-RA 1 ",
        "25-IATT 5 DGG 4 XG 3 RA 13 ",
        "40-XT 2 XC 2 XG 2 RA 34 ",
        "15-IA" + "T" * 60 + " 3 RA 12 ",   # insertion longer than max_infer
        "33-D" + "G" * 55 + " 5 RA 28 ",
        "10-XA 10 ",                        # alt == would-be ref
    ]
    for cfg in (CFG, CFG_P, DecodeConfig(add_indel_length=True, pileup=False,
                                         gvcf=True, show_ref_calls=True)):
        n = 24 if not cfg.add_indel_length else 90
        for trial in range(300):
            probs = rng.dirichlet(np.ones(21)).tolist()
            probs += rng.dirichlet(np.ones(3)).tolist()
            if cfg.add_indel_length:
                probs += rng.dirichlet(np.ones(33)).tolist()
                probs += rng.dirichlet(np.ones(33)).tolist()
            alt_info = pyr.choice(alt_pool)
            row = decode_candidate(f"chr1:{1000 + trial}:{REF_SEQ}", alt_info,
                                   np.asarray(probs), cfg)
            if row is not None:
                cols = row.rstrip().split("\t")
                assert len(cols) == 10
                assert int(cols[1]) == 1000 + trial


def test_batch_decode_parallel_matches_serial():
    """Process-pool decode must emit byte-identical rows in the same order
    as the serial path (and actually engage the pool above the threshold)."""
    import random as _r

    from clair3_tpu.decode import batch_decode, batch_decode_parallel, shutdown_decode_pool
    from clair3_tpu.decode.decoder import _DECODE_CHUNK

    rng = np.random.default_rng(3)
    pyr = _r.Random(3)
    alt_pool = [
        "30-XC 14 RA 16 ",
        "25-IATT 5 DGG 4 XG 3 RA 13 ",
        "40-XT 2 XC 2 XG 2 RA 34 ",
        "20-",
        "18-DG 6 RA 12 ",
    ]
    n = 2 * _DECODE_CHUNK + 123  # force the pool path
    pos_infos, alt_infos, probs = [], [], []
    for i in range(n):
        pos_infos.append(f"chr1:{1000 + i}:{REF_SEQ}")
        alt_infos.append(pyr.choice(alt_pool))
        v = rng.dirichlet(np.ones(21)).tolist()
        v += rng.dirichlet(np.ones(3)).tolist()
        v += rng.dirichlet(np.ones(33)).tolist()
        v += rng.dirichlet(np.ones(33)).tolist()
        probs.append(v)
    probs = np.asarray(probs)
    cfg = DecodeConfig(add_indel_length=True, pileup=False, show_ref_calls=True)
    serial = batch_decode(pos_infos, alt_infos, probs, cfg)
    try:
        par = batch_decode_parallel(pos_infos, alt_infos, probs, cfg,
                                    processes=4, force_pool=True)
    finally:
        shutdown_decode_pool()
    assert par == serial
    # small batches stay inline (no pool respawn cost)
    small = batch_decode_parallel(pos_infos[:10], alt_infos[:10], probs[:10],
                                  cfg, processes=4)
    assert small == batch_decode(pos_infos[:10], alt_infos[:10], probs[:10], cfg)
    shutdown_decode_pool()


def test_debug_mode_prints_head_probabilities(capsys):
    """--debug prints each candidate's raw head probabilities INSTEAD of
    the VCF row (ref-call hiding bypassed) in the reference's exact
    print_debug_message format (CallVariants.py:259-277,1342-1351)."""
    import os

    import numpy as np

    from clair3_tpu.decode import DecodeConfig, batch_decode_parallel, decode_candidate

    rng = np.random.default_rng(5)
    probs = np.concatenate([rng.dirichlet(np.ones(21)),
                            rng.dirichlet(np.ones(3))])
    cfg = DecodeConfig(add_indel_length=False, pileup=True,
                       show_ref_calls=False, debug=True)
    row = decode_candidate("chr1:101:A", "10-XC 6 RA 4 ", probs, cfg)
    assert row is None
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l]
    assert len(lines) == 1
    cols = lines[0].split("\t")
    assert cols[0] == "chr1" and cols[1] == "101"
    assert cols[6] in ("Normal output", "Reference")

    # exact-format differential vs the reference's own print_debug_message
    if os.path.isdir("/root/reference/clair3"):
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from clair3.CallVariants import print_debug_message  # noqa: E402
        finally:
            sys.path.remove("/root/reference")
        gt21, gt = probs[:21], probs[21:24]
        vl = np.zeros(33)
        print_debug_message("chr1", 101, gt21, gt, vl, vl,
                            "Normal output" if cols[6] == "Normal output"
                            else "Reference")
        ref_line = capsys.readouterr().out.splitlines()[0]
        assert lines[0] == ref_line

    # batch_decode_parallel must not route debug mode through the native
    # decoder (prints happen in-process, rows suppressed)
    rows = batch_decode_parallel(["chr1:101:A"], ["10-XC 6 RA 4 "],
                                 probs[None, :], cfg)
    assert rows == []
    assert capsys.readouterr().out.count("chr1\t101") == 1
