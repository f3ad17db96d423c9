"""Differential decode parity against the REFERENCE'S OWN implementation.

/root/reference's pure-Python decode core (clair3/CallVariants.py
output_with) runs directly as an oracle: for fuzzed (position, alt-info,
probabilities) triples, our decoder (Python and native C++) must emit
byte-identical VCF rows — the strongest parity evidence available without
real-genome data.  Skipped when the reference tree is absent.
"""

import os
import random
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "clair3")), reason="no reference tree")


@pytest.fixture(scope="module")
def ref_decode():
    sys.path.insert(0, REF)
    import clair3.CallVariants as cv  # noqa: E402

    yield cv
    sys.path.remove(REF)


REF_SEQ = "G" * 16 + "A" + "G" * 16

ALT_POOL = [
    "30-XC 14 RA 16 ",
    "20-",
    "1-RA 1 ",
    "25-IATT 5 DGG 4 XG 3 RA 13 ",
    "40-XT 2 XC 2 XG 2 RA 34 ",
    "15-IA" + "T" * 60 + " 3 RA 12 ",
    "33-D" + "G" * 55 + " 5 RA 28 ",
    "10-XA 10 ",
    "28-IAT 6 IATG 6 RA 16 ",
    "28-DT 5 DTG 5 DTGC 2 RA 16 ",
    "12-IAC 4 DC 3 RA 5 ",
    "50-XC 20 XT 11 RA 19 ",
]


def _fuzz_probs(rng, add_indel_length, alpha):
    v = rng.dirichlet(np.full(21, alpha)).tolist()
    v += rng.dirichlet(np.full(3, alpha)).tolist()
    if add_indel_length:
        v += rng.dirichlet(np.full(33, alpha)).tolist()
        v += rng.dirichlet(np.full(33, alpha)).tolist()
    return np.asarray(v)


CASES = [
    # (add_indel_length, pileup, show_ref, gvcf, qual_pass, hap_prec, hap_sens, long_indel)
    (True, False, False, None, False, False, False),
    (False, True, True, None, False, False, False),
    (True, False, True, 15.0, False, False, False),
    (True, False, True, None, True, False, False),
    (True, False, True, None, False, True, False),
    (True, False, True, None, False, False, True),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_decode_matches_reference_fuzz(ref_decode, case_idx):
    (add_indel_length, pileup, show_ref, qual_pass,
     hap_prec, hap_sens, long_indel) = CASES[case_idx]
    cv = ref_decode
    import shared.param_f as param_f
    import shared.param_p as param_p

    cv.param = param_p if pileup else param_f

    from clair3_tpu.decode import DecodeConfig, decode_candidate
    from clair3_tpu.native import decode_batch_native, native_available

    max_infer = 100_000 if long_indel else 50
    ref_cfg = cv.OutputConfig(
        is_show_reference=show_ref,
        is_debug=False,
        is_haploid_precise_mode_enabled=hap_prec,
        is_haploid_sensitive_mode_enabled=hap_sens,
        is_output_for_ensemble=False,
        quality_score_for_pass=qual_pass,
        tensor_fn="PIPE",
        input_probabilities=False,
        add_indel_length=add_indel_length,
        gvcf=False,
        pileup=pileup,
        enable_long_indel=long_indel,
        maximum_variant_length_that_need_infer=max_infer,
        keep_iupac_bases=False,
    )
    my_cfg = DecodeConfig(
        add_indel_length=add_indel_length, pileup=pileup,
        show_ref_calls=show_ref, gvcf=False,
        quality_score_for_pass=qual_pass,
        haploid_precise=hap_prec, haploid_sensitive=hap_sens,
        enable_long_indel=long_indel,
        maximum_variant_length_that_need_infer=max_infer,
    )

    rng = np.random.default_rng(500 + case_idx)
    pyr = random.Random(500 + case_idx)
    pos_infos, alt_infos, probs = [], [], []
    for i in range(400):
        pos_infos.append(f"chr1:{1000 + i}:{REF_SEQ}")
        alt_infos.append(pyr.choice(ALT_POOL))
        probs.append(_fuzz_probs(rng, add_indel_length, (1.0, 0.05, 0.2)[i % 3]))

    expected, mine = [], []
    for pi, ai, pv in zip(pos_infos, alt_infos, probs):
        gt21 = pv[:21]
        zyg = pv[21:24]
        vl1 = pv[24:57] if add_indel_length else np.zeros(33)
        vl2 = pv[57:90] if add_indel_length else np.zeros(33)
        row = cv.output_with(pi, ai, gt21, zyg, vl1, vl2, ref_cfg, None)
        if row is not None:
            expected.append(row)
        row2 = decode_candidate(pi, ai, pv, my_cfg)
        if row2 is not None:
            mine.append(row2)
    assert mine == expected

    if native_available():
        width = 90 if add_indel_length else 24
        mat = np.stack([p[:width] for p in probs])
        native_rows = decode_batch_native(pos_infos, alt_infos, mat, my_cfg)
        assert native_rows == expected


def test_task_label_spaces_match_reference(ref_decode):
    """gt21 labels, genotype strings, and PL genotype orderings agree."""
    sys.path.insert(0, REF)
    try:
        from clair3.task.gt21 import GT21_LABELS as REF_GT21  # noqa: E402
        from clair3.task.genotype import Genotype as RefGenotype  # noqa: E402
    finally:
        sys.path.remove(REF)
    from clair3_tpu.task.labels import GT21_LABELS, Genotype

    assert tuple(REF_GT21) == tuple(GT21_LABELS)
    assert RefGenotype.homo_reference == Genotype.homo_reference
    assert RefGenotype.homo_variant == Genotype.homo_variant
    assert RefGenotype.hetero_variant == Genotype.hetero_variant


def test_compute_pl_matches_reference(ref_decode):
    cv = ref_decode
    from clair3_tpu.decode import compute_pl

    rng = np.random.default_rng(9)
    for trial in range(200):
        gt21 = rng.dirichlet(np.full(21, 0.3))
        zyg = rng.dirichlet(np.full(3, 0.3))
        ref_base = "ACGT"[trial % 4]
        alts = [
            "A" if ref_base != "A" else "C",
            f"{ref_base}TT",
            ".",
            "C,G" if ref_base not in "CG" else "A,T",
        ][trial % 4]
        gt_string = ("0/0", "1/1", "0/1", "1/2")[trial % 4]
        mine = compute_pl(gt_string, zyg, gt21, ref_base, alts)
        theirs = cv.compute_PL(gt_string, zyg, gt21, ref_base, alts)
        assert mine == theirs, (trial, ref_base, alts)


def test_gvcf_blocks_match_reference(tmp_path):
    """Non-variant gVCF block construction matches the reference's
    variantInfoCalculator row-for-row on fuzzed depth/ref streams."""
    import contextlib
    import io

    sys.path.insert(0, REF)
    try:
        from preprocess.utils import variantInfoCalculator  # noqa: E402
    finally:
        sys.path.remove(REF)
    from clair3_tpu.gvcf import NonVariantBlockWriter

    # a tiny FASTA (+ .fai, which the reference's get_header requires) for
    # the reference's header construction
    fasta = tmp_path / "r.fa"
    fasta.write_text(">chr1\n" + "ACGT" * 300 + "\n")
    (tmp_path / "r.fa.fai").write_text("chr1\t1200\t6\t1200\t1201\n")

    rng = np.random.default_rng(21)
    for trial in range(5):
        with contextlib.redirect_stdout(io.StringIO()):
            calc = variantInfoCalculator(
                gvcfWritePath="PIPE", ref_path=str(fasta), p_err=0.001,
                gq_bin_size=5, ctgName="chr1", sample_name="S", mode="L")
        out = io.StringIO()
        calc.vcf_writer = out
        mine = NonVariantBlockWriter(
            p_err=0.001, gq_bin_size=5,
            contig_lengths=dict(calc.contig_length_dict))

        ref_seq = "ACGT" * 300
        pos = 1
        depth_walk = 20
        for step in range(600):
            depth_walk = max(0, depth_walk + int(rng.integers(-3, 4)))
            n_total = depth_walk
            n_ref = max(0, n_total - int(rng.integers(0, 4)))
            # occasional N reference patches and zero-coverage holes
            ref_base = "N" if 180 <= step < 190 else ref_seq[(pos - 1) % len(ref_seq)]
            if 300 <= step < 305:
                n_total = n_ref = 0
            calc.make_gvcf_online({
                "chr": "chr1", "pos": pos, "ref": ref_base,
                "n_total": n_total, "n_ref": n_ref})
            mine.add_site("chr1", pos, ref_base, n_ref, n_total)
            pos += 1
        calc.make_gvcf_online({}, push_current=True)
        ref_rows = [l for l in out.getvalue().splitlines() if l]
        my_rows = [r.rstrip("\n") for r in mine.finish()]
        assert my_rows == ref_rows, f"trial {trial}"


def _synth_pileup_vcf_rows(rng, n=500):
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.4:
            gt = "0/0"
            ref, alt = "A", "."
        elif r < 0.75:
            gt = "0/1"
            ref, alt = ("A", "C") if rng.random() < 0.8 else ("AT", "A")
        else:
            gt = "1/1"
            ref, alt = "G", "T"
        qual = round(rng.random() * 40, 2)
        rows.append(f"chr1\t{100 + i}\t.\t{ref}\t{alt}\t{qual:.2f}\tPASS\tP\t"
                    f"GT:GQ:DP:AD:AF\t{gt}:{int(qual)}:30:15,15:0.5")
    return rows


def test_select_qual_matches_reference(tmp_path):
    """Quality-cutoff selection (full-alignment routing + phasing) matches
    the reference SelectQual submodule run on the same pileup VCF."""
    import random as _r
    import subprocess

    from clair3_tpu.io.vcf import parse_vcf_line
    from clair3_tpu.pipeline.select import select_phase_qual, select_qual

    rng = _r.Random(77)
    rows = _synth_pileup_vcf_rows(rng)
    vcf_text = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n" \
        + "\n".join(rows) + "\n"
    recs = [parse_vcf_line(r + "\n") for r in rows]

    env = dict(os.environ, PYTHONPATH=REF)
    out_dir = tmp_path / "q"
    out_dir.mkdir()
    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SelectQual.py"),
         "--output_fn", str(out_dir), "--var_pct_full", "0.3",
         "--ref_pct_full", "0.1"],
        input=vcf_text, text=True, env=env, check=True, capture_output=True)
    ref_var, ref_ref = map(float, (out_dir / "qual").read_text().split())
    my_var, my_ref = select_qual(recs, var_pct_full=0.3, ref_pct_full=0.1)
    assert (my_var, my_ref) == (ref_var, ref_ref)

    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SelectQual.py"),
         "--output_fn", str(out_dir), "--phase", "--var_pct_phasing", "0.7"],
        input=vcf_text, text=True, env=env, check=True, capture_output=True)
    ref_phase = float((out_dir / "phase_qual").read_text())
    my_phase = select_phase_qual(recs, var_pct_phasing=0.7)
    assert my_phase == ref_phase


def test_merge_vcf_matches_reference(tmp_path):
    """Pileup/full-alignment merge (FA wins at its positions, LowQual
    marking, ref-call printing) matches the reference MergeVcf submodule."""
    import gzip
    import random as _r
    import subprocess

    from clair3_tpu.pipeline.merge_sort import merge_pileup_and_full_alignment

    rng = _r.Random(88)
    pileup_rows = _synth_pileup_vcf_rows(rng, 300)
    # FA re-calls a subset of positions (some overlapping, some new)
    fa_rows = []
    for i in range(0, 300, 3):
        qual = round(rng.random() * 35, 2)
        gt = rng.choice(["0/0", "0/1", "1/1"])
        ref, alt = ("A", ".") if gt == "0/0" else ("A", "T")
        fa_rows.append(f"chr1\t{100 + i}\t.\t{ref}\t{alt}\t{qual:.2f}\tPASS\tF\t"
                       f"GT:GQ:DP:AD:AF\t{gt}:{int(qual)}:30:15,15:0.5")

    header = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    p_vcf = tmp_path / "pileup.vcf.gz"
    f_vcf = tmp_path / "fa.vcf.gz"
    with gzip.open(p_vcf, "wt") as f:
        f.write(header + "\n".join(pileup_rows) + "\n")
    with gzip.open(f_vcf, "wt") as f:
        f.write(header + "\n".join(fa_rows) + "\n")

    for qual_cut, print_ref in ((2, False), (11, True)):
        out_fn = tmp_path / f"merged_{print_ref}.vcf"
        cmd = [sys.executable, os.path.join(REF, "preprocess", "MergeVcf.py"),
               "--pileup_vcf_fn", str(p_vcf),
               "--full_alignment_vcf_fn", str(f_vcf),
               "--output_fn", str(out_fn), "--ctgName", "chr1",
               "--platform", "ont", "--qual", str(qual_cut),
               "--print_ref_calls", str(print_ref)]
        subprocess.run(cmd, env=dict(os.environ, PYTHONPATH=REF),
                       check=True, capture_output=True)
        ref_out = [l for l in out_fn.read_text().splitlines()
                   if l and not l.startswith("#")]
        mine = merge_pileup_and_full_alignment(
            [r + "\n" for r in pileup_rows], [r + "\n" for r in fa_rows],
            contig="chr1", qual_cutoff=qual_cut, print_ref_calls=print_ref)
        assert [m.rstrip("\n") for m in mine] == ref_out, f"print_ref={print_ref}"


def test_select_candidates_matches_reference(tmp_path):
    """Low-qual candidate routing to full-alignment (positions + batch
    splitting) matches the reference SelectCandidates submodule."""
    import gzip
    import random as _r
    import subprocess

    from clair3_tpu.io.vcf import parse_vcf_line
    from clair3_tpu.pipeline.select import select_candidates

    rng = _r.Random(99)
    rows = _synth_pileup_vcf_rows(rng, 800)
    header = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    p_vcf = tmp_path / "pileup.vcf.gz"
    with gzip.open(p_vcf, "wt") as f:
        f.write(header + "\n".join(rows) + "\n")
    split = tmp_path / "split"
    split.mkdir()
    (split / "qual").write_text("18.0 12.0")

    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SelectCandidates.py"),
         "--pileup_vcf_fn", str(p_vcf), "--split_folder", str(split),
         "--ctgName", "chr1", "--platform", "ont",
         "--split_bed_size", "100"],  # phasing_info_in_bam defaults True
        env=dict(os.environ, PYTHONPATH=REF), check=True, capture_output=True)

    # parse the reference's split bed files: window start0 = pos1 - 16 - 1
    ref_batches = []
    index_file = split / "FULL_ALN_FILE_chr1"
    for path in index_file.read_text().split():
        batch = []
        for line in open(path):
            _, start0, _end0 = line.split("\t")
            batch.append(int(start0) + 17)  # back to the 1-based center
        ref_batches.append(batch)

    recs = [parse_vcf_line(r + "\n") for r in rows]
    mine = select_candidates(recs, "chr1", var_qual_cutoff=18.0,
                             ref_qual_cutoff=12.0, split_bed_size=100)
    my_batches = [b.positions for b in mine]
    assert my_batches == ref_batches


def test_focal_loss_matches_reference():
    """Training loss (per-task focal, class-balanced weights, mean-then-sum
    reduction) matches the reference's torch FocalLoss numerically."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from clair3.Train import FocalLoss, cal_class_weight  # noqa: E402
    finally:
        sys.path.remove(REF)
    from clair3_tpu.train.loss import (effective_class_weights,
                                       multitask_loss)

    rng = np.random.default_rng(33)
    B = 64
    label_shapes = [21, 3, 33, 33]
    # one-hot labels, softmax-like predictions
    labels = np.zeros((B, 90), np.float32)
    preds = []
    start = 0
    for size in label_shapes:
        idx = rng.integers(0, size, B)
        labels[np.arange(B), start + idx] = 1.0
        p = rng.dirichlet(np.full(size, 0.5), B).astype(np.float32)
        preds.append(p)
        start += size
    pred_cat = np.concatenate(preds, axis=1)

    # reference: per-task FocalLoss(...).mean() summed (Train.py:236-240)
    label_shape_cum = [21, 24, 57, 90]
    ref_total = 0.0
    start = 0
    for task, size in enumerate(label_shapes):
        lf = FocalLoss(label_shape_cum, task)
        ref_total += float(lf(torch.from_numpy(labels[:, start:start + size]),
                              torch.from_numpy(preds[task])).mean())
        start += size

    mine = float(multitask_loss(jnp.asarray(pred_cat), jnp.asarray(labels),
                                add_indel_length=True))
    assert abs(mine - ref_total) < 1e-4, (mine, ref_total)

    # class-balanced weights match too
    counts = rng.integers(1, 10_000, 21).astype(np.float64)
    ref_w = cal_class_weight(counts, 21)
    my_w = effective_class_weights(counts)
    np.testing.assert_allclose(my_w, ref_w, rtol=1e-12)


def test_sort_vcf_matches_reference(tmp_path):
    """Contig-ordered, position-sorted, position-deduplicated VCF sorting
    matches the reference SortVcf (stdin mode) on shuffled multi-contig
    input with major/minor contig names and duplicate positions."""
    import random as _r
    import subprocess

    from clair3_tpu.pipeline.merge_sort import sort_rows

    rng = _r.Random(101)
    rows = []
    for ctg in ("chr2", "chr10", "scaffold_7", "chr1"):
        for i in range(60):
            pos = rng.randrange(1, 5000)
            rows.append(f"{ctg}\t{pos}\t.\tA\tC\t{rng.random()*40:.2f}\tPASS\tP\t"
                        f"GT:GQ:DP:AD:AF\t0/1:20:30:15,15:0.5\n")
    rows.append("chr1\t42\t.\tA\tC\t9.00\tPASS\tP\tGT\t0/1\n")
    rows.append("chr1\t42\t.\tA\tG\t8.00\tPASS\tP\tGT\t0/1\n")  # dup position
    rng.shuffle(rows)

    out_fn = tmp_path / "sorted.vcf"
    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SortVcf.py"),
         "--output_fn", str(out_fn)],
        input="".join(rows), text=True, check=True, capture_output=True,
        env=dict(os.environ, PYTHONPATH=REF))
    expected = [l + "\n" for l in out_fn.read_text().splitlines() if l]

    contig_names = ["chr2", "chr10", "scaffold_7", "chr1"]
    mine = sort_rows(rows, contig_names)
    assert mine == expected


def test_happy_metrics_match_reference(tmp_path):
    """hap.py-output digestion (SNP/Indel/Ins/Del P/R/F1) matches the
    reference GetOverallMetrics submodule on a synthetic happy VCF."""
    import gzip
    import random as _r
    import re
    import subprocess

    from clair3_tpu.postprocess import parse_happy_vcf

    rng = _r.Random(55)
    rows = []
    for i in range(400):
        vt = rng.choice(["SNP", "INDEL"])
        if vt == "SNP":
            ref, alt, bi = "A", "T", "tv"
        else:
            ins = rng.random() < 0.5
            ref, alt = ("A", "ATG") if ins else ("ATG", "A")
            bi = "i1_5" if ins else "d1_5"
        t_bd = rng.choice(["TP", "FN", "N"])
        q_bd = rng.choice(["TP", "FP", "N"])
        rows.append(
            f"chr1\t{100 + i}\t.\t{ref}\t{alt}\t30\tPASS\t.\t"
            f"GT:BD:BI:BVT\t0/1:{t_bd}:{bi}:{vt}\t0/1:{q_bd}:{bi}:{vt}")
    happy = tmp_path / "happy.vcf.gz"
    with gzip.open(happy, "wt") as f:
        f.write("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH\tQUERY\n"
                + "\n".join(rows) + "\n")

    out_fn = tmp_path / "metrics.txt"
    subprocess.run(
        [sys.executable, os.path.join(REF, "clair3", "metrics",
                                      "GetOverallMetrics.py"),
         "--happy_vcf_fn", str(happy), "--output_fn", str(out_fn)],
        env=dict(os.environ, PYTHONPATH=REF), check=True, capture_output=True)
    text = out_fn.read_text()

    del re  # table output: VariantType FP FN TP TP Precision Recall F1
    mine = parse_happy_vcf(str(happy))
    table = {}
    for line in text.splitlines():
        cols = line.split()
        if cols and cols[0] in ("SNP", "INDEL", "INS", "DEL"):
            table[cols[0]] = cols[1:]
    for key in ("SNP", "INDEL", "INS", "DEL"):
        assert key in table, f"{key} missing from reference output:\n{text}"
        fp, fn, tp, qtp, p_ref, r_ref, f_ref = table[key]
        ours = mine[key]
        assert (ours.query_fp, ours.truth_fn, ours.truth_tp, ours.query_tp) \
            == (int(fp), int(fn), int(tp), int(qtp)), key
        assert abs(ours.precision - float(p_ref)) < 1e-6, key
        assert abs(ours.recall - float(r_ref)) < 1e-6, key
        assert abs(ours.f1 - float(f_ref)) < 1e-6, key


def test_select_het_snp_matches_reference(tmp_path):
    """Het-SNP phasing selection matches the reference SelectHetSnp
    submodule: same positions survive the phase_qual cutoff, hom/indel/
    low-qual rows dropped identically."""
    import gzip
    import random as _r
    import subprocess

    from clair3_tpu.io.vcf import parse_vcf_line
    from clair3_tpu.pipeline.select import select_het_snps

    rng = _r.Random(88)
    rows = _synth_pileup_vcf_rows(rng)
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    vcf_gz = tmp_path / "pileup.vcf.gz"
    with gzip.open(vcf_gz, "wt") as f:
        f.write(header + "\n".join(rows) + "\n")

    split = tmp_path / "phase_vcf"
    split.mkdir()
    cutoff = 14.0
    (split / "phase_qual").write_text(f"{cutoff}\n")
    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SelectHetSnp.py"),
         "--vcf_fn", str(vcf_gz), "--split_folder", str(split),
         "--ctgName", "chr1"],
        env=dict(os.environ, PYTHONPATH=REF), check=True, capture_output=True)
    ref_rows = [l for l in (split / "chr1.vcf").read_text().splitlines()
                if l and not l.startswith("#")]
    ref_pos = [int(r.split("\t")[1]) for r in ref_rows]

    recs = [parse_vcf_line(r + "\n") for r in rows]
    mine = select_het_snps(recs, cutoff, "chr1")
    assert [r.pos for r in mine] == ref_pos
    assert len(ref_pos) > 20  # non-trivial selection


def test_split_extend_bed_matches_reference(tmp_path):
    """BED splitting/extension emits row-identical regions to the reference
    SplitExtendBed submodule (+-33bp expansion, touching-region merge, incl.
    the unflushed-trailing-region quirk)."""
    import random as _r
    import subprocess

    from clair3_tpu.io.bed import split_extend_bed_regions

    rng = _r.Random(99)
    lines = []
    pos = 100
    for _ in range(200):
        pos += rng.randrange(5, 400)
        end = pos + rng.randrange(1, 150)
        lines.append(f"chr1\t{pos}\t{end}")
        pos = end
    bed = tmp_path / "in.bed"
    bed.write_text("\n".join(lines) + "\n")

    out_fn = tmp_path / "split.bed"
    subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", "SplitExtendBed.py"),
         "--bed_fn", str(bed), "--output_fn", str(out_fn),
         "--ctgName", "chr1"],
        env=dict(os.environ, PYTHONPATH=REF), check=True, capture_output=True)
    ref_regions = [tuple(l.split()) for l in out_fn.read_text().splitlines() if l]

    mine = [(c, str(s), str(e))
            for c, s, e in split_extend_bed_regions(str(bed), "chr1")]
    assert mine == ref_regions
    assert len(mine) > 10


def test_gvcf_merge_matches_reference(tmp_path):
    """Variant/non-variant gVCF MERGE matches the reference's
    gvcfGenerator.mergeCalls row-for-row, including multi-base deletion
    spans that swallow or clip following non-variant blocks (the r04
    validator found our merge leaked blocks inside deletion spans;
    reference: preprocess/utils.py:189-346)."""
    import random as _random

    sys.path.insert(0, REF)
    try:
        from preprocess.utils import gvcfGenerator  # noqa: E402
    finally:
        sys.path.remove(REF)
    from clair3_tpu.gvcf import NonVariantBlockWriter, merge_variant_and_nonvariant

    L = 1500
    rng = _random.Random(5)
    seq = "".join(rng.choice("ACGT") for _ in range(L))

    for trial in range(4):
        trng = _random.Random(100 + trial)
        # variants: SNPs, insertions, and 2-4 bp deletions
        variants = []
        p = 40
        while p < L - 40:
            kind = trng.random()
            if kind < 0.5:
                ref, alt = seq[p - 1], trng.choice(
                    [b for b in "ACGT" if b != seq[p - 1]])
            elif kind < 0.75:
                ref, alt = seq[p - 1], seq[p - 1] + "TG"
            else:
                dlen = trng.randint(2, 4)
                ref, alt = seq[p - 1: p - 1 + dlen], seq[p - 1]
            variants.append((p, ref, alt))
            p += trng.randint(15, 60)
        # keep the LAST variant a SNP: the reference's tail flush dumps
        # remaining non-variant blocks verbatim (utils.py:336-344), so
        # blocks inside a final deletion's span leak through untrimmed
        # there — a structural bug we deliberately do not reproduce (see
        # test_gvcf_merge_two_variants_one_block_divergence for the same
        # stance on the stale-POS middle-fragment quirk)
        lp, lref, lalt = variants[-1]
        if len(lref) > 1:
            variants[-1] = (lp, seq[lp - 1],
                            "T" if seq[lp - 1] != "T" else "C")
        var_rows = [
            f"chr1\t{p}\t.\t{r}\t{a}\t23.5\tPASS\tP\t"
            f"GT:GQ:DP:AD:AF:PL\t0/1:23:30:15,15:0.5000:23,0,30"
            for p, r, a in variants
        ]
        spans = {p for p, r, a in variants}
        deleted = set()
        for p, r, a in variants:
            deleted.update(range(p, p + len(r)))

        # non-variant stream over EVERY position (like the pipeline); ref
        # support dips at variant sites (real reads carry the alt) so blocks
        # break there, and depth hits 0 inside deletion spans so blocks
        # break mid-span too
        w = NonVariantBlockWriter()
        depth = 25
        for pos1 in range(1, L + 1):
            depth = max(5, min(50, depth + trng.choice([-1, 0, 0, 1])))
            if pos1 in deleted and pos1 not in spans:
                d, nr = 0, 0
            elif pos1 in spans:
                d, nr = depth, depth // 2  # het-like ref fraction
            else:
                d, nr = depth, max(0, depth - 1)
            w.add_site("chr1", pos1, seq[pos1 - 1], nr, d)
        nonvar_rows = w.finish()

        # reference oracle (samtools faidx stubbed with the in-memory seq)
        gen = gvcfGenerator(ref_path="unused", samtools="true")
        gen.readReferenceBaseAtPos = (
            lambda pos_cmd: seq[int(pos_cmd.split(":")[1].split("-")[0]) - 1])
        vpath, npath, opath = (str(tmp_path / f"{trial}_{n}")
                               for n in ("var.vcf", "nonvar.gvcf", "out.gvcf"))
        with open(vpath, "w") as fh:
            fh.write("\n".join(var_rows) + "\n")
        with open(npath, "w") as fh:
            fh.write("\n".join(nonvar_rows) + "\n")
        gen.mergeCalls(vpath, npath, opath, "S", ctgName="chr1")
        with open(opath) as fh:
            ref_merged = [l.rstrip("\n") for l in fh if l.strip()]

        mine = merge_variant_and_nonvariant(
            var_rows, nonvar_rows, lambda c, p: seq[p - 1])
        assert mine == ref_merged, (
            f"trial {trial}: first diff at "
            f"{next(i for i, (a, b) in enumerate(zip(mine, ref_merged)) if a != b) if mine != ref_merged and len(mine) == len(ref_merged) else (len(mine), len(ref_merged))}")


def test_gvcf_merge_two_variants_one_block_divergence(tmp_path):
    """DOCUMENTED DIVERGENCE: when one non-variant block contains TWO
    variant calls, the reference's middle fragment keeps the block's
    ORIGINAL POS (utils.py:293-296 _writeLeftBlock rewrites only END) —
    an unsorted, overlapping, structurally-invalid gVCF row that GATK
    would reject.  We emit the position-correct fragment instead.  This
    is latent in practice (blocks break at variant sites because ref
    support dips), but FA-stage rescue calls at pileup-confident sites
    can trigger it; sane output wins over byte parity here."""
    sys.path.insert(0, REF)
    try:
        from preprocess.utils import gvcfGenerator  # noqa: E402
    finally:
        sys.path.remove(REF)
    from clair3_tpu.gvcf import merge_variant_and_nonvariant

    seq = "ACGT" * 50
    var_rows = [
        f"chr1\t{p}\t.\t{seq[p - 1]}\t"
        f"{'T' if seq[p - 1] != 'T' else 'C'}\t20.0\tPASS\tF\t"
        f"GT:GQ:DP:AD:AF:PL\t0/1:20:30:15,15:0.5000:20,0,25"
        for p in (60, 120)
    ]
    block = ("chr1\t40\t.\t%s\t<NON_REF>\t0\t.\tEND=160\t"
             "GT:GQ:MIN_DP:PL\t0/0:50:30:0,60,840" % seq[39])
    vp, np_, op = (str(tmp_path / n) for n in ("v", "n", "o"))
    with open(vp, "w") as fh:
        fh.write("\n".join(var_rows) + "\n")
    with open(np_, "w") as fh:
        fh.write(block + "\n")
    gen = gvcfGenerator(ref_path="unused", samtools="true")
    gen.readReferenceBaseAtPos = (
        lambda pos_cmd: seq[int(pos_cmd.split(":")[1].split("-")[0]) - 1])
    gen.mergeCalls(vp, np_, op, "S", ctgName="chr1")
    with open(op) as fh:
        ref_merged = [l.rstrip("\n") for l in fh if l.strip()]
    mine = merge_variant_and_nonvariant(
        var_rows, [block], lambda c, p: seq[p - 1])

    # the reference's middle fragment carries the stale POS 40
    ref_mid = ref_merged[2].split("\t")
    assert ref_mid[1] == "40" and "END=119" in ref_mid[7]
    # ours is position-correct: POS 61, looked-up ref base
    my_mid = mine[2].split("\t")
    assert my_mid[1] == "61" and my_mid[3] == seq[60] and "END=119" in my_mid[7]
    # everything else is row-identical
    assert mine[:2] == ref_merged[:2] and mine[3:] == ref_merged[3:]
    # and ours is sorted + contiguous (structural validity)
    from clair3_tpu.gvcf_validate import validate_gvcf
    probs = [p for p in validate_gvcf(mine)
             if "declared" not in p and "header" not in p]
    assert probs == [], probs
