"""Reference-submodule compatibility dispatcher tests.

``python -m clair3_tpu <Submodule>`` accepts the reference's submodule
names and flag spellings (reference: clair3.py:80-104).  Where the
reference tree is available, outputs are compared byte-for-byte against
the reference's own submodule run on identical inputs.
"""

import gzip
import os
import subprocess
import sys

import pytest

from clair3_tpu.cli import main as cli_main

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "preprocess"))

HEADER = ("##fileformat=VCFv4.2\n"
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")


def _pileup_vcf_text(seed=5, n=120):
    import random

    rng = random.Random(seed)
    rows = []
    pos = 100
    for _ in range(n):
        pos += rng.randint(10, 80)
        r = rng.random()
        if r < 0.4:
            ref, alt, gt = "A", ".", "0/0"
        elif r < 0.7:
            ref, alt, gt = "A", "G", "0/1"
        elif r < 0.85:
            ref, alt, gt = "C", "T", "1/1"
        else:
            ref, alt, gt = "A", "AT", "0/1"
        qual = round(rng.uniform(0.5, 30), 4)
        rows.append(f"chr1\t{pos}\t.\t{ref}\t{alt}\t{qual}\t.\t.\t"
                    f"GT:GQ:DP:AF\t{gt}:{int(qual)}:20:0.4")
    return HEADER + "\n".join(rows) + "\n"


def _run_ref(script, args, stdin_text=None, cwd=None):
    return subprocess.run(
        [sys.executable, os.path.join(REF, "preprocess", script)] + args,
        env=dict(os.environ, PYTHONPATH=REF), input=stdin_text,
        capture_output=True, text=True, check=True, cwd=cwd)


def _run_ours(args, stdin_text=None):
    """Run the compat dispatcher in-process (capturing nothing) or via a
    subprocess when stdin is needed."""
    if stdin_text is None:
        return cli_main(args)
    r = subprocess.run(
        [sys.executable, "-m", "clair3_tpu"] + args,
        input=stdin_text, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return 0


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_select_qual_compat_matches_reference(tmp_path):
    vcf_text = _pileup_vcf_text()
    for extra in ([], ["--phase"]):
        ref_dir = tmp_path / ("ref" + "_".join(extra))
        our_dir = tmp_path / ("our" + "_".join(extra))
        ref_dir.mkdir()
        our_dir.mkdir()
        base = ["--var_pct_full", "0.3", "--ref_pct_full", "0.1",
                "--var_pct_phasing", "0.7"]
        _run_ref("SelectQual.py",
                 ["--output_fn", str(ref_dir)] + base + extra,
                 stdin_text=vcf_text)
        _run_ours(["SelectQual", "--output_fn", str(our_dir)] + base + extra,
                  stdin_text=vcf_text)
        name = "phase_qual" if extra else "qual"
        ref_out = (ref_dir / name).read_text()
        our_out = (our_dir / name).read_text()
        assert ref_out == our_out


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_select_het_snp_compat_matches_reference(tmp_path):
    vcf_fn = tmp_path / "pileup.vcf"
    vcf_fn.write_text(_pileup_vcf_text(seed=9))
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "our"
    ref_dir.mkdir()
    our_dir.mkdir()
    # with a phase_qual cutoff file present (the pipeline's layout)
    (ref_dir / "phase_qual").write_text("8.0")
    (our_dir / "phase_qual").write_text("8.0")
    _run_ref("SelectHetSnp.py",
             ["--vcf_fn", str(vcf_fn), "--split_folder", str(ref_dir),
              "--ctgName", "chr1"])
    assert _run_ours(["SelectHetSnp", "--vcf_fn", str(vcf_fn),
                      "--split_folder", str(our_dir),
                      "--ctgName", "chr1"]) == 0
    assert (ref_dir / "chr1.vcf").read_text() == (our_dir / "chr1.vcf").read_text()


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_select_candidates_compat_matches_reference(tmp_path):
    vcf_fn = tmp_path / "pileup.vcf"
    vcf_fn.write_text(_pileup_vcf_text(seed=11, n=300))
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "our"
    ref_dir.mkdir()
    our_dir.mkdir()
    (ref_dir / "qual").write_text("14.0 9.0")
    (our_dir / "qual").write_text("14.0 9.0")
    base = ["--pileup_vcf_fn", str(vcf_fn), "--ctgName", "chr1",
            "--split_bed_size", "40", "--platform", "ont"]
    _run_ref("SelectCandidates.py", ["--split_folder", str(ref_dir)] + base)
    assert _run_ours(
        ["SelectCandidates", "--split_folder", str(our_dir)] + base) == 0

    ref_files = sorted(f for f in os.listdir(ref_dir) if f != "qual")
    our_files = sorted(f for f in os.listdir(our_dir) if f != "qual")
    assert ref_files == our_files
    for name in ref_files:
        ref_text = (ref_dir / name).read_text()
        our_text = (our_dir / name).read_text()
        if name.startswith("FULL_ALN_FILE"):
            # absolute paths differ by folder; compare basenames
            ref_text = "\n".join(os.path.basename(l) for l in ref_text.splitlines())
            our_text = "\n".join(os.path.basename(l) for l in our_text.splitlines())
        assert ref_text == our_text, name


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_get_truth_compat_matches_reference(tmp_path):
    rows = [
        "chr1\t101\t.\tA\tG\t50\tPASS\t.\tGT:GQ\t0/1:50",
        "chr1\t205\t.\tC\tCAT\t44\tPASS\t.\tGT:GQ\t1/1:44",
        "chr1\t390\t.\tGTT\tG\t31\tPASS\t.\tGT:GQ\t1|0:31",
        "chr1\t500\t.\tT\tTA,*\t28\tPASS\t.\tGT:GQ\t1/2:28",
        "chr2\t101\t.\tA\tT\t50\tPASS\t.\tGT:GQ\t0/1:50",
    ]
    vcf_fn = tmp_path / "truth.vcf"
    vcf_fn.write_text(HEADER + "\n".join(rows) + "\n")

    ref_var = tmp_path / "ref_var.gz"
    our_var = tmp_path / "our_var.gz"
    _run_ref("GetTruth.py", ["--vcf_fn", str(vcf_fn), "--ctgName", "chr1",
                             "--var_fn", str(ref_var)])
    assert _run_ours(["GetTruth", "--vcf_fn", str(vcf_fn), "--ctgName", "chr1",
                      "--var_fn", str(our_var)]) == 0
    assert gzip.open(ref_var, "rt").read() == gzip.open(our_var, "rt").read()


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_split_extend_bed_compat_matches_reference(tmp_path):
    bed_fn = tmp_path / "in.bed"
    bed_fn.write_text(
        "chr1\t100\t200\nchr1\t220\t300\nchr1\t5000\t6000\nchr2\t10\t50\n")
    ref_out = tmp_path / "ref.bed"
    our_out = tmp_path / "our.bed"
    _run_ref("SplitExtendBed.py", ["--bed_fn", str(bed_fn), "--ctgName", "chr1",
                                   "--output_fn", str(ref_out)])
    assert _run_ours(["SplitExtendBed", "--bed_fn", str(bed_fn),
                      "--ctgName", "chr1", "--output_fn", str(our_out)]) == 0
    ref_body = gzip.open(ref_out, "rt").read() \
        if open(ref_out, "rb").read(2) == b"\x1f\x8b" else ref_out.read_text()
    assert ref_body == our_out.read_text()


def test_merge_bin_compat(tmp_path):
    import numpy as np

    from clair3_tpu.train.data import read_bin, write_bin

    bins = []
    for i in range(2):
        path = str(tmp_path / f"b{i}.bin")
        write_bin(path,
                  np.full((3, 33, 18), i, np.int32),
                  np.eye(90, dtype=np.float32)[:3],
                  [f"chr1:{i}00" for _ in range(3)],
                  ["10-" for _ in range(3)])
        bins.append(path)
    out = str(tmp_path / "merged.bin")
    assert cli_main(["MergeBin"] + bins + ["--out_fn", out]) == 0
    x, y, pos, alts = read_bin(out)
    assert x.shape[0] == 6


def test_sort_vcf_compat_dir_mode(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    (d / "full_alignment_chr1_a.vcf").write_text(
        HEADER + "chr1\t500\t.\tA\tG\t20\tPASS\t.\tGT\t0/1\n")
    (d / "full_alignment_chr1_b.vcf").write_text(
        HEADER + "chr1\t100\t.\tC\tT\t30\tPASS\t.\tGT\t1/1\n")
    (d / "other.txt").write_text("ignored\n")
    out = str(tmp_path / "sorted.vcf.gz")
    assert cli_main(["SortVcf", "--input_dir", str(d),
                     "--vcf_fn_prefix", "full_alignment",
                     "--output_fn", out]) == 0
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert [int(r.split("\t")[1]) for r in body] == [100, 500]


def test_redirect_submodules():
    assert cli_main(["CallVariantsFromCffi"]) == 2
    assert cli_main(["Tensor2Bin"]) == 2


def test_train_compat_spelling(tmp_path):
    """`python -m clair3_tpu Train` accepts the reference Train flag
    spellings (--bin_fn dir, --ochk_prefix, --maxEpoch) and trains a
    pileup net; the '_20_' filename filter excludes held-out bins."""
    import numpy as np

    from clair3_tpu.train.data import write_bin

    bin_dir = tmp_path / "bins"
    bin_dir.mkdir()
    rng = np.random.default_rng(0)
    x = rng.integers(-20, 20, size=(64, 33, 18)).astype(np.int32)
    y = np.zeros((64, 90), np.float32)
    y[:, rng.integers(0, 21, 64)] = 1.0
    y[:, 21 + rng.integers(0, 3, 64)] = 1.0
    y[:, 24 + 16] = 1.0
    y[:, 57 + 16] = 1.0
    write_bin(str(bin_dir / "sample_1_chr1.bin"), x, y,
              [f"chr1:{i}" for i in range(64)], ["10-"] * 64)
    write_bin(str(bin_dir / "sample_1_20_held.bin"), x[:4], y[:4],
              [f"chr20:{i}" for i in range(4)], ["10-"] * 4)

    prefix = str(tmp_path / "model" / "ck")
    rc = cli_main([
        "Train", "--bin_fn", str(bin_dir), "--ochk_prefix", prefix,
        "--maxEpoch", "1", "--pileup", "--platform", "ont",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path / "model"), "best_val_loss.npz"))


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_merge_vcf_compat_matches_reference(tmp_path):
    """python -m clair3_tpu MergeVcf (reference spellings) row-matches the
    reference MergeVcf submodule on identical inputs."""
    import random

    rng = random.Random(88)
    pileup_rows = []
    pos = 100
    for _ in range(200):
        pos += rng.randint(3, 40)
        q = round(rng.uniform(0.5, 30), 2)
        gt = rng.choice(["0/0", "0/1", "1/1"])
        ref, alt = ("A", ".") if gt == "0/0" else ("A", "T")
        pileup_rows.append(
            f"chr1\t{pos}\t.\t{ref}\t{alt}\t{q:.2f}\tPASS\tP\t"
            f"GT:GQ:DP:AD:AF\t{gt}:{int(q)}:30:15,15:0.5")
    fa_rows = []
    for r in pileup_rows[::3]:
        cols = r.split("\t")
        q = round(rng.uniform(5, 35), 2)
        gt = rng.choice(["0/1", "1/1"])
        fa_rows.append(f"chr1\t{cols[1]}\t.\tA\tG\t{q:.2f}\tPASS\tF\t"
                       f"GT:GQ:DP:AD:AF\t{gt}:{int(q)}:30:15,15:0.5")

    p_vcf = tmp_path / "pileup.vcf.gz"
    f_vcf = tmp_path / "fa.vcf.gz"
    with gzip.open(p_vcf, "wt") as f:
        f.write(HEADER + "\n".join(pileup_rows) + "\n")
    with gzip.open(f_vcf, "wt") as f:
        f.write(HEADER + "\n".join(fa_rows) + "\n")

    ref_out = tmp_path / "ref_merged.vcf"
    _run_ref("MergeVcf.py",
             ["--pileup_vcf_fn", str(p_vcf),
              "--full_alignment_vcf_fn", str(f_vcf),
              "--output_fn", str(ref_out), "--ctgName", "chr1",
              "--platform", "ont", "--qual", "5",
              "--print_ref_calls", "True"])
    our_out = tmp_path / "our_merged.vcf"
    assert _run_ours(["MergeVcf",
                      "--pileup_vcf_fn", str(p_vcf),
                      "--full_alignment_vcf_fn", str(f_vcf),
                      "--output_fn", str(our_out), "--ctgName", "chr1",
                      "--qual", "5", "--print_ref_calls", "True"]) == 0
    ref_body = [l for l in ref_out.read_text().splitlines()
                if l and not l.startswith("#")]
    our_body = [l for l in our_out.read_text().splitlines()
                if l and not l.startswith("#")]
    assert our_body == ref_body


@pytest.mark.skipif(not HAS_REF, reason="no reference tree")
def test_merge_vcf_illumina_compat_matches_reference(tmp_path):
    """--platform ilmn region-scoped merge is row-identical to the reference
    MergeVcf_illumina (MergeVcf.py:59-155): inside each full_aln_regions
    window only FA calls survive (realignment shifts positions there);
    outside, pileup calls survive."""
    import random

    rng = random.Random(1234)
    # region shards the way SelectCandidates writes them for ilmn
    # (SelectCandidates.py:262-269): window = pos//1000*1000 +- padding,
    # emitted as (start-1, end-1) BED rows split over two files
    window_anchors = [2000, 5000, 9000]
    prefix = tmp_path / "candidates"
    prefix.mkdir()
    rows0, rows1 = [], []
    for i, anchor in enumerate(window_anchors):
        start = max(anchor - 33, 1)
        end = anchor + 1000 + 33
        (rows0 if i % 2 == 0 else rows1).append(
            f"chr1\t{max(start - 1, 0)}\t{end - 1}")
    (prefix / "chr1.0_2").write_text("\n".join(rows0) + "\n")
    (prefix / "chr1.1_2").write_text("\n".join(rows1) + "\n")
    # decoy from another contig: must be ignored with --ctgName chr1
    (prefix / "chr2.0_1").write_text("chr2\t0\t100000\n")

    def vcf_row(pos, qual, gt, ref="A", alt="T", tag="P"):
        if gt == "0/0":
            ref, alt = "A", "."
        return (f"chr1\t{pos}\t.\t{ref}\t{alt}\t{qual:.2f}\tPASS\t{tag}\t"
                f"GT:GQ:DP:AD:AF\t{gt}:{int(qual)}:30:15,15:0.5")

    pileup_rows, fa_rows = [], []
    pos = 150
    while pos < 11_000:
        pos += rng.randint(5, 60)
        q = round(rng.uniform(0.5, 30), 2)
        gt = rng.choice(["0/0", "0/1", "1/1"])
        pileup_rows.append(vcf_row(pos, q, gt))
        # FA re-called the window: same sites shifted by realignment
        for anchor in window_anchors:
            if anchor <= pos < anchor + 1000:
                q2 = round(rng.uniform(5, 35), 2)
                fa_rows.append(vcf_row(pos + rng.randint(-3, 3), q2,
                                       rng.choice(["0/1", "1/1"]),
                                       alt="G", tag="F"))
    p_vcf = tmp_path / "pileup.vcf.gz"
    f_vcf = tmp_path / "fa.vcf.gz"
    with gzip.open(p_vcf, "wt") as f:
        f.write(HEADER + "\n".join(pileup_rows) + "\n")
    with gzip.open(f_vcf, "wt") as f:
        f.write(HEADER + "\n".join(fa_rows) + "\n")

    for extra in ([], ["--print_ref_calls", "True"],
                  ["--haploid_sensitive", "True"]):
        ref_out = tmp_path / "ref_merged.vcf"
        _run_ref("MergeVcf.py",
                 ["--pileup_vcf_fn", str(p_vcf),
                  "--full_alignment_vcf_fn", str(f_vcf),
                  "--output_fn", str(ref_out), "--ctgName", "chr1",
                  "--platform", "ilmn", "--qual", "5",
                  "--bed_fn_prefix", str(prefix)] + extra)
        our_out = tmp_path / "our_merged.vcf"
        assert _run_ours(["MergeVcf",
                          "--pileup_vcf_fn", str(p_vcf),
                          "--full_alignment_vcf_fn", str(f_vcf),
                          "--output_fn", str(our_out), "--ctgName", "chr1",
                          "--platform", "ilmn", "--qual", "5",
                          "--bed_fn_prefix", str(prefix)] + extra) == 0
        ref_body = [l for l in ref_out.read_text().splitlines()
                    if l and not l.startswith("#")]
        our_body = [l for l in our_out.read_text().splitlines()
                    if l and not l.startswith("#")]
        assert our_body == ref_body, f"ilmn merge diverged with {extra}"
        # sanity: the merge actually did region routing (some FA rows in,
        # some pileup rows dropped inside windows)
        assert any("\tF\t" in l for l in our_body)
        assert any("\tP\t" in l for l in our_body)


def test_merge_vcf_illumina_multi_contig_no_ctg_name(tmp_path):
    """Without --ctg_name, rows from different contigs at the SAME position
    must both survive the ilmn merge (regression: the output dict was
    keyed by position only), and bookkeeping files in the candidate folder
    (FULL_ALN_FILE_*, not BED) must be ignored."""
    import gzip

    from clair3_tpu.cli import main

    pileup = tmp_path / "pileup.vcf"
    fa = tmp_path / "fa.vcf"
    row = "{}\t{}\t.\tA\tC\t30\tPASS\t{}\tGT:GQ:DP:AF\t0/1:30:20:0.4\n"
    pileup.write_text(row.format("chr1", 15000, "P") +
                      row.format("chr2", 15000, "P"))
    # chr1:15000 falls inside a chr1 FA window; chr2 has no windows
    fa.write_text(row.format("chr1", 15000, "F"))
    cand = tmp_path / "candidates"
    cand.mkdir()
    (cand / "chr1.0_1").write_text("chr1\t14000\t16066\n")
    (cand / "FULL_ALN_FILE_chr1").write_text("chr1.0_1\n")  # not a BED
    out = tmp_path / "merged.vcf.gz"
    rc = main(["merge_vcf", "--pileup_vcf_fn", str(pileup),
               "--full_alignment_vcf_fn", str(fa),
               "--output_fn", str(out), "--platform", "ilmn",
               "--bed_fn_prefix", str(cand)])
    assert rc == 0
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    got = {(l.split("\t")[0], l.split("\t")[7]) for l in body}
    assert got == {("chr1", "F"), ("chr2", "P")}, body


def test_merge_vcf_illumina_no_shards_degrades_to_pileup(tmp_path):
    """Zero candidate shards => empty region tree => pileup rows pass
    through (reference: bed_fn stays None, MergeVcf.py:73-85) instead of
    exiting 1."""
    import gzip

    from clair3_tpu.cli import main

    pileup = tmp_path / "pileup.vcf"
    pileup.write_text(
        "chr3\t500\t.\tG\tT\t25\tPASS\tP\tGT:GQ:DP:AF\t1/1:25:18:0.9\n")
    fa = tmp_path / "fa.vcf"
    fa.write_text("")
    cand = tmp_path / "candidates"
    cand.mkdir()  # empty: quiet contig, nothing routed to FA
    out = tmp_path / "merged.vcf.gz"
    rc = main(["merge_vcf", "--pileup_vcf_fn", str(pileup),
               "--full_alignment_vcf_fn", str(fa),
               "--output_fn", str(out), "--platform", "ilmn",
               "--ctg_name", "chr3", "--bed_fn_prefix", str(cand)])
    assert rc == 0
    body = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert len(body) == 1 and body[0].startswith("chr3\t500")
