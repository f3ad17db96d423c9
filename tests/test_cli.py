"""CLI-level tests driven through clair3_tpu.cli.main."""

import gzip
import os

import pytest

from clair3_tpu.cli import main as cli_main
from clair3_tpu.testing import SimVariant, random_reference, write_test_case


@pytest.fixture(scope="module")
def cli_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    ref = random_reference(2000, seed=71)
    variants = [
        SimVariant(600, ref[600], "C" if ref[600] != "C" else "G", (1, 1)),
        SimVariant(1300, ref[1300], "T" if ref[1300] != "T" else "A", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=2000, variants=variants, coverage=22,
        read_length=600, seed=71, error_rate=0.01)
    return {"dir": str(d), "fasta": fasta, "bam": bam, "variants": variants}


def _body(path):
    return [l for l in gzip.open(path, "rt") if not l.startswith("#")]


def test_cli_call_and_subcommands(cli_case, tmp_path):
    out = str(tmp_path / "out")
    rc = cli_main([
        "call", "--bam_fn", cli_case["bam"], "--ref_fn", cli_case["fasta"],
        "--output", out, "--use_oracle_engines", "--no_phasing_for_fa",
        "--var_pct_full", "1.0", "--ref_pct_full", "1.0",
    ])
    assert rc == 0
    assert len(_body(os.path.join(out, "merge_output.vcf.gz"))) == 2

    # sort_vcf over the outputs
    sorted_fn = str(tmp_path / "sorted.vcf.gz")
    rc = cli_main([
        "sort_vcf", "--input_fn",
        os.path.join(out, "pileup.vcf.gz"),
        os.path.join(out, "full_alignment.vcf.gz"),
        "--output_fn", sorted_fn, "--ref_fn", cli_case["fasta"],
    ])
    assert rc == 0
    rows = _body(sorted_fn)
    positions = [int(r.split("\t")[1]) for r in rows]
    assert positions == sorted(positions)
    assert os.path.exists(sorted_fn + ".tbi")

    # merge_vcf
    merged_fn = str(tmp_path / "merged.vcf.gz")
    rc = cli_main([
        "merge_vcf",
        "--pileup_vcf_fn", os.path.join(out, "pileup.vcf.gz"),
        "--full_alignment_vcf_fn", os.path.join(out, "full_alignment.vcf.gz"),
        "--output_fn", merged_fn, "--ref_fn", cli_case["fasta"],
    ])
    assert rc == 0
    assert len(_body(merged_fn)) == 2


def test_cli_metrics_subcommand(cli_case, tmp_path, capsys):
    out = str(tmp_path / "out")
    cli_main([
        "call", "--bam_fn", cli_case["bam"], "--ref_fn", cli_case["fasta"],
        "--output", out, "--use_oracle_engines", "--pileup_only",
    ])
    truth_fn = str(tmp_path / "truth.vcf")
    from clair3_tpu.io.vcf import VcfWriter, get_header

    with VcfWriter(truth_fn, get_header(reference_file_path=cli_case["fasta"])) as w:
        for v in cli_case["variants"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            w.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t{gt}")
    rc = cli_main([
        "metrics", "--truth_vcf_fn", truth_fn,
        "--query_vcf_fn", os.path.join(out, "merge_output.vcf.gz"),
    ])
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "SNP" in out_text and "F1-score" in out_text
    # both truth variants are SNVs called exactly -> perfect SNP F1
    snp_line = [l for l in out_text.splitlines() if l.startswith("SNP")][0]
    assert "1.0" in snp_line


def test_run_clair3_tpu_shim(cli_case, tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_clair3_tpu", "/root/repo/run_clair3_tpu.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "out")
    monkeypatch.setattr("sys.argv", [
        "run_clair3_tpu.py", "--bam_fn", cli_case["bam"],
        "--ref_fn", cli_case["fasta"], "--output", out,
        "--ctgName", "chr1", "--use_oracle_engines", "--pileup_only",
    ])
    assert mod.main() == 0
    assert os.path.exists(os.path.join(out, "merge_output.vcf.gz"))


@pytest.mark.slow
def test_cli_dwell_autodetect_from_checkpoint(tmp_path):
    """A 9-channel FA checkpoint must auto-enable the dwell channel even
    without --enable_dwell_time (reference: run_clair3.py:414-430 detects
    dwell models by the '*_with_mv' name)."""
    import jax
    import jax.numpy as jnp

    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.models.params_io import save_variables

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    rng = jax.random.PRNGKey(0)
    pv = PileupNet(add_indel_length=True).init(
        rng, jnp.zeros((1, 33, 18), jnp.int32), train=False)
    save_variables(str(model_dir / "pileup.npz"), pv)
    fv = FullAlignmentNet(add_indel_length=True, input_channels=9).init(
        rng, jnp.zeros((1, 55, 33, 9), jnp.int8), train=False)
    save_variables(str(model_dir / "full_alignment.npz"), fv)

    d = tmp_path / "case"
    d.mkdir()
    ref = random_reference(1500, seed=5)
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=1500,
        variants=[SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (1, 1))],
        coverage=15, read_length=500, seed=5, error_rate=0.01,
        with_mv_tags=True)
    out = str(tmp_path / "out")
    # no --enable_dwell_time: channel width must come from the checkpoint
    rc = cli_main([
        "call", "--bam_fn", bam, "--ref_fn", fasta, "--output", out,
        "--model_path", str(model_dir), "--platform", "hifi",
        "--no_phasing_for_fa", "--var_pct_full", "1.0", "--ref_pct_full", "1.0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "merge_output.vcf.gz"))
