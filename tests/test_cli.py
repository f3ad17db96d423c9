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


def test_fast_mode_clamps_af_and_coverage():
    """--fast_mode (ONT only) raises the SNP AF floor to 0.15 and
    min_coverage to 4 (reference: CreateTensorPileupFromCffi.py:276-278)."""
    from clair3_tpu.config import CallConfig

    cfg = CallConfig(platform="ont", fast_mode=True, snp_min_af=0.08).resolved()
    assert cfg.snp_min_af == 0.15
    assert cfg.min_coverage == 4
    # no clamp off-ONT
    cfg = CallConfig(platform="hifi", fast_mode=True).resolved()
    assert cfg.min_coverage == 2
    # genotyping mode zeroes AF first, but fast_mode still clamps on top
    cfg = CallConfig(platform="ont", fast_mode=False, snp_min_af=0.08).resolved()
    assert cfg.snp_min_af == 0.08 and cfg.min_coverage == 2


def test_include_all_ctgs_gate(tmp_path):
    """Non-major contig names are skipped by default and called with
    --include_all_ctgs (reference: CheckEnvs.py:288-292)."""
    d = tmp_path / "case"
    d.mkdir()
    ref = random_reference(1500, seed=9)
    v = SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (1, 1))
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=1500, variants=[v], coverage=20,
        read_length=500, seed=9, error_rate=0.0, contig="scaffold_1")
    base = ["--bam_fn", bam, "--ref_fn", fasta, "--use_oracle_engines",
            "--pileup_only"]
    out1 = str(tmp_path / "out1")
    assert cli_main(["call", "--output", out1] + base) == 0
    assert _body(os.path.join(out1, "merge_output.vcf.gz")) == []

    out2 = str(tmp_path / "out2")
    assert cli_main(["call", "--output", out2, "--include_all_ctgs"] + base) == 0
    assert len(_body(os.path.join(out2, "merge_output.vcf.gz"))) == 1

    # an explicit --ctg_name restriction also bypasses the major-only filter
    out3 = str(tmp_path / "out3")
    assert cli_main(["call", "--output", out3, "--ctg_name", "scaffold_1"] + base) == 0
    assert len(_body(os.path.join(out3, "merge_output.vcf.gz"))) == 1


def test_gvcf_header_contig_modes(tmp_path):
    """Default gVCF headers list called contigs only;
    --output_all_contigs_in_gvcf_header lists every reference contig
    (reference: SortVcf.py:276,346)."""
    from clair3_tpu.io.bam import write_bam
    from clair3_tpu.io.fasta import write_fasta
    from clair3_tpu.testing import simulate_reads

    refs = {"chr1": random_reference(1500, seed=3),
            "chr2": random_reference(1200, seed=4)}
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, refs)
    reads = simulate_reads(refs["chr1"], [], coverage=12, read_length=500, seed=3)
    bam = str(tmp_path / "r.bam")
    write_bam(bam, ["chr1"], [1500], reads)  # BAM knows chr1 only

    def header_contigs(path):
        return [l.split("ID=")[1].split(",")[0]
                for l in gzip.open(path, "rt")
                if l.startswith("##contig")]

    base = ["--bam_fn", bam, "--ref_fn", fasta, "--use_oracle_engines",
            "--pileup_only", "--gvcf"]
    out1 = str(tmp_path / "out1")
    assert cli_main(["call", "--output", out1] + base) == 0
    assert header_contigs(os.path.join(out1, "merge_output.gvcf.gz")) == ["chr1"]

    out2 = str(tmp_path / "out2")
    assert cli_main(
        ["call", "--output", out2, "--output_all_contigs_in_gvcf_header"] + base) == 0
    assert header_contigs(
        os.path.join(out2, "merge_output.gvcf.gz")) == ["chr1", "chr2"]


def test_remove_intermediate_dir(cli_case, tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "tmp"))
    with open(os.path.join(out, "tmp", "scratch.bin"), "w") as fh:
        fh.write("x")
    rc = cli_main([
        "call", "--bam_fn", cli_case["bam"], "--ref_fn", cli_case["fasta"],
        "--output", out, "--use_oracle_engines", "--pileup_only",
        "--remove_intermediate_dir",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "merge_output.vcf.gz"))
    assert not os.path.exists(os.path.join(out, "tmp"))


def test_disable_c_impl_kill_switch(monkeypatch):
    from clair3_tpu.native import native_available

    monkeypatch.setenv("CLAIR3T_DISABLE_NATIVE", "1")
    assert native_available() is False
    monkeypatch.delenv("CLAIR3T_DISABLE_NATIVE")


def test_split_bam_by_haplotype_and_haploid_call(tmp_path):
    """The split-into-haplotypes workflow (reference:
    docs/split_haplotype_into_haploid_calling.md): split a HP-tagged BAM,
    then call one haplotype in haploid mode."""
    d = tmp_path / "case"
    d.mkdir()
    ref = random_reference(1500, seed=13)
    v = SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (0, 1))
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=1500, variants=[v], coverage=24,
        read_length=500, seed=13, error_rate=0.0, with_hp_tags=True)
    out = str(tmp_path / "split")
    assert cli_main(["split_bam", "--bam_fn", bam, "--output_dir", out]) == 0
    from clair3_tpu.io.bam import BamReader

    h1 = list(BamReader(os.path.join(out, "hap1.bam")))
    h2 = list(BamReader(os.path.join(out, "hap2.bam")))
    assert h1 and h2
    assert all(r.tags.get("HP") == 1 for r in h1)
    assert all(r.tags.get("HP") == 2 for r in h2)

    # het variant (0, 1): hap index 1 carries the alt allele
    call_out = str(tmp_path / "hap2_call")
    rc = cli_main([
        "call", "--bam_fn", os.path.join(out, "hap2.bam"),
        "--ref_fn", fasta, "--output", call_out, "--use_oracle_engines",
        "--pileup_only", "--haploid_precise",
    ])
    assert rc == 0
    rows = _body(os.path.join(call_out, "merge_output.vcf.gz"))
    assert len(rows) == 1
    assert rows[0].split("\t")[9].split(":")[0] in ("1", "1/1")


def test_dump_tensors_fixture_format(cli_case, tmp_path):
    """dump_tensors writes the reference's .npy + .info fixture contract
    (CreateTensorPileupFromCffi.py:443-452) for pileup and FA tensors."""
    import numpy as np

    prefix = str(tmp_path / "p_chr1")
    rc = cli_main([
        "dump_tensors", "--bam_fn", cli_case["bam"],
        "--ref_fn", cli_case["fasta"], "--ctg_name", "chr1",
        "--tensor_fn", prefix,
    ])
    assert rc == 0
    t = np.load(prefix + ".npy")
    info = [l.split("\t") for l in open(prefix + ".npy.info")]
    assert t.shape[0] == len(info) >= 2
    assert t.shape[1:] == (33, 18)
    positions = [int(r[0].split(":")[1]) for r in info]
    assert 601 in positions and 1301 in positions

    cands = tmp_path / "cands.txt"
    cands.write_text("".join(f"{p}\n" for p in positions))
    fprefix = str(tmp_path / "f_chr1")
    rc = cli_main([
        "dump_tensors", "--bam_fn", cli_case["bam"],
        "--ref_fn", cli_case["fasta"], "--ctg_name", "chr1",
        "--tensor_fn", fprefix, "--full_alignment",
        "--candidates_fn", str(cands), "--platform", "hifi",
    ])
    assert rc == 0
    ft = np.load(fprefix + ".npy")
    assert ft.shape[1:] == (55, 33, 8)
    assert ft.dtype == np.int8


def test_compilation_cache_round_trip(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at an on-disk cache; a jit
    compile then materializes cache entries a later process can reuse
    (the CLI's per-process startup win; verified live through the axon
    TPU backend as well)."""
    from clair3_tpu.utils.common import enable_compilation_cache

    cache = tmp_path / "xla"
    monkeypatch.setenv("CLAIR3T_COMPILE_CACHE", str(cache))
    assert enable_compilation_cache() == str(cache)

    import jax
    import jax.numpy as jnp

    try:
        # a shape no other test compiles, so the write is attributable
        jax.jit(lambda x: (x * 3 + 1).sum())(jnp.ones((17, 13)))
        assert any(cache.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()

    monkeypatch.setenv("CLAIR3T_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is None
