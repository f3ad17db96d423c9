"""External-phaser interop hook (whatshap/longphase subprocess contract).

The reference shells out to whatshap (clair3_c_impl_pipeline.py:427-439) or
longphase (:405-424) for the intermediate phasing stage.  Neither binary
exists in this image, so these tests drive ``ExternalPhaser`` with stub
executables that (a) assert the exact reference CLI contract and (b)
delegate to our ``ReadBackedPhaser`` so output is realistic GT|PS.
"""

import os
import stat
import subprocess
import sys
import textwrap

import pytest

from clair3_tpu.config import CallConfig
from clair3_tpu.io.vcf import VcfReader, VcfRecord
from clair3_tpu.phase import ReadBackedPhaser
from clair3_tpu.phase.external import (
    ExternalPhaser,
    ExternalPhaserError,
    parse_phased_vcf,
)
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _het_record(pos1, ref, alt, qual=30.0):
    return VcfRecord("chr1", pos1, ref, alt, qual, "PASS", "P",
                     "GT:GQ:DP:AD:AF", f"0/1:{int(qual)}:30:15,15:0.5")


@pytest.fixture(scope="module")
def case(tmp_path_factory):
    d = tmp_path_factory.mktemp("extphase")
    ref = random_reference(4000, seed=77)
    het_pos = [500, 900, 1300, 1700, 2100, 2500]
    variants = [
        SimVariant(p, ref[p], "A" if ref[p] != "A" else "T", (0, 1))
        for p in het_pos
    ]
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=4000, variants=variants, coverage=24,
        read_length=900, seed=77, error_rate=0.01)
    return {"fasta": fasta, "bam": bam, "variants": variants}


def _write_stub(path: str, body: str) -> str:
    with open(path, "w") as fh:
        fh.write(f"#!{sys.executable}\n")
        fh.write("import sys\n")
        fh.write(f"sys.path.insert(0, {REPO!r})\n")
        fh.write(textwrap.dedent(body))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


WHATSHAP_STUB = """
# stub whatshap: assert the reference CLI contract
# (clair3_c_impl_pipeline.py:427-439), then really phase with
# ReadBackedPhaser and emit GT|PS rows.
args = sys.argv[1:]
assert args[0] == "phase", args
opts = {}
pos = []
i = 1
while i < len(args):
    a = args[i]
    if a in ("--output", "--reference", "--chromosome"):
        opts[a] = args[i + 1]
        i += 2
    elif a in ("--distrust-genotypes", "--ignore-read-groups"):
        opts[a] = True
        i += 1
    else:
        pos.append(a)
        i += 1
assert opts.get("--distrust-genotypes") and opts.get("--ignore-read-groups")
in_vcf, bam = pos
from clair3_tpu.io.vcf import VcfReader, VcfWriter
from clair3_tpu.phase import ReadBackedPhaser
recs = list(VcfReader(in_vcf))
assert all(r.format == "GT:GQ" for r in recs), "SelectHetSnp contract"
phased = ReadBackedPhaser(bam).phase(opts["--chromosome"], recs)
header = "\\n".join(VcfReader(in_vcf).header_lines)
header = header.replace(
    "#CHROM",
    '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set">\\n#CHROM')
with VcfWriter(opts["--output"], header) as w:
    for r in phased:
        w.write(r)
"""

LONGPHASE_STUB = """
# stub longphase: assert the reference CLI contract
# (clair3_c_impl_pipeline.py:405-424), then really phase.
args = sys.argv[1:]
assert args[0] == "phase", args
opts = {}
flags = set()
i = 1
while i < len(args):
    a = args[i]
    if a in ("-s", "-b", "-r", "-t", "-o"):
        opts[a] = args[i + 1]
        i += 2
    else:
        flags.add(a)
        i += 1
assert "--ont" in flags or "--pb" in flags, flags
from clair3_tpu.io.vcf import VcfReader, VcfWriter
from clair3_tpu.phase import ReadBackedPhaser
recs = list(VcfReader(opts["-s"]))
ctg = recs[0].chrom
phased = ReadBackedPhaser(opts["-b"]).phase(ctg, recs)
header = "\\n".join(VcfReader(opts["-s"]).header_lines)
with VcfWriter(opts["-o"] + ".vcf", header) as w:
    for r in phased:
        w.write(r)
"""


def test_whatshap_contract_and_parse(case, tmp_path):
    stub = _write_stub(str(tmp_path / "whatshap"), WHATSHAP_STUB)
    phaser = ExternalPhaser(
        "whatshap", case["bam"], case["fasta"], platform="ont",
        binary=stub, work_dir=str(tmp_path))
    het = [_het_record(v.pos + 1, v.ref, v.alt) for v in case["variants"]]
    phased = phaser.phase("chr1", het)
    assert len(phased) == len(het)
    assert all(r.format == "GT:PS" for r in phased)
    gts = {r.sample.split(":")[0] for r in phased}
    assert gts <= {"0|1", "1|0"} and len(gts) == 1  # co-phased
    # intermediates live under phase_vcf/ like the reference tmp tree
    assert os.path.exists(os.path.join(str(tmp_path), "phase_vcf", "chr1.vcf"))
    assert os.path.exists(
        os.path.join(str(tmp_path), "phase_vcf", "phased_chr1.vcf.gz"))
    # external output must match the internal phaser on this easy case
    internal = ReadBackedPhaser(case["bam"]).phase("chr1", het)
    assert [(r.pos, r.sample) for r in phased] == \
        [(r.pos, r.sample) for r in internal]


def test_longphase_contract_and_parse(case, tmp_path):
    stub = _write_stub(str(tmp_path / "longphase"), LONGPHASE_STUB)
    phaser = ExternalPhaser(
        "longphase", case["bam"], case["fasta"], platform="ont",
        binary=stub, threads=3, work_dir=str(tmp_path))
    het = [_het_record(v.pos + 1, v.ref, v.alt) for v in case["variants"]]
    phased = phaser.phase("chr1", het)
    assert len(phased) == len(het)
    assert all(r.format == "GT:PS" for r in phased)


def test_missing_binary_raises(case, tmp_path):
    with pytest.raises(ExternalPhaserError, match="not found"):
        ExternalPhaser("whatshap", case["bam"], case["fasta"],
                       binary=str(tmp_path / "nonexistent"),
                       work_dir=str(tmp_path))


def test_unknown_tool_raises(case, tmp_path):
    with pytest.raises(ExternalPhaserError, match="unknown"):
        ExternalPhaser("hapcut2", case["bam"], case["fasta"],
                       work_dir=str(tmp_path))


def test_failing_binary_raises(case, tmp_path):
    stub = _write_stub(str(tmp_path / "whatshap"),
                       "sys.exit('boom: bad input')\n")
    phaser = ExternalPhaser("whatshap", case["bam"], case["fasta"],
                            binary=stub, work_dir=str(tmp_path))
    het = [_het_record(v.pos + 1, v.ref, v.alt) for v in case["variants"]]
    with pytest.raises(ExternalPhaserError, match="boom"):
        phaser.phase("chr1", het)


def test_parse_phased_vcf_filters(tmp_path):
    """Unphased, missing-PS and hom rows are dropped (only rows whose last
    FORMAT field is a phase set feed the FA extractor,
    CreateTensorFullAlignmentFromCffi.py:95-107)."""
    from clair3_tpu.io.vcf import VcfWriter

    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS")
    path = str(tmp_path / "p.vcf")
    rows = [
        "chr1\t100\t.\tA\tC\t30\tPASS\t.\tGT:PS\t0|1:100",   # kept
        "chr1\t200\t.\tG\tT\t30\tPASS\t.\tGT\t0/1",          # unphased
        "chr1\t300\t.\tC\tA\t30\tPASS\t.\tGT:PS\t1|0:100",   # kept
        "chr1\t400\t.\tT\tG\t30\tPASS\t.\tGT:PS\t0|1:.",     # missing PS
        "chr1\t500\t.\tA\tG\t30\tPASS\t.\tGT:PS\t1|1:100",   # hom
    ]
    with VcfWriter(path, header) as w:
        for r in rows:
            w.write(r)
    recs = parse_phased_vcf(path)
    assert [(r.pos, r.sample) for r in recs] == \
        [(100, "0|1:100"), (300, "1|0:100")]


def test_cli_cascade_with_external_whatshap(case, tmp_path):
    """End-to-end `call` with --use_whatshap_for_intermediate_phasing: the
    stub binary is invoked per contig and the cascade completes with phased
    FA haplotagging."""
    from clair3_tpu.cli import main as cli_main

    stub = _write_stub(str(tmp_path / "whatshap"), WHATSHAP_STUB)
    out_dir = str(tmp_path / "out")
    rc = cli_main([
        "call",
        "--bam_fn", case["bam"], "--ref_fn", case["fasta"],
        "--output_dir", out_dir, "--platform", "ont",
        "--use_oracle_engines",
        "--var_pct_full", "1.0", "--ref_pct_full", "1.0",
        "--var_pct_phasing", "0.1",
        "--use_whatshap_for_intermediate_phasing",
        "--whatshap", stub,
    ])
    assert rc == 0
    merged = os.path.join(out_dir, "merge_output.vcf.gz")
    recs = {r.pos: r for r in VcfReader(merged)}
    for v in case["variants"]:
        assert v.pos + 1 in recs
        assert recs[v.pos + 1].genotype in ((0, 1), (1, 0))
    # the stub really ran: its intermediates are in the output tree
    assert os.path.exists(os.path.join(out_dir, "phase_vcf", "chr1.vcf"))


def test_shim_translates_reference_phasing_flags(tmp_path):
    """run_clair3_tpu.py maps the reference bool-valued flags onto our
    store_true spellings and passes binary paths through."""
    import run_clair3_tpu

    captured = {}

    def fake_cli(argv):
        captured["argv"] = argv
        return 0

    old_argv = sys.argv
    old_main = None
    try:
        import clair3_tpu.cli as cli_mod
        old_main = cli_mod.main
        cli_mod.main = fake_cli
        sys.argv = [
            "run_clair3_tpu.py",
            "--bam_fn", "in.bam", "--ref_fn", "ref.fa",
            "--use_longphase_for_intermediate_phasing", "True",
            "--use_whatshap_for_intermediate_phasing", "False",
            "--longphase", "/usr/bin/longphase",
            "--enable_phasing", "True",
        ]
        assert run_clair3_tpu.main() == 0
    finally:
        sys.argv = old_argv
        if old_main is not None:
            cli_mod.main = old_main
    argv = captured["argv"]
    assert "--use_longphase_for_intermediate_phasing" in argv
    assert "--use_whatshap_for_intermediate_phasing" not in argv
    assert "--use_phasing_for_final_output" in argv
    i = argv.index("--longphase")
    assert argv[i + 1] == "/usr/bin/longphase"
