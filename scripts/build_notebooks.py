#!/usr/bin/env python
"""Generate + execute the colab/ quick-demo notebooks (the reference's
colab/clair3_{ont,pacbio_hifi,illumina}_quick_demo.ipynb analogs).

The reference notebooks download an HG003 chr20 slice and score against
GIAB truth with hap.py; this image has no genome data or network, so the
notebooks are self-contained: they simulate platform-shaped reads with the
built-in simulator, run the real `python -m clair3_tpu call` cascade, and
pin an acceptance table (precision/recall/F1) the same way the reference
pins its hap.py tables (reference: docs/quick_demo/ont_quick_demo.md:95-99).

Usage: python scripts/build_notebooks.py [--no-exec]
"""

import os
import sys

import nbformat
from nbformat.v4 import new_code_cell, new_markdown_cell, new_notebook

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PLATFORMS = {
    "ont": dict(
        title="Clair3-TPU ONT quick demo",
        nb_name="clair3_tpu_ont_quick_demo.ipynb",
        ref_nb="colab/clair3_ont_quick_demo.ipynb",
        read_length=3000, coverage=40, error=0.04, length=120_000,
        extra_flags="", snp_f1=0.99, indel_f1=0.95,
        blurb=(
            "Oxford Nanopore long reads: 3 kb reads at 40x with 4% base "
            "error. The cascade phases het SNPs with the built-in phaser "
            "and haplotags reads inside the native full-alignment "
            "extractor (the reference does this in C: "
            "`src/clair3_full_alignment_dwell.c:315-422`). For r10 dwell "
            "models add `--enable_dwell_time` (reads must carry `mv:B:c` "
            "tags)."),
    ),
    "hifi": dict(
        title="Clair3-TPU PacBio HiFi quick demo",
        nb_name="clair3_tpu_pacbio_hifi_quick_demo.ipynb",
        ref_nb="colab/clair3_pacbio_hifi_quick_demo.ipynb",
        read_length=8000, coverage=25, error=0.01, length=100_000,
        extra_flags="", snp_f1=0.99, indel_f1=0.99,
        blurb=(
            "PacBio HiFi: 8 kb reads at 25x with 1% base error. HiFi uses "
            "the 55-deep full-alignment matrix and platform AF presets "
            "(reference: `shared/param_f.py:11`, `run_clair3.py:304-326`)."),
    ),
    "ilmn": dict(
        title="Clair3-TPU Illumina quick demo",
        nb_name="clair3_tpu_illumina_quick_demo.ipynb",
        ref_nb="colab/clair3_illumina_quick_demo.ipynb",
        read_length=150, coverage=40, error=0.002, length=60_000,
        extra_flags="--no_phasing_for_fa", snp_f1=0.99, indel_f1=0.90,
        blurb=(
            "Illumina short reads: 150 bp reads at 40x. `--platform ilmn` "
            "automatically realigns reads around indels with the native "
            "de-Bruijn-consensus + affine-gap realigner before BOTH stages "
            "and uses the region-scoped FA-wins merge (reference: "
            "`preprocess/RealignReads.py`, `preprocess/MergeVcf.py:59-155`)."),
    ),
}

SETUP_SRC = '''\
import os, sys, subprocess, tempfile
REPO = {repo!r}
sys.path.insert(0, REPO)
work = tempfile.mkdtemp(prefix="c3t_{plat}_demo_")
print("work dir:", work)'''

SIM_SRC = '''\
# Simulate a diploid sample with platform-shaped reads (no genome data /
# network in this environment; with real data, point --bam_fn/--ref_fn at
# an indexed BAM + FASTA instead and score with hap.py).
import random
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

L = {length}
ref = random_reference(L, seed=11)
rng = random.Random(11)
variants = []
for pos in range(500, L - 500, 160):
    gt = (1, 1) if rng.random() < 0.5 else (0, 1)
    kind = rng.random()
    if kind < 0.7:  # SNP
        alt = rng.choice([b for b in "ACGT" if b != ref[pos]])
        variants.append(SimVariant(pos, ref[pos], alt, gt))
    elif kind < 0.85:  # insertion
        ins = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 3)))
        variants.append(SimVariant(pos, ref[pos], ref[pos] + ins, gt))
    else:  # deletion
        dlen = rng.randint(1, 3)
        variants.append(SimVariant(pos, ref[pos:pos + dlen + 1], ref[pos], gt))

fasta, bam, _, _ = write_test_case(
    work, ref_length=L, variants=variants, coverage={coverage},
    read_length={read_length}, seed=11, error_rate={error})
print(f"{{len(variants)}} simulated variants, "
      f"{{os.path.getsize(bam)/1e6:.1f}} MB BAM")'''

CALL_SRC = '''\
# Run the full two-stage cascade through the production CLI.
# --use_oracle_engines substitutes alt-info-driven oracle networks so the
# demo runs in seconds without model files; drop it and pass
# --model_path DIR (pileup.{{npz,pt}} + full_alignment.{{npz,pt}}) to use
# trained or converted reference checkpoints (see docs/calling.md).
out = os.path.join(work, "out")
cmd = [sys.executable, "-m", "clair3_tpu", "call",
       "--bam_fn", bam, "--ref_fn", fasta, "--output", out,
       "--platform", {plat!r}, "--use_oracle_engines",
       "--var_pct_full", "1.0", "--ref_pct_full", "1.0",
       "--threads", "2"] + {extra_flags!r}.split()
env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
res = subprocess.run(cmd, env=env, capture_output=True, text=True)
print(res.stdout[-2000:])
assert res.returncode == 0, res.stderr[-2000:]'''

SCORE_SRC = '''\
# Score the merged VCF against the simulated truth -- the acceptance table
# (the reference pins hap.py tables the same way:
# docs/quick_demo/ont_quick_demo.md:95-99).
from clair3_tpu.io.vcf import VcfReader, VcfRecord
from clair3_tpu.postprocess import variant_metrics

truth = [VcfRecord("chr1", v.pos + 1, v.ref, v.alt, 60, "PASS", ".", "GT",
                   "1/1" if v.genotype == (1, 1) else "0/1")
         for v in variants]
query = list(VcfReader(os.path.join(out, "merge_output.vcf.gz")))
m = variant_metrics(truth, query)

header = ["VariantType", "FP", "FN", "TP", "Precision", "Recall", "F1-score"]
print("".join(h.ljust(13) for h in header))
for vt in ("SNP", "INDEL"):
    r = m[vt]
    print("".join(str(x).ljust(13) for x in (
        vt, r.query_fp, r.truth_fn, r.truth_tp,
        round(r.precision, 4), round(r.recall, 4), round(r.f1, 4))))

assert m["SNP"].f1 >= {snp_f1}, f"SNP F1 regression: {{m['SNP'].f1}}"
assert m["INDEL"].f1 >= {indel_f1}, f"INDEL F1 regression: {{m['INDEL'].f1}}"
print("\\nacceptance: PASS")'''

TAIL_MD = """\
### Going further

* **Train both networks from scratch and call with them** (the full
  acceptance run with pinned F1 gates):
  `python scripts/full_cascade_demo.py /tmp/demo` — trains a real
  PileupNet + FullAlignmentNet on a training slice and enforces held-out
  SNP F1 >= 0.995 / INDEL F1 >= 0.99.
* **gVCF output**: add `--gvcf` to the call command above.
* **Reference checkpoints**: convert a Clair3 `.pt` model dir with
  `python -m clair3_tpu convert --pt_fn pileup.pt --output pileup.npz`
  and pass `--model_path`.
* **Scaling**: `python scripts/wgs_scale_demo.py --mbases 50 --contigs 3
  --output /tmp/soak` runs the 50 Mb soak (about a minute)."""


def build(plat: str, spec: dict, execute: bool) -> str:
    nb = new_notebook(metadata={
        "kernelspec": {"display_name": "Python 3", "language": "python",
                       "name": "python3"},
        "language_info": {"name": "python"},
    })
    nb.cells = [
        new_markdown_cell(
            f"# {spec['title']}\n\n"
            f"TPU-native rebuild of Clair3's quick demo (reference analog: "
            f"`{spec['ref_nb']}`). {spec['blurb']}\n\n"
            "The pipeline is the real production path: native pileup "
            "feature extraction, candidate selection, phasing + "
            "haplotype-aware full-alignment re-calling, merge, and an "
            "indexed VCF."),
        new_code_cell(SETUP_SRC.format(repo=REPO, plat=plat)),
        new_code_cell(SIM_SRC.format(**spec)),
        new_code_cell(CALL_SRC.format(plat=plat, **spec)),
        new_code_cell(SCORE_SRC.format(**spec)),
        new_markdown_cell(TAIL_MD),
    ]
    if execute:
        from nbclient import NotebookClient
        NotebookClient(nb, timeout=900, kernel_name="python3").execute()
    out_path = os.path.join(REPO, "colab", spec["nb_name"])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # strip the machine-specific mkdtemp suffix from cell outputs so
    # regenerating the notebooks does not churn the committed artifacts
    import re

    def scrub(text: str) -> str:
        return re.sub(r"(/tmp/c3t_[a-z0-9]+_demo)_\w+", r"\1", text)

    for cell in nb.cells:
        for out in cell.get("outputs", []) or []:
            if "text" in out:
                out["text"] = scrub(out["text"])
            for k, v in list(out.get("data", {}).items()):
                if isinstance(v, str):
                    out["data"][k] = scrub(v)
    nbformat.write(nb, out_path)
    return out_path


def main() -> int:
    execute = "--no-exec" not in sys.argv
    plats = [p for p in sys.argv[1:] if p in PLATFORMS] or list(PLATFORMS)
    for plat in plats:
        path = build(plat, PLATFORMS[plat], execute)
        print(f"[notebooks] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
