#!/usr/bin/env python
"""Full-cascade acceptance run: train BOTH networks from scratch on
simulated data, then run the complete two-stage pipeline — pileup calling,
QUAL-quantile routing, internal read-backed phasing, in-extractor
haplotagging, full-alignment re-calling, merge — on a held-out region and
score genotype-exact SNP/Indel F1.

Usage:  python scripts/full_cascade_demo.py [output_dir]
"""

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Per-platform simulation + geometry (reference: run_clair3.py:304-326 AF
# defaults; shared/param_f.py:11 matrix_depth; the ONT flagship adds the
# Dorado mv:B:c dwell channel, docs/quick_demo/ont_mv_quick_demo.md).
PLATFORMS = {
    "hifi": dict(coverage=25, read_length=900, error_rate=0.02,
                 with_mv_tags=False, matrix_depth=55, channels=8,
                 snp_min_af=0.08, indel_min_af=0.12,
                 var_pct_full=0.3, ref_pct_full=0.3),
    "ont": dict(coverage=45, read_length=1200, error_rate=0.04,
                with_mv_tags=True, matrix_depth=89, channels=9,
                snp_min_af=0.08, indel_min_af=0.15,
                var_pct_full=0.7, ref_pct_full=0.1),
}


def simulate(out_dir, L, seed=7, step=130, platform="hifi"):
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    P = PLATFORMS[platform]
    ref = random_reference(L, seed=seed)
    rng = random.Random(seed)
    variants = []
    for pos in range(400, L - 400, step):
        kind = rng.random()
        gt = (1, 1) if rng.random() < 0.5 else ((0, 1) if rng.random() < 0.5 else (1, 0))
        if kind < 0.7:
            alt = rng.choice([b for b in "ACGT" if b != ref[pos]])
            variants.append(SimVariant(pos, ref[pos], alt, gt))
        elif kind < 0.85:
            ins = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 3)))
            variants.append(SimVariant(pos, ref[pos], ref[pos] + ins, gt))
        else:
            dlen = rng.randint(1, 3)
            variants.append(SimVariant(pos, ref[pos:pos + dlen + 1], ref[pos], gt))
    fasta, bam, _, _ = write_test_case(
        out_dir, ref_length=L, variants=variants, coverage=P["coverage"],
        read_length=P["read_length"], seed=seed, error_rate=P["error_rate"],
        with_mv_tags=P["with_mv_tags"])
    return fasta, bam, ref, variants


def run(out_dir, platform=None):
    """Train both nets + call + score; returns a dict with the metrics and
    trained-checkpoint paths (consumed by scripts/train_fixture_checkpoints.py)."""
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()

    from clair3_tpu.config import CallConfig, TrainConfig
    from clair3_tpu.fullalign.extractor import PhasedVariant, create_fa_tensors
    from clair3_tpu.io.vcf import VcfReader, VcfRecord
    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.models.params_io import load_variables
    from clair3_tpu.phase import ReadBackedPhaser
    from clair3_tpu.pileup.extractor import create_pileup_tensors
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.pipeline.engine import InferenceEngine
    from clair3_tpu.postprocess import variant_metrics
    from clair3_tpu.train.data import TruthVariant, build_labels, write_bin
    from clair3_tpu.train.trainer import train_model

    platform = platform or os.environ.get("C3T_DEMO_PLATFORM", "hifi")
    P = PLATFORMS[platform]
    dwell = P["channels"] == 9
    # scale knobs (env): larger runs give stronger accuracy evidence
    L = int(os.environ.get("C3T_DEMO_L", 260_000))
    TRAIN_END = int(os.environ.get("C3T_DEMO_TRAIN_END", L - 40_000))
    STEPS_P = int(os.environ.get("C3T_DEMO_STEPS_P", 400))
    STEPS_F = int(os.environ.get("C3T_DEMO_STEPS_F", 300))
    BATCH_P = int(os.environ.get("C3T_DEMO_BATCH_P", 1000))
    BATCH_F = int(os.environ.get("C3T_DEMO_BATCH_F", 500))
    # default: evaluate the held-out tail [TRAIN_END, L).  CI-scale runs
    # (tests/test_accuracy_gate.py) instead set EVAL_START inside the
    # training region: in-sample scoring needs far less training data to
    # reach tight gates and still trips on any train->call regression
    EVAL_START = int(os.environ.get("C3T_DEMO_EVAL_START", TRAIN_END))
    print(f"[full] simulating {L // 1000}kb diploid genome "
          f"({platform} geometry) -> {out_dir}")
    fasta, bam, ref, variants = simulate(out_dir, L, platform=platform)
    truths = [TruthVariant("chr1", v.pos + 1, v.ref, v.alt, *sorted(v.genotype))
              for v in variants]

    # ---- stage 1 training data: pileup tensors ----
    print("[full] pileup tensors + labels")
    p_tensors, p_pos, p_alt, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, TRAIN_END, min_snp_af=P["snp_min_af"],
        min_indel_af=P["indel_min_af"])
    labels, keep = build_labels(p_pos, truths, maximum_non_variant_ratio=5.0)
    p_bin = os.path.join(out_dir, "pileup.bin")
    write_bin(p_bin, p_tensors[keep], labels[keep],
              [x for x, k in zip(p_pos, keep) if k],
              [x for x, k in zip(p_alt, keep) if k])

    print("[full] training PileupNet")
    p_cfg = TrainConfig(pileup=True, add_indel_length=False, batch_size=BATCH_P,
                        chunk_size_pileup=100, max_epoch=60, seed=0,
                        early_stop_patience=15)
    p_result = train_model([p_bin], os.path.join(out_dir, "pileup_model"),
                           p_cfg, max_steps=STEPS_P)
    print(f"[full] pileup best_val_loss={p_result['best_val_loss']:.4f}")

    # ---- stage 2 training data: FA tensors with haplotagging ----
    print("[full] full-alignment tensors (haplotagged) + labels")
    # phased het SNPs from the simulation truth: haplotype 0 carries the alt
    # for gt (1,0) -> extractor genotype code 2; gt (0,1) -> code 1
    phased = [
        (v.pos + 1, f"{v.ref}-{v.alt}-{1 if v.genotype == (0, 1) else 2}-1")
        for v in variants
        if len(v.ref) == 1 and len(v.alt) == 1 and v.genotype in ((0, 1), (1, 0))
    ]
    cand_positions = [int(p.split(":")[-2]) for p in p_pos]
    f_tensors, f_pos, f_alt = create_fa_tensors(
        bam, fasta, "chr1", cand_positions, phased_snps=phased,
        matrix_depth=P["matrix_depth"], no_phasing=False, enable_dwell=dwell)
    f_labels, f_keep = build_labels(
        f_pos, truths,
        maximum_non_variant_ratio=float(os.environ.get("C3T_DEMO_FA_NVR", 1.0)))
    f_bin = os.path.join(out_dir, "fa.bin")
    write_bin(f_bin, f_tensors[f_keep], f_labels[f_keep],
              [x for x, k in zip(f_pos, f_keep) if k],
              [x for x, k in zip(f_alt, f_keep) if k])

    print("[full] training FullAlignmentNet")
    f_cfg = TrainConfig(pileup=False, add_indel_length=True, batch_size=BATCH_F,
                        chunk_size_fa=100, max_epoch=60, seed=0,
                        early_stop_patience=15)
    f_result = train_model([f_bin], os.path.join(out_dir, "fa_model"),
                           f_cfg, max_steps=STEPS_F)
    print(f"[full] FA best_val_loss={f_result['best_val_loss']:.4f}")

    # ---- full cascade on the held-out region ----
    print("[full] running the two-stage cascade on the held-out region")
    p_engine = InferenceEngine(
        PileupNet(add_indel_length=False),
        load_variables(p_result["model_path"]), buckets=(256, 1024))
    f_engine = InferenceEngine(
        FullAlignmentNet(add_indel_length=True, input_channels=P["channels"]),
        load_variables(f_result["model_path"]), buckets=(256, 1024))
    eval_bed = os.path.join(out_dir, "eval.bed")
    with open(eval_bed, "w") as fh:
        fh.write(f"chr1\t{EVAL_START}\t{L}\n")
    call_cfg = CallConfig(
        platform=platform,  # sets matrix_depth to match the trained FA net
        bam_fn=bam, ref_fn=fasta, bed_fn=eval_bed,
        output_dir=os.path.join(out_dir, "out"),
        snp_min_af=P["snp_min_af"], indel_min_af=P["indel_min_af"], threads=4,
        var_pct_full=P["var_pct_full"], ref_pct_full=P["ref_pct_full"],
        enable_dwell_time=dwell,
    )
    caller = VariantCaller(call_cfg, pileup_engine=p_engine, fa_engine=f_engine,
                           phaser=ReadBackedPhaser(bam))
    outputs = caller.run()
    fa_calls = sum(1 for _ in VcfReader(outputs["full_alignment"]))
    print(f"[full] full-alignment stage re-called {fa_calls} candidates")

    truth_recs = [
        VcfRecord("chr1", v.pos + 1, v.ref, v.alt, 60, "PASS", ".", "GT",
                  "1/1" if v.genotype == (1, 1) else "0/1")
        for v in variants if v.pos >= EVAL_START
    ]
    # PASS-only scoring, like hap.py's PASS rows (the reference's demo
    # tables): LowQual-marked calls are what a user filters out
    query_recs = [r for r in VcfReader(outputs["merge_output"])
                  if r.filter in ("PASS", ".")]
    m = variant_metrics(truth_recs, query_recs)
    header = ["VariantType", "FP", "FN", "TP", "Precision", "Recall", "F1-score"]
    print("".join(h.ljust(13) for h in header))
    for vt in ("SNP", "INDEL"):
        r = m[vt]
        print("".join(str(x).ljust(13) for x in (
            vt, r.query_fp, r.truth_fn, r.truth_tp, r.precision, r.recall, r.f1)))
    print(f"[full] total {time.time() - t_start:.0f}s; outputs in {out_dir}")
    # acceptance gates (the reference pins demo hap.py tables the same way,
    # docs/quick_demo/ont_quick_demo.md:95-99); scale-keyed defaults —
    # accuracy scales with training data (observed: 260 kb -> ~0.99/0.977,
    # >=1 Mb -> >=0.995/0.99) — and env-overridable for scaled-down runs
    full_scale = L >= 1_000_000
    # ONT gates sit below hifi (4% simulated error vs 2%), mirroring the
    # reference's own demo tables (ONT indel F1 0.833 vs HiFi 1.0,
    # ont_quick_demo.md:95-99 / pacbio_hifi_quick_demo.md:94-99)
    if platform == "ont":
        default_snp, default_indel = ((0.995, 0.97) if full_scale
                                      else (0.985, 0.95))
    else:
        default_snp, default_indel = ((0.995, 0.99) if full_scale
                                      else (0.985, 0.97))
    gate_snp = float(os.environ.get("C3T_GATE_SNP", default_snp))
    gate_indel = float(os.environ.get("C3T_GATE_INDEL", default_indel))
    if "C3T_GATE_SNP" in os.environ or "C3T_GATE_INDEL" in os.environ:
        print("=" * 70)
        print(f"[full] WARNING: ACCEPTANCE GATES OVERRIDDEN BY ENV "
              f"(C3T_GATE_SNP={os.environ.get('C3T_GATE_SNP', '-')}, "
              f"C3T_GATE_INDEL={os.environ.get('C3T_GATE_INDEL', '-')}). "
              f"This run does NOT certify the default gates "
              f"({default_snp}/{default_indel} at this scale).")
        print("=" * 70)
    ok = m["SNP"].f1 >= gate_snp and m["INDEL"].f1 >= gate_indel
    if not ok:
        print(f"[full] FAIL: SNP F1 {m['SNP'].f1} (gate {gate_snp}), "
              f"INDEL F1 {m['INDEL'].f1} (gate {gate_indel})")
    return {
        "ok": ok,
        "platform": platform,
        "snp_f1": m["SNP"].f1,
        "indel_f1": m["INDEL"].f1,
        "gates": (gate_snp, gate_indel),
        "scale_bp": L,
        "pileup_model": p_result["model_path"],
        "fa_model": f_result["model_path"],
    }


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="c3t_full_")
    platform = sys.argv[2] if len(sys.argv) > 2 else None  # or C3T_DEMO_PLATFORM
    return 0 if run(out_dir, platform=platform)["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
