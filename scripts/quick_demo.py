#!/usr/bin/env python
"""Quick demo / acceptance run (the reference's docs/quick_demo analog,
self-contained because this image has no genome data):

1. simulate a diploid genome with SNPs + indels and 2% read error,
2. build labeled training bins from the TRAIN region,
3. train a real PileupNet for a few hundred steps,
4. call variants on the held-out EVAL region with the trained model,
5. score SNP/Indel precision/recall/F1 against the simulated truth.

Usage:  python scripts/quick_demo.py [output_dir]
"""

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="c3t_demo_")
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()

    from clair3_tpu.config import CallConfig, TrainConfig
    from clair3_tpu.io.vcf import VcfReader, VcfRecord
    from clair3_tpu.models import PileupNet
    from clair3_tpu.models.params_io import load_variables
    from clair3_tpu.pileup.extractor import create_pileup_tensors
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.pipeline.engine import InferenceEngine
    from clair3_tpu.postprocess import variant_metrics
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case
    from clair3_tpu.train.data import TruthVariant, build_labels, write_bin
    from clair3_tpu.train.trainer import train_model

    L = 260_000
    TRAIN_END = 220_000  # train region; evaluate on the held-out tail
    print(f"[demo] simulating {L/1000:.0f}kb diploid genome -> {out_dir}")
    ref = random_reference(L, seed=7)
    rng = random.Random(7)
    variants = []
    for pos in range(400, L - 400, 130):
        kind = rng.random()
        gt = (1, 1) if rng.random() < 0.5 else (0, 1)
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
        out_dir, ref_length=L, variants=variants, coverage=25,
        read_length=800, seed=7, error_rate=0.02)

    print("[demo] extracting + labeling training tensors")
    tensors, pos_infos, alt_infos, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, TRAIN_END, min_snp_af=0.08, min_indel_af=0.12)
    truths = [TruthVariant("chr1", v.pos + 1, v.ref, v.alt, *sorted(v.genotype))
              for v in variants]
    labels, keep = build_labels(pos_infos, truths, maximum_non_variant_ratio=5.0)
    bin_path = os.path.join(out_dir, "train.bin")
    write_bin(bin_path, tensors[keep], labels[keep],
              [p for p, k in zip(pos_infos, keep) if k],
              [a for a, k in zip(alt_infos, keep) if k])
    print(f"[demo] {int(keep.sum())} training samples")

    print("[demo] training PileupNet")
    cfg = TrainConfig(pileup=True, add_indel_length=False, batch_size=1000,
                      chunk_size_pileup=100, max_epoch=60, seed=0,
                      early_stop_patience=15)
    result = train_model([bin_path], os.path.join(out_dir, "model"), cfg,
                         max_steps=400)
    print(f"[demo] best_val_loss={result['best_val_loss']:.4f}")

    print("[demo] calling the held-out region with the trained model")
    variables = load_variables(result["model_path"])
    engine = InferenceEngine(PileupNet(add_indel_length=False), variables,
                             buckets=(256, 1024))
    eval_bed = os.path.join(out_dir, "eval.bed")
    with open(eval_bed, "w") as fh:
        fh.write(f"chr1\t{TRAIN_END}\t{L}\n")
    call_cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta, bed_fn=eval_bed,
        output_dir=os.path.join(out_dir, "out"), pileup_only=True,
        indel_min_af=0.12, threads=4)
    outputs = VariantCaller(call_cfg, pileup_engine=engine).run()

    truth_recs = [
        VcfRecord("chr1", v.pos + 1, v.ref, v.alt, 60, "PASS", ".", "GT",
                  "1/1" if v.genotype == (1, 1) else "0/1")
        for v in variants if v.pos >= TRAIN_END
    ]
    query_recs = list(VcfReader(outputs["merge_output"]))
    m = variant_metrics(truth_recs, query_recs)
    header = ["VariantType", "FP", "FN", "TP", "Precision", "Recall", "F1-score"]
    print("".join(h.ljust(13) for h in header))
    for vt in ("SNP", "INDEL"):
        r = m[vt]
        print("".join(str(x).ljust(13) for x in (
            vt, r.query_fp, r.truth_fn, r.truth_tp, r.precision, r.recall, r.f1)))
    print(f"[demo] total {time.time() - t_start:.0f}s; outputs in {out_dir}")
    return 0 if m["SNP"].f1 >= 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
