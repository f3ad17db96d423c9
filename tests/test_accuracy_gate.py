"""Asserted accuracy gates (VERDICT r02 #7): cascade F1 is a TEST
THRESHOLD, not prose.

CI tier (this file, CPU): train a real PileupNet from scratch, then run
the COMPLETE two-stage cascade — QUAL-quantile routing, read-backed
phasing, in-extractor haplotagging, full-alignment re-call, merge — with
the FA oracle engine standing in for a trained FA net, and assert
genotype-exact PASS-row F1.  Any regression in extraction, labeling,
training, routing, phasing, haplotagging, FA tensor construction, decode,
or merge trips these gates.  (A trained FA net is deliberately NOT in
this tier: the conv net needs far more optimization steps than one host
core can run in CI time — three calibration runs plateaued at SNP F1
~0.46 from FA undertraining alone.)

Full tier (TPU, per round): scripts/full_cascade_demo.py trains BOTH nets
and exits nonzero below scale-keyed held-out gates — SNP F1 0.995 /
INDEL 0.99 at >=1 Mb, 0.985 / 0.97 at the 260 kb default (accuracy
scales with training data; docs/calling.md records each round's table).
A third tier (tests/test_trained_fixture_cascade.py) calls with BOTH
committed TPU-trained checkpoints and hard gates pinned to the measured
cross-genome F1, so a trained-FA-path regression trips in CI, not only
in the per-round TPU demo.
"""

import numpy as np
import pytest

from clair3_tpu.config import CallConfig, TrainConfig
from clair3_tpu.io.vcf import VcfReader, VcfRecord
from clair3_tpu.models import PileupNet
from clair3_tpu.models.params_io import load_variables
from clair3_tpu.phase import ReadBackedPhaser
from clair3_tpu.pileup.extractor import create_pileup_tensors
from clair3_tpu.pipeline.call import VariantCaller
from clair3_tpu.pipeline.engine import InferenceEngine
from clair3_tpu.postprocess import variant_metrics
from clair3_tpu.testing import FullAlignmentOracleEngine
from clair3_tpu.train.data import TruthVariant, build_labels, write_bin
from clair3_tpu.train.trainer import train_model

GATE_SNP_F1 = 0.90
GATE_INDEL_F1 = 0.80


@pytest.mark.slow
def test_trained_cascade_clears_accuracy_gate(tmp_path):
    from tests.test_training import _spread_variants
    from clair3_tpu.testing import random_reference, write_test_case

    L = 40_000
    ref = random_reference(L, seed=27)
    variants = _spread_variants(ref, 400, L - 400, 130, seed=27)
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=25,
        read_length=900, seed=27, error_rate=0.02)
    truths = [TruthVariant("chr1", v.pos + 1, v.ref, v.alt, *sorted(v.genotype))
              for v in variants]

    tensors, pos_infos, alt_infos, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, L, min_snp_af=0.08, min_indel_af=0.12)
    labels, keep = build_labels(pos_infos, truths, maximum_non_variant_ratio=5.0)
    bin_fn = str(tmp_path / "pileup.bin")
    write_bin(bin_fn, tensors[keep], labels[keep],
              [p for p, k in zip(pos_infos, keep) if k],
              [a for a, k in zip(alt_infos, keep) if k])

    cfg = TrainConfig(pileup=True, add_indel_length=False, batch_size=250,
                      chunk_size_pileup=50, max_epoch=60, seed=0,
                      early_stop_patience=15)
    result = train_model([bin_fn], str(tmp_path / "model"), cfg, max_steps=150)
    assert result["best_val_loss"] < 0.6, result["best_val_loss"]

    engine = InferenceEngine(PileupNet(add_indel_length=False),
                             load_variables(result["model_path"]),
                             buckets=(256, 1024))
    call_cfg = CallConfig(
        platform="hifi", bam_fn=bam, ref_fn=fasta,
        output_dir=str(tmp_path / "out"), threads=2, indel_min_af=0.12,
        var_pct_full=0.3, ref_pct_full=0.3)
    caller = VariantCaller(call_cfg, pileup_engine=engine,
                           fa_engine=FullAlignmentOracleEngine(),
                           phaser=ReadBackedPhaser(bam))
    outputs = caller.run()
    fa_rows = sum(1 for _ in VcfReader(outputs["full_alignment"]))
    assert fa_rows > 10, "FA stage never engaged; routing broken"

    truth_recs = [
        VcfRecord("chr1", v.pos + 1, v.ref, v.alt, 60, "PASS", ".", "GT",
                  "1/1" if tuple(sorted(v.genotype)) == (1, 1) else "0/1")
        for v in variants
    ]
    query = [r for r in VcfReader(outputs["merge_output"])
             if r.filter in ("PASS", ".")]
    m = variant_metrics(truth_recs, query)
    print(f"[gate] SNP F1 {m['SNP'].f1} (P {m['SNP'].precision} "
          f"R {m['SNP'].recall}); INDEL F1 {m['INDEL'].f1} "
          f"(P {m['INDEL'].precision} R {m['INDEL'].recall})")
    assert m["SNP"].f1 >= GATE_SNP_F1, m["SNP"]
    assert m["INDEL"].f1 >= GATE_INDEL_F1, m["INDEL"]
