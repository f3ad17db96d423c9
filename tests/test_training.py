"""Training pipeline tests, ending in the round-trip that matters: train a
real PileupNet on simulated data, then call variants with it."""

import numpy as np
import pytest

from clair3_tpu.config import CallConfig, TrainConfig
from clair3_tpu.io.vcf import VcfReader
from clair3_tpu.pileup.extractor import create_pileup_tensors
from clair3_tpu.train.data import (
    BinDataset,
    TruthVariant,
    build_labels,
    merge_bins,
    read_bin,
    write_bin,
)
from clair3_tpu.task.labels import GT21
from clair3_tpu.testing import SimVariant, random_reference, write_test_case


def test_build_labels_and_subsampling():
    pos_infos = [f"chr1:{p}:A" for p in (10, 20, 30, 40, 50, 60)]
    truths = [TruthVariant("chr1", 20, "A", "T", 0, 1)]
    labels, keep = build_labels(pos_infos, truths, maximum_non_variant_ratio=2.0, seed=0)
    assert labels.shape == (6, 90)
    assert labels[1, GT21.AT] == 1 and labels[1, 21 + 2] == 1
    assert labels[0, GT21.AA] == 1 and labels[0, 21 + 0] == 1
    assert keep[1]  # variants always kept
    assert keep.sum() == 3  # 1 variant + 2 non-variants


def test_bin_roundtrip_and_merge(tmp_path):
    t = np.arange(4 * 33 * 18, dtype=np.int32).reshape(4, 33, 18)
    l = np.eye(4, 90, dtype=np.float32)
    p = [f"chr1:{i}:A" for i in range(4)]
    a = [f"{i}-XC 5 " for i in range(4)]
    b1 = str(tmp_path / "a.bin")
    write_bin(b1, t, l, p, a)
    t2, l2, p2, a2 = read_bin(b1)
    np.testing.assert_array_equal(t, t2)
    np.testing.assert_array_equal(l, l2)
    assert p2 == p and a2 == a

    b2 = str(tmp_path / "b.bin")
    write_bin(b2, t, l, p, a)
    merged = str(tmp_path / "m.bin")
    merge_bins([b1, b2], merged)
    t3, _, p3, _ = read_bin(merged)
    assert len(t3) == 8 and len(p3) == 8

    ds = BinDataset([merged], chunk_size=2)
    assert ds.n_samples == 8
    assert len(ds.chunks) == 4
    batches = list(ds.batches(ds.chunks, chunks_per_batch=2))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 33, 18)


def _spread_variants(ref, start, end, step, seed=3):
    import random as _r
    rng = _r.Random(seed)
    variants = []
    for pos in range(start, end, step):
        kind = rng.random()
        gt = (1, 1) if rng.random() < 0.5 else (0, 1)
        if kind < 0.7:  # SNP
            alt = rng.choice([b for b in "ACGT" if b != ref[pos]])
            variants.append(SimVariant(pos, ref[pos], alt, gt))
        elif kind < 0.85:  # ins
            ins = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 3)))
            variants.append(SimVariant(pos, ref[pos], ref[pos] + ins, gt))
        else:  # del
            dlen = rng.randint(1, 3)
            variants.append(SimVariant(pos, ref[pos:pos + dlen + 1], ref[pos], gt))
    return variants


@pytest.mark.slow
def test_train_pileup_and_call(tmp_path):
    """End-to-end: simulate -> extract -> label -> bin -> train -> call."""
    from clair3_tpu.models import PileupNet
    from clair3_tpu.models.params_io import load_variables
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.pipeline.engine import InferenceEngine
    from clair3_tpu.train.trainer import train_model

    L = 30_000
    ref = random_reference(L, seed=21)
    variants = _spread_variants(ref, 300, L - 300, 130)
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=25,
        read_length=800, seed=21, error_rate=0.01)

    tensors, pos_infos, alt_infos, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, L, min_snp_af=0.08, min_indel_af=0.12)
    assert len(tensors) >= len(variants) * 0.9

    truths = [
        TruthVariant("chr1", v.pos + 1, v.ref, v.alt, *sorted(v.genotype))
        for v in variants
    ]
    labels, keep = build_labels(pos_infos, truths, maximum_non_variant_ratio=5.0)
    bin_path = str(tmp_path / "train.bin")
    write_bin(bin_path, tensors[keep], labels[keep],
              [p for p, k in zip(pos_infos, keep) if k],
              [a for a, k in zip(alt_infos, keep) if k])

    cfg = TrainConfig(pileup=True, add_indel_length=False, batch_size=250,
                      chunk_size_pileup=50, max_epoch=30, mini_epochs=1,
                      validation_fraction=0.1, seed=0, learning_rate=1e-3)
    result = train_model([bin_path], str(tmp_path / "model"), cfg, max_steps=80)
    assert result["best_val_loss"] < 1.0

    variables = load_variables(result["model_path"])
    model = PileupNet(add_indel_length=False)
    engine = InferenceEngine(model, variables, buckets=(256, 1024))

    call_cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta,
        output_dir=str(tmp_path / "out"), pileup_only=True, threads=2,
        indel_min_af=0.12,
    )
    outputs = VariantCaller(call_cfg, pileup_engine=engine).run()
    called = {r.pos: r for r in VcfReader(outputs["merge_output"])}

    snp_truth = [v for v in variants if v.is_snp]
    hits = 0
    gt_hits = 0
    for v in snp_truth:
        rec = called.get(v.pos + 1)
        if rec is not None and v.alt in rec.alt.split(","):
            hits += 1
            want = "1/1" if v.genotype == (1, 1) else "0/1"
            got = rec.sample.split(":")[0]
            gt_hits += int(got == want or (want == "0/1" and got == "1/2"))
    recall = hits / len(snp_truth)
    gt_acc = gt_hits / max(1, hits)
    assert recall >= 0.9, f"SNP recall {recall:.2f}"
    assert gt_acc >= 0.85, f"GT accuracy {gt_acc:.2f}"
    # precision: not too many calls beyond truth
    assert len(called) <= len(variants) * 1.5
