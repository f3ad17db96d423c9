"""Vectorized oracle engines vs their per-candidate reference loops.

The oracle engines stand in for trained nets in pipeline tests and in
bench.py's decode stage, so their vectorized ``predict`` must be
bit-identical (float-exact) to the original loop implementation."""

import numpy as np
import pytest

from clair3_tpu.testing import (FullAlignmentOracleEngine, PileupOracleEngine,
                                SimVariant, random_reference, write_test_case)


def _real_case(tmp_path):
    L = 40000
    ref = random_reference(L, seed=9)
    variants = []
    for p in range(500, L - 500, 450):
        k = p % 3
        if k == 0:
            variants.append(SimVariant(p, ref[p], "G" if ref[p] != "G" else "T",
                                       (0, 1) if p % 2 else (1, 1)))
        elif k == 1:
            variants.append(SimVariant(p, ref[p], ref[p] + "ACGT"[:1 + p % 4],
                                       (0, 1)))
        else:
            variants.append(SimVariant(p, ref[p:p + 1 + p % 5], ref[p], (1, 1)))
    write_test_case(str(tmp_path), ref_length=L, variants=variants,
                    coverage=28, read_length=2500, seed=9, error_rate=0.04)
    return ref, variants


def test_pileup_oracle_vectorized_identical_real(tmp_path):
    from clair3_tpu.native import pileup_region_native
    from clair3_tpu.pileup.extractor import candidate_tensors

    ref, _ = _real_case(tmp_path)
    res = pileup_region_native(str(tmp_path / "reads.bam"), ref, 0, "chr1",
                               0, 40000, threads=0)
    tensors, pis, _ = candidate_tensors(res, "chr1")
    assert len(pis) > 50
    e = PileupOracleEngine()
    np.testing.assert_array_equal(e.predict(tensors),
                                  e.predict_reference(tensors))


def test_fa_oracle_vectorized_identical_real(tmp_path):
    from clair3_tpu.fullalign.extractor import PhasedVariant
    from clair3_tpu.native import fa_region_native

    ref, variants = _real_case(tmp_path)
    hets = [PhasedVariant(v.pos, v.ref[0], v.alt[0], 1, 1)
            for v in variants if v.genotype == (0, 1) and len(v.ref) == 1
            and len(v.alt) == 1]
    mat, pos, _ = fa_region_native(
        str(tmp_path / "reads.bam"), ref, 0, "chr1",
        [v.pos for v in variants], variants=hets, need_haplotagging=True)
    assert len(pos) > 50
    e = FullAlignmentOracleEngine()
    np.testing.assert_array_equal(e.predict(mat), e.predict_reference(mat))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pileup_oracle_vectorized_identical_fuzz(seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-40, 40, (400, 33, 18)).astype(np.int32)
    # mix in realistic negated-ref columns and zero-coverage candidates
    x[:100, 16, :] = 0
    e = PileupOracleEngine()
    np.testing.assert_array_equal(e.predict(x), e.predict_reference(x))
    assert e.predict(np.zeros((0, 33, 18), np.int32)).shape == (0, 24)


@pytest.mark.parametrize("seed", [0, 1])
def test_fa_oracle_vectorized_identical_fuzz(seed):
    rng = np.random.default_rng(seed + 10)
    x = rng.integers(-128, 127, (200, 55, 33, 8)).astype(np.int8)
    # plant the FA channel codes so every branch is hit: ref/alt codes,
    # ins (-50) and del (-100) markers, empty columns
    codes = np.array([100, 25, 75, 50, 0, -50, -100], np.int8)
    x[..., 16, 0] = codes[rng.integers(0, 5, (200, 55))]
    x[..., 16, 1] = codes[rng.integers(0, 7, (200, 55))]
    x[:40, :, 16, 0] = 0  # fully uncovered candidates
    e = FullAlignmentOracleEngine()
    np.testing.assert_array_equal(e.predict(x), e.predict_reference(x))
    assert e.predict(np.zeros((0, 55, 33, 8), np.int8)).shape == (0, 90)
