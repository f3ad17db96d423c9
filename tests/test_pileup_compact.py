"""The compact pileup transfer form (ops/pileup_compact.py) must be a
LOSSLESS round-trip on real extractor output (including the negated
ref-base channels and the high-coverage rescale), refuse (-> None)
anything violating its invariants, match between numpy and jax
reconstructions, and leave engine probabilities bit-identical."""

import numpy as np
import pytest

from clair3_tpu.ops.pileup_compact import (
    pack_pileup,
    unpack_pileup_jax,
    unpack_pileup_numpy,
)
from clair3_tpu.pileup.extractor import create_pileup_tensors
from clair3_tpu.testing import SimVariant, random_reference, write_test_case


def _extract(tmp_path, coverage=30, error_rate=0.03):
    ref = random_reference(4000, seed=23)
    variants = [
        SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (0, 1)),
        SimVariant(1400, ref[1400], ref[1400] + "TTG", (0, 1)),
        SimVariant(2100, ref[2100:2104], ref[2100], (1, 1)),
        SimVariant(2800, ref[2800], "A" if ref[2800] != "A" else "T", (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=4000, variants=variants, coverage=coverage,
        read_length=1200, seed=23, error_rate=error_rate)
    mat, _, alt_infos, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, 4000)
    return mat.astype(np.int16), alt_infos


def test_pack_roundtrip_bit_identical(tmp_path):
    mat, _ = _extract(tmp_path)
    assert mat.shape[0] > 0 and (mat < 0).any(), \
        "fixture must exercise the negated ref channels"
    packed = pack_pileup(mat)
    assert packed is not None, "real extractor output must pack"
    np.testing.assert_array_equal(unpack_pileup_numpy(packed), mat)
    # wire size actually shrinks ~2x vs the int16 form
    compact = sum(v.nbytes for v in packed.values())
    assert compact < 0.6 * mat.nbytes


def test_pack_roundtrip_after_rescale(tmp_path):
    """The engine rescales extreme coverage BEFORE transfer; the floor-
    divided (sign-preserving-magnitude) tensor must still round-trip."""
    from clair3_tpu.pipeline.engine import rescale_high_coverage_pileup

    mat, alt_infos = _extract(tmp_path, coverage=60)
    scaled = rescale_high_coverage_pileup(mat.astype(np.int32), alt_infos,
                                          max_depth=24).astype(np.int16)
    packed = pack_pileup(scaled)
    assert packed is not None
    np.testing.assert_array_equal(unpack_pileup_numpy(packed), scaled)


def test_pack_refuses_violations():
    # values beyond uint8
    big = np.zeros((2, 33, 18), np.int16)
    big[0, 5, 2] = 300
    assert pack_pileup(big) is None
    # a negative entry whose channel pair doesn't reconstruct (two
    # different ref indices negated in one column)
    bad = np.zeros((1, 33, 18), np.int16)
    bad[0, 10, 1] = -5
    bad[0, 10, 2] = -7
    assert pack_pileup(bad) is None
    # wrong rank/shape
    assert pack_pileup(np.zeros((4, 89, 33, 8), np.int8)) is None
    assert pack_pileup(np.zeros((4, 33, 17), np.int16)) is None
    # well-formed single negated pair packs
    good = np.zeros((1, 33, 18), np.int16)
    good[0, 10, 1] = -5
    good[0, 10, 10] = -3
    good[0, 10, 4] = 2
    assert pack_pileup(good) is not None
    np.testing.assert_array_equal(unpack_pileup_numpy(pack_pileup(good)), good)


def test_jax_unpack_matches_numpy(tmp_path):
    mat, _ = _extract(tmp_path)
    packed = pack_pileup(mat)
    out = np.asarray(unpack_pileup_jax(packed["mags"], packed["negidx"]))
    np.testing.assert_array_equal(out, mat)
    assert out.dtype == np.int16


def test_engine_compact_probabilities_identical(tmp_path):
    """pileup_compact=True must be invisible in the outputs: identical
    probabilities vs the plain engine (f32/CPU)."""
    import jax
    import jax.numpy as jnp

    from clair3_tpu.models import PileupNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat, _ = _extract(tmp_path)
    net = PileupNet(add_indel_length=False)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 33, 18), jnp.int32))
    plain = InferenceEngine(net, variables, buckets=(32,),
                            transfer_dtype=np.int16)
    compact = InferenceEngine(net, variables, buckets=(32,),
                              transfer_dtype=np.int16, pileup_compact=True)
    p0 = plain.predict(mat.astype(np.int32))
    p1 = compact.predict(mat.astype(np.int32))
    np.testing.assert_array_equal(p0, p1)
