"""The compact full-alignment transfer form (ops/fa_compact.py) must be a
LOSSLESS round-trip on real extractor output, refuse (-> None) anything
violating its structural invariants, match between numpy and jax
reconstructions, and leave engine probabilities bit-identical."""

import numpy as np
import pytest

from clair3_tpu.fullalign.extractor import PhasedVariant, fa_region
from clair3_tpu.io.bam import BamReader
from clair3_tpu.io.fasta import FastaFile
from clair3_tpu.ops.fa_compact import pack_fa, unpack_fa_jax, unpack_fa_numpy
from clair3_tpu.testing import SimVariant, random_reference, write_test_case


def _extract(tmp_path, enable_dwell=False, error_rate=0.03, coverage=30):
    ref = random_reference(4000, seed=17)
    variants = [
        SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (0, 1)),
        SimVariant(1400, ref[1400], ref[1400] + "TTG", (0, 1)),
        SimVariant(2100, ref[2100:2104], ref[2100], (1, 1)),
        SimVariant(2800, ref[2800], "A" if ref[2800] != "A" else "T", (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=4000, variants=variants, coverage=coverage,
        read_length=1200, seed=17, error_rate=error_rate,
        with_mv_tags=enable_dwell)
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, 4000)
    fa.close()
    reads = list(BamReader(bam).fetch("chr1", 0, 4000, min_mq=5))
    hets = [PhasedVariant(700, ref[700],
                          "C" if ref[700] != "C" else "G", 1, 1)]
    cands = [v.pos for v in variants]
    mat, _, _ = fa_region(reads, ref_seq, 0, cands, hets,
                          enable_dwell=enable_dwell)
    return mat


@pytest.mark.parametrize("dwell", [False, True])
def test_pack_roundtrip_bit_identical(tmp_path, dwell):
    mat = _extract(tmp_path, enable_dwell=dwell)
    assert mat.shape[0] > 0 and mat.any()
    packed = pack_fa(mat)
    assert packed is not None, "real extractor output must pack"
    np.testing.assert_array_equal(unpack_fa_numpy(packed), mat)
    # wire size actually shrinks
    full = mat.nbytes
    compact = sum(v.nbytes for v in packed.values())
    assert compact < 0.5 * full


def test_pack_roundtrip_after_depth_crop(tmp_path):
    """The engine crops the centered depth band BEFORE packing; the
    cropped tensor must round-trip too."""
    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _extract(tmp_path)
    eng = InferenceEngine(FullAlignmentNet(add_indel_length=True),
                          _fa_variables(), depth_crop=True, fa_compact=True)
    cropped, full_depth = eng._crop_depth(mat)
    packed = pack_fa(cropped)
    assert packed is not None
    np.testing.assert_array_equal(unpack_fa_numpy(packed), cropped)
    assert full_depth is None or cropped.shape[1] < mat.shape[1]


def test_pack_refuses_structure_violations():
    rng = np.random.default_rng(0)
    noise = rng.integers(-100, 100, (4, 20, 33, 8)).astype(np.int8)
    assert pack_fa(noise) is None
    # a well-formed tensor with ONE corrupted scalar cell must also refuse
    good = np.zeros((2, 10, 33, 8), np.int8)
    good[0, 3, 5:20, 2] = 50      # strand covered span
    good[0, 3, 5:20, 3] = 80      # constant MQ
    assert pack_fa(good) is not None
    bad = good.copy()
    bad[0, 3, 7, 3] = 79          # MQ varies inside the covered span
    assert pack_fa(bad) is None
    # wrong rank/shape
    assert pack_fa(np.zeros((4, 33, 18), np.int8)) is None


def test_jax_unpack_matches_numpy(tmp_path):
    mat = _extract(tmp_path)
    packed = pack_fa(mat)
    out = np.asarray(unpack_fa_jax(
        packed["cells"], packed["bitmask"], packed["scalars"],
        packed["refcol"]))
    np.testing.assert_array_equal(out, mat)
    assert out.dtype == np.int8


def _fa_variables():
    import jax
    import jax.numpy as jnp

    from clair3_tpu.models import FullAlignmentNet

    net = FullAlignmentNet(add_indel_length=True)
    return net.init(jax.random.PRNGKey(0), jnp.zeros((2, 89, 33, 8), jnp.int8),
                    train=False)


def test_engine_compact_probabilities_identical(tmp_path):
    """fa_compact=True must be invisible in the outputs: identical
    probabilities vs the plain full-tensor engine (f32/CPU)."""
    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _extract(tmp_path)
    variables = _fa_variables()
    net = FullAlignmentNet(add_indel_length=True)
    plain = InferenceEngine(net, variables, buckets=(32,))
    compact = InferenceEngine(net, variables, buckets=(32,),
                              depth_crop=True, fa_compact=True)
    p0 = plain.predict(mat)
    p1 = compact.predict(mat)
    np.testing.assert_array_equal(p0, p1)


@pytest.mark.parametrize("dwell", [False, True])
def test_sparse_pack_roundtrip_bit_identical(tmp_path, dwell):
    from clair3_tpu.ops.fa_compact import pack_fa_sparse, unpack_fa_sparse_numpy

    mat = _extract(tmp_path, enable_dwell=dwell)
    packed = pack_fa_sparse(mat)
    assert packed is not None, "real extractor output must sparse-pack"
    np.testing.assert_array_equal(unpack_fa_sparse_numpy(packed), mat)
    # sparse form beats the v1 cells-trio form on the wire
    from clair3_tpu.ops.fa_compact import pack_fa

    v1 = sum(v.nbytes for v in pack_fa(mat).values())
    v2 = sum(v.nbytes for v in packed.values())
    assert v2 < 0.75 * v1
    assert v2 < 0.3 * mat.nbytes


def test_sparse_pack_k_bucket_selection_and_overflow(tmp_path):
    from clair3_tpu.ops.fa_compact import K_BUCKETS, pack_fa_sparse

    mat = _extract(tmp_path, error_rate=0.02)
    packed = pack_fa_sparse(mat)
    assert packed["sidx"].shape[1] == K_BUCKETS[0]
    # force > K0 alt entries in one row -> the larger bucket
    dense = mat.copy()
    dense[0, : K_BUCKETS[0] // 33 + 1, :, 1] = 9
    packed = pack_fa_sparse(dense)
    assert packed is not None and packed["sidx"].shape[1] == K_BUCKETS[-1]
    from clair3_tpu.ops.fa_compact import unpack_fa_sparse_numpy

    np.testing.assert_array_equal(unpack_fa_sparse_numpy(packed), dense)
    # overflow every bucket -> None (callers fall back to v1/full)
    dense[0, :, :, 1] = 9
    assert dense[0].size // 8 > K_BUCKETS[-1]
    assert pack_fa_sparse(dense) is None


def test_sparse_jax_unpack_matches_numpy(tmp_path):
    from clair3_tpu.ops.fa_compact import (pack_fa_sparse,
                                           unpack_fa_sparse_jax,
                                           unpack_fa_sparse_numpy)

    mat = _extract(tmp_path)
    packed = pack_fa_sparse(mat)
    out = np.asarray(unpack_fa_sparse_jax(packed))
    np.testing.assert_array_equal(out, unpack_fa_sparse_numpy(packed))
    np.testing.assert_array_equal(out, mat)


def test_engine_sparse_path_probabilities_identical(tmp_path):
    """The engine's sparse fast path (fa_compact=True now prefers it) must
    be invisible in the outputs, including when batches pad to the
    bucket."""
    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.ops.fa_compact import pack_fa_sparse
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _extract(tmp_path)
    variables = _fa_variables()
    net = FullAlignmentNet(add_indel_length=True)
    plain = InferenceEngine(net, variables, buckets=(32,))
    compact = InferenceEngine(net, variables, buckets=(32,),
                              depth_crop=True, fa_compact=True)
    cropped, _ = compact._crop_depth(mat)
    assert pack_fa_sparse(cropped) is not None, \
        "fixture must exercise the sparse path, not a fallback"
    np.testing.assert_array_equal(plain.predict(mat), compact.predict(mat))
