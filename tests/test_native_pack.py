"""Native compact-wire-form packers vs their numpy oracles.

clair3t_pack.cc must produce byte-identical packed dicts to the numpy
packers in ops/fa_compact.py / ops/pileup_compact.py, and must reject
exactly the same inputs (structure violations, overflow)."""

import os

import numpy as np
import pytest

from clair3_tpu.native import (fa_pack_sparse_native, native_available,
                               pileup_pack_native)
from clair3_tpu.ops.fa_compact import K_BUCKETS

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable")


def _numpy_fa_pack(mat):
    """The numpy oracle, bypassing the native fast path."""
    from clair3_tpu.ops import fa_compact

    os.environ["CLAIR3T_VERIFY_PACK"] = "1"
    try:
        return fa_compact.pack_fa_sparse(mat)
    finally:
        del os.environ["CLAIR3T_VERIFY_PACK"]


def _numpy_pileup_pack(mat):
    from clair3_tpu.ops import pileup_compact

    os.environ["CLAIR3T_VERIFY_PACK"] = "1"
    try:
        return pileup_compact.pack_pileup(mat)
    finally:
        del os.environ["CLAIR3T_VERIFY_PACK"]


def _assert_same_packed(native, oracle):
    if oracle is None or native is None:
        assert oracle is None and native is None
        return
    assert set(native) == set(oracle)
    for k in oracle:
        assert native[k].dtype == oracle[k].dtype, k
        np.testing.assert_array_equal(native[k], oracle[k], err_msg=k)


def _fa_fixture(tmp_path, **kw):
    from clair3_tpu.fullalign.extractor import PhasedVariant
    from clair3_tpu.native import fa_region_native
    from clair3_tpu.testing import (SimVariant, random_reference,
                                    write_test_case)

    L = 30000
    ref = random_reference(L, seed=5)
    variants, hets = [], []
    for p in range(500, L - 500, 400):
        alt = "G" if ref[p] != "G" else "T"
        variants.append(SimVariant(p, ref[p], alt, (0, 1)))
        hets.append(PhasedVariant(p, ref[p], alt, 1, 1))
    write_test_case(str(tmp_path), ref_length=L, variants=variants,
                    coverage=25, read_length=3000, seed=5,
                    error_rate=kw.get("error_rate", 0.03),
                    with_mv_tags=kw.get("dwell", False))
    mat, _, _ = fa_region_native(
        str(tmp_path / "reads.bam"), ref, 0, "chr1",
        [v.pos for v in variants], variants=hets,
        need_haplotagging=True, enable_dwell=kw.get("dwell", False))
    return mat


@pytest.mark.parametrize("dwell", [False, True])
def test_fa_pack_native_matches_oracle_real_extractor(tmp_path, dwell):
    mat = _fa_fixture(tmp_path, dwell=dwell)
    native = fa_pack_sparse_native(mat, K_BUCKETS)
    _assert_same_packed(native, _numpy_fa_pack(mat))
    assert native is not None  # real extractor output must pack


def test_fa_pack_native_k_bucket_and_overflow(tmp_path):
    mat = _fa_fixture(tmp_path)
    dense = mat.copy()
    dense[0, : K_BUCKETS[0] // 33 + 1, :, 1] = 9  # force the larger K
    _assert_same_packed(fa_pack_sparse_native(dense, K_BUCKETS),
                        _numpy_fa_pack(dense))
    dense[0, :, :, 1] = 9  # overflow every bucket -> both None
    assert fa_pack_sparse_native(dense, K_BUCKETS) is None
    assert _numpy_fa_pack(dense) is None


def test_fa_pack_native_rejects_structure_violations(tmp_path):
    mat = _fa_fixture(tmp_path)
    for ch in (0, 2, 3, 5, 7):  # ref/strand/MQ/AF/HP derived channels
        bad = mat.copy()
        # find one covered cell and corrupt the derived channel there
        n, d, p = np.argwhere(bad[..., 2] != 0)[0]
        bad[n, d, p, ch] += 1
        assert fa_pack_sparse_native(bad, K_BUCKETS) is None, ch
        assert _numpy_fa_pack(bad) is None, ch


def test_fa_pack_fuzz_agreement():
    rng = np.random.default_rng(7)
    for trial in range(30):
        N, D = int(rng.integers(1, 5)), int(rng.integers(8, 24))
        C = 8 if trial % 2 else 9
        mat = np.zeros((N, D, 33, C), np.int8)
        for n in range(N):
            refv = rng.integers(0, 60, 33).astype(np.int8)
            for d in range(int(rng.integers(0, D))):
                lo, hi = sorted(rng.integers(0, 34, 2))
                if lo == hi:
                    continue
                s, mq, hp, af = rng.integers(1, 90, 4).astype(np.int8)
                mat[n, d, lo:hi, 2] = s
                mat[n, d, lo:hi, 3] = mq
                mat[n, d, lo:hi, 7] = hp
                mat[n, d, lo:hi, 0] = refv[lo:hi]
                mat[n, d, lo:hi, 5] = np.where(refv[lo:hi] != 0, af, 0)
                mat[n, d, lo:hi, 4] = rng.integers(0, 100, hi - lo)
                alt_cells = rng.random(hi - lo) < 0.1
                mat[n, d, lo:hi, 1] = np.where(
                    alt_cells, rng.integers(1, 90, hi - lo), 0)
                ins_cells = rng.random(hi - lo) < 0.05
                mat[n, d, lo:hi, 6] = np.where(
                    ins_cells, rng.integers(1, 90, hi - lo), 0)
                if C == 9:
                    mat[n, d, lo:hi, 8] = rng.integers(0, 100, hi - lo)
        if trial % 5 == 4:  # sometimes corrupt a derived channel
            mat[rng.integers(0, N), rng.integers(0, D),
                rng.integers(0, 33), int(rng.choice([0, 2, 3, 5, 7]))] += 1
        _assert_same_packed(fa_pack_sparse_native(mat, K_BUCKETS),
                            _numpy_fa_pack(mat))


def test_fa_band_native_matches_numpy_scan(tmp_path):
    from clair3_tpu.native import fa_band_native

    mat = _fa_fixture(tmp_path)
    lo, hi = fa_band_native(mat)
    nz = np.flatnonzero(mat.any(axis=(0, 2, 3)))
    assert (lo, hi) == (int(nz[0]), int(nz[-1]) + 1)
    # all-zero batch: the empty band collapses to the center (matching
    # the engine's numpy fallback, engine._crop_depth)
    assert fa_band_native(np.zeros((3, 20, 33, 8), np.int8)) == (10, 10)


def test_fa_offset_pack_equals_cropped_oracle(tmp_path):
    """Packing a depth window in place == numpy-packing the materialized
    crop (the engine fast path's exactness guarantee)."""
    from clair3_tpu.native import fa_band_native

    mat = _fa_fixture(tmp_path)
    lo, hi = fa_band_native(mat)
    assert hi - lo >= 4
    for top, rows in ((lo, hi - lo), (max(0, lo - 2), hi - lo + 2),
                      (0, mat.shape[1])):
        native = fa_pack_sparse_native(mat, K_BUCKETS, row_off=top,
                                       rows=rows)
        crop = np.ascontiguousarray(mat[:, top: top + rows])
        _assert_same_packed(native, _numpy_fa_pack(crop))
        assert native is not None


def test_engine_fast_path_matches_dense_and_verify_modes(tmp_path):
    """The zero-copy band+offset fast path must be invisible: same
    probabilities as the dense path and as the CLAIR3T_VERIFY_PACK numpy
    path (which materializes the crop)."""
    import jax

    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _fa_fixture(tmp_path)
    net = FullAlignmentNet(add_indel_length=True)
    variables = net.init(jax.random.PRNGKey(0), mat[:2].astype(np.int8),
                         train=False)
    fast = InferenceEngine(net, variables, buckets=(64,),
                           depth_crop=True, fa_compact=True)
    assert fast._sparse_fast_path(mat[:3], 64) is not None, \
        "fixture must take the fast path"
    plain = InferenceEngine(net, variables, buckets=(64,))
    np.testing.assert_array_equal(plain.predict(mat), fast.predict(mat))


def test_engine_fast_path_wide_band_and_overflow_fallback(tmp_path):
    """A band too wide for any crop bucket packs at full depth; a
    K-overflow batch falls off the fast path onto the dense path — both
    probability-identical to the plain engine."""
    import jax

    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _fa_fixture(tmp_path)
    D = mat.shape[1]
    wide = mat.copy()
    wide[:, 0, 0, 4] = 7   # BQ at depth row 0: band = [0, hi) fits no bucket
    overflow = mat.copy()
    overflow[:, :, :, 1] = 9  # alt everywhere: every K bucket overflows
    net = FullAlignmentNet(add_indel_length=True)
    variables = net.init(jax.random.PRNGKey(0), mat[:2].astype(np.int8),
                         train=False)
    fast = InferenceEngine(net, variables, buckets=(64,),
                           depth_crop=True, fa_compact=True)
    plain = InferenceEngine(net, variables, buckets=(64,))
    for batch in (wide, overflow):
        np.testing.assert_array_equal(plain.predict(batch),
                                      fast.predict(batch))
    # and the wide batch really took the full-depth sparse program
    from clair3_tpu.native import fa_band_native

    lo, hi = fa_band_native(wide)
    assert lo == 0 and hi - lo > fast._depth_buckets(D)[0]


@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_pileup_pack_native_matches_oracle(dtype):
    rng = np.random.default_rng(3)
    mat = rng.integers(0, 200, (64, 33, 18)).astype(dtype)
    # plant the reference negation quirk: one (j, j+9) pair per column
    for n in range(64):
        for p in range(33):
            j = int(rng.integers(0, 9))
            mat[n, p, j] *= -1
            mat[n, p, j + 9] *= -1
    _assert_same_packed(pileup_pack_native(mat), _numpy_pileup_pack(mat))
    assert pileup_pack_native(mat) is not None
    # >255 -> both reject
    big = mat.copy()
    big[0, 0, 3] = 300
    assert pileup_pack_native(big) is None
    assert _numpy_pileup_pack(big) is None
    # negative outside the (j, j+9) pattern -> both reject
    bad = mat.copy()
    col = bad[1, 5]
    j = int(np.argmax(col < 0)) % 9 if (col < 0).any() else 0
    other = (j + 4) % 9
    if other in (j,):
        other = (j + 1) % 9
    bad[1, 5, other] = -7
    assert pileup_pack_native(bad) is None
    assert _numpy_pileup_pack(bad) is None


def test_pileup_pack_int32_min_rejected():
    """-INT32_MIN is signed-overflow UB if negated in int32; the native
    packer must widen and reject exactly like the oracle (magnitude >255),
    not wrap to 0 and silently corrupt the batch."""
    mat = np.zeros((2, 33, 18), np.int32)
    mat[0, 5, 2] = np.iinfo(np.int32).min
    mat[0, 5, 11] = -3
    assert pileup_pack_native(mat) is None
    assert _numpy_pileup_pack(mat) is None


def test_pileup_pack_fuzz_agreement():
    rng = np.random.default_rng(11)
    for trial in range(40):
        N = int(rng.integers(1, 16))
        mat = rng.integers(0, 260 if trial % 7 == 0 else 250,
                           (N, 33, 18)).astype(np.int16)
        for n in range(N):
            for p in range(33):
                if rng.random() < 0.8:
                    j = int(rng.integers(0, 9))
                    mat[n, p, j] *= -1
                    mat[n, p, j + 9] *= -1
        if trial % 5 == 4:
            mat[rng.integers(0, N), rng.integers(0, 33),
                rng.integers(0, 18)] = -int(rng.integers(1, 40))
        _assert_same_packed(pileup_pack_native(mat), _numpy_pileup_pack(mat))


def test_engine_production_path_uses_identical_results(tmp_path):
    """predict() through the native packers == predict() with numpy
    packers == plain dense predict (probability-identical)."""
    import jax

    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    mat = _fa_fixture(tmp_path)
    net = FullAlignmentNet(add_indel_length=True)
    variables = net.init(jax.random.PRNGKey(0), mat[:2].astype(np.int8),
                         train=False)
    plain = InferenceEngine(net, variables, buckets=(64,))
    fast = InferenceEngine(net, variables, buckets=(64,),
                           depth_crop=True, fa_compact=True)
    p0 = plain.predict(mat)
    p1 = fast.predict(mat)
    np.testing.assert_array_equal(p0, p1)
    os.environ["CLAIR3T_VERIFY_PACK"] = "1"  # numpy packers + roundtrip
    try:
        slow = InferenceEngine(net, variables, buckets=(64,),
                               depth_crop=True, fa_compact=True)
        p2 = slow.predict(mat)
    finally:
        del os.environ["CLAIR3T_VERIFY_PACK"]
    np.testing.assert_array_equal(p1, p2)
