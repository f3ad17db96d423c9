"""Robustness fuzz: extreme coverage and pathological CIGARs through both
native extractors, differential against the numpy oracles (the reference
had a stack overflow at very high coverage, README issue #282)."""

import numpy as np
import pytest

from clair3_tpu.fullalign.extractor import fa_region
from clair3_tpu.io.bam import BamRead, BamReader, write_bam
from clair3_tpu.io.fasta import FastaFile
from clair3_tpu.pileup.extractor import pileup_region
from clair3_tpu.testing import SimVariant, random_reference, write_test_case

native = pytest.importorskip("clair3_tpu.native")
if not native.native_available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def _pileup_both(bam, ref_seq, ctg, start, end, **kw):
    br = BamReader(bam)
    py = pileup_region(
        br.fetch(ctg, start, end, min_mq=kw.get("min_mq", 5)),
        ref_seq, 0, start, end,
        **{k: v for k, v in kw.items() if k != "min_mq"})
    nat = native.pileup_region_native(bam, ref_seq, 0, ctg, start, end, **kw)
    return py, nat


def _assert_pileup_identical(py, nat):
    np.testing.assert_array_equal(py.counts, nat.counts)
    np.testing.assert_array_equal(py.depth, nat.depth)
    assert [(c.pos, c.alt_info) for c in py.candidates] == \
        [(c.pos, c.alt_info) for c in nat.candidates]


def test_high_coverage_600x_differential(tmp_path):
    """600x depth: both extractors bit-identical, no crash; FA subsampling
    (depth >> matrix_depth) agrees via the shared xorshift PRNG."""
    L = 6000
    ref = random_reference(L, seed=81)
    variants = [
        SimVariant(1500, ref[1500], "G" if ref[1500] != "G" else "T", (0, 1)),
        SimVariant(3000, ref[3000], ref[3000] + "AC", (0, 1)),
        SimVariant(4500, ref[4500:4503], ref[4500], (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=600,
        read_length=1500, seed=81, error_rate=0.02)
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, L)
    fa.close()

    py, nat = _pileup_both(bam, ref_seq, "chr1", 0, L, gvcf=True)
    _assert_pileup_identical(py, nat)
    np.testing.assert_array_equal(py.pos_ref_count, nat.pos_ref_count)
    assert int(nat.depth.max()) >= 550

    # FA at depth ~600 with matrix_depth 89 forces random subsampling
    cands = [1500, 3000, 4500]
    br = BamReader(bam)
    reads = list(br.fetch("chr1", 1400, 4600, min_mq=5))
    py_fa = fa_region(reads, ref_seq, 0, cands, (), matrix_depth=89, seed=7)
    nat_fa = native.fa_region_native(bam, ref_seq, 0, "chr1", cands, (),
                                     matrix_depth=89, seed=7)
    np.testing.assert_array_equal(py_fa[0], nat_fa[0])
    assert py_fa[2] == nat_fa[2]


def test_high_coverage_rescale_path(tmp_path):
    """depth > 1.5x max_depth triggers the integer-truncated rescale
    (CallVariantsFromCffi.py:278-285) on native-extracted tensors."""
    from clair3_tpu.pileup.extractor import candidate_tensors
    from clair3_tpu.pipeline.engine import rescale_high_coverage_pileup

    L = 3000
    ref = random_reference(L, seed=82)
    v = SimVariant(1500, ref[1500], "A" if ref[1500] != "A" else "C", (1, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=[v], coverage=400,
        read_length=1000, seed=82, error_rate=0.01)
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, L)
    fa.close()
    res = native.pileup_region_native(bam, ref_seq, 0, "chr1", 0, L)
    tensors, pos_infos, alt_infos = candidate_tensors(res, "chr1")
    assert len(pos_infos) >= 1
    scaled = rescale_high_coverage_pileup(tensors.copy(), alt_infos, max_depth=144)
    idx = [i for i, p in enumerate(pos_infos) if int(p.split(":")[-2]) == 1501][0]
    depth = int(str(alt_infos[idx]).split("-")[0])
    assert depth > 1.5 * 144
    # integer-truncated division semantics
    expect = (tensors[idx].astype(np.int64) / (depth / 144.0)).astype(tensors.dtype)
    np.testing.assert_array_equal(scaled[idx], expect)


def _pathological_reads(ref):
    q = lambda n: np.full(n, 30, np.uint8)  # noqa: E731
    reads = [
        # leading+trailing soft clips with insertions near window edges
        BamRead("p1", 0, 0, 100, 60, [(4, 20), (0, 30), (1, 15), (0, 30), (4, 10)],
                "A" * 20 + ref[100:130] + "ACGTACGTACGTACG" + ref[130:160] + "C" * 10,
                q(105)),
        # hard clips + N skip + 1bp M slivers between indels
        BamRead("p2", 16, 0, 150, 60,
                [(5, 8), (0, 1), (2, 5), (0, 1), (1, 3), (0, 1), (3, 50), (0, 40), (5, 3)],
                ref[150:151] + ref[156:157] + "TTT" + ref[157:158] + ref[208:248],
                q(46)),
        # deletion crossing the region end, insertion at first aligned base
        BamRead("p3", 0, 0, 180, 60, [(0, 1), (1, 40), (0, 9), (2, 60), (0, 10)],
                ref[180:181] + "G" * 40 + ref[181:190] + ref[250:260], q(60)),
        # long-indel monsters: 80bp del (> max_indel_length) + 70bp ins
        BamRead("p4", 0, 0, 120, 60, [(0, 20), (2, 80), (0, 20), (1, 70), (0, 20)],
                ref[120:140] + ref[220:240] + "A" * 70 + ref[240:260], q(130)),
        # alternating 1M1I and 1M1D chains
        BamRead("p5", 0, 0, 200, 60,
                [(0, 1), (1, 1)] * 10 + [(0, 1), (2, 1)] * 10 + [(0, 20)],
                ref[200:201] + "".join("A" + ref[201 + k] for k in range(0)) +
                "".join(ref[200 + k:201 + k] + "A" for k in range(0)) +
                # build seq explicitly below
                "", q(0)),
    ]
    # fix p5's seq/qual: 1M1I x10 consumes ref[200..210), then 1M1D x10
    # consumes ref[210..230, every other base), then 20M
    seq5 = ""
    for k in range(10):
        seq5 += ref[200 + k] + "A"
    for k in range(10):
        seq5 += ref[210 + 2 * k]
    seq5 += ref[230:250]
    reads[4] = BamRead("p5", 0, 0, 200, 60,
                       [(0, 1), (1, 1)] * 10 + [(0, 1), (2, 1)] * 10 + [(0, 20)],
                       seq5, q(len(seq5)))
    # insertion IMMEDIATELY followed by soft-clipping (the reference's
    # boundary bug, Clair3 issue #394 / v1.1.2): 20M 5I 12S
    reads.append(BamRead("p6", 0, 0, 240, 60, [(0, 20), (1, 5), (4, 12)],
                         ref[240:260] + "GGGGG" + "T" * 12, q(37)))
    # and the mirrored shape: leading soft clip straight into an insertion
    reads.append(BamRead("p7", 16, 0, 260, 60, [(4, 9), (1, 4), (0, 25)],
                         "C" * 9 + "AAAA" + ref[260:285], q(38)))
    # plus plain coverage so columns pass min_depth
    for i in range(6):
        reads.append(BamRead(f"c{i}", 0 if i % 2 == 0 else 16, 0, 80, 60,
                             [(0, 220)], ref[80:300], q(220)))
    return sorted(reads, key=lambda r: r.pos)


def test_pathological_cigars_differential(tmp_path):
    ref = random_reference(400, seed=83)
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n" + ref + "\n")
    bam = str(tmp_path / "path.bam")
    write_bam(bam, ["chr1"], [400], _pathological_reads(ref))

    py, nat = _pileup_both(bam, ref, "chr1", 0, 400, gvcf=True)
    _assert_pileup_identical(py, nat)

    cands = [c.pos for c in nat.candidates][:10] or [200, 210]
    br = BamReader(bam)
    reads = list(br.fetch("chr1", 0, 400, min_mq=5))
    py_fa = fa_region(reads, ref, 0, cands, (), matrix_depth=89, seed=1)
    nat_fa = native.fa_region_native(bam, ref, 0, "chr1", cands, (),
                                     matrix_depth=89, seed=1)
    np.testing.assert_array_equal(py_fa[0], nat_fa[0])
    assert py_fa[2] == nat_fa[2]


def test_random_cigar_fuzz_differential(tmp_path):
    """Randomly generated (valid) CIGAR chains across 30 reads x 5 seeds:
    native must match the oracle bit-for-bit and never crash."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        ref = random_reference(600, seed=900 + seed)
        reads = []
        for i in range(30):
            pos = rng.randrange(0, 380)
            cigar = []
            seq = []
            ref_i = pos
            if rng.random() < 0.3:
                n = rng.randrange(1, 12)
                cigar.append((4, n))
                seq.append("A" * n)
            for _ in range(rng.randrange(1, 6)):
                op = rng.choice([0, 0, 0, 1, 2, 3])
                n = rng.randrange(1, 25)
                if op == 0:
                    if ref_i + n > 590:
                        n = max(1, 590 - ref_i)
                    cigar.append((0, n))
                    seq.append(ref[ref_i: ref_i + n] if rng.random() < 0.7
                               else "T" * n)
                    ref_i += n
                elif op == 1:
                    cigar.append((1, n))
                    seq.append("G" * n)
                elif op in (2, 3):
                    if ref_i + n > 590:
                        n = max(1, 590 - ref_i)
                    cigar.append((op, n))
                    ref_i += n
            if not any(op == 0 for op, _ in cigar):
                cigar.append((0, 5))
                seq.append(ref[ref_i: ref_i + 5])
                ref_i += 5
            if rng.random() < 0.3:
                n = rng.randrange(1, 12)
                cigar.append((4, n))
                seq.append("C" * n)
            s = "".join(seq)
            reads.append(BamRead(f"f{i}", rng.choice([0, 16]), 0, pos,
                                 rng.randrange(5, 61), cigar, s,
                                 np.full(len(s), 30, np.uint8)))
        reads.sort(key=lambda r: r.pos)
        bam = str(tmp_path / f"fuzz{seed}.bam")
        write_bam(bam, ["chr1"], [600], reads)
        py, nat = _pileup_both(bam, ref, "chr1", 0, 600, min_depth=1)
        _assert_pileup_identical(py, nat)


@pytest.mark.slow
def test_asan_clean_workload(tmp_path):
    """AddressSanitizer-instrumented native library runs the full extractor
    + decode workload without memory errors."""
    import os
    import subprocess
    import sys

    so = native.build_sanitizer("address")
    libasan = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True).stdout.strip()
    script = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np
from clair3_tpu.native import pileup_region_native, fa_region_native, decode_batch_native
from clair3_tpu.decode import DecodeConfig
from clair3_tpu.testing import SimVariant, random_reference, write_test_case
L = 20000
ref = random_reference(L, seed=5)
variants = [SimVariant(p, ref[p], "G" if ref[p] != "G" else "T", (0, 1))
            for p in range(500, L - 500, 450)]
_, bam, _, _ = write_test_case({repr(str(tmp_path))}, ref_length=L,
                               variants=variants, coverage=300,
                               read_length=3000, seed=5, error_rate=0.03)
res = pileup_region_native(bam, ref, 0, "chr1", 0, L, gvcf=True, threads=3)
cands = [c.pos for c in res.candidates]
assert cands
import os as _os
_os.environ["CLAIR3T_FA_THREADS"] = "4"  # force threaded fill under ASan
mat, pos, alts = fa_region_native(bam, ref, 0, "chr1", cands[:200],
                                  matrix_depth=89, seed=3)
pis = [f"chr1:{{p+1}}:{{ref[max(0,p-16):p+17]}}" for p in pos]
probs = np.random.default_rng(0).dirichlet(np.ones(90), size=len(pos))
rows = decode_batch_native(pis, alts, probs,
                           DecodeConfig(add_indel_length=True, pileup=False,
                                        show_ref_calls=True, gvcf=True),
                           threads=4)
from clair3_tpu.native import NativeGvcfWriter
w = NativeGvcfWriter(contig_lengths={{"chr1": L}})
w.feed("chr1", 1, ref, res.pos_ref_count, res.pos_total_count)
grows = w.finish()
w.close()
assert grows

# wire-form packers (clair3t_pack.cc) on real extractor output + a
# bucket-overflow batch (the K=512 and reject paths)
from clair3_tpu.native import fa_pack_sparse_native, pileup_pack_native
from clair3_tpu.pileup.extractor import candidate_tensors
sp = fa_pack_sparse_native(mat, (128, 512))
assert sp is not None or mat.shape[0] == 0
dense = mat.copy()
dense[:, :, :, 1] = 9
assert fa_pack_sparse_native(dense, (128, 512)) is None  # overflow reject
tensors, _, _ = candidate_tensors(res, "chr1")
pp = pileup_pack_native(np.ascontiguousarray(tensors[:256].astype(np.int16)))

# CRAM 3.1 codec decoders on valid AND corrupted payloads (they parse
# untrusted compressed input)
import ctypes, random as _rnd
from clair3_tpu.native import get_lib
from clair3_tpu.io.arith import arith_compress, F_ORDER1, F_RLE, F_PACK, F_STRIPE
from clair3_tpu.io.fqzcomp import fqzcomp_compress
lib = get_lib()
for fn in ("clair3t_arith_decode", "clair3t_fqzcomp_decode"):
    f = getattr(lib, fn)
    f.restype = ctypes.c_int
    f.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
rng = _rnd.Random(9)
qdata = bytes(min(45, max(0, 25 + rng.randint(-9, 9))) for _ in range(20000))
payloads = [(lib.clair3t_arith_decode, arith_compress(qdata, fl), len(qdata))
            for fl in (0, F_ORDER1, F_RLE | F_ORDER1, F_PACK, F_STRIPE | F_ORDER1)]
payloads.append((lib.clair3t_fqzcomp_decode, fqzcomp_compress(qdata, [200] * 100), len(qdata)))
for f, payload, n in payloads:
    buf = ctypes.create_string_buffer(n)
    assert f(payload, len(payload), buf, n) == 0
    for _ in range(40):  # corrupted variants must fail cleanly, never crash
        b = bytearray(payload)
        for _ in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        f(bytes(b), len(b), buf, n)
        trunc = bytes(b[: rng.randrange(1, len(b))])
        f(trunc, len(trunc), buf, n)
print("ASAN_WORKLOAD_OK", len(rows))
"""
    env = dict(os.environ,
               CLAIR3T_NATIVE_SO=so,
               LD_PRELOAD=libasan,
               ASAN_OPTIONS="detect_leaks=0,abort_on_error=1")
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, env=env,
                          timeout=600)
    out = proc.stdout + proc.stderr
    assert "AddressSanitizer" not in out, out[-4000:]
    assert proc.returncode == 0, out[-4000:]
    assert "ASAN_WORKLOAD_OK" in out


def test_garbage_files_fail_cleanly(tmp_path, capfd):
    """BGZF-wrapped random garbage posing as BAM, and raw garbage posing
    as CRAM, must fail cleanly through the native file-level parsers (no
    segfault / bad_alloc abort)."""
    import random

    from clair3_tpu.io.bgzf import BgzfWriter

    rng = random.Random(7)
    ref = "ACGT" * 300
    for trial in range(25):
        path = str(tmp_path / f"g{trial}.bam")
        with BgzfWriter(path) as w:
            if trial % 3 == 0:
                w.write(b"BAM\x01" + bytes(rng.randrange(256)
                                           for _ in range(rng.randrange(0, 400))))
            else:
                w.write(bytes(rng.randrange(256)
                              for _ in range(rng.randrange(1, 600))))
        try:
            native.pileup_region_native(path, ref, 0, "chr1", 0, 1000)
        except Exception:
            pass
        cpath = str(tmp_path / f"g{trial}.cram")
        with open(cpath, "wb") as fh:
            fh.write(b"CRAM\x03\x00" + bytes(rng.randrange(256)
                                             for _ in range(rng.randrange(30, 800))))
        try:
            native.cram_to_bam_native(cpath, str(tmp_path / "none.fa"),
                                      str(tmp_path / f"g{trial}_o.bam"))
        except Exception:
            pass
