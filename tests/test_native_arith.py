"""Differential tests: native adaptive-arithmetic decoder (clair3t_arith.cc)
vs the Python codec in io/arith.py (CRAM 3.1 method 6), plus arith-backed
tok3 name streams and an end-to-end CRAM with method-6 blocks through the
native converter."""

import ctypes
import random

import pytest

from clair3_tpu import native
from clair3_tpu.io.arith import (
    F_CAT, F_EXT, F_ORDER1, F_PACK, F_RLE, F_STRIPE, arith_compress)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable")


def _native_arith_decode(payload: bytes, out_sz: int):
    lib = native.get_lib()
    lib.clair3t_arith_decode.restype = ctypes.c_int
    lib.clair3t_arith_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(max(out_sz, 1))
    rc = lib.clair3t_arith_decode(payload, len(payload), out, out_sz)
    return rc, out.raw[:out_sz]


def _corpora():
    rng = random.Random(97)
    yield b""
    yield b"q"
    yield b"ACGT" * 11
    yield bytes(rng.randrange(256) for _ in range(6_000))
    yield bytes(rng.choice(b"ACGTN") for _ in range(9_000))
    yield b"\x00" * 4_000
    q = bytearray()
    while len(q) < 8_000:
        q += bytes([rng.choice(b"!#,:F")]) * rng.randrange(1, 250)
    yield bytes(q)


@pytest.mark.parametrize("flags", [
    0, F_ORDER1, F_RLE, F_RLE | F_ORDER1, F_CAT,
    F_PACK, F_PACK | F_ORDER1, F_PACK | F_RLE,
    F_STRIPE, F_STRIPE | F_ORDER1, F_STRIPE | F_RLE | F_ORDER1,
])
def test_native_decode_matches_python_encoder(flags):
    for data in _corpora():
        payload = arith_compress(data, flags)
        rc, got = _native_arith_decode(payload, len(data))
        assert rc == 0, (flags, len(data))
        assert got == data, (flags, len(data))


def test_native_decodes_ext_bzip2():
    """The EXT transform (embedded bzip2) decodes in-library now
    (clair3t_bzip2.cc) — formerly the Python-fallback trigger."""
    data = b"hello world" * 100
    payload = arith_compress(data, F_EXT)
    rc, out = _native_arith_decode(payload, len(data))
    assert rc == 0
    assert out == data


def test_native_tok3_decodes_arith_streams():
    from clair3_tpu.io.tok3 import tok3_compress

    names = [f"read_{i:05d}/ccs maj" for i in range(500)]
    blob = b"\x00".join(n.encode() for n in names) + b"\x00"
    payload = tok3_compress(blob, use_arith=True)

    lib = native.get_lib()
    lib.clair3t_tok3_decode.restype = ctypes.c_int
    lib.clair3t_tok3_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(len(blob))
    rc = lib.clair3t_tok3_decode(payload, len(payload), out, len(blob))
    assert rc == 0
    assert out.raw == blob


def test_native_cram_converter_handles_arith_blocks(tmp_path, monkeypatch):
    """A CRAM 3.1 whose quality/base blocks use method 6 converts natively
    to a record-identical BAM."""
    import clair3_tpu.io.cram as cram_mod
    from clair3_tpu.io.bam import BamReader
    from clair3_tpu.io.cram import M_ARITH, M_RANSNX16, bam_to_cram
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    ref = random_reference(6_000, seed=77)
    variants = [SimVariant(2_000, ref[2_000],
                           "C" if ref[2_000] != "C" else "G", (1, 1))]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=6_000, variants=variants, coverage=12,
        read_length=800, seed=77, error_rate=0.02)

    orig_write_block = cram_mod.write_block

    def arith_write_block(block, method):
        if method == M_RANSNX16:
            method = M_ARITH
        return orig_write_block(block, method)

    monkeypatch.setattr(cram_mod, "write_block", arith_write_block)
    cram = str(tmp_path / "arith31.cram")
    bam_to_cram(bam, cram, fasta, version=(3, 1))
    monkeypatch.undo()

    # the file really contains method-6 blocks
    raw = open(cram, "rb").read()
    assert any(raw[i] == 6 for i in range(len(raw)))  # weak sanity

    out_bam = str(tmp_path / "native.bam")
    got = native.cram_to_bam_native(cram, fasta, out_bam)
    assert got == out_bam, "native converter fell back"
    ours = list(BamReader(out_bam))
    theirs = list(BamReader(bam))
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert (a.qname, a.pos, a.cigar, a.seq) == (b.qname, b.pos, b.cigar, b.seq)
        assert bytes(a.qual) == bytes(b.qual)


def _native_fqz_decode(payload: bytes, out_sz: int):
    lib = native.get_lib()
    lib.clair3t_fqzcomp_decode.restype = ctypes.c_int
    lib.clair3t_fqzcomp_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(max(out_sz, 1))
    rc = lib.clair3t_fqzcomp_decode(payload, len(payload), out, out_sz)
    return rc, out.raw[:out_sz]


def _qualities(n, seed):
    rng = random.Random(seed)
    out = bytearray()
    q = 25
    while len(out) < n:
        q = max(0, min(45, q + rng.randint(-3, 3)))
        out += bytes([q]) * rng.randint(1, 12)
    return bytes(out[:n])


def test_native_fqzcomp_matches_python_encoder():
    from clair3_tpu.io.fqzcomp import fqzcomp_compress

    for data, lengths in [
        (_qualities(5_000, 3), None),
        (_qualities(9_000, 4), [150] * 60),
        (b"", None),
        (b"\x28" * 4_000, [100] * 40),
        (bytes(random.Random(5).randrange(64) for _ in range(3_000)), None),
    ]:
        payload = fqzcomp_compress(data, lengths)
        rc, got = _native_fqz_decode(payload, len(data))
        assert rc == 0
        assert got == data


def test_native_fqzcomp_ptab_qtab_paths():
    """Native decode of a hand-built stream exercising ptab/qtab context
    components (mirrors tests/test_fqzcomp.py::test_decoder_ptab_qtab_paths)."""
    from clair3_tpu.io.arith import RangeEncoder, SimpleModel
    from clair3_tpu.io.fqzcomp import (
        FQZ_VERS, FqzParam, PFLAG_HAVE_PTAB, PFLAG_HAVE_QTAB,
        _QualModels, _update_ctx, _write_param)

    pm = FqzParam()
    pm.pflags = PFLAG_HAVE_PTAB | PFLAG_HAVE_QTAB
    pm.max_sym = 48
    pm.qbits = 8
    pm.qshift = 4
    pm.ploc = 8
    pm.qtab = [min(15, i // 4) for i in range(256)]
    pm.ptab = [min(15, i // 64) for i in range(1024)]
    pm.finish()

    data = _qualities(6_000, 21)
    out = bytearray([FQZ_VERS, 0])
    out += _write_param(pm)
    qm = _QualModels(pm.nsym)
    model_len = [SimpleModel(256) for _ in range(4)]
    rc = RangeEncoder()
    n = len(data)
    for k in range(4):
        model_len[k].encode(rc, (n >> (8 * k)) & 0xFF)
    state = {"p": n, "delta": 0, "prevq": 0, "qctx": 0, "s": 0}
    ctx = pm.context
    for q in data:
        qm.get(ctx).encode(rc, q)
        ctx = _update_ctx(pm, state, q)
    out += rc.finish()

    nrc, got = _native_fqz_decode(bytes(out), n)
    assert nrc == 0
    assert got == data


def test_native_cram_converter_handles_fqzcomp_blocks(tmp_path, monkeypatch):
    """A CRAM 3.1 whose quality blocks use fqzcomp (method 7) converts
    natively to a record-identical BAM."""
    import clair3_tpu.io.cram as cram_mod
    from clair3_tpu.io.bam import BamReader
    from clair3_tpu.io.cram import M_FQZCOMP, M_RANSNX16, bam_to_cram
    from clair3_tpu.io.fqzcomp import fqzcomp_compress
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    ref = random_reference(5_000, seed=78)
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=5_000, variants=[
            SimVariant(2_500, ref[2_500], "A" if ref[2_500] != "A" else "T", (0, 1))],
        coverage=10, read_length=600, seed=78, error_rate=0.02)

    orig_compress = cram_mod._compress
    orig_write_block = cram_mod.write_block

    def fqz_compress(method, data):
        if method == M_FQZCOMP:
            return fqzcomp_compress(data)
        return orig_compress(method, data)

    def fqz_write_block(block, method):
        # route the QS stream (rANS-Nx16 by default) through fqzcomp
        if method == M_RANSNX16 and block.content_id == 12:  # QS content id
            method = M_FQZCOMP
        return orig_write_block(block, method)

    monkeypatch.setattr(cram_mod, "_compress", fqz_compress)
    monkeypatch.setattr(cram_mod, "write_block", fqz_write_block)
    cram = str(tmp_path / "fqz31.cram")
    bam_to_cram(bam, cram, fasta, version=(3, 1))
    monkeypatch.undo()

    out_bam = str(tmp_path / "native.bam")
    got = native.cram_to_bam_native(cram, fasta, out_bam)
    assert got == out_bam, "native converter fell back"
    ours = list(BamReader(out_bam))
    theirs = list(BamReader(bam))
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert (a.qname, a.pos, a.seq) == (b.qname, b.pos, b.seq)
        assert bytes(a.qual) == bytes(b.qual)


def test_fqzcomp_multiparam_stab_rev_dedup_both_decoders():
    """Hand-encode a 2-parameter-set fqzcomp stream with a selector table,
    DO_REV reversal and DO_DEDUP duplicate records; the Python and native
    decoders must both reproduce the expected byte stream."""
    from clair3_tpu.io.arith import RangeEncoder, SimpleModel
    from clair3_tpu.io.fqzcomp import (
        FQZ_VERS, FqzParam, GFLAG_DO_REV, GFLAG_HAVE_STAB, GFLAG_MULTI_PARAM,
        PFLAG_DO_DEDUP, PFLAG_DO_LEN, PFLAG_DO_SEL,
        _QualModels, _update_ctx, _write_param, fqzcomp_decompress,
        store_array)

    def make_param(pflags, sloc=0):
        pm = FqzParam()
        pm.pflags = pflags
        pm.max_sym = 48
        pm.qbits = 9
        pm.qshift = 5
        pm.qloc = 0
        pm.sloc = sloc
        pm.finish()
        return pm

    params = [make_param(PFLAG_DO_LEN | PFLAG_DO_SEL, sloc=12),
              make_param(PFLAG_DO_LEN | PFLAG_DO_DEDUP)]
    stab = [0] + [1] * 255

    rng = random.Random(11)
    recs = []  # (payload_bytes, sel, rev, dup)
    prev_by_any = None
    for k in range(24):
        sel = k % 2
        rev = 1 if k % 5 == 0 else 0
        dup = 1 if (sel == 1 and k % 7 == 3 and prev_by_any is not None) else 0
        if dup:
            data = prev_by_any  # decoder copies the PREVIOUS record verbatim
        else:
            n = rng.randint(20, 120)
            q = 25
            b = bytearray()
            for _ in range(n):
                q = max(0, min(47, q + rng.randint(-2, 2)))
                b.append(q)
            data = bytes(b)
        recs.append((data, sel, rev, dup))
        prev_by_any = data

    out = bytearray([FQZ_VERS,
                     GFLAG_MULTI_PARAM | GFLAG_HAVE_STAB | GFLAG_DO_REV, 2, 1])
    out += store_array(stab, 256)
    for pm in params:
        out += _write_param(pm)

    quals = [_QualModels(pm.nsym) for pm in params]
    model_len = [SimpleModel(256) for _ in range(4)]
    model_rev = SimpleModel(2)
    model_dup = SimpleModel(2)
    model_sel = SimpleModel(2)
    rc = RangeEncoder()
    expected = bytearray()
    first_len = True
    for data, sel, rev, dup in recs:
        model_sel.encode(rc, sel)
        pm = params[stab[sel]]
        n = len(data)
        if first_len or (pm.pflags & PFLAG_DO_LEN):
            for k in range(4):
                model_len[k].encode(rc, (n >> (8 * k)) & 0xFF)
            first_len = False
        model_rev.encode(rc, rev)
        if pm.pflags & PFLAG_DO_DEDUP:
            model_dup.encode(rc, dup)
            if dup:
                expected += data  # rev not applied to dup copies
                continue
        # the decoder reverses marked records at the END, so encode the
        # reversed bytes to make `data` come out after reversal
        coded = data[::-1] if rev else data
        state = {"p": n, "delta": 0, "prevq": 0, "qctx": 0, "s": sel}
        ctx = pm.context
        qm = quals[stab[sel]]
        for q in coded:
            qm.get(ctx).encode(rc, q)
            ctx = _update_ctx(pm, state, q)
        expected += data
    out += rc.finish()
    payload = bytes(out)

    assert fqzcomp_decompress(payload, len(expected)) == bytes(expected)
    nrc, got = _native_fqz_decode(payload, len(expected))
    assert nrc == 0
    assert got == bytes(expected)


def test_adversarial_payloads_fail_cleanly():
    """Crafted payloads that previously crashed the decoder must return
    failure: (a) PACK with a lying zero packed-length, (b) deeply nested
    STRIPE headers (stack exhaustion)."""
    # (a) flags=F_PACK|F_NOSZ, nsym=2, pmap, packed out_sz=0
    rc, _ = _native_arith_decode(bytes([0x48, 2, 65, 66, 0]), 1024)
    assert rc != 0
    # (b) ~200k nested stripe levels: F_STRIPE|F_NOSZ, X=1, clen covers rest
    payload = bytearray()
    for _ in range(200_000):
        payload += bytes([0x0C, 1, 0x7F])  # stripe|nosz, X=1, clen=127
    rc, _ = _native_arith_decode(bytes(payload), 64)
    assert rc != 0
    # same hardening in the rANS-Nx16 decoder
    import ctypes

    lib = native.get_lib()
    lib.clair3t_rans_nx16_decode.restype = ctypes.c_int
    lib.clair3t_rans_nx16_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    out = ctypes.create_string_buffer(1024)
    assert lib.clair3t_rans_nx16_decode(
        bytes([0x48, 2, 65, 66, 0]), 5, out, 1024) != 0
    assert lib.clair3t_rans_nx16_decode(
        bytes(payload), len(payload), out, 64) != 0


def test_garbage_payload_fuzz_no_crash():
    """Pure-random payloads across all five codec decoders must fail
    cleanly in-process: no segfault, no std::bad_alloc abort from lying
    length fields (each decoder bounds stream-supplied sizes and catches
    allocation failure at the C boundary)."""
    import ctypes

    lib = native.get_lib()
    fns = ("clair3t_arith_decode", "clair3t_fqzcomp_decode",
           "clair3t_rans_nx16_decode", "clair3t_rans_decode",
           "clair3t_tok3_decode")
    for fn in fns:
        f = getattr(lib, fn)
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                      ctypes.c_char_p, ctypes.c_int64]
    rng = random.Random(123)
    buf = ctypes.create_string_buffer(2048)
    for _ in range(400):
        size = rng.choice([1, 2, 5, 17, 64, 300])
        payload = bytes(rng.randrange(256) for _ in range(size))
        out_sz = rng.choice([0, 1, 100, 2048])
        for fn in fns:
            getattr(lib, fn)(payload, len(payload), buf, out_sz)
