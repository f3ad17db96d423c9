"""Name tokeniser "tok3" (CRAM 3.1 method 8) roundtrip tests."""

import random

import pytest

from clair3_tpu.io.tok3 import _tokenize, tok3_compress, tok3_decompress


def _blob(names):
    return b"".join(n + b"\x00" for n in names)


NAME_SETS = {
    "illumina": [
        f"A00111:135:H2CLLDSXY:1:1101:{x}:{y}".encode()
        for x, y in zip(range(1000, 1200, 7), range(2000, 4000, 71))
    ],
    "pacbio_ccs": [
        f"m64012_190920_173625/{z}/ccs".encode()
        for z in range(100, 5000, 37)
    ],
    "ont": [
        f"read_{i:06d}_ch{c}_strand".encode()
        for i, c in zip(range(500), range(1, 501))
    ],
    "mixed_pad": [
        b"s001", b"s002", b"s010", b"s0100", b"s99", b"s100", b"t5",
    ],
    "dups": [b"dup_read/1", b"dup_read/1", b"dup_read/1", b"other/2",
             b"other/2"],
    "empty_names": [b"", b"a", b"", b"b1"],
}


@pytest.mark.parametrize("kind", sorted(NAME_SETS))
@pytest.mark.parametrize("use_arith", [False, True])
def test_roundtrip_name_sets(kind, use_arith):
    data = _blob(NAME_SETS[kind])
    blob = tok3_compress(data, use_arith=use_arith)
    assert tok3_decompress(blob) == data


def test_compresses_structured_names_well():
    names = [
        f"A00111:135:H2CLLDSXY:1:1101:{x}:{y}".encode()
        for x, y in zip(range(1000, 15000, 7), range(2000, 200000, 71))
    ]
    data = _blob(names)
    blob = tok3_compress(data)
    assert tok3_decompress(blob) == data
    # structured names should compress far better than generic order-0 rANS
    from clair3_tpu.io.rans_nx16 import rans_nx16_compress
    generic = rans_nx16_compress(data, 0)
    assert len(blob) < len(generic) * 0.5
    assert len(blob) < len(data) * 0.15


def test_empty_block():
    assert tok3_decompress(tok3_compress(b"")) == b""


def test_tokenizer_shapes():
    toks = _tokenize(b"m64012_190920/0042/ccs")
    types = [t for t, _ in toks]
    texts = [x for _, x in toks]
    assert b"".join(texts) == b"m64012_190920/0042/ccs"
    from clair3_tpu.io.tok3 import N_ALPHA, N_CHAR, N_DIGITS, N_DIGITS0
    assert types[0] == N_CHAR            # single leading 'm'
    assert N_DIGITS0 in types            # '0042' is zero-padded
    assert N_DIGITS in types
    assert N_ALPHA in types              # trailing '/ccs' run


def test_long_digit_runs_split_u32_safe():
    names = [b"x12345678901234567890123", b"x12345678901234567890124"]
    data = _blob(names)
    assert tok3_decompress(tok3_compress(data)) == data


def test_fuzz_random_names():
    rng = random.Random(2026)
    alphabet = "abcXYZ_./:0123456789"
    for trial in range(25):
        names = []
        for _ in range(rng.randrange(1, 60)):
            n = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(1, 40)))
            names.append(n.encode())
        # sprinkle duplicates
        if len(names) > 3:
            names[2] = names[1]
        data = _blob(names)
        blob = tok3_compress(data, use_arith=bool(trial & 1))
        assert tok3_decompress(blob) == data, (trial, names[:3])


def test_rejects_unterminated_input():
    with pytest.raises(ValueError, match="NUL-terminated"):
        tok3_compress(b"no_trailing_nul")


def test_cram_block_method8_roundtrip():
    from clair3_tpu.io.cram import M_TOK3, CT_EXTERNAL, read_block
    import clair3_tpu.io.cram as cram_mod
    import struct
    import zlib

    data = _blob(NAME_SETS["pacbio_ccs"])
    comp = tok3_compress(data)
    head = bytes([M_TOK3, CT_EXTERNAL]) + cram_mod.write_itf8(1) \
        + cram_mod.write_itf8(len(comp)) + cram_mod.write_itf8(len(data))
    body = head + comp
    blob = body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    block, q = read_block(blob, 0)
    assert q == len(blob)
    assert block.data == data
