"""Frozen binary CRAM fixtures (tests/data/fixture_v3{0,1}.cram).

No htslib/samtools exists in this image, so true cross-implementation
interop cannot be tested here (documented in docs/parity.md).  These
fixtures close the next-best gap: the exact BYTES of a known CRAM 3.0 and
3.1 file are checked in, decoded through BOTH the Python reader and the
native C++ converter, and compared to a frozen record list — so any
future codec change that silently alters the on-disk dialect (the failure
mode self-roundtrip tests cannot see) breaks here.
"""

import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
REF_FA = os.path.join(DATA, "cram_fixture_ref.fa")


def _expected():
    with open(os.path.join(DATA, "cram_fixture_expected.json")) as fh:
        return json.load(fh)


def _normalize(read):
    return dict(qname=read.qname, flag=read.flag, pos=read.pos,
                mapq=read.mapq, cigar=[tuple(c) for c in read.cigar],
                seq=read.seq, qual=[int(q) for q in read.qual])


@pytest.mark.parametrize("name", ["fixture_v30.cram", "fixture_v31.cram"])
def test_python_reader_decodes_frozen_fixture(name):
    from clair3_tpu.io.cram import CramReader

    reader = CramReader(os.path.join(DATA, name), ref_fn=REF_FA)
    got = [_normalize(r) for r in reader]
    want = [dict(e, cigar=[tuple(c) for c in e["cigar"]]) for e in _expected()]
    assert got == want


@pytest.mark.parametrize("name", ["fixture_v30.cram", "fixture_v31.cram"])
def test_native_converter_decodes_frozen_fixture(name, tmp_path):
    from clair3_tpu.io.bam import BamReader
    from clair3_tpu.io.cram import cram_to_bam
    from clair3_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    bam = str(tmp_path / "fx.bam")
    cram_to_bam(os.path.join(DATA, name), bam, REF_FA)
    got = [_normalize(r) for r in BamReader(bam)]
    want = [dict(e, cigar=[tuple(c) for c in e["cigar"]]) for e in _expected()]
    assert got == want


def test_fixture_bytes_are_pinned():
    """The fixtures themselves must not be regenerated silently: sizes and
    a cheap checksum are pinned (update deliberately with
    /tmp/make_cram_fixtures.py semantics if the dialect must change)."""
    import zlib

    sums = {}
    for name in ("fixture_v30.cram", "fixture_v31.cram"):
        blob = open(os.path.join(DATA, name), "rb").read()
        sums[name] = (len(blob), zlib.crc32(blob))
    assert sums == {
        "fixture_v30.cram": (3352, 1731184147),
        "fixture_v31.cram": (3355, 464792791),
    }, sums
